package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Explicit file-level min/max statistics — the secondary index every
  * table format (Iceberg/Delta/Hudi manifests, parquet footers) keeps
  * so a selective query opens only the files whose value ranges can
  * match. Spark's parquet reader already does row-group skipping
  * inside each file it opens; this manifest makes the FILE-level skip
  * explicit and inspectable, and it is the structure that turns the
  * [[ZOrder]] layout into IO savings on BOTH clustered dimensions.
  *
  * The manifest is one row per file (a few doubles per column) —
  * driver-holdable index metadata by construction, rebuilt
  * incrementally per written file in a real table format.
  */
object FileManifest {

  /** One manifest row per file: `file`, and `<c>_min` / `<c>_max`
    * for every requested column. One scan of the table. */
  def build(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose `[min, max]` range intersects `[lo, hi]` on `c` —
    * a SUPERSET of the files holding matching rows (callers re-apply
    * the row-level predicate). */
  def candidateFiles(
      manifest: DataFrame, c: String, lo: Column, hi: Column): Seq[String] =
    manifest.filter(col(s"${c}_max") >= lo && col(s"${c}_min") <= hi)
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Read only the candidate files for `c BETWEEN lo AND hi` and
    * re-apply the row predicate. Equal to the full-scan filter by
    * construction; opens only the pruned file list. */
  def prunedRead(
      spark: SparkSession,
      path: String,
      manifest: DataFrame,
      c: String,
      lo: Column,
      hi: Column): DataFrame = {
    val files = candidateFiles(manifest, c, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(path).limit(0) // schema-preserving
      else spark.read.parquet(files: _*)
    base.filter(col(c) >= lo && col(c) <= hi)
  }
}
