package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent keyed upsert onto a parquet table (reference op K-2,
  * `src/helper/postgres.py:157-189`: `INSERT ... ON CONFLICT (key) DO
  * UPDATE`, last write wins per key).
  *
  * Strategy is merge-on-write:
  *  1. dedup the incoming batch to one row per key (last-write-wins
  *     inside a batch, like the reference's sequential executemany);
  *  2. union with existing rows, rank updates above existing per key,
  *     keep rank 1;
  *  3. rewrite.
  *
  * Scale posture: the unpartitioned form rewrites the whole table —
  * correct but O(table) per batch, fine for entity tables far smaller
  * than the event stream. [[upsertPartitioned]] is the 100 TB path:
  * the table is hive-partitioned (e.g. by event date), only the
  * partitions present in the batch are read+merged, and the write
  * uses dynamic partition overwrite so untouched partitions are never
  * rewritten. The merge itself is a single shuffle by key.
  */
object ParquetUpsertSink {

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** One row per key in the batch; ties broken arbitrarily (matches
    * `dropDuplicates`) — pass `orderCol` to make "last" explicit. */
  private def dedupBatch(batch: DataFrame, key: String, orderCol: Option[String]): DataFrame =
    orderCol match {
      case Some(o) =>
        val w = Window.partitionBy(col(key)).orderBy(col(o).desc)
        batch.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      case None => batch.dropDuplicates(key)
    }

  /** Full-table merge-on-write upsert. */
  def upsert(
      spark: SparkSession,
      batch: DataFrame,
      tablePath: String,
      key: String,
      orderCol: Option[String] = None,
      outputFiles: Int = 8): Unit = {
    // modest file counts: entity tables are row-few relative to the
    // event stream, and per-file FS metadata work dominates rewrite
    // cost at small scale (outputFiles stays a knob for big tables)
    val incoming = dedupBatch(batch, key, orderCol)
    if (!exists(spark, tablePath)) {
      incoming.coalesce(outputFiles).write.mode("overwrite").parquet(tablePath)
      return
    }
    val existing = spark.read.parquet(tablePath)
    val merged = merge(existing, incoming, key)
    // can't overwrite a path while reading it: stage + atomic-ish swap
    val tmp = tablePath.stripSuffix("/") + "__staging"
    merged.coalesce(outputFiles).write.mode("overwrite").parquet(tmp)
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(tablePath), true)
    fs.rename(new Path(tmp), new Path(tablePath))
  }

  /** Partition-pruned upsert: merges only the partitions the batch
    * touches and dynamically overwrites just those. */
  def upsertPartitioned(
      spark: SparkSession,
      batch: DataFrame,
      tablePath: String,
      key: String,
      partitionCol: String,
      orderCol: Option[String] = None): Unit = {
    val incoming = dedupBatch(batch, key, orderCol).cache()
    try {
      if (!exists(spark, tablePath)) {
        incoming.write.partitionBy(partitionCol).mode("overwrite").parquet(tablePath)
        return
      }
      // partitions touched by this batch (small list, collected driver-side)
      val touched = incoming.select(partitionCol).distinct().collect().map(_.get(0))
      val existing = spark.read.parquet(tablePath)
        .filter(col(partitionCol).isInCollection(touched.toSeq))
      val merged = merge(existing.select(incoming.columns.toIndexedSeq.map(col): _*), incoming, key)
      merged.write
        .partitionBy(partitionCol)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(tablePath)
    } finally incoming.unpersist()
  }

  /** Rank updates above existing rows per key, keep one. */
  private def merge(existing: DataFrame, incoming: DataFrame, key: String): DataFrame = {
    val tagged = incoming.withColumn("__pri", lit(1))
      .unionByName(existing.withColumn("__pri", lit(0)))
    val w = Window.partitionBy(col(key)).orderBy(col("__pri").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__pri")
  }
}
