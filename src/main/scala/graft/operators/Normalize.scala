package graft.operators

import graft.config.EntitySchema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-driven normalize: project + cast + rename + trim in ONE
  * `select` (reference ops P-1/P-2/P-3, `src/helper/helper.py:63-150`).
  *
  * Semantics preserved from the reference:
  *  - only declared columns survive (extras are projected away);
  *  - missing source paths become null columns;
  *  - casts coerce: unparseable timestamps/numbers → null (Spark's
  *    native cast behavior matches pandas `errors="coerce"`);
  *  - timezone-suffixed timestamps land as naive UTC (session TZ is
  *    pinned to UTC);
  *  - string columns are trimmed after cast.
  *
  * Spark-first notes: a single `select` keeps the whole op inside one
  * codegen stage, Catalyst prunes the JSON/parquet scan to the
  * declared paths, and no shuffle is introduced — at 100 TB this is a
  * pure map stage.
  */
object Normalize {

  /** Column expression for one spec over the raw (nested) frame. */
  private def colFor(df: DataFrame, spec: graft.config.ColumnSpec): Column = {
    val topLevel = spec.srcPath.split('.').head
    val source: Column =
      if (df.columns.contains(topLevel)) col(spec.srcPath)
      else lit(null) // missing source path → null column
    // try_cast = coerce-to-null (ANSI-safe), matching pandas errors="coerce"
    val cast = source.try_cast(spec.sparkType)
    val shaped = if (spec.isString) trim(cast) else cast
    shaped.as(spec.dstName)
  }

  /** Normalize a raw entity frame according to its declared schema. */
  def apply(df: DataFrame, schema: EntitySchema): DataFrame =
    df.select(schema.columns.map(colFor(df, _)): _*)
}
