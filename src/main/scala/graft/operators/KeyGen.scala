package graft.operators

import graft.config.EntitySchema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampType, DateType}

/** Deterministic surrogate key (reference op R-1,
  * `src/helper/helper.py:144-173`): concatenate the string renderings
  * of the `unique_identifier` columns WITHOUT separator, SHA-256, take
  * the first 32 hex chars, format as a UUID.
  *
  * Exact-parity notes (SURVEY.md §7.4 #1): the reference renders each
  * key value with pandas `str()`. We reproduce that rendering:
  *  - timestamps → `yyyy-MM-dd HH:mm:ss` (pandas drops an all-zero
  *    fractional part); sub-second values keep milliseconds;
  *  - null timestamp → `"NaT"`, any other null → `"None"`;
  *  - all other types → their plain string cast.
  *
  * Implementation is a pure built-in expression chain
  * (`sha2(concat(...))` + substrings) — fully codegen'd, no UDF, no
  * shuffle: at 100 TB this is a map-stage expression that fuses into
  * the surrounding WholeStageCodegen span.
  */
object KeyGen {

  val columnName = "event_generated_id"

  /** Pandas-`str()`-compatible rendering of one key column. Null
    * temporals render "None", not "NaT": the reference replaces
    * `pd.NaT` with `None` before `str()` (`helper.py`'s
    * `replace({pd.NaT: None})`), so `None` is what its key hash sees. */
  def canonicalString(c: Column, dt: DataType): Column = dt match {
    case TimestampType =>
      // pandas: "2022-11-24 10:00:00" for whole seconds,
      //         "2022-11-24 10:00:00.179575" (6-digit µs) otherwise.
      val whole = date_format(c, "yyyy-MM-dd HH:mm:ss")
      val micro = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
      val rendered = when(date_format(c, "SSSSSS") === "000000", whole)
        .otherwise(micro)
      coalesce(rendered, lit("None"))
    case DateType => coalesce(c.cast("string"), lit("None"))
    case _        => coalesce(c.cast("string"), lit("None"))
  }

  /** Hash expression over already-rendered key strings. */
  def keyExpr(rendered: Seq[Column]): Column = {
    val h = sha2(concat(rendered: _*), 256)
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  /** Append `event_generated_id` from the schema's key columns
    * (applied AFTER Normalize, so column names are target names). */
  def apply(df: DataFrame, schema: EntitySchema): DataFrame = {
    val rendered = schema.keyColumns.map(s => canonicalString(col(s.dstName), s.sparkType))
    df.withColumn(columnName, keyExpr(rendered))
  }

  /** Generic form: key on explicit (column, type) pairs. */
  def withKey(df: DataFrame, keys: Seq[(String, DataType)]): DataFrame =
    df.withColumn(columnName,
      keyExpr(keys.map { case (n, t) => canonicalString(col(n), t) }))
}
