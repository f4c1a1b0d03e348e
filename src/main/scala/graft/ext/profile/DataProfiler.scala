package graft.ext.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiler: null count, exact distinct count, min and
  * max (string-rendered) for every requested column.
  *
  * All metrics for all columns are computed in a SINGLE aggregation
  * over one scan — the naive per-column loop would run one job per
  * column (N scans of a 100 TB table); here the only caveat is that
  * multiple exact `count(distinct)`s expand the plan, so profiling
  * many columns at once trades shuffle width for scan count, which is
  * the right trade on large inputs.
  */
object DataProfiler {

  case class ColumnProfile(
      column: String, nRows: Long, nNulls: Long, nDistinct: Long,
      minValue: String, maxValue: String)

  /** Wide one-row aggregate, then unpivoted to one row per column. */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val perCol = columns.map { c =>
      struct(
        lit(c).as("column"),
        col(s"${c}__n").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    wide.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }
}
