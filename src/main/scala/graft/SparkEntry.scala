package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Conventions shared by every query / oracle pair:
  *  - Every aggregate / computed column is aliased identically in the
  *    Spark code and the DuckDB SQL (driver sorts columns by name).
  *  - Double aggregations are summed in exact DECIMAL and only cast to
  *    double in the final projection: per-row double arithmetic is
  *    IEEE-identical across engines, the decimal sum is exact, and the
  *    final decimal→double cast is deterministic — so results
  *    hash-match without rounding tricks.
  *  - Results are deterministically ordered (ORDER BY on output keys).
  */
object SparkEntry {

  /** Exact accumulation type for money/quantity sums (see above). */
  private val dec = DecimalType(18, 6)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AnalyticsQueries.registry ++ AnalyticsDsQueries.registry ++
      EtlQueries.registry ++ LlmQueries.registry ++
      ScaleQueries.registry ++ CurationQueries.registry

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    AnalyticsQueries.oracles ++ AnalyticsDsQueries.oracles ++
      EtlQueries.oracles ++ LlmQueries.oracles ++
      ScaleQueries.oracles ++ CurationQueries.oracles
}
