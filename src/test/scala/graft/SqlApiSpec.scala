package graft

import org.apache.spark.sql.functions._

/** SQL-first API surface: everything the DataFrame registry does is
  * reachable as literal `spark.sql` text after
  * [[Tables.registerViews]] — views under the oracle table names plus
  * the graft native functions. */
class SqlApiSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("registry query and literal SQL text produce identical results") {
    Tables.registerViews(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect()
    val viaDf = SparkEntry.queries("q1_pricing_summary")(spark, sf)
      .select($"l_returnflag", $"l_linestatus", $"sum_qty", $"count_order")
      .collect()
    assert(viaSql.sameElements(viaDf))
  }

  test("native kernels are callable from SQL: fvec_dot and topk_freq") {
    Tables.registerViews(spark, sf)
    val norms = spark.sql(
      "SELECT vec_id, fvec_dot(embedding, embedding) AS sq FROM embeddings LIMIT 5")
      .collect()
    assert(norms.length == 5 && norms.forall(_.getDouble(1) > 0))

    val hh = spark.sql(
      """SELECT e.key AS event_type, e.cnt
        |FROM (SELECT explode(topk_freq(event_type, 8)) AS e FROM events)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, sf, "events").groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == exact)
  }
}
