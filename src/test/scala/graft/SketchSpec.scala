package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate coverage: HLL++ distinct counts and
  * approximate quantiles bounded against their exact counterparts.
  * These are the cardinality/quantile sketches a 100 TB pipeline uses
  * where exact distinct/sort is too expensive; no DuckDB oracle
  * (sketch internals differ per engine) — accuracy is the contract.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables(spark, "/root/testdata/sf0.01", "events")

  test("approx_count_distinct within rsd bound of exact") {
    val exact = events.select(countDistinct($"user_id")).collect().head.getLong(0)
    val approx = events.select(approx_count_distinct($"user_id", 0.02))
      .collect().head.getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.05, s"exact=$exact approx=$approx err=$err")
  }

  test("q_approx_distinct bound holds at every SF the driver runs") {
    // the registry query's within_bound column must be TRUE for every
    // group at the verify SF (0.01) and the bench SF (0.1) — the
    // oracle asserts the literal TRUE, so a bound miss is a hash miss
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { sf =>
        val bad = SparkEntry.queries("q_approx_distinct")(spark, sf)
          .filter(!col("within_bound")).count()
        assert(bad == 0, s"$sf: $bad groups outside the 5% bound")
      }
  }

  test("approx_percentile brackets the exact percentile") {
    val exact = events.select(expr("percentile(value, 0.5)"))
      .collect().head.getDouble(0)
    val approx = events.select(expr("approx_percentile(value, 0.5, 1000)"))
      .collect().head.getDouble(0)
    // with accuracy=1000 over ~10k rows the sketch is near-exact
    assert(math.abs(approx - exact) / math.max(1.0, exact) < 0.05,
      s"exact=$exact approx=$approx")
  }
}
