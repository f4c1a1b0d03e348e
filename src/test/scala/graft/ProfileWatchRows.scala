package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round-11 verdict task 3): attribute the two >2×-vs-
  * baseline bench watch rows — q1_pricing_summary and events_profile —
  * by timing the full registry path next to stripped-down variants of
  * the same plan under the exact Bench session confs. Run:
  *
  *   sbt "Test/runMain graft.ProfileWatchRows"
  *
  * Findings land in SURVEY §8's round-12 brief.
  */
object ProfileWatchRows {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val q1 = SparkEntry.queries("q1_pricing_summary")
    graft.tools.Force.rows(q1(spark, dir)) // warm
    time("q1 full (Force.rows)") { graft.tools.Force.rows(q1(spark, dir)) }
    time("q1 full rep2") { graft.tools.Force.rows(q1(spark, dir)) }

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    println("[probe] lineitem scan partitions: " + li.rdd.getNumPartitions)
    time("bare count") { li.count() }
    time("double sums x2") {
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity"), sum($"l_extendedprice")).collect()
      ()
    }
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    def decAgg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"l_returnflag", $"l_linestatus").agg(
        sum($"l_quantity".cast(dec)), sum($"l_extendedprice".cast(dec)),
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(dec)),
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount") *
          (lit(1.0) + $"l_tax")).cast(dec)),
        sum($"l_discount".cast(dec)), count(lit(1))).collect()
    time("decimal sums (q1 shape)") { decAgg(li); () }
    time("decimal sums after repartition(32)") { decAgg(li.repartition(32)); () }

    // the round-7 forcing boundary, demonstrated: under the round-1
    // bench's bare count() forcing Catalyst prunes every aggregate
    // expression out of the Aggregate (only the hash-group survives),
    // so the round-1 cells for these two rows never ran the exact-
    // decimal sums / distinct-min-max work at all
    time("q1 under round-1 count() forcing") { q1(spark, dir).count(); () }

    val ep = SparkEntry.queries("events_profile")
    graft.tools.Force.rows(ep(spark, dir)) // warm
    time("events_profile full") { graft.tools.Force.rows(ep(spark, dir)) }
    val ev = Tables(spark, dir, "events")
    println("[probe] events scan partitions: " + ev.rdd.getNumPartitions)
    time("events bare count") { ev.count() }
    time("events 4-col distinct/min/max (profile shape)") {
      graft.ext.profile.DataProfiler
        .profile(ev.repartition(32), Seq("event_id", "user_id", "event_type", "value"))
        .collect()
      ()
    }
    time("events_profile under round-1 count() forcing") { ep(spark, dir).count(); () }
    spark.stop()
  }
}
