package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skewed-timeline decade for [[graft.operators.IntervalAgg.countSum]]
  * — the round-8 watch item's "done" measurement.
  *
  * The hazard class: the prefix-sum's bucket width adapts to time
  * SPAN, so a corpus whose points concentrate in a tiny slice of a
  * long span used to land ~all points in a few window partitions
  * (WindowExec buffers a whole partition per task). The two-level
  * sub-bucket decomposition bounds that; this bench MEASURES it, at
  * sizes where a hot single-task window would dominate wall time:
  * the same interval-agg runs over a UNIFORM corpus and a SKEWED one
  * (99% of points inside 0.1% of a one-year span) at n and 10n
  * points, and the artifact reports per-scale skew penalty
  * (skew_sec / uniform_sec) plus the cross-decade ratio of each
  * corpus shape. A healthy engine shows penalty ≈ 1 and ratios ≈ the
  * data ratio; the pre-fix engine showed the skewed cell collapsing
  * to single-task window sorts.
  *
  * Both corpora are generated distributed (`spark.range` + integer
  * hash formulas — no driver-side data), with identical interval
  * sides so the only variable is the point-timeline shape.
  *
  * Usage: `sbt "runMain graft.tools.IntervalSkewBench [out.json]"`
  * (scales fixed: 2M → 20M points, 200k intervals each).
  */
object IntervalSkewBench {

  private final class Probe extends SparkListener {
    val sw = new java.util.concurrent.atomic.AtomicLong
    val sm = new java.util.concurrent.atomic.AtomicLong
    val sd = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        sm.addAndGet(m.memoryBytesSpilled)
        sd.addAndGet(m.diskBytesSpilled)
      }
    }
    def reset(): Unit = { sw.set(0); sm.set(0); sd.set(0) }
  }

  private val yearMicros = 365L * 86400 * 1000000
  private val epoch0 = 1704067200000000L // 2024-01-01T00:00:00Z in µs

  /** Points over [epoch0, epoch0+year). `skewed`: 99% of rows inside
    * a 0.1%-of-span slice at mid-span (xxhash64 offsets —
    * deterministic, and hash-not-multiply keeps the arithmetic clear
    * of ANSI overflow), 1% uniform; uniform: all rows spread over
    * the year. */
  private def points(spark: SparkSession, n: Long, skewed: Boolean): DataFrame = {
    val hotStart = epoch0 + yearMicros / 2
    val hotWidth = yearMicros / 1000
    val uni = lit(epoch0) + pmod(xxhash64(col("id")), lit(yearMicros))
    val tm =
      if (!skewed) uni
      else when(pmod(col("id"), lit(100)) === 0, uni)
        .otherwise(lit(hotStart) + pmod(xxhash64(col("id"), lit(1)), lit(hotWidth)))
    spark.range(n).select(
      timestamp_micros(tm).as("p_ts"),
      (pmod(col("id"), lit(13)) + lit(0.25)).cast("double").as("p_value"))
  }

  /** Monitoring-window-shaped intervals: starts uniform over the
    * year, fixed 1-hour width — identical for both corpus shapes. */
  private def intervals(spark: SparkSession, n: Long): DataFrame = {
    val start = lit(epoch0) + pmod(xxhash64(col("id"), lit(2)), lit(yearMicros))
    spark.range(n).select(col("id").as("iid"),
      timestamp_micros(start).as("s"),
      timestamp_micros(start + lit(3600L * 1000000)).as("e"))
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "INTERVAL_SKEW_ISOLATED.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .appName("graft-interval-skew")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", 512)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe = new Probe
    spark.sparkContext.addSparkListener(probe)

    val scales = Seq(2000000L, 20000000L)
    val nIv = 200000L

    // untimed JIT warm-up at a small size
    for (sk <- Seq(false, true))
      Force.rows(graft.operators.IntervalAgg.countSum(
        points(spark, 50000L, sk), intervals(spark, 5000L),
        "p_ts", "p_value", "iid", "s", "e", bucketWidthSec = 60L))

    case class Cell(sec: Double, rows: Long, swMb: Double, spillMb: Double)
    def measure(n: Long, skewed: Boolean): Cell = {
      val cells = (0 until reps).map { _ =>
        probe.reset()
        val t0 = System.nanoTime()
        val rows = Force.rows(graft.operators.IntervalAgg.countSum(
          points(spark, n, skewed), intervals(spark, nIv),
          "p_ts", "p_value", "iid", "s", "e", bucketWidthSec = 60L))
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graftbridge.ListenerBridge
          .waitUntilEmpty(spark.sparkContext)
        Cell(sec, rows,
          probe.sw.get / 1048576.0,
          (probe.sm.get + probe.sd.get) / 1048576.0)
      }
      val best = cells.minBy(_.sec)
      System.err.println(f"[skewbench] n=$n skewed=$skewed " +
        f"${best.sec}%.2fs rows=${best.rows} spillMb=${best.spillMb}%.1f")
      best
    }

    val cells = for (n <- scales; sk <- Seq(false, true))
      yield ((n, sk), measure(n, sk))
    val m = cells.toMap
    def s3(d: Double) = (math.rint(d * 1000) / 1000).toString
    def arr(sk: Boolean, f: Cell => String) =
      scales.map(n => f(m((n, sk)))).mkString("[", ",", "]")
    val penalty = scales.map(n =>
      s3(m((n, true)).sec / m((n, false)).sec)).mkString("[", ",", "]")
    val js =
      s"""{"metric":"interval_skew_curve","points":${scales.mkString("[", ",", "]")},""" +
      s""""intervals":$nIv,"hot_fraction":0.99,"hot_span_fraction":0.001,""" +
      s""""reps":$reps,"cpus":$cpus,""" +
      s""""uniform_sec":${arr(false, c => s3(c.sec))},""" +
      s""""skew_sec":${arr(true, c => s3(c.sec))},""" +
      s""""uniform_rows":${arr(false, _.rows.toString)},""" +
      s""""skew_rows":${arr(true, _.rows.toString)},""" +
      s""""uniform_shuffle_mb":${arr(false, c => s3(c.swMb))},""" +
      s""""skew_shuffle_mb":${arr(true, c => s3(c.swMb))},""" +
      s""""uniform_spill_mb":${arr(false, c => s3(c.spillMb))},""" +
      s""""skew_spill_mb":${arr(true, c => s3(c.spillMb))},""" +
      s""""skew_penalty":$penalty,""" +
      s""""ratio_uniform":${s3(m((scales.last, false)).sec / m((scales.head, false)).sec)},""" +
      s""""ratio_skew":${s3(m((scales.last, true)).sec / m((scales.head, true)).sec)},""" +
      s""""corpus_ratio":${s3(scales.last.toDouble / scales.head)}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      js.getBytes("UTF-8"))
    println(js)
    spark.stop()
  }
}
