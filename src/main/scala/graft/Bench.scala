package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at the scale
  * factor in SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Queries run in sorted-name order (stable across rounds); a warmup
  * executes the flagship aggregation once so JIT/classloading cost
  * lands outside the measured loop. Each query is forced with
  * `count()` (results are small by construction — every query either
  * aggregates or is subset-bounded).
  *
  * Noise control (this host has shown 1.6× total drift between
  * identical binaries hours apart): each query runs
  * `SPARK_GRAFT_REPEAT` times (default 2) and the reported time is the
  * MIN — the estimator least sensitive to transient host load. The
  * per-rep times and the 1-minute load average before/after go to
  * `BENCH_DETAIL.json` in the working directory (NOT the stdout line:
  * the harness tails stdout, and the round-3 inline detail overflowed
  * the capture window, losing that round's bench) — read the detail
  * file to tell a regression from a noisy host. `SPARK_GRAFT_ONLY=
  * q1,q2` restricts the run for isolated adjudication reruns.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def loadAvg: Double =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
      catch { case _: Throwable => -1.0 }
    val loadBefore = loadAvg

    // warmup outside the measured loop: one aggregation query and one
    // text/array-heavy query so codegen+JIT cost for both expression
    // families lands before timing starts
    Seq("q1_pricing_summary", "docs_token_stats").foreach { q =>
      try SparkEntry.queries(q)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }

    // a failing query must be VISIBLE in the output (null time + an
    // errors entry), never a silent -1 that shrinks the total
    val results = selected.map { case (name, fn) =>
      val times = Seq.newBuilder[Double]
      var err: Option[String] = None
      var r = 0
      while (r < reps && err.isEmpty) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); times += (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          err = Some(e.toString.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)) }
        // Caches are KEPT across queries by default: the round-1
        // baseline was measured that way, and same-methodology numbers
        // are the ones comparable across rounds. Verify clears per
        // query; set SPARK_GRAFT_CLEAR_CACHE=1 to measure fully cold.
        if (sys.env.contains("SPARK_GRAFT_CLEAR_CACHE")) spark.catalog.clearCache()
        r += 1
      }
      (name, times.result(), err)
    }
    // The driver captures only the LAST ~2000 chars of stdout and
    // parses the JSON line out of that tail — round 3's inline per-rep
    // arrays pushed the line past the window and the whole bench was
    // lost ("parsed": null). So: stdout gets ONE COMPACT line
    // (ms precision, min-of-N only); the full per-rep detail and load
    // averages go to BENCH_DETAIL.json in the working directory.
    // 10ms precision on the stdout line (noise on this host is far
    // coarser); full ms precision lives in the detail file
    def ms(t: Double) = (math.rint(t * 100) / 100).toString
    def fmtTimes(ts: Seq[Double]) =
      ts.map(t => (math.rint(t * 1000) / 1000).toString).mkString("[", ",", "]")
    val qs = results.map { case (k, ts, err) =>
      "\"" + k + "\":" + (if (err.isDefined) "null" else ms(ts.min))
    }.mkString("{", ",", "}")
    val allReps = results.map { case (k, ts, _) =>
      "\"" + k + "\":" + fmtTimes(ts)
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, ts, None) => ts.min }.sum
    val rc = results.count(_._3.isDefined)
    val detail = s"""{"reps":$reps,"rep_times":$allReps,"load_before":$loadBefore,""" +
      s""""load_after":$loadAvg,"errors":$errs,"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter("BENCH_DETAIL.json")
      try w.println(detail) finally w.close()
    } catch {
      // the detail file is best-effort (the stdout line is the record
      // of note) — but never swallow fatal errors
      case scala.util.control.NonFatal(_) => ()
    }
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec",""" +
      s""""queries":$qs,"failed":$rc,"sf":"$sfDir"}""")
    spark.stop()
    if (rc > 0) sys.exit(1)
  }
}
