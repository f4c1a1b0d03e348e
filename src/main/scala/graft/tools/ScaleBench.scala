package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-validation bench (round-4 verdict task 1): measure the
  * scaling CURVE of the heavy operators instead of arguing it.
  *
  * Method: [[SynthGen]] produces the same table shapes as the driver
  * corpus at any SF (schemas pinned to the real corpus by
  * SynthGenSpec), so we grow corpora from the SAME generator at a
  * ladder of SFs (default 0.1 → 1.0 → 3.16, i.e. 10× and 31.6×) and
  * time each heavy query at every rung. Because generator,
  * distributions, session and host are all held fixed, the per-query
  * time ratio isolates the engine's data-scaling behavior: a
  * structurally linear operator should track ≤ the corpus ratio (with
  * a constant-overhead discount at small absolute sizes — fixed
  * per-query costs like planning, shuffle setup, and 32-task
  * scheduling floors don't grow with the data). A super-linear
  * outlier (time ratio ≫ corpus ratio) is a scale bug in some stage
  * and must be diagnosed by name.
  *
  * Methodology matches [[graft.Bench]]: min-of-N reps (default 2) per
  * query per SF, at-rest builds run explicitly BEFORE the query loop
  * (their cost reported per-SF in a "builds" section — index builds
  * scale with the corpus too and must not hide in a first rep),
  * count() to force, caches kept within an SF, cleared between SFs.
  *
  * JIT control: the first measured pass of a fresh JVM pays classload,
  * codegen compilation and C2 warmup for EVERY plan shape — enough at
  * these sizes to make a 10×-smaller corpus time SLOWER than the big
  * one. So the whole heavy list AND all at-rest builds first run
  * UNTIMED against an extra, tiny corpus (sfs.min/10): same plan
  * shapes, negligible data cost. The builds are memoized per corpus
  * dir, so the warm-up does not consume the measured rungs' builds —
  * those still run (and are timed) first-time-per-dir.
  *
  * Usage: `runMain graft.tools.ScaleBench [workDir] [sf ...]`
  * Writes `SCALE_BENCH.json` to the working directory. Corpora are
  * reused if already generated (delete workDir to regenerate).
  */
object ScaleBench {

  /** The queries whose 100 TB posture SURVEY §8.5 argues structurally;
    * this bench converts each argument into a measured curve. */
  val heavy: Seq[String] = Seq(
    "docs_minhash_pairs",    // banded LSH: O(n·bands) candidate join
    "docs_simhash_pairs",    // pigeonhole bucket join
    "docs_token_stats",      // pure map over every doc (linear reference)
    "docs_decontaminate",    // broadcast eval grams, map-only train side
    "docs_dup_groups",       // pair mining + size-gated components
    "docs_block_dedup",      // corpus-wide first-occurrence + reassembly
    "docs_pack_shards",      // two-level distributed prefix sum
    "docs_curation_pipeline",// fused multi-stage curation plan
    "emb_semantic_dedup",    // map-only assign + one cluster shuffle
    "emb_knn_ivf",           // pruned ANN probe (codebook built at-rest)
    "etl_upsert",            // merge-on-write upsert
    "etl_upsert_partitioned",// partition-scoped merge-on-write
    "etl_keygen",            // per-row surrogate keys (pure map)
    "q9_nation_profit",      // multi-join star aggregation
    "q_range_join",          // bucketized inequality join
    "q_sessionize")          // per-user ordered window

  def main(args: Array[String]): Unit = {
    val workDir = if (args.length > 0) args(0) else "target/synth"
    val sfs: Seq[Double] =
      if (args.length > 1) args.drop(1).map(_.toDouble).toSeq.sorted
      else Seq(0.1, 1.0, 3.16)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_ONLY=a,b restricts the heavy list (isolated reruns,
    // same contract as graft.Bench)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .appName("graft-scalebench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ms(t: Double) = (math.rint(t * 1000) / 1000).toString

    def ensureCorpus(sf: Double): (String, Double) = {
      val dir = s"$workDir/sf$sf"
      val done = new java.io.File(s"$dir/embeddings.parquet/_SUCCESS")
      if (done.exists()) (dir, 0.0)
      else {
        val t0 = System.nanoTime()
        SynthGen.generate(spark, dir, sf)
        (dir, (System.nanoTime() - t0) / 1e9)
      }
    }

    val selected = heavy.filter(q => only.forall(_.contains(q)))

    // measure one SF: explicit at-rest builds first (timed), then the
    // heavy loop at min-of-N — identical shape to graft.Bench
    def measure(dir: String): (Seq[(String, Either[String, Double])],
                               Seq[(String, Either[String, Double], Long)]) = {
      val builds = if (only.isEmpty) AtRestBuilds.measure(spark, dir) else Seq.empty
      val qs = selected.map { name =>
        val fn = graft.SparkEntry.queries(name)
        val times = Seq.newBuilder[Double]
        var rows = 0L
        var err: Option[String] = None
        var r = 0
        while (r < reps && err.isEmpty) {
          val t0 = System.nanoTime()
          try { rows = fn(spark, dir).count(); times += (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            err = Some(e.toString.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)) }
          r += 1
        }
        val t = times.result()
        (name, err.toLeft(t.min), rows)
      }
      (builds, qs)
    }

    val (dirW, _) = ensureCorpus(sfs.min / 10)
    val rungs = sfs.map(sf => sf -> ensureCorpus(sf))

    // untimed JIT warm-up: every build and every heavy plan shape once,
    // against the tiny corpus (see scaladoc)
    if (only.isEmpty) AtRestBuilds.measure(spark, dirW)
    selected.foreach { q =>
      try graft.SparkEntry.queries(q)(spark, dirW).count()
      catch { case _: Throwable => () }
    }

    val measured = rungs.map { case (sf, (dir, gen)) =>
      spark.catalog.clearCache()
      val (builds, qs) = measure(dir)
      (sf, gen, builds, qs)
    }

    val qJson = selected.map { name =>
      val points = measured.map { case (_, _, _, qs) =>
        qs.find(_._1 == name).get
      }
      val errs = points.collect { case (_, Left(e), _) => e }
      val body =
        if (errs.nonEmpty) s""""error":"${errs.head}""""
        else {
          val secs = points.map(_._2.toOption.get)
          val rows = points.map(_._3)
          val ratio = if (secs.head > 0) secs.last / secs.head else -1.0
          s""""sec":[${secs.map(ms).mkString(",")}],""" +
            s""""rows":[${rows.mkString(",")}],"ratio":${ms(ratio)}"""
        }
      "\"" + name + "\":{" + body + "}"
    }.mkString("{", ",", "}")

    def buildJson(bs: Seq[(String, Either[String, Double])]) =
      bs.map {
        case (k, Right(t)) => "\"" + k + "\":" + ms(t)
        case (k, Left(e)) => "\"" + k + "\":\"" + e.take(120) + "\""
      }.mkString("{", ",", "}")
    val buildsJson = measured.map { case (sf, _, builds, _) =>
      "\"sf" + sf + "\":" + buildJson(builds)
    }.mkString("{", ",", "}")

    val detail =
      s"""{"metric":"scale_curve","sfs":[${sfs.mkString(",")}],""" +
        s""""corpus_ratio":${ms(sfs.max / sfs.min)},"reps":$reps,""" +
        s""""gen_sec":[${measured.map(m => ms(m._2)).mkString(",")}],""" +
        s""""builds":$buildsJson,"queries":$qJson}"""
    // a filtered rerun must not clobber the full committed artifact
    val outFile =
      if (only.isEmpty) "SCALE_BENCH.json" else "SCALE_BENCH_PARTIAL.json"
    val w = new java.io.PrintWriter(outFile)
    try w.println(detail) finally w.close()
    println(detail)
    spark.stop()
  }
}
