package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-validation bench (round-4 verdict task 1): measure the
  * scaling CURVE of the heavy operators instead of arguing it.
  *
  * Method: [[SynthGen]] produces the same table shapes as the driver
  * corpus at any SF, so we grow two corpora from the SAME generator
  * (default sf0.1 and sf1.0 — a 10× step) and time each heavy query at
  * both. Because generator, distributions, session and host are all
  * held fixed, the per-query ratio big/small isolates the engine's
  * data-scaling behavior: a structurally linear operator should land
  * at ≈ the corpus ratio (with a constant-overhead discount at these
  * absolute sizes — fixed per-query costs like planning, shuffle
  * setup, and 32-task scheduling floors don't grow with the data).
  * A super-linear outlier (ratio ≫ corpus ratio) is a scale bug in
  * some stage and must be diagnosed by name.
  *
  * Methodology matches [[graft.Bench]]: min-of-N reps (default 2) per
  * query per SF, at-rest builds run explicitly BEFORE the query loop
  * (their cost reported per-SF in a "build" section — index builds
  * scale with the corpus too and must not hide in a first rep),
  * count() to force, caches kept within an SF, cleared between SFs.
  *
  * JIT control: the first measured pass of a fresh JVM pays classload,
  * codegen compilation and C2 warmup for EVERY plan shape — enough at
  * these sizes to make a 10×-smaller corpus time SLOWER than the big
  * one. So the whole heavy list AND all at-rest builds first run
  * UNTIMED against a third, tiny corpus (sfWarm = sfSmall/10): same
  * plan shapes, negligible data cost. The builds are memoized per
  * corpus dir, so the warm-up does not consume the small/big builds —
  * those still run (and are timed) first-time-per-dir.
  *
  * Usage: `runMain graft.tools.ScaleBench [workDir] [sfSmall] [sfBig]`
  * Writes `SCALE_BENCH.json` to the working directory. Corpora are
  * reused if already generated (delete workDir to regenerate).
  */
object ScaleBench {

  /** The queries whose 100 TB posture SURVEY §8.5 argues structurally;
    * this bench converts each argument into a measured point. */
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
    val sfSmall = if (args.length > 1) args(1).toDouble else 0.1
    val sfBig = if (args.length > 2) args(2).toDouble else 1.0
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    // measure one SF: explicit at-rest builds first (timed), then the
    // heavy loop at min-of-N — identical shape to graft.Bench
    def measure(dir: String): (Seq[(String, Either[String, Double])],
                               Seq[(String, Either[String, Double], Long)]) = {
      val builds = AtRestBuilds.measure(spark, dir)
      val qs = heavy.map { name =>
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

    val (dirW, _) = ensureCorpus(sfSmall / 10)
    val (dirS, genS) = ensureCorpus(sfSmall)
    val (dirB, genB) = ensureCorpus(sfBig)
    val corpusRatio = sfBig / sfSmall

    // untimed JIT warm-up: every build and every heavy plan shape once,
    // against the tiny corpus (see scaladoc)
    AtRestBuilds.measure(spark, dirW)
    heavy.foreach { q =>
      try graft.SparkEntry.queries(q)(spark, dirW).count()
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()

    val (buildS, qS) = measure(dirS)
    spark.catalog.clearCache()
    val (buildB, qB) = measure(dirB)

    val qJson = heavy.map { name =>
      val (_, rs, rowsS) = qS.find(_._1 == name).get
      val (_, rb, rowsB) = qB.find(_._1 == name).get
      val body = (rs, rb) match {
        case (Right(ts), Right(tb)) =>
          val ratio = if (ts > 0) tb / ts else -1.0
          s""""small_sec":${ms(ts)},"big_sec":${ms(tb)},"ratio":${ms(ratio)},""" +
            s""""rows_small":$rowsS,"rows_big":$rowsB"""
        case _ =>
          val e = rs.left.toOption.orElse(rb.left.toOption).getOrElse("?")
          s""""error":"$e""""
      }
      "\"" + name + "\":{" + body + "}"
    }.mkString("{", ",", "}")

    def buildJson(bs: Seq[(String, Either[String, Double])]) =
      bs.map {
        case (k, Right(t)) => "\"" + k + "\":" + ms(t)
        case (k, Left(e)) => "\"" + k + "\":\"" + e.take(120) + "\""
      }.mkString("{", ",", "}")

    val detail =
      s"""{"metric":"scale_curve","sf_small":$sfSmall,"sf_big":$sfBig,""" +
        s""""corpus_ratio":$corpusRatio,"reps":$reps,""" +
        s""""gen_sec":{"small":${ms(genS)},"big":${ms(genB)}},""" +
        s""""build_small":${buildJson(buildS)},"build_big":${buildJson(buildB)},""" +
        s""""queries":$qJson}"""
    val w = new java.io.PrintWriter("SCALE_BENCH.json")
    try w.println(detail) finally w.close()
    println(detail)
    spark.stop()
  }
}
