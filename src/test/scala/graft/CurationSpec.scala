package graft

import graft.ext.dedup.{BlockDedup, DupGroups, SemanticDedup}
import graft.ext.similarity.IvfKNN
import graft.ext.text.{Decontaminate, ShardPacker, TextFunctions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: SemDeDup verdict semantics,
  * decontamination overlap counting, and the two-level distributed
  * prefix sum behind shard packing. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Cache-hygiene assertions must be DELTA-based: the shared test
    * session may carry other suites' persisted RDDs. */
  private def newPersistedAfter[T](body: => T): (T, Set[Int]) = {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val r = body
    (r, spark.sparkContext.getPersistentRDDs.keySet.toSet -- before)
  }

  test("semantic dedup: keeps lowest id per near-dup pair, one verdict per vector") {
    val e = Tables(spark, sf, "embeddings")
    val (v, leaked) = newPersistedAfter(
      SemanticDedup.verdicts(e, "vec_id", "embedding", k = 8, threshold = 0.3))
    assert(leaked.isEmpty, s"semantic dedup leaked cached RDDs: $leaked")
    val rows = v.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length == e.count())
    assert(rows.map(_._1).distinct.length == rows.length)
    val dropped = rows.filter(!_._3)
    assert(dropped.nonEmpty, "threshold 0.3 should drop some vectors at sf0.001")
    // every dropped vector has a lower-id kept-or-dropped partner in
    // the SAME cluster with cosine >= threshold; verify one level via
    // recomputation on the driver (corpus is 500 vectors here)
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 1e9) / 1e9
    }
    val byCluster = rows.groupBy(_._2)
    dropped.foreach { case (id, cluster, _) =>
      val partners = byCluster(cluster).filter(_._1 < id)
      assert(partners.exists(p => cos(vecs(p._1), vecs(id)) >= 0.3),
        s"dropped vector $id has no qualifying lower-id partner")
    }
    // a cluster's lowest-id member can never be dropped
    byCluster.values.foreach { members =>
      val lowest = members.minBy(_._1)
      assert(lowest._3, s"lowest id ${lowest._1} of cluster ${lowest._2} was dropped")
    }
  }

  test("semantic dedup: cluster count scales with the corpus, floors at 16") {
    // K ∝ n keeps the within-cluster pair stage linear (the round-5
    // scale bench caught the fixed-K form going quadratic); the floor
    // preserves the driver-SF oracle behavior (n=500 → 16)
    assert(SemanticDedup.scaledClusterCount(0) == 16)
    assert(SemanticDedup.scaledClusterCount(500) == 16)
    assert(SemanticDedup.scaledClusterCount(4000) == 16)
    assert(SemanticDedup.scaledClusterCount(20000) == 80)
    assert(SemanticDedup.scaledClusterCount(63200) == 252)
    // average cluster size is bounded by the target once past the floor
    Seq(10000L, 100000L, 10000000L).foreach { n =>
      val k = SemanticDedup.scaledClusterCount(n)
      assert(n.toDouble / k <= 251, s"n=$n k=$k avg=${n.toDouble / k}")
    }
  }

  test("semantic decontamination: planted eval twin is flagged, far vectors are not") {
    val e = Tables(spark, sf, "embeddings")
    val evalSide = e.filter($"vec_id" % 7 === 0)
    val trainSide = e.filter($"vec_id" % 7 =!= 0)
    val k = SemanticDedup.decontaminationClusterCount(
      trainSide.count(), evalSide.count())
    val (out, leaked) = newPersistedAfter(
      SemanticDedup.decontaminate(trainSide, evalSide, "vec_id", "embedding",
        k, threshold = 0.3))
    assert(leaked.isEmpty, s"semantic decontamination leaked cached RDDs: $leaked")
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // one verdict per TRAIN vector, never an eval id in the output
    assert(rows.length == trainSide.count())
    assert(rows.forall(_._1 % 7 != 0))
    assert(rows.forall(r => r._4 == (r._3 > 0)))
    // ground truth on the driver (550 vectors): every flagged train
    // vector really has an eval vector with cosine >= threshold
    // (the miner never false-positives; misses are the documented
    // different-cluster recall caveat)
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 1e9) / 1e9
    }
    val evalIds = vecs.keys.filter(_ % 7 == 0).toSeq
    rows.filter(_._4).foreach { case (id, _, _, _) =>
      assert(evalIds.exists(ev => cos(vecs(ev), vecs(id)) >= 0.3),
        s"train $id flagged but no eval vector is within the threshold")
    }
    assert(rows.exists(_._4), "sf0.001 should plant some contamination at 0.3")
    assert(rows.exists(!_._4), "not everything should be contaminated")
    // an EXACT planted twin of an eval vector must always be caught:
    // identical vectors share the argmax cluster by construction
    import spark.implicits._
    val twinSrc = vecs(evalIds.head)
    val planted = trainSide.select($"vec_id", $"embedding").unionByName(
      Seq((1000001L, twinSrc.toSeq)).toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<float>")))
    val out2 = SemanticDedup.decontaminate(planted, evalSide,
      "vec_id", "embedding", k, threshold = 0.3)
    val twin = out2.filter($"vec_id" === 1000001L).collect()
    assert(twin.length == 1 && twin(0).getBoolean(3),
      "exact eval twin must be flagged contaminated")
  }

  test("semantic decontamination: K scales with train, capped by eval; ranked codebook is dense") {
    assert(SemanticDedup.decontaminationClusterCount(100, 50) == 16)
    assert(SemanticDedup.decontaminationClusterCount(100000, 50000) == 400)
    assert(SemanticDedup.decontaminationClusterCount(100000000L, 50000) == 50000)
    intercept[IllegalArgumentException] {
      SemanticDedup.decontaminationClusterCount(10, 0)
    }
    // ranked fine codebook on a sparse-id split: cids dense 0..K-1 in
    // id order, coarse cells own themselves (gid = cid below C)
    val e = Tables(spark, sf, "embeddings").filter($"vec_id" % 7 === 0)
    val coarse = IvfKNN.sampledCentroids(e, "vec_id", "embedding", 3)
    val fine = IvfKNN.fineCodebookTableRanked(e, "vec_id", "embedding", 8, coarse)
      .orderBy($"cid").collect()
    assert(fine.map(_.getLong(0)).toSeq == (0L until 8L))
    assert(fine.take(3).forall(r => r.getLong(0) == r.getLong(3)),
      "coarse cells must own their own centroid")
    // cid order = eval id order: cid 0 is the lowest eval id's vector
    val lowest = e.orderBy($"vec_id").limit(8)
      .select($"embedding").collect().map(_.getSeq[Float](0))
    assert(fine.map(_.getSeq[Float](1)).toSeq == lowest.toSeq)
  }

  test("decontamination: finds planted n-gram overlap, skips clean docs") {
    val df = Seq(
      (0L, "alpha beta gamma delta"),          // eval (id % 2 == 0 below)
      (1L, "zz alpha beta gamma yy"),          // train, shares trigram
      (3L, "totally unrelated words here"),    // train, clean
      (5L, "alpha beta gamma alpha beta gamma") // train, one DISTINCT shared trigram + "gamma alpha beta"... distinct grams shared = 2? see below
    ).toDF("doc_id", "text")
    val out = Decontaminate.overlaps(df, "doc_id", "text",
      isEval = $"doc_id" % 2 === 0, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares exactly "alpha beta gamma"; doc 3 clean (absent);
    // doc 5's distinct trigrams are {alpha beta gamma, beta gamma alpha,
    // gamma alpha beta} of which only the first occurs in the eval doc
    assert(out == Map(1L -> 1L, 5L -> 1L))
  }

  test("decontamination on corpus: every flagged doc truly shares a trigram") {
    val docs = Tables(spark, sf, "documents")
    val flagged = Decontaminate.overlaps(docs, "doc_id", "text",
      isEval = $"doc_id" % 97 === 0, n = 3)
    // cross-check the top flagged doc by recomputing its shingle
    // intersection directly
    val evalGrams = docs.filter($"doc_id" % 97 === 0)
      .select(explode(TextFunctions.shingles($"text", 3)).as("g"))
      .distinct().as[String].collect().toSet
    val check = docs.filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", TextFunctions.shingles($"text", 3).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).count(evalGrams))
      .filter(_._2 > 0).toMap
    val got = flagged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == check.map { case (k, v) => k -> v.toLong })
  }

  test("cross-corpus decontamination matches the broadcast path row for row") {
    val docs = Tables(spark, sf, "documents")
    val broadcastPath = Decontaminate.overlaps(docs, "doc_id", "text",
      isEval = $"doc_id" % 97 === 0, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val crossPath = Decontaminate.crossOverlaps(
      docs.filter($"doc_id" % 97 =!= 0), docs.filter($"doc_id" % 97 === 0),
      "doc_id", "text", n = 3)
    val got = crossPath.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == broadcastPath)
    // the scale contract lives in the plan: a shuffled HASH join (no
    // broadcast of the corpus-sized reference, no stream sort) keyed
    // on the 8-byte gram hash, and the explode barrier on both sides
    val p = crossPath.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert(!p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.toLowerCase.contains("roundrobinpartitioning"), p.take(3000))
    assert(p.contains("xxhash64"), p.take(3000))
  }

  test("dup groups: transitive chains collapse to min-id components") {
    // two components: a transitive chain {1,5,9} (1-5, 5-9; 1 and 9
    // never directly paired) and a pair {2,7}
    val pairs = Seq((1L, 5L), (5L, 9L), (2L, 7L)).toDF("doc_a", "doc_b")
    val (grouped, leaked) = newPersistedAfter(DupGroups.groups(pairs, "doc_a", "doc_b"))
    val got = grouped.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 5L -> 1L, 9L -> 1L, 2L -> 2L, 7L -> 2L))
    assert(leaked.isEmpty, s"dup groups leaked caches: $leaked")
  }

  test("dup groups: a long path needs multiple propagation rounds and still converges") {
    // path 10-9-8-...-0 with the min at one END: label 0 must walk the
    // full diameter, exercising the fixpoint loop rather than round 1.
    // maxDriverEdges = 0 forces the DISTRIBUTED path (the size gate
    // would otherwise solve this tiny graph on the driver)
    val pairs = (0L until 10L).map(i => (i + 1, i)).toDF("doc_a", "doc_b")
    val got = DupGroups.groups(pairs, "doc_a", "doc_b", maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 10L).map(_ -> 0L).toMap)
  }

  test("dup groups: driver union-find and distributed propagation agree exactly") {
    val rnd = new scala.util.Random(23)
    // random sparse graph over 80 vertices: chains, cliques, isolates
    val pairs = Seq.fill(60)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2).toDF("doc_a", "doc_b")
    val viaDriver = DupGroups.groups(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCluster = DupGroups.groups(pairs, "doc_a", "doc_b", maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaCluster)
  }

  test("block dedup: repeated block survives only at its first occurrence") {
    // doc 1 and doc 2 share an identical 4-token block; doc 2 also has
    // a unique tail block. blockTokens=4 so each phrase is one block.
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta unique tail block here"),
      (3L, "")).toDF("doc_id", "text")
    val out = BlockDedup.dedupBlocks(df, "doc_id", "text", blockTokens = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((1L, 1L, "alpha beta gamma delta")))
    assert(out(2L) == ((2L, 1L, "unique tail block here")))
    assert(!out.contains(3L)) // empty doc has no blocks
  }

  test("shard packing: two-level prefix sum equals the single global window") {
    val docs = Tables(spark, sf, "documents")
    val packed = ShardPacker.packShards(docs, "doc_id", "text",
      budget = 1000L, bucketWidth = 37L) // width deliberately != any id pattern
    val naive = docs.select($"doc_id",
        TextFunctions.tokenCount($"text").as("n_tokens"))
      .withColumn("cum_tokens",
        sum($"n_tokens").over(Window.orderBy($"doc_id")))
      .withColumn("shard_id",
        floor(($"cum_tokens" - $"n_tokens") / 1000L).cast("long"))
    val diff = packed.as("p").join(naive.as("n"), "doc_id")
      .filter($"p.cum_tokens" =!= $"n.cum_tokens" ||
        $"p.shard_id" =!= $"n.shard_id")
    assert(diff.count() == 0)
    // shard ids are contiguous from 0 and non-decreasing in id order
    val shards = packed.orderBy($"doc_id").select($"shard_id").as[Long].collect()
    assert(shards.head == 0L)
    assert(shards.sliding(2).forall(w => w.length < 2 || w(1) - w(0) >= 0))
    assert(shards.distinct.sorted.sameElements(0L to shards.max))
  }

  test("curation pipeline v2: every stage's contract holds on its output") {
    import graft.ext.text.{DomainCap, Dsir}
    val out = SparkEntry.queries("docs_curation_pipeline_v2")(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    assert(out.nonEmpty, "degenerate composition: empty survivor set")
    val d = Tables(spark, sf, "documents")
      .select($"doc_id", $"source", $"text").cache()
    try {
      // stage contracts, each checked INDEPENDENTLY of the pipeline's
      // own wiring (the oracle pins values; this pins semantics):
      // 1. no eval-split docs survive
      assert(out.forall(_ % 97 != 0))
      // 2. survivors respect the per-host cap (host = first bigram)
      val hosts = d
        .select($"doc_id",
          array_join(slice(TextFunctions.tokens($"text"), 1, 2), " ")
            .as("host"))
        .as[(Long, String)].collect().toMap
      val perHost = out.groupBy(hosts).view.mapValues(_.size)
      assert(perHost.forall(_._2 <= 3),
        perHost.filter(_._2 > 3).take(3).toString)
      // 3. no two survivors share a fingerprint
      val fps = d.filter($"doc_id".isin(out.toSeq: _*))
        .select(TextFunctions.fingerprint($"text")).as[String].collect()
      assert(fps.length === fps.distinct.length)
      // 4. no survivor shares a trigram with the eval split
      val overlaps = graft.ext.text.Decontaminate.crossOverlaps(
          d.filter($"doc_id".isin(out.toSeq: _*)),
          d.filter($"doc_id" % 97 === 0), "doc_id", "text", n = 3)
        .count()
      assert(overlaps === 0L)
      // 5. no DSIR-target (src0) docs in the training output
      val srcs = d.filter($"doc_id".isin(out.toSeq: _*))
        .select($"source").distinct().as[String].collect()
      assert(!srcs.contains("src0"), srcs.mkString(","))
    } finally d.unpersist()
  }

  test("shard packing: adaptive width bounds the bucket frame on a huge sparse id range") {
    // ids spread over ~5×10^12: a fixed width=100 would make the
    // second-level (unpartitioned) window sort 5×10^10 bucket rows —
    // the round-7 scale hazard. The adaptive default must pick a
    // width that caps the bucket frame at targetBuckets AND still
    // produce the width-invariant global prefix sum.
    val docs = Tables(spark, sf, "documents")
      .select(($"doc_id" * 10000000L).as("doc_id"), $"text")
    val packed = ShardPacker.packShards(docs, "doc_id", "text", budget = 1000L)
    val naive = docs.select($"doc_id",
        TextFunctions.tokenCount($"text").as("n_tokens"))
      .withColumn("cum_tokens",
        sum($"n_tokens").over(Window.orderBy($"doc_id")))
    val diff = packed.as("p").join(naive.as("n"), "doc_id")
      .filter($"p.cum_tokens" =!= $"n.cum_tokens")
    assert(diff.count() == 0)
    // replicate the width rule and check the bucket-frame bound
    val Array(mn, mx) = docs.agg(min($"doc_id"), max($"doc_id"))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val width = math.max(100L, (mx - mn) / 100000L + 1)
    val buckets = docs.select(($"doc_id" - ($"doc_id" % width)) / width)
      .distinct().count()
    assert(buckets <= 100000L, s"bucket frame $buckets rows exceeds the cap")
    assert(width > 100L, "fixture failed to trigger the adaptive branch")
  }
}
