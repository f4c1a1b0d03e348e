package graft

import graft.ext.text.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance weights: Mitchell-log exactness on known values,
  * hand-computed λ on a single-bucket corpus, target-likeness
  * ordering on a planted split, degenerate-doc rows, and the
  * broadcast/no-sort plan contract. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  test("mitchellLog2: exact at powers of two, linear mantissa between") {
    val out = Seq(1L, 2L, 3L, 4L, 6L, 1000L).map(Dsir.mitchellLog2)
    assert(out === Seq(0.0, 1.0, 1.5, 2.0, 2.5, 9.953125))
    // the oracle's SQL spelling is the same arithmetic — pin it on
    // the engine the oracle runs against via the committed constants
    assert(Dsir.mitchellLog2(1000L) === 9.953125) // DuckDB-checked value
  }

  test("unibigrams: occurrence-level, not deduplicated") {
    val g = Seq("a b a b").toDF("text")
      .select(Dsir.unibigrams(ext.text.TextFunctions.tokens(col("text"))))
      .as[Seq[String]].head()
    // 4 unigrams WITH repeats + 3 bigrams with the repeated "a b"
    assert(g === Seq("a", "b", "a", "b", "a b", "b a", "a b"))
  }

  test("weights: hand-computed fixed-point sum on a tiny corpus") {
    // target doc "x x" → grams x, x, "x x"; raw doc "x" → gram x.
    // Let bx = bucket(x), bxx = bucket("x x"); Tt = 3 + B, Tq = 1 + B.
    // λ(bx) = ⌊(lg̃(ct+1) − lg̃(Tt+B... )) · 2^30⌋ with ct(bx)=2, cq(bx)=1
    val d = docsDf((1L, "x x", "src0"), (2L, "x", "web"))
    val out = Dsir.weights(d, "doc_id", "text",
      col("source") === "src0").collect()
    assert(out.length === 1 && out(0).getLong(0) === 2L)
    def mlog(n: Long): Double = {
      val k = 64 - java.lang.Long.numberOfLeadingZeros(n)
      val p = 1L << (k - 1)
      (k - 1).toDouble + (n - p).toDouble / p.toDouble
    }
    val b = Dsir.Buckets
    val lam = math.floor((mlog(2 + 1) - mlog(3 + b) -
      mlog(1 + 1) + mlog(1 + b)) * (1L << Dsir.FracBits)).toLong
    // pin the value as a LITERAL too (hand arithmetic: 1.5 −
    // (13 + 3/8192) − 1 + (13 + 1/8192) = 1/2 − 1/4096, × 2^30 =
    // 536870912 − 262144), so a wrong mitchellLog2 can't vouch for
    // itself through the local mlog copy
    assert(lam === 536608768L)
    assert(out(0).getLong(2) === lam)               // logw_scaled: 1 gram
    assert(out(0).getLong(1) === 1L)                // n_grams
    assert(out(0).getDouble(3) ===
      lam.toDouble / (1L << Dsir.FracBits).toDouble)
    // the single raw doc IS the corpus mean — never strictly above it
    assert(!out(0).getBoolean(4))
  }

  test("planted split: target-vocabulary docs outscore disjoint-vocabulary docs") {
    // target speaks {alpha..epsilon}; half the raw docs copy that
    // vocabulary, half speak a disjoint one — DSIR must rank every
    // target-like doc above every off-domain doc, and the
    // mean-relative cut must select exactly the target-like half.
    val tWords = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val oWords = Seq("zork", "quux", "blarg", "mumble", "frotz")
    def doc(ws: Seq[String], seed: Int) =
      (0 until 12).map(i => ws((i * 7 + seed) % ws.length)).mkString(" ")
    val target = (0L until 5L).map(i => (i, doc(tWords, i.toInt), "src0"))
    val like = (100L until 105L).map(i => (i, doc(tWords, i.toInt), "web"))
    val off = (200L until 205L).map(i => (i, doc(oWords, i.toInt), "web"))
    val rows = Dsir.weights(docsDf((target ++ like ++ off): _*),
      "doc_id", "text", col("source") === "src0").collect()
    val w = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sel = rows.map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val minLike = (100L until 105L).map(w).min
    val maxOff = (200L until 205L).map(w).max
    assert(maxOff < minLike, s"off-domain doc outscored target-like: $w")
    assert((100L until 105L).forall(sel), s"target-like doc not selected: $sel")
    assert(!(200L until 205L).exists(sel), s"off-domain doc selected: $sel")
  }

  test("degenerate docs: blank text keeps a zero row; target docs absent") {
    val d = docsDf((1L, "alpha beta", "src0"), (2L, "   ", "web"),
      (3L, "", "web"))
    val out = Dsir.weights(d, "doc_id", "text", col("source") === "src0")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L, 3L))
    out.foreach { r =>
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L &&
        r.getDouble(3) === 0.0 && !r.getBoolean(4))
    }
  }

  test("frozen model scores grams the training snapshot never saw") {
    // train on {alpha}/{beta}; score a doc whose grams hash to
    // buckets with ct = cq = 0 — the λ table is total, so those
    // grams must be COUNTED and weighted by the pure Laplace prior,
    // not silently dropped by the scoring join (round-13 review
    // finding: a cq-keyed table zeroed exactly the
    // target-characteristic vocabulary DSIR exists to reward)
    val model = Dsir.train(
      Seq((1L, "alpha")).toDF("doc_id", "text"),
      Seq((2L, "beta")).toDF("doc_id", "text"), "doc_id", "text")
    assert(model.lam.length === Dsir.Buckets)
    val out = Dsir.scoreAgainst(
      Seq((3L, "gamma delta")).toDF("doc_id", "text"),
      "doc_id", "text", model).collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === 3L, "unseen grams must be counted")
    // pure-prior λ = ⌊(lg̃(1) − lg̃(1+B) − lg̃(1) + lg̃(1+B))·2^30⌋ = 0
    // for ct=cq=0 cells when Tt = Tq (both snapshots are 1 gram)
    assert(out(0).getLong(2) === 0L)
  }

  test("model table round-trip: exact through DECIMAL, malformed fails loudly") {
    val d = docsDf((1L, "alpha beta alpha", "src0"),
      (2L, "alpha gamma", "web"), (3L, "zork quux", "web"))
    val m = Dsir.train(d.filter(col("source") === "src0"),
      d.filter(col("source") =!= "src0"), "doc_id", "text")
    val back = Dsir.modelFromTable(Dsir.modelTable(spark, m))
    assert(back === m)
    // scoring against the round-tripped model is row-identical
    val raw = d.filter(col("source") =!= "src0")
    assert(Dsir.scoreAgainst(raw, "doc_id", "text", back).collect().toSeq
      === Dsir.scoreAgainst(raw, "doc_id", "text", m).collect().toSeq)
    // malformed models throw instead of scoring silently wrong
    val ok = Dsir.modelTable(spark, m)
    intercept[IllegalArgumentException] {  // missing totals
      Dsir.modelFromTable(ok.filter(col("bucket") >= 0))
    }
    intercept[IllegalArgumentException] {  // duplicate bucket
      Dsir.modelFromTable(ok.unionAll(ok.limit(1)))
    }
    intercept[IllegalArgumentException] {  // out-of-range bucket
      Dsir.modelFromTable(ok.unionAll(
        Seq((Dsir.Buckets.toLong, java.math.BigDecimal.ONE))
          .toDF("bucket", "value")
          .select(col("bucket"), col("value").cast("decimal(38,0)"))))
    }
  }

  test("trainSplit: model identical to the two-filter train, nulls in neither split") {
    // r14 optimization: weights() folds both bucket-count tables out
    // of ONE gram pass (trainSplit) instead of two filtered passes —
    // pin model equality, including the null-predicate row landing in
    // NEITHER split (filter(p) and filter(!p) both drop null)
    val d = Seq((1L, "alpha beta alpha", "src0"),
      (2L, "alpha gamma", "web"), (3L, "zork quux", "web"),
      (4L, "null source row", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source")
    val p = col("source") === "src0"
    val viaSplit = Dsir.trainSplit(d, "doc_id", "text", p)
    val viaFilters = Dsir.train(d.filter(p), d.filter(!p), "doc_id", "text")
    assert(viaSplit === viaFilters)
  }

  test("plan: λ scoring join broadcasts; no sort operator anywhere") {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val plan = Dsir.weights(d, "doc_id", "text",
      col("source") === "src0").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("SortAggregate"), plan.take(3000))
  }
}
