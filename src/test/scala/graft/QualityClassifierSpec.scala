package graft

import graft.ext.text.QualityClassifier
import org.apache.spark.sql.functions._

/** Trained quality classifier: learning actually happens (pocket
  * beats the majority baseline; a separable toy corpus reaches zero
  * training error), labels/blank-doc edges, and the never-worse-than-
  * baseline guarantee of the pocket rule. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("separable toy corpus: pocket training reaches zero error") {
    // positives: pure stopword prose; negatives: disjoint junk vocab
    val docs = (0L until 30L).map { i =>
      if (i % 2 == 0) (i, "the and of to in is it a the and")
      else (i, s"zzz$i qqq$i www$i xxx$i yyy$i")
    }.toDF("doc_id", "text")
    val w = QualityClassifier.train(docs, "doc_id", "text", iters = 4)
    val out = QualityClassifier.score(docs, "doc_id", "text", w)
    val wrong = out.filter($"label" =!= $"pred").count()
    assert(wrong == 0, s"separable corpus should train to zero errors, got $wrong")
    // and the labels themselves are as constructed
    assert(out.filter($"label" === 1).count() == 15)
  }

  test("labels: blank and low-density docs are negative, dense prose positive") {
    val docs = Seq(
      (0L, ""),                                   // blank -> -1
      (1L, "the cat sat on the mat"),             // 2 stopword hits ("the"x2) / 6 = 33% -> +1
      (2L, "quantum flux capacitor phase array"), // 0 hits -> -1
      (3L, "a b c d e f g h i j k l m n o p q r s t u v w x yy zz")) // 1/26 < 8% -> -1
      .toDF("doc_id", "text")
    val got = QualityClassifier.labels(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> -1, 1L -> 1, 2L -> -1, 3L -> -1))
  }

  test("pocket guarantee: never below the all-negative baseline on real docs") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val out = QualityClassifier.trainAndScore(docs, "doc_id", "text", iters = 4)
    val agg = out.agg(
      sum(when($"label" === $"pred", 1L).otherwise(0L)).as("correct"),
      sum(when($"label" === -1, 1L).otherwise(0L)).as("neg"),
      count(lit(1)).as("n")).collect().head
    val (correct, neg, n) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    // w0=0 (predict all -1) is in the pocket, so >= baseline always;
    // measured it beats baseline by ~10 points — pin a real margin
    assert(correct >= neg, s"pocket fell below the majority baseline: $correct < $neg")
    assert(correct - neg >= (n * 5) / 100,
      s"expected >=5pp learning gain over baseline, got ${correct - neg} of $n")
  }

  test("every doc is scored, including blank ones (bias feature)") {
    val docs = Seq((1L, "the of and"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = QualityClassifier.trainAndScore(docs, "doc_id", "text", iters = 2)
    assert(out.count() == 3)
    assert(out.filter($"doc_id" === 2L).count() == 1)
  }

  test("at-rest ref model: trains on the snapshot only, scores the whole corpus") {
    // snapshot = ids < 20 (pure classes); ids >= 20 are unseen at
    // training time but still scored — the docs_quality_clf_ref shape
    val docs = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "the and of to in is it a the and")
      else (i, s"zzz$i qqq$i www$i xxx$i yyy$i")
    }.toDF("doc_id", "text")
    val wRef = QualityClassifier.train(
      docs.filter($"doc_id" < 20), "doc_id", "text", iters = 4)
    val out = QualityClassifier.score(docs, "doc_id", "text", wRef)
    assert(out.count() == 40, "scoring must cover docs outside the snapshot")
    // the snapshot boundary must matter: weights from the snapshot
    // differ from full-corpus weights on this corpus (the unseen junk
    // vocab ids>=20 hash to buckets the snapshot never updated)
    val wFull = QualityClassifier.train(docs, "doc_id", "text", iters = 4)
    assert(!wRef.sameElements(wFull),
      "snapshot-trained weights should differ from full-corpus weights here")
    // memo: same snapshot + iters returns the identical cached array
    val m1 = QualityClassifier.cachedRefTrain(docs, "doc_id", "text",
      maxRefId = 20L, iters = 4, source = "clfspec")
    val m2 = QualityClassifier.cachedRefTrain(docs, "doc_id", "text",
      maxRefId = 20L, iters = 4, source = "clfspec")
    assert(m1 eq m2, "memo must return the cached weights")
    assert(m1.sameElements(wRef))
  }

  test("scoreMap (pure-map streaming form) is row-identical to score") {
    // mixed corpus incl. a blank doc (bias-only margin) and token
    // multiplicity (cnt > 1 buckets — the fold must count every token)
    val docs = Seq(
      (0L, ""),
      (1L, "the the the and of to in it a is"),
      (2L, "zzz qqq www xxx yyy zzz zzz"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "un deux trois le la les et en du")).toDF("doc_id", "text")
    val w = QualityClassifier.train(docs, "doc_id", "text", iters = 3)
    val agg = QualityClassifier.score(docs, "doc_id", "text", w)
      .orderBy($"doc_id").collect()
    val map = QualityClassifier.scoreMap(docs, "doc_id", "text", w)
      .orderBy($"doc_id").collect()
    assert(agg.sameElements(map),
      s"agg=${agg.mkString(";")} map=${map.mkString(";")}")
    // and the map form's plan carries no shuffle — the streaming-safe
    // property (Exchange never appears in a pure projection)
    val plan = QualityClassifier.scoreMap(docs, "doc_id", "text", w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
