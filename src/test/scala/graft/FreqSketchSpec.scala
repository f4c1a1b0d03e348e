package graft

import graft.functions.{FreqSketch, TopKFreq}
import org.apache.spark.sql.functions._

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  test("capacity above true cardinality gives exact counts, any partitioning") {
    val dir = "/root/testdata/sf0.001"
    val exact = Tables(spark, dir, "events")
      .groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // many partitions → the merge path actually runs
    val got = Tables(spark, dir, "events").repartition(17)
      .agg(TopKFreq.topFreq($"event_type", 8).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.key", $"e.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("over-capacity: Misra-Gries bounds hold (underestimate by at most n/(k+1))") {
    val rnd = new scala.util.Random(5)
    // skewed stream: 'heavy' is ~half the stream, tail keys are rare
    val keys = Seq.fill(2000)(if (rnd.nextBoolean()) "heavy" else s"t${rnd.nextInt(50)}")
    val sk = new FreqSketch(4)
    keys.foreach(sk.add(_, 1L))
    val est = sk.sorted.toMap
    val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = keys.size.toLong
    est.foreach { case (k, c) =>
      assert(c <= truth(k), s"$k overestimated: $c > ${truth(k)}")
      assert(c >= truth(k) - n / 5, s"$k below MG bound")
    }
    // the genuine heavy hitter survives and tops the summary
    assert(sk.sorted.head._1 == "heavy")
  }

  test("merge of split sketches obeys the same bound as one-pass") {
    val rnd = new scala.util.Random(9)
    val keys = Seq.fill(3000)(if (rnd.nextInt(3) == 0) "hot" else s"k${rnd.nextInt(40)}")
    val (a, b) = keys.splitAt(1500)
    val sa = new FreqSketch(6); a.foreach(sa.add(_, 1L))
    val sb = new FreqSketch(6); b.foreach(sb.add(_, 1L))
    sa.mergeFrom(sb)
    val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    sa.sorted.foreach { case (k, c) =>
      assert(c <= truth(k))
      assert(c >= truth(k) - keys.size.toLong / 7)
    }
    assert(sa.counts.size <= 6)
    assert(sa.sorted.head._1 == "hot")
  }

  test("plan aggregates via ObjectHashAggregate, no full-key shuffle before partials") {
    val p = Tables(spark, "/root/testdata/sf0.001", "events")
      .agg(TopKFreq.topFreq($"event_type", 8))
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
  }

  test("keys past the 64 KiB modified-UTF-8 ceiling survive the shuffle serde") {
    // writeUTF would throw UTFDataFormatException here; the
    // length-prefixed raw-UTF-8 serde must round-trip it through an
    // actual partial/final aggregation (repartition forces the
    // serialize/deserialize path to really run)
    val big = "x" * 70000
    val rows = (Seq.fill(5)(big) ++ Seq("small", "small", "é" * 40000))
      .toDF("k").repartition(7)
    val got = rows.agg(TopKFreq.topFreq($"k", 8).as("tk"))
      .select(explode($"tk").as("e")).select($"e.key", $"e.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(big -> 5L, "small" -> 2L, ("é" * 40000) -> 1L))
  }

  test("SQL registration rejects a non-literal or non-integer k with a clear error") {
    TopKFreq.register(spark)
    Tables(spark, "/root/testdata/sf0.001", "events")
      .createOrReplaceTempView("ev_topk_reg")
    // happy path still works
    assert(spark.sql("SELECT topk_freq(event_type, 5) FROM ev_topk_reg").count() == 1)
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT topk_freq(event_type, user_id) FROM ev_topk_reg").collect()
    }
    assert(e1.getMessage.contains("integer literal"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT topk_freq(event_type, 'five') FROM ev_topk_reg").collect()
    }
    assert(e2.getMessage.contains("integer literal"), e2.getMessage)
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT topk_freq(event_type) FROM ev_topk_reg").collect()
    }
    assert(e3.getMessage.contains("2 arguments"), e3.getMessage)
  }
}
