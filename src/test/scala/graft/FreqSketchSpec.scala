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
}
