package graft

import graft.ext.similarity.CosineKNN
import graft.functions.{TopKByScore, TopKHeap}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  test("heap keeps the k best with (score desc, id asc) tie-breaks") {
    val h = new TopKHeap(3)
    Seq((0.5, 10L), (0.9, 7L), (0.5, 3L), (0.9, 20L), (0.1, 1L))
      .foreach { case (s, i) => h.insert(s, i) }
    // ties on 0.9 -> smaller id first; 0.5 tie -> id 3 beats id 10
    assert(h.sorted.toSeq == Seq((0.9, 7L), (0.9, 20L), (0.5, 3L)))
    // fewer rows than k
    val small = new TopKHeap(5)
    small.insert(1.0, 2L); small.insert(0.5, 1L)
    assert(small.sorted.toSeq == Seq((1.0, 2L), (0.5, 1L)))
  }

  test("heap merge equals single-heap insertion of the union") {
    val all = (1 to 100).map(i => ((i * 37 % 19).toDouble / 19, i.toLong))
    val one = new TopKHeap(10)
    all.foreach { case (s, i) => one.insert(s, i) }
    val (l, r) = all.splitAt(40)
    val a = new TopKHeap(10); l.foreach { case (s, i) => a.insert(s, i) }
    val b = new TopKHeap(10); r.foreach { case (s, i) => b.insert(s, i) }
    a.mergeFrom(b)
    assert(a.sorted.toSeq == one.sorted.toSeq)
  }

  test("aggregate matches the row_number window form on skewed groups") {
    // 3 groups of very different candidate counts, scores with ties
    val rows = for {
      g <- Seq(1L, 2L, 3L)
      i <- 1L to (g * 7)
    } yield (g, (i * 31 % 11).toDouble / 11, i)
    val df = rows.toDF("query_id", "cosine", "neighbor_id").repartition(4)
    val viaAgg = df.groupBy($"query_id")
      .agg(TopKByScore.topk($"cosine", $"neighbor_id", 5).as("tk"))
      .select($"query_id", posexplode($"tk"))
      .select($"query_id", ($"pos" + 1).cast("long").as("rank"),
        $"col.id".as("neighbor_id"), $"col.score".as("cosine"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
    val viaWindow = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"neighbor_id", $"cosine")
    assert(viaAgg.orderBy("query_id", "rank").collect().toSeq ==
      viaWindow.orderBy("query_id", "rank").collect().toSeq)
  }

  test("knn ranking plans as ObjectHashAggregate with a partial pass, no Window sort") {
    val p = SparkEntry.queries("emb_knn_exact")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p.take(3000))
    assert(p.contains("partial_topk_by_score"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("null scores are skipped, never ranked") {
    val df = Seq((1L, Some(0.7), 1L), (1L, None, 2L), (1L, Some(0.9), 3L))
      .toDF("query_id", "cosine", "neighbor_id")
    val got = df.groupBy($"query_id")
      .agg(TopKByScore.topk($"cosine", $"neighbor_id", 2).as("tk"))
      .select(explode($"tk").as("e")).select($"e.id").as[Long].collect().toSeq
    assert(got == Seq(3L, 1L))
  }

  test("NaN scores are skipped, never admitted or ranked") {
    // a zero-norm vector yields cosine 0/0 = NaN; it must not displace
    // real neighbors nor surface in the ranking
    val df = Seq((1L, 0.7, 1L), (1L, Double.NaN, 2L), (1L, 0.9, 3L),
      (2L, Double.NaN, 4L))
      .toDF("query_id", "cosine", "neighbor_id")
    val got = df.groupBy($"query_id")
      .agg(TopKByScore.topk($"cosine", $"neighbor_id", 2).as("tk"))
      .select($"query_id", explode($"tk").as("e"))
      .select($"query_id", $"e.id").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 1L), (1L, 3L))) // group 2 had only NaN -> empty
  }

  test("lshTopK still matches bruteForceTopK head-to-head after the ranking swap") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter($"vec_id" < 5)
    val exact = CosineKNN.bruteForceTopK(emb, q, "vec_id", "embedding", k = 3)
      .collect()
    assert(exact.length == 15)
    // ranks are 1..k per query and cosines non-increasing within a query
    exact.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to 3L))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getDouble(3) >= b.getDouble(3)
        case _ => true
      })
    }
  }
}
