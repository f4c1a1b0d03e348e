package graft

import graft.ext.graph.PageRank
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference of the exact integer update rule. */
  private def refRanks(
      edges: Seq[(Long, Long, Long)], iters: Int, scale: Long)
      : Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val wout = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val teleport = 15L * scale / 100L
    var r = nodes.map(_ -> scale).toMap
    (1 to iters).foreach { _ =>
      val inflow = edges.groupBy(_._2).view.mapValues(_.map { case (s, _, w) =>
        r(s) * 85L * w / (100L * wout(s))
      }.sum).toMap
      r = nodes.map(n => n -> (teleport + inflow.getOrElse(n, 0L))).toMap
    }
    r
  }

  test("matches the plain-Scala integer reference on a random graph, bit for bit") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 200).map { _ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong, (rnd.nextInt(5) + 1).toLong)
    }.distinct
    val got = PageRank.ranks(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        iters = 4)
      .as[(Long, Long)].collect().toMap
    val expect = refRanks(edges, iters = 4, scale = 1000000000L)
    assert(got == expect)
  }

  test("a two-node symmetric graph converges to equal ranks") {
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val got = PageRank.ranks(edges, "src", "dst", "w", iters = 6)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L))
    // fixed point of r = 0.15*scale + 0.85*r is scale (minus div leak)
    assert(math.abs(got(1L) - 1000000000L) < 10L)
  }

  test("rank mass is conserved up to teleport flow and division leak") {
    val edges = Seq(
      (1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 3L), (3L, 2L, 3L),
      (3L, 1L, 1L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val got = PageRank.ranks(edges, "src", "dst", "w", iters = 8)
      .as[(Long, Long)].collect().toMap
    val mass = got.values.sum
    // symmetric strongly connected graph: total mass stays within the
    // floor-division leak of 3 * scale
    assert(mass <= 3L * 1000000000L && mass > 3L * 1000000000L - 1000L, s"mass $mass")
  }

  test("a hub with more weighted in-links outranks leaf nodes") {
    // star: hub 0 exchanges with leaves 1..9 symmetrically
    val edges = (1L to 9L).flatMap(l => Seq((0L, l, 1L), (l, 0L, 1L)))
      .toDF("src", "dst", "w")
    val got = PageRank.ranks(edges, "src", "dst", "w", iters = 6)
      .as[(Long, Long)].collect().toMap
    (1L to 9L).foreach(l => assert(got(0L) > got(l)))
    // leaves are symmetric — identical ranks
    assert((1L to 9L).map(got).distinct.size == 1)
  }

  test("symmetricEdges fast path is bit-identical to the general form AND the reference") {
    // random graph, symmetrized: both directions of every drawn edge,
    // weights tied to the unordered pair so the two directions agree
    val rnd = new scala.util.Random(17)
    val base = (0 until 150).map { _ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong, (rnd.nextInt(5) + 1).toLong)
    }.filter(e => e._1 != e._2).map { case (a, b, w) =>
      (math.min(a, b), math.max(a, b), w)
    }.distinct
    val edges = (base ++ base.map(e => (e._2, e._1, e._3)))
      .toDF("src", "dst", "w")
    val fast = PageRank.ranks(edges, "src", "dst", "w", iters = 4,
        symmetricEdges = true)
      .as[(Long, Long)].collect().toMap
    val general = PageRank.ranks(edges, "src", "dst", "w", iters = 4)
      .as[(Long, Long)].collect().toMap
    val expect = refRanks(
      (base ++ base.map(e => (e._2, e._1, e._3))), iters = 4,
      scale = 1000000000L)
    assert(fast == general)
    assert(fast == expect)
  }

  test("registry query: kinds partition the node space and ranks are positive") {
    val df = SparkEntry.queries("q_pagerank")(spark, "/root/testdata/sf0.001")
    val rows = df.as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 > 0))
    val kinds = rows.map(_._1).toSet
    assert(kinds == Set("customer", "supplier"))
    // suppliers serve many customers: the best-connected supplier
    // must outrank the median customer
    val topSupp = rows.filter(_._1 == "supplier").map(_._3).max
    val custRanks = rows.filter(_._1 == "customer").map(_._3).sorted
    assert(topSupp > custRanks(custRanks.length / 2))
  }
}
