package graft

import graft.ext.text.DomainCap
import org.apache.spark.sql.functions._

/** Per-domain frequency caps: first-N-by-id semantics, under-cap
  * domains untouched, domain totals reported pre-cap, and the
  * no-window/no-sort plan contract the operator exists for. */
class DomainCapSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "source")

  test("keeps the N lowest ids per domain; under-cap domains keep all") {
    val d = docsDf(
      (5L, "a"), (1L, "a"), (9L, "a"), (3L, "a"),  // a: 4 docs, cap 2
      (7L, "b"), (2L, "b"),                        // b: exactly at cap
      (8L, "c"))                                   // c: under cap
    val out = DomainCap.cap(d, "doc_id", "source", maxPerDomain = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, "a", 4L), (2L, "b", 2L), (3L, "a", 4L),
      (7L, "b", 2L), (8L, "c", 1L)))
  }

  test("hot-domain skew: cap output is N per domain regardless of slice size") {
    val hot = (0L until 1000L).map(i => (i, "hot"))
    val cold = Seq((2000L, "cold"))
    val out = DomainCap.cap(docsDf((hot ++ cold): _*),
      "doc_id", "source", maxPerDomain = 5).collect()
    assert(out.count(_.getString(1) == "hot") === 5)
    assert(out.filter(_.getString(1) == "hot").map(_.getLong(0)).sorted
      .toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.count(_.getString(1) == "cold") === 1)
  }

  test("null ids fail loudly instead of silently under-filling the domain") {
    val mixed = Seq((Some(1L), "a"), (None, "a"), (Some(3L), "a"))
      .toDF("doc_id", "source")
    val e1 = intercept[Exception] {
      DomainCap.cap(mixed, "doc_id", "source", 2).collect()
    }
    assert(e1.getMessage.contains("domain-cap id column"), e1.getMessage)
    // all-null domain: empty heap — the explode_outer path must still
    // surface the violation, not drop the group row
    val allNull = Seq((Option.empty[Long], "a"), (Option.empty[Long], "a"))
      .toDF("doc_id", "source")
    val e2 = intercept[Exception] {
      DomainCap.cap(allNull, "doc_id", "source", 2).collect()
    }
    assert(e2.getMessage.contains("domain-cap id column"), e2.getMessage)
  }

  test("plan: bounded-heap aggregate, no Window, no Sort operator") {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val plan = DomainCap.cap(d, "doc_id", "source", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("Sort"), plan.take(3000))
  }
}
