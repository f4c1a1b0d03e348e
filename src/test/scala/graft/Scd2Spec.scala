package graft

import graft.operators.Scd2
import org.apache.spark.sql.functions._

/** SCD2 merge semantics: within-batch latest-per-key, close-on-
  * redelivery, pass-through of untouched keys, as-of reads. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val ord = Seq(col("seq").desc)

  test("initial load keeps only the latest in-batch row per key") {
    val b1 = Seq((1L, "a", 1L), (1L, "b", 2L), (2L, "x", 1L))
      .toDF("k", "v", "seq")
    val h = Scd2.mergeBatch(None, b1, Seq("k"), ord, 1)
      .orderBy("k").collect()
    assert(h.length === 2)
    assert(h(0).getAs[String]("v") === "b")       // latest of key 1
    assert(h.forall(_.getAs[Boolean]("is_current")))
    assert(h.forall(_.getAs[Int]("valid_from") === 1))
  }

  test("redelivery closes the current row; untouched keys pass through") {
    val b1 = Seq((1L, "a", 1L), (2L, "x", 1L)).toDF("k", "v", "seq")
    val b2 = Seq((1L, "c", 1L)).toDF("k", "v", "seq")
    val h2 = Scd2.mergeBatch(Some(Scd2.mergeBatch(None, b1, Seq("k"), ord, 1)),
      b2, Seq("k"), ord, 2)
    val rows = h2.orderBy("k", "valid_from").collect()
    assert(rows.length === 3)
    val k1v1 = rows(0); val k1v2 = rows(1); val k2 = rows(2)
    assert(k1v1.getAs[String]("v") === "a" && !k1v1.getAs[Boolean]("is_current")
      && k1v1.getAs[Int]("valid_to") === 2)
    assert(k1v2.getAs[String]("v") === "c" && k1v2.getAs[Boolean]("is_current")
      && k1v2.isNullAt(k1v2.fieldIndex("valid_to")))
    assert(k2.getAs[String]("v") === "x" && k2.getAs[Boolean]("is_current"))
  }

  test("asOf reconstructs each version's state") {
    val b1 = Seq((1L, "a", 1L), (2L, "x", 1L)).toDF("k", "v", "seq")
    val b2 = Seq((1L, "c", 1L), (3L, "n", 1L)).toDF("k", "v", "seq")
    val h = Scd2.mergeBatch(Some(Scd2.mergeBatch(None, b1, Seq("k"), ord, 1)),
      b2, Seq("k"), ord, 2)
    val v1 = Scd2.asOf(h, 1).orderBy("k").collect()
    assert(v1.map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a"), (2L, "x")))
    val v2 = Scd2.asOf(h, 2).orderBy("k").collect()
    assert(v2.map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "c"), (2L, "x"), (3L, "n")))
  }

  test("three batches accumulate a full chain for a hot key") {
    val mk = (v: String) => Seq((1L, v, 1L)).toDF("k", "v", "seq")
    val h = (2 to 3).foldLeft(Scd2.mergeBatch(None, mk("v1"), Seq("k"), ord, 1)) {
      (acc, ver) => Scd2.mergeBatch(Some(acc), mk(s"v$ver"), Seq("k"), ord, ver)
    }
    val rows = h.orderBy("valid_from").collect()
    assert(rows.map(_.getAs[String]("v")).toSeq === Seq("v1", "v2", "v3"))
    assert(rows.map(r => if (r.isNullAt(r.fieldIndex("valid_to"))) -1
      else r.getAs[Int]("valid_to")).toSeq === Seq(2, 3, -1))
    assert(rows.map(_.getAs[Boolean]("is_current")).toSeq
      === Seq(false, false, true))
  }
}
