package graft

import graft.ext.profile.Expectations
import graft.ext.profile.Expectations._
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("each expectation counts its violations; null counts as a violation") {
    val df = Seq(
      (Some(1L), Some("a"), Some(10.0)),
      (Some(2L), Some("zzz"), Some(-1.0)), // bad type, bad range
      (None, None, None),                  // all nulls
      (Some(2L), Some("b"), Some(5.0))     // duplicate key
    ).toDF("id", "kind", "v")
    val out = Expectations.validate(df,
      Seq(
        notNull("id_not_null", $"id"),
        inSet("kind_known", $"kind", Seq("a", "b")),
        inRange("v_in_range", $"v", lit(0.0), lit(100.0))),
      uniqueKey = Some(("id_unique", $"id")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(out("id_not_null") == ((1L, false)))
    assert(out("kind_known") == ((2L, false)))  // "zzz" + null
    assert(out("v_in_range") == ((2L, false)))  // -1.0 + null
    // 4 rows, 3 non-null distinct... count - count_distinct ignores
    // nulls on both sides? count(*)=4, distinct ids {1,2}=2 → 2? No:
    // count_distinct skips nulls, so 4 - 2 = 2 (the dup AND the null)
    assert(out("id_unique") == ((2L, false)))
  }

  test("an empty frame reports zero violations for every check (no NPE)") {
    val df = Seq.empty[(Long, String)].toDF("id", "kind")
    val out = Expectations.validate(df,
      Seq(notNull("id_not_null", $"id")),
      uniqueKey = Some(("id_unique", $"id"))).collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L && r.getBoolean(3)))
  }

  test("a clean frame passes every check") {
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "kind", "v")
    val out = Expectations.validate(df,
      Seq(notNull("id_not_null", $"id"),
        inSet("kind_known", $"kind", Seq("a", "b")),
        inRange("v_in_range", $"v", lit(0.0), lit(100.0))),
      uniqueKey = Some(("id_unique", $"id")))
      .collect()
    assert(out.forall(_.getBoolean(3)))
    assert(out.forall(_.getLong(2) == 2L))
  }

  test("reserved and duplicate check names are rejected up front") {
    val df = Seq((1L, "a")).toDF("id", "kind")
    val e1 = intercept[IllegalArgumentException] {
      Expectations.validate(df, Seq(notNull("__n", $"id")))
    }
    assert(e1.getMessage.contains("reserved"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Expectations.validate(df,
        Seq(notNull("same", $"id"), notNull("same", $"kind")))
    }
    assert(e2.getMessage.contains("duplicate"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Expectations.validate(df, Seq(notNull("k", $"id")),
        uniqueKey = Some(("k", $"id")))
    }
    assert(e3.getMessage.contains("duplicate"), e3.getMessage)
  }
}
