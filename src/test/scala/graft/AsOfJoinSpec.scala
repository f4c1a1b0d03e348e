package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)

  test("asof join attaches latest right row at-or-before each left row") {
    val left = Seq(
      (1L, "u1", ts(10)), (2L, "u1", ts(30)), (3L, "u2", ts(5)),
      (4L, "u1", ts(20))).toDF("id", "key", "ts")
    val right = Seq(
      ("u1", ts(8), "a"), ("u1", ts(20), "b"), ("u1", ts(25), "c"),
      ("u2", ts(50), "z")).toDF("key", "ts", "tag")

    val got = AsOfJoin(left, right, "key", "ts", "ts", Seq("tag"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap

    assert(got == Map(
      1L -> Some("a"),   // latest <= ts(10) is ts(8)
      2L -> Some("c"),   // latest <= ts(30) is ts(25)
      4L -> Some("b"),   // exact tie at ts(20) is included (<=)
      3L -> None))       // u2 has no right row before ts(5)
  }

  test("null payload fields are carried faithfully (struct transport)") {
    val left = Seq((1L, "u1", ts(10))).toDF("id", "key", "ts")
    val right = Seq(
      ("u1", ts(5), Option.empty[String]),
      ("u1", ts(2), Some("older"))).toDF("key", "ts", "tag")
    val got = AsOfJoin(left, right, "key", "ts", "ts", Seq("tag")).collect()
    // the ts(5) row wins even though its payload field is null —
    // a naive last(ignoreNulls) per column would leak "older"
    assert(got.head.isNullAt(3))
  }

  test("tolerance nulls matches older than the staleness window") {
    val left = Seq((1L, "u1", ts(10)), (2L, "u1", ts(60))).toDF("id", "key", "ts")
    val right = Seq(("u1", ts(8), "fresh-for-1")).toDF("key", "ts", "tag")
    val got = AsOfJoin(left, right, "key", "ts", "ts", Seq("tag"),
        tolerance = Some(org.apache.spark.sql.functions.expr("INTERVAL 10 MINUTES")))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(got == Map(
      1L -> Some("fresh-for-1"), // 2 minutes stale: within tolerance
      2L -> None))               // 52 minutes stale: gated out
  }
}
