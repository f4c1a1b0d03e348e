package graft

import graft.functions.PolyHash
import org.apache.spark.sql.functions._

class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  private def ref(s: String, base: Int): Long =
    s.codePoints().toArray.foldLeft(0L)((h, cp) => (h * base + cp) % PolyHash.P)

  test("matches the fold definition, including unicode code points") {
    val inputs = Seq("", "a", "abc", "hello world", "héllo", "a😀b")
    val df = inputs.toDF("s")
    val got = df.select(
        PolyHash.polyhash($"s", 31).as("h31"),
        PolyHash.polyhash($"s", 37).as("h37"))
      .collect()
    inputs.zip(got).foreach { case (s, r) =>
      assert(r.getLong(0) == ref(s, 31), s"h31('$s')")
      assert(r.getLong(1) == ref(s, 37), s"h37('$s')")
    }
    // null propagates
    assert(Seq(Option.empty[String]).toDF("s")
      .select(PolyHash.polyhash($"s", 31)).collect().head.isNullAt(0))
  }

  test("packed one-pass form decomposes to the two base hashes") {
    val inputs = Seq("", "token", "hello world", "héllo😀")
    val rows = inputs.toDF("s")
      .select(PolyHash.polyhashPacked($"s").as("p"),
        PolyHash.polyhash($"s", 31).as("h31"),
        PolyHash.polyhash($"s", 37).as("h37"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) >> 30 == r.getLong(1))
      assert((r.getLong(0) & 0x3FFFFFFFL) == r.getLong(2))
    }
  }

  test("values stay below P and the two bases disagree") {
    val rows = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(PolyHash.polyhash($"text", 31).as("a"),
        PolyHash.polyhash($"text", 37).as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < PolyHash.P)
      assert(r.getLong(1) >= 0 && r.getLong(1) < PolyHash.P)
    }
    assert(rows.count(r => r.getLong(0) != r.getLong(1)) > rows.length / 2)
  }
}
