package graft

import graft.ext.text.TextFunctions
import org.apache.spark.sql.functions._

class MaxBigramShareSpec extends SparkSpec {
  import spark.implicits._

  test("hand cases: runs, alternations, short docs") {
    val df = Seq(
      (0L, "a a a a"),     // (a,a) x3 of 3 bigrams -> 1.0
      (1L, "a b a b"),     // (a,b) x2 of 3 -> 2/3
      (2L, "one"),         // no bigram -> 0.0
      (3L, " "),           // empty token set -> 0.0
      (4L, "x y z w"))     // all distinct -> 1/3
      .toDF("id", "text")
    val got = df.select($"id",
        TextFunctions.repetitionScore(TextFunctions.tokens($"text")).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(got(0L) == 1.0)
    assert(math.abs(got(1L) - 2.0 / 3.0) < 1e-15)
    assert(got(2L) == 0.0)
    assert(got(3L) == 0.0)
    assert(math.abs(got(4L) - 1.0 / 3.0) < 1e-15)
  }

  test("bit-parity with the HOF reference over the corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val toks = TextFunctions.tokens($"text")
    val both = docs.select($"doc_id",
        TextFunctions.repetitionScore(toks).as("native"),
        TextFunctions.repetitionScoreReference(toks).as("ref"))
      .as[(Long, Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (id, n, r) =>
      assert(n == r, s"doc $id: native $n != reference $r")
    }
  }
}
