package graft

import graft.functions.FloatVectorDot
import org.apache.spark.sql.functions._

class FloatVectorDotSpec extends SparkSpec {
  import spark.implicits._

  test("matches the HOF formulation bit-for-bit and handles nulls") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (2L, Seq(0.1f, -0.2f), Seq(0.3f, 0.4f)),
      (3L, Seq.empty[Float], Seq.empty[Float]))
      .toDF("id", "a", "b")
    val hof = aggregate(
      zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select($"id", FloatVectorDot.dot($"a", $"b").as("native"), hof.as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"row ${r.getLong(0)}: native ${r.getDouble(1)} vs hof ${r.getDouble(2)}")
    }
    // null array propagates null
    val withNull = Seq((1L, Option(Seq(1.0f)), Option.empty[Seq[Float]]))
      .toDF("id", "a", "b")
    assert(withNull.select(FloatVectorDot.dot($"a", $"b")).collect().head.isNullAt(0))
  }

  test("works from SQL after registration and on real embeddings") {
    FloatVectorDot.register(spark)
    Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb_v")
    val got = spark.sql(
      "SELECT vec_id, fvec_dot(embedding, embedding) AS sq FROM emb_v LIMIT 5")
      .collect()
    assert(got.length == 5 && got.forall(_.getDouble(1) > 0))
  }
}
