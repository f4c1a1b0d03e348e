package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave on plain Scala longs. */
  private def zRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("column z-value matches the reference bit interleave") {
    val rnd = new scala.util.Random(11)
    val cases = Seq((0L, 0L), (1023L, 1023L), (1L, 0L), (0L, 1L)) ++
      Seq.fill(200)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val got = cases.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue($"a", $"b", 10).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) == zRef(a, b, 10), s"($a,$b)")
    }
  }

  test("z-prefix tiles bound BOTH dimensions (≤ 2^7 out of 2^10)") {
    val out = SparkEntry.queries("q_zorder_layout")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 127, s"ub range in tile ${r.getLong(0)}")
      assert(r.getLong(5) - r.getLong(4) <= 127, s"hb range in tile ${r.getLong(0)}")
    }
    // tiles cover the corpus
    val n = Tables(spark, "/root/testdata/sf0.001", "events").count()
    assert(out.map(_.getLong(1)).sum == n)
  }

  test("at-rest z-layout tightens per-file stats on BOTH dims vs arrival order") {
    val base = Tables(spark, "/root/testdata/sf0.001", "events").select(
      $"user_id".bitwiseAND(lit(1023L)).as("ub"),
      (expr("unix_micros(ts) div 3600000000") - lit(473352L))
        .bitwiseAND(lit(1023L)).as("hb"))
      .withColumn("zkey", ZOrder.zValue($"ub", $"hb", 10))

    def fileStatWidth(path: String): Double = {
      val widths = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max($"ub") - min($"ub") + max($"hb") - min($"hb")).as("w"))
        .select($"w").as[Long].collect()
      widths.sum.toDouble / widths.length
    }

    val zPath = tmpDir("zorder") + "/z"
    ZOrder.cluster(base, "zkey", 8).write.parquet(zPath)
    val plainPath = tmpDir("zorder") + "/plain"
    base.repartition(8).write.parquet(plainPath)

    val zWidth = fileStatWidth(zPath)
    val plainWidth = fileStatWidth(plainPath)
    // round-robin files span ~the whole (ub, hb) space; z-files tile it
    assert(zWidth < plainWidth / 2, s"z=$zWidth plain=$plainWidth")
  }
}
