package graft

import graft.operators.{FileManifest, ZOrder}
import org.apache.spark.sql.functions._

class FileManifestSpec extends SparkSpec {
  import spark.implicits._

  private def zTable(path: String): Unit = {
    // user_id spans only 0..14 at sf0.001 — scale by 68 (order- and
    // locality-preserving) so the bucketed dim exercises its full
    // 10-bit range and the interleave's high ub bits discriminate
    val base = Tables(spark, "/root/testdata/sf0.001", "events").select(
      ($"user_id" * 68).bitwiseAND(lit(1023L)).as("ub"),
      (expr("unix_micros(ts) div 3600000000") - lit(473352L))
        .bitwiseAND(lit(1023L)).as("hb"),
      $"event_id", $"value")
      .withColumn("zkey", ZOrder.zValue($"ub", $"hb", 10))
    ZOrder.cluster(base, "zkey", 8).write.parquet(path)
  }

  test("manifest-pruned read skips files and matches the full-scan filter on BOTH dims") {
    val path = tmpDir("manifest") + "/t"
    zTable(path)
    val manifest = FileManifest.build(spark, path, Seq("ub", "hb")).cache()
    try {
      val nFiles = manifest.count()
      assert(nFiles >= 4, s"fixture produced only $nFiles files")
      // a z-layout bounds BOTH dims per file, so a selective predicate
      // on EITHER column prunes — the single-sort layout only gives one
      for (c <- Seq("ub", "hb")) {
        val (lo, hi) = (lit(0L), lit(120L))
        val cand = FileManifest.candidateFiles(manifest, c, lo, hi)
        assert(cand.nonEmpty && cand.size < nFiles,
          s"$c: pruned ${cand.size} of $nFiles files — no skip")
        val pruned = FileManifest.prunedRead(spark, path, manifest, c, lo, hi)
          .select($"event_id").collect().map(_.getLong(0)).sorted
        val full = spark.read.parquet(path)
          .filter(col(c) >= lo && col(c) <= hi)
          .select($"event_id").collect().map(_.getLong(0)).sorted
        assert(pruned.sameElements(full), s"$c: pruned read lost or invented rows")
      }
    } finally manifest.unpersist()
  }

  test("empty range reads zero files but keeps the schema") {
    val path = tmpDir("manifest_empty") + "/t"
    zTable(path)
    val manifest = FileManifest.build(spark, path, Seq("ub"))
    val out = FileManifest.prunedRead(spark, path, manifest, "ub",
      lit(5000L), lit(6000L))
    assert(out.isEmpty)
    assert(out.columns.contains("event_id"))
  }
}
