package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc cardinality probe for the minhash candidate pipeline (run
  * manually: `sbt "Test/runMain graft.ProfileMinhashStages <sfDir>"`).
  * Rebuilds the mining stages with the registered query's parameters
  * and prints the cardinality + wall time of each, so super-linear
  * rungs on the scale curve can be attributed to a named stage. */
object ProfileMinhashStages {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.dedup.NearDup

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables(spark, sf, "documents")
    // same parameters as LlmQueries.qMinhash
    val (withSh, shCache) = NearDup.shingleSets(docs, "doc_id", "text", 2)
    val withSig = withSh
      .select(col("doc"), NearDup.minhashSignature(col("sh"), 64).as("sig"))
      .cache()
    val buckets = withSig.select(
      col("doc"),
      explode(transform(sequence(lit(0), lit(15)), b =>
        struct(b.as("band"),
          concat_ws(",", slice(col("sig"), b * 4 + 1, lit(4))).as("sig"))))
        .as("bucket"))
      .select(col("doc"), col("bucket.band"), col("bucket.sig"))
      .cache()
    timed("bucket rows")(println("  n=" + buckets.count()))
    val sizes = buckets.groupBy("band", "sig").count().cache()
    timed("distinct buckets")(println("  n=" + sizes.count()))
    timed("bucket size histogram") {
      sizes.select(
        sum(when(col("count") > 1000, col("count"))).as("dropped_rows"),
        sum(when(col("count") <= 1000, col("count") * (col("count") - 1) / 2))
          .as("cand_pairs_with_dup"),
        max("count").as("max_bucket"),
        expr("approx_percentile(count, array(0.5, 0.9, 0.99))").as("p50_90_99"))
        .show(false)
    }
    val capped = buckets
      .withColumn("__bn",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("sig"))))
      .filter(col("__bn") <= 1000)
      .drop("__bn")
    val candidates = capped.as("l")
      .join(capped.as("r"), Seq("band", "sig"))
      .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
    val distinctCand = candidates.dropDuplicates("doc_a", "doc_b").cache()
    timed("distinct candidates")(println("  n=" + distinctCand.count()))
    val withSets = distinctCand
      .join(withSh.select(col("doc").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(withSh.select(col("doc").as("doc_b"), col("sh").as("sh_b")), "doc_b")
    timed("verify (intersect)") {
      val n = withSets
        .withColumn("__i", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
        .withColumn("jaccard",
          col("__i") / (size(col("sh_a")) + size(col("sh_b")) - col("__i")))
        .filter(col("jaccard") >= 0.5).count()
      println("  verified=" + n)
    }
    spark.stop()
  }
}
