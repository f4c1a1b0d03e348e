package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (r14 optimization evidence): dump the tfidf MINING plan
  * — the public query returns a scan of its materialized output, so
  * the registry PlanDump can't show the pair-join pipeline. Writes
  * the executed plan of the lazy mining frame to plans/r14/, and a
  * "before" twin built from the same components WITHOUT the r14
  * repartition(doc_a) so the exchange-count delta is on record.
  *
  *   sbt "Test/runMain graft.ProfileTfidfPlan [sfDir]"
  */
object ProfileTfidfPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import org.apache.spark.sql.functions._
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, dir, "documents")

    def dump(tag: String, withRepartition: Boolean): Unit = {
      val (out, w) =
        if (withRepartition)
          graft.ext.text.InvertedIndex.tfidfPairsPlan(
            docs, "doc_id", "text", 3, 40L, 0.4, hashTerms = true)
        else {
          // the pre-r14 dots shape: no doc_a repartition before the
          // pair aggregate (everything else identical)
          val nDocs = docs.count()
          val wt = graft.ext.text.InvertedIndex.weightedTerms(
            docs, "doc_id", "text", 3, 40L, nDocs, hashTerms = true)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val nrm = wt.groupBy(col("doc")).agg(sum(col("w") * col("w")).as("nn"))
          val dots = wt.select(col("term"), col("doc").as("doc_a"), col("w").as("wa"))
            .join(wt.select(col("term"), col("doc").as("doc_b"), col("w").as("wb")),
              Seq("term"))
            .filter(col("doc_a") < col("doc_b"))
            .groupBy(col("doc_a"), col("doc_b"))
            .agg(sum(col("wa") * col("wb")).as("dot"))
          val o = dots
            .join(nrm.select(col("doc").as("doc_a"), col("nn").as("na"))
              .hint("shuffle_hash"), Seq("doc_a"))
            .join(nrm.select(col("doc").as("doc_b"), col("nn").as("nb"))
              .hint("shuffle_hash"), Seq("doc_b"))
            .withColumn("cosine", round(
              col("dot").cast("double") /
                (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 9))
            .filter(col("cosine") >= 0.4)
            .select(col("doc_a"), col("doc_b"), col("cosine"))
          (o, wt)
        }
      val plan = out.queryExecution.executedPlan
      plan.execute().foreach(_ => ())
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/r14/docs_tfidf_pairs_mining_$tag.txt"),
        s"== docs_tfidf_pairs MINING plan ($tag, $dir) ==\n" + plan.toString)
      w.unpersist()
      val ex = plan.toString.linesIterator.count(_.trim.startsWith("+- Exchange") )
      println(s"[tfidfplan] $tag dumped")
    }
    dump("before", withRepartition = false)
    spark.catalog.clearCache()
    dump("after", withRepartition = true)
    spark.stop()
  }
}
