package graft

import graft.ext.text.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for decontamination pieces (manual:
  * `sbt "Test/runMain graft.ProfileDecontam <sfDir>"`). */
object ProfileDecontam {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sf, "documents")
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$tag%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (n=$n)")
    }
    time("scan only")(docs.count())
    time("tokens")(docs.select(TextFunctions.tokens(col("text")).as("t")).count())
    time("shingles n=3")(docs.select(TextFunctions.shingles(col("text"), 3).as("s")).count())
    time("shingles n=3 repart")(
      docs.repartition(8).select(TextFunctions.shingles(col("text"), 3).as("s")).count())
    time("explode shingles")(
      docs.select(explode(TextFunctions.shingles(col("text"), 3)).as("g")).count())
    time("explode shingles repart")(
      docs.repartition(8).select(explode(TextFunctions.shingles(col("text"), 3)).as("g")).count())
    time("eval grams distinct")(
      docs.filter(col("doc_id") % 97 === 0)
        .select(explode(TextFunctions.shingles(col("text"), 3)).as("g")).distinct().count())
    spark.stop()
  }
}
