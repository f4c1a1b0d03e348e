package graft

import org.apache.spark.sql.SparkSession

/** Scratch: does Spark 4 inject a runtime bloom filter on a selective
  * shuffle join here? (`sbt "Test/runMain graft.ProfileBloom"`) */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val li = Tables(spark, sf, "lineitem")
    val ord = Tables(spark, sf, "orders").filter($"o_orderpriority" === "1-URGENT")
    val j = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").count()
    val p = j.queryExecution.optimizedPlan.toString
    println("OPTIMIZED contains bloom: " + p.toLowerCase.contains("bloom"))
    println("OPTIMIZED contains might_contain: " + p.toLowerCase.contains("might_contain"))
    println(p.take(3000))
    spark.stop()
  }
}
