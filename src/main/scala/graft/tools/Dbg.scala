package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", 512)
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val yearMicros = 365L * 86400 * 1000000
    val epoch0 = 1704067200000000L
    val n = 20000000L
    val pts = spark.range(n).select(
      timestamp_micros(lit(epoch0) + pmod(xxhash64(col("id")), lit(yearMicros))).as("p_ts"),
      (pmod(col("id"), lit(13)) + lit(0.25)).cast("double").as("p_value"))
    val iv = spark.range(200000L).select(col("id").as("iid"),
      timestamp_micros(lit(epoch0) + pmod(xxhash64(col("id"), lit(2)), lit(yearMicros))).as("s"),
      timestamp_micros(lit(epoch0) + pmod(xxhash64(col("id"), lit(2)), lit(yearMicros)) + lit(3600L*1000000)).as("e"))
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2fs rows=$r")
    }
    // warmups
    Force.rows(graft.operators.IntervalAgg.countSum(pts.limit(50000), iv.limit(5000), "p_ts","p_value","iid","s","e", 60L))
    for (rep <- 1 to 2) {
      t(s"A k-adaptive rep$rep") { Force.rows(graft.operators.IntervalAgg.countSum(pts, iv, "p_ts","p_value","iid","s","e", 60L)) }
      t(s"B single-level rep$rep") { Force.rows(graft.operators.IntervalAgg.countSum(pts, iv, "p_ts","p_value","iid","s","e", 60L, subBuckets=1L)) }
      t(s"C k~4000 rep$rep") { Force.rows(graft.operators.IntervalAgg.countSum(pts, iv, "p_ts","p_value","iid","s","e", 60L, targetBuckets=1250L)) }
    }
    spark.stop()
  }
}
