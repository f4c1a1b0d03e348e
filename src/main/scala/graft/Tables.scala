package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated parquet tables (TESTDATA.md).
  *
  * Each table is one parquet file under `$sfDir/<name>.parquet`.
  * Reads are plain `spark.read.parquet`, so Catalyst pushes filters
  * and prunes columns down to the scan — callers should `select` /
  * `filter` early and let pushdown do the rest. At 100 TB these
  * would be partitioned parquet/iceberg table roots instead of
  * single files; the API shape (name → DataFrame) is unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** SQL-first entry point: register every corpus table as a temp
    * view (same names the oracles use) plus the graft native
    * functions, so `spark.sql("SELECT fvec_dot(...) FROM embeddings")`
    * works verbatim. Views are lazy — no data is read here. */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    all.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
    graft.functions.FloatVectorDot.register(spark)
    graft.functions.SimHash64.register(spark)
    graft.functions.TopKFreq.register(spark)
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name != "events")
      return spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects.
    // Read nanos as long and floor-convert to µs timestamps — the
    // same truncation DuckDB applies, so oracles stay value-equal.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
}
