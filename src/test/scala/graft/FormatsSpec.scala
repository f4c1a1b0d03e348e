package graft

import org.apache.spark.sql.functions._

/** Source/sink format breadth: CSV and ORC round-trips through the
  * same normalize semantics the JSON path uses. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sample =
    Tables(spark, "/root/testdata/sf0.001", "customer").limit(50)

  test("csv round-trip with header and schema preserves rows") {
    val dir = tmpDir("csv") + "/t"
    sample.write.option("header", "true").csv(dir)
    val back = spark.read
      .option("header", "true")
      .schema(sample.schema)
      .csv(dir)
    assert(back.count() == 50)
    val a = sample.orderBy($"c_custkey").collect()
    val b = back.orderBy($"c_custkey").collect()
    assert(a.sameElements(b))
  }

  test("csv tolerates malformed rows in PERMISSIVE mode") {
    val dir = tmpDir("csvbad")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/x.csv"),
      "id,v\n1,2\nnot-a-number,3\n4,5\n".getBytes)
    val got = spark.read
      .option("header", "true")
      .schema("id LONG, v LONG")
      .csv(dir)
    assert(got.count() == 3)
    assert(got.filter($"id".isNull).count() == 1) // coerced, not fatal
  }

  test("orc round-trip preserves rows and types") {
    val dir = tmpDir("orc") + "/t"
    sample.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == sample.schema)
    assert(back.orderBy($"c_custkey").collect()
      .sameElements(sample.orderBy($"c_custkey").collect()))
  }

  test("schema evolution: mergeSchema unions columns across parquet batches") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("evolve") + "/t"
    // batch 1: (id, a); batch 2 adds column b — the additive-column
    // evolution every long-lived ingest table goes through
    Seq((1L, "x")).toDF("id", "a").write.parquet(dir)
    Seq((2L, "y", 9L)).toDF("id", "a", "b").write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "a", "b"))
    val rows = merged.orderBy($"id")
      .select($"id", $"a", $"b").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).isNullAt(2)) // old rows: b null
    assert(rows(1).getLong(0) == 2L && rows(1).getLong(2) == 9L)
    // without mergeSchema the footer-sampled schema may drop b — the
    // explicit option is the contract the ingest jobs rely on
    assert(spark.read.option("mergeSchema", "true").parquet(dir)
      .filter(col("b").isNotNull).count() == 1)
  }
}
