package graft

import graft.sinks.{JdbcUpsertSink, ParquetUpsertSink}

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: insert then update is last-write-wins and idempotent") {
    val path = tmpDir("upsert") + "/t"
    val v1 = Seq(("k1", "a", 1), ("k2", "b", 1)).toDF("id", "payload", "ver")
    ParquetUpsertSink.upsert(spark, v1, path, "id")
    // update k2, insert k3
    val v2 = Seq(("k2", "B", 2), ("k3", "c", 2)).toDF("id", "payload", "ver")
    ParquetUpsertSink.upsert(spark, v2, path, "id")
    val got = spark.read.parquet(path).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(got == Map("k1" -> ("a", 1), "k2" -> ("B", 2), "k3" -> ("c", 2)))
    // replay the same batch → identical state (idempotence)
    ParquetUpsertSink.upsert(spark, v2, path, "id")
    assert(spark.read.parquet(path).count() == 3)
  }

  test("upsert dedups within a batch by order column") {
    val path = tmpDir("upsert2") + "/t"
    val batch = Seq(("k1", "old", 1), ("k1", "new", 2)).toDF("id", "payload", "ver")
    ParquetUpsertSink.upsert(spark, batch, path, "id", orderCol = Some("ver"))
    val got = spark.read.parquet(path).collect()
    assert(got.length == 1 && got.head.getString(1) == "new")
  }

  test("partitioned upsert only rewrites touched partitions") {
    val root = tmpDir("upsert3") + "/t"
    val day1 = Seq(("k1", "2022-11-24", "a"), ("k2", "2022-11-25", "b"))
      .toDF("id", "dt", "payload")
    ParquetUpsertSink.upsertPartitioned(spark, day1, root, "id", "dt")
    // touch only dt=2022-11-25
    val day2 = Seq(("k2", "2022-11-25", "B"), ("k3", "2022-11-25", "c"))
      .toDF("id", "dt", "payload")
    val p24 = new java.io.File(s"$root/dt=2022-11-24")
    val before = p24.listFiles().map(_.getName).toSet
    ParquetUpsertSink.upsertPartitioned(spark, day2, root, "id", "dt")
    // untouched partition files unchanged
    assert(p24.listFiles().map(_.getName).toSet == before)
    val got = spark.read.parquet(root).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("payload")).toMap
    assert(got == Map("k1" -> "a", "k2" -> "B", "k3" -> "c"))
  }

  test("jdbc upsert SQL is parameterized ON CONFLICT / MERGE") {
    val sql = JdbcUpsertSink.onConflictSql("t", Seq("id", "a", "b"), "id")
    assert(sql == "INSERT INTO t (id, a, b) VALUES (?, ?, ?) " +
      "ON CONFLICT (id) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b")
    val merge = JdbcUpsertSink.mergeSql("t", "t_staging", Seq("id", "a"), "id")
    assert(merge.contains("MERGE INTO t t USING t_staging s ON t.id = s.id"))
    assert(merge.contains("WHEN MATCHED THEN UPDATE SET a = s.a"))
    assert(merge.contains("WHEN NOT MATCHED THEN INSERT (id, a) VALUES (s.id, s.a)"))
  }
}
