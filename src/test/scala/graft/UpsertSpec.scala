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

  test("upsert keeps exactly one row per key when rows tie on the max orderCol") {
    // two DISTINCT rows tying on (key, max ver): the key-unique table
    // invariant (the reference's ON CONFLICT guarantee) must hold
    // anyway — the deterministic tie-break keeps the row with the
    // highest full-row hash, and the choice is stable across runs
    val batch = Seq(("k1", "a", 2), ("k1", "b", 2), ("k1", "old", 1),
      ("k2", "x", 7)).toDF("id", "payload", "ver")
    val survivors = (1 to 2).map { i =>
      val path = tmpDir(s"upsert_tie$i") + "/t"
      ParquetUpsertSink.upsert(spark, batch, path, "id", orderCol = Some("ver"))
      val rows = spark.read.parquet(path).collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getInt(2))).toMap
      assert(rows.size == 2, s"key-unique invariant violated: ${rows.mkString(",")}")
      assert(rows("k1")._2 == 2 && Set("a", "b").contains(rows("k1")._1))
      assert(rows("k2") == (("x", 7)))
      rows("k1")
    }
    assert(survivors(0) == survivors(1), "tie-break is not deterministic")
    // exact byte-duplicate ties collapse to one row too
    val dupPath = tmpDir("upsert_tie_dup") + "/t"
    val dups = Seq(("k1", "same", 2), ("k1", "same", 2)).toDF("id", "payload", "ver")
    ParquetUpsertSink.upsert(spark, dups, dupPath, "id", orderCol = Some("ver"))
    assert(spark.read.parquet(dupPath).count() == 1)
  }

  test("upsert never drops a key whose orderCol is null") {
    val path = tmpDir("upsert_nullord") + "/t"
    // k1: null loses to the non-null ver; k2: ALL vers null — the key
    // must still land (max() ignoring nulls made the old equality
    // semi-join silently drop it)
    val batch = Seq(("k1", "late", Some(2)), ("k1", "nullver", None),
      ("k2", "only", None)).toDF("id", "payload", "ver")
    ParquetUpsertSink.upsert(spark, batch, path, "id", orderCol = Some("ver"))
    val got = spark.read.parquet(path).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("k1" -> "late", "k2" -> "only"))
  }

  test("upsert rejects null keys loudly (both forms)") {
    val path = tmpDir("upsert_nullkey") + "/t"
    val bad = Seq((null: String, "x", "2022-11-24")).toDF("id", "payload", "dt")
    val e1 = intercept[IllegalArgumentException] {
      ParquetUpsertSink.upsert(spark, bad, path, "id")
    }
    assert(e1.getMessage.contains("null values in upsert key column"))
    val e2 = intercept[IllegalArgumentException] {
      ParquetUpsertSink.upsertPartitioned(spark, bad, path, "id", "dt")
    }
    assert(e2.getMessage.contains("null values in upsert key column"))
    assert(!new java.io.File(path).exists()) // nothing written
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

  test("partitioned upsert rejects null partition values loudly") {
    val root = tmpDir("upsert_null") + "/t"
    val seed = Seq(("k1", "2022-11-24", "a")).toDF("id", "dt", "payload")
    ParquetUpsertSink.upsertPartitioned(spark, seed, root, "id", "dt")
    // a null dt would land in __HIVE_DEFAULT_PARTITION__, which the
    // string-matched touched-partition logic cannot address — must fail
    val bad = Seq(("k2", null: String, "b")).toDF("id", "dt", "payload")
    val e = intercept[IllegalArgumentException] {
      ParquetUpsertSink.upsertPartitioned(spark, bad, root, "id", "dt")
    }
    assert(e.getMessage.contains("null values in partition column"))
    // table untouched by the failed batch
    assert(spark.read.parquet(root).count() == 1)
  }

  test("upsert promote is crash-safe: a complete table survives a kill at any step") {
    import org.apache.hadoop.fs.Path
    val path = tmpDir("upsert_crash") + "/t"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v1 = Seq(("k1", "a"), ("k2", "b")).toDF("id", "payload")
    ParquetUpsertSink.upsert(spark, v1, path, "id")

    // Simulate a crash AFTER staging was fully written but BEFORE the
    // table was moved aside: staging exists + live table exists.
    val v2 = Seq(("k2", "B")).toDF("id", "payload")
    v2.write.mode("overwrite").parquet(path + "__staging")
    ParquetUpsertSink.recover(spark, path)
    // the live table wins; stale staging is discarded
    assert(!fs.exists(new Path(path + "__staging")))
    assert(spark.read.parquet(path).count() == 2)

    // Simulate a crash mid-promote: table renamed to backup, staging
    // complete, table path absent — the newest complete copy (staging)
    // must be promoted.
    v2.write.mode("overwrite").parquet(path + "__staging")
    fs.rename(new Path(path), new Path(path + "__backup"))
    ParquetUpsertSink.recover(spark, path)
    assert(fs.exists(new Path(path)) && !fs.exists(new Path(path + "__backup")))
    val got = spark.read.parquet(path).collect().map(_.getString(0)).toSet
    assert(got == Set("k2"))

    // Simulate a crash with only a backup left (and a half-written,
    // marker-less staging): backup must be restored.
    fs.rename(new Path(path), new Path(path + "__backup"))
    v2.write.mode("overwrite").parquet(path + "__staging")
    fs.delete(new Path(path + "__staging/_SUCCESS"), false)
    ParquetUpsertSink.recover(spark, path)
    assert(fs.exists(new Path(path)))
    assert(!fs.exists(new Path(path + "__backup")))
    assert(!fs.exists(new Path(path + "__staging")))
    // an upsert after recovery works normally
    ParquetUpsertSink.upsert(spark, v1, path, "id")
    assert(spark.read.parquet(path).count() == 2)
  }

  test("partitioned upsert with detectMovedKeys removes a key's old-partition copy") {
    val root = tmpDir("upsert_moved") + "/t"
    val day1 = Seq(("k1", "2022-11-24", "a"), ("k2", "2022-11-24", "b"),
      ("k3", "2022-11-25", "c")).toDF("id", "dt", "payload")
    ParquetUpsertSink.upsertPartitioned(spark, day1, root, "id", "dt")
    // k3's date is corrected 25→26; without moved-key detection its old
    // copy under dt=2022-11-25 would survive as a duplicate
    val fix = Seq(("k3", "2022-11-26", "C")).toDF("id", "dt", "payload")
    ParquetUpsertSink.upsertPartitioned(spark, fix, root, "id", "dt",
      detectMovedKeys = true)
    // dt reads back type-inferred as DateType — compare via toString
    val got = spark.read.parquet(root).collect()
      .map(r => r.getAs[String]("id") ->
        (r.getAs[Any]("dt").toString, r.getAs[String]("payload")))
      .toMap
    assert(spark.read.parquet(root).count() == 3) // no duplicate k3
    assert(got == Map("k1" -> (("2022-11-24", "a")), "k2" -> (("2022-11-24", "b")),
      "k3" -> (("2022-11-26", "C"))))
    // dt=2022-11-25 had only k3 — the emptied partition dir must be gone
    assert(!new java.io.File(s"$root/dt=2022-11-25").exists())
  }

  test("live jdbc update-insert upsert against embedded Derby is last-write-wins") {
    val url = "jdbc:derby:memory:graft_rowmerge;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    // column names quoted to match the generated SQL's quoting (and
    // Spark's own JDBC identifier behavior) — see JdbcUpsertSink.q
    conn.createStatement().execute(
      """CREATE TABLE users ("id" BIGINT PRIMARY KEY, "name" VARCHAR(64), "score" INT)""")
    conn.close()
    val types = Map("id" -> "BIGINT", "name" -> "VARCHAR(64)", "score" -> "INT")
    val b1 = Seq((1L, "ann", 10), (2L, "bo", 20)).toDF("id", "name", "score")
    JdbcUpsertSink.upsertViaUpdateInsert(b1, url, "users", "id", types, maxConnections = 2)
    // batch 2 updates id=2, inserts id=3
    val b2 = Seq((2L, "bo2", 25), (3L, "cy", 30)).toDF("id", "name", "score")
    JdbcUpsertSink.upsertViaUpdateInsert(b2, url, "users", "id", types, maxConnections = 2)
    val got = spark.read.jdbc(url, "users", new java.util.Properties())
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(got == Map(1L -> ("ann", 10), 2L -> ("bo2", 25), 3L -> ("cy", 30)))
    // replaying batch 2 is idempotent
    JdbcUpsertSink.upsertViaUpdateInsert(b2, url, "users", "id", types, maxConnections = 2)
    assert(spark.read.jdbc(url, "users", new java.util.Properties()).count() == 3)
  }

  test("live jdbc staged-merge upsert against embedded Derby is last-write-wins") {
    val url = "jdbc:derby:memory:graft_merge;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      """CREATE TABLE items ("id" BIGINT PRIMARY KEY, "payload" VARCHAR(64))""")
    conn.close()
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
    JdbcUpsertSink.upsertViaMerge(b1, url, "items", "id", numPartitions = 2)
    val b2 = Seq((2L, "B"), (3L, "c")).toDF("id", "payload")
    JdbcUpsertSink.upsertViaMerge(b2, url, "items", "id", numPartitions = 2)
    val got = spark.read.jdbc(url, "items", new java.util.Properties())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("ON CONFLICT dialect-golden: generated statement mirrors the reference shape") {
    // The reference's production loader (door2door-etl
    // src/helper/postgres.py:157-189) builds
    //   INSERT INTO {table} ({', '.join(columns)}) VALUES ({%s,...})
    //   ON CONFLICT (key) DO UPDATE SET {col = EXCLUDED.col, ...}
    // with columns in DataFrame order and the update set covering
    // every non-key column in that same order. No Postgres exists in
    // this sandbox, so this pin is what guards the dialect: clause
    // order, column order, one placeholder per column, EXCLUDED
    // references, and quoting (deliberate divergences from the
    // reference: `?` JDBC placeholders instead of psycopg `%s`, and
    // quoted identifiers to match Spark's JDBC writer casing).
    val cols = Seq("event_generated_id", "event_location_lat",
      "event_location_lng", "event_at", "created_at")
    val sql = JdbcUpsertSink.onConflictSql("vehicle", cols, "event_generated_id")
    val shape =
      """INSERT INTO (\S+) \((.+)\) VALUES \((.+)\) ON CONFLICT \((.+)\) DO UPDATE SET (.+)""".r
    sql match {
      case shape(table, colList, params, conflict, sets) =>
        assert(table == "vehicle")
        assert(colList == cols.map(c => s""""$c"""").mkString(", "))
        assert(params == cols.map(_ => "?").mkString(", "))
        assert(conflict == "\"event_generated_id\"")
        assert(sets == cols.filterNot(_ == "event_generated_id")
          .map(c => s""""$c" = EXCLUDED."$c"""").mkString(", "))
      case _ => fail(s"statement does not match the reference clause shape: $sql")
    }
  }

  test("ON CONFLICT dialect parses under the PostgreSQL INSERT grammar (not just the regex)") {
    // Round-12 verdict task 4: no PG-wire engine exists in this
    // sandbox, so the generated dialect text is validated by a strict
    // recursive-descent implementation of the PUBLIC PostgreSQL
    // INSERT grammar (PgInsertGrammar — productions transcribed from
    // sql-insert.html + the lexical rules), which checks what the
    // clause-shape regex cannot: identifier lexing with "" escapes,
    // reserved-word rejection, arity of VALUES vs the column list,
    // duplicate columns, and strict end-of-statement.
    import PgInsertGrammar._
    val cols = Seq("event_generated_id", "event_location_lat",
      "event_location_lng", "event_at", "created_at")
    val p = parse(JdbcUpsertSink.onConflictSql("vehicle", cols, "event_generated_id"))
    assert(p.table == Seq("vehicle") && p.alias.isEmpty)
    assert(p.columns == cols)
    // one parameter per column, a single VALUES row
    assert(p.valueRows == Seq(cols.map(_ => Param)))
    // conflict target is the key; the update set covers EXACTLY the
    // non-key columns, each assigned from EXCLUDED.<same column>
    val c = p.onConflict.getOrElse(fail("missing ON CONFLICT"))
    assert(c.target == Seq("event_generated_id"))
    c.action match {
      case DoUpdate(sets, hasWhere) =>
        assert(!hasWhere)
        assert(sets == cols.filterNot(_ == "event_generated_id")
          .map(col => col -> ColRef(Seq("excluded", col))))
      case other => fail(s"expected DO UPDATE, got $other")
    }
    // quoting survives hostile identifiers: an embedded double quote
    // must round-trip through the "" escape, and a column that is a
    // PG RESERVED word is legal only BECAUSE the sink quotes it
    val hostile = Seq("id", """we"ird""", "select")
    val ph = parse(JdbcUpsertSink.onConflictSql("t", hostile, "id"))
    assert(ph.columns == hostile)
    // strictness: statements a regex would wave through all throw
    Seq(
      // psycopg %s placeholders are client-side, not SQL
      "INSERT INTO t (\"a\") VALUES (%s) ON CONFLICT (\"a\") DO NOTHING",
      // missing DO
      "INSERT INTO t (\"a\") VALUES (?) ON CONFLICT (\"a\") UPDATE SET \"a\" = EXCLUDED.\"a\"",
      // arity mismatch
      "INSERT INTO t (\"a\", \"b\") VALUES (?) ON CONFLICT (\"a\") DO NOTHING",
      // dangling comma
      "INSERT INTO t (\"a\",) VALUES (?) ON CONFLICT (\"a\") DO NOTHING",
      // unquoted reserved word as identifier
      "INSERT INTO t (select) VALUES (?) ON CONFLICT (select) DO NOTHING",
      // unbalanced quoted identifier
      "INSERT INTO t (\"a) VALUES (?)",
      // duplicate SET column
      "INSERT INTO t (\"a\",\"b\") VALUES (?,?) ON CONFLICT (\"a\") " +
        "DO UPDATE SET \"b\" = EXCLUDED.\"b\", \"b\" = EXCLUDED.\"b\"",
      // trailing junk
      "INSERT INTO t (\"a\") VALUES (?) ON CONFLICT (\"a\") DO NOTHING garbage"
    ).foreach { bad =>
      intercept[IllegalArgumentException](parse(bad))
    }
    // the reference's own literal shape (postgres.py with psycopg %s
    // interpolated to a literal, unquoted lower-case identifiers)
    // also parses — PG folds unquoted identifiers to lower case,
    // which is exactly why the sink quotes Spark-cased columns
    val ref = parse("INSERT INTO vehicle (event_generated_id, event_at) " +
      "VALUES ($1, $2) ON CONFLICT (event_generated_id) " +
      "DO UPDATE SET event_at = EXCLUDED.event_at")
    assert(ref.columns == Seq("event_generated_id", "event_at"))
  }

  test("jdbc upsert SQL is parameterized ON CONFLICT / MERGE / UPDATE-INSERT") {
    val sql = JdbcUpsertSink.onConflictSql("t", Seq("id", "a", "b"), "id")
    assert(sql == """INSERT INTO t ("id", "a", "b") VALUES (?, ?, ?) """ +
      """ON CONFLICT ("id") DO UPDATE SET "a" = EXCLUDED."a", "b" = EXCLUDED."b"""")
    val merge = JdbcUpsertSink.mergeSql("t", "t_staging", Seq("id", "a"), "id")
    assert(merge.contains("""MERGE INTO t t USING t_staging s ON t."id" = s."id""""))
    assert(merge.contains("""WHEN MATCHED THEN UPDATE SET "a" = s."a""""))
    assert(merge.contains("""WHEN NOT MATCHED THEN INSERT ("id", "a") VALUES (s."id", s."a")"""))
    val upd = JdbcUpsertSink.updateSql("t", Seq("id", "a", "b"), "id")
    assert(upd == """UPDATE t SET "a" = ?, "b" = ? WHERE "id" = ?""")
    val ins = JdbcUpsertSink.insertIfAbsentSql(
      "t", Seq("id" -> "BIGINT", "a" -> "INT"), "id")
    assert(ins == """INSERT INTO t ("id", "a") SELECT s."id", s."a" """ +
      """FROM (VALUES (CAST(? AS BIGINT), CAST(? AS INT))) AS s ("id", "a") """ +
      """WHERE NOT EXISTS (SELECT 1 FROM t t WHERE t."id" = s."id")""")
  }
}
