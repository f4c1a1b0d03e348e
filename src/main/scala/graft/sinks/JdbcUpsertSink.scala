package graft.sinks

import java.sql.{Connection, DriverManager}
import org.apache.spark.sql.DataFrame

/** Relational upsert sink (reference op K-2,
  * `src/helper/postgres.py:157-189`).
  *
  * Spark's `df.write.jdbc` cannot upsert, so two modes are provided
  * (SURVEY.md §2.2 K-2 plan):
  *
  *  - [[upsertViaOnConflict]] — faithful mode: each partition opens
  *    one connection and executes batched parameterized
  *    `INSERT ... ON CONFLICT (key) DO UPDATE SET col=EXCLUDED.col`.
  *    Parallelism = number of partitions; `repartition(n)` upstream
  *    bounds the warehouse connection count.
  *  - [[mergeSql]] — scale mode: stage the batch into a temp table
  *    with `write.jdbc`, then run one set-based `MERGE` on the driver
  *    connection (the pattern the reference's own README prescribes
  *    for warehouse targets).
  *
  * SQL strings are always parameterized (`?` placeholders) — the
  * reference's f-string interpolation (`postgres.py:118-121`) is an
  * injection surface the rebuild does not reproduce.
  *
  * No Postgres exists in this build environment, so the ON CONFLICT
  * text is covered by SQL-generation tests; [[upsertViaUpdateInsert]]
  * and [[upsertViaMerge]] run END-TO-END against embedded Derby
  * (shipped in /opt/spark/jars) in UpsertSpec — live connection, live
  * MERGE.
  */
object JdbcUpsertSink {

  /** Double-quote a COLUMN identifier. Spark's JDBC writer quotes the
    * column names it creates (making them case-sensitive) but passes
    * table names through verbatim, so generated SQL mirrors that:
    * columns quoted, table names verbatim. Unquoted column references
    * would case-fold (uppercase on Derby, lowercase on Postgres) right
    * past Spark-written staging columns and miss. Target-table DDL
    * must quote its column names the same way (on Postgres, unquoted
    * lowercase DDL also works since quoting lowercase is a no-op). */
  private def q(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""

  /** `INSERT ... ON CONFLICT` statement with `?` placeholders
    * (Postgres-faithful mode; Derby lacks the syntax — see
    * [[updateSql]]/[[insertIfAbsentSql]] for the portable pair). */
  def onConflictSql(table: String, columns: Seq[String], key: String): String = {
    val updatable = columns.filterNot(_ == key)
    val sets = updatable.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
    s"INSERT INTO $table (${columns.map(q).mkString(", ")}) " +
      s"VALUES (${columns.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${q(key)}) DO UPDATE SET $sets"
  }

  /** Parameterized UPDATE half of the portable row-wise upsert:
    * params are the non-key columns in order, then the key. */
  def updateSql(table: String, columns: Seq[String], key: String): String = {
    val updatable = columns.filterNot(_ == key)
    s"UPDATE $table SET ${updatable.map(c => s"${q(c)} = ?").mkString(", ")} " +
      s"WHERE ${q(key)} = ?"
  }

  /** Parameterized INSERT-if-absent half: inserts the row only when
    * the key is not present. The probe row comes from a one-row
    * `VALUES` derived table; parameters are CAST explicitly because
    * engines cannot infer `?` types inside a table value constructor.
    * `columns` carries (name, sqlType). */
  def insertIfAbsentSql(table: String, columns: Seq[(String, String)], key: String): String = {
    val names = columns.map(_._1)
    val castedParams = columns.map { case (_, tp) => s"CAST(? AS $tp)" }.mkString(", ")
    s"INSERT INTO $table (${names.map(q).mkString(", ")}) " +
      s"SELECT ${names.map(c => s"s.${q(c)}").mkString(", ")} " +
      s"FROM (VALUES ($castedParams)) AS s (${names.map(q).mkString(", ")}) " +
      s"WHERE NOT EXISTS (SELECT 1 FROM $table t WHERE t.${q(key)} = s.${q(key)})"
  }

  /** Set-based merge from a staged temp table. */
  def mergeSql(table: String, staging: String, columns: Seq[String], key: String): String = {
    val updatable = columns.filterNot(_ == key)
    val sets = updatable.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
    s"MERGE INTO $table t USING $staging s ON t.${q(key)} = s.${q(key)} " +
      s"WHEN MATCHED THEN UPDATE SET $sets " +
      s"WHEN NOT MATCHED THEN INSERT (${columns.map(q).mkString(", ")}) " +
      s"VALUES (${columns.map(c => s"s.${q(c)}").mkString(", ")})"
  }

  /** Shared row-wise executor: one connection per partition, batched
    * parameterized statements, one commit per partition. Statement
    * executions inside a batch are sequential, so a later row with the
    * same key wins — identical to the reference's `executemany`.
    * Partitioned BY KEY so same-key rows always share one connection:
    * round-robin would let duplicate keys race on two connections
    * (ON CONFLICT upserts on both sides deadlock-prone on Postgres,
    * winner nondeterministic). */
  private def executeRowwise(
      df: DataFrame,
      url: String,
      sql: String,
      key: String,
      batchSize: Int,
      maxConnections: Int): Unit = {
    val nCols = df.columns.length
    df.repartition(maxConnections, org.apache.spark.sql.functions.col(key))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val conn: Connection = DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        val st = conn.prepareStatement(sql)
        var n = 0
        rows.foreach { r =>
          (0 until nCols).foreach(i => st.setObject(i + 1, r.get(i)))
          st.addBatch()
          n += 1
          if (n % batchSize == 0) st.executeBatch()
        }
        st.executeBatch()
        conn.commit()
      } finally conn.close()
    }
  }

  /** Faithful mode: batched ON CONFLICT per partition (Postgres). */
  def upsertViaOnConflict(
      df: DataFrame,
      url: String,
      table: String,
      key: String,
      batchSize: Int = 1000,
      maxConnections: Int = 8): Unit =
    executeRowwise(df, url, onConflictSql(table, df.columns.toSeq, key),
      key, batchSize, maxConnections)

  /** Portable row-wise mode: batched UPDATE + INSERT-if-absent pair
    * per partition — same connection/batch/commit shape as
    * [[upsertViaOnConflict]], standard SQL (runs live on embedded
    * Derby in UpsertSpec). All updates execute before all inserts
    * inside one transaction, so the batch must be KEY-UNIQUE (one row
    * per key — dedup upstream, as [[ParquetUpsertSink]]'s dedupBatch
    * does); with duplicate keys the first insert would win instead of
    * the last. `sqlTypes` maps column name → SQL type for the VALUES
    * casts. */
  def upsertViaUpdateInsert(
      df: DataFrame,
      url: String,
      table: String,
      key: String,
      sqlTypes: Map[String, String],
      batchSize: Int = 1000,
      maxConnections: Int = 8): Unit = {
    val columns = df.columns.toSeq
    val keyIdx = columns.indexOf(key)
    require(keyIdx >= 0, s"key $key not in ${columns.mkString(",")}")
    val nonKeyIdx = columns.indices.filterNot(_ == keyIdx)
    val upd = updateSql(table, columns, key)
    val ins = insertIfAbsentSql(table, columns.map(c => c -> sqlTypes(c)), key)
    // hash-partition by KEY (not round-robin): should the key-unique
    // contract above ever be violated, same-key rows still land on the
    // same connection and execute sequentially — the failure degrades
    // to in-batch last-write-wins instead of two connections racing
    // the NOT EXISTS probe and silently inserting duplicates
    df.repartition(maxConnections, org.apache.spark.sql.functions.col(key))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val conn: Connection = DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        val updSt = conn.prepareStatement(upd)
        val insSt = conn.prepareStatement(ins)
        var n = 0
        rows.foreach { r =>
          nonKeyIdx.zipWithIndex.foreach { case (ci, p) => updSt.setObject(p + 1, r.get(ci)) }
          updSt.setObject(nonKeyIdx.length + 1, r.get(keyIdx))
          updSt.addBatch()
          columns.indices.foreach(i => insSt.setObject(i + 1, r.get(i)))
          insSt.addBatch()
          n += 1
          if (n % batchSize == 0) { updSt.executeBatch(); insSt.executeBatch() }
        }
        updSt.executeBatch()
        insSt.executeBatch()
        conn.commit()
      } finally conn.close()
    }
  }

  /** Scale mode: stage with write.jdbc, then one driver-side MERGE. */
  def upsertViaMerge(
      df: DataFrame,
      url: String,
      table: String,
      key: String,
      numPartitions: Int = 8): Unit = {
    val staging = s"${table}_staging"
    df.repartition(numPartitions).write
      .mode("overwrite")
      .option("batchsize", 5000)
      .jdbc(url, staging, new java.util.Properties())
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(mergeSql(table, staging, df.columns.toSeq, key))
      st.execute(s"DROP TABLE $staging")
    } finally conn.close()
  }
}
