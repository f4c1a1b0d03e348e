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
  * No warehouse exists in this build environment, so these paths are
  * exercised by SQL-generation unit tests; the DataFrame-level upsert
  * semantics are covered by [[ParquetUpsertSink]].
  */
object JdbcUpsertSink {

  /** `INSERT ... ON CONFLICT` statement with `?` placeholders. */
  def onConflictSql(table: String, columns: Seq[String], key: String): String = {
    val updatable = columns.filterNot(_ == key)
    val sets = updatable.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"INSERT INTO $table (${columns.mkString(", ")}) " +
      s"VALUES (${columns.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT ($key) DO UPDATE SET $sets"
  }

  /** Set-based merge from a staged temp table. */
  def mergeSql(table: String, staging: String, columns: Seq[String], key: String): String = {
    val updatable = columns.filterNot(_ == key)
    val sets = updatable.map(c => s"$c = s.$c").mkString(", ")
    s"MERGE INTO $table t USING $staging s ON t.$key = s.$key " +
      s"WHEN MATCHED THEN UPDATE SET $sets " +
      s"WHEN NOT MATCHED THEN INSERT (${columns.mkString(", ")}) " +
      s"VALUES (${columns.map(c => s"s.$c").mkString(", ")})"
  }

  /** Faithful mode: batched ON CONFLICT per partition. */
  def upsertViaOnConflict(
      df: DataFrame,
      url: String,
      table: String,
      key: String,
      batchSize: Int = 1000,
      maxConnections: Int = 8): Unit = {
    val columns = df.columns.toSeq
    val sql = onConflictSql(table, columns, key)
    df.repartition(maxConnections).foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val conn: Connection = DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        val st = conn.prepareStatement(sql)
        var n = 0
        rows.foreach { r =>
          columns.indices.foreach(i => st.setObject(i + 1, r.get(i)))
          st.addBatch()
          n += 1
          if (n % batchSize == 0) st.executeBatch()
        }
        st.executeBatch()
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
