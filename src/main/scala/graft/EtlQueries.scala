package graft

import graft.config.{ColumnSpec, EntitySchema}
import graft.operators.{Dedup, EntitySplit, KeyGen, Normalize}
import graft.sinks.ParquetUpsertSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Correctness-gate queries that exercise the ETL-core operators
  * (SURVEY.md §2) over the driver's `events` table, each with a DuckDB
  * oracle replicating the exact semantics.
  *
  * The `events` table plays the role of the reference's event stream:
  * `event_type` is the entity discriminator (P-4), `(user_id, ts)` the
  * surrogate-key columns (R-1), and the flat columns the normalize
  * contract (P-1..P-3).
  */
object EtlQueries {

  /** Events re-declared in the reference's schema dialect: the same
    * ColumnSpec machinery the ETL jobs use (flat paths here). */
  private val eventsSchema = EntitySchema(
    entity = "event",
    targetTable = "events_normalized",
    columns = Seq(
      ColumnSpec("event_id", "event_id", "bigint", isKey = true),
      ColumnSpec("ts", "event_timestamp", "timestamp", isKey = false),
      ColumnSpec("user_id", "user_id", "bigint", isKey = false),
      ColumnSpec("event_type", "event_operation", "string", isKey = false),
      ColumnSpec("value", "event_value", "float", isKey = false),
      ColumnSpec("props", "props_json", "string", isKey = false)))

  private val knownEntities = Seq("click", "view", "purchase", "signup")

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  /** P-1/P-2/P-3: schema-driven projection+cast+rename+trim. */
  private def qNormalize(s: SparkSession, dir: String): DataFrame =
    Normalize(events(s, dir), eventsSchema).orderBy(col("event_id"))

  private val qNormalizeSql =
    """SELECT CAST(event_id AS BIGINT) AS event_id,
      |  CAST(ts AS TIMESTAMP) AS event_timestamp,
      |  CAST(user_id AS BIGINT) AS user_id,
      |  TRIM(CAST(event_type AS VARCHAR)) AS event_operation,
      |  CAST(value AS DOUBLE) AS event_value,
      |  TRIM(CAST(props AS VARCHAR)) AS props_json
      |FROM events ORDER BY event_id""".stripMargin

  /** R-1: deterministic surrogate key, byte-equal to the reference's
    * concat→sha256→uuid chain (pandas str() rendering of timestamps). */
  private def qKeygen(s: SparkSession, dir: String): DataFrame =
    KeyGen.withKey(events(s, dir), Seq("user_id" -> LongType, "ts" -> TimestampType))
      .select(col("event_id"), col(KeyGen.columnName))
      .orderBy(col("event_id"))

  private val qKeygenSql =
    """WITH h AS (
      |  SELECT event_id,
      |    sha256(CAST(user_id AS VARCHAR) ||
      |      CASE WHEN strftime(ts, '%f') = '000000'
      |           THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
      |           ELSE strftime(ts, '%Y-%m-%d %H:%M:%S.%f') END) AS hx
      |  FROM events)
      |SELECT event_id,
      |  substr(hx,1,8) || '-' || substr(hx,9,4) || '-' || substr(hx,13,4) ||
      |    '-' || substr(hx,17,4) || '-' || substr(hx,21,12) AS event_generated_id
      |FROM h ORDER BY event_id""".stripMargin

  /** R-2: first-occurrence dedup by (user_id, event_type), "first" =
    * lowest event_id (deterministic arrival order). */
  private def qDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.firstOccurrence(events(s, dir),
      Seq(col("user_id"), col("event_type")), Seq(col("event_id")))
      .select("event_id", "user_id", "event_type", "value")
      .orderBy(col("event_id"))

  private val qDedupSql =
    """SELECT event_id, user_id, event_type, value FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) = 1
      |ORDER BY event_id""".stripMargin

  /** P-4: entity split — one entity's frame from the shared scan. */
  private def qSplit(s: SparkSession, dir: String): DataFrame =
    EntitySplit(events(s, dir), "event_type", knownEntities)("click")
      .select("event_id", "user_id", "value")
      .orderBy(col("event_id"))

  private val qSplitSql =
    """SELECT event_id, user_id, value FROM events
      |WHERE event_type = 'click' ORDER BY event_id""".stripMargin

  /** P-4 rejects: unknown discriminator values are counted, not fatal. */
  private def qSplitRejects(s: SparkSession, dir: String): DataFrame =
    EntitySplit.rejects(events(s, dir), "event_type", knownEntities)
      .agg(count(lit(1)).as("n_rejects"))

  private val qSplitRejectsSql =
    """SELECT COUNT(*) AS n_rejects FROM events
      |WHERE event_type IS NULL
      |   OR event_type NOT IN ('click','view','purchase','signup')""".stripMargin

  /** K-2 upsert round-trip: split events into even/odd halves by
    * event_id, upsert sequentially into a scratch table, read back.
    * `orderCol = event_id` makes within-batch "last" explicit, so the
    * final state is a pure function of the input: per key, the odd
    * (second-batch) event with the highest event_id wins, else the
    * highest even one — expressible as a DuckDB QUALIFY oracle. */
  private def qUpsert(s: SparkSession, dir: String): DataFrame = {
    // cache: both batch upserts scan the keyed frame — without the
    // barrier the events read + sha2 keygen run once per batch
    val base = KeyGen.withKey(events(s, dir),
      Seq("user_id" -> LongType, "ts" -> TimestampType))
      .select(col(KeyGen.columnName), col("event_id"), col("user_id"), col("value"))
      .cache()
    try {
      val scratch = java.nio.file.Files
        .createTempDirectory("graft_upsert").toString + "/t"
      val batch1 = base.filter(col("event_id") % 2 === 0)
      val batch2 = base.filter(col("event_id") % 2 === 1)
      ParquetUpsertSink.upsert(s, batch1, scratch, KeyGen.columnName, orderCol = Some("event_id"))
      ParquetUpsertSink.upsert(s, batch2, scratch, KeyGen.columnName, orderCol = Some("event_id"))
      s.read.parquet(scratch).orderBy(col("event_id"))
    } finally base.unpersist()
  }

  /** Shared oracle body for the upsert queries: the reference's
    * last-write-wins per key over the two sequential batches.
    * `hCols` is the extra select list in the base CTE (computed from
    * ts), `outCols` the corresponding pass-through names downstream. */
  private def upsertQualifySql(hCols: String, outCols: String): String =
    s"""WITH h AS (
      |  SELECT event_id, user_id, value,$hCols
      |    sha256(CAST(user_id AS VARCHAR) ||
      |      CASE WHEN strftime(ts, '%f') = '000000'
      |           THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
      |           ELSE strftime(ts, '%Y-%m-%d %H:%M:%S.%f') END) AS hx
      |  FROM events),
      |k AS (
      |  SELECT substr(hx,1,8) || '-' || substr(hx,9,4) || '-' || substr(hx,13,4) ||
      |    '-' || substr(hx,17,4) || '-' || substr(hx,21,12) AS event_generated_id,
      |    event_id, user_id, value$outCols
      |  FROM h)
      |SELECT event_generated_id, event_id, user_id, value$outCols FROM k
      |QUALIFY row_number() OVER (PARTITION BY event_generated_id
      |  ORDER BY (event_id % 2) DESC, event_id DESC) = 1
      |ORDER BY event_id""".stripMargin

  private val qUpsertSql = upsertQualifySql("", "")

  /** K-2 at scale: the hive-partitioned upsert path (only partitions
    * present in the batch are merged/rewritten). Partitioning by
    * `event_date = date(ts)` — derived from a key column, so keys can
    * never move partitions and the default immutable-partition
    * contract holds. */
  private def qUpsertPartitioned(s: SparkSession, dir: String): DataFrame = {
    val base = KeyGen.withKey(events(s, dir),
      Seq("user_id" -> LongType, "ts" -> TimestampType))
      .select(col(KeyGen.columnName), col("event_id"), col("user_id"), col("value"),
        to_date(col("ts")).as("event_date"))
      .cache()
    try {
      val scratch = java.nio.file.Files
        .createTempDirectory("graft_upsert_part").toString + "/t"
      val batch1 = base.filter(col("event_id") % 2 === 0)
      val batch2 = base.filter(col("event_id") % 2 === 1)
      ParquetUpsertSink.upsertPartitioned(s, batch1, scratch, KeyGen.columnName,
        partitionCol = "event_date", orderCol = Some("event_id"))
      ParquetUpsertSink.upsertPartitioned(s, batch2, scratch, KeyGen.columnName,
        partitionCol = "event_date", orderCol = Some("event_id"))
      s.read.parquet(scratch)
        .select(col(KeyGen.columnName), col("event_id"), col("user_id"), col("value"),
          col("event_date"))
        .orderBy(col("event_id"))
    } finally base.unpersist()
  }

  private val qUpsertPartitionedSql =
    upsertQualifySql(" CAST(ts AS DATE) AS event_date,", ", event_date")

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_normalize"          -> (qNormalize _),
    "etl_keygen"             -> (qKeygen _),
    "etl_dedup_first"        -> (qDedup _),
    "etl_entity_split"       -> (qSplit _),
    "etl_split_rejects"      -> (qSplitRejects _),
    "etl_upsert"             -> (qUpsert _),
    "etl_upsert_partitioned" -> (qUpsertPartitioned _))

  val oracles: Map[String, String] = Map(
    "etl_normalize"          -> qNormalizeSql,
    "etl_keygen"             -> qKeygenSql,
    "etl_dedup_first"        -> qDedupSql,
    "etl_entity_split"       -> qSplitSql,
    "etl_split_rejects"      -> qSplitRejectsSql,
    "etl_upsert"             -> qUpsertSql,
    "etl_upsert_partitioned" -> qUpsertPartitionedSql)
}
