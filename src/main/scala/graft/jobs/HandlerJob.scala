package graft.jobs

import java.sql.Timestamp
import java.time.Instant
import java.util.UUID

import graft.config.EntitySchema
import graft.meta.{HandlerExecution, MonitorStore}
import graft.operators.{Dedup, EntitySplit, KeyGen, Normalize}
import graft.sinks.ParquetUpsertSink
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Handler (reference entry point 3, `src/handler/handler.py`):
  * locate the staged batch for a workflow, split it by entity,
  * normalize/key/dedup each entity, and upsert into its warehouse
  * table, with per-entity error isolation and an audit row per
  * run×entity.
  *
  * The staged frame is cached once and each entity is a filter over
  * it (one scan feeds all entities). Per-entity failure is caught so
  * one entity's bad batch never blocks the others — the reference's
  * contract (`handler.py:91-100`).
  */
object HandlerJob {

  private val log = Log(getClass)

  case class Result(recordsInserted: Map[String, Long], failures: Map[String, String])

  /** The core semantic pipeline for one entity, exposed for tests and
    * for the analytics registry: normalize → keygen → dedup. */
  def entityPipeline(raw: DataFrame, schema: EntitySchema): DataFrame = {
    val normalized = Normalize(raw, schema)
    val keyed = KeyGen(normalized, schema)
    Dedup(keyed, KeyGen.columnName)
  }

  /** Optional data-quality gate evaluated on each entity's READY
    * frame (normalized/keyed/deduped) before its upsert: checks that
    * fail BLOCK that entity's promotion — the write never happens and
    * the violation report lands in the monitor store's error column,
    * exactly like any other per-entity failure (other entities
    * proceed). Built from [[graft.ext.profile.Expectations]]. */
  case class QualityGate(checks: Seq[graft.ext.profile.Expectations.Check])

  final class QualityGateViolation(report: String)
    extends RuntimeException(s"quality gate failed: $report")

  private def enforceGate(ready: DataFrame, gate: QualityGate): Unit = {
    val failed = graft.ext.profile.Expectations.validate(ready, gate.checks)
      .filter(!org.apache.spark.sql.functions.col("pass"))
      .collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}/${r.getLong(2)}")
    if (failed.nonEmpty) throw new QualityGateViolation(failed.mkString(", "))
  }

  def run(
      spark: SparkSession,
      store: MonitorStore,
      warehouseDir: String,
      schemas: Seq[EntitySchema],
      workflowId: String,
      now: Instant = Instant.now(),
      qualityGate: Option[QualityGate] = None): Result = {

    require(
      try { UUID.fromString(workflowId); true } catch { case _: Exception => false },
      s"workflow id is not a UUID: $workflowId")

    val missing = schemas.map(_.targetTable).filterNot(store.targetTableExists)
    require(missing.isEmpty, s"missing target tables: ${missing.mkString(", ")}")

    val executionId = UUID.randomUUID().toString
    val stagedPath = store.stagedFilePath(workflowId)
    if (stagedPath.isEmpty) return Result(Map.empty, Map.empty)

    val staged = spark.read.parquet(stagedPath.get).cache()
    try {
      val byEntity = EntitySplit(staged, "on", schemas.map(_.entity))
      val outcomes = schemas.map { schema =>
        val entity = schema.entity
        // cache: the audit count and the upsert both consume the
        // pipeline — without a materialization point the whole
        // normalize→keygen→dedup chain (shuffle included) would
        // execute twice per entity. Constructed INSIDE the try:
        // analysis-time failures (e.g. AnalysisException on malformed
        // staged data) must hit the per-entity catch and be recorded,
        // not abort the remaining entities.
        var ready: DataFrame = null
        try {
          ready = entityPipeline(byEntity(entity), schema).cache()
          val n = ready.count()
          qualityGate.foreach(enforceGate(ready, _))
          ParquetUpsertSink.upsert(
            spark, ready, s"$warehouseDir/${schema.targetTable}", KeyGen.columnName)
          store.recordHandler(HandlerExecution(
            workflowId, executionId, Timestamp.from(now), stagedPath,
            schema.targetTable, n, None))
          log.info("entity upserted", "workflow" -> workflowId,
            "entity" -> entity, "table" -> schema.targetTable, "rows" -> n)
          entity -> Right(n)
        } catch {
          case e: Throwable =>
            // full stack trace, matching the reference's traceback
            // capture (src/helper/postgres.py:45-63)
            log.error("entity failed", e, "workflow" -> workflowId,
              "entity" -> entity, "table" -> schema.targetTable)
            store.recordHandler(HandlerExecution(
              workflowId, executionId, Timestamp.from(now), stagedPath,
              schema.targetTable, 0L, Some(Stacks.render(e))))
            entity -> Left(e.toString)
        } finally if (ready != null) ready.unpersist()
      }
      Result(
        outcomes.collect { case (e, Right(n)) => e -> n }.toMap,
        outcomes.collect { case (e, Left(err)) => e -> err }.toMap)
    } finally staged.unpersist()
  }
}
