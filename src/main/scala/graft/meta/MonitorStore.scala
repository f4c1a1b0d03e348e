package graft.meta

import java.sql.Timestamp
import java.time.Instant
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** One ingestor run's audit row (reference table `ingestor_executions`,
  * `migrations/init.sql:6-14`). */
case class IngestorExecution(
    workflowId: String,
    codeExecutionId: String,
    codeExecutionDate: Timestamp,
    fetchedHour: Timestamp,
    numberOfFilesFetched: Int,
    fileDestinationPath: Option[String],
    traceback: Option[String])

/** One handler run×entity audit row (`migrations/init.sql:16-24`). */
case class HandlerExecution(
    workflowId: String,
    codeExecutionId: String,
    codeExecutionDate: Timestamp,
    fileFetchPath: Option[String],
    destinationTable: String,
    recordsInserted: Long,
    traceback: Option[String])

/** Execution-metadata store: the incremental cursor + audit trail
  * (reference ops A-1/A-2/K-3/K-4, `src/helper/postgres.py:35-155`).
  *
  * Contract preserved from the reference:
  *  - cursor = MAX(fetched_hour) over SUCCESSFUL ingestor runs
  *    (failed runs keep a traceback and are excluded, so their hour is
  *    retried);
  *  - the handler locates its input through the ingestor row with the
  *    same workflow_id, no traceback, and files fetched > 0;
  *  - rows are append-only.
  *
  * Divergence (deliberate, SURVEY.md §2.7): metadata is written with
  * fully-initialized values after the sink commit — the reference's
  * unbound-variable `finally` hazard is not reproduced.
  */
trait MonitorStore {
  def lastSuccessfulFetchHour(): Option[Instant]
  def stagedFilePath(workflowId: String): Option[String]
  def recordIngestor(row: IngestorExecution): Unit
  def recordHandler(row: HandlerExecution): Unit
  def targetTableExists(table: String): Boolean
}

/** Provisioning + audit-read surface shared by the store backends, so
  * the pipeline e2e (JobsSpec) runs identically against the parquet
  * store and the JDBC store: `migrate` is the init.sql twin, the row
  * readers return audit rows under the case classes' camelCase names
  * whatever the backend's physical column naming. */
trait StoreAdmin {
  def migrate(tables: Seq[String]): Unit
  def ingestorRows(): Seq[Row]
  def handlerRows(): Seq[Row]
}

/** Parquet-backed monitor store. The monitor tables are tiny (one row
  * per run) so every read is a driver-cheap scan; appends are
  * single-row parquet appends.
  *
  * Table precheck: with a `warehouseDir`, [[targetTableExists]] is the
  * file-warehouse twin of the reference's `information_schema.tables`
  * lookup (`src/helper/postgres.py:131-155`) — a table exists iff its
  * directory does. [[migrate]] is the twin of `migrations/init.sql`:
  * it creates the (empty) table directories, after which prechecks
  * pass and the first upsert writes the initial data. Without a
  * `warehouseDir` the store falls back to a static declared-table set
  * (schema-registry mode, used by tests that never touch a warehouse).
  */
class FileMonitorStore(spark: SparkSession, dir: String,
    warehouseDir: Option[String] = None,
    knownTables: Set[String] = Set("vehicle_location", "operating_periods"))
  extends MonitorStore with StoreAdmin {

  import spark.implicits._

  private val ingestorPath = s"$dir/ingestor_executions"
  private val handlerPath = s"$dir/handler_executions"

  private def exists(path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  override def lastSuccessfulFetchHour(): Option[Instant] = {
    if (!exists(ingestorPath)) return None
    spark.read.parquet(ingestorPath)
      .filter($"traceback".isNull)
      .agg(max($"fetchedHour"))
      .collect()
      .headOption
      .flatMap(r => Option(r.getTimestamp(0)))
      .map(_.toInstant)
  }

  override def stagedFilePath(workflowId: String): Option[String] = {
    if (!exists(ingestorPath)) return None
    spark.read.parquet(ingestorPath)
      .filter($"workflowId" === workflowId &&
        $"traceback".isNull && $"numberOfFilesFetched" > 0)
      .orderBy($"codeExecutionDate".desc)
      .limit(1)
      .select($"fileDestinationPath")
      .collect()
      .headOption
      .flatMap(r => Option(r.getString(0)))
  }

  override def recordIngestor(row: IngestorExecution): Unit =
    Seq(row).toDS().write.mode("append").parquet(ingestorPath)

  override def recordHandler(row: HandlerExecution): Unit =
    Seq(row).toDS().write.mode("append").parquet(handlerPath)

  override def targetTableExists(table: String): Boolean =
    warehouseDir match {
      case Some(w) => exists(s"$w/$table")
      case None    => knownTables.contains(table)
    }

  /** Create the (empty) target-table directories — the file-warehouse
    * twin of applying the reference's `migrations/init.sql`. Idempotent. */
  override def migrate(tables: Seq[String]): Unit =
    warehouseDir.foreach { w =>
      tables.foreach { t =>
        val p = new Path(s"$w/$t")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
      }
    }

  override def ingestorRows(): Seq[Row] =
    if (exists(ingestorPath)) spark.read.parquet(ingestorPath).collect().toSeq else Seq.empty
  override def handlerRows(): Seq[Row] =
    if (exists(handlerPath)) spark.read.parquet(handlerPath).collect().toSeq else Seq.empty
}
