package graft.jobs

import java.util.UUID

import graft.config.EntitySchema
import graft.meta.{FileMonitorStore, JdbcMonitorStore, MonitorStore, StoreAdmin}
import org.apache.spark.sql.SparkSession

/** CLI entry point (reference entry point 1, `src/executor.py`):
  * `--step {all|ingestor|handler}` and `--workflow <uuid>`, with the
  * reference's consistency rule: a workflow id may only be supplied
  * for a handler-only run, and a handler-only run requires one
  * (`src/helper/helper.py:176-194`).
  *
  * Paths default to a local warehouse layout under `--root`; on a
  * cluster the same flags point at object-store URIs.
  */
object Executor {

  case class Args(
      step: String = "all",
      workflow: Option[String] = None,
      root: String = "/tmp/graft-warehouse",
      landing: Option[String] = None,
      // execution-metadata backend: None = parquet FileMonitorStore
      // under --root; Some(url) = JdbcMonitorStore on that JDBC URL
      // (the reference's Postgres posture - Derby in this sandbox,
      // e.g. jdbc:derby:memory:monitor;create=true)
      monitorUrl: Option[String] = None)

  def parse(argv: Seq[String]): Args = {
    def loop(rest: List[String], acc: Args): Args = rest match {
      case Nil => acc
      case ("-s" | "--step") :: v :: t     => loop(t, acc.copy(step = v))
      case ("-w" | "--workflow") :: v :: t => loop(t, acc.copy(workflow = Some(v)))
      case "--root" :: v :: t              => loop(t, acc.copy(root = v))
      case "--landing" :: v :: t           => loop(t, acc.copy(landing = Some(v)))
      case "--monitor-url" :: v :: t       => loop(t, acc.copy(monitorUrl = Some(v)))
      case other :: _ => throw new IllegalArgumentException(s"unknown arg: $other")
    }
    val a = loop(argv.toList, Args())
    require(Set("all", "ingestor", "handler")(a.step), s"bad step: ${a.step}")
    // reference consistency rule (helper.py:176-194)
    require(a.workflow.isEmpty || a.step == "handler",
      "a workflow id may only be supplied with --step handler")
    require(a.step != "handler" || a.workflow.nonEmpty,
      "--step handler requires --workflow")
    a
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv.toIndexedSeq)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args)
    finally spark.stop()
  }

  def run(spark: SparkSession, args: Args): Unit = {
    val store: MonitorStore with StoreAdmin = args.monitorUrl match {
      case Some(url) => new JdbcMonitorStore(spark, url)
      case None => new FileMonitorStore(spark, s"${args.root}/monitor",
        warehouseDir = Some(s"${args.root}/tables"))
    }
    val schemas = EntitySchema.reference
    // bootstrap = applying the reference's migrations/init.sql; the
    // handler's precheck then verifies the tables genuinely exist
    store.migrate(schemas.map(_.targetTable))
    val source = graft.jobs.Pipelines.unionSourceStruct(schemas)
    val wfId = args.workflow.getOrElse(UUID.randomUUID().toString)
    if (args.step == "all" || args.step == "ingestor")
      IngestorJob.run(spark, store,
        args.landing.getOrElse(s"${args.root}/landing"),
        s"${args.root}/staging", source, wfId)
    if (args.step == "all" || args.step == "handler")
      HandlerJob.run(spark, store, s"${args.root}/tables", schemas, wfId)
  }
}

/** Shared schema plumbing for the jobs. */
object Pipelines {
  import org.apache.spark.sql.types._

  /** Source struct covering every entity's declared paths plus the
    * `on` discriminator, so one read serves the entity split. */
  def unionSourceStruct(schemas: Seq[EntitySchema]): StructType =
    EntitySchema.structFromPaths(
      "on" +: schemas.flatMap(_.columns.map(_.srcPath)))
}
