package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import java.time.Instant
import java.util.UUID

import graft.config.EntitySchema
import graft.jobs.{Executor, HandlerJob, IngestorJob, Pipelines}
import graft.meta.{FileMonitorStore, JdbcMonitorStore, MonitorStore, StoreAdmin}

/** End-to-end: landing JSON-lines → ingestor (cursor + hour pruning +
  * staging) → handler (split/normalize/key/dedup/upsert) → monitor
  * audit rows, across two hourly runs. */
class JobsSpec extends SparkSpec {

  private val hour0 = IngestorJob.coldStart // 2022-11-24T10:00:00Z

  /** Both store backends under one e2e (round-7 verdict task 5): the
    * parquet store and the Derby-backed JDBC store are drop-in twins
    * behind MonitorStore + StoreAdmin. Each JDBC store gets its own
    * in-memory database (the UpsertSpec live-Derby convention). */
  private def mkStore(impl: String, root: String): MonitorStore with StoreAdmin =
    impl match {
      case "file" => new FileMonitorStore(spark, s"$root/monitor",
        warehouseDir = Some(s"$root/tables"))
      case "jdbc" => new JdbcMonitorStore(spark,
        s"jdbc:derby:memory:mon_${UUID.randomUUID().toString.take(8)};create=true")
    }

  private def writeLanding(dir: String, name: String, mtime: Instant, lines: String*): Unit = {
    val p = Paths.get(s"$dir/$name")
    Files.write(p, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.setLastModifiedTime(p, FileTime.from(mtime))
  }

  for (impl <- Seq("file", "jdbc"))
  test(s"two-run incremental pipeline with cursor advance and upsert [$impl]") {
    val root = tmpDir(s"e2e_$impl")
    val landing = s"$root/landing"; Files.createDirectories(Paths.get(landing))
    val store = mkStore(impl, root)
    val schemas = EntitySchema.reference
    store.migrate(schemas.map(_.targetTable))
    val source = Pipelines.unionSourceStruct(schemas)

    // hour 10: one vehicle + one operating period + a file in hour 11 (must be ignored)
    writeLanding(landing, "a.json", hour0.plusSeconds(60),
      """{"event": "update", "on": "vehicle", "at": "2022-11-24T10:02:11Z", "organization_id": "o", "data": {"id": "v-1", "location": {"lat": 1.5, "lng": 2.5, "at": "2022-11-24T10:02:10Z"}}}""",
      """{"event": "create", "on": "operating_period", "at": "2022-11-24T10:00:05Z", "organization_id": "o", "data": {"id": "op-1", "start": "2022-11-24T08:00:00Z", "finish": "2022-11-24T20:00:00Z"}}""")
    writeLanding(landing, "later.json", hour0.plusSeconds(3660),
      """{"event": "update", "on": "vehicle", "at": "2022-11-24T11:01:00Z", "organization_id": "o", "data": {"id": "v-1", "location": {"lat": 9.9, "lng": 9.9, "at": "2022-11-24T11:00:59Z"}}}""")

    // run 1: cold start → hour 10, only a.json picked up
    val wf1 = UUID.randomUUID().toString
    val r1 = IngestorJob.run(spark, store, landing, s"$root/staging", source, wf1)
    assert(r1.hour == hour0 && r1.filesFetched == 1 && r1.stagedPath.nonEmpty)

    val h1 = HandlerJob.run(spark, store, s"$root/tables", schemas, wf1)
    assert(h1.failures.isEmpty)
    assert(h1.recordsInserted == Map("vehicle" -> 1, "operating_period" -> 1))
    val vl = spark.read.parquet(s"$root/tables/vehicle_location")
    assert(vl.count() == 1)
    assert(vl.collect().head.getAs[Double]("vehicle_latitude") == 1.5)

    // run 2: cursor advanced to hour 11 → later.json picked up, upsert updates v-1
    val wf2 = UUID.randomUUID().toString
    val r2 = IngestorJob.run(spark, store, landing, s"$root/staging", source, wf2)
    assert(r2.hour == hour0.plusSeconds(3600) && r2.filesFetched == 1)
    val h2 = HandlerJob.run(spark, store, s"$root/tables", schemas, wf2)
    assert(h2.failures.isEmpty)
    val vl2 = spark.read.parquet(s"$root/tables/vehicle_location")
    // same vehicle, two distinct event timestamps → two rows (key = id+at)
    assert(vl2.count() == 2)

    // audit trail: 2 ingestor rows + 4 handler rows, all clean
    assert(store.ingestorRows().size == 2)
    assert(store.handlerRows().size == 4)
  }

  for (impl <- Seq("file", "jdbc"))
  test(s"a failed ingestor hour is retried: cursor ignores the traceback row [$impl]") {
    // the reference's retry contract (src/ingestor/ingestor.py:65-83 +
    // src/helper/postgres.py:99-103): a failed run records its
    // traceback, and the cursor MAX(fetch_hour) filters `traceback IS
    // NULL`, so the next run fetches the SAME hour again
    val root = tmpDir(s"retry_$impl")
    val landing = s"$root/landing"; Files.createDirectories(Paths.get(landing))
    val store = mkStore(impl, root)
    val schemas = EntitySchema.reference
    store.migrate(schemas.map(_.targetTable))
    val source = Pipelines.unionSourceStruct(schemas)
    writeLanding(landing, "a.json", hour0.plusSeconds(60),
      """{"event": "update", "on": "vehicle", "at": "2022-11-24T10:02:11Z", "organization_id": "o", "data": {"id": "v-1", "location": {"lat": 1.5, "lng": 2.5, "at": "2022-11-24T10:02:10Z"}}}""")

    // run 1: staging path is a regular FILE → the parquet write throws
    // after the hour was chosen; the failure row must still land
    val blocked = s"$root/staging_blocked"
    Files.write(Paths.get(blocked), "not a directory".getBytes(StandardCharsets.UTF_8))
    val wf1 = UUID.randomUUID().toString
    intercept[Throwable] {
      IngestorJob.run(spark, store, landing, blocked, source, wf1)
    }
    val failedRows = store.ingestorRows()
    assert(failedRows.size == 1)
    assert(failedRows.head.getAs[String]("traceback") != null,
      "failure must record its traceback")
    assert(failedRows.head.getAs[java.sql.Timestamp]("fetchedHour").toInstant == hour0)

    // run 2: healthy staging dir → the SAME hour is fetched again
    val wf2 = UUID.randomUUID().toString
    val r2 = IngestorJob.run(spark, store, landing, s"$root/staging", source, wf2)
    assert(r2.hour == hour0, s"failed hour must be retried, got ${r2.hour}")
    assert(r2.filesFetched == 1 && r2.stagedPath.nonEmpty)
    val rows = store.ingestorRows()
    assert(rows.size == 2)
    assert(rows.count(_.getAs[String]("traceback") != null) == 1)
    assert(rows.count(_.getAs[String]("traceback") == null) == 1)
    assert(rows.forall(
      _.getAs[java.sql.Timestamp]("fetchedHour").toInstant == hour0))

    // and only after the success does the cursor advance
    val r3 = IngestorJob.run(spark, store, landing, s"$root/staging", source,
      UUID.randomUUID().toString)
    assert(r3.hour == hour0.plusSeconds(3600))
  }

  test("quality gate blocks one entity's promotion, records it, others proceed") {
    import graft.ext.profile.Expectations._
    import org.apache.spark.sql.functions.col
    val root = tmpDir("gate")
    val landing = s"$root/landing"; Files.createDirectories(Paths.get(landing))
    val store = new FileMonitorStore(spark, s"$root/monitor",
      warehouseDir = Some(s"$root/tables"))
    val schemas = EntitySchema.reference
    store.migrate(schemas.map(_.targetTable))
    writeLanding(landing, "a.json", hour0.plusSeconds(60),
      """{"event": "update", "on": "vehicle", "at": "2022-11-24T10:02:11Z", "organization_id": "o", "data": {"id": "v-1", "location": {"lat": 99.5, "lng": 2.5, "at": "2022-11-24T10:02:10Z"}}}""",
      """{"event": "create", "on": "operating_period", "at": "2022-11-24T10:00:05Z", "organization_id": "o", "data": {"id": "op-1", "start": "2022-11-24T08:00:00Z", "finish": "2022-11-24T20:00:00Z"}}""")
    val wf = UUID.randomUUID().toString
    IngestorJob.run(spark, store, landing, s"$root/staging",
      Pipelines.unionSourceStruct(schemas), wf)
    // vehicle_latitude 99.5 violates the [-90, 90] expectation;
    // operating_period has no such column, so its checks pass — the
    // gate evaluates per entity on the READY (normalized) frame
    def gateFor = HandlerJob.QualityGate(Seq(
      inRange("lat_in_range",
        org.apache.spark.sql.functions
          .coalesce(col("vehicle_latitude"), org.apache.spark.sql.functions.lit(0.0)),
        org.apache.spark.sql.functions.lit(-90.0),
        org.apache.spark.sql.functions.lit(90.0))))
    // per-entity gates: only the vehicle schema carries the lat check
    val res = HandlerJob.run(spark, store, s"$root/tables",
      schemas.filter(_.entity == "vehicle"), wf, qualityGate = Some(gateFor))
    assert(res.recordsInserted.isEmpty)
    assert(res.failures.keySet == Set("vehicle"))
    assert(res.failures("vehicle").contains("quality gate failed"),
      res.failures("vehicle"))
    // the blocked entity was NOT promoted (migrate() pre-creates the
    // empty table dir, so an unreadable/empty parquet dir counts)
    val promoted =
      try spark.read.parquet(s"$root/tables/vehicle_location").count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    assert(promoted == 0L)
    // and the violation is in the audit trail
    val recorded = store.handlerRows()
      .filter(r => r.getAs[String]("workflowId") == wf)
    assert(recorded.exists(r =>
      Option(r.getAs[String]("traceback")).exists(_.contains("quality gate failed"))),
      recorded.mkString("; "))
  }

  test("handler with no staged file is a clean no-op") {
    val root = tmpDir("noop")
    val store = new FileMonitorStore(spark, s"$root/monitor")
    val res = HandlerJob.run(spark, store, s"$root/tables",
      EntitySchema.reference, UUID.randomUUID().toString)
    assert(res.recordsInserted.isEmpty && res.failures.isEmpty)
  }

  for (impl <- Seq("file", "jdbc"))
  test(s"precheck fails on a genuinely missing warehouse table, passes after migrate [$impl]") {
    val root = tmpDir(s"precheck_$impl")
    val store = mkStore(impl, root)
    // nothing migrated: the dynamic information_schema-twin must refuse
    val ex = intercept[IllegalArgumentException] {
      HandlerJob.run(spark, store, s"$root/tables",
        EntitySchema.reference, UUID.randomUUID().toString)
    }
    assert(ex.getMessage.contains("missing target tables"))
    store.migrate(EntitySchema.reference.map(_.targetTable))
    // after migration the same run is a clean no-op (no staged file)
    val res = HandlerJob.run(spark, store, s"$root/tables",
      EntitySchema.reference, UUID.randomUUID().toString)
    assert(res.recordsInserted.isEmpty && res.failures.isEmpty)
  }

  test("handler rejects non-UUID workflow ids (reference validation)") {
    val root = tmpDir("badwf")
    val store = new FileMonitorStore(spark, s"$root/monitor")
    assertThrows[IllegalArgumentException] {
      HandlerJob.run(spark, store, s"$root/tables", EntitySchema.reference, "not-a-uuid")
    }
  }

  test("executor arg consistency rules match the reference") {
    assert(Executor.parse(Seq("-s", "ingestor")).step == "ingestor")
    // workflow only valid with handler step
    assertThrows[IllegalArgumentException](
      Executor.parse(Seq("-s", "all", "-w", UUID.randomUUID().toString)))
    // handler step requires workflow
    assertThrows[IllegalArgumentException](Executor.parse(Seq("-s", "handler")))
    assert(Executor.parse(
      Seq("-s", "handler", "-w", UUID.randomUUID().toString)).workflow.nonEmpty)
  }
}
