package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import graft.jobs.{Executor, IngestorJob}

/** Drives the CLI entry point end-to-end (`--step all`) over a temp
  * warehouse root, the closest analogue to the reference's
  * docker-compose manual verification. */
class ExecutorE2ESpec extends SparkSpec {

  test("executor --step all runs ingestor then handler over one root") {
    val root = tmpDir("exec-e2e")
    val landing = s"$root/landing"
    Files.createDirectories(Paths.get(landing))
    val p = Paths.get(s"$landing/a.json")
    Files.write(p, Seq(
      """{"event": "update", "on": "vehicle", "at": "2022-11-24T10:02:11Z", "organization_id": "o", "data": {"id": "v-1", "location": {"lat": 1.0, "lng": 2.0, "at": "2022-11-24T10:02:10Z"}}}""",
      """{"event": "create", "on": "operating_period", "at": "2022-11-24T10:00:05Z", "organization_id": "o", "data": {"id": "op-1", "start": "2022-11-24T08:00:00Z", "finish": "2022-11-24T20:00:00Z"}}"""
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.setLastModifiedTime(p, FileTime.from(IngestorJob.coldStart.plusSeconds(60)))

    Executor.run(spark, Executor.parse(Seq("--root", root, "--landing", landing)))

    assert(spark.read.parquet(s"$root/tables/vehicle_location").count() == 1)
    assert(spark.read.parquet(s"$root/tables/operating_periods").count() == 1)
    assert(spark.read.parquet(s"$root/monitor/ingestor_executions").count() == 1)
    assert(spark.read.parquet(s"$root/monitor/handler_executions").count() == 2)
  }

  test("executor --monitor-url routes execution metadata through the JDBC store") {
    val root = tmpDir("exec-jdbc")
    val landing = s"$root/landing"
    Files.createDirectories(Paths.get(landing))
    val p = Paths.get(s"$landing/a.json")
    Files.write(p, Seq(
      """{"event": "update", "on": "vehicle", "at": "2022-11-24T10:02:11Z", "organization_id": "o", "data": {"id": "v-1", "location": {"lat": 1.0, "lng": 2.0, "at": "2022-11-24T10:02:10Z"}}}"""
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.setLastModifiedTime(p, FileTime.from(IngestorJob.coldStart.plusSeconds(60)))

    val url = s"jdbc:derby:memory:exec_${java.util.UUID.randomUUID().toString.take(8)};create=true"
    Executor.run(spark, Executor.parse(
      Seq("--root", root, "--landing", landing, "--monitor-url", url)))

    // data lands in the warehouse; metadata lives in Derby, NOT parquet
    assert(spark.read.parquet(s"$root/tables/vehicle_location").count() == 1)
    assert(!Files.exists(Paths.get(s"$root/monitor")),
      "JDBC mode must not write parquet monitor tables")
    val store = new graft.meta.JdbcMonitorStore(spark, url)
    assert(store.ingestorRows().size == 1)
    assert(store.handlerRows().size == 2)
    assert(store.lastSuccessfulFetchHour().contains(IngestorJob.coldStart))
  }
}
