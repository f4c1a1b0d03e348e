package graft

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool (round-15 optimization): per-JOB / per-STAGE attribution
  * for one registry query under the exact Bench session confs, so a
  * slow query's wall clock is attributable to a named stage (guide
  * §1.1 — "decide whether the time is going to shuffle read, shuffle
  * write, executor compute...") without standing up the UI.
  *
  *   sbt "Test/runMain graft.QueryProfile <query> [sfDir] [reps]"
  *
  * Prints, for the LAST rep (steady state): every job with wall
  * seconds, and every stage with task-time, shuffle read/write bytes,
  * input bytes, and spill. Reps > 1 separate warm/cold effects the
  * same way the bench's min-of-2 does.
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse(sys.error("usage: QueryProfile <query> [sfDir] [reps]"))
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class StageAgg(var name: String = "", var taskTimeMs: Long = 0,
      var shufRead: Long = 0, var shufWrite: Long = 0, var input: Long = 0,
      var memSpill: Long = 0, var diskSpill: Long = 0, var nTasks: Int = 0,
      var gcMs: Long = 0, var deserMs: Long = 0, var cpuNs: Long = 0)
    val stages = mutable.LinkedHashMap.empty[Int, StageAgg]
    val jobs = mutable.LinkedHashMap.empty[Int, (Long, Long, Seq[Int])] // start, end, stageIds
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(j.jobId) = (j.time, 0L, j.stageIds.map(_.toInt)) }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(j.jobId).foreach { case (s, _, ids) => jobs(j.jobId) = (s, j.time, ids) } }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = stages.synchronized {
        val si = sc.stageInfo
        val a = stages.getOrElseUpdate(si.stageId, StageAgg())
        a.name = si.name.takeWhile(_ != '\n').take(90)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = stages.synchronized {
        val a = stages.getOrElseUpdate(t.stageId, StageAgg())
        val m = t.taskMetrics
        if (m != null) {
          a.taskTimeMs += m.executorRunTime
          a.shufRead += m.shuffleReadMetrics.totalBytesRead
          a.shufWrite += m.shuffleWriteMetrics.bytesWritten
          a.input += m.inputMetrics.bytesRead
          a.memSpill += m.memoryBytesSpilled
          a.diskSpill += m.diskBytesSpilled
          a.gcMs += m.jvmGCTime
          a.deserMs += m.executorDeserializeTime
          a.cpuNs += m.executorCpuTime
          a.nTasks += 1
        }
      }
    }

    // optional: dump every action's EXECUTED plan with metrics (the
    // SQL-tab view) when QP_PLANS=1 — multi-action queries (training
    // loops, upserts) are invisible to a single explain() otherwise
    val dumpPlans = sys.env.get("QP_PLANS").contains("1")
    if (dumpPlans) spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
          println(s"\n#### action $funcName ${durationNs / 1e9} s ####")
          println(qe.executedPlan.toString.take(12000))
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
      })
    val fn = SparkEntry.queries(query)
    var r = 1
    while (r <= reps) {
      if (r == reps) spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      graft.tools.Force.rows(fn(spark, dir))
      println(f"[profile] $query rep $r wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r += 1
    }
    Thread.sleep(500) // let listener drain
    def mb(b: Long) = f"${b / 1e6}%.1f"
    println(s"== jobs (last rep) ==")
    jobs.foreach { case (id, (s, e, ids)) =>
      println(f"job $id%3d  wall ${(e - s) / 1e3}%7.2f s  stages ${ids.mkString(",")}")
    }
    println(s"== stages (last rep) ==")
    stages.toSeq.sortBy(-_._2.taskTimeMs).foreach { case (id, a) =>
      println(f"stage $id%4d tasks ${a.nTasks}%3d taskTime ${a.taskTimeMs / 1e3}%8.2f s " +
        f"cpu ${a.cpuNs / 1e9}%7.2f gc ${a.gcMs / 1e3}%5.2f deser ${a.deserMs / 1e3}%5.2f " +
        f"in ${mb(a.input)}%8s MB sr ${mb(a.shufRead)}%8s MB sw ${mb(a.shufWrite)}%8s MB " +
        f"spill ${mb(a.memSpill)}%8s/${mb(a.diskSpill)}%s MB  ${a.name}")
    }
    spark.stop()
  }
}
