package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler for the bench-dominant queries (run manually:
  * `sbt "Test/runMain graft.ProfileMinhash <query> <sfDir>"`). Prints
  * per-stage wall time, task count, and the first line of the stage
  * name so shuffle boundaries are attributable. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val query = if (args.nonEmpty) args(0) else "docs_minhash_pairs"
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Int, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(-1L)
        stages += ((i.stageId, ms, i.numTasks, i.name.linesIterator.next().take(90)))
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(query)(spark, sf).count()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(500) // let listener drain
    stages.sortBy(-_._2).take(15).foreach { case (id, ms, n, name) =>
      println(f"stage $id%4d  ${ms / 1000.0}%6.2f s  $n%4d tasks  $name")
    }
    spark.stop()
  }
}
