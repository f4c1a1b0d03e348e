package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: generate the SynthGen corpus at a given SF into a dir —
  * the ScaleBench ensureCorpus step, standalone, so targeted rung
  * A/B cells (r14 optimization evidence) can run through graft.Bench
  * with SPARK_GRAFT_SF_DIR pointed at the rung corpus.
  *
  *   sbt "Test/runMain graft.GenSynth <dir> <sf>"
  */
object GenSynth {
  def main(args: Array[String]): Unit = {
    val Array(dir, sf) = args.take(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.tools.SynthGen.generate(spark, dir, sf.toDouble)
    println(s"[gensynth] done $dir sf=$sf")
    spark.stop()
  }
}
