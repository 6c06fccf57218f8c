package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiler for the q36 pipeline: per-step wall times from
  * the pipeline's own execution log, then the final count.
  */
object DebugQ36 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (run <- 1 to 3) {
      val t0 = System.nanoTime()
      val ctx = graft.text.CurationPipeline.run(spark, sfDir)
      val t1 = System.nanoTime()
      val n = ctx.table("curated").count()
      val t2 = System.nanoTime()
      println(s"RUN $run: pipeline=${(t1 - t0) / 1e9}s count=${(t2 - t1) / 1e9}s rows=$n")
      ctx.executionLog.foreach(e => println(s"  step $e"))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
