package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {

  test("date-partitioned write creates dt= directories and round-trips") {
    val out = java.nio.file.Files.createTempDirectory("sink-part").toString
    val events = Sources.events(spark, "/root/testdata/sf0.001").limit(200)
    Sinks.writePartitionedByDate(events, "ts", out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("dt=")))
    val back = spark.read.parquet(out)
    assert(back.count() == 200)
    // date predicate prunes to a partition subset at planning time
    val oneDay = back.filter(col("dt") === dirs.head.stripPrefix("dt="))
    assert(oneDay.count() > 0)
  }

  test("threshold write-back appends only defined (Low-variance) rows") {
    import sqlImplicits._
    val out = java.nio.file.Files.createTempDirectory("sink-thr").toString
    val thresholds = Seq(
      ("cooling_stage_1", Some(640.0)),
      ("heating_stage_1", None),
      ("fan_stage", Some(210.0))).toDF("stage", "threshold")
    Sinks.writeBackThresholds(thresholds, out)
    Sinks.writeBackThresholds(thresholds, out) // append semantics
    val back = spark.read.parquet(out)
    assert(back.count() == 4) // 2 defined rows x 2 appends
    assert(back.filter(col("threshold").isNull).count() == 0)
  }

  test("registry reads every fixture table") {
    graft.sources.Sources.tableNames.foreach { t =>
      val reader = SourceRegistry.get(t)
      assert(reader(spark, "/root/testdata/sf0.001").columns.nonEmpty, t)
    }
  }
}
