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

  test("bucketed tables join without a shuffle (co-located join)") {
    // idempotent: drop catalog entries AND stale managed locations
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val orders = Sources.orders(spark, "/root/testdata/sf0.001")
    val lineitem = Sources.lineitem(spark, "/root/testdata/sf0.001")
    Sinks.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 4)
    Sinks.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", Seq("o_orderkey"), 4)
    val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    // force a non-broadcast join so bucketing is what removes the shuffle
    val smj = joined.hint("merge")
    assert(smj.count() == lineitem.count())
    val plan = smj.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
  }

  test("registry reads every fixture table") {
    graft.sources.Sources.tableNames.foreach { t =>
      val reader = SourceRegistry.get(t)
      assert(reader(spark, "/root/testdata/sf0.001").columns.nonEmpty, t)
    }
  }
}
