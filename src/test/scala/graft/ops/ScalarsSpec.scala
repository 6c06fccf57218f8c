package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScalarsSpec extends SparkSpec {

  test("stringTailLower: edge lengths n<=0, n>=len (adx_plugin.py:278-286)") {
    import sqlImplicits._
    val df = Seq("HelloWorld").toDF("s")
    def tail(n: Int): String =
      df.select(Scalars.stringTailLower(col("s"), n).as("t")).as[String].head()
    assert(tail(3) == "rld")
    assert(tail(0) == "")
    assert(tail(-2) == "")
    assert(tail(10) == "helloworld")
    assert(tail(99) == "helloworld")
  }

  test("coerceSpecialDouble: Kusto special values and parse failures") {
    import sqlImplicits._
    val df = Seq("NaN", "Infinity", "-Infinity", "1.5", "garbage").toDF("s")
    val out = df.select(Scalars.coerceSpecialDouble(col("s")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0).exists(_.isNaN))
    assert(out(1).contains(Double.PositiveInfinity))
    assert(out(2).contains(Double.NegativeInfinity))
    assert(out(3).contains(1.5))
    assert(out(4).isEmpty)
  }

  test("ticksToInterval: 1 tick = 100ns (adx_plugin.py:182-195)") {
    import sqlImplicits._
    // 10_000_000 ticks = 1 second
    val df = Seq(10000000L).toDF("ticks")
    val s = df.select(Scalars.ticksToInterval(col("ticks")).cast("string").as("i")).as[String].head()
    assert(s.contains("00:00:01"), s)
  }

  test("timespanStringToInterval parses d.hh:mm:ss and hh:mm:ss") {
    import sqlImplicits._
    val df = Seq("1.02:03:04", "02:03:04", "bogus").toDF("s")
    val out = df.select(Scalars.timespanStringToInterval(col("s")).cast("string").as("i")).collect()
    assert(out(0).getString(0).startsWith("INTERVAL '1 02:03:04"))
    assert(out(1).getString(0).startsWith("INTERVAL '0 02:03:04"))
    assert(out(2).isNullAt(0))
  }

  // `weekAlignment` fixture: snap-back/forward arithmetic, UTC
  // (ExampleAiCode.md:206-211). 2024-01-07 is a Sunday.
  test("sundayWeekStart/saturdayWeekEnd: mid-week and Sunday-start edges") {
    import sqlImplicits._
    val df = Seq("2024-01-07", "2024-01-10", "2024-01-13", "2024-01-14").toDF("d")
    val out = df.select(
      Scalars.sundayWeekStart(col("d")).cast("string").as("ws"),
      Scalars.saturdayWeekEnd(col("d")).cast("string").as("we")).collect()
    assert(out(0).getString(0) == "2024-01-07" && out(0).getString(1) == "2024-01-13") // Sunday stays
    assert(out(1).getString(0) == "2024-01-07" && out(1).getString(1) == "2024-01-13") // Wednesday snaps back
    assert(out(2).getString(0) == "2024-01-07" && out(2).getString(1) == "2024-01-13") // Saturday stays in week
    assert(out(3).getString(0) == "2024-01-14") // next Sunday starts a new week
  }

  test("weekLabel formats '{ws} - {we}' (ExampleAiCode.md:216-218)") {
    import sqlImplicits._
    val df = Seq("2024-01-10").toDF("d")
    assert(df.select(Scalars.weekLabel(col("d")).as("l")).as[String].head() == "2024-01-07 - 2024-01-13")
  }
}
