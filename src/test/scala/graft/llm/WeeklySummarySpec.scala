package graft.llm

import graft.SparkSpec
import graft.sources.Sources

class WeeklySummarySpec extends SparkSpec {

  test("stage-pair expansion mirrors the reference set algebra") {
    val pairs = Seq(("cooling_stage_1", "cooling_stage_2"), ("heating_stage_1", "heating_stage_2"))
    assert(WeeklySummary.stagesToAnalyse(Set("cooling_stage_1"), pairs) ==
      Set("cooling_stage_1", "cooling_stage_2"))
    assert(WeeklySummary.stagesToAnalyse(Set("heating_stage_2"), pairs) ==
      Set("heating_stage_1", "heating_stage_2"))
    assert(WeeklySummary.stagesToAnalyse(Set("fan_stage"), pairs) == Set("fan_stage"))
    assert(WeeklySummary.stagesToAnalyse(Set.empty, pairs) == Set.empty)
  }

  test("weekly stats + prompt + stub client end-to-end on events fixture") {
    val events = Sources.events(spark, "/root/testdata/sf0.001")
    val (prompt, response) = WeeklySummary.analyse(
      events, deviceId = "dev-13",
      tsCol = "ts", stageCol = "event_type", valueCol = "value",
      highVariance = Set("purchase", "click"),
      pairs = Seq(("purchase", "view")))
    assert(prompt.contains("dev-13"))
    assert(prompt.contains("Week "))
    assert(prompt.contains("purchase:") && prompt.contains("view:") && prompt.contains("click:"))
    assert(!prompt.contains("signup:")) // not in the analysis set
    assert(response.startsWith("[stub-llm]"))
  }

  test("weekly stats buckets are Sunday-aligned and stats are ints") {
    val events = Sources.events(spark, "/root/testdata/sf0.001")
    val weekly = WeeklySummary.weeklyStats(events, "ts", "event_type", "value", Set("error"))
    val rows = weekly.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ws = r.getAs[java.sql.Date]("week_start").toLocalDate
      assert(ws.getDayOfWeek == java.time.DayOfWeek.SUNDAY, s"$ws")
      assert(r.getAs[String]("week_label").startsWith(ws.toString))
    }
  }
}
