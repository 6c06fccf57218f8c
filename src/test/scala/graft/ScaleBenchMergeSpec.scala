package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the selective-sweep merge (`SPARK_GRAFT_SCALE_ONLY`):
  * fresh entries replace/extend per-scale queries and alphas, every
  * untouched prior measurement survives byte-identically, and an
  * unparseable prior falls back to the fresh line.
  */
class ScaleBenchMergeSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private val prior =
    """{"base":"b","unit":"sec","runs":2,"metric":"min",
      |"scales":[
      | {"scale_x":1,"docs":10,"queries":{"a":{"sec":1.0,"rows":5},"b":{"sec":2.0,"rows":6}}},
      | {"scale_x":3,"docs":30,"queries":{"a":{"sec":3.0,"rows":15},"b":{"sec":6.0,"rows":18}}}
      |],
      |"alpha_log_time_ratio":{"a":1.0,"b":1.0},
      |"alpha_note":"n"}""".stripMargin.replace("\n", "")

  private val fresh =
    """{"base":"b","unit":"sec","runs":2,"metric":"min",
      |"scales":[
      | {"scale_x":1,"docs":10,"queries":{"b":{"sec":0.5,"rows":6},"c":{"sec":4.0,"rows":1}}},
      | {"scale_x":3,"docs":30,"queries":{"b":{"sec":1.5,"rows":18},"c":{"sec":12.0,"rows":3}}},
      | {"scale_x":10,"docs":100,"queries":{"c":{"sec":40.0,"rows":10}}}
      |],
      |"alpha_log_time_ratio":{"b":1.0,"c":1.0},
      |"alpha_note":"n"}""".stripMargin.replace("\n", "")

  test("fresh entries replace and extend; untouched entries survive; new scales append") {
    val merged = mapper.readTree(ScaleBench.mergeSweeps(prior, fresh))
    val scales = merged.get("scales")
    assert(scales.size() == 3)
    val x1 = scales.get(0)
    assert(x1.get("scale_x").asInt() == 1)
    // untouched prior entry survives
    assert(x1.get("queries").get("a").get("sec").asDouble() == 1.0)
    // fresh entry replaces the prior measurement
    assert(x1.get("queries").get("b").get("sec").asDouble() == 0.5)
    // brand-new entry lands
    assert(x1.get("queries").get("c").get("sec").asDouble() == 4.0)
    // scale only in the fresh sweep is appended
    assert(scales.get(2).get("scale_x").asInt() == 10)
    val alpha = merged.get("alpha_log_time_ratio")
    assert(alpha.get("a").asDouble() == 1.0)
    assert(alpha.get("c").asDouble() == 1.0)
  }

  test("unparseable prior falls back to the fresh line") {
    assert(ScaleBench.mergeSweeps("not json{", fresh) == fresh)
  }

  test("merge output is valid JSON parseable end-to-end") {
    val merged = ScaleBench.mergeSweeps(prior, fresh)
    val re = mapper.readTree(merged)
    assert(re.get("base").asText() == "b")
    assert(re.get("alpha_note").asText() == "n")
  }
}
