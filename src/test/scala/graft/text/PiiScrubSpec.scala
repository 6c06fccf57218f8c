package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiScrubSpec extends SparkSpec {

  private def one(text: String): (String, Map[String, Int]) = {
    import sqlImplicits._
    val df = PiiScrub.scrubbed(Seq(text).toDF("t"), "t")
    val r = df.select("scrubbed", "n_email", "n_phone", "n_ssn", "n_ipv4").head()
    (r.getString(0), Map(
      "email" -> r.getInt(1), "phone" -> r.getInt(2),
      "ssn" -> r.getInt(3), "ipv4" -> r.getInt(4)))
  }

  test("each pattern redacts and counts its own shape") {
    val (s1, c1) = one("write to jane.doe+spam@sub.example.co.uk today")
    assert(s1 == "write to <EMAIL> today", s1)
    assert(c1 == Map("email" -> 1, "phone" -> 0, "ssn" -> 0, "ipv4" -> 0))

    val (s2, c2) = one("call +1 at 555-867-5309 or 555.867.5309")
    assert(s2 == "call +1 at <PHONE> or <PHONE>", s2)
    assert(c2("phone") == 2 && c2("ssn") == 0)

    val (s3, c3) = one("ssn 078-05-1120 on file")
    assert(s3 == "ssn <SSN> on file", s3)
    assert(c3 == Map("email" -> 0, "phone" -> 0, "ssn" -> 1, "ipv4" -> 0))

    val (s4, c4) = one("from 192.168.10.1 and 10.0.0.7")
    assert(s4 == "from <IP> and <IP>", s4)
    assert(c4("ipv4") == 2)
  }

  test("mixed text: phone and ssn shapes stay disjoint; counts precede replacement") {
    val (s, c) = one("a@b.io 555-123-4567 123-45-6789 1.2.3.4")
    assert(s == "<EMAIL> <PHONE> <SSN> <IP>", s)
    assert(c == Map("email" -> 1, "phone" -> 1, "ssn" -> 1, "ipv4" -> 1))
  }

  test("scrubbing is idempotent: a scrubbed text has nothing left to redact") {
    import sqlImplicits._
    val texts = Seq(
      "a@b.io 555-123-4567 123-45-6789 1.2.3.4 plain words",
      "no pii here at all")
    val once = PiiScrub.scrubbed(texts.toDF("t"), "t")
      .select(col("scrubbed").as("t"))
    val twice = PiiScrub.scrubbed(once, "t")
    val r = twice.agg(
      sum("n_email"), sum("n_phone"), sum("n_ssn"), sum("n_ipv4")).head()
    assert((0 to 3).forall(i => r.getLong(i) == 0L), r)
  }

  test("clean text passes through byte-identical") {
    val raw = "the quick brown fox jumped over thirteen lazy dogs"
    val (s, c) = one(raw)
    assert(s == raw)
    assert(c.values.sum == 0)
  }

  test("the plan is a pure projection: no shuffle, no UDF") {
    import sqlImplicits._
    val plan = PiiScrub.scrubbed(Seq("x").toDF("t"), "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.toLowerCase.contains("pythonudf"), plan)
  }
}
