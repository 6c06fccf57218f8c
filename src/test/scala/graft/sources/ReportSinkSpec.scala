package graft.sources

import graft.SparkSpec

/** The presentation sink renders bounded, correct markdown. */
class ReportSinkSpec extends SparkSpec {

  private def df = {
    import sqlImplicits._
    Seq((1L, "a|b", 2.5), (2L, "c", 4.5), (3L, "d\ne", 6.0)).toDF("id", "name", "score")
  }

  test("render: title, schema, exact summary stats, escaped sample rows") {
    val md = ReportSink.render(df, "Weekly readings", maxRows = 2)
    assert(md.startsWith("# Weekly readings"))
    assert(md.contains("| id | bigint |") && md.contains("| score | double |"))
    assert(md.contains("3 rows"))
    // one-job stats are exact: min/max/mean of score = 2.5/6.0/4.333...
    assert(md.contains("| id | 1 | 3 | 2 |"))
    assert(md.contains("| score | 2.50000 | 6 | 4.33333 |"))
    // sample bounded to maxRows; cell text markdown-safe
    assert(md.contains("a\\|b"))
    assert(!md.contains("| 3 | d"), "limit(2) must bound the sample")
  }

  test("a column name containing a dot reports stats instead of failing as struct access") {
    import sqlImplicits._
    val dotted = Seq((1L, 2.0), (2L, 4.0)).toDF("id", "price.usd")
    val md = ReportSink.render(dotted, "Dotted", maxRows = 2)
    assert(md.contains("| price.usd | 2 | 4 | 3 |"), md)
  }

  test("render is total on an empty frame and write lands the file") {
    import sqlImplicits._
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val md = ReportSink.render(empty, "Empty")
    assert(md.contains("0 rows"))
    val path = java.nio.file.Files.createTempFile("graft-report", ".md").toString
    ReportSink.write(df, "T", path)
    assert(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
      .startsWith("# T"))
  }
}
