package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Presentation sink — the engine's counterpart to the reference's
  * Streamlit result display (reference: Architectural
  * Options/Opus.md:622-649, the documented downstream of every
  * pipeline result). Spark-first altitude: the report is rendered
  * DRIVER-SIDE from (a) one distributed aggregate for count + numeric
  * summaries and (b) a BOUNDED `limit(maxRows)` sample — it never
  * collects an unbounded result, so pointing it at a
  * billion-row frame costs one aggregation job plus `maxRows` rows of
  * driver memory. Output is self-contained GitHub-flavored markdown
  * (renderable anywhere a human reads results); `write` lands it as a
  * file next to the data sinks in [[Sinks]].
  */
object ReportSink {

  /** Markdown report: title, schema, row count, per-numeric-column
    * min/max/mean (one aggregate job), and the first `maxRows` rows
    * (a second, limit-short-circuited job). TWO actions total over
    * `df`'s lineage — fine for the summary-sized frames reports are
    * made of; for an expensive upstream (a large join/agg), persist
    * the frame yourself before rendering, because the sample job
    * re-executes the lineage up to its first shuffle (review r19:
    * the old header claimed one job).
    */
  def render(df: DataFrame, title: String, maxRows: Int = 20): String = {
    val sb = new StringBuilder
    sb.append(s"# $title\n\n")
    sb.append("## Schema\n\n| column | type | nullable |\n|---|---|---|\n")
    df.schema.fields.foreach { f =>
      sb.append(s"| ${esc(f.name)} | ${f.dataType.simpleString} | ${f.nullable} |\n")
    }
    val numeric = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }
    // one job: count + min/max/mean for every numeric column.
    // Backtick-quoted: a column name containing a dot (legal, common
    // from JSON ingest) would otherwise parse as struct-field access
    // and fail the whole report.
    val aggs = count(lit(1)).as("__n") +: numeric.toSeq.flatMap { c =>
      val qc = col(s"`$c`")
      Seq(min(qc).as(s"__min_$c"), max(qc).as(s"__max_$c"),
        avg(qc).as(s"__avg_$c"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val n = stats.getAs[Long]("__n")
    sb.append(s"\n## Summary\n\n$n rows\n")
    if (numeric.nonEmpty) {
      sb.append("\n| column | min | max | mean |\n|---|---|---|---|\n")
      numeric.foreach { c =>
        sb.append(s"| ${esc(c)} | ${fmt(stats.getAs[Any](s"__min_$c"))} | " +
          s"${fmt(stats.getAs[Any](s"__max_$c"))} | ${fmt(stats.getAs[Any](s"__avg_$c"))} |\n")
      }
    }
    sb.append(s"\n## First ${math.min(maxRows.toLong, n)} rows\n\n")
    val names = df.schema.fieldNames
    sb.append(names.map(esc).mkString("| ", " | ", " |\n"))
    sb.append(names.map(_ => "---").mkString("| ", " | ", " |\n"))
    df.limit(maxRows).collect().foreach { row =>
      sb.append(names.indices.map(i => fmt(row.get(i))).mkString("| ", " | ", " |\n"))
    }
    sb.toString
  }

  /** Markdown-safe cell/header text (column names included). */
  private def esc(s: String): String = s.replace("|", "\\|").replace("\n", " ")

  private def fmt(v: Any): String = v match {
    case null => ""
    case d: Double =>
      // Locale.ROOT: dot-decimal regardless of the JVM default locale
      if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
      else String.format(java.util.Locale.ROOT, "%.6g", java.lang.Double.valueOf(d))
    case other => esc(other.toString)
  }

  /** Render and write the report file (driver-side, local or any
    * path `java.nio.file` can reach).
    */
  def write(df: DataFrame, title: String, path: String, maxRows: Int = 20): Unit = {
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path),
      render(df, title, maxRows).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }
}
