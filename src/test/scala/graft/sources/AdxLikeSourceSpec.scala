package graft.sources

import java.sql.{DriverManager, SQLException}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The ADX-shaped DataSourceV2 connector against in-JVM Derby: DSv2
  * registration, filter pushdown + column pruning reaching the
  * compiled remote query text AND the physical plan, values
  * round-tripping against the plain JDBC read, and the shared retry
  * policy guarding schema resolution.
  */
class AdxLikeSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:adxlike;create=true"
  private val fmt = classOf[AdxLikeTableProvider].getName

  private def seed(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE readings") catch { case _: SQLException => () }
      // "at" is an SQL reserved word — created QUOTED, so the
      // connector's identifier quoting is what makes it readable
      st.execute(
        "CREATE TABLE readings (id BIGINT, device VARCHAR(16), temp DOUBLE, " +
          "amount DECIMAL(10,2), \"at\" TIMESTAMP)")
      (1 to 30).foreach(i => st.execute(
        s"INSERT INTO readings VALUES ($i, 'dev${i % 3}', ${i * 0.5}, ${i}.25, " +
          s"TIMESTAMP('2026-01-0${i % 9 + 1} 0${i % 10}:00:00'))"))
      st.close()
    } finally conn.close()
  }

  private def table = spark.read.format(fmt)
    .option("url", url).option("table", "readings").load()

  test("DSv2 read round-trips rows and types against the plain JDBC scan") {
    seed()
    val viaDsv2 = table.select("id", "device", "temp", "amount", "at")
      .collect().map(_.toSeq).toSet
    val viaJdbc = Jdbc.read(spark, url, "readings", Map.empty)
      .select(col("ID").as("id"), col("DEVICE"), col("TEMP"), col("AMOUNT"), col("at"))
      .collect().map(_.toSeq).toSet
    assert(viaDsv2 == viaJdbc)
    assert(viaDsv2.size == 30)
  }

  test("filters compile into the remote query text and appear in the plan") {
    seed()
    val q = table.filter(col("temp") > 10.0 && col("device") === "dev1").select("id")
    val rows = q.collect().map(_.getLong(0)).sorted
    assert(rows.nonEmpty && rows.forall(i => i * 0.5 > 10.0 && i % 3 == 1))
    // the compiled query carried both predicates AND the pruned SELECT
    val sent = AdxLike.lastQuery
    assert(sent.startsWith("SELECT \"ID\" FROM readings"), sent)
    assert(sent.contains("\"TEMP\" > 10.0") && sent.contains("\"DEVICE\" = 'dev1'"), sent)
    // and the plan advertises them (the scan's description)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(temp,10.0)"), plan)
  }

  test("unsupported predicates stay in Spark; supported ones still push") {
    seed()
    // endsWith has no compiled form -> Spark-side; the range pushes
    val q = table.filter(col("device").endsWith("2") && col("id") <= 10L)
    assert(q.count() == 3) // ids 2,5,8
    val sent = AdxLike.lastQuery
    assert(sent.contains("\"ID\" <= 10"), sent)
    assert(!sent.toLowerCase.contains("like"), sent)
  }

  test("IN / IS NULL / OR compile; decimal and timestamp literals land remote-side") {
    seed()
    val q = table.filter(
      (col("id").isin(1L, 2L, 3L) || col("amount") >= new java.math.BigDecimal("28.25"))
        && col("device").isNotNull)
    assert(q.count() == 6) // 1,2,3 + 28,29,30
    val sent = AdxLike.lastQuery
    assert(sent.contains("IN (1, 2, 3)") && sent.contains("\"AMOUNT\" >= 28.25"), sent)
    assert(sent.contains("\"DEVICE\" IS NOT NULL"), sent)
  }

  test("schema resolution goes through the connector retry policy") {
    seed()
    // transient failure first (08001 = retryable), then success: the
    // SAME withRetries/classify machinery the JDBC connector uses.
    var attempts = 0
    val schema = Jdbc.withRetries(3) {
      attempts += 1
      if (attempts < 2) throw new SQLException("conn dropped", "08001")
      AdxLike.resolveSchema(url, "readings", maxRetries = 1)
    }
    assert(attempts == 2)
    assert(schema.fieldNames.toSeq == Seq("id", "device", "temp", "amount", "at"))
    // fatal states do NOT retry: a missing table is a syntax-class error
    val e = intercept[SQLException] { AdxLike.resolveSchema(url, "no_such_table", 3) }
    assert(Jdbc.classify(e) == Jdbc.Fatal)
  }

  test("partitioned read shards via MOD in the remote queries without changing results") {
    seed()
    // NULL and negative partition-key rows must survive sharding:
    // SQL MOD of a negative is negative and MOD(NULL) is NULL, so a
    // naive MOD(col,n)=i union would silently drop both
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("INSERT INTO readings VALUES (NULL, 'devx', 0.0, 0.00, NULL)")
      st.execute("INSERT INTO readings VALUES (-7, 'devy', 0.0, 0.00, NULL)")
      st.close()
    } finally conn.close()
    val df = spark.read.format(fmt)
      .option("url", url).option("table", "readings")
      .option("partitionColumn", "id").option("numPartitions", "4").load()
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 32) // 30 + NULL-id + negative-id rows
    assert(df.agg(org.apache.spark.sql.functions.sum(col("id"))).head().getLong(0) == 458L)
    // each partition's compiled query carries its folded MOD slice
    assert(AdxLike.lastQuery.contains("MOD(MOD(\"ID\", 4) + 4, 4) ="), AdxLike.lastQuery)
    // pushdown composes with partitioning
    assert(df.filter(col("temp") > 10.0).count() == 10)
    assert(AdxLike.lastQuery.contains("\"TEMP\" > 10.0") &&
      AdxLike.lastQuery.contains("MOD(MOD(\"ID\", 4) + 4, 4) ="), AdxLike.lastQuery)
  }

  test("non-finite double literals are never pushed; the filter stays in Spark") {
    seed()
    val q = table.filter(col("temp") === Double.NaN)
    assert(q.count() == 0) // evaluated Spark-side, remote query untouched
    assert(!AdxLike.lastQuery.contains("NaN"), AdxLike.lastQuery)
  }

  test("short name 'adxlike' resolves through the DataSourceRegister SPI") {
    seed()
    val df = spark.read.format("adxlike")
      .option("url", url).option("table", "readings").load()
    assert(df.count() == 30)
  }

  test("registry integration: the DSv2 source reads through SourceRegistry like any source") {
    seed()
    SourceRegistry.register("adx_readings", (s, _) =>
      s.read.format(fmt).option("url", url).option("table", "readings").load())
    val df = SourceRegistry.read("adx_readings", spark, "ignored")
    assert(df.select("device").distinct().count() == 3)
  }
}
