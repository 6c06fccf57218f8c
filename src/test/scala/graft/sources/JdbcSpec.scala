package graft.sources

import java.sql.{DriverManager, SQLException}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JDBC path against an in-JVM Derby database (derby ships with the
  * Spark distribution, so this exercises the real
  * `spark.read.format("jdbc")` machinery with zero network).
  */
class JdbcSpec extends SparkSpec {

  // Derby registers itself with DriverManager via the JDBC SPI, so no
  // explicit driver class is needed (Spark falls back to
  // DriverManager.getDriver(url)).
  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = Map.empty[String, String]

  private def seed(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE sensors") catch { case _: SQLException => () }
      st.execute("CREATE TABLE sensors (id INT PRIMARY KEY, device VARCHAR(16), reading DOUBLE)")
      (1 to 20).foreach(i =>
        st.execute(s"INSERT INTO sensors VALUES ($i, 'dev${i % 3}', ${i * 1.5})"))
      st.close()
    } finally conn.close()
  }

  test("jdbc read round-trips rows and pushes filters to the database") {
    seed()
    val df = Jdbc.read(spark, url, "sensors", props)
    assert(df.count() == 20)
    val filtered = df.filter(col("reading") > 15.0).select("id", "device")
    assert(filtered.count() == 10)
    // Pushdown is visible in the physical plan: JDBC scans advertise
    // PushedFilters, so the WHERE runs database-side.
    val plan = filtered.queryExecution.executedPlan.toString
    // Derby upper-cases identifiers; the filter must appear in the scan's
    // PushedFilters (i.e. executed database-side, not in Spark).
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(READING,15.0)"), plan)
  }

  test("partitioned jdbc read shards on the numeric column without changing results") {
    seed()
    val df = Jdbc.readPartitioned(spark, url, "sensors", "id", 1L, 21L, 4, props)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.agg(sum("id")).head().getLong(0) == 210L)
  }

  test("registry integration: a registered JDBC source reads like any named source") {
    seed()
    Jdbc.register("sensors_db", url, "sensors", props)
    val df = SourceRegistry.get("sensors_db")(spark, "ignored-dir")
    assert(df.select("device").distinct().count() == 3)
  }

  test("the registry's 'events' reader is the typed one: ts comes back as a real timestamp") {
    // the generic parquet reader would either throw on TIMESTAMP(NANOS)
    // or hand consumers raw nanos as a LongType
    val df = SourceRegistry.get("events")(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType,
      df.schema.treeString)
  }

  test("classification: auth/syntax are fatal, connection/deadlock retryable") {
    assert(Jdbc.classify(new SQLException("denied", "28000")) == Jdbc.Fatal)
    assert(Jdbc.classify(new SQLException("bad sql", "42X01")) == Jdbc.Fatal)
    assert(Jdbc.classify(new SQLException("gone", "08003")) == Jdbc.Retryable)
    assert(Jdbc.classify(new SQLException("deadlock", "40001")) == Jdbc.Retryable)
    assert(Jdbc.classify(new SQLException("??", "XJ004")) == Jdbc.Fatal) // unknown -> fatal
    assert(Jdbc.classify(new RuntimeException("wrapper",
      new SQLException("link down", "08S01"))) == Jdbc.Retryable)
    assert(Jdbc.classify(new RuntimeException("Communications link failure")) == Jdbc.Retryable)
    // transient message buried in the cause chain behind a stateless SQLException
    assert(Jdbc.classify(new RuntimeException("query failed",
      new SQLException("Connection reset"))) == Jdbc.Retryable)
    // SQLState deeper than a stateless wrapper SQLException
    assert(Jdbc.classify(new SQLException("outer, no state",
      new SQLException("deadlock", "40001"))) == Jdbc.Retryable)
    // a FATAL state short-circuits the transient-message heuristic:
    // an auth failure whose message mentions "timeout" (SQL Server's
    // "Login failed ... connection timeout expired") must fail fast
    assert(Jdbc.classify(new SQLException(
      "Login failed for user: connection timeout expired", "28000")) == Jdbc.Fatal)
    assert(Jdbc.classify(new SQLException(
      "syntax error near 'timeout'", "42000")) == Jdbc.Fatal)
    intercept[IllegalArgumentException] { Jdbc.withRetries(maxRetries = 0) { 42 } }
  }

  test("jdbc write-back: guarded thresholds land in the database, nulls filtered") {
    import sqlImplicits._
    val thresholds = Seq(
      ("cooling_stage_1", Some(1200.0)),
      ("heating_stage_1", None),
      ("fan_stage", Some(340.0))).toDF("stage", "threshold")
    Sinks.writeBackThresholdsJdbc(thresholds, url, "alert_thresholds", props)
    val back = Jdbc.read(spark, url, "alert_thresholds", props)
    assert(back.count() == 2) // the null-threshold stage never writes
    assert(back.filter(col("threshold").isNull).count() == 0)
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute("DROP TABLE alert_thresholds")
    finally conn.close()
  }

  test("SourceRegistry.read applies the connector retry policy to flaky readers") {
    var attempts = 0
    SourceRegistry.register("flaky_source", (s, d) => {
      attempts += 1
      if (attempts < 3) throw new SQLException("connection lost", "08006")
      Sources.read(s, d, "region")
    })
    val df = SourceRegistry.read("flaky_source", spark, "/root/testdata/sf0.001")
    assert(df.count() == 5 && attempts == 3)
  }

  test("retry loop: retryable succeeds on a later attempt, fatal fails fast") {
    var calls = 0
    val out = Jdbc.withRetries(maxRetries = 3, backoffMs = 1L) {
      calls += 1
      if (calls < 3) throw new SQLException("flaky", "08001")
      "ok"
    }
    assert(out == "ok" && calls == 3)

    var fatalCalls = 0
    intercept[SQLException] {
      Jdbc.withRetries(maxRetries = 3, backoffMs = 1L) {
        fatalCalls += 1
        throw new SQLException("denied", "28000")
      }
    }
    assert(fatalCalls == 1)

    // a persistent retryable failure surfaces after maxRetries
    var always = 0
    intercept[SQLException] {
      Jdbc.withRetries(maxRetries = 3, backoffMs = 1L) {
        always += 1
        throw new SQLException("flaky forever", "08001")
      }
    }
    assert(always == 3)
  }
}
