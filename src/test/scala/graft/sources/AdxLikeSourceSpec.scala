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
    // the numeric predicate pushed into the remote query; the STRING
    // equality stayed Spark-side (remote string comparison is a
    // collation/padding fact Spark cannot assume matches its binary
    // semantics), so DEVICE rides back for the Spark-side filter
    val sent = AdxLike.lastQuery
    assert(sent.contains("\"TEMP\" > 10.0"), sent)
    assert(!sent.contains("\"DEVICE\" = 'dev1'"), sent)
    assert(sent.contains("\"DEVICE\""), sent) // column kept for the re-filter
    // and the plan advertises the pushed one (the scan's description)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(temp,10.0)"), plan)
    assert(!plan.contains("EqualTo(device"), plan)
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

  test("aggregates compile into the remote GROUP BY (complete pushdown, single partition)") {
    seed()
    val q = table.groupBy(col("device"))
      .agg(count(lit(1)).as("n"), sum("id").as("s"), avg("id").as("a"),
        min("amount").as("mn"), max("temp").as("mx"))
    val got = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDecimal(4), r.getDouble(5))).toSet
    // expected via the plain JDBC path (no aggregate pushdown there)
    val exp = Jdbc.read(spark, url, "readings", Map.empty)
      .groupBy(col("DEVICE"))
      .agg(count(lit(1)), sum("ID"), avg("ID"), min("AMOUNT"), max("TEMP"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDecimal(4), r.getDouble(5))).toSet
    assert(got == exp)
    val sent = AdxLike.lastQuery
    assert(sent.contains("GROUP BY \"DEVICE\""), sent)
    assert(sent.contains("COUNT(*)") && sent.contains("SUM(\"ID\")"), sent)
    // integral AVG is cast to DOUBLE remote-side — Derby's AVG(BIGINT)
    // truncates to a whole number, Spark's avg never does
    assert(sent.contains("AVG(CAST(\"ID\" AS DOUBLE))"), sent)
    assert(q.queryExecution.executedPlan.toString.contains("PushedAggregates"), "plan should advertise the pushed aggregate")
    // the avg values are true doubles (dev1 ids: 1,4,...,28 -> 14.5)
    assert(got.exists { case (d, _, _, a, _, _) => d == "dev1" && a == 14.5 })
  }

  test("count() pushes COUNT(*) as the entire remote query") {
    seed()
    assert(table.count() == 30L)
    assert(AdxLike.lastQuery == "SELECT COUNT(*) FROM readings", AdxLike.lastQuery)
  }

  test("sharded reads push PARTIAL per-shard aggregates that Spark merges") {
    seed()
    val df = spark.read.format(fmt)
      .option("url", url).option("table", "readings")
      .option("partitionColumn", "id").option("numPartitions", "4").load()
    val q = df.groupBy(col("device"))
      .agg(count(lit(1)).as("n"), sum("temp").as("s"), min("id").as("mn"), max("id").as("mx"))
    val got = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toSet
    val exp = Jdbc.read(spark, url, "readings", Map.empty)
      .groupBy(col("DEVICE"))
      .agg(count(lit(1)), sum("TEMP"), min("ID"), max("ID"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == exp)
    // each shard's remote query aggregates ITS slice; Spark's final
    // agg merges the four partials
    val sent = AdxLike.lastQuery
    assert(sent.contains("GROUP BY \"DEVICE\"") && sent.contains("MOD(MOD(\"ID\", 4) + 4, 4) ="), sent)
  }

  test("DISTINCT pushes only when the remote result is final") {
    seed()
    // single partition: complete pushdown, DISTINCT compiles
    val single = table.agg(count_distinct(col("device")).as("d"))
    assert(single.head().getLong(0) == 3L)
    assert(AdxLike.lastQuery.contains("COUNT(DISTINCT \"DEVICE\")"), AdxLike.lastQuery)
    // sharded: per-shard DISTINCT counts are not mergeable — the scan
    // must refuse, and Spark computes the distinct itself
    val df = spark.read.format(fmt)
      .option("url", url).option("table", "readings")
      .option("partitionColumn", "id").option("numPartitions", "4").load()
    assert(df.agg(count_distinct(col("device"))).head().getLong(0) == 3L)
    assert(!AdxLike.lastQuery.contains("DISTINCT"), AdxLike.lastQuery)
  }

  test("avg over a sharded source still yields exact results") {
    seed()
    val df = spark.read.format(fmt)
      .option("url", url).option("table", "readings")
      .option("partitionColumn", "id").option("numPartitions", "4").load()
    // avg is not a mergeable partial — either Spark decomposes it into
    // pushable sum+count or keeps it Spark-side; both must be exact
    val r = df.groupBy(col("device")).agg(avg("id").as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(r == Map("dev0" -> 16.5, "dev1" -> 14.5, "dev2" -> 15.5), r.toString)
  }

  test("limit pushes as FETCH FIRST; sharded limit is per-shard partial") {
    seed()
    assert(table.limit(5).collect().length == 5)
    assert(AdxLike.lastQuery.contains("FETCH FIRST 5 ROWS ONLY"), AdxLike.lastQuery)
    // composes with a pushed filter
    val q = table.filter(col("id") <= 10L).limit(3)
    assert(q.collect().length == 3)
    assert(AdxLike.lastQuery.contains("\"ID\" <= 10") &&
      AdxLike.lastQuery.contains("FETCH FIRST 3 ROWS ONLY"), AdxLike.lastQuery)
    // sharded: each shard ships at most n rows, Spark takes the final n
    val df = spark.read.format(fmt)
      .option("url", url).option("table", "readings")
      .option("partitionColumn", "id").option("numPartitions", "4").load()
    assert(df.limit(7).collect().length == 7)
    assert(AdxLike.lastQuery.contains("FETCH FIRST 7 ROWS ONLY"), AdxLike.lastQuery)
  }

  test("top-N pushes as ORDER BY ... FETCH FIRST and matches the un-pushed plan") {
    seed()
    val q = table.orderBy(col("temp").desc).limit(4).select("id", "temp")
    val got = q.collect().map(r => (r.getLong(0), r.getDouble(1)))
    // the ORDER BY ... FETCH FIRST text reached the remote
    assert(AdxLike.lastQuery.contains("ORDER BY \"TEMP\" DESC NULLS LAST") &&
      AdxLike.lastQuery.contains("FETCH FIRST 4 ROWS ONLY"), AdxLike.lastQuery)
    // and the plan advertises it
    assert(q.queryExecution.executedPlan.toString.contains("PushedTopN"),
      q.queryExecution.executedPlan.toString)
    // results equal the un-pushed computation (plain JDBC scan, sorted Spark-side)
    val want = Jdbc.read(spark, url, "readings", Map.empty)
      .select(col("ID").as("id"), col("TEMP").as("temp"))
      .orderBy(col("temp").desc).limit(4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == want.toSeq)
    // a STRING sort must stay Spark-side: remote collation is a config
    // fact that may disagree with Spark's binary order
    val qs = table.orderBy(col("device").desc, col("id")).limit(3)
    val gs = qs.collect().map(_.getLong(0))
    assert(!AdxLike.lastQuery.contains("ORDER BY"), AdxLike.lastQuery)
    assert(gs.toSeq == Seq(2L, 5L, 8L)) // dev2 rows, smallest ids — Spark sorted
    // sharded top-N: per-shard ORDER BY + FETCH partials, Spark merges
    val df = spark.read.format(fmt)
      .option("url", url).option("table", "readings")
      .option("partitionColumn", "id").option("numPartitions", "4").load()
    val g2 = df.orderBy(col("id").desc).limit(5).collect().map(_.getLong(0))
    assert(g2.toSeq == Seq(30L, 29L, 28L, 27L, 26L))
    assert(AdxLike.lastQuery.contains("ORDER BY \"ID\" DESC NULLS LAST") &&
      AdxLike.lastQuery.contains("FETCH FIRST 5 ROWS ONLY"), AdxLike.lastQuery)
  }

  test("offset pushes as OFFSET ... ROWS and matches the un-pushed plan") {
    seed()
    def unpushed = Jdbc.read(spark, url, "readings", Map.empty)
      .select(col("ID").as("id")).orderBy(col("id"))
    // offset(m).limit(n): Spark pushes limit = window END (m+n), offset = START
    val q1 = table.orderBy(col("id")).offset(3).limit(4).select("id")
    val g1 = q1.collect().map(_.getLong(0))
    assert(AdxLike.lastQuery.contains("OFFSET 3 ROWS FETCH FIRST 4 ROWS ONLY"), AdxLike.lastQuery)
    assert(q1.queryExecution.executedPlan.toString.contains("PushedOffset"),
      q1.queryExecution.executedPlan.toString)
    assert(g1.toSeq == unpushed.offset(3).limit(4).collect().map(_.getLong(0)).toSeq)
    // limit(n).offset(m): pushed limit stays the window END (n), same remote form
    val q2 = table.orderBy(col("id")).limit(10).offset(4).select("id")
    val g2 = q2.collect().map(_.getLong(0))
    assert(AdxLike.lastQuery.contains("OFFSET 4 ROWS FETCH FIRST 6 ROWS ONLY"), AdxLike.lastQuery)
    assert(g2.toSeq == unpushed.limit(10).offset(4).collect().map(_.getLong(0)).toSeq)
    // bare offset, no limit: OFFSET alone, count is exact (order is not promised)
    val q3 = table.offset(25).select("id")
    val g3 = q3.collect().map(_.getLong(0))
    assert(AdxLike.lastQuery.contains("OFFSET 25 ROWS"), AdxLike.lastQuery)
    assert(!AdxLike.lastQuery.contains("FETCH"), AdxLike.lastQuery)
    assert(g3.length == 5 && g3.forall(i => i >= 1 && i <= 30))
    // sharded reads never push OFFSET (no partial form) but stay correct
    val df = spark.read.format(fmt)
      .option("url", url).option("table", "readings")
      .option("partitionColumn", "id").option("numPartitions", "4").load()
    val g4 = df.orderBy(col("id")).offset(3).limit(4).collect().map(_.getLong(0))
    assert(!AdxLike.lastQuery.contains("OFFSET"), AdxLike.lastQuery)
    assert(g4.toSeq == Seq(4L, 5L, 6L, 7L))
  }

  test("runtime filtering: DPP join keys reach the remote query as IN") {
    seed()
    import spark.implicits._
    // RDD-backed dim: a local Seq would constant-fold into the
    // LocalRelation and DPP would see no selective Filter node
    val dim = spark.sparkContext.parallelize(Seq(
      (1L, "gold"), (2L, "basic"), (17L, "gold"), (40L, "gold"))).toDF("ref_id", "tier")
    val fact = table
    val joined = fact.join(dim.filter(col("tier") === "gold"),
      fact("id") === dim("ref_id")).select("id", "device")
    // Both join sides report default (huge) stats here, so the DPP
    // benefit estimate can never pass and reuseBroadcastOnly would
    // degrade the pruning subquery to `true` — force the benefit path
    // the way a real deployment with a big remote scan hits it
    // naturally (pruning-side size >> dim overhead).
    val dppConfs = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10000.0")
    dppConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    val got =
      try joined.collect().map(_.getLong(0)).sorted
      finally dppConfs.foreach { case (k, _) => spark.conf.unset(k) }
    assert(got.toSeq == Seq(1L, 17L)) // 40 has no fact row
    // the surviving join keys were compiled into the remote WHERE
    val sent = AdxLike.lastQuery
    assert(sent.contains("\"ID\" IN ("), sent)
    assert(sent.contains("1") && sent.contains("17") && sent.contains("40"), sent)
    // and the plan carries the runtime filter on the scan
    assert(joined.queryExecution.executedPlan.toString.contains("RuntimeFilters"),
      joined.queryExecution.executedPlan.toString)
  }

  test("join pushdown: two scans of the same remote become one remote query") {
    seed()
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE refs") catch { case _: SQLException => () }
      // NOT NULL on purpose: the null-extended side of a pushed outer
      // join must still read back as NULLABLE (a non-nullable
      // readSchema would make codegen skip the null check and read
      // unmatched rows' NULL score as 0.0)
      st.execute("CREATE TABLE refs (rid BIGINT NOT NULL, device VARCHAR(16) NOT NULL, score DOUBLE NOT NULL)")
      Seq((2, "x2", 0.5), (4, "x4", 1.5), (17, "x17", 2.5), (40, "x40", 9.9))
        .foreach { case (r, d, s) => st.execute(s"INSERT INTO refs VALUES ($r, '$d', $s)") }
      st.close()
    } finally conn.close()
    def refs = spark.read.format(fmt)
      .option("url", url).option("table", "refs").load()
    spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
    try {
      // inner join on a numeric key, one side filtered: ONE remote
      // query, sides' WHEREs inside their derived tables
      val a = table; val b = refs
      val j = a.filter(col("temp") > 1.0)
        .join(b, a("id") === b("rid"))
        .select(a("id"), a("device"), b("device").as("rdevice"), b("score"))
      val got = j.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
      assert(got.toSet == Set((4L, "dev1", "x4", 1.5), (17L, "dev2", "x17", 2.5)))
      val sent = AdxLike.lastQuery
      assert(sent.contains(" JOIN ") && sent.contains(" ON "), sent)
      assert(sent.contains("\"TEMP\" > 1.0"), sent) // side filter inside the join
      val plan = j.queryExecution.executedPlan.toString
      assert("BatchScan".r.findAllIn(plan).size == 1, plan) // one scan, no Spark join
      assert(!plan.contains("HashJoin") && !plan.contains("SortMergeJoin"), plan)
      // same results as the un-pushed plan
      spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "false")
      val a2 = table; val b2 = refs
      val want = a2.filter(col("temp") > 1.0)
        .join(b2, a2("id") === b2("rid"))
        .select(a2("id"), a2("device"), b2("device").as("rdevice"), b2("score"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
      assert(got.toSet == want.toSet)
      spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")

      // aggregate over the pushed join: remote GROUP BY over the joined FROM
      val g = a.join(b, a("id") === b("rid")).groupBy(a("device"))
        .agg(count(lit(1)).as("n"), sum(b("score")).as("s"))
      val gotG = g.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(gotG == Set(("dev2", 2L, 3.0), ("dev1", 1L, 1.5)), gotG.toString)
      assert(AdxLike.lastQuery.contains(" JOIN ") &&
        AdxLike.lastQuery.contains("GROUP BY"), AdxLike.lastQuery)

      // left outer join pushes too, null-extending the right side —
      // whose remote NOT NULL columns must flip to nullable in the
      // pushed readSchema, or unmatched rows' NULLs silently read 0.0
      val lj = a.join(b, a("id") === b("rid"), "left")
        .select(a("id"), b("score")).orderBy(a("id"))
      assert(lj.schema("score").nullable,
        "null-extended side must be nullable in the pushed join schema")
      val gotL = lj.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      assert(gotL.length == 30 && gotL.count(_._2.isDefined) == 3)
      assert(gotL.count(_._2.contains(0.0)) == 0, "an unmatched row's NULL must never read as 0.0")
      assert(AdxLike.lastQuery.contains("LEFT JOIN"), AdxLike.lastQuery)

      // a STRING join key never pushes: remote equality is a
      // collation/padding fact, and a pushed join replaces the join
      val sj = a.join(b, a("device") === b("device")).select(a("id"))
      sj.collect()
      assert(!AdxLike.lastQuery.contains(" JOIN "), AdxLike.lastQuery)
      assert(sj.queryExecution.executedPlan.toString.contains("Join"),
        sj.queryExecution.executedPlan.toString)
    } finally spark.conf.unset("spark.sql.optimizer.datasourceV2JoinPushdown")
  }

  test("remote statistics: opt-in COUNT sizes the scan post-pushdown") {
    seed()
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val t = spark.read.format(fmt)
      .option("url", url).option("table", "readings")
      .option("statistics", "remote").load()
    def scanStats(q: org.apache.spark.sql.DataFrame) =
      q.queryExecution.optimizedPlan
        .collectFirst { case r: DataSourceV2ScanRelation => r }.get.stats
    // the count runs under the pushed WHERE: temp > 10 keeps ids 21..30
    val filtered = scanStats(t.filter(col("temp") > 10.0).select("id"))
    assert(filtered.rowCount.contains(BigInt(10)), filtered.toString)
    assert(filtered.sizeInBytes < 1000L, filtered.toString) // not the huge default
    // a pushed window bounds the estimate: skip 25 of 30 rows, ask for
    // 10 more — only 5 exist, and the estimate knows it
    val windowed = scanStats(t.orderBy(col("id")).offset(25).limit(10).select("id"))
    assert(windowed.rowCount.contains(BigInt(5)), windowed.toString)
    // without the option the scan reports nothing and Spark keeps its default
    val plain = scanStats(table.filter(col("temp") > 10.0).select("id"))
    assert(plain.rowCount.isEmpty && plain.sizeInBytes > 1000000L, plain.toString)
  }

  test("runtime filtering never combines with a pushed row window") {
    seed()
    import spark.implicits._
    val dim = spark.sparkContext.parallelize(Seq(
      (1L, "gold"), (29L, "gold"), (30L, "basic"))).toDF("ref_id", "tier")
    // top-3 by id desc = {30,29,28}, THEN join — if the runtime IN
    // reached the remote before FETCH, 1 would wrongly fill the window
    val top = table.orderBy(col("id").desc).limit(3)
    val joined = top.join(dim.filter(col("tier") === "gold"),
      top("id") === dim("ref_id")).select("id")
    val got = joined.collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(29L))
    assert(!AdxLike.lastQuery.contains("IN ("), AdxLike.lastQuery)
  }

  test("normalize=kusto floors timestamps and coerces string reals like the parquet path") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE kusto_rows") catch { case _: SQLException => () }
      st.execute("CREATE TABLE kusto_rows (id INT, val VARCHAR(16), ts TIMESTAMP)")
      st.execute("INSERT INTO kusto_rows VALUES (1, 'NaN', TIMESTAMP('2026-01-01 10:00:00.75'))")
      st.execute("INSERT INTO kusto_rows VALUES (2, 'Infinity', TIMESTAMP('2026-01-01 10:00:01.25'))")
      st.execute("INSERT INTO kusto_rows VALUES (3, '-Infinity', TIMESTAMP('2026-01-01 10:00:02'))")
      st.execute("INSERT INTO kusto_rows VALUES (4, '12.5', NULL)")
      st.execute("INSERT INTO kusto_rows VALUES (5, 'oops', TIMESTAMP('2026-01-01 10:00:03.999'))")
      st.execute("INSERT INTO kusto_rows VALUES (6, NULL, TIMESTAMP('2026-01-01 10:00:04.5'))")
      st.close()
    } finally conn.close()
    val df = spark.read.format("adxlike")
      .option("url", url).option("table", "kusto_rows")
      .option("normalize", "kusto").option("kustoRealColumns", "val")
      .load()
    assert(df.schema("val").dataType == org.apache.spark.sql.types.DoubleType)
    // oracle: the parquet path's normalization applied to the raw read
    val raw = spark.read.format("adxlike")
      .option("url", url).option("table", "kusto_rows").load()
    val expected = Sources.normalizeKustoLike(
      raw.withColumn("val", graft.ops.Scalars.coerceSpecialDouble(col("val"))))
    def key(r: org.apache.spark.sql.Row) =
      (r.getInt(0), Option(r.get(1)).map(_.toString), Option(r.get(2)).map(_.toString))
    assert(df.collect().map(key).toSet == expected.collect().map(key).toSet)
    // normalized columns never push — remote raw values differ from
    // what Spark filters see (coerced doubles, floored seconds)
    // Spark's double semantics apply to the COERCED values: NaN and
    // Infinity both sort above 10.0 (NaN greatest), so 1, 2, 4 pass
    val q = df.filter(col("val") > 10.0 && col("id") >= 1)
    assert(q.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 4))
    val sent = AdxLike.lastQuery
    assert(sent.contains("\"ID\" >= 1"), sent)
    // VAL may appear in the SELECT list (it is read) but never in WHERE
    assert(!sent.substring(sent.indexOf(" WHERE ")).contains("\"VAL\""), sent)
    // aggregates over normalized columns stay Spark-side too: the max
    // is the FLOORED second, which a remote MAX would get wrong
    val m = df.agg(max("ts")).head().getTimestamp(0)
    assert(m.toString == "2026-01-01 10:00:04.0", m.toString)
    assert(!AdxLike.lastQuery.contains("MAX"), AdxLike.lastQuery)
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

  test("DSv2 append writes rows back through the connector, quoted reserved columns included") {
    seed()
    import spark.implicits._
    val extra = Seq(
      (101L, "dev9", 99.5, new java.math.BigDecimal("7.25"),
        java.sql.Timestamp.valueOf("2026-02-01 12:00:00")),
      (102L, "dev9", 98.5, null.asInstanceOf[java.math.BigDecimal],
        null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "device", "temp", "amount", "at")
      .withColumn("amount", col("amount").cast("decimal(10,2)"))
    extra.repartition(2).write.format("adxlike")
      .option("url", url).option("table", "readings").mode("append").save()
    val back = table.filter(col("id") >= 101L).orderBy("id").collect()
    assert(back.length == 2)
    assert(back(0).getLong(0) == 101L && back(0).getString(1) == "dev9" &&
      back(0).getDouble(2) == 99.5 &&
      back(0).getDecimal(3) == new java.math.BigDecimal("7.25") &&
      back(0).getTimestamp(4) == java.sql.Timestamp.valueOf("2026-02-01 12:00:00"))
    assert(back(1).isNullAt(3) && back(1).isNullAt(4))
    assert(table.count() == 32)
  }

  test("DSv2 overwrite truncates remote-side first; append-only columns take remote defaults") {
    seed()
    import spark.implicits._
    // a PARTIAL column list: unwritten columns land NULL remote-side
    val fresh = Seq((201L, "devX"), (202L, "devY")).toDF("id", "device")
    fresh.write.format("adxlike")
      .option("url", url).option("table", "readings").mode("overwrite").save()
    val after = table.orderBy("id").collect()
    assert(after.map(_.getLong(0)).toSeq == Seq(201L, 202L))
    assert(after.forall(r => r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4)))
  }

  test("a write to a normalize=kusto table is rejected as read-only") {
    seed()
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((1, "1.5")).toDF("id", "val").write.format("adxlike")
        .option("url", url).option("table", "readings")
        .option("normalize", "kusto").option("kustoRealColumns", "temp")
        .mode("append").save()
    }
    assert(Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null).take(5)
      .exists(_.getMessage != null))
  }

  test("write task failure rolls back its transaction; retried rows are not duplicated") {
    seed()
    import spark.implicits._
    // a row violating the DOUBLE column's type discipline can't be
    // built here; instead force failure via a duplicate-key constraint
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE strict_rows") catch { case _: SQLException => () }
      st.execute("CREATE TABLE strict_rows (id BIGINT PRIMARY KEY, v VARCHAR(8))")
      st.execute("INSERT INTO strict_rows VALUES (2, 'seeded')")
      st.close()
    } finally conn.close()
    // id=2 collides with the seeded key -> the task's transaction
    // rolls back; id=1 rides in the SAME task transaction and must
    // NOT survive the failed write
    val e = intercept[Exception] {
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
        .write.format("adxlike")
        .option("url", url).option("table", "strict_rows").mode("append").save()
    }
    assert(e != null)
    val left = Jdbc.read(spark, url, "strict_rows").collect()
    assert(left.length == 1 && left.head.getString(1) == "seeded")
  }

  test("micro-batch streaming read: watermark-column increments arrive exactly once") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE stream_rows") catch { case _: SQLException => () }
      st.execute("CREATE TABLE stream_rows (id BIGINT, v VARCHAR(8))")
      (1 to 5).foreach(i => st.execute(s"INSERT INTO stream_rows VALUES ($i, 'a$i')"))
      st.close()
    } finally conn.close()
    def insert(ids: Range): Unit = {
      val c = DriverManager.getConnection(url)
      try {
        val st = c.createStatement()
        ids.foreach(i => st.execute(s"INSERT INTO stream_rows VALUES ($i, 'a$i')"))
        st.close()
      } finally c.close()
    }
    val q = spark.readStream.format(fmt)
      .option("url", url).option("table", "stream_rows")
      .option("streamOffsetColumn", "id").load()
      .writeStream.outputMode("append").format("memory").queryName("adxstream").start()
    try {
      q.processAllAvailable() // batch 0: full replay (earliest)
      assert(spark.table("adxstream").count() == 5)
      insert(6 to 9)
      q.processAllAvailable() // batch 1: only the increment
      insert(10 to 12)
      q.processAllAvailable() // batch 2
      val got = spark.table("adxstream").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == (1L to 12L), got.mkString(",")) // exactly once, no dupes
      // The last batch's remote query carried a half-open increment
      // range ending at 12. The default trigger polls concurrently
      // with the inserts above, so the 10..12 burst may land as one
      // micro-batch ("ID" > 9) or split ("ID" > 10/11) — any lower
      // bound in [9, 12) proves increment-only reads (no replay).
      val lastRange = """"ID" > (\d+)\) AND \("ID" <= 12""".r
      val lower = lastRange.findFirstMatchIn(AdxLike.lastQuery).map(_.group(1).toInt)
      assert(lower.exists(lo => lo >= 9 && lo < 12), AdxLike.lastQuery)
    } finally q.stop()
    // restart from a checkpoint (recoverable file sink): no replay,
    // only rows above the checkpointed watermark
    val ckpt = java.nio.file.Files.createTempDirectory("adxstream-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("adxstream-out").toString
    def startFileSink() = spark.readStream.format(fmt)
      .option("url", url).option("table", "stream_rows")
      .option("streamOffsetColumn", "id").load()
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").format("parquet").option("path", out).start()
    val q2 = startFileSink()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(out).count() == 12)
    insert(13 to 14)
    val q3 = startFileSink()
    try q3.processAllAvailable() finally q3.stop()
    val afterRestart = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
    assert(afterRestart.toSeq == (1L to 14L), afterRestart.mkString(","))
    // startFrom=latest skips history
    val q4 = spark.readStream.format(fmt)
      .option("url", url).option("table", "stream_rows")
      .option("streamOffsetColumn", "id").option("streamStartFrom", "latest").load()
      .writeStream.outputMode("append").format("memory").queryName("adxlatest").start()
    try {
      q4.processAllAvailable()
      assert(spark.table("adxlatest").count() == 0)
      insert(15 to 16)
      q4.processAllAvailable()
      assert(spark.table("adxlatest").collect().map(_.getLong(0)).sorted.toSeq == Seq(15L, 16L))
    } finally q4.stop()
    // a missing/non-integral offset column fails fast with a clear message
    val e = intercept[Exception] {
      spark.readStream.format(fmt)
        .option("url", url).option("table", "stream_rows").load()
        .writeStream.format("memory").queryName("adxbad").start()
        .processAllAvailable()
    }
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(t.getMessage)
    assert(rootMsg(e).contains("streamOffsetColumn"), rootMsg(e))
  }

  test("streaming write: epoch-ledgered appends survive restart without duplicates") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      for (t <- Seq("stream_src", "stream_sink", "stream_sink_graft_epochs"))
        try st.execute(s"DROP TABLE $t") catch { case _: SQLException => () }
      st.execute("CREATE TABLE stream_src (id BIGINT, v VARCHAR(8))")
      st.execute("CREATE TABLE stream_sink (id BIGINT, v VARCHAR(8))")
      (1 to 4).foreach(i => st.execute(s"INSERT INTO stream_src VALUES ($i, 'a$i')"))
      st.close()
    } finally conn.close()
    def insert(ids: Range): Unit = {
      val c = DriverManager.getConnection(url)
      try {
        val st = c.createStatement()
        ids.foreach(i => st.execute(s"INSERT INTO stream_src VALUES ($i, 'a$i')"))
        st.close()
      } finally c.close()
    }
    def sinkIds: Seq[Long] = Jdbc.read(spark, url, "stream_sink")
      .collect().map(_.getLong(0)).sorted.toSeq
    // the connector end-to-end: adxlike stream read -> adxlike stream write
    val ckpt = java.nio.file.Files.createTempDirectory("adxsink-ckpt").toString
    def start() = spark.readStream.format(fmt)
      .option("url", url).option("table", "stream_src")
      .option("streamOffsetColumn", "id").load()
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").format(fmt)
      .option("url", url).option("table", "stream_sink").start()
    val q = start()
    try {
      q.processAllAvailable()
      assert(sinkIds == (1L to 4L))
      insert(5 to 7)
      q.processAllAvailable()
      assert(sinkIds == (1L to 7L))
    } finally q.stop()
    // restart: nothing replays, only new source rows land
    insert(8 to 9)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(sinkIds == (1L to 9L), sinkIds.mkString(","))
    } finally q2.stop()
    // the ledger recorded every committed epoch, and a replayed epoch
    // is dropped whole: simulate the replay the checkpoint protects
    // against by writing through a factory for an epoch already in
    // the ledger
    val ledger = Jdbc.read(spark, url, "stream_sink_graft_epochs").collect()
    val epochs = ledger.map(_.getAs[Long]("EPOCH_ID")).sorted
    val qids = ledger.map(_.getAs[String]("QUERY_ID")).distinct
    assert(epochs.nonEmpty, "ledger should hold committed epochs")
    assert(qids.length == 1, s"one query wrote: $qids") // restart keeps the stable query id
    val qidLit = s"'${qids.head}'"
    def factory(qLit: String) = new AdxLikeStreamingWriterFactory(
      url, "INSERT INTO stream_sink (\"ID\", \"V\") VALUES (?, ?)",
      Jdbc.read(spark, url, "stream_sink").schema, 3, "stream_sink_graft_epochs", qLit)
    val replayed = factory(qidLit).createWriter(0, 0L, epochs.last)
    assert(replayed.isInstanceOf[AdxLikeNoopWriter]) // whole epoch dropped
    val fresh = factory(qidLit).createWriter(0, 0L, epochs.max + 1000L)
    assert(!fresh.isInstanceOf[AdxLikeNoopWriter]); fresh.close()
    // a DIFFERENT query's epoch ids restart at 0 — they must never
    // match this query's committed epochs, or the new query's first
    // micro-batches would be silently dropped whole (the ledger key
    // is (query_id, epoch_id), not epoch_id alone)
    val otherQuery = factory("'another-query-uuid'").createWriter(0, 0L, epochs.head)
    assert(!otherQuery.isInstanceOf[AdxLikeNoopWriter],
      "a fresh query's epoch must not be swallowed by an old query's ledger rows")
    otherQuery.close()
  }

  test("multi-partition write: committed tasks persist, the failed task leaves no rows") {
    import spark.implicits._
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE strict_rows2") catch { case _: SQLException => () }
      st.execute("CREATE TABLE strict_rows2 (id BIGINT PRIMARY KEY, v VARCHAR(8))")
      st.execute("INSERT INTO strict_rows2 VALUES (2, 'seeded')")
      st.close()
    } finally conn.close()
    // TWO write tasks: partition 0 is clean; partition 1 holds the
    // key collision (id=2) plus an innocent same-task row (id=3). The
    // failing partition's rows are slowed so the clean task has
    // certainly COMMITTED its transaction before the other aborts the
    // job — the documented per-task exactly-once contract: job abort
    // cannot un-commit a committed task, and the failed task's whole
    // transaction (including id=3) rolls back. The partitions come
    // from parallelize(_, 2) — a union of local Seq frames would be
    // collapsed into ONE LocalRelation (one task) by the optimizer,
    // which would test nothing.
    val slow = udf((s: String) => { if (s == "boom") Thread.sleep(1500); s })
    val rows = spark.sparkContext
      .parallelize(Seq((10L, "a"), (11L, "b"), (2L, "boom"), (3L, "c")), 2)
      .toDF("id", "v")
    assert(rows.rdd.getNumPartitions == 2)
    val e = intercept[Exception] {
      rows.withColumn("v", slow(col("v")))
        .write.format("adxlike")
        .option("url", url).option("table", "strict_rows2").mode("append").save()
    }
    assert(e != null)
    val left = Jdbc.read(spark, url, "strict_rows2").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(left == Map(2L -> "seeded", 10L -> "a", 11L -> "b"), left.toString)
  }

  test("null-safe equality compiles NULL-PROOF: NOT(a <=> b) keeps one-side-NULL pairs on the remote") {
    // Spark's a <=> b is two-valued (never SQL NULL); the compiled
    // remote form must be too, or NOT(...) silently drops row pairs
    // whose ON evaluates to NULL — and a pushed join REPLACES the
    // Spark join, so the loss is invisible (review r19: the old
    // expansion `a = b OR (a IS NULL AND b IS NULL)` was NULL when
    // exactly one side was NULL).
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.{Not, Predicate}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("x", LongType), StructField("y", LongType)))
    val nse = new Predicate("<=>",
      Array[org.apache.spark.sql.connector.expressions.Expression](
        Expressions.column("x"), Expressions.column("y")))
    def keptOnDerby(cond: String): Set[(Option[Long], Option[Long])] = {
      val conn = DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        val rs = st.executeQuery(
          "SELECT x, y FROM (VALUES (1, 1), (1, CAST(NULL AS BIGINT)), " +
            "(CAST(NULL AS BIGINT), 1), (CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))) " +
            s"AS t(x, y) WHERE $cond")
        val out = scala.collection.mutable.Set.empty[(Option[Long], Option[Long])]
        while (rs.next()) {
          val a = rs.getLong(1); val an = rs.wasNull()
          val b = rs.getLong(2); val bn = rs.wasNull()
          out += ((if (an) None else Some(a), if (bn) None else Some(b)))
        }
        rs.close(); st.close(); out.toSet
      } finally conn.close()
    }
    val eq = AdxLike.compileJoinCondition(nse, schema).get
    assert(keptOnDerby(eq) ==
      Set((Some(1L), Some(1L)), (None, None)), eq)
    val ne = AdxLike.compileJoinCondition(new Not(nse), schema).get
    // the exact pairs the old expansion dropped (NOT NULL -> NULL)
    assert(keptOnDerby(ne) ==
      Set((Some(1L), None), (None, Some(1L))), ne)
  }

  test("Short/Byte columns write and read through the connector (validation and data path agree)") {
    // supportsExternalMetadata and the stream-offset whitelist both
    // admit Short/Byte, so the row codec must carry them too —
    // accepting at planning and throwing per-row in bind()/decode()
    // surfaced as executor task crashes (review r19)
    import sqlImplicits._
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE smallints") catch { case _: SQLException => () }
      st.execute("CREATE TABLE smallints (id BIGINT, s SMALLINT, b SMALLINT)")
      st.close()
    } finally conn.close()
    val rows = Seq((1L, 7.toShort, 3.toByte), (2L, Short.MinValue, Byte.MaxValue))
      .toDF("id", "s", "b")
    rows.write.format(fmt)
      .option("url", url).option("table", "smallints").mode("append").save()
    // read back under an explicit Short/Byte schema (the user-schema
    // path supportsExternalMetadata enables)
    val got = spark.read.format(fmt)
      .schema("id LONG, s SHORT, b BYTE")
      .option("url", url).option("table", "smallints").load()
      .collect().map(r => (r.getLong(0), r.getShort(1), r.getByte(2))).toSet
    assert(got == Set((1L, 7.toShort, 3.toByte), (2L, Short.MinValue, Byte.MaxValue)), got)
  }
}
