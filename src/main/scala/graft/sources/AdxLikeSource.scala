package graft.sources

import java.sql.{Connection, DriverManager, ResultSet, ResultSetMetaData, Types}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** ADX-shaped DataSourceV2 connector (S1's architectural seam): the
  * reference's primary ingress is a managed-connection query client —
  * connect once, compile the query server-side, execute with a
  * bounded retry loop (reference: src/plugins/adx_plugin.py:112-165,
  * base.py:51-58). This provider re-expresses that lifecycle on
  * Spark's `TableProvider` API against any JDBC URL (tests use
  * in-JVM Derby — zero network), so the structural pieces are real
  * even though no Kusto cluster is reachable from this environment:
  *
  *   - schema resolution opens a managed connection under the
  *     connector retry policy ([[Jdbc.withRetries]] over
  *     [[Jdbc.classify]] — transient SQLStates retry, auth/syntax
  *     fail fast), mirroring `connect()`;
  *   - filter pushdown COMPILES predicates into the remote query
  *     text (`execute_query(query)` in the reference takes a full
  *     KQL string — here the dialect is SQL), and pushed filters are
  *     visible in `.explain` via the scan description;
  *   - column pruning lands in the remote SELECT list, so the
  *     "cluster" never ships unused columns;
  *   - each partition reader re-opens a connection with the SAME
  *     retry policy, mirroring the reference's reconnect-on-failure
  *     inside `execute_query`.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.AdxLikeTableProvider")
  *   .option("url", "jdbc:derby:memory:db").option("table", "t").load()
  * }}}
  */
class AdxLikeTableProvider extends TableProvider with DataSourceRegister {

  /** `spark.read.format("adxlike")` — registered via the standard
    * META-INF/services DataSourceRegister SPI.
    */
  override def shortName(): String = "adxlike"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val resolved = AdxLike.resolveSchema(
      options.get("url"),
      options.get("table"),
      Option(options.get("maxRetries")).map(_.toInt).getOrElse(3))
    // Kusto-normalized ingest declares the listed string-typed reals
    // as DOUBLE up front — the reader coerces them (see AdxLikeReader)
    val reals = AdxLike.realColumnsOf(
      Option(options.get("normalize")), Option(options.get("kustoRealColumns")))
    if (reals.isEmpty) resolved
    else StructType(resolved.map(f =>
      if (reals(f.name)) f.copy(dataType = DoubleType) else f))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    def opt(k: String): Option[String] =
      Option(properties.get(k)).orElse(Option(properties.get(k.toLowerCase)))
    new AdxLikeTable(
      opt("url").orNull,
      opt("table").orNull,
      schema,
      opt("maxRetries").map(_.toInt).getOrElse(3),
      opt("partitionColumn"),
      opt("numPartitions").map(_.toInt).getOrElse(1),
      AdxLike.normalizeKusto(opt("normalize")),
      AdxLike.realColumnsOf(opt("normalize"), opt("kustoRealColumns")),
      opt("statistics").contains("remote"))
  }

  override def supportsExternalMetadata(): Boolean = true
}

private class AdxLikeTable(
    url: String,
    tableName: String,
    tableSchema: StructType,
    maxRetries: Int,
    partitionColumn: Option[String],
    numPartitions: Int,
    normalize: Boolean,
    realCols: Set[String],
    remoteStats: Boolean = false)
  extends Table with SupportsRead with SupportsWrite {
  require(url != null, "option 'url' is required")
  require(tableName != null, "option 'table' is required")
  require(numPartitions >= 1, s"numPartitions=$numPartitions must be >= 1")

  override def name(): String = s"adxlike:$tableName"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AdxLikeScanBuilder(url, tableName, tableSchema, maxRetries, partitionColumn,
      numPartitions, normalize, realCols, remoteStats,
      Option(options.get("streamOffsetColumn")),
      Option(options.get("streamStartFrom")).getOrElse("earliest"))

  /** DSv2 write path — the connector's counterpart of the reference's
    * guarded DML write-back (mysql_plugin's DML branch; see
    * [[Sinks.writeJdbc]] for the policy rationale): `mode("append")`
    * appends, `mode("overwrite")` truncates first. Normalized reads
    * rewrite column VALUES (second-floor, text-real coercion), so a
    * normalize=kusto table is read-only — writing Spark's rewritten
    * values back would corrupt the remote raw data.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(!normalize,
      "adxlike write: option normalize=kusto is read-side only (normalized values " +
        "differ from the remote raw data); write to a non-normalized table instead")
    new AdxLikeWriteBuilder(url, tableName, tableSchema, info.schema(), maxRetries,
      info.queryId())
  }
}

private class AdxLikeWriteBuilder(
    url: String,
    table: String,
    full: StructType,
    writeSchema: StructType,
    maxRetries: Int,
    queryId: String)
  extends WriteBuilder with SupportsTruncate {

  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write =
    new AdxLikeWrite(url, table, full, writeSchema, maxRetries, truncateFirst, queryId)
}

/** Batch write: one transactional INSERT stream per partition task.
  * The truncate (overwrite mode) runs driver-side under the connector
  * retry policy BEFORE any task launches — `DELETE FROM` restarts from
  * a clean table, so retrying it is idempotent (the same
  * idempotency-aware split as [[Sinks.writeJdbc]]). Each task writes
  * inside ONE remote transaction committed at task commit: a failed
  * task rolls back and Spark's task retry re-runs it cleanly
  * (exactly-once per task). Job-level abort cannot un-commit tasks
  * that already committed — the same contract as Spark's built-in
  * JDBC writer, surfaced in the scaladoc instead of hidden.
  */
private class AdxLikeWrite(
    url: String,
    table: String,
    full: StructType,
    writeSchema: StructType,
    maxRetries: Int,
    truncate: Boolean,
    queryId: String)
  extends Write with BatchWrite
    with org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def toBatch: BatchWrite = this
  // BatchWrite and StreamingWrite both default this — disambiguate
  override def useCommitCoordinator(): Boolean = true
  override def description(): String =
    s"AdxLike write table=$table" + (if (truncate) " (truncate)" else "")

  /** The INSERT statement compiled against the REMOTE schema: for
    * writes Spark hands the provider the input dataframe's schema, not
    * the inferred one, so the remote-name metadata that drives
    * identifier quoting is absent — resolve the remote schema here
    * (driver-side, under the retry policy, same as the read path) and
    * map write columns to quoted remote identifiers case-insensitively.
    */
  private def insertSql(): String = {
    val remote = AdxLike.resolveSchema(url, table, maxRetries)
    def rid(name: String): String =
      remote.fields.find(_.name.equalsIgnoreCase(name))
        .map(f => AdxLike.remoteId(remote, f.name))
        .getOrElse(AdxLike.remoteId(full, name))
    val cols = writeSchema.fieldNames.map(rid)
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${Seq.fill(cols.length)("?").mkString(", ")})"
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    if (truncate) Jdbc.withRetries(maxRetries) {
      val conn = DriverManager.getConnection(url)
      try { conn.createStatement().executeUpdate(s"DELETE FROM $table"); () }
      finally conn.close()
    }
    new AdxLikeWriterFactory(url, insertSql(), writeSchema, maxRetries)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()

  // ------------------------------------------------- streaming sink

  /** Streaming append with an epoch ledger (`<table>_graft_epochs`):
    * every task writes its rows in one remote transaction (same
    * exactly-once-per-task contract as the batch path), and the
    * driver records each epoch in the ledger AFTER all its tasks
    * committed. A restarted query re-offers the last epoch; writers
    * see it in the ledger and drop it whole — so a FULLY committed
    * epoch is never appended twice. The ledger key is
    * (query_id, epoch_id), NOT epoch_id alone: a NEW query (or a
    * fresh checkpoint) restarts its epoch ids at 0, and an
    * epoch-only key would match the OLD query's committed epochs and
    * silently DROP the new query's first micro-batches whole. The honest boundary, stated
    * rather than hidden: a crash MID-epoch (some tasks committed,
    * epoch not yet in the ledger) duplicates those tasks' rows on
    * replay — per-epoch atomicity across independent remote
    * transactions is not expressible without a staging area, which is
    * the same boundary Spark's own JDBC usage via foreachBatch has.
    */
  override def toStreaming:
      org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    require(!truncate, "adxlike streaming write supports append mode only")
    this
  }

  private def ledgerTable: String = s"${table}_graft_epochs"

  // Memoized per query, NOT per epoch: the factory is re-created every
  // micro-batch, but neither the remote schema behind insertSql (a
  // remote metadata roundtrip) nor the ledger's existence (a DDL
  // roundtrip) can change across epochs of one query — re-running both
  // per epoch charged two driver-side remote calls per trigger forever.
  private lazy val streamInsertSql: String = insertSql()
  private lazy val ledgerReady: Unit = Jdbc.withRetries(maxRetries) {
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().execute(
        s"CREATE TABLE $ledgerTable (query_id VARCHAR(128) NOT NULL, " +
          "epoch_id BIGINT NOT NULL, PRIMARY KEY (query_id, epoch_id))")
      catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () } // exists
    } finally conn.close()
  }

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo):
      org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    ledgerReady
    new AdxLikeStreamingWriterFactory(
      url, streamInsertSql, writeSchema, maxRetries, ledgerTable, queryIdLit)
  }

  // queryId is Spark's UUID string; escape defensively anyway
  private def queryIdLit: String = "'" + queryId.replace("'", "''") + "'" 

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    Jdbc.withRetries(maxRetries) {
      val conn = DriverManager.getConnection(url)
      try {
        try conn.createStatement().executeUpdate(
          s"INSERT INTO $ledgerTable VALUES ($queryIdLit, $epochId)")
        catch { case e: java.sql.SQLException if e.getSQLState == "23505" => () } // already recorded
      } finally conn.close()
    }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private class AdxLikeStreamingWriterFactory(
    url: String,
    sql: String,
    schema: StructType,
    maxRetries: Int,
    ledgerTable: String,
    queryIdLit: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  /** A replayed epoch (already in the ledger) is dropped WHOLE by
    * every task — the cheap per-task ledger probe is what makes a
    * restart idempotent for fully-committed epochs.
    */
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] = {
    val committed = Jdbc.withRetries(maxRetries) {
      val conn = DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery(
          s"SELECT 1 FROM $ledgerTable WHERE query_id = $queryIdLit AND epoch_id = $epochId")
        try rs.next() finally rs.close()
      } finally conn.close()
    }
    if (committed) new AdxLikeNoopWriter else new AdxLikeDataWriter(url, sql, schema, maxRetries)
  }
}

private class AdxLikeNoopWriter extends DataWriter[InternalRow] {
  override def write(row: InternalRow): Unit = ()
  override def commit(): WriterCommitMessage = AdxLikeCommitMessage(0L)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

private class AdxLikeWriterFactory(
    url: String,
    sql: String,
    schema: StructType,
    maxRetries: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AdxLikeDataWriter(url, sql, schema, maxRetries)
}

private case class AdxLikeCommitMessage(rows: Long) extends WriterCommitMessage

/** One partition's writer: managed connection under the shared retry
  * policy (connect is the retryable step; the statement stream is not
  * blind-retried — Spark task retry re-runs the whole rolled-back
  * task instead), JDBC batch inserts of [[AdxLikeDataWriter.BatchRows]]
  * rows, single transaction per task.
  */
private class AdxLikeDataWriter(
    url: String,
    sql: String,
    schema: StructType,
    maxRetries: Int) extends DataWriter[InternalRow] {

  private val conn: Connection = Jdbc.withRetries(maxRetries) {
    val c = DriverManager.getConnection(url)
    try { c.setAutoCommit(false); c }
    catch { case e: Throwable => c.close(); throw e }
  }
  // guard like the reader's constructor: a throw here happens before
  // Spark holds the DataWriter, so close() would never run and the
  // open connection would leak once per task attempt
  private val stmt =
    try conn.prepareStatement(sql)
    catch { case e: Throwable => conn.close(); throw e }
  private var pending = 0
  private var total = 0L

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < schema.length) {
      bind(row, i)
      i += 1
    }
    stmt.addBatch()
    pending += 1
    total += 1
    if (pending >= AdxLikeDataWriter.BatchRows) { stmt.executeBatch(); pending = 0 }
  }

  private def bind(row: InternalRow, i: Int): Unit = {
    val j = i + 1
    val dt = schema.fields(i).dataType
    if (row.isNullAt(i)) { stmt.setNull(j, AdxLikeDataWriter.sqlType(dt)); return }
    dt match {
      case IntegerType => stmt.setInt(j, row.getInt(i))
      case LongType => stmt.setLong(j, row.getLong(i))
      // Short/Byte: admitted by supportsExternalMetadata and the
      // stream-offset whitelist, so the data path must carry them
      // too — validation accepting what bind() threw on surfaced as
      // per-row executor crashes (review r19)
      case ShortType => stmt.setShort(j, row.getShort(i))
      case ByteType => stmt.setByte(j, row.getByte(i))
      case DoubleType => stmt.setDouble(j, row.getDouble(i))
      case FloatType => stmt.setFloat(j, row.getFloat(i))
      case BooleanType => stmt.setBoolean(j, row.getBoolean(i))
      case StringType => stmt.setString(j, row.getUTF8String(i).toString)
      case d: DecimalType =>
        stmt.setBigDecimal(j, row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal)
      case TimestampType =>
        val micros = row.getLong(i)
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        stmt.setTimestamp(j, ts)
      case DateType =>
        stmt.setDate(j, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(row.getInt(i).toLong)))
      case other => throw new IllegalArgumentException(s"unsupported write type $other")
    }
  }

  override def commit(): WriterCommitMessage = {
    if (pending > 0) { stmt.executeBatch(); pending = 0 }
    conn.commit()
    AdxLikeCommitMessage(total)
  }

  override def abort(): Unit = {
    try conn.rollback()
    catch { case _: java.sql.SQLException => () }
  }

  override def close(): Unit = {
    try stmt.close() finally conn.close()
  }
}

private object AdxLikeDataWriter {
  val BatchRows = 500

  def sqlType(dt: DataType): Int = dt match {
    case IntegerType => Types.INTEGER
    case LongType => Types.BIGINT
    case ShortType => Types.SMALLINT
    // SMALLINT, not TINYINT: Derby (the tested remote) has no
    // TINYINT, and this code only feeds setNull — a byte writes
    // into a SMALLINT column losslessly
    case ByteType => Types.SMALLINT
    case DoubleType => Types.DOUBLE
    case FloatType => Types.REAL
    case BooleanType => Types.BOOLEAN
    case StringType => Types.VARCHAR
    case _: DecimalType => Types.DECIMAL
    case TimestampType => Types.TIMESTAMP
    case DateType => Types.DATE
    case other => throw new IllegalArgumentException(s"unsupported write type $other")
  }
}

private class AdxLikeScanBuilder(
    private val url: String,
    table: String,
    full: StructType,
    maxRetries: Int,
    partitionColumn: Option[String],
    numPartitions: Int,
    private val normalize: Boolean,
    realCols: Set[String],
    remoteStats: Boolean = false,
    streamOffsetCol: Option[String] = None,
    streamStartFrom: String = "earliest")
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownOffset with SupportsPushDownJoin {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = full
  private var agg: Option[(AdxLike.CompiledAgg, StructType)] = None
  private var limit: Option[Int] = None
  private var orderBy: Seq[String] = Nil
  private var offset: Option[Int] = None
  // FROM clause (table name, or a derived join subquery once a join
  // is pushed) and the schema it exports (aliased after a join).
  private var from: String = table
  private var cur: StructType = full

  /** MOD-sharded reads return each shard's rows separately, so any
    * remote aggregate is only a PARTIAL (per-shard) result Spark must
    * merge; a single partition returns the final answer.
    */
  private def sharded: Boolean = partitionColumn.isDefined && numPartitions > 1

  /** Kusto normalization rewrites these columns' VALUES post-read
    * (timestamps floored to the second, string reals coerced), so the
    * remote's raw values disagree with what Spark filters/aggregates
    * see — predicates and aggregates touching them must stay
    * Spark-side.
    */
  private def normalized(name: String): Boolean =
    AdxLike.normalizedColumn(normalize, realCols, cur, name)

  /** Join pushdown (`spark.sql.optimizer.datasourceV2JoinPushdown`):
    * two scans of the same remote become ONE remote query — `FROM
    * (left side) JOIN (right side) ON cond` — so the join's work and
    * its output reduction happen where the data lives; the pushed
    * aggregate/top-N/limit paths then compose on top of the joined
    * FROM clause unchanged (a remote GROUP BY over a remote join).
    * Each side exports its columns under Spark's de-duplicating
    * aliases inside its own derived table, so the ON condition can
    * reference bare aliased names unambiguously. Compatibility is
    * strict: same url, neither side kusto-normalized (rewritten
    * values disagree with remote raw ones), sharded, or already
    * holding a pushed aggregate/window (Spark's rule order never
    * produces that state — the guard makes the invariant local). The
    * ON condition only compiles over columns whose remote comparison
    * provably equals Spark's (numeric/temporal/boolean — string
    * equality is a collation/padding fact of the remote, and unlike a
    * runtime filter a pushed join REPLACES the Spark join, so a
    * looser remote equality would return extra rows nothing
    * downstream removes).
    */
  override def isOtherSideCompatibleForJoin(other: SupportsPushDownJoin): Boolean =
    other match {
      case o: AdxLikeScanBuilder =>
        o.url == url && !normalize && !o.normalize &&
          !sharded && !o.sharded &&
          agg.isEmpty && o.agg.isEmpty && limit.isEmpty && o.limit.isEmpty &&
          offset.isEmpty && o.offset.isEmpty && orderBy.isEmpty && o.orderBy.isEmpty
      case _ => false
    }

  override def pushDownJoin(
      other: SupportsPushDownJoin,
      joinType: org.apache.spark.sql.connector.join.JoinType,
      leftCols: Array[SupportsPushDownJoin.ColumnWithAlias],
      rightCols: Array[SupportsPushDownJoin.ColumnWithAlias],
      cond: org.apache.spark.sql.connector.expressions.filter.Predicate): Boolean =
    other match {
      case o: AdxLikeScanBuilder =>
        import org.apache.spark.sql.connector.join.JoinType._
        // total match: the API contract on an unsupported type is
        // "return false, keep the join in Spark" — a MatchError here
        // would fail the whole query at planning when a Spark upgrade
        // adds e.g. FULL_OUTER_JOIN (review r19; the `out` match
        // below already had its defensive default)
        val kwOpt = joinType match {
          case INNER_JOIN => Some("JOIN")
          case LEFT_OUTER_JOIN => Some("LEFT JOIN")
          case RIGHT_OUTER_JOIN => Some("RIGHT JOIN")
          case _ => None
        }
        if (kwOpt.isEmpty) return false
        val kw = kwOpt.get
        // the null-extended side's columns MUST report nullable even
        // when the remote declares them NOT NULL: Spark rebuilds the
        // join output straight from this readSchema (no outer-join
        // nullability fix-up in V2ScanRelationPushDown), so a
        // non-nullable field would make codegen skip the null check on
        // unmatched rows — NULL silently reads as 0/false and
        // IsNull filters constant-fold away
        val leftFields = exportSchema(leftCols)
        val rightFields = o.exportSchema(rightCols)
        val out = joinType match {
          case LEFT_OUTER_JOIN =>
            StructType(leftFields ++ rightFields.map(_.copy(nullable = true)))
          case RIGHT_OUTER_JOIN =>
            StructType(leftFields.map(_.copy(nullable = true)) ++ rightFields)
          case _ => StructType(leftFields ++ rightFields)
        }
        AdxLike.compileJoinCondition(cond, out) match {
          case None => false
          case Some(c) =>
            from = s"(SELECT * FROM (${exportSql(leftCols)}) ${AdxLike.freshAlias()} " +
              s"$kw (${o.exportSql(rightCols)}) ${AdxLike.freshAlias()} ON $c) " +
              AdxLike.freshAlias()
            cur = out
            required = out
            pushed = Array.empty // both sides' filters are baked into `from`
            true
        }
      case _ => false
    }

  /** One side of a pushed join: its current FROM + pushed WHERE, with
    * every exported column renamed to Spark's collision-free alias —
    * the derived table's output names ARE the aliases.
    */
  private def exportSql(cols: Array[SupportsPushDownJoin.ColumnWithAlias]): String = {
    val select = cols.map { c =>
      val name = Option(c.alias).getOrElse(c.colName)
      s"${AdxLike.remoteId(cur, c.colName)} AS ${AdxLike.quoteRaw(name)}"
    }.mkString(", ")
    val where = pushed.flatMap(f => AdxLike.compileFilter(f, AdxLike.remoteId(cur, _))).toSeq
    s"SELECT $select FROM $from" +
      (if (where.isEmpty) ""
       else where.map(w => s"($w)").mkString(" WHERE ", " AND ", ""))
  }

  private def exportSchema(
      cols: Array[SupportsPushDownJoin.ColumnWithAlias]): Seq[StructField] =
    cols.toSeq.map { c =>
      val f = cur.fields.find(_.name == c.colName).getOrElse(
        throw new IllegalStateException(s"join pushdown: unknown column ${c.colName}"))
      val name = Option(c.alias).getOrElse(c.colName)
      // the exported remote identifier IS the alias from here on
      StructField(name, f.dataType, f.nullable,
        new MetadataBuilder().putString(AdxLike.RemoteNameKey, name).build())
    }

  /** A remote STRING comparison is a collation/padding fact of the
    * remote that Spark cannot assume matches its own binary
    * semantics (a case-insensitive collation equates 'abc'/'ABC'; a
    * locale collation can order 'B' ABOVE 'b', so a pushed range
    * predicate EXCLUDES rows Spark would keep — un-repairable by
    * re-filtering above the scan, because the rows never arrive).
    * String comparisons therefore stay Spark-side entirely — the
    * same reasoning as orderableRemotely's refusal of string sort
    * keys and comparableRemotely's of string join keys. Null checks
    * carry no comparison and remain pushable.
    */
  private def comparesStrings(f: Filter): Boolean = f match {
    case IsNull(_) | IsNotNull(_) => false
    case And(l, r) => comparesStrings(l) || comparesStrings(r)
    case Or(l, r) => comparesStrings(l) || comparesStrings(r)
    case Not(c) => comparesStrings(c)
    case other => other.references.exists(a =>
      full.fields.find(_.name.equalsIgnoreCase(a))
        .exists(_.dataType == org.apache.spark.sql.types.StringType))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rejected) = filters.partition(f =>
      AdxLike.compileFilter(f).isDefined && !f.references.exists(normalized) &&
        !comparesStrings(f))
    pushed = supported
    rejected // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** The reference's ingress pushes `summarize ... by bin(...)` into
    * the remote query (reference: src/plugins/README.md:33-38); this is
    * the SQL-dialect counterpart: GROUP BY + aggregate list compiled
    * into the query text. Complete pushdown (Spark trusts the remote
    * result as final) only without sharding.
    */
  override def supportCompletePushDown(a: Aggregation): Boolean =
    !sharded && AdxLike.compileAggregation(a, cur, allowDistinct = true, normalized).isDefined

  override def pushAggregation(a: Aggregation): Boolean = {
    // Per-shard partial aggregates are only mergeable for
    // min/max/count/sum; DISTINCT and AVG are not (Spark decomposes
    // avg into sum+count itself before attempting partial pushdown,
    // but guard here regardless).
    val complete = !sharded
    val unmergeable = a.aggregateExpressions.exists {
      case c: Count => c.isDistinct
      case s: Sum   => s.isDistinct
      case _: Avg   => true
      case _        => false
    }
    if (!complete && unmergeable) return false
    AdxLike.compileAggregation(a, cur, allowDistinct = complete, normalized).flatMap { c =>
      // Resolve the remote result types from the cluster itself (a
      // metadata-only probe), like schema resolution — Derby's
      // COUNT/SUM output types differ from Spark's and Spark casts
      // per the schema we declare here.
      try Some((c, AdxLike.resolveAggSchema(url, from, c, maxRetries)))
      catch {
        // a FATAL error (auth, missing table) will fail the scan too —
        // surface it at planning instead of masking it as an unpushed
        // aggregate; only exhausted transients degrade to the raw plan
        case e: Exception if Jdbc.classify(e) == Jdbc.Fatal => throw e
        case _: Exception => None
      }
    } match {
      case Some(resolved) => agg = Some(resolved); true
      case None => false
    }
  }

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  /** KQL `top n by col` — the dialect sibling of the pushed
    * `summarize` (reference: src/plugins/README.md:33-38) — compiled
    * as `ORDER BY ... FETCH FIRST n ROWS ONLY`. Sort terms must be
    * plain non-normalized columns with an exact remote collation
    * equivalent (numeric/temporal/boolean — string collation is a
    * remote config fact Spark cannot assume, so string sorts stay
    * Spark-side), and with an aggregate pushed only its GROUP BY
    * columns are orderable (a per-shard top-N over group-column order
    * is a valid partial: any globally-top group is in every shard's
    * top N wherever it appears at all). Single-partition reads are
    * exact — the reader streams the ResultSet in remote order, so
    * Spark can drop its own Sort; sharded reads are per-shard partials
    * merged by Spark's final top-N ([[isPartiallyPushed]]).
    */
  override def pushTopN(orders: Array[SortOrder], l: Int): Boolean = {
    val compiled = orders.toSeq.map(AdxLike.compileSortOrder(_, cur, normalized))
    val aggOrderable: String => Boolean =
      agg.fold((_: String) => true)(a => a._1.groupNames.contains(_))
    val orderable = orders.forall(_.expression() match {
      case nr: NamedReference if nr.fieldNames.length == 1 => aggOrderable(nr.fieldNames()(0))
      case _ => false
    })
    if (compiled.exists(_.isEmpty) || !orderable) false
    else {
      orderBy = compiled.flatten
      limit = Some(l)
      true
    }
  }

  /** A sharded read applies the limit / top-N per shard — Spark keeps
    * its own final one; single-partition FETCH FIRST is exact.
    */
  override def isPartiallyPushed(): Boolean = sharded

  /** OFFSET pushdown. Spark's contract (V2ScanRelationPushDown
    * `pushDownLimitAndOffset`): for BOTH `limit(n).offset(m)` and
    * `offset(m).limit(n)` plans it first pushes a LIMIT equal to the
    * absolute END of the row window, then — only if that limit was
    * fully pushed — the offset, which is the window's START. So the
    * remote form is `OFFSET m ROWS FETCH FIRST (limit - m) ROWS ONLY`
    * (see [[AdxLike.renderQuery]]). OFFSET has no per-shard partial
    * form (unlike limit/top-N, skipped prefixes cannot be merged), so
    * a sharded read never pushes it and Spark keeps its own Offset on
    * top of the per-shard limit partials.
    */
  override def pushOffset(o: Int): Boolean = {
    if (sharded || o < 0 || limit.exists(_ <= o)) false
    else { offset = Some(o); true }
  }

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // Spark hands back a subset of `full` in table-column order. With
    // an aggregate pushed, the scan's output IS the aggregate schema;
    // the post-agg "columns" Spark asks for are not table columns.
    if (agg.isEmpty) required = requiredSchema
  }

  override def build(): Scan = {
    val (schema, compiledAgg) = agg match {
      case Some((c, s)) => (s, Some(c))
      case None => (required, None)
    }
    new AdxLikeScan(url, from, schema, pushed, maxRetries, cur, partitionColumn,
      numPartitions, compiledAgg, limit, orderBy, offset, normalize, realCols, remoteStats,
      streamOffsetCol, streamStartFrom)
  }
}

private class AdxLikeScan(
    url: String,
    table: String,
    schema: StructType,
    pushed: Array[Filter],
    maxRetries: Int,
    fullSchema: StructType,
    partitionColumn: Option[String],
    numPartitions: Int,
    agg: Option[AdxLike.CompiledAgg],
    limit: Option[Int],
    orderBy: Seq[String],
    offset: Option[Int],
    normalize: Boolean,
    realCols: Set[String],
    remoteStats: Boolean = false,
    streamOffsetCol: Option[String] = None,
    streamStartFrom: String = "earliest")
  extends Scan with Batch with SupportsRuntimeFiltering with SupportsReportStatistics {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  /** Opt-in (`option("statistics","remote")`) planning-time stats: a
    * memoized remote `SELECT COUNT(*)` under the SAME pushed WHERE,
    * so Spark sizes THIS scan (post-pushdown), not the whole remote
    * table — that drives broadcast-side selection and the DPP benefit
    * estimate instead of the "infinitely large" default a statless
    * DSv2 source gets. Window-aware: a pushed limit/offset bounds the
    * count to `[offset, limit)`. Skipped when an aggregate is pushed
    * (the group count is a different number and not worth a second
    * remote aggregate). The memo is per-JVM and keyed by (url, count
    * query) — an estimate, deliberately never refreshed mid-session.
    */
  override def estimateStatistics(): Statistics = {
    val (rows, size) =
      if (!remoteStats || agg.isDefined)
        (java.util.OptionalLong.empty(), java.util.OptionalLong.empty())
      else {
        val where = pushed.flatMap(
          f => AdxLike.compileFilter(f, AdxLike.remoteId(fullSchema, _))).toSeq
        val base = AdxLike.cachedCount(
          url, AdxLike.renderQuery(table, "COUNT(*)", where, Nil, None), maxRetries)
        val n = math.max(0L,
          math.min(base, limit.fold(base)(_.toLong)) - offset.fold(0L)(_.toLong))
        (java.util.OptionalLong.of(n),
          java.util.OptionalLong.of(n * math.max(1L, schema.defaultSize.toLong)))
      }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = size
      override def numRows(): java.util.OptionalLong = rows
    }
  }

  @volatile private var runtime: Array[Filter] = Array.empty

  private def normalizedCol(name: String): Boolean =
    AdxLike.normalizedColumn(normalize, realCols, fullSchema, name)

  /** Runtime (DPP-style) filtering: at execution time Spark hands the
    * scan the join keys that survived the other side's selective
    * filter, and the scan compiles them into the remote WHERE — the
    * remote never materializes rows that cannot join. Restrictions,
    * each a correctness fact:
    *  - never with a pushed limit/top-N/offset: the logical Limit was
    *    REMOVED when fully pushed, so DPP can still target this scan,
    *    but a WHERE lands before FETCH and would change which rows
    *    fill the window;
    *  - with a pushed aggregate, only its GROUP BY columns (a WHERE
    *    on a group key before GROUP BY filters exactly those groups);
    *  - never on kusto-normalized columns (Spark's rewritten values
    *    disagree with the remote's raw ones).
    * Ignoring a runtime filter is always safe — unjoinable rows pass
    * through and the join itself discards them — so unsupported or
    * oversized filters are simply dropped.
    */
  override def filterAttributes(): Array[NamedReference] =
    if (limit.isDefined || offset.isDefined) Array.empty
    else {
      val eligible = agg.map(_.groupNames).getOrElse(schema.fieldNames.toSeq)
      eligible.filterNot(normalizedCol)
        .map(org.apache.spark.sql.connector.expressions.Expressions.column)
        .toArray
    }

  override def filter(filters: Array[Filter]): Unit =
    runtime = filters.filter { f =>
      AdxLike.compileFilter(f).isDefined &&
        !f.references.exists(normalizedCol) &&
        (f match {
          // a join side with more distinct keys than this belongs in
          // the join, not in a remote query's IN list
          case org.apache.spark.sql.sources.In(_, vs) => vs.length <= AdxLike.RuntimeInCap
          case _ => true
        })
    }
  override def description(): String =
    s"AdxLike table=$table PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadColumns: [${schema.fieldNames.mkString(", ")}]" +
      agg.map(c => s", PushedAggregates: [${c.selectList.drop(c.groupBy.length).mkString(", ")}]" +
        s", PushedGroupBy: [${c.groupBy.mkString(", ")}]").getOrElse("") +
      (if (orderBy.isEmpty) limit.map(n => s", PushedLimit: $n").getOrElse("")
       else s", PushedTopN: ORDER BY ${orderBy.mkString(", ")} LIMIT ${limit.getOrElse(-1)}") +
      offset.map(k => s", PushedOffset: $k").getOrElse("") +
      partitionColumn.map(c => s", Partitioned: MOD($c, $numPartitions)").getOrElse("") +
      (if (normalize) ", Normalize: kusto" else "")

  override def planInputPartitions(): Array[InputPartition] =
    AdxLike.compilePartitionQueries(
      table, schema, pushed ++ runtime, fullSchema, partitionColumn, numPartitions, agg, limit,
      orderBy, offset)
      .map(AdxLikePartition.apply)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new AdxLikeReaderFactory(url, schema, maxRetries, normalize,
      if (normalize) realCols else Set.empty)

  /** Incremental micro-batch reads over a monotonically increasing
    * integral column (`option("streamOffsetColumn", ...)`) — the
    * standard watermark-column ingest pattern for a remote store with
    * no changefeed. Each trigger reads `(lastOffset, remoteMax]`;
    * contract: rows only ever APPEND with increasing offset-column
    * values (a late insert below the watermark is never seen — same
    * caveat as any high-water-mark CDC). `streamStartFrom=latest`
    * skips history; the default `earliest` replays the full table
    * first. Pushed filters ride along in both the MAX probe and each
    * batch's range query.
    */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    val col = streamOffsetCol.getOrElse(throw new IllegalArgumentException(
      "adxlike streaming read requires option streamOffsetColumn: a monotonically " +
        "increasing integral column that orders row arrival"))
    val f = fullSchema.fields.find(_.name == col).getOrElse(
      throw new IllegalArgumentException(s"streamOffsetColumn '$col' not in ${
        fullSchema.fieldNames.mkString(", ")}"))
    f.dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"streamOffsetColumn '$col' must be integral (monotonic watermark); it is $other")
    }
    require(agg.isEmpty && limit.isEmpty && orderBy.isEmpty && offset.isEmpty,
      "adxlike streaming read: pushed aggregate/limit/top-N/offset are batch-only")
    require(!streamStartFrom.isEmpty &&
      (streamStartFrom == "earliest" || streamStartFrom == "latest"),
      s"streamStartFrom must be earliest|latest, got '$streamStartFrom'")
    new AdxLikeMicroBatchStream(url, table, schema, pushed, fullSchema, col,
      streamStartFrom, partitionColumn, numPartitions, maxRetries, normalize, realCols)
  }
}

/** One micro-batch source: offsets are values of the watermark column;
  * `latestOffset` probes the remote MAX under the connector retry
  * policy, and each batch compiles to the same sharded/partitioned
  * remote queries as a batch read plus the half-open range predicate.
  */
private class AdxLikeMicroBatchStream(
    url: String,
    table: String,
    schema: StructType,
    pushed: Array[Filter],
    full: StructType,
    offsetCol: String,
    startFrom: String,
    partitionColumn: Option[String],
    numPartitions: Int,
    maxRetries: Int,
    normalize: Boolean,
    realCols: Set[String])
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset}

  private def where: Seq[String] =
    pushed.flatMap(f => AdxLike.compileFilter(f, AdxLike.remoteId(full, _))).toSeq

  /** Empty table → Long.MinValue, the same floor as `earliest`. */
  private def remoteMax(): Long = Jdbc.withRetries(maxRetries) {
    val sql = AdxLike.renderQuery(
      table, s"MAX(${AdxLike.remoteId(full, offsetCol)})", where, Nil, None)
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      try {
        rs.next()
        val v = rs.getLong(1)
        if (rs.wasNull()) Long.MinValue else v
      } finally rs.close()
    } finally conn.close()
  }

  override def initialOffset(): SOffset =
    AdxLikeStreamOffset(if (startFrom == "latest") remoteMax() else Long.MinValue)

  override def latestOffset(): SOffset = AdxLikeStreamOffset(remoteMax())

  override def deserializeOffset(json: String): SOffset =
    AdxLikeStreamOffset(json.trim.toLong)

  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] = {
    val lo = start.asInstanceOf[AdxLikeStreamOffset].v
    val hi = end.asInstanceOf[AdxLikeStreamOffset].v
    // half-open (lo, hi]: lo = MinValue means "from the beginning"
    val range: Array[Filter] =
      (if (lo == Long.MinValue) Array.empty[Filter]
       else Array[Filter](GreaterThan(offsetCol, lo))) :+ LessThanOrEqual(offsetCol, hi)
    AdxLike.compilePartitionQueries(
      table, schema, pushed ++ range, full, partitionColumn, numPartitions)
      .map(AdxLikePartition.apply)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AdxLikeReaderFactory(url, schema, maxRetries, normalize,
      if (normalize) realCols else Set.empty)

  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()
}

private case class AdxLikeStreamOffset(v: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = v.toString
}

private case class AdxLikePartition(sql: String) extends InputPartition

private class AdxLikeReaderFactory(
    url: String,
    schema: StructType,
    maxRetries: Int,
    normalize: Boolean,
    realCols: Set[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val sql = partition.asInstanceOf[AdxLikePartition].sql
    AdxLike.recordQuery(sql)
    new AdxLikeReader(url, sql, schema, maxRetries, normalize, realCols)
  }
}

/** One partition's reader: managed connection + compiled query under
  * the shared retry policy, ResultSet decoded straight to InternalRow.
  */
private class AdxLikeReader(
    url: String,
    sql: String,
    schema: StructType,
    maxRetries: Int,
    normalize: Boolean,
    realCols: Set[String])
  extends PartitionReader[InternalRow] {

  // per-field Kusto normalization decisions, resolved once
  private val coerceReal: Array[Boolean] =
    schema.fields.map(f => realCols.contains(f.name))

  // connect + execute under the connector retry policy, like the
  // reference's execute_query reconnect loop (adx_plugin.py:131-165)
  private val (conn: Connection, rs: ResultSet) = Jdbc.withRetries(maxRetries) {
    val c = DriverManager.getConnection(url)
    try c -> c.createStatement().executeQuery(sql)
    catch { case e: Throwable => c.close(); throw e }
  }

  override def next(): Boolean = rs.next()

  override def get(): InternalRow = {
    val values = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      values(i) = decode(i)
      i += 1
    }
    InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(values))
  }

  private def decode(i: Int): Any = {
    val v: Any = schema.fields(i).dataType match {
      case IntegerType => rs.getInt(i + 1)
      case LongType => rs.getLong(i + 1)
      case ShortType => rs.getShort(i + 1)
      case ByteType => rs.getByte(i + 1)
      // a Kusto-normalized "real" arrives as remote text — coerce the
      // special values and parse failures exactly like
      // [[graft.ops.Scalars.coerceSpecialDouble]] (adx_plugin.py:252-257)
      case DoubleType if coerceReal(i) =>
        rs.getString(i + 1) match {
          case null => null
          case "NaN" => Double.NaN
          case "Infinity" => Double.PositiveInfinity
          case "-Infinity" => Double.NegativeInfinity
          case s => try s.toDouble catch { case _: NumberFormatException => null }
        }
      case DoubleType => rs.getDouble(i + 1)
      case FloatType => rs.getFloat(i + 1)
      case BooleanType => rs.getBoolean(i + 1)
      case StringType =>
        val s = rs.getString(i + 1)
        if (s == null) null else UTF8String.fromString(s)
      case d: DecimalType =>
        val bd = rs.getBigDecimal(i + 1)
        if (bd == null) null
        else org.apache.spark.sql.types.Decimal(new scala.math.BigDecimal(bd), d.precision, d.scale)
      case TimestampType =>
        val ts = rs.getTimestamp(i + 1)
        if (ts == null) null
        else {
          val micros = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
          // Kusto normalization floors every timestamp to the whole
          // second (adx_plugin.py:259-262); floorMod keeps pre-epoch
          // values on the date_trunc("second") contract
          if (normalize) micros - Math.floorMod(micros, 1000000L) else micros
        }
      case DateType =>
        val dt = rs.getDate(i + 1)
        if (dt == null) null else dt.toLocalDate.toEpochDay.toInt
      case other => throw new IllegalArgumentException(s"unsupported read type $other")
    }
    if (rs.wasNull()) null else v
  }

  override def close(): Unit = {
    try rs.close() finally conn.close()
  }
}

private[graft] object AdxLike {

  /** Last remote query text each reader executed — observability for
    * specs (asserting the WHERE clause and SELECT list actually
    * reached the "cluster"), like capturing the reference's printed
    * query. Driver + local executors share the JVM in tests.
    */
  @volatile private var lastQueryText: String = ""
  def recordQuery(sql: String): Unit = lastQueryText = sql
  def lastQuery: String = lastQueryText

  /** Largest runtime-filter IN list the scan will compile into remote
    * query text; bigger key sets stay Spark-side (the join discards
    * the unpruned rows, so dropping the filter is always correct).
    */
  val RuntimeInCap = 1000

  /** Planning-time COUNT memo for `option("statistics","remote")` —
    * one remote roundtrip per distinct (url, count query) per JVM.
    */
  private val statsCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[sources] def clearStatsCache(): Unit = statsCache.clear()
  def cachedCount(url: String, sql: String, maxRetries: Int): Long =
    statsCache.computeIfAbsent(url + "\u0000" + sql, _ =>
      Long.box(Jdbc.withRetries(maxRetries) {
        val conn = DriverManager.getConnection(url)
        try {
          val rs = conn.createStatement().executeQuery(sql)
          try { rs.next(); rs.getLong(1) } finally rs.close()
        } finally conn.close()
      }))

  def resolveSchema(url: String, table: String, maxRetries: Int): StructType = {
    require(url != null, "option 'url' is required")
    require(table != null, "option 'table' is required")
    Jdbc.withRetries(maxRetries) {
      val conn = DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery(s"SELECT * FROM $table WHERE 1=0")
        val md = rs.getMetaData
        val remoteNames = (1 to md.getColumnCount).map(md.getColumnName)
        // Lowercasing for ergonomics must not merge two remote columns
        // that differ only by case into duplicate Spark field names —
        // keep the exact remote case for any colliding group.
        val collided: Set[String] = remoteNames.groupBy(_.toLowerCase)
          .collect { case (lc, vs) if vs.distinct.size > 1 => lc }.toSet
        def sparkName(remote: String): String =
          if (collided(remote.toLowerCase)) remote else remote.toLowerCase
        StructType((1 to md.getColumnCount).map { i =>
          // Spark-side name is lowercased for ergonomics; the remote
          // name (exact case) rides in field metadata so compiled
          // query text can QUOTE it — a column named like a reserved
          // word (`at`, `order`, ...) must not break the connector.
          StructField(sparkName(md.getColumnName(i)), sparkType(md, i),
            md.isNullable(i) != java.sql.ResultSetMetaData.columnNoNulls,
            new MetadataBuilder().putString(AdxLike.RemoteNameKey, md.getColumnName(i)).build())
        })
      } finally conn.close()
    }
  }

  private def sparkType(md: ResultSetMetaData, i: Int): DataType =
    md.getColumnType(i) match {
      case Types.INTEGER | Types.SMALLINT | Types.TINYINT => IntegerType
      case Types.BIGINT => LongType
      case Types.DOUBLE | Types.FLOAT => DoubleType
      case Types.REAL => FloatType
      case Types.BOOLEAN | Types.BIT => BooleanType
      case Types.DECIMAL | Types.NUMERIC =>
        DecimalType(md.getPrecision(i), md.getScale(i))
      case Types.TIMESTAMP => TimestampType
      case Types.DATE => DateType
      case _ => StringType
    }

  /** Result schema of a pushed aggregate, resolved from the cluster
    * itself with a metadata-only probe (`WHERE 1=0`), exactly like
    * table schema resolution: the remote's aggregate OUTPUT types are
    * dialect facts (Derby COUNT -> INTEGER, Spark count -> long), and
    * declaring what the remote actually returns lets Spark insert the
    * right casts / final merge on top. Spark binds the scan output
    * POSITIONALLY (group columns first, then aggregates), so names
    * here only need to be unique.
    */
  def resolveAggSchema(
      url: String,
      table: String,
      agg: CompiledAgg,
      maxRetries: Int): StructType =
    Jdbc.withRetries(maxRetries) {
      val conn = DriverManager.getConnection(url)
      try {
        val sql = renderQuery(table, agg.selectList.mkString(", "), Seq("1=0"), agg.groupBy, None)
        val md = conn.createStatement().executeQuery(sql).getMetaData
        StructType((1 to md.getColumnCount).map { i =>
          val name =
            if (i <= agg.groupNames.length) agg.groupNames(i - 1)
            else s"agg_${i - agg.groupNames.length - 1}"
          StructField(name, sparkType(md, i), nullable = true)
        })
      } finally conn.close()
    }

  val RemoteNameKey = "adxlike.remoteName"

  /** Pushability rule for kusto-normalized columns, ONE definition for
    * the scan builder and the runtime scan (they must never diverge: a
    * column the planner correctly blocked must not become pushable at
    * runtime). A normalized column's remote raw values disagree with
    * what Spark sees — second-floored timestamps, coerced string reals
    * — so predicates and aggregates on it stay Spark-side.
    */
  private[sources] def normalizedColumn(
      normalize: Boolean,
      realCols: Set[String],
      schema: StructType,
      name: String): Boolean =
    normalize && (
      realCols(name) ||
        schema.fields.exists(f => f.name == name && f.dataType == TimestampType))

  /** Quote a remote identifier verbatim (no schema lookup) — used for
    * join-pushdown aliases, whose exported names ARE the identifiers.
    */
  private[sources] def quoteRaw(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  private val aliasCounter = new java.util.concurrent.atomic.AtomicInteger(0)
  private[sources] def freshAlias(): String = "sq" + aliasCounter.getAndIncrement()

  /** Compile a V2 join ON-condition to remote SQL, or None to keep
    * the join in Spark. References must be single-name columns of the
    * joined output whose remote comparison provably equals Spark's
    * (numeric/temporal/boolean — string equality is a remote
    * collation/padding fact, and a pushed join REPLACES the Spark
    * join, so looser remote equality would surface extra rows).
    * `<=>` (null-safe equal) expands to its portable SQL form.
    */
  private[sources] def compileJoinCondition(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate,
      schema: StructType): Option[String] = {
    import org.apache.spark.sql.connector.expressions.{Expression => VExpr, Literal => VLit}
    import org.apache.spark.sql.connector.expressions.filter.{Predicate => VPred}
    def operand(e: VExpr): Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        schema.fields.find(_.name == nr.fieldNames()(0)).collect {
          case f if comparableRemotely(f.dataType) => remoteId(schema, f.name)
        }
      case lv: VLit[_] if comparableRemotely(lv.dataType) =>
        lit(org.apache.spark.sql.catalyst.CatalystTypeConverters
          .convertToScala(lv.value, lv.dataType))
      case _ => None
    }
    def sub(e: VExpr): Option[String] = e match {
      case q: VPred => compileJoinCondition(q, schema).map(s => s"($s)")
      case _ => None
    }
    val kids = p.children()
    p.name() match {
      case op @ ("=" | "<>" | "<" | "<=" | ">" | ">=") =>
        for (l <- operand(kids(0)); r <- operand(kids(1))) yield s"$l $op $r"
      case "<=>" =>
        // The expansion must be NULL-PROOF, not merely equivalent on
        // non-null rows: under NOT (`is distinct from`), the naive
        // `l = r OR (l IS NULL AND r IS NULL)` evaluates to SQL NULL
        // when exactly one side is NULL (FALSE OR NULL), and NOT NULL
        // is NULL — the remote ON silently DROPS row pairs Spark
        // would join, and a pushed join replaces the Spark join so
        // the rows are unrecoverable (review r19). Each disjunct
        // below is TRUE or FALSE on every input, never NULL.
        for (l <- operand(kids(0)); r <- operand(kids(1)))
          yield s"(($l IS NULL AND $r IS NULL) OR " +
            s"($l IS NOT NULL AND $r IS NOT NULL AND $l = $r))"
      case "IS_NULL" => operand(kids(0)).map(c => s"$c IS NULL")
      case "IS_NOT_NULL" => operand(kids(0)).map(c => s"$c IS NOT NULL")
      case "AND" => for (l <- sub(kids(0)); r <- sub(kids(1))) yield s"$l AND $r"
      case "OR" => for (l <- sub(kids(0)); r <- sub(kids(1))) yield s"$l OR $r"
      case "NOT" => sub(kids(0)).map(c => s"NOT $c")
      case _ => None
    }
  }

  private def comparableRemotely(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         BooleanType | TimestampType | DateType | _: DecimalType => true
    case _ => false // strings: collation/padding may disagree with Spark
  }

  /** `option("normalize", "kusto")` — the connector applies the SAME
    * ingest normalization as the parquet path's
    * [[Sources.normalizeKustoLike]] + per-column
    * [[graft.ops.Scalars.coerceSpecialDouble]]: every timestamp is
    * floored to the whole second during decode, and the columns named
    * in `option("kustoRealColumns", "a,b")` (Kusto-declared reals that
    * arrive as text — the type knowledge the reference takes from the
    * Kusto schema, supplied here by the caller) are declared DOUBLE
    * and coerced ("NaN"/"Infinity"/"-Infinity" to specials, parse
    * failures to null). Normalized columns never participate in
    * pushdown: the remote's raw values differ from what Spark sees.
    */
  def normalizeKusto(normalize: Option[String]): Boolean =
    normalize.exists(_.equalsIgnoreCase("kusto"))

  def realColumnsOf(normalize: Option[String], realColumns: Option[String]): Set[String] =
    if (!normalizeKusto(normalize)) Set.empty
    else realColumns.toSet.flatMap((s: String) => s.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty))

  /** Quoted remote identifier for a Spark-side column name: the exact
    * remote case from schema metadata, double-quoted (reserved-word
    * safe); a user-supplied schema without metadata falls back to the
    * bare name unquoted (quoting a lowercased name would change its
    * identity under case-sensitive quoted-identifier rules).
    */
  private[sources] def remoteId(full: StructType, name: String): String =
    full.fields.find(_.name == name) match {
      case Some(f) if f.metadata.contains(RemoteNameKey) =>
        "\"" + f.metadata.getString(RemoteNameKey).replace("\"", "\"\"") + "\""
      case _ => name
    }

  /** A pushed aggregation compiled to remote SQL text: the SELECT
    * list is group columns first then aggregate expressions (the
    * positional order Spark binds the scan output by), `groupBy` the
    * GROUP BY column list, `groupNames` the Spark-side names of the
    * group columns.
    */
  case class CompiledAgg(selectList: Seq[String], groupBy: Seq[String], groupNames: Seq[String])

  /** Compile an [[Aggregation]] to remote SQL, or None if any piece
    * has no exact remote form (everything then stays Spark-side).
    * Only plain-column group-bys and min/max/count/sum/avg over plain
    * columns compile. Integral SUM is widened to BIGINT remote-side
    * (Spark's sum(int) is a long — the remote must not overflow at
    * INT first) and non-double AVG inputs are cast to DOUBLE (Derby's
    * AVG(INT) truncates to INT; Spark's avg is always a double).
    * Decimal AVG never pushes: the remote's result scale differs from
    * Spark's decimal-avg scale rules. DISTINCT only compiles when the
    * remote result is final (`allowDistinct` — single partition).
    */
  def compileAggregation(
      a: Aggregation,
      full: StructType,
      allowDistinct: Boolean,
      blocked: String => Boolean = _ => false): Option[CompiledAgg] = {
    def fieldOf(e: Expression): Option[StructField] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 && !blocked(nr.fieldNames()(0)) =>
        full.fields.find(_.name == nr.fieldNames()(0))
      case _ => None
    }
    def rid(f: StructField): String = remoteId(full, f.name)
    def distinct(d: Boolean): Option[String] =
      if (!d) Some("") else if (allowDistinct) Some("DISTINCT ") else None
    def asDouble(f: StructField): String = f.dataType match {
      case DoubleType => rid(f)
      case _ => s"CAST(${rid(f)} AS DOUBLE)"
    }
    val groups = a.groupByExpressions.toSeq.map(fieldOf)
    if (groups.exists(_.isEmpty)) return None
    val aggs: Seq[Option[String]] = a.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("COUNT(*)")
      case c: Count =>
        for (d <- distinct(c.isDistinct); f <- fieldOf(c.column))
          yield s"COUNT($d${rid(f)})"
      case m: Min => fieldOf(m.column).map(f => s"MIN(${rid(f)})")
      case m: Max => fieldOf(m.column).map(f => s"MAX(${rid(f)})")
      case s: Sum =>
        for {
          d <- distinct(s.isDistinct)
          f <- fieldOf(s.column)
          e <- f.dataType match {
            case ByteType | ShortType | IntegerType => Some(s"CAST(${rid(f)} AS BIGINT)")
            case LongType | _: DecimalType => Some(rid(f))
            case FloatType | DoubleType => Some(asDouble(f))
            case _ => None
          }
        } yield s"SUM($d$e)"
      case v: Avg =>
        for {
          d <- distinct(v.isDistinct)
          f <- fieldOf(v.column)
          e <- f.dataType match {
            case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType =>
              Some(asDouble(f))
            case _ => None // decimal avg: remote scale rules differ from Spark's
          }
        } yield s"AVG($d$e)"
      case _ => None // GeneralAggregateFunc etc. stay Spark-side
    }
    if (aggs.exists(_.isEmpty)) None
    else {
      val gb = groups.flatten.map(rid)
      Some(CompiledAgg(gb ++ aggs.flatten, gb, groups.flatten.map(_.name)))
    }
  }

  /** One compiled ORDER BY term for a pushed top-N, or None to keep
    * the sort Spark-side. Only plain non-blocked columns of types
    * whose remote ordering provably equals Spark's compile:
    * numeric/temporal/boolean totally order identically everywhere,
    * while STRING order is a remote collation/config fact (Spark sorts
    * binary; a remote under a case-insensitive or locale collation
    * would return a DIFFERENT top N — silently wrong results, so it
    * never pushes). Direction and null ordering are rendered
    * explicitly: Spark's ASC NULLS FIRST / DESC NULLS LAST defaults
    * are not every remote's defaults.
    */
  def compileSortOrder(
      so: SortOrder,
      full: StructType,
      blocked: String => Boolean = _ => false): Option[String] =
    so.expression() match {
      case nr: NamedReference if nr.fieldNames.length == 1 && !blocked(nr.fieldNames()(0)) =>
        full.fields.find(_.name == nr.fieldNames()(0)).collect {
          case f if orderableRemotely(f.dataType) =>
            val dir = if (so.direction() == SortDirection.ASCENDING) "ASC" else "DESC"
            val nulls =
              if (so.nullOrdering() == NullOrdering.NULLS_FIRST) "NULLS FIRST" else "NULLS LAST"
            s"${remoteId(full, f.name)} $dir $nulls"
        }
      case _ => None
    }

  private def orderableRemotely(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         BooleanType | TimestampType | DateType | _: DecimalType => true
    case _ => false // strings: remote collation may disagree with Spark's binary order
  }

  /** Render one remote query from its compiled pieces, clause order
    * fixed: WHERE conjuncts before GROUP BY, ORDER BY next, then
    * OFFSET before FETCH (SQL-standard `OFFSET m ROWS FETCH FIRST n
    * ROWS ONLY`). A pushed limit is the absolute END of Spark's row
    * window and a pushed offset its START (see
    * `AdxLikeScanBuilder.pushOffset`), and SQL applies FETCH after
    * OFFSET, so the fetch count is `limit - offset`.
    */
  def renderQuery(
      table: String,
      select: String,
      where: Seq[String],
      groupBy: Seq[String],
      limit: Option[Int],
      orderBy: Seq[String] = Nil,
      offset: Option[Int] = None): String =
    s"SELECT $select FROM $table" +
      (if (where.isEmpty) "" else where.map(w => s"($w)").mkString(" WHERE ", " AND ", "")) +
      (if (groupBy.isEmpty) "" else groupBy.mkString(" GROUP BY ", ", ", "")) +
      (if (orderBy.isEmpty) "" else orderBy.mkString(" ORDER BY ", ", ", "")) +
      offset.map(k => s" OFFSET $k ROWS").getOrElse("") +
      limit.map(n => s" FETCH FIRST ${n - offset.getOrElse(0)} ROWS ONLY").getOrElse("")

  /** One remote query per partition: with `partitionColumn` set and
    * `numPartitions` > 1, partition i reads the disjoint slice
    * `MOD(MOD(col, n) + n, n) = i` over an integral column. The
    * double-MOD folds NEGATIVE values into [0, n) (SQL MOD of a
    * negative is negative in most dialects — a bare `MOD(col,n)=i`
    * would silently drop those rows), and partition 0 additionally
    * takes `col IS NULL` rows, so the union of the partitions is
    * EXACTLY the unpartitioned result for any data. Same sharding
    * contract as [[Jdbc.readPartitioned]], compiled into the remote
    * query text. The shard predicate lands in WHERE, i.e. BEFORE any
    * pushed GROUP BY — a sharded aggregate is a valid per-shard
    * partial that Spark merges.
    */
  def compilePartitionQueries(
      table: String,
      schema: StructType,
      pushed: Array[Filter],
      full: StructType,
      partitionColumn: Option[String],
      numPartitions: Int,
      agg: Option[CompiledAgg] = None,
      limit: Option[Int] = None,
      orderBy: Seq[String] = Nil,
      offset: Option[Int] = None): Seq[String] = {
    val select = agg.map(_.selectList.mkString(", ")).getOrElse(
      if (schema.isEmpty) "1"
      else schema.fieldNames.map(remoteId(full, _)).mkString(", "))
    val groupBy = agg.map(_.groupBy).getOrElse(Nil)
    val where = pushed.flatMap(f => compileFilter(f, remoteId(full, _))).toSeq
    partitionColumn match {
      case Some(c) if numPartitions > 1 =>
        val rid = remoteId(full, c)
        (0 until numPartitions).map { i =>
          val slice = s"MOD(MOD($rid, $numPartitions) + $numPartitions, $numPartitions) = $i"
          val pred = if (i == 0) s"($slice) OR ($rid IS NULL)" else slice
          renderQuery(table, select, where :+ pred, groupBy, limit, orderBy)
        }
      case _ => Seq(renderQuery(table, select, where, groupBy, limit, orderBy, offset))
    }
  }

  /** Compile the pruned projection + pushed predicates into the
    * remote query — the connector ships query TEXT, exactly like the
    * reference's KQL string (dialect aside).
    */
  def compileQuery(
      table: String,
      schema: StructType,
      pushed: Array[Filter],
      full: StructType): String =
    compilePartitionQueries(table, schema, pushed, full, None, 1).head

  private def lit(v: Any): Option[String] = v match {
    case null => None
    case s: String => Some("'" + s.replace("'", "''") + "'")
    case b: Boolean => Some(b.toString.toUpperCase)
    // non-finite doubles have no portable SQL literal AND different
    // comparison semantics remote-side (Spark: NaN = NaN is true,
    // NaN sorts above all doubles) — keep those filters in Spark
    case d: Double if java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d) => None
    // Float literals stay Spark-side entirely: the remote compares a
    // REAL column at DOUBLE precision against the decimal text, so
    // `= 0.1f` pushed as `= 0.1` can drop rows Spark's float
    // comparison keeps (and range boundaries shift the same way).
    // Double is safe — Java's shortest round-trip string parses back
    // to the identical double remote-side.
    case _: Float => None
    case n @ (_: Int | _: Long | _: Short | _: Byte | _: Double) => Some(n.toString)
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: BigDecimal => Some(d.underlying.toPlainString)
    case t: java.sql.Timestamp => Some(s"TIMESTAMP('$t')")
    case d: java.sql.Date => Some(s"DATE('$d')")
    case _ => None // unsupported literal type -> filter stays in Spark
  }

  /** SQL text for a supported filter; None keeps it Spark-side.
    * `q` maps a Spark attribute name to its quoted remote identifier
    * (identity by default — used for the pushability probe).
    */
  def compileFilter(f: Filter, q: String => String = identity): Option[String] = f match {
    case EqualTo(a, v) => lit(v).map(l => s"${q(a)} = $l")
    case GreaterThan(a, v) => lit(v).map(l => s"${q(a)} > $l")
    case GreaterThanOrEqual(a, v) => lit(v).map(l => s"${q(a)} >= $l")
    case LessThan(a, v) => lit(v).map(l => s"${q(a)} < $l")
    case LessThanOrEqual(a, v) => lit(v).map(l => s"${q(a)} <= $l")
    case In(a, vs) if vs.nonEmpty =>
      val ls = vs.map(lit)
      if (ls.forall(_.isDefined)) Some(s"${q(a)} IN (${ls.flatten.mkString(", ")})") else None
    case IsNull(a) => Some(s"${q(a)} IS NULL")
    case IsNotNull(a) => Some(s"${q(a)} IS NOT NULL")
    case And(l, r) =>
      for (ls <- compileFilter(l, q); rs <- compileFilter(r, q)) yield s"($ls) AND ($rs)"
    case Or(l, r) =>
      for (ls <- compileFilter(l, q); rs <- compileFilter(r, q)) yield s"($ls) OR ($rs)"
    case Not(c) => compileFilter(c, q).map(cs => s"NOT ($cs)")
    case _ => None
  }
}
