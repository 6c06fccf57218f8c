package graft.sources

import java.sql.{Connection, DriverManager, ResultSet, Types}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AdxLike.resolveSchema(
      options.get("url"),
      options.get("table"),
      Option(options.get("maxRetries")).map(_.toInt).getOrElse(3))

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
      opt("numPartitions").map(_.toInt).getOrElse(1))
  }

  override def supportsExternalMetadata(): Boolean = true
}

private class AdxLikeTable(
    url: String,
    tableName: String,
    tableSchema: StructType,
    maxRetries: Int,
    partitionColumn: Option[String],
    numPartitions: Int)
  extends Table with SupportsRead {
  require(url != null, "option 'url' is required")
  require(tableName != null, "option 'table' is required")
  require(numPartitions >= 1, s"numPartitions=$numPartitions must be >= 1")

  override def name(): String = s"adxlike:$tableName"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AdxLikeScanBuilder(url, tableName, tableSchema, maxRetries, partitionColumn, numPartitions)
}

private class AdxLikeScanBuilder(
    url: String,
    table: String,
    full: StructType,
    maxRetries: Int,
    partitionColumn: Option[String],
    numPartitions: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = full

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rejected) = filters.partition(f => AdxLike.compileFilter(f).isDefined)
    pushed = supported
    rejected // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // Spark hands back a subset of `full` in table-column order.
    required = requiredSchema
  }

  override def build(): Scan =
    new AdxLikeScan(url, table, required, pushed, maxRetries, full, partitionColumn, numPartitions)
}

private class AdxLikeScan(
    url: String,
    table: String,
    schema: StructType,
    pushed: Array[Filter],
    maxRetries: Int,
    fullSchema: StructType,
    partitionColumn: Option[String],
    numPartitions: Int) extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"AdxLike table=$table PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadColumns: [${schema.fieldNames.mkString(", ")}]" +
      partitionColumn.map(c => s", Partitioned: MOD($c, $numPartitions)").getOrElse("")

  override def planInputPartitions(): Array[InputPartition] =
    AdxLike.compilePartitionQueries(
      table, schema, pushed, fullSchema, partitionColumn, numPartitions)
      .map(AdxLikePartition.apply)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new AdxLikeReaderFactory(url, schema, maxRetries)
}

private case class AdxLikePartition(sql: String) extends InputPartition

private class AdxLikeReaderFactory(url: String, schema: StructType, maxRetries: Int)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val sql = partition.asInstanceOf[AdxLikePartition].sql
    AdxLike.recordQuery(sql)
    new AdxLikeReader(url, sql, schema, maxRetries)
  }
}

/** One partition's reader: managed connection + compiled query under
  * the shared retry policy, ResultSet decoded straight to InternalRow.
  */
private class AdxLikeReader(url: String, sql: String, schema: StructType, maxRetries: Int)
  extends PartitionReader[InternalRow] {

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
        if (ts == null) null else ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
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

private[sources] object AdxLike {

  /** Last remote query text each reader executed — observability for
    * specs (asserting the WHERE clause and SELECT list actually
    * reached the "cluster"), like capturing the reference's printed
    * query. Driver + local executors share the JVM in tests.
    */
  @volatile private var lastQueryText: String = ""
  def recordQuery(sql: String): Unit = lastQueryText = sql
  def lastQuery: String = lastQueryText

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
          val dt = md.getColumnType(i) match {
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
          // Spark-side name is lowercased for ergonomics; the remote
          // name (exact case) rides in field metadata so compiled
          // query text can QUOTE it — a column named like a reserved
          // word (`at`, `order`, ...) must not break the connector.
          StructField(sparkName(md.getColumnName(i)), dt,
            md.isNullable(i) != java.sql.ResultSetMetaData.columnNoNulls,
            new MetadataBuilder().putString(AdxLike.RemoteNameKey, md.getColumnName(i)).build())
        })
      } finally conn.close()
    }
  }

  val RemoteNameKey = "adxlike.remoteName"

  /** Quoted remote identifier for a Spark-side column name: the exact
    * remote case from schema metadata, double-quoted (reserved-word
    * safe); a user-supplied schema without metadata falls back to the
    * bare name unquoted (quoting a lowercased name would change its
    * identity under case-sensitive quoted-identifier rules).
    */
  private def remoteId(full: StructType, name: String): String =
    full.fields.find(_.name == name) match {
      case Some(f) if f.metadata.contains(RemoteNameKey) =>
        "\"" + f.metadata.getString(RemoteNameKey).replace("\"", "\"\"") + "\""
      case _ => name
    }

  /** One remote query per partition: with `partitionColumn` set and
    * `numPartitions` > 1, partition i reads the disjoint slice
    * `MOD(MOD(col, n) + n, n) = i` over an integral column. The
    * double-MOD folds NEGATIVE values into [0, n) (SQL MOD of a
    * negative is negative in most dialects — a bare `MOD(col,n)=i`
    * would silently drop those rows), and partition 0 additionally
    * takes `col IS NULL` rows, so the union of the partitions is
    * EXACTLY the unpartitioned result for any data. Same sharding
    * contract as [[Jdbc.readPartitioned]], compiled into the remote
    * query text.
    */
  def compilePartitionQueries(
      table: String,
      schema: StructType,
      pushed: Array[Filter],
      full: StructType,
      partitionColumn: Option[String],
      numPartitions: Int): Seq[String] = {
    val base = compileQuery(table, schema, pushed, full)
    partitionColumn match {
      case Some(c) if numPartitions > 1 =>
        val rid = remoteId(full, c)
        (0 until numPartitions).map { i =>
          val slice = s"MOD(MOD($rid, $numPartitions) + $numPartitions, $numPartitions) = $i"
          val pred = if (i == 0) s"($slice) OR ($rid IS NULL)" else slice
          if (base.contains(" WHERE ")) s"$base AND ($pred)" else s"$base WHERE $pred"
        }
      case _ => Seq(base)
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
      full: StructType): String = {
    val cols =
      if (schema.isEmpty) "1"
      else schema.fieldNames.map(remoteId(full, _)).mkString(", ")
    val where = pushed.flatMap(f => compileFilter(f, remoteId(full, _)))
    val wsql = if (where.isEmpty) "" else where.mkString(" WHERE (", ") AND (", ")")
    s"SELECT $cols FROM $table$wsql"
  }

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
