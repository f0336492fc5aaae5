package graft.sources

import java.sql.DriverManager
import java.util.Properties

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Structured-Streaming-native CDC source: the reference's polling
  * `(ts, id)` cursor (libraries/kspp-pg/postgres_read_cursor.cpp:77-95)
  * exposed as a DataSource V2 `MicroBatchStream`, so the cursor state lives
  * in Spark's checkpointed offset log instead of a side file and the source
  * composes with every streaming operator:
  *
  * {{{
  * spark.readStream.format("graft.sources.CdcV2Provider")
  *   .option("url", jdbcUrl).option("query", "SELECT * FROM src")
  *   .option("tsColumn", "ts").option("idColumn", "id")
  *   .option("maxItemsPerFetch", "10000").load()
  * }}}
  *
  * Offsets are the cursor pair itself — `{"ts":…,"id":…}` — and a batch is
  * the half-open cursor range (start, end]: start-exclusive via the
  * reference's equal-ts tie-break clause, end-inclusive via its mirror.
  * `SupportsAdmissionControl` paces each batch to `maxItemsPerFetch` rows
  * (the reference's max_items_per_fetch), so a large backlog streams as
  * bounded batches instead of one giant scan. Each batch reads as a single
  * partition to preserve the reference's per-partition total order; at
  * scale, parallelism comes from running one source per upstream partition
  * (exactly the reference's model), not from splitting a page.
  *
  * Requires both cursor columns (ts-only / id-only variants stay on the
  * batch [[CdcCursor]]); extra JDBC connection properties pass through as
  * `jdbc.`-prefixed options.
  */
final class CdcV2Provider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-cdc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = CdcV2.Conf(options.asCaseSensitiveMap().asScala.toMap)
    // empty-result probe through Spark's JDBC reader so the schema mapping
    // matches what spark.read.jdbc would produce for the same query
    val props = new Properties()
    conf.jdbcProps.foreach { case (k, v) => props.setProperty(k, v) }
    SparkSession.active.read
      .jdbc(conf.url, s"(SELECT * FROM (${conf.query}) g WHERE 1=0) s", props)
      .schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new CdcV2.CdcTable(schema, CdcV2.Conf(properties.asScala.toMap))

  override def supportsExternalMetadata(): Boolean = true
}

object CdcV2 {

  final case class Conf(options: Map[String, String]) {
    private def opt(name: String): Option[String] =
      options.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    val url: String = opt("url").getOrElse(sys.error("graft-cdc: missing option url"))
    val query: String = opt("query").getOrElse(sys.error("graft-cdc: missing option query"))
    val tsCol: String = opt("tsColumn").getOrElse(sys.error("graft-cdc: missing option tsColumn"))
    val idCol: String = opt("idColumn").getOrElse(sys.error("graft-cdc: missing option idColumn"))
    val maxItemsPerFetch: Int = opt("maxItemsPerFetch").map(_.toInt).getOrElse(10000)
    // Derby/SQL Server spell LIMIT as FETCH FIRST (same dialect hook as
    // CdcCursor.Spec.limitClause)
    val limitDialect: String = opt("limitDialect").getOrElse("fetch")
    val jdbcProps: Map[String, String] = options.collect {
      case (k, v) if k.toLowerCase.startsWith("jdbc.") => k.substring(5) -> v
    }

    def limit(n: Int): String =
      if (limitDialect == "limit") s" LIMIT $n" else s" FETCH FIRST $n ROWS ONLY"

    // clause family shared with the batch cursor (single-sourced so
    // escaping and tie-break semantics can't drift)
    def afterClause(o: CdcOffset): Option[String] =
      if (o.isStart) None else Some(s"(${CdcCursor.afterClause(tsCol, idCol, o.ts, o.id)})")

    def upToClause(o: CdcOffset): String = s"(${CdcCursor.upToClause(tsCol, idCol, o.ts, o.id)})"

    def rangeSql(start: CdcOffset, end: CdcOffset): String = {
      val conds = afterClause(start).toSeq :+ upToClause(end)
      s"SELECT * FROM ($query) graft_src WHERE ${conds.mkString(" AND ")}" +
        s" ORDER BY $tsCol ASC, $idCol ASC"
    }

    def connect(): java.sql.Connection = {
      val props = new Properties()
      jdbcProps.foreach { case (k, v) => props.setProperty(k, v) }
      DriverManager.getConnection(url, props)
    }
  }

  // The DB compares cursor literals with the column's type (a numeric
  // column casts '999' < '1000' numerically); mirror that here — compare
  // numerically when both values parse as numbers, else as strings.
  private[graft] def cmpVal(a: String, b: String): Int = {
    val numeric = try Some(BigDecimal(a).compare(BigDecimal(b))) catch {
      case _: NumberFormatException => None
    }
    numeric.getOrElse(a.compareTo(b))
  }

  private[graft] def notPast(o: CdcOffset, bound: CdcOffset): Boolean = {
    val c = cmpVal(o.ts, bound.ts)
    c < 0 || (c == 0 && cmpVal(o.id, bound.id) <= 0)
  }

  /** The cursor pair; the all-empty pair is "before everything". */
  final case class CdcOffset(ts: String, id: String) extends Offset {
    def isStart: Boolean = ts.isEmpty && id.isEmpty
    override def json(): String = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      m.createObjectNode().put("ts", ts).put("id", id).toString
    }
  }

  object CdcOffset {
    def fromJson(json: String): CdcOffset = {
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      CdcOffset(n.get("ts").asText(), n.get("id").asText())
    }
  }

  final class CdcTable(tableSchema: StructType, conf: Conf) extends Table with SupportsRead {
    override def name(): String = s"graft-cdc(${conf.query})"
    override def schema(): StructType = tableSchema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder with Scan {
        override def build(): Scan = this
        override def readSchema(): StructType = tableSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CdcMicroBatchStream(tableSchema, conf)
      }
  }

  final class CdcMicroBatchStream(schema: StructType, conf: Conf)
      extends MicroBatchStream with SupportsTriggerAvailableNow {

    // Trigger.AvailableNow: snapshot the backlog end once, then let the
    // paced latestOffset walk up to it in maxItemsPerFetch batches instead
    // of one giant scan (without this Spark falls back to a single
    // all-available batch).
    @volatile private var availableNowTarget: Option[CdcOffset] = None

    override def prepareForTriggerAvailableNow(): Unit = {
      // the backlog tip is the single max (ts, id) — index-friendly, no scan
      val sql = s"SELECT ${conf.tsCol}, ${conf.idCol} FROM (${conf.query}) graft_src" +
        s" ORDER BY ${conf.tsCol} DESC, ${conf.idCol} DESC${conf.limit(1)}"
      val conn = conf.connect()
      try {
        val rs = conn.createStatement().executeQuery(sql)
        availableNowTarget = Some(
          if (rs.next()) offsetOf(rs) else CdcOffset("", ""))
      } finally conn.close()
    }

    /** Read a (ts, id) offset off the current probe row, refusing NULLs by
      * name: a NULL cursor value would otherwise NPE on isStart (or, after
      * a checkpoint round-trip, compare the WHERE clause against the
      * literal string "null" — silently wrong rows skipped or re-read).
      */
    private def offsetOf(rs: java.sql.ResultSet): CdcOffset = {
      val ts = rs.getString(1)
      val id = rs.getString(2)
      if (ts == null || id == null) throw new IllegalStateException(
        s"cdc: NULL in cursor column ('${conf.tsCol}' = $ts, '${conf.idCol}' = $id) — " +
          "(ts, id) cursor columns must be non-null; exclude NULL rows in " +
          "the query or backfill the column")
      CdcOffset(ts, id)
    }

    override def initialOffset(): Offset = CdcOffset("", "")
    override def deserializeOffset(json: String): Offset = CdcOffset.fromJson(json)
    override def commit(end: Offset): Unit = () // offset log is the store
    override def stop(): Unit = ()

    override def latestOffset(): Offset =
      throw new UnsupportedOperationException("paced via SupportsAdmissionControl")

    override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(conf.maxItemsPerFetch.toLong)

    /** Advance the cursor by at most maxItemsPerFetch rows past `start`:
      * one bounded driver-side probe for the page's last (ts, id) — the
      * poll step of postgres_read_cursor, minus the data read (the data
      * moves in the executors' planInputPartitions range scan).
      */
    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      val s = start.asInstanceOf[CdcOffset]
      def rowCap(l: ReadLimit): Option[Long] = l match {
        case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows => Some(r.maxRows())
        case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
          c.getReadLimits.flatMap(rowCap(_)).reduceOption(_ min _)
        case _ => None // ReadAllAvailable / unknown: no row cap
      }
      availableNowTarget match {
        // the table had no rows at prepare time: the AvailableNow contract
        // is "process only data available at query start", so the answer
        // is NO PROGRESS (return start) — returning the paced offset would
        // chase fresh inserts forever and the run-once query never stops
        case Some(target) if target.isStart => s
        case Some(target) =>
          val paced = pagedEnd(s, rowCap(limit))
          if (notPast(paced, target)) paced else target
        case None => pagedEnd(s, rowCap(limit))
      }
    }

    /** The (ts, id) of the last row within `cap` rows past `start` — the
      * poll step of postgres_read_cursor, minus the data read (the data
      * moves in the executors' planInputPartitions range scan).
      */
    private def pagedEnd(s: CdcOffset, cap: Option[Long]): CdcOffset = {
      val where = conf.afterClause(s).map(c => s" WHERE $c").getOrElse("")
      // with no row cap (ReadAllAvailable), the end is simply the backlog
      // tip: ONE max-(ts,id) row via the DESC index probe — an un-LIMITed
      // ascending scan would stream the whole backlog row-by-row through
      // the driver just to keep the final pair
      // both shapes return ONE row: the capped page is wrapped and re-sorted
      // DESC so the database keeps the page and hands back only its tail —
      // the previous ascending stream pulled every (ts, id) pair of the
      // page through the driver per trigger just to keep the last one
      val sql = cap match {
        case Some(c) =>
          val page = s"SELECT ${conf.tsCol}, ${conf.idCol} FROM (${conf.query}) graft_src$where" +
            s" ORDER BY ${conf.tsCol} ASC, ${conf.idCol} ASC" +
            conf.limit(c.min(Int.MaxValue.toLong).toInt)
          s"SELECT ${conf.tsCol}, ${conf.idCol} FROM ($page) graft_page" +
            s" ORDER BY ${conf.tsCol} DESC, ${conf.idCol} DESC${conf.limit(1)}"
        case None =>
          s"SELECT ${conf.tsCol}, ${conf.idCol} FROM (${conf.query}) graft_src$where" +
            s" ORDER BY ${conf.tsCol} DESC, ${conf.idCol} DESC${conf.limit(1)}"
      }
      val conn = conf.connect()
      try {
        val rs = conn.createStatement().executeQuery(sql)
        if (rs.next()) offsetOf(rs) else s
      } finally conn.close()
    }

    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val (s, e) = (start.asInstanceOf[CdcOffset], end.asInstanceOf[CdcOffset])
      if (s == e) Array.empty
      else Array(CdcInputPartition(s, e))
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new CdcReaderFactory(schema, conf)
  }

  final case class CdcInputPartition(start: CdcOffset, end: CdcOffset) extends InputPartition

  final class CdcReaderFactory(schema: StructType, conf: Conf)
      extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[CdcInputPartition]
      new CdcPartitionReader(schema, conf, p.start, p.end)
    }
  }

  /** Executor-side range scan over plain JDBC; values map to Catalyst per
    * the schema the driver inferred through spark.read.jdbc.
    */
  final class CdcPartitionReader(schema: StructType, conf: Conf,
                                 start: CdcOffset, end: CdcOffset)
      extends PartitionReader[InternalRow] {
    private val conn = conf.connect()
    private val rs = {
      // PostgreSQL's driver only honors fetchSize with autoCommit OFF
      // (cursor-based fetch); with the default autoCommit=true the whole
      // range materializes in executor memory — fatal for the uncapped
      // ReadAllAvailable partition that covers the entire backlog
      try conn.setAutoCommit(false) catch { case _: java.sql.SQLException => }
      val st = conn.createStatement()
      st.setFetchSize(1000)
      st.executeQuery(conf.rangeSql(start, end))
    }

    override def next(): Boolean = rs.next()

    override def get(): InternalRow = {
      val vals = new Array[Any](schema.length)
      var i = 0
      while (i < schema.length) {
        val v: Any = schema(i).dataType match {
          case IntegerType => rs.getInt(i + 1)
          case LongType => rs.getLong(i + 1)
          case ShortType => rs.getShort(i + 1)
          case ByteType => rs.getByte(i + 1)
          case BooleanType => rs.getBoolean(i + 1)
          case FloatType => rs.getFloat(i + 1)
          case DoubleType => rs.getDouble(i + 1)
          case StringType => UTF8String.fromString(rs.getString(i + 1))
          case _: TimestampType =>
            val t = rs.getTimestamp(i + 1)
            if (t == null) null else DateTimeUtils.fromJavaTimestamp(t)
          case DateType =>
            val d = rs.getDate(i + 1)
            if (d == null) null else DateTimeUtils.fromJavaDate(d)
          case d: DecimalType =>
            val bd = rs.getBigDecimal(i + 1)
            if (bd == null) null else Decimal(bd, d.precision, d.scale)
          case BinaryType => rs.getBytes(i + 1)
          case other => sys.error(s"graft-cdc: unsupported column type $other")
        }
        vals(i) = if (rs.wasNull()) null else v
        i += 1
      }
      new GenericInternalRow(vals)
    }

    override def close(): Unit = {
      rs.close()
      // end the read-only cursor transaction before close — Derby refuses
      // to close a connection with an open transaction (autoCommit=false)
      try conn.rollback() catch { case _: java.sql.SQLException => }
      conn.close()
    }
  }
}
