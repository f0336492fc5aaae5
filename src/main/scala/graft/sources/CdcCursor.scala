package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental JDBC CDC, the reference's polling-cursor pattern
  * (reference: libraries/kspp-pg/postgres_read_cursor.cpp:77-95,
  * postgres_consumer.cpp:240-242; same shape for SQL Server in kspp-tds).
  *
  * The cursor tracks the last-seen `(ts, id)` pair and generates the exact
  * WHERE clause family of the reference, including the equal-timestamp
  * tie-break and the eof rescrape window:
  *
  *  - both columns:  `WHERE (ts = last_ts AND id > last_id) OR (ts > last_ts)`
  *  - ts only:       `WHERE ts >= last_ts`
  *  - id only:       `WHERE id > last_id`
  *  - rescrape@eof:  `WHERE ts >= last_ts - rescrape_ticks`
  *
  * always suffixed `ORDER BY ts ASC, id ASC` + `LIMIT maxItems` so pagination
  * is total-ordered and restartable.
  */
object CdcCursor {

  /** SQL string-literal escaping for cursor values — a quote in a ts/id
    * value must not break (or inject into) the generated WHERE clause.
    */
  def lit(v: String): String = "'" + v.replace("'", "''") + "'"

  /** Start-exclusive cursor bound: postgres_read_cursor's equal-ts
    * tie-break (verbatim text, no outer parens), shared by the batch Spec
    * and the V2 streaming source.
    */
  def afterClause(tsCol: String, idCol: String, ts: String, id: String): String =
    s"($tsCol = ${lit(ts)} AND $idCol > ${lit(id)}) OR ($tsCol > ${lit(ts)})"

  /** End-inclusive mirror bound, so (start, end] ranges are total. */
  def upToClause(tsCol: String, idCol: String, ts: String, id: String): String =
    s"($tsCol = ${lit(ts)} AND $idCol <= ${lit(id)}) OR ($tsCol < ${lit(ts)})"

  sealed trait RescrapePolicy
  case object RescrapeOff extends RescrapePolicy
  /** Re-read everything within `rescrapeTicks` of the last timestamp when a
    * poll hits eof (connect/connection_params.h:31-41).
    */
  final case class RescrapeLastQueryTs(rescrapeTicks: Long) extends RescrapePolicy

  final case class State(lastTs: Option[String], lastId: Option[String], atEof: Boolean)

  final case class Spec(
      query: String, // base SELECT or table name
      tsColumn: Option[String],
      idColumn: Option[String],
      maxItemsPerFetch: Int = 10000,
      rescrape: RescrapePolicy = RescrapeOff,
      // dialect hook: postgres/mysql take LIMIT, Derby/SQL Server spell it
      // FETCH FIRST n ROWS ONLY (the reference's kspp-tds uses TOP)
      limitClause: Int => String = n => s" LIMIT $n") {

    def orderBy: String = (tsColumn, idColumn) match {
      case (Some(ts), Some(id)) => s" ORDER BY $ts ASC, $id ASC"
      case (Some(ts), None)     => s" ORDER BY $ts ASC"
      case (None, Some(id))     => s" ORDER BY $id ASC"
      case _                    => ""
    }

    /** postgres_read_cursor::get_where_clause, verbatim semantics. */
    def whereClause(s: State): String = {
      (rescrape, s.atEof, s.lastTs, tsColumn) match {
        case (RescrapeLastQueryTs(ticks), true, Some(ts), Some(tsCol)) if ts.nonEmpty =>
          // the ts-minus-ticks arithmetic needs a NUMERIC ts column; a SQL
          // timestamp string would otherwise throw a bare
          // NumberFormatException at the first eof poll — late and
          // data-dependent. Name the misconfiguration instead.
          val tsNum = try ts.toLong catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"CdcCursor: RescrapeLastQueryTs requires a numeric ts column; " +
                s"'$tsCol' produced '$ts' — use a numeric tick column or drop rescrape")
          }
          return s" WHERE $tsCol >= '${tsNum - ticks}'$orderBy"
        case _ =>
      }
      (s.lastTs.filter(_.nonEmpty), s.lastId.filter(_.nonEmpty)) match {
        case (Some(ts), Some(id)) =>
          s" WHERE ${afterClause(tsColumn.get, idColumn.get, ts, id)}$orderBy"
        case (Some(ts), None) => s" WHERE ${tsColumn.get} >= ${lit(ts)}$orderBy"
        case (None, Some(id)) => s" WHERE ${idColumn.get} > ${lit(id)}$orderBy"
        case _                => orderBy
      }
    }

    def pollSql(s: State): String =
      s"SELECT * FROM ($query) graft_src${whereClause(s)}${limitClause(maxItemsPerFetch)}"
  }

  /** Durable cursor storage, the reference's `offset_storage_provider`
    * (utils/offset_storage_provider.h:9-71) applied to the CDC cursor:
    * pluggable backends behind one load/commit contract. The reference's
    * pure-int64 provider surface (file/S3/null + URI factory, buffered
    * commits) lives in [[graft.connect.OffsetStorage]]; these stores keep
    * the richer (ts, id, eof) cursor the (ts,id)-keyed rescrape needs.
    */
  trait CursorStore {
    def load(): State
    def commit(s: State): Unit
  }

  /** File backend ([[CursorStore]] over any Hadoop filesystem — an
    * `s3a://` path works the same way). Commit is atomic (write temp +
    * rename) so a crash mid-commit replays the previous page instead of
    * losing the cursor — the same at-least-once stance as the reference's
    * commit chain.
    */
  final class FileOffsetStore(spark: SparkSession, path: String) extends CursorStore {
    private val hPath = new org.apache.hadoop.fs.Path(path)
    private val tmpPath = new org.apache.hadoop.fs.Path(path + ".tmp")
    private val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def readIfExists(p: org.apache.hadoop.fs.Path): Option[String] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        Some(try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close())
      }

    /** Reads the committed cursor. If the main file is missing but the temp
      * file exists, the process died between delete and rename — the temp
      * file holds the complete newer state (it is fully written and closed
      * before the delete), so recovery promotes it to the main path and
      * reads that. The third line persists the eof flag so a configured
      * rescrape window applies across restarts.
      */
    def load(): State = {
      // crash between delete and rename: promote the complete temp file to
      // the main path first, so the recovered cursor is durable before the
      // next commit truncates the temp file again. A FAILED promotion must
      // throw, not fall through: readIfExists(hPath) would answer None and
      // the job would silently rewind to the beginning — and the next
      // commit then truncates tmpPath, destroying the only newer cursor
      // (the S3ObjectClient.get transient-error stance).
      if (!fs.exists(hPath) && fs.exists(tmpPath) && !fs.rename(tmpPath, hPath))
        sys.error(s"offset recovery rename failed: $path — refusing to " +
          "silently restart from the beginning; fix filesystem permissions " +
          "or promote the .tmp file manually")
      readIfExists(hPath).map(decodeState).getOrElse(State(None, None, atEof = false))
    }

    def commit(s: State): Unit = {
      val out = fs.create(tmpPath, true)
      try out.write(encodeState(s))
      finally out.close()
      fs.delete(hPath, false)
      if (!fs.rename(tmpPath, hPath)) sys.error(s"offset commit rename failed: $path")
    }
  }

  /** S3 backend: the same 3-line text cursor as [[FileOffsetStore]], one
    * object via the SigV4-signed
    * [[graft.connect.OffsetStorage.S3ObjectClient]] — the reference's
    * s3_offset_storage pattern (features/aws/s3_offset_storage_provider.h)
    * applied to the CDC cursor. An S3 PUT replaces the whole object
    * atomically, so no temp/rename dance is needed; a failed commit throws,
    * and the retained previous cursor replays the page (at-least-once).
    */
  final class S3CursorStore(client: graft.connect.OffsetStorage.S3ObjectClient)
      extends CursorStore {
    def load(): State =
      client.get(None).map(b => decodeState(new String(b, "UTF-8")))
        .getOrElse(State(None, None, atEof = false))

    def commit(s: State): Unit =
      if (!client.put(encodeState(s))) sys.error("cursor commit PUT to s3 failed")
  }

  /** ONE copy of the 3-line cursor wire format (ts \n id \n eof-flag) for
    * every [[CursorStore]] backend — a format change applied to one store
    * must not silently strand cursors written by the other.
    */
  private[sources] def encodeState(s: State): Array[Byte] =
    (s.lastTs.getOrElse("") + "\n" + s.lastId.getOrElse("") +
      "\n" + (if (s.atEof) "1" else "0")).getBytes("UTF-8")

  private[sources] def decodeState(txt: String): State =
    txt.split("\n", -1).toList match {
      case ts :: id :: rest =>
        State(Some(ts).filter(_.nonEmpty), Some(id).filter(_.nonEmpty),
          atEof = rest.headOption.contains("1"))
      case _ => State(None, None, atEof = false)
    }

  /** Drain everything currently available: poll until eof, handing each page
    * to `sink` and committing the cursor after the page's effects are
    * durable (sink first, then commit — at-least-once, like the reference's
    * commit chain ordering). Returns the number of rows seen.
    */
  def drain(spark: SparkSession, jdbcUrl: String, props: java.util.Properties,
            spec: Spec, store: CursorStore)(sink: DataFrame => Unit): Long = {
    var state = store.load()
    var rows = 0L
    var continue = true
    // always poll at least once: a stored atEof=true state must still run
    // one poll so a configured rescrape window (which only applies at eof,
    // postgres_read_cursor semantics) actually re-reads late arrivals
    while (continue) {
      val (df, next) = poll(spark, jdbcUrl, props, spec, state)
      val n = df.count()
      if (n > 0) {
        sink(df)
        store.commit(next)
      }
      rows += n
      // a ts-only cursor cannot advance past an equal-ts run of a full
      // page (`ts >= last` re-reads it verbatim) — fail loudly instead of
      // re-delivering the same page forever. A rescrape-at-eof poll
      // (state.atEof) legitimately re-reads a window ending at the stored
      // cursor, so the guard only applies to normal forward polls.
      if (!state.atEof && n == spec.maxItemsPerFetch &&
          next.lastTs == state.lastTs && next.lastId == state.lastId)
        throw new IllegalStateException(
          s"CDC cursor stuck: a full page of ${spec.maxItemsPerFetch} rows shares one cursor " +
            "position; configure idColumn (equal-ts tie-break) or raise maxItemsPerFetch")
      continue = !next.atEof
      state = next
      // persist the final eof flag (for the next drain's rescrape) only if
      // the last poll didn't already commit it with its page
      if (!continue && n == 0) store.commit(state)
    }
    rows
  }

  /** One poll step: fetch the next page through Spark's JDBC source (schema
    * inferred from the result set, the analog of the reference's
    * runtime-avro schema discovery), and advance the cursor from the page's
    * last row. The page is read from JDBC exactly once — the returned
    * DataFrame wraps the already-collected rows (a page is bounded by
    * `maxItemsPerFetch`), so consuming it cannot re-run the query and see
    * different rows than the cursor advanced past. Drive it from a loop or a
    * foreachBatch trigger; persist `State` in the checkpoint/offset store
    * for restart (utils/offset_storage_provider.h semantics → checkpointed
    * here).
    */
  def poll(spark: SparkSession, jdbcUrl: String, props: java.util.Properties,
           spec: Spec, state: State): (DataFrame, State) = {
    val page = spark.read.jdbc(jdbcUrl, s"(${spec.pollSql(state)}) graft_page", props)
    val rows = page.collect()
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), page.schema)
    if (rows.isEmpty) (df, state.copy(atEof = true))
    else {
      val last = rows.last
      // case-insensitive: engines fold unquoted identifiers differently
      // (postgres lowers, Derby/Oracle upper)
      def idx(c: String): Int = {
        val i = page.schema.fieldNames.indexWhere(_.equalsIgnoreCase(c))
        require(i >= 0, s"cursor column $c not in result set ${page.schema.fieldNames.mkString(",")}")
        i
      }
      // a NULL at the page tail would NPE here (and NULLs sort to a page
      // edge in every dialect, so one NULL row becomes a permanent poison
      // record: every run re-reads the same page and crashes) — name the
      // column and the remediation instead
      def cursorVal(c: String): String = {
        val v = last.get(idx(c))
        if (v == null) throw new IllegalStateException(
          s"cdc cursor: NULL in cursor column '$c' — (ts, id) cursor " +
            "columns must be non-null; exclude NULL rows in the query or " +
            "backfill the column")
        v.toString
      }
      val newTs = spec.tsColumn.map(cursorVal).orElse(state.lastTs)
      val newId = spec.idColumn.map(cursorVal).orElse(state.lastId)
      (df, State(newTs, newId, atEof = rows.length < spec.maxItemsPerFetch))
    }
  }
}
