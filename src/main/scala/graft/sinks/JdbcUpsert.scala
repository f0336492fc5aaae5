package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** Batched JDBC upsert/delete sink, the reference's postgres sink semantics
  * (reference: libraries/kspp-pg/postgres_producer.cpp:205-277):
  *
  *  - live records → `INSERT ... ON CONFLICT (keys) DO UPDATE SET
  *    col = EXCLUDED.col, ...`;
  *  - tombstones → `DELETE FROM t WHERE keys = ...`;
  *  - per-key ordering of upserts vs deletes is preserved: rows are
  *    co-located per key and sorted by the changelog ordering columns, and
  *    execution switches statement kind in row order — the same guarantee
  *    the reference gets from its single ordered stream.
  *
  * Execution is per-partition with JDBC `PreparedStatement` batches — one
  * connection per partition, values bound (never string-spliced), bounded
  * chunks so nothing buffers a whole partition. The literal-SQL planner
  * ([[planStatements]]) remains for engines without prepared statements and
  * mirrors the reference's multi-row VALUES batching, including its
  * split-when-a-key-repeats rule (postgres rejects `ON CONFLICT DO UPDATE`
  * affecting one row twice in a single statement,
  * postgres_producer.cpp:210-232).
  *
  * Use from `foreachBatch`: idempotent upserts make at-least-once delivery
  * exactly-once-effective, the same argument the reference's commit chain
  * relies on.
  */
object JdbcUpsert {

  private def sqlLit(v: Any): String = v match {
    case null                  => "NULL"
    case s: String             => "'" + s.replace("'", "''") + "'"
    case t: java.sql.Timestamp => "'" + t.toString + "'"
    case d: java.sql.Date      => "'" + d.toString + "'"
    case b: Array[Byte]        => "'\\x" + b.map("%02x".format(_)).mkString + "'"
    case other                 => other.toString
  }

  def upsertStatement(table: String, columns: Seq[String], keyColumns: Seq[String],
                      rows: Seq[Seq[Any]]): String = {
    val values = rows.map(r => r.map(sqlLit).mkString("(", ", ", ")")).mkString(",\n")
    val updates = columns.filterNot(keyColumns.contains)
      .map(c => s"$c = EXCLUDED.$c").mkString(", ")
    val action = if (updates.isEmpty) "DO NOTHING" else s"DO UPDATE SET $updates"
    s"INSERT INTO $table (${columns.mkString(", ")}) VALUES\n$values\n" +
      s"ON CONFLICT (${keyColumns.mkString(", ")}) $action"
  }

  def deleteStatement(table: String, keyColumns: Seq[String], keys: Seq[Seq[Any]]): String = {
    val preds = keys.map(k =>
      keyColumns.zip(k).map { case (c, v) => s"$c = ${sqlLit(v)}" }.mkString("(", " AND ", ")"))
    s"DELETE FROM $table WHERE ${preds.mkString(" OR ")}"
  }

  /** Order-preserving literal-SQL batch plan: consecutive runs of upserts
    * (split whenever a key repeats within the statement) and deletes.
    */
  def planStatements(table: String, columns: Seq[String], keyColumns: Seq[String],
                     rows: Seq[(Seq[Any], Boolean)], maxBatch: Int = 1000): Seq[String] = {
    val out = Vector.newBuilder[String]
    var upserts = Vector.empty[Seq[Any]]
    var seenKeys = Set.empty[Seq[Any]]
    var deletes = Vector.empty[Seq[Any]]
    val keyIdx = keyColumns.map(columns.indexOf)
    def flushUpserts(): Unit = {
      if (upserts.nonEmpty) out += upsertStatement(table, columns, keyColumns, upserts)
      upserts = Vector.empty; seenKeys = Set.empty
    }
    def flushDeletes(): Unit = {
      if (deletes.nonEmpty) out += deleteStatement(table, keyColumns, deletes)
      deletes = Vector.empty
    }
    rows.foreach { case (row, isTombstone) =>
      val key = keyIdx.map(row)
      requireKeyNonNull(key, keyColumns)
      if (isTombstone) {
        flushUpserts()
        deletes :+= key
        if (deletes.size >= maxBatch) flushDeletes()
      } else {
        flushDeletes()
        if (seenKeys.contains(key) || upserts.size >= maxBatch) flushUpserts()
        seenKeys += key
        upserts :+= row
      }
    }
    flushUpserts(); flushDeletes()
    out.result()
  }

  /** The MqttSink/ElasticsearchSink null-key stance, enforced on BOTH the
    * planner and prepared-statement paths: a NULL key silently corrupts
    * rather than erroring — `k = NULL` never matches (the delete no-ops),
    * and conflict targets treat NULLs as distinct (every retry INSERTS a
    * fresh duplicate row), breaking the idempotent-retry argument the
    * "at-least-once + idempotent = exactly-once" contract relies on.
    */
  private[graft] def requireKeyNonNull(key: Seq[Any], keyColumns: Seq[String]): Unit =
    key.zip(keyColumns).foreach { case (v, kc) =>
      if (v == null) throw new IllegalArgumentException(
        s"jdbc upsert: NULL key column '$kc' — a NULL key can neither " +
          "match a DELETE nor hit ON CONFLICT; filter or default NULL " +
          "keys upstream")
    }

  /** Parameterized SQL for the prepared-statement path. */
  def preparedUpsertSql(table: String, columns: Seq[String], keyColumns: Seq[String]): String = {
    val updates = columns.filterNot(keyColumns.contains)
      .map(c => s"$c = EXCLUDED.$c").mkString(", ")
    val action = if (updates.isEmpty) "DO NOTHING" else s"DO UPDATE SET $updates"
    s"INSERT INTO $table (${columns.mkString(", ")}) VALUES " +
      columns.map(_ => "?").mkString("(", ", ", ")") +
      s" ON CONFLICT (${keyColumns.mkString(", ")}) $action"
  }

  def preparedDeleteSql(table: String, keyColumns: Seq[String]): String =
    s"DELETE FROM $table WHERE " + keyColumns.map(c => s"$c = ?").mkString(" AND ")

  /** Execute a micro-batch. `tombstoneCol` null in a row marks a delete of
    * that row's key. `orderCols` is the changelog ordering (e.g. event time +
    * tie-break) and is REQUIRED to be non-empty: a Spark DataFrame carries no
    * row order, so without an explicit ordering a same-key upsert-then-delete
    * pair could land in different partitions' parallel transactions and apply
    * backwards. Rows are shuffled so each key lives in one partition and its
    * rows execute in changelog order — cross-key order is irrelevant, same as
    * the reference's per-partition producers. Statements are JDBC batches of
    * at most `maxBatch` bound rows, flushed on every upsert↔delete switch;
    * the whole partition runs in one transaction (at-least-once + idempotent
    * upserts ⇒ effectively exactly-once).
    */
  def write(batch: DataFrame, jdbcUrl: String, props: java.util.Properties,
            table: String, keyColumns: Seq[String], tombstoneCol: Option[String],
            orderCols: Seq[String], maxBatch: Int = 1000): Unit = {
    require(orderCols.nonEmpty,
      "orderCols must define the changelog order; a DataFrame has no inherent row order")
    val columns = batch.schema.fieldNames.toSeq
    val tombIdx = tombstoneCol.map(batch.schema.fieldIndex)
    val keyIdx = keyColumns.map(batch.schema.fieldIndex)
    val upsertSql = preparedUpsertSql(table, columns, keyColumns)
    val deleteSql = preparedDeleteSql(table, keyColumns)
    val nCols = columns.size
    val ordered = batch.repartition(keyColumns.map(col): _*)
      .sortWithinPartitions((keyColumns ++ orderCols).map(col): _*)
    ordered.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val conn = java.sql.DriverManager.getConnection(jdbcUrl, props)
        try {
          conn.setAutoCommit(false)
          val upsertPs = conn.prepareStatement(upsertSql)
          val deletePs = conn.prepareStatement(deleteSql)
          var pending = 0 // rows queued on `current`
          var current: java.sql.PreparedStatement = null
          def flush(): Unit = if (pending > 0) { current.executeBatch(); pending = 0 }
          it.foreach { r =>
            requireKeyNonNull(keyIdx.map(r.get), keyColumns)
            val isTombstone = tombIdx.exists(i => r.isNullAt(i))
            val ps = if (isTombstone) deletePs else upsertPs
            if (current != null && (ps ne current)) flush() // preserve upsert↔delete order
            current = ps
            if (isTombstone) {
              keyIdx.zipWithIndex.foreach { case (ki, i) => ps.setObject(i + 1, r.get(ki)) }
            } else {
              var i = 0
              while (i < nCols) { ps.setObject(i + 1, r.get(i)); i += 1 }
            }
            ps.addBatch()
            pending += 1
            if (pending >= maxBatch) flush()
          }
          flush()
          conn.commit()
        } finally conn.close()
      }
    }
  }
}
