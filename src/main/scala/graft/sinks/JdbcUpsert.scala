package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** Batched JDBC upsert/delete sink, the reference's postgres sink semantics
  * (reference: libraries/kspp-pg/postgres_producer.cpp:205-277):
  *
  *  - live records → `INSERT ... ON CONFLICT (keys) DO UPDATE SET
  *    col = EXCLUDED.col, ...`;
  *  - tombstones → `DELETE FROM t WHERE (k = v [AND ...]) OR ...`;
  *  - a batch is split whenever it would touch the same key twice or switch
  *    between upsert and delete — postgres rejects `ON CONFLICT DO UPDATE`
  *    affecting one row twice (postgres_producer.cpp:210-232).
  *
  * Use from `foreachBatch`: `df.writeStream.foreachBatch { (batch, _) =>
  * JdbcUpsert.write(batch, conn, table, keys, tombstoneCol) }` — idempotent
  * upserts make the at-least-once delivery exactly-once-effective, the same
  * argument the reference's commit chain relies on.
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

  /** Order-preserving batch plan: consecutive runs of upserts (split on
    * repeated keys) and deletes.
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

  /** Execute a micro-batch against a JDBC connection. `tombstoneCol == null`
    * in a row marks a delete of that row's key.
    */
  def write(batch: DataFrame, jdbcUrl: String, props: java.util.Properties,
            table: String, keyColumns: Seq[String], tombstoneCol: Option[String]): Unit = {
    val columns = batch.schema.fieldNames.toSeq
    val tombIdx = tombstoneCol.map(batch.schema.fieldIndex)
    batch.coalesce(1).foreachPartition { (it: Iterator[Row]) =>
      val rows = it.map { r =>
        (r.toSeq, tombIdx.exists(i => r.isNullAt(i)))
      }.toSeq
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(jdbcUrl, props)
        try planStatements(table, columns, keyColumns, rows).foreach { sql =>
          val st = conn.createStatement(); try st.execute(sql) finally st.close()
        } finally conn.close()
      }
    }
  }
}
