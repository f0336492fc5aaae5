package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro container-file source/sink (reference: sources/avro_file_source.h:8-47,
  * sinks/avro_file_sink.h:11-107). The S3 variant (sinks/avro_s3_sink.h) is
  * the same writer pointed at an `s3a://` path — Hadoop's S3A committer
  * replaces the reference's hand-rolled multipart upload; it needs
  * hadoop-aws + credentials on the runtime classpath (not present in this
  * container, so exercised with local paths only). The Spark distribution
  * here carries the
  * core avro + avro-mapred jars but not the spark-avro connector, so this
  * maps GenericRecord ↔ Row directly over the Hadoop input/output formats —
  * a per-partition, shuffle-free scan either way. Supported types: the
  * reference's generic_avro surface (null/bool/int/long/float/double/string/
  * bytes, union-with-null, nested records, arrays, string-keyed maps,
  * generic_avro.h:84-104) plus timestamp-micros for Spark TimestampType.
  */
object AvroFiles {

  // ------------------------------------------------------- schema mapping

  def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only union-with-null supported, got $s")
      val (dt, _) = toSparkType(nonNull.head)
      (dt, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT
        if s.getLogicalType != null && s.getLogicalType.getName == "date" =>
      (DateType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.LONG =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "timestamp-micros")
        (TimestampType, false)
      else (LongType, false)
    case Schema.Type.FLOAT  => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES  => (BinaryType, false)
    case Schema.Type.RECORD =>
      val fields = s.getFields.asScala.map { f =>
        val (dt, nullable) = toSparkType(f.schema())
        StructField(f.name(), dt, nullable)
      }
      (StructType(fields.toSeq), false)
    case Schema.Type.ARRAY =>
      val (dt, nullable) = toSparkType(s.getElementType)
      (ArrayType(dt, nullable), false)
    case Schema.Type.MAP =>
      val (dt, nullable) = toSparkType(s.getValueType)
      (MapType(StringType, dt, nullable), false)
    case other => throw new UnsupportedOperationException(s"avro type $other")
  }

  def toAvroSchema(dt: DataType, name: String, nullable: Boolean): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType    => Schema.create(Schema.Type.LONG)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case DateType =>
        // CSV inference (tools/Pipelines.csv2avro) produces DateType for
        // date-like columns; without this mapping the whole tool crashed
        // on any such column
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case st: StructType => toAvroRecord(st, name)
      case ArrayType(et, elemNullable) =>
        Schema.createArray(toAvroSchema(et, name + "_item", elemNullable))
      case MapType(StringType, vt, valNullable) =>
        Schema.createMap(toAvroSchema(vt, name + "_value", valNullable))
      case other => throw new UnsupportedOperationException(s"spark type $other")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  def toAvroRecord(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, toAvroSchema(f.dataType, f.name, f.nullable), null, null)
    }
    Schema.createRecord(name, null, "graft", false, java.util.Arrays.asList(fields: _*))
  }

  // -------------------------------------------------------- value mapping

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _)                  => null
    case (u: CharSequence, StringType) => u.toString
    case (b: ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (l: java.lang.Long, TimestampType) => java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(l / 1000000L, (l % 1000000L) * 1000L))
    case (d: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.longValue()))
    case (r: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.map(f => fromAvroValue(r.get(f.name), f.dataType)).toSeq)
    case (a: java.util.Collection[_], ArrayType(et, _)) =>
      a.asScala.map(fromAvroValue(_, et)).toSeq
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, mv) => k.toString -> fromAvroValue(mv, vt) }.toMap
    case (other, _) => other
  }

  private def toAvroValue(v: Any, dt: DataType, schema: Schema): Any = {
    val s = if (schema.getType == Schema.Type.UNION)
      schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else schema
    (v, dt) match {
      case (null, _)                       => null
      case (t: java.sql.Timestamp, TimestampType) =>
        t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
      // with spark.sql.datetime.java8API.enabled=true, df.rdd hands back
      // java.time values — without these cases they fell through the
      // catch-all into the avro writer's ClassCastException at task runtime
      case (i: java.time.Instant, TimestampType) =>
        i.getEpochSecond * 1000000L + i.getNano / 1000L
      case (d: java.sql.Date, DateType)    => d.toLocalDate.toEpochDay.toInt
      case (d: java.time.LocalDate, DateType) => d.toEpochDay.toInt
      case (b: Array[Byte], BinaryType)    => ByteBuffer.wrap(b)
      case (r: Row, st: StructType)        => rowToRecord(r, st, s)
      case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
        seq.map(toAvroValue(_, et, s.getElementType)).asJava
      case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
        m.map { case (k, mv) => k.toString -> toAvroValue(mv, vt, s.getValueType) }.toMap.asJava
      case (other, _) => other
    }
  }

  def rowToRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, toAvroValue(row.get(i), f.dataType, schema.getField(f.name).schema()))
    }
    rec
  }

  // ----------------------------------------------------------------- read

  /** Read the avro schema from the first container file under `path` —
    * which may be a plain file, a directory (searched two levels deep, so
    * the windowed sink's `window_start=<ms>/part-*.avro` layout reads
    * back), or a GLOB (`path/batch=*` etc. — the layout kafka2avro
    * documents for readers; `getFileStatus` would take the `*` literally
    * and throw FileNotFoundException).
    */
  def readSchema(spark: SparkSession, path: String): Schema = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // up to `depth` levels under a directory; subdirectories NAMED
    // '*.avro' are never candidates (fs.open on one would fail with an
    // unintelligible error instead of the crafted message below)
    def avroFiles(st: org.apache.hadoop.fs.FileStatus, depth: Int): Seq[org.apache.hadoop.fs.Path] =
      if (!st.isDirectory) {
        if (st.getPath.getName.endsWith(".avro")) Seq(st.getPath) else Seq.empty
      } else if (depth == 0) Seq.empty
      else {
        val listed = fs.listStatus(st.getPath) // ONE list per directory
        val direct = listed.filter(s => !s.isDirectory &&
          s.getPath.getName.endsWith(".avro")).map(_.getPath)
        if (direct.nonEmpty) direct.toSeq
        else listed.filter(_.isDirectory).toSeq.flatMap(avroFiles(_, depth - 1))
      }
    // LITERAL resolution first: '[' and '{' are legal filename characters,
    // and routing such a path straight to globStatus would parse them as
    // pattern syntax and match nothing — a file the old code read fine.
    // Only when no literal path exists AND the string carries glob
    // metacharacters is it treated as a pattern.
    val matched: Seq[org.apache.hadoop.fs.FileStatus] =
      try Seq(fs.getFileStatus(hPath))
      catch {
        case e: java.io.FileNotFoundException =>
          if (path.exists("*?[{".contains(_)))
            Option(fs.globStatus(hPath)).map(_.toSeq).getOrElse(Seq.empty)
          else throw e
      }
    val candidates = matched.flatMap {
      case st if st.isDirectory => avroFiles(st, depth = 2)
      case st => Seq(st.getPath)
    }
    require(candidates.nonEmpty,
      s"no .avro container files under $path (searched matched paths " +
        "and two levels of partition subdirectories)")
    val file = candidates.minBy(_.toString)
    val in = fs.open(file)
    try {
      val reader = new org.apache.avro.file.DataFileStream(
        in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try reader.getSchema finally reader.close()
    } finally in.close()
  }

  /** Batch read of avro container files → DataFrame (schema from the
    * files). Recursive listing is enabled for the input format: the
    * windowed sink's own `window_start=<ms>/` layout (and kafka2avro's
    * `batch=<n>/window_start=<ms>/`) must be readable by the library's
    * own read path — with the Hadoop default (non-recursive), first-level
    * subdirectories are listed as zero-length inputs and the avro record
    * reader dies opening a directory.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val schema = readSchema(spark, path)
    val (dt, _) = toSparkType(schema)
    val st = dt.asInstanceOf[StructType]
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.setBoolean("mapreduce.input.fileinputformat.input.dir.recursive", true)
    val rdd = spark.sparkContext
      .newAPIHadoopFile(path, classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable], conf)
      .mapPartitions(_.map { case (k, _) =>
        fromAvroValue(k.datum(), st).asInstanceOf[Row]
      })
    spark.createDataFrame(rdd, st)
  }

  // ---------------------------------------------------------------- write

  /** Write a DataFrame as avro container files under `path` (one file per
    * partition, like any Spark file sink).
    */
  def write(df: DataFrame, path: String, recordName: String = "row"): Unit = {
    val st = df.schema
    val schema = toAvroRecord(st, recordName)
    val schemaJson = schema.toString
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, schema)
    df.rdd.mapPartitions { it =>
      val s = new Schema.Parser().parse(schemaJson)
      it.map(row => (new AvroKey[GenericRecord](rowToRecord(row, st, s)), NullWritable.get()))
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  /** Event-time-windowed avro sink (sinks/avro_file_sink.h:58-96): one
    * directory of container files per event-time window, the same
    * one-file-set-per-window layout the reference's rotation produces.
    *
    * Executes as ONE Spark job regardless of the window count: rows are
    * repartitioned by window (plus a deterministic hash salt when
    * `filesPerWindow` > 1, so a hot window spreads over several tasks),
    * sorted by window within each partition, and
    * [[WindowedAvroKeyOutputFormat]] routes each record into its window's
    * `window_start=<ms>/` subdirectory under the task attempt path — the
    * standard FileOutputCommitter then promotes the subdirectories
    * atomically, so task retries and speculation stay safe. The previous
    * shape (one filtered write job per collected window) serialized ~9k jobs
    * for a year of hour windows; this is a single shuffle + write pass.
    *
    * The in-partition sort exists so the writer holds ONE open file at a
    * time (Spark's own dynamic-partition insert sorts for the same reason):
    * a task whose partition spans thousands of sparse windows would
    * otherwise hold thousands of open streams and exhaust file handles.
    * Repeated runs against the same root appends new windows (and new
    * job-unique files into existing windows), matching the old
    * per-window-directory append behavior.
    */
  def writeWindowed(df: DataFrame, eventTimeCol: String, windowMs: Long, path: String,
                    filesPerWindow: Int = 1): Unit = {
    // withColumn would silently REPLACE a user '__w' in place (keeping the
    // row width), and the positional null-check/getLong below would then
    // index past the end — and the user's data would have been overwritten
    require(!df.columns.contains("__w"),
      "writeWindowed uses internal column '__w' — rename the input column first")
    val st = df.schema
    val schema = toAvroRecord(st, "row")
    val schemaJson = schema.toString
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, schema)
    val withWin = df.withColumn("__w",
      graft.sinks.Sinks.windowStartMs(col(eventTimeCol), windowMs))
    // salt must be deterministic in the row (not partition-id/random): a
    // shuffle-fetch retry recomputes the map side, and nondeterministic
    // routing would duplicate or drop rows. xxhash64 rejects MapType
    // columns (a supported column type here), so the salt hashes only the
    // hashable columns — never empty, since the event-time column itself
    // is always hashable (the belt-and-braces fallback salts on the
    // window, degenerating to filesPerWindow = 1 rather than failing).
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case a: ArrayType => hashable(a.elementType)
      case _ => true
    }
    val saltCols = st.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val salt =
      if (saltCols.nonEmpty) xxhash64(saltCols.toSeq: _*)
      else xxhash64(col("__w"))
    val parts =
      (if (filesPerWindow <= 1) withWin.repartition(col("__w"))
       else withWin.repartition(col("__w"), pmod(salt, lit(filesPerWindow))))
        .sortWithinPartitions(col("__w"))
    val nFields = st.fields.length
    parts.rdd.mapPartitions { it =>
      val s = new Schema.Parser().parse(schemaJson)
      it.map { row =>
        // a NULL event time has no window: fail with the column named
        // BEFORE the unboxing NPE (which would surface as an anonymous
        // executor NullPointerException after the full shuffle ran)
        if (row.isNullAt(nFields)) throw new IllegalArgumentException(
          s"writeWindowed: NULL event time in column '$eventTimeCol' — " +
            "rows need a window; filter NULL timestamps or assign a default")
        (new org.apache.hadoop.io.LongWritable(row.getLong(nFields)),
          new AvroKey[GenericRecord](rowToRecord(Row.fromSeq(row.toSeq.take(nFields)), st, s)))
      }
    }.saveAsNewAPIHadoopFile(path, classOf[org.apache.hadoop.io.LongWritable],
      classOf[AvroKey[GenericRecord]], classOf[WindowedAvroKeyOutputFormat], job.getConfiguration)
  }
}

/** Routes `(windowStartMs, record)` pairs into one avro container file set
  * per `window_start=<ms>/` subdirectory of the task's committer work path.
  * Instantiated reflectively by the Hadoop write path, so it must stay a
  * top-level class with a no-arg constructor.
  *
  * Input arrives sorted by window (writeWindowed sorts within partitions),
  * so only ONE file is open at a time — a window change closes the current
  * writer and opens the next. An out-of-order regression (unsorted caller)
  * still writes correctly: the reopened window gets a `-r<n>` sequence
  * suffix rather than an unbounded writer cache or a create-conflict.
  */
class WindowedAvroKeyOutputFormat
    extends org.apache.hadoop.mapreduce.lib.output.FileOutputFormat[
      org.apache.hadoop.io.LongWritable, AvroKey[GenericRecord]] {
  import org.apache.hadoop.io.LongWritable
  import org.apache.hadoop.mapreduce.{JobContext, RecordWriter, TaskAttemptContext}
  import org.apache.hadoop.mapreduce.lib.output.{FileOutputCommitter, FileOutputFormat}

  /** The default check rejects an existing output root, which would forbid
    * appending a new day's windows to an existing dataset — the per-window
    * append the old per-window writer supported. Files can't collide:
    * names carry the job id (unique per Spark job) and the task id. ONLY
    * the exists-check is dropped: the stock implementation also acquires
    * HDFS delegation tokens at submit time, and skipping that would break
    * this sink on a kerberized cluster (executor tasks would fail creating
    * window files with no token) — kept explicitly.
    */
  override def checkOutputSpecs(ctx: JobContext): Unit = {
    val out = FileOutputFormat.getOutputPath(ctx)
    require(out != null, "output path not set")
    org.apache.hadoop.mapreduce.security.TokenCache.obtainTokensForNamenodes(
      ctx.getCredentials, Array(out), ctx.getConfiguration)
  }

  override def getRecordWriter(ctx: TaskAttemptContext): RecordWriter[LongWritable, AvroKey[GenericRecord]] = {
    val conf = ctx.getConfiguration
    val schema = AvroJob.getOutputKeySchema(conf)
    val workPath = getOutputCommitter(ctx).asInstanceOf[FileOutputCommitter].getWorkPath
    // job-unique + task-unique: repeated writeWindowed runs against the same
    // root merge into existing window dirs without name conflicts
    val taskId = ctx.getTaskAttemptID.getTaskID
    val fileName = s"part-${taskId.getJobID.getJtIdentifier}-${"%05d".format(taskId.getId)}"
    new RecordWriter[LongWritable, AvroKey[GenericRecord]] {
      private var current: Long = Long.MinValue
      private var writer: org.apache.avro.file.DataFileWriter[GenericRecord] = null
      private val opened = scala.collection.mutable.Map.empty[Long, Int]

      private def open(w: Long): Unit = {
        val seq = opened.getOrElse(w, 0)
        opened(w) = seq + 1
        val suffix = if (seq == 0) ".avro" else s"-r$seq.avro"
        val file = new org.apache.hadoop.fs.Path(workPath, s"window_start=$w/$fileName$suffix")
        val out = file.getFileSystem(conf).create(file, false)
        writer = new org.apache.avro.file.DataFileWriter[GenericRecord](
          new org.apache.avro.generic.GenericDatumWriter[GenericRecord](schema))
          .create(schema, out)
        current = w
      }

      override def write(key: LongWritable, value: AvroKey[GenericRecord]): Unit = {
        if (writer == null || key.get != current) {
          if (writer != null) writer.close()
          open(key.get)
        }
        writer.append(value.datum())
      }

      override def close(ctx: TaskAttemptContext): Unit =
        if (writer != null) writer.close()
    }
  }
}
