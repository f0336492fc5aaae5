package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.KRecord
import graft.streaming.StatefulOps

/** One-off diagnostic for the BENCH_r04 → r05 tableTableJoin throughput
  * drop (141k → 68k rows/s): runs the same join under each combination of
  * {MemoryStream, file-stream} × {8, 32 shuffle partitions} to attribute
  * the drop to a protocol variable. Not part of the bench protocol.
  */
object StreamBenchProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val n = 400000
    val keys = 10000
    val stageRoot = Files.createTempDirectory("graft-probe")

    def mkRows(side: String) = spark.range(0, n / 2)
      .select((col("id") % keys).as("key"),
        (if (side == "l") concat(lit("l"), col("id")) else col("id").cast("string")).as("value"),
        col("id").as("eventTime"))

    // file-stream variant (the r5 staging)
    def fileStreams(): (Dataset[KRecord[Long, String]], Dataset[KRecord[Long, String]]) = {
      val lp = stageRoot.resolve("l").toString
      val rp = stageRoot.resolve("r").toString
      mkRows("l").write.mode("overwrite").parquet(lp)
      mkRows("r").write.mode("overwrite").parquet(rp)
      (spark.readStream.schema(mkRows("l").schema).parquet(lp).as[KRecord[Long, String]],
        spark.readStream.schema(mkRows("r").schema).parquet(rp).as[KRecord[Long, String]])
    }

    // MemoryStream variant (the r3/r4 staging)
    def memStreams(): (Dataset[KRecord[Long, String]], Dataset[KRecord[Long, String]]) = {
      val l = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KRecord[Long, String]]
      val r = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KRecord[Long, String]]
      l.addData(mkRows("l").as[KRecord[Long, String]].collect())
      r.addData(mkRows("r").as[KRecord[Long, String]].collect())
      (l.toDS(), r.toDS())
    }

    def run(tag: String, parts: Int, mem: Boolean): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val (l, r) = if (mem) memStreams() else fileStreams()
      val t0 = System.nanoTime()
      val q = StatefulOps.tableTableJoinChangelog(l, r, StatefulOps.OuterJoin)
        .writeStream.format("noop").outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rate = n / ((System.nanoTime() - t0) / 1e9)
      println(f"PROBE $tag%-28s ${rate / 1000}%8.1fk rows/s")
      rate
    }

    // warmup (JIT + state store init)
    run("warmup", 8, mem = false)
    for (_ <- 1 to 2) {
      run("file-stream parts=8", 8, mem = false)
      run("file-stream parts=32", 32, mem = false)
      run("memory-stream parts=8", 8, mem = true)
      run("memory-stream parts=32", 32, mem = true)
    }

    // --- Bench-sequence replication: the r5 harness runs latestByKey,
    // streamTableJoin, tableTableJoin, dedup back-to-back per run; check
    // whether tableTable degrades only in that sequence
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    def stageK(name: String, df: org.apache.spark.sql.DataFrame) = {
      val p = stageRoot.resolve(name).toString
      df.write.mode("overwrite").parquet(p)
      spark.readStream.schema(df.schema).parquet(p)
    }
    val lww = stageK("lww", spark.range(0, n).select((col("id") % keys).as("key"),
      concat(lit("v"), col("id")).as("value"), col("id").as("eventTime")))
      .as[KRecord[Long, String]]
    val jl = stageK("jl", spark.range(0, n * 3L / 4).select((col("id") % keys).as("key"),
      concat(lit("e"), col("id")).as("value"), (col("id") + n).as("eventTime")))
      .as[KRecord[Long, String]]
    val jr = stageK("jr", spark.range(0, n / 4).select((col("id") % keys).as("key"),
      col("id").as("value"), col("id").as("eventTime")))
      .as[KRecord[Long, Long]]
    val ttl = stageK("ttl", spark.range(0, n / 2).select((col("id") % keys).as("key"),
      concat(lit("l"), col("id")).as("value"), col("id").as("eventTime")))
      .as[KRecord[Long, String]]
    val ttr = stageK("ttr", spark.range(0, n / 2).select((col("id") % keys).as("key"),
      col("id").as("value"), col("id").as("eventTime")))
      .as[KRecord[Long, Long]]
    val ded = stageK("ded", spark.range(0, n).select(col("id").as("doc_id"),
      timestamp_millis(col("id")).as("ts"),
      concat(lit("text"), col("id") % (n / 2)).as("text")))

    def time(label: String)(q: => org.apache.spark.sql.streaming.StreamingQuery): Double = {
      val t0 = System.nanoTime()
      val qq = q
      qq.awaitTermination()
      val rate = n / ((System.nanoTime() - t0) / 1e9)
      println(f"PROBE seq $label%-24s ${rate / 1000}%8.1fk rows/s")
      rate
    }
    for (i <- 1 to 3) {
      println(s"PROBE sequence run $i")
      time("latestByKey")(StatefulOps.latestByKey(lww)
        .writeStream.format("noop").outputMode("update").trigger(Trigger.AvailableNow()).start())
      time("streamTableJoin")(StatefulOps.streamTableJoinChangelog(jl, jr, StatefulOps.LeftJoin)
        .writeStream.format("noop").outputMode("update").trigger(Trigger.AvailableNow()).start())
      time("tableTableJoin")(StatefulOps.tableTableJoinChangelog(ttl, ttr, StatefulOps.OuterJoin)
        .writeStream.format("noop").outputMode("update").trigger(Trigger.AvailableNow()).start())
      time("streamDedup")(graft.ext.Dedup.exactStream(ded, "text", "ts", "1 hour")
        .writeStream.format("noop").outputMode("append").trigger(Trigger.AvailableNow()).start())
    }
    spark.stop()
  }
}
