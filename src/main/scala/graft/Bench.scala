package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.model.KRecord
import graft.streaming.StatefulOps

/** Headline benchmark: every declared query at `SPARK_GRAFT_SF_DIR`, plus a
  * streaming-throughput section (the analog of the reference examples'
  * self-measured msg/sec, e.g. example2-join.cpp:62-93). Emits ONE JSON
  * line.
  *
  * Bench noise on a shared box is documented at ±50% for single runs, so
  * each query runs `RunsPerQuery` times and the reported number is the
  * fastest (steady-state) run; the JIT/IO warmup cost lands on the earlier
  * runs. A query that fails every run reports -1 and is named in "errors" —
  * a crash must not masquerade as a fast success.
  */
object Bench {

  private val RunsPerQuery = 2

  /** rows/sec through the stateful streaming ops, MemoryStream → noop sink,
    * data staged before start so only execution is timed.
    */
  private def streamingBench(spark: SparkSession): Map[String, Double] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // stateful ops fix their state partition count from this conf at first
    // start; 32 partitions of per-batch state-store overhead dominate a
    // 400k-row micro-batch on one box (measured ~104k → ~170k rows/sec at
    // 8). Production sizes this to the cluster; each bench query uses a
    // fresh temp checkpoint so the override applies cleanly, then restores.
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    def run(n: Int, keys: Int): (Double, Double, Double, Double) = {
      // latestByKey: n upserts over `keys` distinct keys
      val in1 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KRecord[Long, String]]
      in1.addData((0 until n).map(i => KRecord.of((i % keys).toLong, "v" + i, i.toLong)))
      val t0 = System.nanoTime()
      val q1 = StatefulOps.latestByKey(in1.toDS())
        .writeStream.format("noop").outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      q1.awaitTermination()
      val lww = n / ((System.nanoTime() - t0) / 1e9)

      // stream×table left join: 1/4 right changelog entries, 3/4 left probes
      val right = (0 until n / 4).map(i => KRecord.of((i % keys).toLong, i.toLong, i.toLong))
      val left = (0 until n * 3 / 4).map(i => KRecord.of((i % keys).toLong, "e" + i, (n + i).toLong))
      val in2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KRecord[Long, String]]
      val in3 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KRecord[Long, Long]]
      in2.addData(left); in3.addData(right)
      val t1 = System.nanoTime()
      val q2 = StatefulOps.streamTableJoinChangelog(in2.toDS(), in3.toDS(), StatefulOps.LeftJoin)
        .writeStream.format("noop").outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
      val join = n / ((System.nanoTime() - t1) / 1e9)

      // table×table changelog join: updates on both sides of each key
      val in4 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KRecord[Long, String]]
      val in5 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KRecord[Long, Long]]
      in4.addData((0 until n / 2).map(i => KRecord.of((i % keys).toLong, "l" + i, i.toLong)))
      in5.addData((0 until n / 2).map(i => KRecord.of((i % keys).toLong, i.toLong, i.toLong)))
      val t2 = System.nanoTime()
      val q3 = StatefulOps.tableTableJoinChangelog(in4.toDS(), in5.toDS(), StatefulOps.OuterJoin)
        .writeStream.format("noop").outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      q3.awaitTermination()
      val ttJoin = n / ((System.nanoTime() - t2) / 1e9)

      // continuous-ingest exact dedup: 50% duplicate texts within the horizon
      val in6 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String)]
      in6.addData((0 until n).map(i => (i.toLong, i.toLong, "text" + (i % (n / 2)))))
      val t3 = System.nanoTime()
      val q4 = graft.ext.Dedup.exactStream(
          in6.toDF().toDF("doc_id", "ms", "text")
            .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis(
              org.apache.spark.sql.functions.col("ms"))).drop("ms"),
          "text", "ts", "1 hour")
        .writeStream.format("noop").outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q4.awaitTermination()
      val dedup = n / ((System.nanoTime() - t3) / 1e9)
      (lww, join, ttJoin, dedup)
    }

    try {
      run(10000, 1000) // warmup: JIT + state-store init land here
      // same noise stance as the batch queries: two measured runs, best wins
      val (lww1, join1, tt1, dd1) = run(400000, 10000)
      val (lww2, join2, tt2, dd2) = run(400000, 10000)
      Map("latestByKey_rows_per_sec" -> math.max(lww1, lww2),
        "streamTableJoin_rows_per_sec" -> math.max(join1, join2),
        "tableTableJoin_rows_per_sec" -> math.max(tt1, tt2),
        "streamDedup_rows_per_sec" -> math.max(dd1, dd2))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JVM/codegen/parquet-footer costs land here, not on whichever
    // query the Map happens to order first. Touches every table once.
    graft.sources.Tables.all.foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val errors = scala.collection.mutable.LinkedHashSet.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to RunsPerQuery).flatMap { _ =>
        val t0 = System.nanoTime()
        // noop sink materializes every column of every row (count() would let
        // Catalyst prune the projections and flatter the numbers)
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => None }
      }
      // -1 + errors entry = failed EVERY run (never report a crash as a
      // fast success); a single-run hiccup with a surviving run is noise
      if (times.isEmpty) errors += name
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    val streaming =
      try streamingBench(spark)
      catch { case _: Throwable => errors += "streaming_bench"; Map.empty[String, Double] }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val st = streaming.map { case (k, v) => s"\"" + k + "\":" + math.round(v) }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""runs_per_query":$RunsPerQuery,"errors":$errJson,"streaming":$st,"sf":"$sfDir"}""")
    spark.stop()
  }
}
