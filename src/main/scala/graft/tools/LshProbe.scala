package graft.tools

import org.apache.spark.sql.functions._

/** Perf-attribution probe for the MinHash-LSH kernel (the shared subtree of
  * x02/x03/x13/x25/x30/x39/x42/x45/x70/x71/x72 — the bench's single most
  * expensive family): times each stage of [[graft.ext.Dedup.minHashLsh]]
  * in materialization order so a regression (or an optimization target)
  * names a stage, not "the LSH". `runMain graft.tools.LshProbe <sfDir>`.
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  LSHPROBE $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { round =>
      graft.Caching.release(spark)
      spark.catalog.clearCache()
      println(s"ROUND $round")
      val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      val t0 = System.nanoTime()
      // stage 1: tokenize + explode + distinct (wordShingles)
      val shingles = graft.ext.Dedup.wordShingles(docs, "doc_id", "text", 3)
      val cached = graft.Caching.scoped(shingles)
      time("shingles_distinct")(noop(cached))
      // stage 2: incremental MinHash signature bands
      val bands = graft.Caching.scoped(
        graft.ext.Dedup.signatureBands(cached, 64, 2))
      time("signature_bands")(noop(bands))
      // stage 3: banded candidate self-join
      val cand = bands.toDF("d1", "band", "band_key")
        .join(bands.toDF("d2", "band", "band_key"), Seq("band", "band_key"))
        .filter(col("d1") < col("d2"))
        .select("d1", "d2").distinct()
      val candC = graft.Caching.scoped(cand)
      time("candidates")(noop(candC))
      // stage 4: exact-Jaccard verify (the full minHashLsh, reusing caches)
      val pairs = graft.ext.Dedup.minHashLsh(cached, 0.5)
      time("full_minhash_lsh")(noop(pairs))
      println(f"  LSHPROBE total                 ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    graft.Caching.release(spark)
    spark.stop()
  }
}
