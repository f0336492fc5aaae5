package graft.tools

/** Stage attribution for the exact-Jaccard pair path (x02's shape): times
  * each subtree of `Dedup.jaccardPairs(Dedup.wordShingles(docs))` to a noop
  * materialization under the bench's session, so a slow x02 names a stage
  * (shingle scan / df-cap aggregate / capped-table build / sizes aggregate /
  * the pair self-join) instead of "the query". The stages nest (each later
  * one contains the earlier), so the marginal cost of a stage is the delta
  * to its predecessor; the scoped caches make the deltas meaningful.
  *
  * Usage: `sbt "runMain graft.tools.JaccardProbe <sfDir> [runs]"`
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"JPROBE $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    (1 to runs).foreach { r =>
      graft.Caching.release(spark)
      spark.catalog.clearCache()
      println(s"--- run $r")
      val sh = graft.Caching.scoped(
        graft.ext.Dedup.wordShingles(docs, "doc_id", "text", 3))
      timed("shingles+cache")(noop(sh))
      val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") > graft.Queries.JaccardDfCap).select("shingle")
      timed("df_cap_agg")(noop(hot))
      val filtered = graft.Caching.scoped(
        sh.join(hot, Seq("shingle"), "left_anti").select("id", "shingle"))
      timed("capped+cache")(noop(filtered))
      timed("sizes_agg")(noop(
        filtered.groupBy(col("id")).agg(count(lit(1)).as("n"))))
      timed("full_pairs")(noop(graft.ext.Dedup.jaccardPairs(
        graft.ext.Dedup.wordShingles(docs, "doc_id", "text", 3), 0.5,
        maxShingleDf = Some(graft.Queries.JaccardDfCap))))
      graft.Caching.release(spark)
    }
    spark.stop()
  }
}
