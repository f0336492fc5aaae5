package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway-style diagnostic for the Bench x18_stages attribution block:
  * times each stage's `Caching.scoped` (driver-side cacheQuery planning)
  * separately from its noop write, so the block's hidden cost is
  * attributable. `runMain graft.tools.StageBlockProbe <sfDir>`.
  */
object StageBlockProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { round =>
      graft.Caching.release(spark)
      spark.catalog.clearCache()
      val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      val t0 = System.nanoTime()
      val stages = graft.ext.CurationPipeline.stageOutputs(
        docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text",
        Some(docs.filter(col("doc_id") % 10 === 7)), graft.Queries.X18Config)
      println(f"round $round stageOutputs build ${(System.nanoTime() - t0) / 1e9}%.2f s")
      stages.foreach { case (stage, df) =>
        val tS = System.nanoTime()
        val cached = graft.Caching.scoped(df)
        val tP = System.nanoTime()
        cached.write.format("noop").mode("overwrite").save()
        val tW = System.nanoTime()
        println(f"round $round stage $stage%-14s scoped ${(tP - tS) / 1e9}%6.2f s  write ${(tW - tP) / 1e9}%6.2f s")
      }
      graft.Caching.release(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
