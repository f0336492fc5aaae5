package graft

/** Throwaway probe (deleted before round end): warm per-query timing. */
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = GraftSession.local("probe-q")
    try {
      names.foreach { n =>
        (1 to 3).foreach { run =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir)
            .write.mode("overwrite").parquet(s"$outDir/$n")
          println(f"PROBE $n run$run ${(System.nanoTime() - t0) / 1e9}%.2f s")
          graft.Caching.release(spark)
        }
      }
    } finally spark.stop()
  }
}
