package graft.tools

/** THROWAWAY-grade driver-side profiler for the curation pipeline's plan
  * CONSTRUCTION cost (guide §7.3: when nothing runs, sample the driver).
  * Builds `CurationPipeline.stageOutputs` for x18's config twice (the
  * second build is the JIT-warm measurement) while a watcher thread
  * samples the main thread's stack every 10 ms; prints the hottest frames
  * by inclusive sample count, grouped by the deepest "interesting"
  * Catalyst phase frame (analysis / optimization / physical planning /
  * canonicalization / cache lookup / constraint propagation).
  *
  * Usage: `sbt "runMain graft.tools.BuildProfile <sfDir>"`
  */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")

    def buildOnce(): Unit = {
      graft.Caching.release(spark)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val stages = graft.ext.CurationPipeline.stageOutputs(
        docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text",
        Some(docs.filter(col("doc_id") % 10 === 7)), graft.Queries.X18Config)
      println(f"BUILD ${stages.length} stages in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    buildOnce() // cold: JIT + rule-registry init land here

    val main = Thread.currentThread()
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val watcher = new Thread(() => {
      while (sampling) {
        val st = main.getStackTrace
        val phase = st.collectFirst {
          case f if f.getClassName.contains("ConstraintHelper") ||
            f.getClassName.contains("Constraint") => "constraints:" + f.getMethodName
          case f if f.getMethodName == "canonicalized" ||
            f.getClassName.contains("Canonicalize") => "canonicalize"
          case f if f.getClassName.endsWith("CacheManager") =>
            "cacheManager:" + f.getMethodName
          case f if f.getClassName.contains("CheckAnalysis") ||
            f.getMethodName.contains("checkAnalysis") => "checkAnalysis"
          case f if f.getClassName.contains("catalyst.analysis.Analyzer") => "analyze"
          case f if f.getClassName.contains("catalyst.optimizer") => "optimize"
          case f if f.getClassName.contains("execution.SparkStrategies") ||
            f.getClassName.contains("QueryPlanner") => "physicalPlan"
          case f if f.getClassName.contains("adaptive.") => "aqe"
          case f if f.getClassName.contains("RuleExecutor") => "ruleExecutor"
        }.getOrElse(st.headOption.map(f =>
          "other:" + f.getClassName.split('.').last + "." + f.getMethodName).getOrElse("idle"))
        counts.merge(phase, 1, (a, b) => a + b)
        Thread.sleep(10)
      }
    })
    watcher.setDaemon(true)
    watcher.start()
    buildOnce()
    buildOnce()
    sampling = false
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, v) =>
      println(f"SAMPLES $v%5d  $k")
    }
    spark.stop()
  }
}
