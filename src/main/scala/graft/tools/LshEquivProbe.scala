package graft.tools

import org.apache.spark.sql.functions._

/** Scale-probe for the round-17 set-based LSH restructure: on a (usually
  * ScaleSynth ×10) corpus, assert the set-based entries are ROW-IDENTICAL
  * to the exploded-input originals — `minHashLshDocs` vs
  * `minHashLsh(wordShingles(…))` and `minHashLshCrossDocs` vs
  * `minHashLshCross(wordShingles(…), …)` — and print both sides' floors
  * so the restructure's win is measured at scale, not just at sf0.1.
  * `runMain graft.tools.LshEquivProbe <docsParquetDir>`.
  */
object LshEquivProbe {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    def timed(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(f"LSHEQUIV $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      n
    }
    def fetch(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] = {
      val s = df.collect().map(_.toSeq).toSet
      graft.Caching.release(spark)
      s
    }
    // self-join family (x03/x13/x25/x39/x42/x45's kernel)
    var newPairs: Set[Seq[Any]] = null
    var oldPairs: Set[Seq[Any]] = null
    timed("docs_new") { newPairs = fetch(
      graft.ext.Dedup.minHashLshDocs(docs, "doc_id", "text", 0.5)); newPairs.size.toLong }
    timed("shingles_old") { oldPairs = fetch(graft.ext.Dedup.minHashLsh(
      graft.ext.Dedup.wordShingles(docs, "doc_id", "text", 3), 0.5)); oldPairs.size.toLong }
    require(newPairs == oldPairs,
      s"set-based self-join diverged at scale: new=${newPairs.size} old=${oldPairs.size}")
    // cross family (x70/x71's kernel)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val ref = docs.filter(col("doc_id") % 2 =!= 0)
    var newCross: Set[Seq[Any]] = null
    var oldCross: Set[Seq[Any]] = null
    timed("cross_new") { newCross = fetch(graft.ext.Dedup.minHashLshCrossDocs(
      corpus, ref, "doc_id", "text", 0.5)); newCross.size.toLong }
    timed("cross_old") { oldCross = fetch(graft.ext.Dedup.minHashLshCross(
      graft.ext.Dedup.wordShingles(corpus, "doc_id", "text", 3),
      graft.ext.Dedup.wordShingles(ref, "doc_id", "text", 3), 0.5)); oldCross.size.toLong }
    require(newCross == oldCross,
      s"set-based cross diverged at scale: new=${newCross.size} old=${oldCross.size}")
    println("LSHEQUIV OK: set-based == exploded-input, both families")
    spark.stop()
  }
}
