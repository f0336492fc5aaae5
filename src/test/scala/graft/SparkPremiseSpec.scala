package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** COMMITTED failed-premise evidence for the [[graft.ext.Dedup
  * .stripOriginConstraints]] workaround (the CodecPremiseSpec pattern):
  * Spark 4.1's `Dataset.localCheckpoint`/`checkpoint` snapshot the origin
  * plan's constraints onto the LogicalRDD as `originConstraints`. Inside a
  * streaming `foreachBatch`, re-instancing of a checkpointed frame that
  * appears several times in one plan (connectedComponents' star
  * self-unions) can yield copies whose OUTPUT got fresh attribute ids
  * while the snapshot kept the original ids — and the first Union above
  * such a copy dies in `Union.rewriteConstraints` with `key not found:
  * a#N`. The crash itself is pinned by CurationSpec's "semantic stage"
  * streaming test (mutation-verified: disabling the strip crashes it
  * exactly so). THIS spec pins the PREMISE that makes the strip
  * meaningful at all: checkpoints still carry the constraint snapshot. If
  * the first test ever FAILS, Spark stopped snapshotting constraints —
  * stripOriginConstraints is dead code; delete it and this spec. The
  * second test pins that the strip neutralizes the hazard shape.
  */
class SparkPremiseSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local("spark-premise", "2")

  private def logicalRdds(df: org.apache.spark.sql.DataFrame) = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.execution.LogicalRDD]
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => out += lr
      case _ => ()
    }
    out.toSeq
  }

  private def originConstraintRefs(
      lr: org.apache.spark.sql.execution.LogicalRDD): Set[String] = {
    val f = classOf[org.apache.spark.sql.execution.LogicalRDD]
      .getDeclaredField("originConstraints")
    f.setAccessible(true)
    f.get(lr) match {
      case Some(es: org.apache.spark.sql.catalyst.expressions.ExpressionSet) =>
        es.flatMap(_.references.map(_.toString)).toSet
      case _ => Set.empty
    }
  }

  test("localCheckpoint still snapshots origin constraints (delete the strip when this fails)") {
    // a FILE-backed filtered origin (a local Seq would constant-fold and
    // lose the filter constraints): the snapshot must be non-empty, and
    // the strip must be what empties it
    val dir = java.nio.file.Files.createTempDirectory("graft_prem").toString
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L)).toDF("a", "b").write.parquet(dir + "/t")
    val ck = spark.read.parquet(dir + "/t")
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(eager = true)
    assert(originConstraintRefs(logicalRdds(ck).head).nonEmpty,
      "premise gone: checkpoint no longer snapshots origin constraints — " +
        "stripOriginConstraints is dead code; delete it and this spec")
    assert(originConstraintRefs(
      logicalRdds(graft.ext.Dedup.stripOriginConstraints(ck)).head).isEmpty,
      "the strip must empty the snapshot in place")
  }

  test("stripOriginConstraints neutralizes the hazard end to end") {
    import spark.implicits._
    val ck = graft.ext.Dedup.stripOriginConstraints(
      Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint(eager = true))
    assert(originConstraintRefs(logicalRdds(ck).head).isEmpty)
    // the connectedComponents round shape that crashed pre-strip: self-union
    // under a join+filter whose optimization computes Union constraints
    val sym = ck.union(ck.select(col("b").as("a"), col("a").as("b")))
    val mins = sym.groupBy("a").agg(min("b").as("mn"))
      .select(col("a"), least(col("a"), col("mn")).as("m"))
    val out = sym.join(mins, "a").filter(col("b") > col("a"))
      .select(col("b").as("a"), col("m").as("b")).distinct()
    assert(out.count() >= 0) // optimization must not throw key-not-found
    // and the full operator runs on checkpointed-self-union plans
    val cc = graft.ext.Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }
}
