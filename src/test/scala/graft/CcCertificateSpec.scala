package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Adversarial drive of [[Dedup.connectedComponents]]' min-star-forest
  * convergence certificate (the one-job replacement for the per-round
  * count + `except` set-equality check). Each graph shape targets one
  * clause of the certificate or one way a cheap check could lie:
  *
  *  - an already-canonical star forest must converge WITHOUT running a
  *    single star round (the certificate's early exit — set-equality
  *    needed one full round to observe a fixpoint);
  *  - a star forest in the WRONG orientation (parent > child) must NOT
  *    early-exit: its sym-groupBy-min labels would be wrong (node 2 in
  *    {(1,5),(2,5)} would read label 2, not 1) — the down-edge clause
  *    catches exactly this;
  *  - chains (slowest contraction), cliques, two-parent nodes, and
  *    parent-is-also-source states exercise the remaining clauses;
  *  - random graphs re-verify against a union-find model (PropertySpec
  *    covers more sizes; the run here pins the certificate edition).
  */
class CcCertificateSpec extends SparkSpec {
  import spark.implicits._

  private def labels(pairs: Seq[(Long, Long)],
                     maxIters: Int = 20): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("d1", "d2"), maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("a canonical min-star forest converges with ZERO star rounds") {
    // children point DOWN at their roots, one parent each, roots are not
    // sources: the certificate must accept the INITIAL edge set, so even
    // maxIters = 0 (no rounds allowed) succeeds — the old set-equality
    // check needed a full round to see the fixpoint and failed this
    val star = Seq((5L, 1L), (7L, 1L), (9L, 1L), (12L, 10L))
    assert(labels(star, maxIters = 0) ===
      Map(1L -> 1L, 5L -> 1L, 7L -> 1L, 9L -> 1L, 10L -> 10L, 12L -> 10L))
  }

  test("a star forest in the WRONG orientation is not a fixpoint and still labels correctly") {
    // (1,5),(2,5): sources {1,2} distinct, parents {5} disjoint — only the
    // down-edge clause rejects this, and it must: stopping here would
    // label node 2 as 2 (its only neighbor 5 loses to itself) instead of 1
    assert(labels(Seq((1L, 5L), (2L, 5L))) === Map(1L -> 1L, 2L -> 1L, 5L -> 1L))
  }

  test("two parents for one child is rejected (distinct-source clause)") {
    // (9,1),(9,3): node 9 points at two roots — a real pre-convergence
    // state (components must merge to {1,3,9} under min 1)
    assert(labels(Seq((9L, 1L), (9L, 3L))) === Map(1L -> 1L, 3L -> 1L, 9L -> 1L))
  }

  test("a parent that is itself a source is rejected (chain clause)") {
    // (3,1),(5,3): all edges point down and sources are distinct, but 3 is
    // parent AND source — a chain, not a star; stopping would label 5 as 3
    assert(labels(Seq((3L, 1L), (5L, 3L))) === Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("long chain, clique, duplicate and bi-oriented edges match union-find") {
    val chain = (1L to 24L).sliding(2).map(s => (s(0), s(1))).toSeq
    val clique = for (a <- 30L to 36L; b <- (a + 1) to 36L) yield (a, b)
    val dupes = Seq((50L, 51L), (51L, 50L), (50L, 51L), (51L, 52L))
    val all = chain ++ clique ++ dupes
    assert(labels(all) === unionFind(all))
  }

  test("random graphs match union-find (certificate edition)") {
    val rnd = new scala.util.Random(1916)
    (1 to 3).foreach { _ =>
      val n = 40 + rnd.nextInt(40)
      val pairs = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      assert(labels(pairs) === unionFind(pairs))
    }
  }

  test("non-convergence within maxIters still raises") {
    val chain = (1L to 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    intercept[IllegalArgumentException](labels(chain, maxIters = 1))
  }

  test("empty edge set and self-loop-only input converge in zero rounds to an empty mapping (round-17 sweep)") {
    // the `converged ||= prevCount == 0` path: an empty pair frame (and a
    // frame whose every edge is a self-loop, filtered by cc_init) must
    // converge with maxIters = 0 — the certificate sees zero sources,
    // every clause vacuous — and return an EMPTY mapping, never raise
    assert(labels(Seq.empty, maxIters = 0) === Map.empty)
    assert(labels(Seq((3L, 3L), (7L, 7L)), maxIters = 0) === Map.empty)
    // self-loops mixed into a real graph vanish without affecting labels
    assert(labels(Seq((3L, 3L), (9L, 1L), (9L, 9L))) === Map(1L -> 1L, 9L -> 1L))
  }

  test("width interaction: the adapted-width loop and the full-width loop agree (round-17 sweep)") {
    // loopWidth narrows to ~1 partition on tiny edge sets and leaves the
    // plan untouched when the session width is already at or below the
    // adapted width — both paths must produce identical labels. The test
    // session plans at shuffle.partitions = 4, so the default run takes
    // Some(1) and the narrowed session takes the width = None branch.
    val pairs = ((1L to 24L).sliding(2).map(s => (s(0), s(1))).toSeq ++
      Seq((30L, 31L), (31L, 32L), (9L, 30L)))
    val wide = labels(pairs)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try assert(labels(pairs) === wide,
      "width = None (session already narrow) must match the adapted-width labels")
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
