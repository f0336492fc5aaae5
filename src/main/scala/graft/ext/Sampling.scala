package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, seed-stable sampling and splitting for training-data
  * pipelines. A training corpus needs its train/val/test assignment to be a
  * pure function of (seed, document id) — reproducible across reruns,
  * stable under repartitioning, and consistent when the corpus grows (a doc
  * keeps its split forever) — which rules out `DataFrame.sample`/`rand()`
  * (plan- and partitioning-dependent). The idiom here is the standard
  * hash-bucket split: bucket = h(seed, id) mod 10000, split by cumulative
  * bucket ranges.
  *
  * Scale shape: pure per-row Column expressions inside whole-stage codegen —
  * no shuffle, no state, no driver participation; filters on the bucket
  * column combine with predicate pushdown when the bucket is materialized.
  */
object Sampling {

  /** Bucket granularity: fractions resolve to 1/10000ths. */
  val Buckets = 10000

  /** [[graft.functions.Hashing.md5Hash60]] of "seed:id" — codegen'd and
    * DuckDB-reproducible.
    */
  def hash60(id: Column, seed: String): Column = {
    // concat_ws SKIPS null args, so every null-id row would hash to the
    // same constant bucket — one split/sample decision and one shuffle
    // position shared by all of them, silently. Raise per row instead.
    val idStr = when(id.isNull, raise_error(lit(
      "graft sampling: NULL id — null-id rows would all share one constant " +
        "bucket (same split/sample/shuffle slot); drop or fill ids first"))
      .cast("string")).otherwise(id.cast("string"))
    graft.functions.Hashing.md5Hash60Col(concat_ws(":", lit(seed), idStr))
  }

  /** Deterministic bucket in [0, Buckets) from (seed, id). */
  def bucketOf(id: Column, seed: String): Column = hash60(id, seed) % Buckets

  /** Adds (bucket, split) columns assigning each row to a named split by
    * cumulative bucket ranges — e.g. `Seq("train" -> 0.8, "val" -> 0.1,
    * "test" -> 0.1)` maps buckets [0,8000) / [8000,9000) / [9000,10000).
    * Fractions must sum to 1 (to within one bucket).
    */
  def hashSplit(df: DataFrame, idCol: String, seed: String,
                splits: Seq[(String, Double)]): DataFrame = {
    Seq("bucket", "split").foreach(c => require(!df.columns.contains(c),
      s"hashSplit writes column '$c' — input already has one; rename or drop it first"))
    withSplitOf(df, col(idCol), seed, splits)
  }

  /** Keeps a deterministic `frac` of rows: the [0, frac·Buckets) bucket
    * range. Same-seed calls with larger `frac` return supersets (nested
    * samples — grow a subsample without resampling what you already
    * processed).
    */
  def sampleByHash(df: DataFrame, idCol: String, frac: Double, seed: String): DataFrame = {
    require(frac >= 0 && frac <= 1, s"frac must be in [0,1], got $frac")
    df.filter(bucketOf(col(idCol), seed) < math.round(frac * Buckets))
  }

  /** Keeps at most `k` row IDENTITIES per group, chosen deterministically
    * by hash rank (h(seed, id) asc, id asc tiebreak) — the
    * over-represented-source guard (cap docs per domain/site) that doesn't
    * bias toward any particular ordering of the input. `idCol` is the
    * survivor identity: a non-null INTEGRAL column (null-id rows are
    * dropped, non-integral ids fail at analysis time). Duplicate-id rows
    * count as ONE identity toward the cap (the aggregate collapses equal
    * (hash, id) pairs — a duplicate must not displace a distinct
    * survivor) and every row of a surviving id passes the semi join.
    *
    * Scale shape: selection runs as the bounded
    * [[graft.functions.BottomKIdsByLong]] aggregate over a skinny
    * (group, hash, id) projection — per-partition k-element partial
    * buffers combine map-side, so even a pathologically hot group never
    * sorts inside one task (the window/row_number formulation this
    * replaced did) — followed by one semi join to recover the surviving
    * rows. Long hash scores compare exactly, keeping the selection
    * bit-identical to integer-arithmetic oracles.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String, k: Int,
                  seed: String): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val keep = df
      .select(col(groupCol).as("__g"), col(idCol).as("__id"))
      .withColumn("__h", hash60(col("__id"), seed))
      .groupBy(col("__g"))
      .agg(call_function("graft_bottomk_long", col("__h"), col("__id"), lit(k)).as("__ks"))
      .select(explode(col("__ks")).as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Deterministic corpus-wide shuffle order — the interleave step before
    * training reads: documents are ranked by (shuffle bucket, md5-60 hash,
    * id), so related/consecutive source documents scatter apart and every
    * re-run (or engine) produces the IDENTICAL order, unlike
    * `orderBy(rand())`. Output adds `shuffle_pos` = `bucket * 2³² +
    * rank-within-bucket` (0-based): reading buckets in id order and each
    * bucket in rank order IS the shuffled corpus, and a training loader
    * shards by bucket with no global coordination.
    *
    * Scale shape: two-level like [[graft.ext.Sharding.packByTokens]] — a
    * hash bucket assignment (narrow) then a per-bucket rank window, so
    * there is no single global sort; parallelism = `nBuckets`.
    */
  def shuffleOrder(df: DataFrame, idCol: String, seed: String,
                   nBuckets: Int = 256): DataFrame =
    shuffleOrder(df, Seq(idCol), seed, nBuckets)

  /** Composite-key variant — the [[temperatureResample]] handoff: feed
    * (epoch, doc id) so a doc's replicas hash to DIFFERENT positions
    * instead of sharing one bucket with fully-tied (hash, id) ordering
    * (nondeterministic row_number ties AND consecutive replica placement,
    * the opposite of the documented interleave). The single-column form
    * hashes the identical "seed:id" string, so existing orders are
    * unchanged.
    */
  def shuffleOrder(df: DataFrame, idCols: Seq[String], seed: String,
                   nBuckets: Int): DataFrame = {
    require(idCols.nonEmpty, "shuffleOrder requires at least one id column")
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    Seq("shuffle_bucket", "shuffle_pos").foreach(c => require(!df.columns.contains(c),
      s"shuffleOrder writes column '$c' — input already has one; rename or drop it first"))
    // NULL components raise (concat_ws would silently skip them — the
    // hash60 constant-bucket hazard, per component)
    val parts = idCols.map(c => when(col(c).isNull, raise_error(lit(
      s"shuffleOrder: NULL $c — null key components would collapse into " +
        "one shared shuffle slot")).cast("string"))
      .otherwise(col(c).cast("string")))
    val key = if (parts.size == 1) parts.head else concat_ws(" ", parts: _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shuffle_bucket")
      .orderBy(hash60(key, seed + ":r") +: idCols.map(col(_)): _*)
    df.withColumn("shuffle_bucket", hash60(key, seed) % nBuckets)
      .withColumn("shuffle_pos",
        col("shuffle_bucket") * graft.ext.Sharding.ShardsPerBucket +
          (org.apache.spark.sql.functions.row_number().over(w).cast("long") - 1L))
  }

  /** α-temperature mixture resampling — the standard source-rebalancing
    * rule for multi-source/multilingual training corpora (p_s ∝ m_s^α with
    * α ∈ (0, 1], the exponent flattening the source-size distribution:
    * α = 1 is proportional, α → 0 is uniform; the recipe published for
    * XLM-R/mT5-style multilingual sampling and Pile/ROOTS-style source
    * weighting). Unlike [[stratifiedSampleByHash]] the per-source keep
    * fractions are COMPUTED from the data: with m_s the total `massCol`
    * (typically token count) of source s,
    *
    *   w_s = m_s^α / Σ_t m_t^α           (temperature weight)
    *   f_s = min(1, targetFrac·M·w_s / m_s)   (keep fraction, M = Σ m_s)
    *
    * and a row is kept iff its deterministic bucket < f_s·10000 — so the
    * expected kept mass is targetFrac·M distributed across sources by w,
    * capped at each source's available mass (no upsampling: a source whose
    * target exceeds its size keeps everything; the shortfall is NOT
    * redistributed, keeping f a closed form both engines reproduce).
    *
    * Scale shape: one tiny per-source aggregate (exact LONG sums — no
    * float-order sensitivity), collected to the driver (bounded by the
    * number of distinct sources, the IVF-codebook precedent), fractions
    * folded into a literal when-chain — the kept/dropped decision is then
    * a pure codegen per-row expression, no join, no shuffle. The α-power
    * sum runs in sorted-source order with sqrt for α = 0.5 (IEEE-exact in
    * every engine, unlike pow) so the thresholds are bit-reproducible by
    * the DuckDB oracle. Null-source and zero-mass-source rows are dropped
    * (no defined weight), matching the oracle's inner join + m > 0.
    */
  /** Exact per-source masses, collected (bounded by the source count — the
    * IVF-codebook precedent) and sorted by source for a deterministic
    * power-sum order. Null-source and zero-mass sources are dropped.
    */
  private def sourceMasses(df: DataFrame, sourceCol: String, massCol: Column,
                           who: String): Array[(String, Long)] = {
    // validate per row BEFORE the long cast: a NaN/fractional double mass
    // would silently truncate (NaN → 0 under non-ANSI SQL), shifting every
    // source's keep fraction with no error; NULL masses made the collect
    // NPE. The Sharding.tokenCountOrRaise rule, applied to masses.
    val d = massCol.cast("double")
    val safeMass = when(massCol.isNull || isnan(d) || d < 0 ||
        d =!= floor(d) || d > 9.2e18,
      raise_error(concat(lit(s"$who: null/negative/non-integral mass: "),
        massCol.cast("string"))).cast("long"))
      .otherwise(massCol.cast("long"))
    val perSource = df
      .groupBy(col(sourceCol).cast("string").as("__s"))
      .agg(sum(safeMass).as("__m"))
      .collect()
      .flatMap(r => Option(r.getString(0)).map(s => (s, r.getLong(1))))
      .filter(_._2 > 0L)
      .sortBy(_._1)
    require(perSource.nonEmpty, s"$who: no source has positive mass")
    perSource
  }

  private def pow(alpha: Double)(m: Double): Double =
    if (alpha == 0.5) math.sqrt(m) else math.pow(m, alpha)

  /** Per-source uncapped keep fraction f_s = targetFrac·M·w_s / m_s — ONE
    * definition of the oracle-mirrored arithmetic (left-assoc double ops in
    * sorted-source order), shared by [[temperatureSample]] and
    * [[temperatureResample]] so the two can never drift by a ULP.
    */
  private def sourceFractions(perSource: Array[(String, Long)],
                              alpha: Double, targetFrac: Double): Array[(String, Double)] = {
    val pw = pow(alpha) _
    val mTot = perSource.map(_._2).sum // exact: long
    val sPow = perSource.foldLeft(0.0) { case (acc, (_, m)) => acc + pw(m.toDouble) }
    perSource.map { case (s, m) =>
      val md = m.toDouble
      s -> targetFrac * mTot * (pw(md) / sPow) / md
    }
  }

  def temperatureSample(df: DataFrame, idCol: String, sourceCol: String,
                        massCol: Column, alpha: Double, targetFrac: Double,
                        seed: String): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(targetFrac > 0 && targetFrac <= 1, s"targetFrac must be in (0,1], got $targetFrac")
    val perSource = sourceMasses(df, sourceCol, massCol, "temperatureSample")
    // threshold expression tree mirrors the oracle's EXACTLY (left-assoc
    // double ops in the same order, via the shared sourceFractions)
    val thresholds = sourceFractions(perSource, alpha, targetFrac).map {
      case (s, f) => s -> math.min(10000.0, f * Buckets)
    }
    val thrCol = thresholds.foldRight(lit(Double.NegativeInfinity): Column) {
      case ((s, thr), rest) => when(col(sourceCol) === s, lit(thr)).otherwise(rest)
    }
    df.filter(bucketOf(col(idCol), seed).cast("double") < thrCol)
  }

  /** [[temperatureSample]] WITH upsampling — the full published mixture
    * rule: where temperatureSample caps every keep fraction at 1 (a source
    * can only shrink), real multilingual recipes REPLICATE small sources
    * (XLM-R upsamples low-resource languages by epochs > 1; mixture specs
    * quote "N epochs of source s"). With f_s = targetFrac·M·w_s / m_s
    * (uncapped), a row of source s is emitted
    *
    *   n = ⌊f_s⌋ + (bucket(seed, id) < frac(f_s)·10000 ? 1 : 0)
    *
    * times, tagged `epoch` 0..n−1 — every source's expected emitted mass
    * is f_s·m_s, so the mixture hits targetFrac·M with the w proportions
    * exactly (no cap shortfall), and the whole decision stays a pure
    * per-row function of (seed, id): reruns, repartitions, and the DuckDB
    * oracle reproduce the same copies. `targetFrac` may exceed 1 (a
    * corpus stretched over multiple epochs).
    *
    * Scale shape: identical to [[temperatureSample]] — one bounded
    * per-source aggregate folded into literal when-chains — plus one
    * NARROW explode of at most ⌈f_s⌉ copies; no join, no shuffle. The
    * `epoch` column is the standard downstream interleave key: feed
    * (epoch, doc) to [[shuffleOrder]] so replicas of one doc land far
    * apart in the training stream.
    */
  def temperatureResample(df: DataFrame, idCol: String, sourceCol: String,
                          massCol: Column, alpha: Double, targetFrac: Double,
                          seed: String): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(targetFrac > 0, s"targetFrac must be positive, got $targetFrac")
    Seq("epoch", "__graft_epochs").foreach(c => require(!df.columns.contains(c),
      s"temperatureResample writes column '$c' — input already has one; rename or drop it first"))
    val perSource = sourceMasses(df, sourceCol, massCol, "temperatureResample")
    // two literals per source: whole-epoch count and the fractional-epoch
    // bucket threshold; arithmetic order mirrors the oracle EXACTLY (the
    // shared sourceFractions f first, then floor/frac of the same double),
    // so copy counts cannot differ by a ULP between engines
    val copies = sourceFractions(perSource, alpha, targetFrac).map {
      case (s, f) => (s, math.floor(f).toLong, (f - math.floor(f)) * Buckets)
    }
    val baseCol = copies.foldRight(lit(0L): Column) {
      case ((s, base, _), rest) => when(col(sourceCol) === s, lit(base)).otherwise(rest)
    }
    val thrCol = copies.foldRight(lit(Double.NegativeInfinity): Column) {
      case ((s, _, thr), rest) => when(col(sourceCol) === s, lit(thr)).otherwise(rest)
    }
    val n = baseCol + when(bucketOf(col(idCol), seed).cast("double") < thrCol, 1L).otherwise(0L)
    df.withColumn("__graft_epochs", n)
      .filter(col("__graft_epochs") >= 1L)
      .withColumn("epoch", explode(sequence(lit(0L), col("__graft_epochs") - 1L)))
      .drop("__graft_epochs")
  }

  /** Leakage-safe train/val/test assignment: split by the NEAR-DUP
    * COMPONENT root instead of the document id, so two near-duplicate
    * documents can never land in different splits (with [[hashSplit]] a
    * near-dup pair straddles train/test with probability 2·0.8·0.1 + ... —
    * at web scale that is millions of eval documents whose paraphrase is
    * in train, the split-leakage mode near-dedup papers warn about).
    * `pairs` is any (d1, d2) near-dup pair set (MinHash LSH, SimHash,
    * embedding LSH); every document of a connected component inherits the
    * component minimum as `root_id` (unpaired documents root at
    * themselves) and the split is a pure function of (seed, root_id).
    *
    * Scale shape: [[Dedup.connectedComponents]]'s log-round star
    * contraction over the pair set (equi-joins only), one left join to
    * attach roots (pair sets are sparse — AQE broadcasts the mapping when
    * small), then the same codegen bucket expression as [[hashSplit]].
    */
  def splitByComponent(df: DataFrame, idCol: String, pairs: DataFrame, seed: String,
                       splits: Seq[(String, Double)]): DataFrame = {
    Seq("root_id", "bucket", "split").foreach(c => require(!df.columns.contains(c),
      s"splitByComponent writes column '$c' — input already has one; rename or drop it first"))
    // the unpaired-doc fallback below casts idCol to long; a non-integral
    // id would silently null, hash every such doc to ONE constant bucket,
    // and collapse the corpus into a single split — the exact silent-cast
    // class connectedComponents guards for its own pair inputs
    Guards.requireIntegralId(df, idCol, "splitByComponent")
    val mapping = Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("__cc_id"), col("cluster_id").as("__cc_root"))
    val withRoot = df
      .join(mapping, col(idCol) === col("__cc_id"), "left")
      .withColumn("root_id", coalesce(col("__cc_root"), col(idCol).cast("long")))
      .drop("__cc_id", "__cc_root")
    withSplitOf(withRoot, col("root_id"), seed, splits)
  }

  /** Shared split assignment: bucket from (seed, key), named split by
    * cumulative bucket ranges (see [[hashSplit]] for the contract).
    */
  private def withSplitOf(df: DataFrame, keyCol: Column, seed: String,
                          splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "split assignment needs at least one split")
    // per-fraction bounds, not just the sum: (1.1, -0.1) sums to 1 but
    // would leave the negative split silently empty (sampleByHash /
    // stratifiedSampleByHash already validate per-fraction)
    splits.foreach { case (name, f) => require(f >= 0.0 && f <= 1.0,
      s"split fraction for '$name' must be in [0, 1], got $f") }
    require(math.abs(splits.map(_._2).sum - 1.0) * Buckets < 1.0,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val bounds = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * Buckets)
    }.tail
    val b = col("bucket")
    // last split takes the remainder of rounding, so every bucket is assigned
    val assign = splits.init.zip(bounds.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), bound), rest) => when(b < bound, name).otherwise(rest)
    }
    df.withColumn("bucket", bucketOf(keyCol, seed))
      .withColumn("split", assign)
  }

  /** Per-stratum deterministic sampling: keep `frac(stratum)` of each
    * stratum's rows (unlisted strata drop to 0) — the rebalancing primitive
    * for domain/language mixes. Still a pure per-row expression: the
    * per-stratum thresholds compile into the plan, no shuffle or join.
    */
  def stratifiedSampleByHash(df: DataFrame, idCol: String, stratumCol: String,
                             fracs: Map[String, Double], seed: String): DataFrame = {
    require(fracs.values.forall(f => f >= 0 && f <= 1), s"fracs must be in [0,1]: $fracs")
    val threshold = fracs.toSeq.sortBy(_._1).foldRight(lit(0L): Column) {
      case ((stratum, f), rest) =>
        when(col(stratumCol) === stratum, math.round(f * Buckets)).otherwise(rest)
    }
    df.filter(bucketOf(col(idCol), seed) < threshold)
  }
}
