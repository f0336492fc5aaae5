package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pipeline — the composition every
  * large-scale pre-training run executes, each stage one of this package's
  * operators, in the canonical order (cheap narrow filters first, joins
  * last, so the expensive stages see the smallest corpus):
  *
  *  1. quality filter     — narrow Column thresholds ([[TextAnalysis]])
  *  2. language filter    — narrow stopword-profile ID ([[TextAnalysis]])
  *  3. exact dedup        — one hash aggregate + semi join ([[Dedup.exact]])
  *  4. near-dup dedup     — MinHash LSH pairs + keep-list ([[Dedup]])
  *  5. decontamination    — n-gram overlap vs holdout ([[Decontaminate]])
  *  6. split assignment   — deterministic hash split ([[Sampling]])
  *  7. shard packing      — token-budget shards ([[Sharding]])
  *
  * Output: the surviving documents, annotated with (n_tokens, bucket,
  * shard, split) — ready for `write.partitionBy("split")` into training
  * shards. Every stage is deterministic, so the whole pipeline is
  * reproducible from (corpus, holdout, config).
  */
object CurationPipeline {

  /** Tunables with the values a first curation pass typically starts from.
    * `maxGramDf` is the decontamination skew guard — keep it set at scale
    * (see [[Decontaminate.ngramOverlap]]; the near-dup stage needs no cap
    * because LSH candidates join on band keys, not raw shingles).
    */
  final case class Config(
      minTokens: Long = 10L,
      maxTokens: Long = 100000L,
      maxPunctRatio: Double = 0.3,
      maxDupTokenFrac: Double = 1.0, // 1.0 = repetition filters off
      maxTopBigramFrac: Double = 1.0,
      langs: Set[String] = Set("en"),
      nearDupThreshold: Double = 0.5,
      shingleN: Int = 3,
      // true ⇒ collapse whole near-dup CHAINS to one survivor per connected
      // component ([[Dedup.keepListCollapsed]] — costs the log-round
      // component iteration); false ⇒ the single-anti-join per-pair rule
      // ([[Dedup.keepList]] — a chain's min survives but other members may
      // too)
      collapseClusters: Boolean = false,
      decontamN: Int = 13,
      maxGramDf: Option[Long] = Some(10000L),
      splitSeed: String = "graft",
      splits: Seq[(String, Double)] = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      tokensPerShard: Long = 100000L,
      shardBuckets: Int = 256,
      // name of a precomputed token-count column on the input (e.g. real
      // BPE counts materialized by a tokenizer pass upstream): when set,
      // BOTH the quality filter's min/max-token thresholds (stage 1) and
      // the shard token budgets (stage 7) measure model tokens instead of
      // the whitespace default — the two places a whitespace count biases
      // a real training-data run
      tokenCountCol: Option[String] = None)

  /** Runs the full pipeline over `docs`; `holdout` is the eval corpus to
    * decontaminate against (None skips stage 5).
    */
  def run(docs: DataFrame, idCol: String, textCol: String,
          holdout: Option[DataFrame], cfg: Config = Config()): DataFrame =
    stageOutputs(docs, idCol, textCol, holdout, cfg).last._2

  /** The pipeline's cumulative stage outputs, in order — each entry is the
    * corpus as of that stage, the last being [[run]]'s result. Exists for
    * attribution: the bench (and any operator of a 100 TB run) times each
    * stage's materialization so a regression names a stage, not "the
    * pipeline". Building the Seq registers the same scoped persists as
    * [[run]]; callers release via [[graft.Caching.release]].
    */
  def stageOutputs(docs: DataFrame, idCol: String, textCol: String,
                   holdout: Option[DataFrame], cfg: Config = Config()): Seq[(String, DataFrame)] = {
    // 1+2: narrow filters (incl. the Gopher repetition rules), evaluated in
    // one pass over the scan. The repetition kernel only runs when a
    // threshold is actually set — at the 1.0 'off' defaults the pass (and
    // its two always-true predicates) would be pure waste.
    val repetitionOn = cfg.maxDupTokenFrac < 1.0 || cfg.maxTopBigramFrac < 1.0
    cfg.tokenCountCol.foreach(c => require(docs.columns.contains(c),
      s"CurationPipeline: tokenCountCol '$c' not in input (${docs.columns.mkString(", ")})"))
    val base = TextAnalysis.withLangId(
      TextAnalysis.withQualityMetrics(docs, textCol), textCol)
    val scored =
      if (repetitionOn) TextAnalysis.withRepetitionMetrics(base, textCol) else base
    val repetitionOk =
      if (repetitionOn)
        col("dup_token_frac") <= cfg.maxDupTokenFrac &&
          col("top_bigram_frac") <= cfg.maxTopBigramFrac
      else lit(true)
    // the min/max-token gate measures the configured token count (BPE when
    // provided); the other quality ratios stay whitespace-token-derived
    val gateTokens = cfg.tokenCountCol.map(col).getOrElse(col("n_tokens"))
    val filtered = scored
      .filter(gateTokens.between(cfg.minTokens, cfg.maxTokens) &&
        col("punct_ratio") <= cfg.maxPunctRatio &&
        repetitionOk &&
        col("lang_pred").isInCollection(cfg.langs))
      .select(docs.columns.map(col): _*)

    // 3: exact dedup — keep the smallest id of each identical text.
    // exactKept feeds the shingle extraction AND the keep-list anti-join;
    // persist so the narrow filters + dedup join run once. Registered with
    // graft.Caching — callers release with Caching.release(spark) after
    // materializing the result (leaked persists across many queries turn
    // the shared storage pool into LRU-eviction roulette).
    val exactKept = graft.Caching.scoped(filtered.join(
      Dedup.exact(filtered, idCol, textCol).select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi"))

    // 4: near-dup dedup — LSH pairs, then either the per-pair drop or the
    // full cluster collapse (one survivor per connected component)
    val pairs = Dedup.minHashLsh(
      Dedup.wordShingles(exactKept, idCol, textCol, cfg.shingleN),
      cfg.nearDupThreshold)
    val nearKept =
      if (cfg.collapseClusters) Dedup.keepListCollapsed(exactKept, idCol, pairs)
      else Dedup.keepList(exactKept, idCol, pairs)

    // 5: decontamination against the holdout. nearKept is referenced up to
    // three times (gram df union, anti-join probe, clean train side) — the
    // persist stops the LSH verification joins from re-executing per use.
    val clean = holdout match {
      case Some(h) =>
        val nk = graft.Caching.scoped(nearKept)
        Decontaminate.cleanTrainSet(nk, idCol,
          Decontaminate.ngramOverlap(nk, h, idCol, textCol,
            cfg.decontamN, cfg.maxGramDf))
      case None => nearKept
    }

    // 6+7: split assignment, then shard packing (narrow + one window).
    // hashSplit's diagnostic bucket column is dropped: packByTokens appends
    // its own (differently-seeded) bucket and must not silently shadow it.
    val split = Sampling.hashSplit(clean, idCol, cfg.splitSeed, cfg.splits).drop("bucket")
    val packed = Sharding.packByTokens(split, idCol, textCol,
      cfg.tokensPerShard, cfg.shardBuckets, tokenCountCol = cfg.tokenCountCol)
    Seq("filter" -> filtered, "exact_dedup" -> exactKept,
      "near_dedup" -> nearKept, "decontaminate" -> clean,
      "split" -> split, "shards" -> packed)
  }
}
