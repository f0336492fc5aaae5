package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval decontamination: flag training documents that share word
  * n-grams with a holdout (benchmark/eval) corpus — the standard
  * test-set-leakage sweep run over web-scale training data before a model
  * sees it (13-gram overlap in the published GPT-3 appendix-C recipe;
  * PaLM and Llama report the same shape with n ∈ [8, 13]).
  *
  * Scale shape: each side reduces to distinct (doc, gram-hash) rows —
  * narrow per-row explode, one distinct — and contamination is a hash
  * equi-join on the gram hash, never an all-pairs document compare. Join
  * keys are 60-bit md5 hashes (8-byte shuffle keys instead of ~100-byte
  * gram strings), so the shuffle volume is bounded by gram COUNT, not gram
  * text. The holdout side (benchmark suites) is orders of magnitude
  * smaller than the train side, so AQE broadcasts it and the train grams
  * never shuffle at all; with both sides large the join degrades to a
  * plain shuffled hash join — still linear in gram count.
  */
object Decontaminate {

  /** 60-bit md5 hash of a string column — [[graft.functions.Hashing.md5Hash60]],
    * codegen'd and DuckDB-reproducible.
    */
  def gramHash(s: Column): Column = graft.functions.Hashing.md5Hash60Col(s)

  /** Distinct word-n-gram hashes per document: (id, gram_h). Documents
    * shorter than `n` tokens contribute no grams (nothing to leak). Two
    * distinct grams of one doc colliding at 60 bits would merge
    * (probability ~n_grams²/2⁶¹ — negligible against corpus noise).
    *
    * Fully NARROW: one document's grams live in one row, so per-doc
    * dedup is `array_distinct` before the explode — no shuffle in batch,
    * and no state when `df` is a stream.
    */
  def docGrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // n = 0 would make every doc emit ONE empty-string gram (concat_ws of
    // zero columns), joining every train doc to every holdout doc and
    // then emptying the train set with no error — quadratic AND wrong
    require(n > 0, s"docGrams: n must be positive, got $n")
    // a NULL-id train doc would SURVIVE decontamination: its overlap rows
    // carry train_id NULL, which cleanTrainSet's anti-join can never match
    // (NULL = NULL) — a contaminated document shipping as clean. Raise per
    // row instead (Guards.idOrRaise, the Sampling stance).
    df.select(Guards.idOrRaise(df, idCol, "decontaminate").as("id"),
        TextAnalysis.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= n)
      .select(col("id"),
        explode(array_distinct(transform(TextAnalysis.wordNGrams(col("__t"), n),
          g => gramHash(g)))).as("gram_h"))
  }

  /** Contaminated (train, eval) document pairs with the number of shared
    * n-grams: (train_id, eval_id, n_shared), n_shared >= 1.
    *
    * `maxGramDf` drops grams whose document frequency across BOTH corpora
    * exceeds the cap before the join — the skew guard for boilerplate
    * (license headers, navigation chrome): a gram present in a train docs
    * and b eval docs contributes a×b join rows on one key, so one
    * ubiquitous gram is a quadratic hot partition. Ubiquitous grams are
    * also the least indicative of leakage, which is why published
    * decontamination recipes drop them outright rather than weighting.
    */
  def ngramOverlap(train: DataFrame, holdout: DataFrame, idCol: String, textCol: String,
                   n: Int = 13, maxGramDf: Option[Long] = None): DataFrame =
    overlapOf(docGrams(train, idCol, textCol, n), docGrams(holdout, idCol, textCol, n),
      maxGramDf)

  private def overlapOf(tg: DataFrame, eg: DataFrame, maxGramDf: Option[Long]): DataFrame = {
    // any gram that can EVER produce a (train, eval) pair has union df >= 2,
    // so a cap below 2 marks every joinable gram hot: the sweep returns an
    // empty pair set and a fully contaminated corpus passes as clean — the
    // docGrams n > 0 silent-no-op class
    maxGramDf.foreach(cap => require(cap >= 2,
      s"maxGramDf must be >= 2 (the union df of any joinable gram), got $cap"))
    val (tf, ef) = maxGramDf match {
      case Some(cap) =>
        // each side feeds the df aggregate AND the anti-join probe: persist
        // so the gram extraction (and the corpus scan under it) runs once
        // per side, not twice (the jaccardPairs precedent). Scoped: callers
        // release via graft.Caching.release after materializing.
        val tc = graft.Caching.scoped(tg)
        val ec = graft.Caching.scoped(eg)
        // df over the union: the cap decision must be symmetric, or a gram
        // could survive on one side only and the join would see a phantom
        val hot = tc.select("gram_h").union(ec.select("gram_h"))
          .groupBy("gram_h").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("gram_h")
        // re-select: the using-column join moves gram_h to the front, and
        // the positional toDF renames below need (id, gram_h) order
        (tc.join(hot, Seq("gram_h"), "left_anti").select("id", "gram_h"),
          ec.join(hot, Seq("gram_h"), "left_anti").select("id", "gram_h"))
      case None => (tg, eg)
    }
    tf.toDF("train_id", "gram_h")
      .join(ef.toDF("eval_id", "gram_h"), Seq("gram_h"))
      .groupBy("train_id", "eval_id").agg(count(lit(1)).as("n_shared"))
  }

  /** [[ngramOverlap]] with a bloom-filter SEMI-JOIN pre-filter on the train
    * side: the holdout gram hashes aggregate into one `bloomBits`-bit bloom
    * ([[graft.functions.BloomFilterAgg]] — map-side OR-merged partials, one
    * bounded blob), collected and folded into the plan as a literal, and
    * train grams that cannot be in the holdout (no false negatives) are
    * dropped by a pure codegen filter BEFORE any exchange.
    *
    * The result is bit-identical to [[ngramOverlap]]: the exact equi-join
    * still runs, so bloom false positives are removed there; and a gram
    * present in the holdout keeps its full document frequency on both
    * sides (every train occurrence passes the filter), so the symmetric
    * `maxGramDf` hot-gram decision is unchanged for every gram that could
    * produce a pair — grams the filter drops can never join.
    *
    * When to prefer it: [[ngramOverlap]] already never shuffles the train
    * side IF the holdout gram set fits a broadcast hash relation. At
    * benchmark-suite scale it does; with a HOLDOUT too big to broadcast
    * the join degrades to a full shuffle of the train corpus' gram
    * table, which at 100 TB is the dominant cost of the whole sweep. The
    * largest filter the Int shape (and a plan-literal blob) can carry is
    * 2³⁰ bits = 128 MiB — ~10 bits/gram up to ~10⁸ holdout grams (~1%
    * FP), an order of magnitude past any broadcastable hash relation. A
    * billions-of-grams holdout saturates ANY single broadcastable filter,
    * so shard the sweep instead: partition the holdout, run one
    * filter+join pass per shard (each bit-identical by this function's
    * contract), and union the pair sets.
    */
  def ngramOverlapBloom(train: DataFrame, holdout: DataFrame, idCol: String, textCol: String,
                        n: Int = 13, maxGramDf: Option[Long] = None,
                        bloomBits: Int = 1 << 22, bloomHashes: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    // the holdout grams feed the bloom build AND the join probe: scoped
    // persist (released by the caller via graft.Caching.release)
    val eg = graft.Caching.scoped(docGrams(holdout, idCol, textCol, n))
    val blob = eg.agg(
        call_function("graft_bloom", col("gram_h"), lit(bloomBits), lit(bloomHashes)).as("b"))
      .head.getAs[Array[Byte]](0)
    val tg = docGrams(train, idCol, textCol, n)
      .filter(call_function("graft_bloom_contains", lit(blob), col("gram_h")))
    overlapOf(tg, eg, maxGramDf)
  }

  /** The decontamination *decision*: the training set minus every document
    * that shares at least one n-gram with the holdout — one distinct on the
    * small pair set plus one anti-join.
    */
  def cleanTrainSet(train: DataFrame, idCol: String, overlap: DataFrame): DataFrame =
    train.join(overlap.select(col("train_id").as(idCol)).distinct(), Seq(idCol), "left_anti")

  /** SEMANTIC decontamination: drop training documents whose EMBEDDING is
    * cosine-similar (>= `threshold`) to any holdout document — the
    * companion sweep to [[ngramOverlap]] for leakage that survives
    * paraphrase (n-gram overlap only catches verbatim reuse; embedding
    * similarity catches the benchmark question restated in different
    * words, the contamination mode reported for modern chat-formatted
    * benchmarks).
    *
    * Scale shape: both sides reduce to SRP signatures
    * ([[Similarity.srpBase]] — codegen kernel, narrow), candidates come
    * from a banded equi-join between the train and holdout band tables
    * (never an all-pairs compare; with defaults, P(miss) ≈ 1.2e-5 per
    * leaked pair at cosine 0.35), and candidates are verified with exact
    * cosine before the decision — so there are no false drops. The
    * holdout side (benchmark suites) is orders of magnitude smaller than
    * the train side: AQE broadcasts its bands AND its verification
    * vectors, so the train corpus never shuffles; a pair colliding in
    * several bands is emitted once, by its first colliding band
    * ([[Similarity.firstBandOnly]] — in-row bit arithmetic), so no
    * candidate distinct shuffles at all. Zero-norm vectors
    * have no defined cosine, never pair, and always survive — matching
    * the NaN-fails-`>=` behavior of the SQL oracle.
    *
    * Duplicate train ids: pair emission is absorbed by the `leaked`
    * distinct + anti-join, so the OUTPUT stays set-correct, but
    * verification runs against an arbitrary copy's vector — if two rows
    * share an id with different vectors, a leak detected on either copy
    * removes both. Resolve duplicate ids upstream when copies can carry
    * different embeddings (see [[Similarity.cosineLshPairs]]'s
    * precondition note).
    */
  def semanticDecontaminate(train: DataFrame, holdout: DataFrame, idCol: String,
                            vecCol: String, threshold: Double,
                            numBits: Int = 48, bandSize: Int = 2): DataFrame = {
    require(numBits % bandSize == 0, s"numBits $numBits not a multiple of bandSize $bandSize")
    graft.functions.GraftFunctions.register(train.sparkSession)
    // NULL ids raise on BOTH sides (the docGrams rule): a NULL-id train
    // doc would escape the closing anti-join, and a NULL-id HOLDOUT row
    // would silently stop detecting leaks — its candidates carry hid=NULL
    // and vanish in the verification equi-join
    val trainChecked = train.withColumn(idCol,
      Guards.idOrRaise(train, idCol, "semanticDecontaminate"))
    val holdoutChecked = holdout.withColumn(idCol,
      Guards.idOrRaise(holdout, idCol, "semanticDecontaminate holdout"))
    // each base feeds its band explosion plus the verification re-join:
    // scoped persists, released by the caller via graft.Caching.release
    val tb = graft.Caching.scoped(Similarity.srpBase(trainChecked, idCol, vecCol, numBits))
    val hb = graft.Caching.scoped(Similarity.srpBase(holdoutChecked, idCol, vecCol, numBits))
    val cand = Similarity.srpBands(tb, numBits, bandSize, keepSig = true)
      .toDF("id", "band", "bv", "tsig")
      .join(Similarity.srpBands(hb, numBits, bandSize, keepSig = true)
        .toDF("hid", "band", "bv", "hsig"), Seq("band", "bv"))
      .filter(Similarity.firstBandOnly(col("band"), col("tsig"), col("hsig"),
        bandSize, numBits / bandSize))
      .select("id", "hid")
    val leaked = cand
      .join(tb.select(col("id"), col("v").as("tv"), col("nrm").as("tn")), "id")
      .join(hb.select(col("id").as("hid"), col("v").as("hv"), col("nrm").as("hn")), "hid")
      .filter(Similarity.dot(col("tv"), col("hv")) >= lit(threshold) * col("tn") * col("hn"))
      .select(col("id").as(idCol)).distinct()
    trainChecked.join(leaked, Seq(idCol), "left_anti")
  }

  /** Streaming decontamination for continuous ingest: matches each arriving
    * document's n-grams against a STATIC holdout gram set (benchmarks change
    * rarely; re-deploy to pick up a new holdout). Emits one append-mode row
    * per (train_id, eval_id, gram_h) leak as it arrives — a stream-static
    * inner join, which Structured Streaming executes STATELESSLY (the
    * static side is just a lookup table, re-broadcast per micro-batch when
    * small), so there is no state store to size and no watermark needed.
    * Aggregate downstream if pair counts are wanted; the raw leak events
    * are the useful alerting granularity.
    */
  def ngramOverlapStream(trainStream: DataFrame, holdout: DataFrame,
                         idCol: String, textCol: String, n: Int = 13): DataFrame = {
    // persist: the static side is re-joined every micro-batch — without
    // this, each trigger re-scans and re-explodes the whole holdout corpus.
    // Scoped: release via graft.Caching.release AFTER the stream stops (a
    // release mid-stream is correct but re-derives the grams per batch).
    val eg = graft.Caching.scoped(
      docGrams(holdout, idCol, textCol, n).toDF("eval_id", "gram_h"))
    docGrams(trainStream, idCol, textCol, n).toDF("train_id", "gram_h")
      .join(eg, Seq("gram_h"))
      .select("train_id", "eval_id", "gram_h")
  }
}
