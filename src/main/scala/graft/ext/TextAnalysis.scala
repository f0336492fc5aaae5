package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting. All
  * per-document computations are narrow (no shuffle) and codegen-friendly
  * where expressible as Column expressions, so they stream through a 100 TB
  * scan at I/O speed.
  */
object TextAnalysis {

  /** Whitespace tokens with empties dropped — the exact token definition the
    * DuckDB oracle mirrors (`list_filter(string_split_regex(trim(x),'\s+'))`).
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= lit(""))

  /** Word n-grams over a token-array column, space-joined — THE single gram
    * construction every shingle/gram operator (and its DuckDB oracle
    * transcription) derives from. Total: yields an empty array for docs
    * with fewer than `n` tokens (the when-guard matters — `sequence` with
    * a negative span counts DOWN and element_at would then index out of
    * range), so callers may still pre-filter `size >= n` for row-count
    * economy but no longer must for correctness.
    */
  def wordNGrams(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(
        sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(tokens, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** A BPE-ish token count: runs of letters, runs of digits, or single other
    * non-space chars — a cheap stand-in for subword tokenization.
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are", "on", "for", "with", "as", "by", "at")

  /** Appends the quality-metric columns (n_chars_m, n_tokens, n_bpeish,
    * avg_token_len, stopword_ratio, punct_ratio) to `df`'s rows — still
    * narrow per-row work; payload columns pass through for pipeline use.
    */
  def withQualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val nTok = size(t)
    val nChars = length(col(textCol))
    val punct = nChars - length(regexp_replace(col(textCol), "[!-/:-@\\[-`{-~]", ""))
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(filter(t, w => array_contains(stopArr, w)))
    // token-less / empty docs have undefined ratios: NULL, matching what
    // the SQL transcriptions' x/0 yields in DuckDB — and never a
    // DIVIDE_BY_ZERO under ANSI mode (quality gates then filter the doc,
    // since NULL fails every threshold)
    df.withColumns(Map(
      "n_chars_m" -> nChars,
      "n_tokens" -> nTok,
      "n_bpeish" -> bpeishCount(col(textCol)),
      "avg_token_len" -> when(nTok === 0, lit(null).cast("double"))
        .otherwise(length(concat_ws("", t)).cast("double") / nTok),
      "stopword_ratio" -> when(nTok === 0, lit(null).cast("double"))
        .otherwise(nStop.cast("double") / nTok),
      "punct_ratio" -> when(nChars === 0, lit(null).cast("double"))
        .otherwise(punct.cast("double") / nChars)))
  }

  /** Per-document quality metrics (doc_id, n_chars_m, n_tokens, n_bpeish,
    * avg_token_len, stopword_ratio, punct_ratio) — the standard cheap
    * quality-filter signals; threshold them downstream (e.g.
    * `stopword_ratio between 0.1 and 0.6 and punct_ratio < 0.2`).
    */
  def qualityMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withQualityMetrics(df, textCol).select(col(idCol), col("n_chars_m"), col("n_tokens"),
      col("n_bpeish"), col("avg_token_len"), col("stopword_ratio"), col("punct_ratio"))

  /** Repetition metrics, the published Gopher/MassiveText repetition
    * filters: `dup_token_frac` = 1 − distinct/total tokens (≈1 for
    * keyword-stuffed spam), `top_bigram_frac` = share of word bigrams
    * taken by the single most frequent bigram (≈1 for looping boilerplate).
    * Degenerate docs (no tokens / no bigrams) score 0. One O(n)
    * codegen-kernel pass per row ([[graft.functions.TextHash.repetition]])
    * — no shuffle, no UDF, cost bounded by document length, not corpus
    * size.
    */
  def withRepetitionMetrics(df: DataFrame, textCol: String): DataFrame = {
    // the equivalent higher-order-function formulation runs interpreted per
    // lambda element and re-evaluates the gram array per probe (measured
    // ~1400× slower at sf0.1: 380 s vs 0.27 s); null text scores as empty
    // (0.0, 0.0)
    graft.functions.GraftFunctions.register(df.sparkSession)
    val rep = call_function("graft_repetition", coalesce(col(textCol), lit("")))
    df.withColumn("dup_token_frac", element_at(rep, 1))
      .withColumn("top_bigram_frac", element_at(rep, 2))
  }

  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withRepetitionMetrics(df, textCol)
      .select(col(idCol), col("dup_token_frac"), col("top_bigram_frac"))

  /** Stopword-profile language ID — the classic cheap n-gram/stopword
    * heuristic. Scores each candidate language by the fraction of tokens in
    * its stopword profile; deterministic argmax (score desc, lang asc).
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "it", "that", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "du", "est", "dans"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有", "他", "这", "中"))

  /** Appends (lang_pred, lang_score) to `df`'s rows; payload columns pass
    * through for pipeline use.
    */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    // tokenize once into a column; scoring 5 languages over the same array
    // would otherwise re-run trim/split/filter per language
    val toked = df.withColumn("__t", tokens(lower(col(textCol))))
    val t = col("__t")
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val prof = array(words.map(lit): _*)
      // token-less docs score NULL for every language — what the SQL
      // transcription's x/len(t) yields in DuckDB at len(t)=0 (and never a
      // DIVIDE_BY_ZERO under ANSI). The argmax still resolves
      // deterministically: all five scores are NULL together, so the
      // struct sort falls through to the lang field in both engines
      struct(when(size(t) === 0, lit(null).cast("double"))
          .otherwise(size(filter(t, w => array_contains(prof, w))).cast("double") / size(t))
          .as("score"),
        lit(lang).as("lang"))
    }
    // argmax: sort (score desc, lang asc) via array_max on (score, negated-lang) is
    // messy; sort_array ascending on (score, lang) and take the last element —
    // equal scores then resolve to the lexicographically largest lang, which is
    // still deterministic.
    val best = element_at(sort_array(array(scored: _*)), -1)
    toked.withColumn("lang_pred", best.getField("lang"))
      .withColumn("lang_score", best.getField("score"))
      .drop("__t")
  }

  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withLangId(df, textCol).select(col(idCol), col("lang_pred"), col("lang_score"))

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03): hash all
    * word k-gram shingles ([[graft.functions.Hashing.md5Hash60]] — chosen so
    * the DuckDB oracle recomputes it exactly), slide a window of `w`, keep
    * each window's minimum. (Winnowing's rightmost-min tie-break selects a
    * *position*; since only the hash value is emitted and equal values
    * dedup, min-of-window is value-identical.) Emitted as
    * (doc_id, fingerprint BIGINT) rows, deduplicated. Per-row computation —
    * embarrassingly parallel.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String, k: Int = 5, w: Int = 4): DataFrame = {
    // the kernel is a native codegen expression (graft.functions
    // .WinnowFingerprints) — no ScalaUDF boxing on the document scan; null
    // text coalesces to "" (no tokens → no fingerprints, like the old UDF)
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol),
      explode(call_function("graft_fingerprints",
        coalesce(col(textCol), lit("")), lit(k), lit(w))).as("fingerprint"))
      .distinct()
  }

  /** PII patterns redacted by [[redactPii]], applied in this order. Emails
    * first: an address would otherwise be chewed up piecemeal by the looser
    * phone/IP digit patterns. IPs BEFORE phones: the greedy phone pattern
    * accepts digits/spaces/dots, so "+1-555-0100 192.0.2.7" would otherwise
    * collapse into one <PHONE> tag that swallows the IP (still redacted,
    * but the class information is lost); masking IPs first ends the phone
    * match at its last plain digit. The IP pattern is word-bounded on both
    * sides so it cannot fire INSIDE a longer digit run — without the `\b`s
    * a dotted phone "+1.555.123.4567" would be mangled into "+<IP>7"
    * (partial digits leaked, wrong class); bounded, no IP match starts
    * there and the phone pattern masks it whole. RE2-compatible — `\b` is
    * the ASCII word boundary, no backreferences or lookaround — so
    * external engines (the DuckDB oracle, a Go/Rust re-implementation)
    * replace identically.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    ("\\+[0-9][0-9 ().-]{6,}[0-9]", "<PHONE>"))

  /** Masks emails, international-format phone numbers, and IPv4 addresses —
    * the standard scrub before text enters a training corpus. Pure per-row
    * `regexp_replace` chain: codegen'd, no shuffle, embarrassingly parallel;
    * at 100 TB this is scan-bound, exactly as it should be.
    */
  def redactPii(df: DataFrame, textCol: String, outCol: String = "redacted"): DataFrame =
    df.withColumn(outCol,
      PiiPatterns.foldLeft(col(textCol)) { case (c, (re, tag)) =>
        regexp_replace(c, re, tag)
      })
}
