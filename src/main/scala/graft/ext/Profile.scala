package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus profiling: the "what is in this corpus" report a curation run
  * produces before and after each stage — per-slice document counts, token
  * length distribution, and duplication level — over 100 TB without a
  * single global sort or exact COUNT(DISTINCT).
  *
  * Every statistic is deterministic (md5-60-seeded bounded sketches from
  * [[Sketches]]), so two engines — or the same pipeline re-run — report
  * bit-identical profiles, and a profile diff is a real change, never
  * sketch noise.
  */
object Profile {

  /** Per-language profile of a document corpus:
    *
    *  - `lang_pred`, `n_docs` — slice and size;
    *  - `n_sample`, `p25/p50/p75/p90` — whitespace-token-count quantiles
    *    off the deterministic k-row hash-min sample
    *    ([[Sketches.quantileSketch]]);
    *  - `est_distinct_texts` — KMV estimate of distinct document texts
    *    ([[Sketches.distinctSketch]]): `n_docs - est_distinct_texts` is the
    *    slice's exact-duplicate mass.
    *
    * One narrow scoring pass feeds three partial-aggregated reductions,
    * joined on the (few-valued, broadcastable) language key.
    */
  def byLanguage(docs: DataFrame, idCol: String, textCol: String,
                 quantileK: Int = 128, distinctK: Int = 64): DataFrame = {
    // the scored base feeds all three aggregates: persist so the langId +
    // quality kernels run once. Scoped: callers release via
    // graft.Caching.release after materializing.
    val base = graft.Caching.scoped(
      TextAnalysis.withLangId(TextAnalysis.withQualityMetrics(docs, textCol), textCol)
        .select(col(idCol).as("id"),
          // NULL text counts as the EMPTY text (the tokens() rule): the
          // KMV hash skips NULL inputs, so un-coalesced NULL-text docs
          // would vanish from est_distinct_texts and silently inflate
          // the reported duplicate mass n_docs − est_distinct_texts
          coalesce(col(textCol), lit("")).as("text"),
          col("lang_pred"), col("n_tokens")))
    profile(base, "lang_pred", quantileK, distinctK)
  }

  /** The same report sliced by an EXISTING categorical column — per-source
    * (or per-split, per-shard) profiles, the standard before/after artifact
    * of a curation run over a mixed corpus. Skips the language-ID pass:
    * one narrow tokenize feeds the three partial-aggregated reductions.
    *
    * Rows with a NULL slice value report under the literal slice
    * `"<null>"` — the three reductions join on the slice key, where a SQL
    * NULL never equals itself, so without the fold those rows would
    * silently vanish from the report (and a profile that silently drops
    * rows is how corpus accounting drifts).
    */
  def bySlice(docs: DataFrame, idCol: String, textCol: String, sliceCol: String,
              quantileK: Int = 128, distinctK: Int = 64): DataFrame = {
    require(docs.columns.contains(sliceCol),
      s"bySlice: column '$sliceCol' not in input (${docs.columns.mkString(", ")})")
    // the closing rename would otherwise produce TWO columns with the
    // slice's name — the sketches' own guards never fire because the
    // group column here is the internal '__slice'
    Seq("n_docs", "n_sample", "p25", "p50", "p75", "p90", "est_distinct_texts")
      .foreach(c => require(sliceCol != c,
        s"bySlice writes stat column '$c' — rename the slice column first"))
    val base = graft.Caching.scoped(
      docs.select(col(idCol).as("id"),
        // NULL text counts as the EMPTY text (the byLanguage rule)
        coalesce(col(textCol), lit("")).as("text"),
        // a GENUINE slice value equal to the sentinel would silently merge
        // with the NULL population — fail loudly on the collision instead
        // (fixture slices never carry it, so the oracle is unaffected)
        when(col(sliceCol).cast("string") === "<null>", raise_error(lit(
          "bySlice: slice value collides with the '<null>' sentinel — " +
            "rename the value or pre-map NULLs yourself")).cast("string"))
          .otherwise(coalesce(col(sliceCol).cast("string"), lit("<null>"))).as("__slice"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens")))
    profile(base, "__slice", quantileK, distinctK)
      .withColumnRenamed("__slice", sliceCol)
  }

  /** Shared reduction: counts + token-length quantiles + KMV distinct-text
    * estimate, joined on the (few-valued, broadcastable) slice key.
    */
  private def profile(base: DataFrame, sliceCol: String,
                      quantileK: Int, distinctK: Int): DataFrame = {
    val counts = base.groupBy(sliceCol).agg(count(lit(1)).as("n_docs"))
    val quant = Sketches.quantileSketch(base, Seq(sliceCol), "n_tokens", "id",
      k = quantileK)
    val dist = Sketches.distinctSketch(base, Seq(sliceCol), "text", k = distinctK)
      .select(col(sliceCol), col("est_distinct").as("est_distinct_texts"))
    counts.join(quant, Seq(sliceCol)).join(dist, Seq(sliceCol))
  }
}
