package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Mergeable sketches for corpus-scale profiling. First use: "how many
  * distinct users/domains/urls per slice" over 100 TB, where exact
  * COUNT(DISTINCT) shuffles every distinct value and `approx_count_distinct`
  * (HLL) is irreproducible across engines. The KMV sketch
  * ([[graft.functions.KMinValues]]) is both bounded (k longs per group
  * after map-side partials) and deterministic given the md5-60 hash, so the
  * same numbers fall out of Spark, the DuckDB oracle, or a re-run.
  */
object Sketches {

  /** 2⁶⁰ — the md5-60 hash space, exactly representable as a double. */
  private val HashSpace = 1152921504606846976.0

  /** Per-group distinct-count sketch of `valueCol`:
    *  - `n_kept`       — distinct hashes retained (≤ k)
    *  - `kth_hash`     — the largest retained hash (the sketch boundary)
    *  - `est_distinct` — (k−1)·2⁶⁰ / kth when the sketch is full, else the
    *                     exact distinct count (n_kept)
    *
    * One hash aggregate, partials merged map-side; the estimate math runs
    * in the documented operand order so oracles can reproduce it exactly.
    */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     k: Int = 64, seed: String = "kmv"): DataFrame = {
    // k = 1 degenerates the saturated-branch estimator to (k-1)·2^60/kth
    // = 0.0 for EVERY non-empty group — a plainly wrong estimate with no
    // error (k >= 2 keeps the numerator meaningful; below saturation the
    // sketch is exact at any k)
    require(k >= 2, s"distinctSketch needs k >= 2 (k-minimum-values): $k")
    // a group column named like a written (or intermediate) column would
    // yield ambiguous/duplicate output columns — fail loudly (the
    // packByTokens reserved-column stance)
    Seq("ks", "n_kept", "kth_hash", "est_distinct").foreach(c =>
      require(!groupCols.contains(c),
        s"distinctSketch writes column '$c' — rename the group column first"))
    graft.functions.GraftFunctions.register(df.sparkSession)
    val h = Hashing.md5Hash60Col(
      concat(lit(seed), lit(":"), col(valueCol).cast("string")))
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_kmv", h, lit(k)).as("ks"))
      .select(groupCols.map(col) ++ Seq(
        size(col("ks")).cast("long").as("n_kept"),
        // guard the empty sketch (every value in the group was null):
        // ANSI element_at(ks, 0) is an error, not a null
        when(size(col("ks")) > 0, element_at(col("ks"), size(col("ks"))))
          .otherwise(lit(null).cast("long")).as("kth_hash"),
        when(size(col("ks")) < k, size(col("ks")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
            element_at(col("ks"), k).cast("double"))
          .as("est_distinct")): _*)
  }

  /** Per-group quantile estimates of `valueCol` — "what do the length /
    * score / token-count distributions look like per slice" over 100 TB,
    * where exact percentiles sort every row and `approx_percentile`
    * (t-digest/KLL) is neither mergeable-deterministically nor reproducible
    * across engines. The sample is the `k` rows with the smallest md5-60
    * hash of `(seed, idCol)` ([[graft.functions.SampleByMinHash]]: bounded
    * buffer, map-side partials), so the whole sketch is a pure function of
    * the data: Spark, the DuckDB oracle, and any re-run select the same
    * rows and report bit-identical quantiles. `idCol` must uniquely
    * identify a row (it seeds the sample).
    *
    * Output: groupCols, `n_sample` (≤ k), and one `p<q*100>` column per
    * requested quantile — the sample value at rank
    * `floor(q * (n_sample - 1)) + 1` (lower-rank, no interpolation: the
    * emitted double is an exact input value, which is what keeps it
    * hash-checkable). Estimates carry the usual O(1/√k) sample-quantile
    * rank error; groups with every value null report n_sample = 0 and null
    * quantiles.
    */
  def quantileSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     idCol: String, k: Int = 128,
                     quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9),
                     seed: String = "qs"): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must lie in [0, 1]: $quantiles")
    def pName(q: Double): String = {
      val pct = q * 100
      if (pct == math.rint(pct)) f"p${pct.toInt}%d" else s"p$pct".replace('.', '_')
    }
    // duplicate quantiles (or distinct quantiles whose mangled names
    // collide) and group columns named like a written/intermediate column
    // would yield ambiguous or duplicate output columns — fail loudly
    val pNames = quantiles.map(pName)
    require(pNames.distinct.size == pNames.size,
      s"quantiles must be distinct after name mangling: $quantiles -> $pNames")
    (Seq("qs", "n_sample") ++ pNames).foreach(c =>
      require(!groupCols.contains(c),
        s"quantileSketch writes column '$c' — rename the group column first"))
    require(k >= 1, s"quantileSketch needs a positive sample size: $k")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // Sampling.hash60, not a hand-built concat: concat is null-intolerant,
    // so a NULL id hashed NULL and graft_qsample silently DROPPED the row
    // from the sample while it still counted in n_docs — biased quantiles
    // with no error. hash60 raises per row on NULL ids (the
    // split/sample/shard convention), and spells the same seed:id string
    // for every non-null id, so existing oracles are unchanged.
    val h = Sampling.hash60(col(idCol), seed)
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_qsample",
        h, col(valueCol).cast("double"), lit(k)).as("qs"))
      .select(groupCols.map(col) ++
        Seq(size(col("qs")).cast("long").as("n_sample")) ++
        quantiles.map { q =>
          val rank = (floor(lit(q) * (size(col("qs")) - 1).cast("double")) + 1).cast("int")
          when(size(col("qs")) > 0, element_at(col("qs"), rank))
            .otherwise(lit(null).cast("double")).as(pName(q))
        }: _*)
  }
}
