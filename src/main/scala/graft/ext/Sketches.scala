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
}
