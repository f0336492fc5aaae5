package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting. AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin`, on by default in [[graft.GraftSession]])
  * handles sort-merge joins at runtime; these helpers cover the two cases it
  * does not:
  *
  *  - a hash aggregation whose hot key funnels into one reducer
  *    ([[saltedAggregate]]: two-phase partial→final over a salted key);
  *  - a broadcast-probe or bucketed join where one probe key dominates
  *    ([[saltedJoin]]: salt the big side, replicate the small side once per
  *    salt bucket).
  *
  * Salts are deterministic (`pmod(hash(...), buckets)` over the row's other
  * columns or a provided column), so retries and replays stay stable — no
  * rand() in the plan, which would break Spark task retry semantics.
  */
object Salt {

  /** Deterministic salt in [0, buckets) derived from `from` (pick a column
    * that varies within a hot key, e.g. the record id).
    */
  def saltCol(from: Column, buckets: Int): Column = {
    // pmod(hash, 0) is NULL under non-ANSI SQL: every row then shares the
    // (key, NULL) salt group and the hot key funnels back into one reducer
    // with correct results — the misconfiguration would never surface
    require(buckets > 0, s"saltCol: buckets must be positive, got $buckets")
    pmod(hash(from), lit(buckets))
  }

  /** Skew-immune groupBy-aggregate: aggregates each (key, salt) partial on
    * the mappers' shuffle, then merges partials per key — the hot key's work
    * spreads over `buckets` reducers. Aggregations must be decomposable
    * (count/sum/min/max: pass the partial column and a merge expression).
    *
    * Example — skew-proof count + sum:
    * {{{
    * Salt.saltedAggregate(df, Seq("k"), Salt.saltCol(col("id"), 32),
    *   "cnt" -> (count(lit(1)), sum(col("cnt"))),
    *   "total" -> (sum(col("v")), sum(col("total"))))
    * }}}
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salt: Column,
                      aggs: (String, (Column, Column))*): DataFrame = {
    // withColumn would silently REPLACE an input '__salt' — and the salt
    // expression may read the replaced value (the reserved-column stance)
    require(!df.columns.contains("__salt"),
      "saltedAggregate writes column '__salt' — rename the input column first")
    val partial = df.withColumn("__salt", salt)
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head._2._1.as(aggs.head._1), aggs.tail.map { case (n, (p, _)) => p.as(n) }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2.as(aggs.head._1), aggs.tail.map { case (n, (_, m)) => m.as(n) }: _*)
  }

  /** Skew-immune equi-join of a skewed big side against a small side: the
    * big side gets a deterministic salt, the small side is exploded once per
    * salt bucket, and the join key becomes (key, salt) — the hot key's rows
    * land on `buckets` different reducers. Small side grows ×buckets, so
    * keep `buckets` modest (8–64) and the small side actually small.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int,
                 saltFrom: Column, joinType: String = "inner"): DataFrame = {
    // right/full-outer would emit each unmatched small-side row once per
    // replicated salt bucket — reject join types the replication breaks
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti").contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left/semi/anti joins, not $joinType")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin writes column '__salt' on both sides — rename the input column first")
    require(buckets > 0, s"saltedJoin: buckets must be positive, got $buckets")
    val saltedBig = big.withColumn("__salt", saltCol(saltFrom, buckets))
    val replSmall = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedBig.join(replSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
