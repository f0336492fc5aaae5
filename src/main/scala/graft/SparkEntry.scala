package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Joins
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by nation: fact table joined through broadcast dimensions, with
    * the filter pushed into the parquet scan and decimal-exact aggregation.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    val dir = "/root/testdata/sf0.001"
    val li = Tables.load(spark, dir, "lineitem").filter(col("l_quantity") > 0)
    val ord = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")
    val nat = Tables.load(spark, dir, "nation")
    val joined = Joins.streamTableInner(
      Joins.streamTableInner(
        Joins.streamTableInner(li, ord, col("l_orderkey") === col("o_orderkey"), broadcastTable = false),
        cust, col("o_custkey") === col("c_custkey")),
      nat, col("c_nationkey") === col("n_nationkey"))
    joined.groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
