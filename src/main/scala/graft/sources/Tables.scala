package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * All reads stay fully declarative so Catalyst pushes filters and prunes
  * columns into the parquet scan — at 100 TB the scan is the dominant cost
  * and `PushedFilters`/`ReadSchema` must carry the query's predicate.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read `dir/name.parquet`, normalizing types the rest of the engine
    * expects. The `events` table is written with parquet TIMESTAMP(NANOS)
    * which Spark's reader rejects; we read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microsecond
    * TimestampType — the same truncation DuckDB applies on
    * `CAST(ts AS TIMESTAMP)`, keeping the oracle comparable.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftFunctions.register(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    name match {
      case "events" if df.schema("ts").dataType == LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
}
