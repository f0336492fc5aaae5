package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    * expects. The engine's event-time contract is instant-semantics
    * `TimestampType` (sessions are pinned UTC), so `events.ts` is
    * normalized from whichever physical shape the generator wrote:
    *
    *  - parquet TIMESTAMP(NANOS): Spark's reader rejects it; we read nanos
    *    as long (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
    *    microseconds — the same truncation DuckDB applies on
    *    `CAST(ts AS TIMESTAMP)`, keeping the oracle comparable.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *    `TimestampNTZType`, on which `unix_millis`/watermarks throw
    *    DATATYPE_MISMATCH; cast to TimestampType (UTC session ⇒ the wall
    *    clock IS the instant, value-preserving, and DuckDB's naive
    *    TIMESTAMP reads the same microseconds).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // SESSION-WIDE by design: the engine's contract for TIMESTAMP(NANOS)
    // parquet (GraftSession.tune sets the same; this covers driver-created
    // sessions the library doesn't construct). Guarded so repeated loads
    // don't re-mutate the conf; register() is memoized per session.
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftFunctions.register(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    name match {
      case "events" =>
        df.schema("ts").dataType match {
          case LongType =>
            df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case TimestampNTZType =>
            df.withColumn("ts", col("ts").cast(TimestampType))
          case _ => df
        }
      case _ => df
    }
  }
}
