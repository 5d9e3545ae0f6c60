package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All queries take `(spark, sfDir)` and read only the tables/columns they
  * need — Catalyst prunes columns down to the parquet scan, so a query that
  * projects two columns reads two column chunks, not the whole table.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.ts has shipped both as parquet TIMESTAMP(NANOS) (which Spark 4
    * reads only as raw LongType nanos under the legacy nanosAsLong conf) and
    * as native TIMESTAMP(MICROS). Normalize by the loaded dtype instead of
    * hardwiring either generation:
    *   - LongType  → truncate ns→µs with integer division (`div`, not `/`:
    *     epoch-nanos ≈ 1.7e18 exceeds a double's 2^53 exact-integer range,
    *     so float division would corrupt low-order digits; DuckDB truncates
    *     ns→µs the same way, keeping the oracle aligned)
    *   - TimestampType / TimestampNTZType → pass through (cast NTZ to the
    *     session-zoned TimestampType the downstream date ops expect).
    * CAVEAT: the legacy retry flips the SESSION-GLOBAL nanosAsLong conf and
    * must leave it on — the parquet scan re-checks it at EXECUTION time,
    * so restoring it after schema inference breaks the returned frame
    * (verified by TablesSpec). On a legacy-generation session every nanos
    * file wants the conf anyway; the cost is that another table's
    * unexpected TIMESTAMP(NANOS) column would then load as raw longs
    * instead of failing — acceptable for test-table loaders, worth a
    * narrower reader at production scale. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros, col}
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    val raw =
      try apply(s, d, "events")
      catch {
        // Pre-regeneration files are TIMESTAMP(NANOS): the plain read throws
        // [PARQUET_TYPE_ILLEGAL] at schema-inference time unless the legacy
        // conf is on. Retry once with it; unrelated failures (missing file)
        // re-throw identically from the retry.
        case scala.util.control.NonFatal(_) =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          apply(s, d, "events")
      }
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
