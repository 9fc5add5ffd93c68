package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central fixture-table loaders (SURVEY §1.2).
  *
  * Every query reads through here so scale-sensitive decisions (the
  * events nanosecond fix, future bucketing/partition hints) live in ONE
  * place. All loads are plain parquet scans — Catalyst pushes filters
  * and prunes columns declared downstream, so these stay cheap at any
  * scale factor.
  */
object Tables {
  private def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.ts` has shipped in two physical layouts across fixture
    * generations, so dispatch on the schema actually read:
    *
    *  - parquet timestamp[ns]: Spark 4 refuses it (`PARQUET_TYPE_ILLEGAL`)
    *    unless read as raw Long nanoseconds via the legacy flag; then
    *    integer-divide to microseconds (`div`, NOT `/` — float division
    *    loses precision above 2^53) and rebuild a timestamp. Matches
    *    DuckDB's native ns→µs truncation exactly (SURVEY §7.2 #1).
    *  - parquet timestamp[us] (isAdjustedToUTC=false): Spark reads it as
    *    TIMESTAMP_NTZ. Cast to the session-zone TIMESTAMP (sessions here
    *    pin UTC, so the instant is unchanged) so every downstream query
    *    and written output keeps the type the ns era produced.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => raw
      case org.apache.spark.sql.types.TimestampNTZType => // µs, not UTC-adjusted
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case other =>
        // fail LOUDLY on a third layout — a silent cast here is exactly
        // the r11 drift class (38 bench queries errored under rc:0)
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other (expected " +
            "int64 nanos, TIMESTAMP, or TIMESTAMP_NTZ); fixture layout " +
            "drifted — update Tables.events dispatch deliberately")
    }
  }
}
