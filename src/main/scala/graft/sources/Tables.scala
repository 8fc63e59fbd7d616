package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed loaders for the driver-generated star schema
  * (`/root/testdata/sf*`). One parquet file per table; filters and
  * column pruning push down to the parquet scan.
  */
object Tables {
  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across testdata generations. NANOS is rejected
    * by Spark's vectorized reader unless
    * `spark.sql.legacy.parquet.nanosAsLong` reads it as long (a no-op
    * for MICROS files); [[eventsFromRaw]] then normalizes either
    * encoding to session-TZ TIMESTAMP at microsecond precision. The
    * conf is set where the session is BUILT ([[graft.GraftSession]])
    * — this loader no longer mutates a session it doesn't own; a
    * foreign session without the conf gets an actionable error on
    * NANOS files instead of a silent global flip. */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    try load(spark, dir, "events")
    catch { case e: org.apache.spark.sql.AnalysisException
        if Option(e.getMessage).exists(_.contains("NANOS")) =>
      throw new IllegalStateException(
        s"$dir/events.parquet carries TIMESTAMP(NANOS); build the session " +
        "with spark.sql.legacy.parquet.nanosAsLong=true (GraftSession does) " +
        "so Tables.eventsFromRaw can normalize it", e)
    }

  def eventsFromRaw(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case LongType =>
      // legacy nanos-as-long: integral division — `/` would promote to
      // double and lose ulps at epoch-nanos magnitude, shifting some
      // timestamps by 1µs
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType =>
      // parquet micros without UTC adjustment; the session TZ is pinned
      // to UTC, so this cast reinterprets the same instant losslessly
      raw.withColumn("ts", col("ts").cast(TimestampType))
    case _ => raw // already session-TZ TIMESTAMP at micros
  }

  def events(spark: SparkSession, dir: String): DataFrame =
    eventsFromRaw(eventsRaw(spark, dir))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
