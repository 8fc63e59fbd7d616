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
  /** The text/embedding corpora are rebalanced to the session's
    * parallelism WHEN the file layout yields fewer scan splits than
    * the cluster has cores: nearly every consumer's FIRST stage does
    * heavy per-row work (tokenization, regex extraction chains, codec
    * decode, shingling, BPE merges), and whole-stage codegen fuses
    * that work into the scan stage — a single-file table would run it
    * at file-count parallelism no matter how many cores are idle.
    * Scale-adaptive, derived from input size (optimization guide §2):
    * at production sizes the scan already yields ≥ parallelism splits
    * and [[widen]] is the identity — no exchange is added. The
    * relational tables (lineitem/orders/…) stay unwidened: their
    * consumers aggregate/join immediately, where partial aggregation
    * in the scan stage beats shuffling full rows first. */
  def documents(spark: SparkSession, dir: String): DataFrame =
    widen(spark, load(spark, dir, "documents"), s"$dir/documents.parquet")
  // embeddings stays UNWIDENED: its heavy consumers are ITERATIVE
  // (k-means refinement, IVF training) and re-scan the table per
  // round, so the widening exchange is paid every iteration — measured
  // net-negative (d_semdedup/s_ann_ivf_index/s_ann_ivf_kmeans +0.5-1.3s
  // each vs d_embed_dup's -0.5s); per-element vector math also
  // vectorizes fine in one scan task at this table's row width
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private[graft] def widen(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val bytes =
      try p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
      catch { case _: java.io.IOException => Long.MaxValue }
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val cores = spark.sparkContext.defaultParallelism
    if ((bytes + maxSplit - 1) / maxSplit < cores) df.repartition(cores) else df
  }
}
