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
  /** The corpus WITHOUT the parallelism rebalance — for consumers whose
    * per-row work is hash/sample/bookkeeping-cheap (exact dedup,
    * sampling, split assignment): there the widening exchange costs
    * more than the first stage it parallelizes (measured r16: 18 such
    * queries paid 10–55% for it). Heavy first-stage consumers
    * (tokenization, regex chains, shingling) keep [[documents]]. */
  def documentsNarrow(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
  // embeddings stays UNWIDENED: its heavy consumers are ITERATIVE
  // (k-means refinement, IVF training) and re-scan the table per
  // round, so the widening exchange is paid every iteration — measured
  // net-negative (d_semdedup/s_ann_ivf_index/s_ann_ivf_kmeans +0.5-1.3s
  // each vs d_embed_dup's -0.5s); per-element vector math also
  // vectorizes fine in one scan task at this table's row width
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private[graft] def widen(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val cores = spark.sparkContext.defaultParallelism
    tableBytes(spark, path) match {
      // explicit guard (no additive ceil): an unknown size must fall
      // back to assume-huge/no-op, never to an extra shuffle — the old
      // Long.MaxValue fallback overflowed the ceil and repartitioned
      // exactly when the size probe failed
      case Some(b) if (b / maxSplit + (if (b % maxSplit > 0) 1 else 0)) < cores =>
        df.repartition(cores)
      case _ => df
    }
  }

  /** Total data bytes of a flat table path via ONE getFileStatus (+ one
    * non-recursive listStatus when it is a directory) — never the
    * recursive getContentSummary walk, which is O(files) per load on
    * S3-like stores. A path with subdirectories (partitioned layout)
    * returns None = assume huge: partitioned tables are past the
    * widening regime by construction. Cached per (path, mtime) so
    * repeated loads in one JVM don't re-stat at all. */
  private val sizeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Option[Long]]()
  private def tableBytes(spark: SparkSession, path: String): Option[Long] =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      sizeCache.computeIfAbsent((path, st.getModificationTime), _ =>
        if (st.isFile) Some(st.getLen)
        else {
          val kids = fs.listStatus(p)
          if (kids.exists(_.isDirectory)) None
          else Some(kids.map(_.getLen).sum)
        })
    } catch { case _: java.io.IOException => None }
}
