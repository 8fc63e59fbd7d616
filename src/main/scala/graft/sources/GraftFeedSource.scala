package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** STREAMING CHANGE FEED over the versioned snapshot store — the
  * Delta-CDF-shaped `spark.readStream.format("graft-table").load(root)`
  * source that lets a Structured Streaming pipeline TAIL a graft
  * table's commit history instead of re-reading its state (the
  * reference's notification DAG consumes exactly this shape: "what did
  * the monthly update do", continuously).
  *
  * Offsets ARE version numbers: the store's commit markers already
  * form a totally-ordered, atomically-published log, so the source
  * needs no log of its own — `getOffset` is one marker listing, and a
  * committed offset v means "every change up to and including version
  * v has been emitted". Restart-safe by construction (offsets
  * serialize as the version number).
  *
  * Per-version emission, O(version bytes) — never a base re-read:
  *
  *   - a MoR/DV LINK (the O(changes) commits: upserts, deletes, SQL
  *     row-level ops, streaming appliers) emits its delta rows as
  *     `_change_type = 'upsert'` and its outright-deleted keys as
  *     `'delete'` rows (key column set, every other payload column
  *     NULL — resolving the full deleted image would cost a parent
  *     scan per trigger, exactly what a 100 TB feed must not do);
  *   - a PLAIN data version (full replace, compaction, merge publish,
  *     materialization) emits its full content as `'snapshot'` — a
  *     new baseline the consumer re-keys on. Consumers needing keyed
  *     diffs across full replaces run [[graft.operators.SnapshotDiff]]
  *     in batch; the feed's contract is honest volume, not hidden
  *     O(base) joins.
  *
  * Schema = the table's payload schema (derived `txn_month` hidden)
  * plus `_change_type` (string) and `_commit_version` (long), fixed at
  * stream start. `startingVersion` (default: the live head at stream
  * start) names the first version to emit — refuse-don't-guess if a
  * batch's range has fallen out of retention: the feed fails loudly
  * rather than silently skipping history it can no longer read (size
  * `retainVersions` to cover the consumer's maximum lag; MoR links
  * are never pruned before materialization, so the common
  * append-mostly regime retains the whole tail). Multiple versions
  * landing between triggers batch together, each row tagged with its
  * `_commit_version`; `maxVersionsPerTrigger` caps how many a single
  * trigger admits (catch-up admission control — a consumer starting
  * thousands of versions behind must not plan one giant union). */
class GraftFeedSource(spark: SparkSession, params: Map[String, String])
  extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val root = params.getOrElse("path", throw new IllegalArgumentException(
    "graft-table stream: .load(<storeRoot>) is required"))

  require(!Seq("branch", "tag", "versionasof", "timestampasof").exists(params.contains),
    "graft-table stream: the feed tails MAIN history forward; point reads " +
    "(branch/tag/versionAsOf/timestampAsOf) are batch options")

  /** Payload schema pinned at stream start (chain-resolved, txn_month
    * hidden) — the feed's schema cannot drift mid-stream. */
  private val payload: StructType = StructType(
    DeletionVectors.readMerged(spark, root).drop("txn_month").schema.fields.toSeq)

  private val startingVersion: Long = params.get("startingversion").map(_.toLong)
    .getOrElse(Sinks.currentVersion(spark, root).getOrElse(
      throw new java.io.FileNotFoundException(
        s"no published snapshot at $root — a change feed needs a first commit " +
        "(or pass startingVersion to begin at a known number)")))
  require(startingVersion >= 1, "startingVersion must be a committed version number (>= 1)")
  // refuse-don't-guess at construction: a startingVersion beyond the
  // live head would make latestOffset filter every head forever — a
  // typo'd number would look like a healthy EMPTY stream, the one
  // failure mode worse than a loud one. head+1 stays legal ("only
  // commits from the next publish on"); the other direction (a
  // RETAINED-range check) deliberately stays in getBatch — a restarted
  // stream's checkpoint may already be past a since-pruned
  // startingVersion, and construction must not break a healthy resume.
  params.get("startingversion").foreach { _ =>
    val head = Sinks.currentVersion(spark, root).getOrElse(0L)
    require(startingVersion <= head + 1,
      s"startingVersion $startingVersion is beyond the live head " +
      s"${if (head == 0) "(empty store)" else head.toString} of $root — the feed " +
      "would idle forever waiting for a version nothing is about to commit; pass " +
      s"a committed version or ${head + 1} (= tail only future commits)")
  }

  /** Admission control for catch-up storms: a consumer starting (or
    * restarting) thousands of versions behind must not plan one giant
    * union over the whole backlog — cap how many versions one trigger
    * admits and let the engine drain the rest across triggers
    * (AvailableNow keeps re-triggering until the latched end; the
    * FileStreamSource maxFilesPerTrigger discipline). */
  private val maxVersionsPerTrigger: Long =
    params.get("maxversionspertrigger").map(_.toLong).getOrElse(Long.MaxValue)
  require(maxVersionsPerTrigger >= 1, "maxVersionsPerTrigger must be >= 1")

  /** Trigger.AvailableNow latches the head at start; triggers then
    * drain up to it in maxVersionsPerTrigger slices. */
  @volatile private var availableNowEnd: Option[Long] = None

  override def schema: StructType = StructType(payload.fields.toSeq :+
    StructField("_change_type", StringType, nullable = false) :+
    StructField("_commit_version", LongType, nullable = false))

  // the engine drives this source through the admission-control path
  // (latestOffset below); the legacy getOffset must not be reachable —
  // it cannot express a read limit (the FileStreamSource stance)
  override def getOffset: Option[Offset] = throw new UnsupportedOperationException(
    "getOffset is not called when SupportsAdmissionControl is implemented")

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    if (maxVersionsPerTrigger == Long.MaxValue)
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
    else
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(maxVersionsPerTrigger)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Sinks.currentVersion(spark, root)

  override def reportLatestOffset(): org.apache.spark.sql.connector.read.streaming.Offset =
    Sinks.currentVersion(spark, root).filter(_ >= startingVersion)
      .map(LongOffset(_)).orNull

  override def latestOffset(startOffset: org.apache.spark.sql.connector.read.streaming.Offset,
                            limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val from = Option(startOffset).map(versionOf).getOrElse(startingVersion - 1L)
    val headLive = Sinks.currentVersion(spark, root).filter(_ >= startingVersion)
    val head = availableNowEnd match {
      case Some(latched) => headLive.map(math.min(_, latched))
      case None          => headLive
    }
    head match {
      case Some(h) if h > from =>
        val admitted = limit match {
          case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
            math.min(h, from + r.maxRows())
          case _ => h
        }
        LongOffset(admitted)
      case _ => null
    }
  }

  private def versionOf(o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o match {
      case LongOffset(v)        => v
      case so: SerializedOffset => so.json.trim.toLong
      case other                => other.json.trim.toLong
    }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion - 1L)
    val to = versionOf(end)
    val range = (from + 1L) to to
    if (range.isEmpty) return emptyBatch()
    // refuse-don't-guess: every version in the range must still be
    // readable — a feed that fell behind retention must fail loudly,
    // never silently skip history
    val readable = Sinks.listVersions(spark, root).toSet
    val lost = range.filterNot(readable)
    if (lost.nonEmpty)
      throw new java.io.FileNotFoundException(
        s"change feed on $root needs version(s) ${lost.mkString(",")} but retention " +
        "pruned them — the consumer fell behind the retainVersions window; restart " +
        "from a retained startingVersion (or a fresh snapshot) and size retention " +
        "to cover consumer lag")
    // the engine requires a streaming-flagged plan from a V1 source —
    // the same internalCreateDataFrame re-rooting FileStreamSource does
    org.apache.spark.sql.graftstream.StreamingFrame.toStreaming(
      range.map(changeOf).reduce(_ unionByName _))
  }

  /** One version's feed rows — O(this version's bytes). */
  private def changeOf(v: Long): DataFrame =
    DeletionVectors.linkOf(spark, root, v) match {
      case Some((key, vec, delta)) =>
        require(payload.fieldNames.contains(key),
          s"chain key '$key' of version $v is not a payload column")
        val upserts = delta.map(d =>
          stamp(d.select(payload.fieldNames.map(col).toSeq: _*), "upsert", v))
        // keys in the vector but NOT superseded by a delta image were
        // deleted outright: key column set, other payload columns null
        val delKeys = delta.fold(vec)(d =>
          vec.join(d.select(col(key)), Seq(key), "left_anti"))
        val deletes = stamp(delKeys.select(payload.fields.toSeq.map { f =>
          if (f.name == key) col(key).cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }: _*), "delete", v)
        upserts.fold(deletes)(_ unionByName deletes)
      case None =>
        stamp(spark.read.parquet(s"$root/${Sinks.versionDirName(v)}")
          .drop("txn_month")
          .select(payload.fieldNames.map(col).toSeq: _*), "snapshot", v)
    }

  private def stamp(df: DataFrame, kind: String, v: Long): DataFrame =
    df.withColumn("_change_type", lit(kind))
      .withColumn("_commit_version", lit(v))

  private def emptyBatch(): DataFrame =
    org.apache.spark.sql.graftstream.StreamingFrame.toStreaming(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object GraftFeedSource {
  private val fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Registered `q_table_feed` (hash-oracled): tail a three-commit
    * history — class-0 baseline publish, one MoR upsert link (class-20
    * price bumps + class-7 inserts), one DV delete link (class-30) —
    * through the streaming change feed in one AvailableNow drain, and
    * census (version, change_type) → row count / key XOR / price sum
    * against closed-form DuckDB over `orders`. The ledger is
    * batching-independent (every row carries `_commit_version`), so
    * however the trigger slices the range the hash is one truth. The
    * store builds once per JVM; the DRAIN is the timed surface. */
  def tableFeedResult(spark: SparkSession, dir: String): DataFrame = {
    val t = fixtures.computeIfAbsent(dir, _ => {
      val f = graft.util.Scratch.dir("table_feed") + "/t"
      val base = Tables.orders(spark, dir).select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_orderdate").cast("date").as("odate"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      Sinks.publishSnapshot(base.filter(col("o_orderkey") % 10 === 0), "odate", f,
        retainVersions = 100)
      val updates = base.filter(col("o_orderkey") % 20 === 0)
        .withColumn("price",
          expr("CAST(price + CAST('5.00' AS DECIMAL(3,2)) AS DECIMAL(18,2))"))
      val inserts = base.filter(col("o_orderkey") % 10 === 7)
      DeletionVectors.publishUpsert(spark, f, updates.unionByName(inserts),
        "o_orderkey", updates.select("o_orderkey").limit(0), validate = false)
      DeletionVectors.publishDeletes(spark, f,
        base.filter(col("o_orderkey") % 30 === 0).select("o_orderkey"), "o_orderkey")
      f
    })
    val out = graft.util.Scratch.dir("table_feed_out")
    spark.readStream.format("graft-table").option("startingVersion", "1").load(t)
      .writeStream.option("checkpointLocation", s"$out/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        b.write.mode("append").parquet(s"$out/rows")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    spark.read.parquet(s"$out/rows")
      .withColumn("h",
        graft.operators.Reconcile.xorHash60(col("o_orderkey").cast("string")))
      .groupBy(col("_commit_version").as("commit_version"),
        col("_change_type").as("change_type"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("key_xor"),
        sum(coalesce(col("price"), lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)")))
          .cast("double").as("price_sum"))
      .orderBy("commit_version", "change_type")
  }
}
