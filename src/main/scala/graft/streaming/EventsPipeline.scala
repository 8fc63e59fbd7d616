package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** The reference's Kafka notification DAG re-expressed as Structured
  * Streaming (SURVEY.md §2 #15-16): each service is a stage of one
  * streaming query instead of a hand-rolled consumer loop
  * (land_registry_pp_complete_data_decision.py kafka_event_loop).
  *
  * The SAME transformation function serves batch and stream — the
  * batch path is what the DuckDB oracle checks, the streaming path is
  * covered by a MemoryStream spec. That is the Spark guarantee the
  * reference had to build by hand: one set of semantics for backfill
  * and live data.
  */
object EventsPipeline {

  /** Per-key dedup-state retention (newest content hashes kept). */
  val maxDedupState = 10000

  /** Tumbling 1-hour windowed aggregate per event type: event volume +
    * exact value sum (decimal-cast so stream/batch/cluster all agree
    * bit-for-bit). On a stream, the 2-hour watermark bounds state. */
  def windowedAgg(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    val e = if (withWatermark) events.withWatermark("ts", "2 hours") else events
    e.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // decimal-exact sum (stream/batch/cluster bit-agreement),
        // surfaced as DOUBLE in the output representation
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** HOPPING (sliding) windowed aggregate — 1-hour windows advancing
    * every 15 minutes, so each event contributes to exactly 4
    * overlapping windows: the smoothed dashboard/alerting read where
    * a tumbling window's bucket edges hide a burst that straddles
    * them. Same decimal-exact value sum; same watermark contract on a
    * stream (state is bounded by windows-in-flight × types). */
  def hoppingAgg(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    val e = if (withWatermark) events.withWatermark("ts", "2 hours") else events
    e.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Batch entry for the hopping window (`q_events_hopping`). */
  def eventsHoppingBatch(spark: SparkSession, dir: String): DataFrame =
    hoppingAgg(Tables.events(spark, dir)).orderBy("win_start", "event_type")

  /** Per-user sessionization through Spark's BUILT-IN `session_window`
    * (30-minute gap): the operator the brief's preference ladder picks
    * before any hand-rolled lag-window — and on a stream it is the
    * mergeable-session state Structured Streaming manages natively.
    * Semantics note pinned by the oracle: a gap of EXACTLY the
    * duration starts a new session (session end is exclusive), which
    * is why this query carries its own ≥-gap oracle rather than
    * sharing `q_sessions`' >-gap one (the manual window keeps the
    * reference's semantics; both are exact). */
  def sessionWindowBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"))
      .orderBy("user_id")

  /** Batch entry used by SparkEntry/Verify. */
  def eventsWindowBatch(spark: SparkSession, dir: String): DataFrame =
    windowedAgg(Tables.events(spark, dir))
      .orderBy("hour_start", "event_type")

  /** Streaming entry: read an events directory as a file stream and
    * apply the same transform. Used by the streaming spec via
    * MemoryStream; on a cluster this is `readStream.format("kafka")`. */
  def eventsWindowStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables.eventsRaw(spark, dir).schema
    // the events table is a single parquet file; a file-stream source
    // wants a directory, so stream the SF dir filtered to that file
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    windowedAgg(Tables.eventsFromRaw(stream), withWatermark = true)
  }

  /** JSON payload schema of an event on the wire — the producer
    * contract of the reference's notification topics
    * (lib_land_registry_data/lib_kafka.py create_producer/consumer:
    * JSON-serialized dicts on a named topic). */
  val eventJsonSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))

  /** The Kafka source options the production binding uses — the Spark
    * analog of the reference's consumer config (lib_kafka.py
    * create_consumer: bootstrap servers, topic subscription, earliest
    * auto-offset-reset; group-id/commit management is replaced by
    * Spark's checkpointed offsets). `failOnDataLoss=false` matches the
    * reference's tolerance of compacted/expired notification topics;
    * maxOffsetsPerTrigger bounds each micro-batch so one huge backlog
    * replay cannot OOM an executor. */
  def kafkaOptions(bootstrap: String, topic: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> topic,
    "startingOffsets" -> "earliest",
    "failOnDataLoss" -> "false",
    "maxOffsetsPerTrigger" -> "1000000")

  /** Production streaming entry: the same windowed aggregate over a
    * Kafka topic (`readStream.format("kafka")`) — value is the
    * JSON-serialized event, as produced by the reference's
    * lib_kafka.py producers. Malformed payloads parse to null and are
    * dropped (corrupt-tolerant like the CSV ingest). No broker exists
    * in the test sandbox, so the spec pins the options contract and
    * the parse transform; the plan is otherwise identical to
    * eventsWindowStream. */
  def eventsWindowKafka(spark: SparkSession, bootstrap: String, topic: String): DataFrame = {
    val raw = spark.readStream.format("kafka")
      .options(kafkaOptions(bootstrap, topic))
      .load()
    windowedAgg(parseKafkaEvents(raw), withWatermark = true)
  }

  /** value-bytes → typed event rows; shared by the Kafka entry and its
    * broker-less spec (which feeds the same binary-value shape from a
    * MemoryStream). */
  def parseKafkaEvents(kafkaRows: DataFrame): DataFrame =
    kafkaRows
      .select(from_json(col("value").cast(StringType), eventJsonSchema).as("e"))
      .select("e.*")
      .filter(col("event_id").isNotNull && col("ts").isNotNull)

  /** typed event rows → kafka (key, value) bytes — the producer-side
    * contract of the reference's notification emitters
    * (emit_kafka_notification_for_pp_monthly_update_files.py,
    * lib_kafka.py create_producer): JSON value, series id as the key
    * so a partition preserves per-series order. Inverse of
    * parseKafkaEvents (round-trip spec-pinned). */
  def encodeKafkaEvents(events: DataFrame): DataFrame =
    events.select(
      col("user_id").cast(StringType).cast(BinaryType).as("key"),
      to_json(struct(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))).cast(BinaryType).as("value"))

  /** Production publish entry: `df.writeStream.format("kafka")` over
    * the encoded rows (no broker in the sandbox — the encode transform
    * is what the spec covers). */
  def publishEventsKafka(events: DataFrame, bootstrap: String,
                         topic: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    encodeKafkaEvents(events).writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)

  /** The data-decision service as a stateful stream: for each file
    * series (key), compare the incoming content hash with the LAST
    * hash seen — archive if different/new, garbage_collect if same —
    * exactly the reference's kafka_event_loop decision
    * (land_registry_pp_complete_data_decision.py:139-175), with the
    * "last archived sha" in managed state instead of a Postgres read.
    * Batch equivalent: ReferenceOps.fileDecision (lag window). */
  def streamingFileDecision(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").as("key"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), sha2(col("props"), 256).as("sha"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[String, (Long, Long, String, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, Long, String)], state: GroupState[String]) =>
          // same order as the batch lag window: (ts, event_id)
          var last = state.getOption.orNull
          val out = rows.toSeq.sortBy(r => (r._3, r._2)).map { case (k, id, _, sha) =>
            val decision = if (last == null || last != sha) "archive" else "garbage_collect"
            last = sha
            (k, id, sha, decision)
          }
          if (last != null) state.update(last)
          out.iterator
      }
      .toDF("user_id", "event_id", "sha256sum", "data_decision")
  }

  /** Registered driver query for the streaming data-decision service:
    * the events table is replayed through the stateful stream
    * (file source → flatMapGroupsWithState → checkpointed parquet
    * sink) in one AvailableNow pass. With a whole series in one batch,
    * the state path reduces to the batch lag window — so this shares
    * q_file_decision's DuckDB oracle VERBATIM: the streaming and batch
    * plans are held to one truth. Cross-batch state carry-over is
    * spec-covered (StreamingSpec). */
  def fileDecisionBatch(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.util.Scratch.dir("events_stream_q")
    val events = Tables.events(spark, dir)
    events.coalesce(4).write.parquet(s"$tmp/in")
    streamingFileDecision(
        spark.readStream.schema(events.schema).parquet(s"$tmp/in"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("parquet")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(s"$tmp/out")
      .awaitTermination()
    spark.read.parquet(s"$tmp/out").orderBy("user_id", "event_id")
  }

  /** Stateful streaming SESSIONIZATION — the row-35 gap rule (a
    * >30-minute silence opens a new session) as live state instead of
    * a lag window: per key the state is one (last_ts, session_count)
    * pair, so memory is O(users), not O(events), and a session
    * spanning a micro-batch boundary stitches through the carried
    * last_ts instead of double-counting. Emits one row per event with
    * its running session index; within a batch events order by
    * (ts, event_id) — the batch window's exact sort — so a whole
    * series in one batch reduces to the lag-window plan and the
    * streaming drain shares q_sessions' oracle verbatim (one truth,
    * two plans, the q_stream_decision discipline). */
  def streamingSessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .select(col("user_id").as("key"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          var (lastTs, nSessions) = state.getOption.getOrElse((Long.MinValue, 0L))
          val out = rows.toSeq.sortBy(r => (r._3, r._2)).map { case (k, id, ts) =>
            if (lastTs == Long.MinValue || ts - lastTs > gapUs) nSessions += 1
            lastTs = ts
            (k, id, nSessions)
          }
          state.update((lastTs, nSessions))
          out.iterator
      }
      .toDF("user_id", "event_id", "session_idx")
  }

  /** Registered `q_stream_sessions`: the events table drained through
    * the stateful sessionizer in one AvailableNow pass, then folded to
    * the per-user (n_sessions, n_events) report — held to q_sessions'
    * DuckDB oracle VERBATIM. Cross-batch session stitching is
    * spec-covered (StreamingSpec). */
  def sessionizeBatch(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.util.Scratch.dir("events_sessions_q")
    val events = Tables.events(spark, dir)
    events.coalesce(4).write.parquet(s"$tmp/in")
    streamingSessionize(
        spark.readStream.schema(events.schema).parquet(s"$tmp/in"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("parquet")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(s"$tmp/out")
      .awaitTermination()
    spark.read.parquet(s"$tmp/out")
      .groupBy("user_id")
      .agg(max(col("session_idx")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Stateful exactly-once dedup by content hash per key — the
    * decision service's "have I seen this file content before"
    * memory, as a streaming state operator. Batch equivalent:
    * first-occurrence filter (TextOps.dedupHash). */
  def streamingDedup(events: DataFrame,
                     orderWithinBatch: Boolean = false,
                     maxState: Int = maxDedupState): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.streaming.GroupState
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").as("key"), sha2(col("props"), 256).as("sha"),
        col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Vector[String], (Long, Long, String)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows0: Iterator[(Long, String, Long, Long)], state: GroupState[Vector[String]]) =>
          // ARRIVAL order by default (the live contract: dedup keeps
          // whatever came first off the wire); event-time order when
          // requested — the replay/backfill contract, where "first"
          // must mean first by (ts, event_id) regardless of file
          // layout, which is also what makes the drained-batch run
          // deterministic enough to hash-check against a SQL oracle
          val rows = if (orderWithinBatch) rows0.toSeq.sortBy(r => (r._4, r._3))
                     else rows0.toSeq
          // state is BOUNDED: the newest maxState hashes per key,
          // FIFO-evicted — exact dedup within the retention horizon,
          // which is what keeps state-store size flat on an unbounded
          // stream. (An unbounded Set would grow for the life of the
          // query.)
          val seen = state.getOption.getOrElse(Vector.empty[String])
          // HashSet mirror for O(1) membership — Vector.contains over
          // 10k 64-char shas per event would be the hot-path cost
          val seenSet = scala.collection.mutable.HashSet.from(seen)
          var fifo = seen
          val out = Vector.newBuilder[(Long, Long, String)]
          rows.foreach { case (k, sha, id, _) =>
            if (!seenSet.contains(sha)) {
              out += ((k, id, sha))
              seenSet += sha
              fifo = fifo :+ sha
              if (fifo.length > maxState) {
                seenSet -= fifo.head
                fifo = fifo.tail
              }
            }
          }
          state.update(fifo)
          out.result().iterator
      }
      .toDF("user_id", "event_id", "sha256sum")
  }

  /** Registered driver query for the stateful event-dedup service:
    * the events table replayed through `streamingDedup` (file source
    * → flatMapGroupsWithState → checkpointed parquet sink) in one
    * AvailableNow pass, event-time ordered within the drained batch.
    * With every per-key sha set under the FIFO bound at this scale,
    * the state path reduces to first-occurrence-per-(user, sha) —
    * which is exactly the rank-1 SQL the oracle runs. Cross-batch
    * carry-over and FIFO eviction are spec-covered (StreamingSpec).
    * Timing note: unlike the fixture-cached media/timeline bindings,
    * this query deliberately times the FULL lifecycle per invocation
    * (fixture drop + stream drain) — the drained replay IS the
    * operator under test, not setup in front of it. */
  def eventDedupBatch(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.util.Scratch.dir("events_dedup_q")
    val events = Tables.events(spark, dir)
    // one file → one AvailableNow micro-batch, so the within-batch
    // event-time sort covers the whole corpus; multi-file drains could
    // split a user's events across batches and "first by ts" would
    // depend on file order rather than the sort
    events.coalesce(1).write.parquet(s"$tmp/in")
    // size the FIFO horizon ABOVE the corpus (the q_stream_dedup_bounded
    // discipline): with no eviction possible, the state path is exactly
    // first-occurrence-per-(user, sha) at ANY scale factor — the oracle
    // equivalence holds by construction, not by an unchecked assumption
    // about per-user cardinality. One cheap aggregate on the fixture.
    val bound = events
      .groupBy("user_id").agg(countDistinct(sha2(col("props"), 256)).as("n"))
      .agg(max(col("n"))).head().getLong(0).toInt + 1
    streamingDedup(
        spark.readStream.schema(events.schema).parquet(s"$tmp/in"),
        orderWithinBatch = true, maxState = bound)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("parquet")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(s"$tmp/out")
      .awaitTermination()
    spark.read.parquet(s"$tmp/out").orderBy("user_id", "event_id")
  }

  /** STREAM-STREAM interval join — last-hour click attribution: each
    * click pairs with every view by the SAME user in the preceding
    * hour (inclusive same-instant, exclusive one-hour-ago edge). The
    * one stateful-join shape the windowed/session family can't
    * express: two unbounded inputs matched on key + time bound.
    *
    * The time-bound conjunct is what makes the state FINITE: with
    * both sides watermarked, Spark evicts views older than the
    * watermark minus the join window and clicks past the watermark —
    * state is O(events-per-hour), not O(stream). Batch and stream run
    * the IDENTICAL join expression; the batch binding carries the
    * DuckDB oracle and the spec pins stream ≡ batch on the same
    * fixture (the q_stream_cdc discipline: one truth, two engines of
    * execution). */
  def attributionPairs(views: DataFrame, clicks: DataFrame,
                       withWatermark: Boolean = false): DataFrame = {
    val v = if (withWatermark) views.withWatermark("view_ts", "1 hour") else views
    val c = if (withWatermark) clicks.withWatermark("click_ts", "1 hour") else clicks
    c.join(v,
        col("view_user") === col("click_user") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") > col("click_ts") - expr("interval 1 hour"))
      .select(col("click_user").as("user_id"), col("click_id"), col("view_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
          .as("gap_us"))
  }

  /** LEFT OUTER stream-stream variant: every click emits — matched
    * pairs immediately, UNMATCHED clicks with a null view once the
    * watermark proves no qualifying view can still arrive (the
    * subtle Structured Streaming contract: outer nulls are
    * watermark-driven, not instant — spec-pinned). The batch binding
    * is a plain left join under the identical predicate and carries
    * the oracle; "how many clicks had no preceding view" is the
    * attribution-coverage metric this variant exists for. */
  def attributionPairsOuter(views: DataFrame, clicks: DataFrame,
                            withWatermark: Boolean = false): DataFrame = {
    val v = if (withWatermark) views.withWatermark("view_ts", "1 hour") else views
    val c = if (withWatermark) clicks.withWatermark("click_ts", "1 hour") else clicks
    c.join(v,
        col("view_user") === col("click_user") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") > col("click_ts") - expr("interval 1 hour"),
        "left_outer")
      .select(col("click_user").as("user_id"), col("click_id"), col("view_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
          .as("gap_us"))
  }

  /** Batch binding of the attribution join over the events table. */
  def eventAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("view_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    attributionPairs(views, clicks).orderBy("user_id", "click_id", "view_id")
  }

  /** LAST-TOUCH attribution — the marketing read on top of the pair
    * join: each click credits exactly its LATEST qualifying view
    * (ties on view time broken by view_id — total order, so the
    * credited view is engine-reproducible). One rank window over
    * click-sized partitions (bounded by views-per-click), pruned to
    * rank 1 by WindowGroupLimit before the shuffle grows. */
  def lastTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("click_id")
      .orderBy(col("gap_us").asc, col("view_id").desc)
    eventAttribution(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("user_id", "click_id")
  }

  /** Batch binding of the OUTER attribution join (coverage metric:
    * clicks with no preceding view keep a null view/gap). */
  def eventAttributionOuter(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("view_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    attributionPairsOuter(views, clicks)
      .orderBy("user_id", "click_id", "view_id")
  }
}
