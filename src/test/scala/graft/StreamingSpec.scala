package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CorpusStream, EventsPipeline}

/** Streaming semantics: the SAME windowedAgg used by the batch oracle
  * query must produce the same aggregates when fed incrementally, and
  * the stateful dedup must drop repeated content hashes per key across
  * micro-batches. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed agg over a stream matches the batch result") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventsPipeline.windowedAgg(df, withWatermark = true)
      .writeStream.format("memory").queryName("win_out").outputMode("append").start()
    mem.addData(
      (ts("2024-01-01 10:05:00"), "click", 1.5),
      (ts("2024-01-01 10:40:00"), "click", 2.5),
      (ts("2024-01-01 11:10:00"), "view", 4.0))
    q.processAllAvailable()
    // advance watermark past 11:00+2h so the 10:00 & 11:00 windows close
    mem.addData((ts("2024-01-01 14:00:00"), "late", 0.0))
    q.processAllAvailable()
    val rows = spark.table("win_out")
      .select("hour_start", "event_type", "n_events", "total_value").collect()
    q.stop()
    val click = rows.find(_.getString(1) == "click").get
    assert(click.getTimestamp(0) === ts("2024-01-01 10:00:00"))
    assert(click.getLong(2) === 2L)
    assert(click.getDouble(3) === 4.0)
    assert(rows.find(_.getString(1) == "view").get.getLong(2) === 1L)
  }

  test("hopping windows assign each event to exactly 4 overlapping windows, stream = batch") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventsPipeline.hoppingAgg(df, withWatermark = true)
      .writeStream.format("memory").queryName("hop_out").outputMode("append").start()
    mem.addData((ts("2024-01-01 10:20:00"), "click", 1.0))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 14:00:00"), "late", 0.0)) // close the windows
    q.processAllAvailable()
    val clicks = spark.table("hop_out").filter(col("event_type") === "click")
      .select("win_start").collect().map(_.getTimestamp(0).toString).sorted
    q.stop()
    // 10:20 falls in the 1h windows starting 09:30, 09:45, 10:00, 10:15
    assert(clicks === Array("2024-01-01 09:30:00.0", "2024-01-01 09:45:00.0",
      "2024-01-01 10:00:00.0", "2024-01-01 10:15:00.0"))
    // batch path agrees
    import spark.implicits._
    val batch = EventsPipeline.hoppingAgg(
      Seq((ts("2024-01-01 10:20:00"), "click", 1.0)).toDF("ts", "event_type", "value"))
      .select("win_start").as[Timestamp].collect().map(_.toString).sorted
    assert(batch.sameElements(clicks))
  }

  test("stateful dedup drops repeated content per key across batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventsPipeline.streamingDedup(df)
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 7L, "e", 0.0, "contentA"),
      (2L, ts("2024-01-01 10:01:00"), 7L, "e", 0.0, "contentA"),
      (3L, ts("2024-01-01 10:02:00"), 7L, "e", 0.0, "contentB"))
    q.processAllAvailable()
    mem.addData(
      (4L, ts("2024-01-01 10:03:00"), 7L, "e", 0.0, "contentA"),
      (5L, ts("2024-01-01 10:04:00"), 8L, "e", 0.0, "contentA"))
    q.processAllAvailable()
    val out = spark.table("dedup_out").select("user_id", "event_id").as[(Long, Long)].collect().toSet
    q.stop()
    // user 7: contentA first at event 1 (2 and 4 are dups), contentB at 3;
    // user 8 has its own state → its contentA passes.
    assert(out === Set((7L, 1L), (7L, 3L), (8L, 5L)))
  }

  test("streaming file decision matches the batch lag-window semantics across batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventsPipeline.streamingFileDecision(df)
      .writeStream.format("memory").queryName("dec_out").outputMode("append").start()
    // batch 1: first file archives, identical repeat gc's, change archives
    mem.addData(
      (1L, ts("2024-01-01 00:00:00"), 1L, "dl", 0.0, "hashA"),
      (2L, ts("2024-01-02 00:00:00"), 1L, "dl", 0.0, "hashA"),
      (3L, ts("2024-01-03 00:00:00"), 1L, "dl", 0.0, "hashB"))
    q.processAllAvailable()
    // batch 2: state survives the batch boundary — same content → gc
    mem.addData((4L, ts("2024-01-04 00:00:00"), 1L, "dl", 0.0, "hashB"),
                (5L, ts("2024-01-05 00:00:00"), 2L, "dl", 0.0, "hashB"))
    q.processAllAvailable()
    val out = spark.table("dec_out")
      .select("event_id", "data_decision").as[(Long, String)].collect().toMap
    q.stop()
    assert(out === Map(1L -> "archive", 2L -> "garbage_collect", 3L -> "archive",
      4L -> "garbage_collect", 5L -> "archive"))
  }

  test("streaming sessionization stitches sessions across micro-batch boundaries") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventsPipeline.streamingSessionize(df)
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    // batch 1: two sessions for user 1 (31-min gap), one for user 2
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 1L, "e", 0.0, "p"),
      (2L, ts("2024-01-01 10:10:00"), 1L, "e", 0.0, "p"),
      (3L, ts("2024-01-01 10:41:00"), 1L, "e", 0.0, "p"),
      (4L, ts("2024-01-01 10:00:00"), 2L, "e", 0.0, "p"))
    q.processAllAvailable()
    // batch 2: user 1 continues session 2 WITHIN the gap (must NOT
    // open a new one across the boundary), then a >30-min silence
    // opens session 3; user 2's next event is within its gap
    mem.addData(
      (5L, ts("2024-01-01 10:55:00"), 1L, "e", 0.0, "p"),
      (6L, ts("2024-01-01 11:40:00"), 1L, "e", 0.0, "p"),
      (7L, ts("2024-01-01 10:20:00"), 2L, "e", 0.0, "p"))
    q.processAllAvailable()
    val out = spark.table("sess_out")
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    q.stop()
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L,
      5L -> 2L, 6L -> 3L, 4L -> 1L, 7L -> 1L))
    // exactly-30-min gap stays in-session (strict >, the lag-window rule)
    val mem2 = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df2 = mem2.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q2 = EventsPipeline.streamingSessionize(df2)
      .writeStream.format("memory").queryName("sess_out2").outputMode("append").start()
    mem2.addData(
      (1L, ts("2024-01-01 10:00:00"), 1L, "e", 0.0, "p"),
      (2L, ts("2024-01-01 10:30:00"), 1L, "e", 0.0, "p"))
    q2.processAllAvailable()
    val out2 = spark.table("sess_out2")
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    q2.stop()
    assert(out2 === Map(1L -> 1L, 2L -> 1L))
  }

  test("stream persists to a parquet sink with checkpointing and is readable") {
    implicit val sc = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("stream_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_ckpt").toString
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventsPipeline.windowedAgg(df, withWatermark = true)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    mem.addData((ts("2024-01-01 10:05:00"), "click", 1.0),
                (ts("2024-01-01 10:15:00"), "click", 2.0))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 15:00:00"), "late", 0.0)) // close the 10:00 window
    q.processAllAvailable()
    q.stop()
    val persisted = spark.read.parquet(out)
      .filter(col("event_type") === "click").collect()
    assert(persisted.length === 1)
    assert(persisted.head.getAs[Long]("n_events") === 2L)
  }

  test("CDC stream applies micro-batches of change records to the snapshot") {
    import graft.operators.CdcMerge
    import graft.streaming.CdcStream
    implicit val sc = spark.sqlContext
    val table = java.nio.file.Files.createTempDirectory("cdc_stream").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_ckpt").toString
    // initial snapshot: two live rows
    val base = Seq(("K1", 100L, ts("2024-01-01 00:00:00"), "F"),
                   ("K2", 200L, ts("2024-02-01 00:00:00"), "F"))
      .toDF("k", "price", "transaction_date", "is_deleted")
    graft.sources.Sinks.publishSnapshot(base, "transaction_date", table)

    val mem = MemoryStream[(Long, String, String, Long, Timestamp)]
    val changes = mem.toDF().toDF("seq", "k", "record_op", "price", "transaction_date")
    val q = CdcStream.applyUpdates(changes, table, "k",
        Seq("price", "transaction_date"), seqCol = "seq")
      .option("checkpointLocation", ckpt).start()
    // batch 1: change K1 TWICE (latest wins), add K3
    mem.addData((1L, "K1", "C", 140L, ts("2024-01-01 00:00:00")),
                (2L, "K1", "C", 150L, ts("2024-01-01 00:00:00")),
                (3L, "K3", "A", 300L, ts("2024-03-01 00:00:00")))
    q.processAllAvailable()
    // batch 2: delete K2
    mem.addData((4L, "K2", "D", 200L, ts("2024-02-01 00:00:00")))
    q.processAllAvailable()
    q.stop()

    val fin = graft.sources.Sinks.readSnapshot(spark, table)
      .select("k", "price", "is_deleted")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // exactly 3 rows — the duplicate K1 op in batch 1 must NOT fork the row
    assert(graft.sources.Sinks.readSnapshot(spark, table).count() === 3)
    assert(fin === Map("K1" -> ((150L, "F")), "K2" -> ((200L, "T")), "K3" -> ((300L, "F"))))
  }

  test("CDC stream resumes from its checkpoint across a restart without reapplying batches") {
    import graft.streaming.CdcStream
    import graft.sources.Sinks
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("cdc_restart").toString
    val table = s"$tmp/t"
    Sinks.publishSnapshot(
      Seq(("K1", 100L, ts("2024-01-01 00:00:00"), "F"),
          ("K2", 200L, ts("2024-02-01 00:00:00"), "F"))
        .toDF("k", "price", "transaction_date", "is_deleted"),
      "transaction_date", table)
    def drop(rows: Seq[(Long, String, String, Long, Timestamp)], name: String): Unit =
      Sinks.writeSingleParquetFile(
        rows.toDF("seq", "k", "record_op", "price", "transaction_date"),
        s"$tmp/stage_$name", s"$tmp/in/$name.parquet")
    val schema = Seq((1L, "K1", "C", 140L, ts("2024-01-01 00:00:00")))
      .toDF("seq", "k", "record_op", "price", "transaction_date").schema
    def drain(): Unit = CdcStream.applyUpdates(
        spark.readStream.schema(schema).parquet(s"$tmp/in"),
        table, "k", Seq("price", "transaction_date"), seqCol = "seq")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    drop(Seq((1L, "K1", "C", 150L, ts("2024-01-01 00:00:00"))), "m1")
    drain() // applies month 1, publishes one new version
    val vAfter1 = Sinks.currentVersion(spark, table).get
    // "restart": a fresh query on the SAME checkpoint with a new drop
    drop(Seq((2L, "K2", "D", 200L, ts("2024-02-01 00:00:00"))), "m2")
    drain()
    val fin = Sinks.readSnapshot(spark, table)
      .select("k", "price", "is_deleted")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(fin === Map("K1" -> ((150L, "F")), "K2" -> ((200L, "T"))))
    // exactly ONE more publish after the restart: the checkpoint must
    // skip month 1 instead of reapplying it
    assert(Sinks.currentVersion(spark, table) === Some(vAfter1 + 1))
  }

  test("kafka binding: options contract and JSON value parsing (broker-less)") {
    // the production entry's consumer config — pinned so a config
    // regression is a test failure, not a silent prod change
    val opts = EventsPipeline.kafkaOptions("broker-1:9092,broker-2:9092", "pp-notifications")
    assert(opts("kafka.bootstrap.servers") === "broker-1:9092,broker-2:9092")
    assert(opts("subscribe") === "pp-notifications")
    assert(opts("startingOffsets") === "earliest")
    assert(opts("failOnDataLoss") === "false")
    assert(opts("maxOffsetsPerTrigger").toLong > 0)
    // the value-bytes → typed-event transform over the kafka row shape
    // (binary `value` column), including the malformed-payload drop
    val good =
      """{"event_id":1,"ts":"2024-01-01 10:05:00","user_id":7,"event_type":"click","value":1.5,"props":"p"}"""
    val df = Seq(good, "not json at all").toDF("s")
      .select(col("s").cast("binary").as("value"))
    val parsed = EventsPipeline.parseKafkaEvents(df)
    assert(parsed.schema.fieldNames.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = parsed.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("event_id") === 1L)
    assert(rows.head.getAs[Timestamp]("ts") === ts("2024-01-01 10:05:00"))
    // parsed events feed the same windowed aggregate as batch/file-stream
    val agg = EventsPipeline.windowedAgg(parsed).collect()
    assert(agg.length === 1 && agg.head.getAs[Double]("total_value") === 1.5)
  }

  test("kafka producer encode round-trips through the consumer parse") {
    val events = Seq(
      (1L, ts("2024-01-01 10:05:00"), 7L, "click", 1.5, "p1"),
      (2L, ts("2024-01-02 23:59:59"), 8L, "view", -0.25, "p2"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val wire = EventsPipeline.encodeKafkaEvents(events)
    assert(wire.schema.fieldNames.toSeq === Seq("key", "value"))
    assert(wire.schema.fields.forall(_.dataType.typeName === "binary"))
    // key = series id, so per-series order survives partitioning
    val keys = wire.select(col("key").cast("string")).as[String].collect().toSet
    assert(keys === Set("7", "8"))
    val back = EventsPipeline.parseKafkaEvents(wire)
      .orderBy("event_id")
      .as[(Long, Timestamp, Long, String, Double, String)].collect().toSeq
    assert(back === Seq(
      (1L, ts("2024-01-01 10:05:00"), 7L, "click", 1.5, "p1"),
      (2L, ts("2024-01-02 23:59:59"), 8L, "view", -0.25, "p2")))
  }

  test("file-stream pipeline starts and produces the batch-equivalent schema") {
    val stream = EventsPipeline.eventsWindowStream(spark, sf)
    val batch = EventsPipeline.eventsWindowBatch(spark, sf)
    assert(stream.isStreaming)
    assert(stream.schema.fieldNames.sameElements(batch.schema.fieldNames))
  }

  test("file-stream windowed agg over the REAL events table equals the batch result") {
    // complete mode so every window state row is emitted at the end —
    // the stream/batch agreement the reference had to build by hand
    val q = EventsPipeline.eventsWindowStream(spark, sf)
      .writeStream.format("memory").queryName("real_win").outputMode("complete").start()
    q.processAllAvailable()
    val streamed = spark.table("real_win")
      .orderBy("hour_start", "event_type").collect().map(_.toString).toSeq
    q.stop()
    val batch = EventsPipeline.eventsWindowBatch(spark, sf)
      .collect().map(_.toString).toSeq
    assert(streamed === batch)
  }

  test("kafka corpus binding parses JSON documents and drops malformed payloads") {
    val good = """{"doc_id":42,"text":"a kafka document","lang":"en","source":"bus"}"""
    val df = Seq(good, "garbage payload", """{"lang":"en"}""").toDF("s")
      .select(col("s").cast("binary").as("value"))
    val parsed = CorpusStream.parseKafkaDocs(df)
    assert(parsed.schema.fieldNames.toSeq === Seq("doc_id", "text", "lang", "source"))
    val rows = parsed.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("doc_id") === 42L
      && rows.head.getAs[String]("text") === "a kafka document")
  }

  test("corpus stream dedups by content across micro-batches, admitting min doc_id") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String)]
    val df = mem.toDF().toDF("doc_id", "text", "lang", "source")
    val q = CorpusStream.streamingIngestDedup(df)
      .writeStream.format("memory").queryName("corpus_out").outputMode("append").start()
    mem.addData(
      (5L, "document alpha", "en", "s1"),
      (3L, "document alpha", "en", "s1"), // in-batch copy: 3 wins (min id)
      (7L, "document beta", "en", "s2"))
    q.processAllAvailable()
    mem.addData(
      (9L, "document alpha", "en", "s3"), // cross-batch copy: dropped
      (11L, "document gamma", "de", "s1"))
    q.processAllAvailable()
    val ids = spark.table("corpus_out").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(ids === Set(3L, 7L, 11L))
  }

  test("bounded corpus dedup: state stays flat under a repeating-content stream") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String)]
    val df = mem.toDF().toDF("doc_id", "text", "lang", "source")
    val q = CorpusStream.streamingIngestDedupBounded(df, nShards = 4, maxHashesPerShard = 8)
      .writeStream.format("memory").queryName("corpus_bounded").outputMode("append").start()
    // 10 batches repeating the same 6 documents: an unbounded dedup's
    // output would be right too, but its state would grow with every
    // DISTINCT hash — here state rows are capped at nShards forever
    (0 until 10).foreach { b =>
      mem.addData((0 until 6).map(i => ((b * 100 + i).toLong, s"repeated doc $i", "en", "s")): _*)
      q.processAllAvailable()
    }
    val admitted = spark.table("corpus_bounded").collect()
    val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
    q.stop()
    // each distinct text admitted exactly once (its hash stayed within
    // the retention horizon across all 10 batches), min doc_id wins
    assert(admitted.length === 6)
    assert(admitted.map(_.getLong(0)).toSet === (0L until 6L).toSet)
    assert(stateRows <= 4, s"state rows $stateRows exceed the shard cap")
  }

  test("bounded corpus dedup: fresh content cannot grow state past the cap") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String)]
    val df = mem.toDF().toDF("doc_id", "text", "lang", "source")
    // capacity = 2 shards × 4 hashes = 8; stream 20 batches × 10 FRESH
    // docs — 200 distinct hashes through an 8-hash state
    val q = CorpusStream.streamingIngestDedupBounded(df, nShards = 2, maxHashesPerShard = 4)
      .writeStream.format("memory").queryName("corpus_fresh").outputMode("append").start()
    (0 until 20).foreach { b =>
      mem.addData((0 until 10).map(i => ((b * 10 + i).toLong, s"fresh doc ${b * 10 + i}", "en", "s")): _*)
      q.processAllAvailable()
    }
    val n = spark.table("corpus_fresh").count()
    val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
    q.stop()
    assert(n === 200L) // all fresh → all admitted
    assert(stateRows <= 2, s"state rows $stateRows exceed the shard cap")
  }

  test("bounded corpus dedup: drops copies within the horizon, re-admits beyond it") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String)]
    val df = mem.toDF().toDF("doc_id", "text", "lang", "source")
    // one shard, horizon of 2 hashes → FIFO behavior is fully visible
    val q = CorpusStream.streamingIngestDedupBounded(df, nShards = 1, maxHashesPerShard = 2)
      .writeStream.format("memory").queryName("corpus_fifo").outputMode("append").start()
    mem.addData((1L, "doc A", "en", "s"), (2L, "doc B", "en", "s"))
    q.processAllAvailable()
    mem.addData((3L, "doc A", "en", "s")) // within horizon: dropped
    q.processAllAvailable()
    mem.addData((4L, "doc C", "en", "s"), (5L, "doc D", "en", "s")) // evict A, B
    q.processAllAvailable()
    mem.addData((6L, "doc A", "en", "s")) // beyond horizon: re-admitted
    q.processAllAvailable()
    val ids = spark.table("corpus_fifo").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(ids === Set(1L, 2L, 4L, 5L, 6L))
  }

  test("multi-batch streaming CDC chains published snapshots and equals the batch replay") {
    // two monthly drops at maxFilesPerTrigger=1: batch 1 merges into the
    // snapshot batch 0 published — the composition must equal the batch
    // two-merge fold (the q_cdc_replay semantics)
    val streamed = graft.streaming.CdcStream.streamCdcReplayBatch(spark, sf)
      .select("o_orderkey", "price", "is_deleted").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    val batch = graft.operators.Cdc.replayResult(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(streamed === batch)
  }

  test("bounded-state registered drain admits exactly the unbounded admission set") {
    // horizon sized above the corpus → no eviction → identical output
    val bounded = CorpusStream.ingestDedupBoundedBatch(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val exact = CorpusStream.ingestDedupBatch(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(bounded === exact && bounded.nonEmpty)
  }

  test("jsonl ingest stream quarantines corrupt lines and lands the corpus in parquet") {
    val in = java.nio.file.Files.createTempDirectory("corpusin").toString
    val out = java.nio.file.Files.createTempDirectory("corpusout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("corpusckpt").toString
    val w = new java.io.PrintWriter(new java.io.File(in, "drop1.jsonl"))
    w.println("""{"doc_id": 1, "text": "first doc", "lang": "en", "source": "s"}""")
    w.println("""garbage line""")
    w.println("""{"doc_id": 2, "text": "first doc", "lang": "en", "source": "s"}""")
    w.close()
    val q = CorpusStream.run(spark, in, out, ckpt)
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.parquet(out).collect()
    assert(landed.map(_.getLong(0)).toSet === Set(1L)) // dup 2 dropped, garbage quarantined
    assert(landed.head.schema.fieldNames.toSeq ===
      Seq("doc_id", "content_sha", "text", "lang", "source"))
  }

  test("streaming near-dedup rejects near and exact copies across batches; equals the batch fold") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("nearin").toString
    val out = java.nio.file.Files.createTempDirectory("nearout").toString + "/c"
    val ckpt = java.nio.file.Files.createTempDirectory("nearckpt").toString
    val body = "the quick brown fox jumps over the lazy dog and then naps under the warm tree all afternoon"
    def jline(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "s"}"""
    def drop(name: String, ts: Long, lines: String*): Unit = {
      val f = new java.io.File(in, name)
      val w = new java.io.PrintWriter(f)
      lines.foreach(w.println)
      w.close()
      assert(f.setLastModified(ts))
    }
    val t0 = System.currentTimeMillis()
    // batch 0: two distinct docs + an IN-batch near copy (7 ~ 1, larger
    // id loses) + an in-batch exact copy (9 of 2, larger id loses)
    drop("b0.jsonl", t0,
      jline(1, body),
      jline(2, "a completely different second story about winter storms on the coast road"),
      jline(7, body + " extra"),
      jline(9, "a completely different second story about winter storms on the coast road"))
    // batch 1: a near copy of doc 1, an exact copy of doc 2, one new doc
    drop("b1.jsonl", t0 + 60000L,
      jline(20, body + " trailing remark"),
      jline(21, "a completely different second story about winter storms on the coast road"),
      jline(22, "an entirely new third narrative concerning spring gardens and morning rain"))
    CorpusStream.runNearDedup(spark, in, out, ckpt, threshold = 0.5,
      availableNow = true, maxFilesPerTrigger = 1).awaitTermination()
    val admitted = spark.read.parquet(out)
    assert(admitted.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 22L))
    // arrival order is recorded: batch 1's admission lives in batch=1
    assert(admitted.filter(col("batch") === 1).select("doc_id").as[Long]
      .collect().toSet === Set(22L))
    // the streaming query IS the fold of admitNearBatch over its
    // micro-batches: replay the same two batches by hand and compare
    val outB = java.nio.file.Files.createTempDirectory("nearfold").toString + "/c"
    def batchDf(rows: (Long, String)*) =
      rows.toSeq.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    CorpusStream.admitNearBatch(batchDf(
      1L -> body,
      2L -> "a completely different second story about winter storms on the coast road",
      7L -> (body + " extra"),
      9L -> "a completely different second story about winter storms on the coast road"),
      outB, 0L, 0.5)
    CorpusStream.admitNearBatch(batchDf(
      20L -> (body + " trailing remark"),
      21L -> "a completely different second story about winter storms on the coast road",
      22L -> "an entirely new third narrative concerning spring gardens and morning rain"),
      outB, 1L, 0.5)
    val fold = spark.read.parquet(outB)
      .select("doc_id", "content_sha", "text", "batch").collect().map(_.toString).sorted
    val stream = admitted
      .select("doc_id", "content_sha", "text", "batch").collect().map(_.toString).sorted
    assert(stream.sameElements(fold))
  }

  test("band-index compaction folds per-batch partitions; rejection state stays intact") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("nearcompact").toString + "/c"
    val body = "a sufficiently long document body for reliable shingling and banding here"
    def b(rows: (Long, String)*) =
      rows.toSeq.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    CorpusStream.admitNearBatch(b(1L -> body), out, 0L, 0.5)
    CorpusStream.admitNearBatch(
      b(2L -> "a wholly different second story with plenty of words to shingle on"), out, 1L, 0.5)
    CorpusStream.compactBandIndex(spark, out)
    val dirs = new java.io.File(s"$out/_bands").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === Set("batch=-1"), s"expected one consolidated partition, got $dirs")
    // the folded index still rejects a near copy of batch 0's doc
    CorpusStream.admitNearBatch(b(30L -> (body + " extra tail")), out, 2L, 0.5)
    val admitted = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(admitted === Set(1L, 2L))
  }

  test("stream-stream attribution join: pairs match batch, state stays bounded") {
    implicit val sc = spark.sqlContext
    val vMem = MemoryStream[(Long, Timestamp, Long)]
    val cMem = MemoryStream[(Long, Timestamp, Long)]
    val views = vMem.toDF().toDF("view_user", "view_ts", "view_id")
    val clicks = cMem.toDF().toDF("click_user", "click_ts", "click_id")
    val q = EventsPipeline.attributionPairs(views, clicks, withWatermark = true)
      .writeStream.format("memory").queryName("attr_out").outputMode("append").start()
    // u1: view 10:00; clicks at 10:00 sharp (gap 0 — same instant is
    // INCLUSIVE), 10:30 (in window), 11:00 (exactly one hour — the
    // window edge is EXCLUSIVE, dropped) and one ms past (dropped);
    // u2's click must not pair with u1's view
    vMem.addData((1L, ts("2024-01-01 10:00:00"), 100L))
    cMem.addData(
      (1L, ts("2024-01-01 10:00:00"), 199L),
      (1L, ts("2024-01-01 10:30:00"), 200L),
      (1L, ts("2024-01-01 11:00:00"), 201L),
      (1L, new Timestamp(ts("2024-01-01 11:00:00").getTime + 1), 202L),
      (2L, ts("2024-01-01 10:30:00"), 300L))
    q.processAllAvailable()
    val got = spark.table("attr_out")
      .select("user_id", "click_id", "view_id", "gap_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    q.stop()
    assert(got === Array((1L, 199L, 100L, 0L), (1L, 200L, 100L, 1800000000L)))
    // the batch plan over the same rows agrees exactly
    import spark.implicits._
    val vb = Seq((1L, ts("2024-01-01 10:00:00"), 100L))
      .toDF("view_user", "view_ts", "view_id")
    val cb = Seq(
      (1L, ts("2024-01-01 10:00:00"), 199L),
      (1L, ts("2024-01-01 10:30:00"), 200L),
      (1L, ts("2024-01-01 11:00:00"), 201L),
      (1L, new Timestamp(ts("2024-01-01 11:00:00").getTime + 1), 202L),
      (2L, ts("2024-01-01 10:30:00"), 300L))
      .toDF("click_user", "click_ts", "click_id")
    val batch = EventsPipeline.attributionPairs(vb, cb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(batch === got)
  }

  test("outer attribution: unmatched clicks emit with null view only after the watermark") {
    implicit val sc = spark.sqlContext
    val vMem = MemoryStream[(Long, Timestamp, Long)]
    val cMem = MemoryStream[(Long, Timestamp, Long)]
    val q = EventsPipeline.attributionPairsOuter(
        vMem.toDF().toDF("view_user", "view_ts", "view_id"),
        cMem.toDF().toDF("click_user", "click_ts", "click_id"),
        withWatermark = true)
      .writeStream.format("memory").queryName("attro_out").outputMode("append").start()
    vMem.addData((1L, ts("2024-01-01 10:00:00"), 100L))
    cMem.addData((1L, ts("2024-01-01 10:30:00"), 200L),
                 (2L, ts("2024-01-01 10:30:00"), 300L))
    q.processAllAvailable()
    val early = spark.table("attro_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // the inner match emits immediately; u2's unmatched click must NOT
    // have emitted yet — the watermark hasn't proven no view can come
    assert(early.toSet === Set((1L, 200L)))
    // advance BOTH watermarks well past 10:30 + 1h
    vMem.addData((9L, ts("2024-01-01 14:00:00"), 900L))
    cMem.addData((9L, ts("2024-01-01 14:00:00"), 901L))
    q.processAllAvailable()
    val rows = spark.table("attro_out")
      .select("user_id", "click_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    q.stop()
    assert(rows.toSet.contains((2L, 300L, None)), rows.mkString(", "))
    assert(rows.toSet.contains((1L, 200L, Some(100L))))
  }

  test("streaming near-dedup batch write is idempotent under a foreachBatch retry") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("nearretry").toString + "/c"
    def b(rows: (Long, String)*) =
      rows.toSeq.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    val batch = b(1L -> "some long enough first document body for shingling purposes here",
                  2L -> "another long enough second document body for shingling purposes too")
    CorpusStream.admitNearBatch(batch, out, 0L, 0.5)
    // a crash between sink write and commit re-runs the same batch id:
    // the per-batch-directory overwrite must not duplicate admissions
    CorpusStream.admitNearBatch(batch, out, 0L, 0.5)
    assert(spark.read.parquet(out).count() === 2)
  }

  test("graft-zip stream picks up newly landed archives from the checkpoint") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = java.nio.file.Files.createTempDirectory("zip_stream").toString
    val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
    def drop(name: String, entry: String, body: String): Unit = {
      val zos = new ZipOutputStream(new java.io.FileOutputStream(s"$dir/$name"))
      zos.putNextEntry(new ZipEntry(entry))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry(); zos.close()
    }
    def drain(): Unit =
      spark.readStream.format("graft-zip")
        .option("maxFilesPerTrigger", "1")
        .load(s"$dir/*.zip")
        .writeStream
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(out)
        .awaitTermination()
    drop("feed_001.zip", "a.txt", "alpha")
    drop("feed_002.zip", "b.txt", "beta")
    drain()
    val first = spark.read.parquet(out).select("entry").as[String].collect().sorted
    assert(first === Array("a.txt", "b.txt"))
    // a new archive lands; the SAME checkpoint resumes past the old
    // offset and processes ONLY the new file
    drop("feed_003.zip", "c.txt", "gamma")
    drain()
    val second = spark.read.parquet(out).select("entry").as[String].collect().sorted
    assert(second === Array("a.txt", "b.txt", "c.txt"))
    // draining again with nothing new appends nothing (offset stable)
    drain()
    assert(spark.read.parquet(out).count() === 3)
  }

  test("gated ingest: green batches land, a red batch quarantines whole with its report") {
    import graft.operators.QualityGate
    val dir = java.nio.file.Files.createTempDirectory("gated_stream").toString
    val in = s"$dir/in"; new java.io.File(in).mkdirs()
    val corpus = s"$dir/corpus"
    def drop(name: String, lines: Seq[String]): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(in, name))
      lines.foreach(w.println); w.close()
    }
    def doc(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "s"}"""
    drop("a.jsonl", Seq(doc(1, "alpha"), doc(2, "beta")))
    // red: doc_id 3 repeats AND one empty text — two distinct violations
    drop("b.jsonl", Seq(doc(3, "gamma"), doc(3, "delta"), doc(4, "")))
    // green again: the quarantined batch must not poison later admissions
    drop("c.jsonl", Seq(doc(5, "epsilon")))
    CorpusStream.runGatedIngest(spark, in, corpus, s"$dir/ckpt",
      Seq(QualityGate.unique("doc_id"),
        QualityGate.ScalarCheck("min_len:text", length(col("text")) < 1)),
      availableNow = true, maxFilesPerTrigger = 1)
      .awaitTermination()
    val admitted = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted
    assert(admitted === Array(1L, 2L, 5L)) // batch b excluded WHOLE
    val qroot = new java.io.File(s"$corpus/_quarantine")
    val qBatches = qroot.listFiles().filter(_.isDirectory)
    assert(qBatches.length === 1)
    val q = qBatches.head.toString
    val qRows = spark.read.parquet(s"$q/rows")
      .select("doc_id").as[Long].collect().sorted
    assert(qRows === Array(3L, 3L, 4L)) // evidence rows kept verbatim
    val report = spark.read.parquet(s"$q/report")
      .as[(String, Long)].collect().toMap
    assert(report === Map("unique:doc_id" -> 1L, "min_len:text" -> 1L))
  }

  test("gated ingest: an all-green feed writes no quarantine directory at all") {
    import graft.operators.QualityGate
    val dir = java.nio.file.Files.createTempDirectory("gated_green").toString
    val in = s"$dir/in"; new java.io.File(in).mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(in, "a.jsonl"))
    w.println("""{"doc_id": 1, "text": "alpha", "lang": "en", "source": "s"}""")
    w.close()
    CorpusStream.runGatedIngest(spark, in, s"$dir/corpus", s"$dir/ckpt",
      Seq(QualityGate.notNull("doc_id")), availableNow = true)
      .awaitTermination()
    assert(spark.read.parquet(s"$dir/corpus").count() === 1)
    assert(!new java.io.File(s"$dir/corpus/_quarantine").exists())
  }
}
