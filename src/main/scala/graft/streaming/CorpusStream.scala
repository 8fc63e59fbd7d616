package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.sources.JsonlDocs

/** Streaming ingest of a training corpus: JSONL documents arrive
  * continuously (crawl output, upstream export), are deduped against
  * everything already admitted, and land in the corpus sink — the
  * streaming counterpart of the batch incremental-dedup tier
  * (NearDedup.incrementalExactOf).
  */
object CorpusStream {

  /** Unbounded JSONL document stream from a watched directory — the
    * same schema-first, corrupt-line-quarantining contract as the
    * batch reader (JsonlDocs); `maxFilesPerTrigger` bounds micro-batch
    * size so one giant drop can't stall the query. */
  def ingestJsonl(spark: SparkSession, inputDir: String,
                  maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(JsonlDocs.schema.add("_corrupt_record",
        org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inputDir)
      // a line missing the text field is valid JSON (not corrupt) but
      // useless — and sha2(null) would collapse every null-text doc
      // into ONE dedup state key; same text.isNotNull contract as the
      // Kafka entry
      .filter(col("_corrupt_record").isNull && col("text").isNotNull
        && col("doc_id").isNotNull)
      .select("doc_id", "text", "lang", "source")

  /** Streaming exact dedup across the WHOLE ingest history: the state
    * key IS the content hash, so every future copy of an admitted
    * document hits the same state partition and is dropped — exact
    * first-writer-wins at any parallelism. State per key is one
    * boolean (~the hash itself in the store), sharded across
    * executors like any keyed state; retention on unbounded streams
    * is a deployment dial (RocksDB state backend + a periodic
    * snapshot-and-rebuild, the trade every streaming dedup makes) —
    * a processing-time timeout here would make the default
    * zero-interval trigger churn empty timeout-check batches
    * back-to-back. Output: the admitted (first-occurrence)
    * documents. */
  def streamingIngestDedup(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(sha2(col("text"), 256).as("content_sha"), col("doc_id"),
        col("text"), col("lang"), col("source"))
      .as[(String, Long, String, String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, String, String, String, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (sha: String, rows: Iterator[(String, Long, String, String, String)],
         state: GroupState[Boolean]) =>
          val seen = state.getOption.getOrElse(false)
          state.update(true)
          if (seen) Iterator.empty
          else {
            // first micro-batch may carry in-batch copies too: admit
            // exactly one (the minimum doc_id, deterministically)
            val first = rows.minBy(_._2)
            Iterator.single((first._2, sha, first._3, first._4, first._5))
          }
      }
      .toDF("doc_id", "content_sha", "text", "lang", "source")
  }

  /** value-bytes → typed document rows; shared by the Kafka entry and
    * its broker-less spec. Malformed payloads parse to null doc_id and
    * are dropped — same corrupt-tolerance as the file reader. */
  def parseKafkaDocs(kafkaRows: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.StringType
    kafkaRows
      .select(from_json(col("value").cast(StringType), JsonlDocs.schema).as("d"))
      .select("d.*")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
  }

  /** Production ingest entry: documents arriving as JSON values on a
    * Kafka topic (the crawl-output bus) instead of file drops — same
    * options contract as the events binding (EventsPipeline), same
    * downstream dedup. No broker in the sandbox: the spec pins the
    * options and the parse transform. */
  def ingestKafka(spark: SparkSession, bootstrap: String, topic: String): DataFrame = {
    val raw = spark.readStream.format("kafka")
      .options(EventsPipeline.kafkaOptions(bootstrap, topic))
      .load()
    streamingIngestDedup(parseKafkaDocs(raw))
  }

  /** End-to-end: watched JSONL directory → history-wide dedup →
    * append-only parquet corpus. Checkpointed, so a restarted query
    * resumes with its dedup state intact. */
  def run(spark: SparkSession, inputDir: String, corpusPath: String,
          checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    streamingIngestDedup(ingestJsonl(spark, inputDir))
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .start(corpusPath)
}
