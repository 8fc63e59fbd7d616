package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Durable ingest/decision log — the Spark analog of the reference's
  * Postgres `*_download_file_log` tables
  * (create_table_pp_complete_download_file_log.py): one row per
  * downloaded file with its content hash and the archive /
  * garbage_collect decision, surviving process restarts so the
  * data-decision service can compare against the LAST INGESTED hash
  * after a crash or redeploy.
  *
  * Storage is an append-only parquet directory: each append writes a
  * new file, so no existing data is ever rewritten and a reader
  * mid-append sees a consistent prefix of the log. Like the
  * reference's daily cron, the writer is single-process (appends are
  * not coordinated across concurrent writers — the sequence number
  * comes from a read-then-write).
  */
object FileLog {

  case class Entry(seq: Long, file_name: String, sha256: String,
                   decision: String, logged_at: java.sql.Timestamp)

  /** The full log, empty-schema-safe when nothing was ever appended. */
  def read(spark: SparkSession, logDir: String): DataFrame = {
    import spark.implicits._
    if (new java.io.File(logDir).exists())
      spark.read.parquet(logDir)
    else
      Seq.empty[Entry].toDF()
  }

  /** Append one decision row; returns the assigned sequence number
    * (monotone per log — the replay/ordering key the reference gets
    * from its serial primary key). */
  def append(spark: SparkSession, logDir: String, fileName: String,
             sha256: String, decision: String): Long = {
    import spark.implicits._
    val seq = read(spark, logDir).agg(max(col("seq"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r                  => r.getLong(0) + 1L
    }
    Seq(Entry(seq, fileName, sha256, decision,
        new java.sql.Timestamp(System.currentTimeMillis())))
      .toDF()
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(logDir)
    seq
  }

  /** The content hash of the most recently INGESTED file (decision
    * `archive`) — what the reference's data-decision service compares
    * a fresh download against. Garbage-collected (duplicate) entries
    * never advance it. */
  def latestIngestedHash(spark: SparkSession, logDir: String): Option[String] = {
    val top = read(spark, logDir)
      .filter(col("decision") === "archive")
      .orderBy(col("seq").desc)
      .select("sha256")
      .limit(1)
      .collect()
    top.headOption.map(_.getString(0))
  }
}
