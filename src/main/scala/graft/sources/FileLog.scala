package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * mid-append sees a consistent prefix of the log. All paths go
  * through the Hadoop `FileSystem` API, so the log is durable on any
  * cluster filesystem, not just the local disk. The sequence number
  * is CLAIMED by a conditional create under `_seq` (a new file name
  * per seq — create fails if it exists), so two concurrent appends
  * can never commit the same number; the reference gets the same
  * guarantee from its Postgres serial primary key.
  */
object FileLog {

  case class Entry(seq: Long, file_name: String, sha256: String,
                   decision: String, logged_at: java.sql.Timestamp)

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The full log, empty-schema-safe when nothing was ever appended.
    * Existence is checked through the Hadoop FS (a `java.io.File`
    * probe would silently read any non-local log as empty and reset
    * the sequence); `_`-prefixed coordination dirs are invisible to
    * the parquet scan, so a claimed-but-unwritten append can't break
    * schema inference. */
  def read(spark: SparkSession, logDir: String): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(logDir)
    val fs = fsOf(spark, root)
    val hasData = fs.exists(root) &&
      fs.listStatus(root).exists(s => !s.getPath.getName.startsWith("_"))
    if (hasData) spark.read.parquet(logDir)
    else Seq.empty[Entry].toDF()
  }

  /** Append one decision row; returns the assigned sequence number
    * (monotone per log — the replay/ordering key the reference gets
    * from its serial primary key). Concurrent appenders both read the
    * same max(seq), but only one wins the conditional create of the
    * `_seq` claim for it; the other retries with the next number. */
  def append(spark: SparkSession, logDir: String, fileName: String,
             sha256: String, decision: String): Long = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(logDir)
    val fs = fsOf(spark, root)
    val guess = read(spark, logDir).agg(max(col("seq"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r                  => r.getLong(0) + 1L
    }
    val seq = Sinks.claimNumber(fs, new org.apache.hadoop.fs.Path(root, "_seq"),
      guess, "s")
    // staged in a PRIVATE dir, renamed to the claim-unique final name:
    // concurrent appends through Spark's shared `_temporary` job-commit
    // dir would race each other's cleanup, and the checked single-file
    // rename is atomic where the committer isn't
    Sinks.writeSingleParquetFile(
      Seq(Entry(seq, fileName, sha256, decision,
          new java.sql.Timestamp(System.currentTimeMillis()))).toDF(),
      f"$logDir%s/_staging/s$seq%08d",
      f"$logDir%s/part-s$seq%08d.parquet")
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
