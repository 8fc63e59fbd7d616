package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row
import graft.operators.CdcMerge
import graft.sources.Sinks

/** The reference's database-updater service as a stream: change
  * records arrive continuously (Kafka in production, any source in
  * tests), and each micro-batch is applied to the snapshot through
  * the SAME CdcMerge.mergeBroadcast used by the batch path — one
  * merge semantics for backfill and live data, with the update
  * cadence controlled by the trigger (the reference's CRON becomes
  * `Trigger.ProcessingTime`).
  */
object CdcStream {

  /** Apply each micro-batch of change records to the snapshot at
    * `tablePath`. The batch is tiny vs the table → broadcast merge,
    * snapshot swapped atomically per batch (same recovery-copy
    * protocol as Pipeline.applyMonthly). Returns the writer,
    * untriggered — caller picks trigger + checkpoint and starts. */
  def applyUpdates(changes: DataFrame, tablePath: String, key: String,
                   compareCols: Seq[String]): DataStreamWriter[Row] =
    changes.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val base = spark.read.parquet(tablePath).drop("txn_month")
          val merged = CdcMerge.mergeBroadcast(base, batch, key, compareCols)
          val next = CdcMerge.applied(merged).drop("outcome")
          val tmp = tablePath + ".next"
          Sinks.writeMonthlySnapshot(next, "transaction_date", tmp)
          val dst = new org.apache.hadoop.fs.Path(tablePath)
          val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val old = new org.apache.hadoop.fs.Path(tablePath + ".old")
          fs.delete(old, true)
          if (!fs.rename(dst, old))
            throw new java.io.IOException(s"cdc stream batch $batchId: could not move $dst aside")
          if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)) {
            fs.rename(old, dst)
            throw new java.io.IOException(s"cdc stream batch $batchId: could not install $tmp")
          }
          fs.delete(old, true)
          ()
        }
      }

  /** Daily cadence, like the reference's CRON trigger. */
  def dailyTrigger: Trigger = Trigger.ProcessingTime("24 hours")
}
