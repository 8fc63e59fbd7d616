package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-side of the engine — the Spark analog of the reference's
  * database-upload services. Instead of row-inserts into Postgres
  * (pp_complete_db_upload.py), the table IS a partitioned parquet
  * dataset: month-partitioned snapshots, overwritable per partition.
  */
object Sinks {

  /** Full-replace snapshot upload, partitioned by transaction month —
    * the layout that makes the reference's analyst queries ("one
    * category, one period") partition-prunable at 100 TB. Dynamic
    * partition overwrite replaces only the months present in `df`
    * (the monthly update case) instead of the whole table. */
  def writeMonthlySnapshot(df: DataFrame, dateCol: String, path: String): Unit =
    df.withColumn("txn_month", date_format(col(dateCol), "yyyy-MM"))
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("txn_month")
      .parquet(path)

  /** Atomically replace the snapshot at `tablePath` with `df`:
    * write to `<table>.next`, move the live table aside, install, drop
    * the recovery copy — every rename checked, restore on failure.
    * The single swap protocol shared by the batch (Pipeline) and
    * streaming (CdcStream) update paths. */
  def replaceSnapshot(df: DataFrame, dateCol: String, tablePath: String): Unit = {
    val spark = df.sparkSession
    val tmp = tablePath + ".next"
    writeMonthlySnapshot(df, dateCol, tmp)
    val dst = new org.apache.hadoop.fs.Path(tablePath)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(tablePath + ".old")
    fs.delete(old, true)
    if (!fs.rename(dst, old))
      throw new java.io.IOException(s"snapshot swap: could not move $dst aside")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)) {
      fs.rename(old, dst) // restore
      throw new java.io.IOException(s"snapshot swap: could not install $tmp")
    }
    fs.delete(old, true)
    ()
  }

  /** Bucketed write for co-located joins: repeated joins on `keyCol`
    * (e.g. reconciliations) read both sides pre-partitioned, no
    * shuffle. Parquet `bucketBy` requires saveAsTable (metastore);
    * repartition-by-key + sorted files is the metastore-free variant
    * that still gives one file per key range. */
  def writeKeyPartitioned(df: DataFrame, keyCol: String, path: String,
                          numFiles: Int = 32): Unit =
    df.repartition(numFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
}
