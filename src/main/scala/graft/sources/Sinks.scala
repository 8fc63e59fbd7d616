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

  /** Training-corpus export layout: the packed manifest (or any doc
    * table) written as split-partitioned, shard-distributed compressed
    * JSONL — the interchange format trainer data loaders consume.
    * Partitioning by split keeps train/val/test physically separate;
    * repartitioning by shard gives each loader worker one file set. */
  def writeCorpusJsonl(df: DataFrame, path: String,
                       splitCol: String = "split",
                       shardCol: String = "shard"): Unit =
    df.repartition(col(shardCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(splitCol)
      .option("compression", "gzip")
      .json(path)
}

/** Read-side for JSONL corpora — the standard LLM training-data
  * interchange format. Schema-FIRST: at 100 TB, schema inference
  * would be a full extra pass over the data before the real job
  * starts, so a reader without an explicit schema is a bug, not a
  * convenience. */
object JsonlDocs {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.types._

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true)))

  /** Read a JSONL corpus (optionally gzipped — Spark decompresses by
    * extension). Corrupt lines land in `_corrupt_record` instead of
    * failing the job (PERMISSIVE), mirroring how a web-scale crawl
    * always contains malformed documents. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Clean view: parseable rows only, contract columns only. */
  def readClean(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .filter(org.apache.spark.sql.functions.col("_corrupt_record").isNull)
      .select("doc_id", "text", "lang", "source")
}
