package org.apache.spark.sql.graftstream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}

/** The ONE `private[sql]` seam a V1 streaming Source built outside
  * Spark's tree needs: `getBatch` must return a DataFrame whose
  * logical plan is flagged `isStreaming`, and the only constructor for
  * that flag is `SparkSession.internalCreateDataFrame` — the exact
  * call Spark's own `FileStreamSource` makes (FileStreamSource.scala's
  * `dataFrameBuilder`). This shim lives in an `org.apache.spark.sql`
  * subpackage purely to satisfy the access qualifier; it adds no
  * behavior. The wrapped plan executes distributed exactly as built —
  * `toRdd` is the physical plan's InternalRow RDD, re-rooted as a
  * LogicalRDD with the streaming flag set. */
object StreamingFrame {
  def toStreaming(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    classic.sparkSession.asInstanceOf[ClassicSession]
      .internalCreateDataFrame(classic.queryExecution.toRdd, df.schema,
        isStreaming = true)
  }

  /** The sink-side inverse: a V1 `Sink.addBatch` receives a
    * streaming-flagged DataFrame that refuses batch writers — re-root
    * its physical plan as a plain batch frame (the ForeachBatchSink /
    * FileStreamSink move) so the store's publish paths can write it. */
  def toBatch(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    classic.sparkSession.asInstanceOf[ClassicSession]
      .internalCreateDataFrame(classic.queryExecution.toRdd, df.schema,
        isStreaming = false)
  }
}
