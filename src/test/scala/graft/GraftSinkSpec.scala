package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DeletionVectors, GraftStreamSink, Sinks}

/** The native streaming SINK into the snapshot store:
  * `writeStream.format("graft-table")` — bootstrap publish + one MoR
  * link per micro-batch (append/update), full replaces (complete),
  * and the batch-id ledger that makes restart re-delivery
  * exactly-once. */
class GraftSinkSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("k", "s")
    .withColumn("d", to_date(lit("2024-08-15"))).select("k", "d", "s")

  private def stateOf(t: String): Map[Long, String] =
    DeletionVectors.readMerged(spark, t).select("k", "s").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("append streams land as bootstrap publish + MoR links per batch") {
    val base = graft.util.Scratch.dir("sink_spec")
    val in = s"$base/in"
    df(1L -> "a", 2L -> "b").repartition(1).write.parquet(in)
    df(3L -> "c").repartition(1).write.mode("append").parquet(in)
    val tbl = s"$base/t"
    spark.readStream.schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .writeStream.format("graft-table")
      .option("dateCol", "d").option("keyCol", "k").option("retainVersions", "100")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start(tbl).awaitTermination()
    assert(stateOf(tbl) == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // one bootstrap data version, one link per later batch
    val kinds = Sinks.history(spark, tbl).select("version", "kind").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds(1L) == "data")
    assert(kinds.values.count(_ == "upsert-link") == kinds.size - 1)
    // new files resume from the checkpoint: one more link, state grows
    df(4L -> "e").repartition(1).write.mode("append").parquet(in)
    spark.readStream.schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .writeStream.format("graft-table")
      .option("dateCol", "d").option("keyCol", "k").option("retainVersions", "100")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start(tbl).awaitTermination()
    assert(stateOf(tbl) == Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "e"))
  }

  test("re-delivered batch ids are skipped: exactly-once on restart") {
    val tbl = graft.util.Scratch.dir("sink_once") + "/t"
    val sink = new GraftStreamSink(spark,
      Map("path" -> tbl, "datecol" -> "d", "keycol" -> "k"), OutputMode.Append())
    sink.addBatch(0L, df(1L -> "a"))
    sink.addBatch(1L, df(2L -> "b"))
    val head = Sinks.currentVersion(spark, tbl).get
    // the engine re-delivers the last batch after a crash — no new
    // commit, no double-apply
    sink.addBatch(1L, df(2L -> "b"))
    assert(Sinks.currentVersion(spark, tbl).contains(head))
    assert(stateOf(tbl) == Map(1L -> "a", 2L -> "b"))
    sink.addBatch(2L, df(3L -> "c")) // the next real batch still lands
    assert(Sinks.currentVersion(spark, tbl).contains(head + 1))
    assert(stateOf(tbl) == Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("complete mode full-replaces per batch; update mode dedups keys") {
    val tbl = graft.util.Scratch.dir("sink_modes") + "/t"
    val complete = new GraftStreamSink(spark,
      Map("path" -> tbl, "datecol" -> "d"), OutputMode.Complete())
    complete.addBatch(0L, df(1L -> "a", 2L -> "b"))
    complete.addBatch(1L, df(9L -> "z"))
    assert(stateOf(tbl) == Map(9L -> "z"), "complete replaces the whole state")
    assert(Sinks.history(spark, tbl).filter(col("kind") === "data").count() == 2)
    // update mode: several images of one key in a batch collapse to one
    val tbl2 = graft.util.Scratch.dir("sink_modes") + "/t2"
    val update = new GraftStreamSink(spark,
      Map("path" -> tbl2, "datecol" -> "d", "keycol" -> "k"), OutputMode.Update())
    update.addBatch(0L, df(1L -> "a"))
    update.addBatch(1L, df(1L -> "x", 1L -> "x", 2L -> "b"))
    assert(stateOf(tbl2)(2L) == "b")
    assert(Set("a", "x").contains(stateOf(tbl2)(1L))) // single image kept
    assert(DeletionVectors.readMerged(spark, tbl2).count() == 2)
  }

  test("append mode without keyCol and missing dateCol refuse up front") {
    intercept[IllegalArgumentException] {
      new GraftStreamSink(spark, Map("path" -> "/tmp/x", "datecol" -> "d"),
        OutputMode.Append())
    }
    intercept[IllegalArgumentException] {
      new GraftStreamSink(spark, Map("path" -> "/tmp/x", "keycol" -> "k"),
        OutputMode.Append())
    }
  }
}
