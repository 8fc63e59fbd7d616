package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QualityGate
import graft.sources.{Branches, Sinks, Wap}

/** Write-audit-publish lifecycle: green fast-forward, red isolation
  * with the branch left for inspection, retry-supersedes, and the
  * three-way path when main moves mid-cycle. */
class WapSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def state(rows: (Long, String, Long)*): org.apache.spark.sql.DataFrame =
    rows.toDF("k", "v", "d").withColumn("d", to_date(concat(lit("2024-01-0"), col("d"))))

  private def snap(tbl: String): Map[Long, String] =
    Sinks.readSnapshot(spark, tbl).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private val checks = Seq(QualityGate.notNull("v"), QualityGate.unique("k"))
  private val cmp = Seq("v", "d")

  private def fresh(): String = {
    val tbl = graft.util.Scratch.dir("wap_spec") + "/t"
    Sinks.publishSnapshot(state((1L, "a", 1), (2L, "b", 1)), "d", tbl,
      retainVersions = 8)
    tbl
  }

  test("green feed fast-forwards; the audit ref is dropped after publish") {
    val tbl = fresh()
    val v = Wap.writeAuditPublish(state((1L, "A", 1), (2L, "b", 1)), "d", tbl,
      checks, "k", cmp, retainVersions = 8)
    assert(Sinks.currentVersion(spark, tbl).contains(v))
    assert(snap(tbl) == Map(1L -> "A", 2L -> "b"))
    intercept[java.io.FileNotFoundException] {
      Branches.branchBase(spark, tbl, "wap_audit")
    }
  }

  test("red feed dies at the audit: main isolated, branch left at the bad commit; retry supersedes") {
    val tbl = fresh()
    val e = intercept[QualityGate.ExpectationsFailed] {
      Wap.writeAuditPublish(state((1L, null, 1), (2L, "b", 1), (2L, "dup", 1)),
        "d", tbl, checks, "k", cmp, retainVersions = 8)
    }
    assert(e.report.toMap == Map("not_null:v" -> 1L, "unique:k" -> 1L))
    // main never saw it
    assert(snap(tbl) == Map(1L -> "a", 2L -> "b"))
    // the bad commit is inspectable on the ref
    assert(Branches.readBranch(spark, tbl, "wap_audit").count() === 3L)
    // retry with the corrected frame on the SAME ref supersedes and publishes
    val v = Wap.writeAuditPublish(state((1L, "A", 1), (2L, "b", 1)), "d", tbl,
      checks, "k", cmp, retainVersions = 8)
    assert(Sinks.currentVersion(spark, tbl).contains(v))
    assert(snap(tbl) == Map(1L -> "A", 2L -> "b"))
  }

  test("incremental WAP stages one MoR link and fast-forwards the chain — base never rewritten") {
    val tbl = fresh() // v1: (1,a) (2,b)
    val noDel = spark.emptyDataFrame.select(lit(0L).as("k")).limit(0)
    val v = Wap.writeAuditPublishDelta(spark, tbl,
      state((1L, "A", 1), (3L, "n", 2)), noDel, checks, "k", cmp, "d",
      retainVersions = 8)
    assert(v === 2L) // the staged link itself became live: no rewrite
    assert(Sinks.currentVersion(spark, tbl).contains(2L))
    val live = graft.sources.DeletionVectors.readMerged(spark, tbl)
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(live == Map(1L -> "A", 2L -> "b", 3L -> "n"))
    // red delta: the staged link fails the audit, main's merged state
    // holds; the retry must correct the bad key (it chains OVER the
    // bad link, superseding its image)
    intercept[QualityGate.ExpectationsFailed] {
      Wap.writeAuditPublishDelta(spark, tbl, state((5L, null, 1)), noDel,
        checks, "k", cmp, "d", retainVersions = 8)
    }
    assert(graft.sources.DeletionVectors.readMerged(spark, tbl)
      .count() === 3L)
    val v2 = Wap.writeAuditPublishDelta(spark, tbl, state((5L, "ok", 1)), noDel,
      checks, "k", cmp, "d", retainVersions = 8)
    assert(Sinks.currentVersion(spark, tbl).contains(v2))
    val healed = graft.sources.DeletionVectors.readMerged(spark, tbl)
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(healed == Map(1L -> "A", 2L -> "b", 3L -> "n", 5L -> "ok"))
  }

  test("continuous WAP: green batches fast-forward, the poison batch quarantines and its link erases") {
    val tbl = fresh() // v1: (1,a) (2,b)
    val in = graft.util.Scratch.dir("wap_stream_spec_in")
    val ckpt = graft.util.Scratch.dir("wap_stream_spec_ck")
    def drop(name: String, rows: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = s"$in/_stage_$name"
      rows.coalesce(1).write.parquet(tmp)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .foreach(s => fs.rename(s.getPath,
          new org.apache.hadoop.fs.Path(s"$in/$name.parquet")))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
    drop("a", state((3L, "n", 2)))
    drop("b", state((4L, null, 1)))
    def drain(): Unit = graft.sources.Wap.runWapIngest(
      spark.readStream.schema(state((0L, "x", 1)).schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*.parquet"),
      tbl, ckpt, checks, "k", cmp, "d", retainVersions = 100,
      availableNow = true).awaitTermination()
    drain()
    val live = graft.sources.DeletionVectors.readMerged(spark, tbl)
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(live == Map(1L -> "a", 2L -> "b", 3L -> "n"))
    // the poison batch is quarantined whole with its report
    assert(spark.read.parquet(s"$tbl/_quarantine/batch=*/rows").count() === 1L)
    assert(spark.read.parquet(s"$tbl/_quarantine/batch=*/report")
      .select("check_name").as[String].collect().toSet === Set("not_null:v"))
    // no ref left behind (green dropped it; red erased the poison link)
    intercept[java.io.FileNotFoundException] {
      Branches.branchBase(spark, tbl, "wap_stream")
    }
    // the pipeline keeps ingesting after the poison: a later drop lands
    drop("c", state((5L, "z", 1)))
    drain()
    val healed = graft.sources.DeletionVectors.readMerged(spark, tbl)
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(healed == Map(1L -> "a", 2L -> "b", 3L -> "n", 5L -> "z"))
  }

  test("a non-key unique check audits the MERGED state even under the incremental default") {
    // unique("v") is set-global: each batch below is clean in isolation
    // and only the merged state shows the duplicate, so a batch-delta
    // audit alone would wave it through — the gate must detect the
    // non-key uniqueness claim and audit the branch's merged state
    val tbl = fresh() // v1: (1,a) (2,b)
    val in = graft.util.Scratch.dir("wap_setglobal_in")
    val ckpt = graft.util.Scratch.dir("wap_setglobal_ck")
    def drop(name: String, rows: org.apache.spark.sql.DataFrame): Unit =
      rows.coalesce(1).write.mode("overwrite").parquet(s"$in/$name")
    drop("a", state((3L, "a", 2))) // batch-unique on v; merged dups v="a"
    drop("b", state((4L, "c", 1))) // genuinely green
    graft.sources.Wap.runWapIngest(
      spark.readStream.schema(state((0L, "x", 1)).schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*/*.parquet"),
      tbl, ckpt, checks :+ QualityGate.unique("v"), "k", cmp, "d",
      retainVersions = 100, availableNow = true).awaitTermination()
    val live = graft.sources.DeletionVectors.readMerged(spark, tbl)
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(live == Map(1L -> "a", 2L -> "b", 4L -> "c"),
      "the merged-dup batch must quarantine; the green batch must land")
    assert(spark.read.parquet(s"$tbl/_quarantine/batch=*/report")
      .select("check_name").as[String].collect().toSet === Set("unique:v"))
  }

  test("merged-state audit mode reaches the same ledger as the incremental default") {
    // the incremental audit is an optimization with an induction
    // argument (row-local checks + structural key uniqueness) — this
    // pins that auditMerged = true adjudicates the same drops the same
    // way: clean admitted, poison quarantined with the same count
    val tbl = fresh()
    val in = graft.util.Scratch.dir("wap_stream_merged_in")
    val ckpt = graft.util.Scratch.dir("wap_stream_merged_ck")
    def drop(name: String, rows: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = s"$in/_stage_$name"
      rows.coalesce(1).write.parquet(tmp)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .foreach(s => fs.rename(s.getPath,
          new org.apache.hadoop.fs.Path(s"$in/$name.parquet")))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
    drop("a", state((3L, "n", 2)))
    drop("b", state((4L, null, 1)))
    graft.sources.Wap.runWapIngest(
      spark.readStream.schema(state((0L, "x", 1)).schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*.parquet"),
      tbl, ckpt, checks, "k", cmp, "d", retainVersions = 100,
      availableNow = true, auditMerged = true).awaitTermination()
    val live = graft.sources.DeletionVectors.readMerged(spark, tbl)
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(live == Map(1L -> "a", 2L -> "b", 3L -> "n"))
    assert(spark.read.parquet(s"$tbl/_quarantine/batch=*/rows").count() === 1L)
    assert(spark.read.parquet(s"$tbl/_quarantine/batch=*/report")
      .select("check_name").as[String].collect().toSet === Set("not_null:v"))
  }

  test("main moving mid-cycle falls back to the three-way merge") {
    val tbl = fresh()
    Branches.createBranch(spark, tbl, "wap_audit")
    // the feed stages from the old head...
    Branches.publishToBranch(state((1L, "A", 1), (2L, "b", 1)), "d", tbl, "wap_audit")
    // ...and main independently inserts k=3 before the publish step
    Sinks.publishSnapshot(state((1L, "a", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl,
      retainVersions = 8)
    val v = Wap.writeAuditPublish(state((1L, "A", 1), (2L, "b", 1)), "d", tbl,
      checks, "k", cmp, retainVersions = 8)
    assert(Sinks.currentVersion(spark, tbl).contains(v))
    // disjoint changes from both sides land
    assert(snap(tbl) == Map(1L -> "A", 2L -> "b", 3L -> "c"))
  }
}
