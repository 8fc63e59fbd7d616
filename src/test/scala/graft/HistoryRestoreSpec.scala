package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{ConcurrentSnapshotUpdate, DeletionVectors, Sinks, Tags}

/** RESTORE and DESCRIBE HISTORY: rollback as a new auditable commit
  * (chain-resolved, metadata-carrying, OCC-guarded) and the commit log
  * view. */
class HistoryRestoreSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("k", "s")
    .withColumn("d", to_date(lit("2024-06-15"))).select("k", "d", "s")

  private def state(tbl: String): Map[Long, String] =
    DeletionVectors.readMerged(spark, tbl).select("k", "s").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("restore rolls back a chain head as a NEW commit; history stays readable") {
    val tbl = graft.util.Scratch.dir("restore_spec") + "/t"
    Sinks.publishSnapshot(df(1L -> "a", 2L -> "b"), "d", tbl, retainVersions = 100)
    DeletionVectors.publishUpsert(spark, tbl, df(1L -> "X", 3L -> "c"), "k",
      df().select("k").limit(0), validate = false) // v2: chain link
    assert(state(tbl) == Map(1L -> "X", 2L -> "b", 3L -> "c"))
    val v = Sinks.restoreSnapshot(spark, tbl, 1L, "d", retainVersions = 100)
    assert(v === 3L)
    assert(state(tbl) == Map(1L -> "a", 2L -> "b"), "restore folds the link away")
    // the rolled-back state is still readable history (merged)
    assert(DeletionVectors.readMergedAt(spark, tbl, 2L)
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // restoring a CHAIN HEAD publishes its merged state
    val v2 = Sinks.restoreSnapshot(spark, tbl, 2L, "d", retainVersions = 100)
    assert(v2 === 4L)
    assert(state(tbl) == Map(1L -> "X", 2L -> "b", 3L -> "c"))
    // restoring the live head is a no-op (no new commit burned)
    assert(Sinks.restoreSnapshot(spark, tbl, 4L, "d") === 4L)
    assert(Sinks.currentVersion(spark, tbl).contains(4L))
  }

  test("restore refuses unreadable versions and carries the schema id mapping") {
    val tbl = graft.util.Scratch.dir("restore_spec_meta") + "/t"
    Sinks.publishSnapshot(df(1L -> "a"), "d", tbl, retainVersions = 100)
    intercept[java.io.FileNotFoundException] {
      Sinks.restoreSnapshot(spark, tbl, 9L, "d")
    }
    // rename on main, then restore the PRE-rename version: the restore
    // re-publishes old content; the id mapping it carries is the old
    // version's, so as-of reads through the mapping keep resolving
    graft.sources.SchemaEvolution.publishEvolved(
      Sinks.readSnapshot(spark, tbl).drop("txn_month").withColumnRenamed("s", "label"),
      "d", tbl, renamedFrom = Map("label" -> "s"), retainVersions = 100)
    assert(Sinks.readSnapshot(spark, tbl).columns.contains("label"))
    val v = Sinks.restoreSnapshot(spark, tbl, 1L, "d", retainVersions = 100)
    assert(Sinks.readSnapshot(spark, tbl).columns.contains("s"),
      "restored content is the old schema, as published then")
    assert(v === 3L)
  }

  test("expireSnapshots: horizon + keepLast + tag pins + chain closure") {
    val tbl = graft.util.Scratch.dir("expire_spec") + "/t"
    Sinks.publishSnapshot(df(1L -> "a"), "d", tbl, retainVersions = 100)      // v1
    DeletionVectors.publishUpsert(spark, tbl, df(2L -> "b"), "k",             // v2: link on v1
      df().select("k").limit(0), validate = false)
    Sinks.publishSnapshot(df(3L -> "c"), "d", tbl, retainVersions = 100)      // v3
    DeletionVectors.publishUpsert(spark, tbl, df(4L -> "e"), "k",             // v4: link on v3
      df().select("k").limit(0), validate = false)
    val now = System.currentTimeMillis()
    // v1..v3 are "old"; v4 (the live head, a LINK on old v3) is fresh
    (1L to 3L).foreach(v =>
      Sinks.plantCommitTime(spark, tbl, v, now - 10L * 24 * 3600 * 1000))
    Tags.createTag(spark, tbl, "keep", Some(2L)) // pins the v1←v2 chain
    val ledger = Sinks.expireSnapshots(spark, tbl,
      olderThanMs = 24L * 3600 * 1000, keepLast = 1, nowMs = now).toMap
    // v3 is old and neither last nor pinned — but it is the CHAIN
    // PARENT of the kept head v4, so expiration must not orphan it
    assert(ledger === Map(1L -> "kept:pinned", 2L -> "kept:pinned",
      3L -> "kept:chain", 4L -> "kept:recent"))
    // nothing actually expired here; the store still reads everywhere
    assert(DeletionVectors.readMerged(spark, tbl)
      .select("k").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    // drop the pin and push the horizon past everything but keepLast:
    // the v1←v2 chain ages out TOGETHER; v3 stays as v4's parent
    Tags.deleteTag(spark, tbl, "keep")
    Sinks.plantCommitTime(spark, tbl, 4L, now - 10L * 24 * 3600 * 1000)
    val second = Sinks.expireSnapshots(spark, tbl,
      olderThanMs = 24L * 3600 * 1000, keepLast = 1, nowMs = now).toMap
    assert(second === Map(1L -> "expired", 2L -> "expired",
      3L -> "kept:chain", 4L -> "kept:last"))
    assert(Sinks.listVersions(spark, tbl).sorted === Seq(3L, 4L))
    assert(DeletionVectors.readMerged(spark, tbl)
      .select("k").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }

  test("history lists versions, kinds, parents, live flag; commit times are monotone") {
    val tbl = graft.util.Scratch.dir("history_spec") + "/t"
    Sinks.publishSnapshot(df(1L -> "a"), "d", tbl, retainVersions = 100)
    DeletionVectors.publishUpsert(spark, tbl, df(2L -> "b"), "k",
      df().select("k").limit(0), validate = false)
    DeletionVectors.publishDeletes(spark, tbl, Seq(1L).toDF("k"), "k")
    val h = Sinks.history(spark, tbl).orderBy("version").collect()
    assert(h.map(r => (r.getLong(0), r.getString(2),
      if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSeq == Seq(
      (1L, "data", -1L, false), (2L, "upsert-link", 1L, false),
      (3L, "delete-link", 2L, true)))
    val times = h.map(_.getTimestamp(1).getTime).toSeq
    assert(times == times.sorted, "commit times follow version order")
    // retention: pruned versions drop out of the log
    Sinks.publishSnapshot(df(9L -> "z"), "d", tbl, retainVersions = 1)
    assert(Sinks.history(spark, tbl).select("version").as[Long].collect().toSeq
      == Seq(4L))
  }

  test("commit times survive a store copy: recorded in marker content, not mtimes") {
    val base = graft.util.Scratch.dir("copy_times")
    val tbl = s"$base/t"
    Sinks.publishSnapshot(df(1L -> "a"), "d", tbl, retainVersions = 100)
    Sinks.publishSnapshot(df(2L -> "b"), "d", tbl, retainVersions = 100)
    // an old store migrated here three days ago: plant a historical
    // commit moment for v1, then COPY the whole tree (fresh mtimes)
    val threeDaysAgo = System.currentTimeMillis() - 3L * 24 * 3600 * 1000
    Sinks.plantCommitTime(spark, tbl, 1L, threeDaysAgo)
    val copy = s"$base/migrated"
    val src = java.nio.file.Paths.get(tbl)
    java.nio.file.Files.walk(src).forEach { p =>
      val dst = java.nio.file.Paths.get(copy).resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(p, dst)
      ()
    }
    // history, TIMESTAMP AS OF and expiration horizons on the COPY
    // must see the recorded commit times, not the copy's mtimes
    assert(Sinks.commitTimeMs(spark, copy, 1L) === threeDaysAgo)
    assert(Sinks.versionAsOfTimestamp(spark, copy, threeDaysAgo + 1000L) === 1L)
    val ledger = Sinks.expireSnapshots(spark, copy,
      olderThanMs = 24L * 3600 * 1000, keepLast = 1).toMap
    assert(ledger === Map(1L -> "expired", 2L -> "kept:recent"),
      "the horizon must classify by recorded commit age on a migrated store")
  }
}
