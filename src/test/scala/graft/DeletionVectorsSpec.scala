package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DeletionVectors, Sinks, ConcurrentSnapshotUpdate}
import java.sql.Date

/** Merge-on-read deletion vectors (SURVEY.md §2 row 109): delete
  * publishes that never rewrite the base, chain-resolved merged
  * reads, loud refusal on broken chains, OCC against concurrent
  * publishers, and the materializing fold-back. */
class DeletionVectorsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshTable(): String = graft.util.Scratch.dir("dv_spec") + "/t"

  private val d = Date.valueOf("2024-03-15")

  private def publishBase(table: String, keys: Range = 1 to 8): Unit = {
    Sinks.publishSnapshot(
      keys.map(k => (k.toLong, s"row$k", d)).toDF("id", "payload", "day"),
      "day", table)
    ()
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("merged read applies the whole deletion chain; history reads per-link") {
    val t = freshTable()
    publishBase(t)
    DeletionVectors.publishDeletes(spark, t, Seq(2L, 5L).toDF("id"), "id")
    DeletionVectors.publishDeletes(spark, t, Seq(5L, 7L).toDF("id"), "id")
    assert(ids(DeletionVectors.readMerged(spark, t)) === Set(1L, 3L, 4L, 6L, 8L))
    // as-of the first vector: only {2,5} gone
    assert(ids(DeletionVectors.readMergedAt(spark, t, 2L)) === Set(1L, 3L, 4L, 6L, 7L, 8L))
    // as-of the base: untouched
    assert(ids(DeletionVectors.readMergedAt(spark, t, 1L)) === (1L to 8L).toSet)
  }

  test("materialize folds the chain into a plain data version") {
    val t = freshTable()
    publishBase(t)
    DeletionVectors.publishDeletes(spark, t, Seq(3L).toDF("id"), "id")
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      df.select("id", "payload").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    val merged = rows(DeletionVectors.readMerged(spark, t))
    val v = DeletionVectors.materializeDeletes(spark, t, "day")
    assert(v === 3L)
    // the plain snapshot read now equals the merged state, and
    // readMerged on a data version is a no-op pass-through
    assert(rows(Sinks.readSnapshot(spark, t)) === merged)
    assert(rows(DeletionVectors.readMerged(spark, t)) === merged)
  }

  test("right-to-be-forgotten: user purge via a resolved vector, checksum-proven") {
    // GDPR-style purge composition: resolve the subject's row keys
    // with one read, publish them as a deletion vector (the base is
    // never rewritten), then PROVE the purge with the fingerprint —
    // shards holding none of the subject's rows keep their checksum
    // bit-for-bit, shards that did change.
    val t = freshTable()
    val rows = Seq(
      (1L, 7L, "a", d), (2L, 7L, "b", d), (3L, 8L, "c", d),
      (4L, 9L, "d", d), (5L, 7L, "e", d), (6L, 9L, "f", d))
      .toDF("id", "user_id", "payload", "day")
    Sinks.publishSnapshot(rows, "day", t)
    val fp = (df: org.apache.spark.sql.DataFrame) =>
      operators.Reconcile.fingerprint(
        df.select((col("id") % 2).as("shard"), col("id").cast("string").as("k"),
          col("user_id").cast("string").as("u"), col("payload")),
        Seq("shard"), Seq("k", "u", "payload"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val before = fp(DeletionVectors.readMerged(spark, t))
    val subjectKeys = DeletionVectors.readMerged(spark, t)
      .filter(col("user_id") === 7L).select("id")
    DeletionVectors.publishDeletes(spark, t, subjectKeys, "id")
    val after = DeletionVectors.readMerged(spark, t)
    assert(after.filter(col("user_id") === 7L).count() === 0)
    assert(ids(after) === Set(3L, 4L, 6L))
    val fpAfter = fp(after)
    // subject rows had ids 1,2,5 → both shards affected here; check
    // counts dropped exactly and a re-publish of the same vector (via
    // materialize) preserves the checksum
    assert(fpAfter(0L)._1 === 2L && fpAfter(1L)._1 === 1L)
    assert(fpAfter !== before)
    DeletionVectors.materializeDeletes(spark, t, "day")
    assert(fp(Sinks.readSnapshot(spark, t)) === fpAfter)
  }

  test("delete-publish aborts against a concurrent claim, writing nothing") {
    val t = freshTable()
    publishBase(t)
    // a racing publisher owns version 2's claim
    val claims = java.nio.file.Paths.get(t, "_claims")
    java.nio.file.Files.createDirectories(claims)
    java.nio.file.Files.createFile(claims.resolve("c00000002"))
    intercept[ConcurrentSnapshotUpdate] {
      DeletionVectors.publishDeletes(spark, t, Seq(1L).toDF("id"), "id")
    }
    // nothing committed: live version still 1, base intact
    assert(Sinks.currentVersion(spark, t) === Some(1L))
    assert(ids(DeletionVectors.readMerged(spark, t)) === (1L to 8L).toSet)
  }

  test("a chain whose parent was pruned refuses loudly instead of serving debris") {
    val t = freshTable()
    publishBase(t)
    DeletionVectors.publishDeletes(spark, t, Seq(4L).toDF("id"), "id")
    // simulate retention pruning the base out from under the vector
    val root = java.nio.file.Paths.get(t)
    java.nio.file.Files.delete(root.resolve("_manifests/m00000001"))
    val ex = intercept[java.io.FileNotFoundException] {
      DeletionVectors.readMerged(spark, t).collect()
    }
    assert(ex.getMessage.contains("materialize before pruning"))
  }

  test("mixed delete keys are rejected up front") {
    val t = freshTable()
    publishBase(t)
    DeletionVectors.publishDeletes(spark, t, Seq(2L).toDF("id"), "id")
    val ex = intercept[IllegalArgumentException] {
      DeletionVectors.publishDeletes(spark, t, Seq("row3").toDF("payload"), "payload")
    }
    assert(ex.getMessage.contains("chain keys"))
  }

  test("upsert chain: later links supersede earlier images and inserts") {
    val t = freshTable()
    publishBase(t, 1 to 4)
    // commit A: update 2, insert 10
    DeletionVectors.publishUpsert(spark, t,
      Seq((2L, "row2-A", d), (10L, "row10-A", d)).toDF("id", "payload", "day"),
      "id", Seq.empty[Long].toDF("id"))
    // commit B: update 2 again, delete A's insert 10, delete base 4
    DeletionVectors.publishUpsert(spark, t,
      Seq((2L, "row2-B", d)).toDF("id", "payload", "day"),
      "id", Seq(10L, 4L).toDF("id"))
    val got = DeletionVectors.readMerged(spark, t)
      .select("id", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "row1", 2L -> "row2-B", 3L -> "row3"))
    // as-of commit A: its image and insert still visible
    val atA = DeletionVectors.readMergedAt(spark, t, 2L)
      .select("id", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(atA === Map(1L -> "row1", 2L -> "row2-A", 3L -> "row3",
      4L -> "row4", 10L -> "row10-A"))
  }

  test("upsert rejects duplicate keys and mismatched delta schemas") {
    val t = freshTable()
    publishBase(t, 1 to 3)
    intercept[IllegalArgumentException] {
      DeletionVectors.publishUpsert(spark, t,
        Seq((2L, "x", d), (2L, "y", d)).toDF("id", "payload", "day"),
        "id", Seq.empty[Long].toDF("id"))
    }
    intercept[IllegalArgumentException] {
      DeletionVectors.publishUpsert(spark, t,
        Seq((2L, "x")).toDF("id", "payload"), // missing the day column
        "id", Seq.empty[Long].toDF("id"))
    }
    // neither aborted publish committed anything
    assert(Sinks.currentVersion(spark, t) === Some(1L))
  }

  test("materialize folds an upsert chain too") {
    val t = freshTable()
    publishBase(t, 1 to 3)
    DeletionVectors.publishUpsert(spark, t,
      Seq((3L, "row3-new", d), (9L, "row9", d)).toDF("id", "payload", "day"),
      "id", Seq(1L).toDF("id"))
    val merged = DeletionVectors.readMerged(spark, t)
      .select("id", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    DeletionVectors.materializeDeletes(spark, t, "day")
    val plain = Sinks.readSnapshot(spark, t)
      .select("id", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(plain === merged)
    assert(merged === Map(2L -> "row2", 3L -> "row3-new", 9L -> "row9"))
  }

  test("deletes of absent keys and empty vectors are harmless no-ops") {
    val t = freshTable()
    publishBase(t)
    DeletionVectors.publishDeletes(spark, t, Seq(99L).toDF("id"), "id")
    DeletionVectors.publishDeletes(spark, t, Seq.empty[Long].toDF("id"), "id")
    assert(ids(DeletionVectors.readMerged(spark, t)) === (1L to 8L).toSet)
  }
}
