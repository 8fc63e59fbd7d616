package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Branches, ConcurrentSnapshotUpdate, DeletionVectors, Sinks, Tags}

/** The OCC shadowing seams between exact-version publishers and
  * fast-forward merges, plus the ref-lifecycle crash windows:
  *
  *  - an exact-version publisher whose expected number became a LIVE
  *    main commit via fast-forward must abort, not walk past it and
  *    silently shadow the merge (the r11 high-severity finding);
  *  - the legitimate skip — a branch-only number that never became a
  *    main commit — still works;
  *  - a fast-forward that lands UNDER a stale OCC commit detects the
  *    foreign marker above its head and raises;
  *  - a half-created branch (base file written, initial head marker
  *    lost to a crash) behaves as head == base;
  *  - a tag that re-verifies its pin releases itself when the chain
  *    was pruned out from under the conditional create;
  *  - group commits sweep their claim files past the retain window.
  */
class ShadowRaceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def state(rows: (Long, String, Long)*): org.apache.spark.sql.DataFrame =
    rows.toDF("k", "v", "d").withColumn("d", to_date(concat(lit("2024-01-0"), col("d"))))

  private val cmp = Seq("v", "d")

  private def freshTable(): String = {
    val tbl = graft.util.Scratch.dir("shadow_spec") + "/t"
    Sinks.publishSnapshot(
      state((1L, "a", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, retainVersions = 8)
    tbl
  }

  test("ffShadows provenance: a successor chained through the merged head is no shadow; a rebuild is") {
    val tbl = freshTable() // v1
    // branch MoR link + fast-forward: head becomes a chain commit (v3)
    Branches.createBranch(spark, tbl, "ff")
    DeletionVectors.publishUpsertToBranch(spark, tbl, "ff",
      state((9L, "n", 2)), "k", state().select("k").limit(0))
    Branches.mergeBranch(spark, tbl, "ff", "k", cmp, "d", retainVersions = 8)
    val bHead = Sinks.currentVersion(spark, tbl).get
    // a publisher that built ON the merged head: its chain walks
    // through bHead — a legitimate successor, not a shadow
    DeletionVectors.publishUpsert(spark, tbl, state((1L, "A", 1)), "k",
      state().select("k").limit(0), validate = false)
    val succ = Sinks.currentVersion(spark, tbl).get
    assert(Branches.ffShadows(spark, tbl, bHead,
      Sinks.listVersions(spark, tbl)) === Seq.empty,
      "a post-merge chained commit must not be reported as a shadow")
    // a plain rebuilding publish above the head has no provenance that
    // includes the merge — classified conservatively as a shadow
    Sinks.publishSnapshot(state((7L, "z", 1)), "d", tbl, retainVersions = 8)
    val rebuilt = Sinks.currentVersion(spark, tbl).get
    assert(Branches.ffShadows(spark, tbl, bHead,
      Sinks.listVersions(spark, tbl)) === Seq(rebuilt))
    assert(succ < rebuilt)
  }

  test("upsert decided against a stale head aborts before writing (expectedParent)") {
    val tbl = freshTable() // v1
    val pinned = Sinks.currentVersion(spark, tbl).get
    // a foreign publish moves the head after the decision was taken
    Sinks.publishSnapshot(state((5L, "e", 1)), "d", tbl, retainVersions = 8)
    val before = Sinks.listVersions(spark, tbl).sorted
    intercept[ConcurrentSnapshotUpdate] {
      DeletionVectors.publishUpsert(spark, tbl, state((1L, "A", 1)), "k",
        state().select("k").limit(0), validate = false,
        expectedParent = Some(pinned))
    }
    assert(Sinks.listVersions(spark, tbl).sorted === before, "nothing committed")
    // the retry, decided against the LIVE head, lands
    DeletionVectors.publishUpsert(spark, tbl, state((1L, "A", 1)), "k",
      state().select("k").limit(0), validate = false,
      expectedParent = Sinks.currentVersion(spark, tbl))
    assert(DeletionVectors.readMerged(spark, tbl)
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      === Map(5L -> "e", 1L -> "A"))
  }

  test("exact-version publish aborts when its number was fast-forwarded live") {
    val tbl = freshTable()
    Branches.createBranch(spark, tbl, "x")
    Branches.publishToBranch(state((1L, "A", 1), (2L, "b", 1), (3L, "c", 2)),
      "d", tbl, "x")
    // ff merge: branch version 2 becomes the live MAIN commit
    assert(Branches.mergeBranch(spark, tbl, "x", "k", cmp, "d") == 2L)
    // a compaction-style publisher that read head=1 before the merge:
    // the old walk skipped the branch-marked 2 and committed a stale
    // state as 3, shadowing the merge; now it must abort cleanly
    val e = intercept[ConcurrentSnapshotUpdate] {
      Sinks.publishSnapshot(state((9L, "stale", 1)), "d", tbl,
        expectedVersion = Some(2L))
    }
    assert(e.getMessage.contains("no data was written"))
    // the merged content is still live, unshadowed
    assert(Sinks.currentVersion(spark, tbl).contains(2L))
    val live = Sinks.readSnapshot(spark, tbl).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(live(1L) == "A")
  }

  test("exact-version publish still walks past a branch-only (unmerged) number") {
    val tbl = freshTable()
    Branches.createBranch(spark, tbl, "side")
    Branches.publishToBranch(state((1L, "A", 1)), "d", tbl, "side") // claims 2
    // main OCC publisher expecting 2: branch-only 2 is not a main
    // commit — the skip is legitimate and the publish lands as 3
    val v = Sinks.publishSnapshot(
      state((1L, "a", 1), (2L, "b2", 1), (3L, "c", 2)), "d", tbl,
      expectedVersion = Some(2L), retainVersions = 8)
    assert(v == 3L)
    assert(Sinks.currentVersion(spark, tbl).contains(3L))
    // branch head is untouched by the main publish
    assert(Branches.branchHead(spark, tbl, "side").contains(2L))
  }

  test("a main commit past a branch-only number forces the merge three-way") {
    val tbl = freshTable()
    Branches.createBranch(spark, tbl, "late")
    Branches.publishToBranch(state((1L, "A", 1), (2L, "b", 1), (3L, "c", 2)),
      "d", tbl, "late") // branch head 2
    // a main OCC publisher walks past branch-only 2 and commits 3 —
    // the merge then sees main ≠ base and goes three-way (the ff-side
    // above-head guard covers only the in-flight interleaving, which
    // has no sequential reproduction; its detection logic is the same
    // marker listing asserted here through the merge outcome)
    Sinks.publishSnapshot(state((1L, "a", 1), (2L, "b", 1), (3L, "c3", 2)),
      "d", tbl, expectedVersion = Some(2L), retainVersions = 8)
    val merged = Branches.mergeBranch(spark, tbl, "late", "k", cmp, "d",
      onConflict = "theirs", retainVersions = 8)
    assert(merged == 4L)
    val live = Sinks.readSnapshot(spark, tbl).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(live == Map(1L -> "A", 2L -> "b", 3L -> "c3"))
  }

  test("delete-publish aborts instead of shadowing a concurrent main commit") {
    val tbl = freshTable()
    Branches.createBranch(spark, tbl, "dv")
    Branches.publishToBranch(state((1L, "A", 1), (2L, "b", 1), (3L, "c", 2)),
      "d", tbl, "dv")
    assert(Branches.mergeBranch(spark, tbl, "dv", "k", cmp, "d") == 2L)
    // a delete-publish whose parent read (1) predates the ff: its
    // expected number 2 is now a live main commit → abort, not shadow.
    // publishDeletes reads the parent itself, so plant the stale read
    // through the shared claim path directly:
    val e = intercept[ConcurrentSnapshotUpdate] {
      Sinks.claimExpectedVersion(spark, tbl, 2L, "delete-publish")
    }
    assert(e.getMessage.contains("delete-publish"))
    // and the normal (fresh-read) delete-publish chains cleanly on 2
    val v = DeletionVectors.publishDeletes(spark, tbl,
      Seq(3L).toDF("k"), "k")
    assert(v == 3L)
    val merged = DeletionVectors.readMerged(spark, tbl)
      .select("k").as[Long].collect().toSet
    assert(merged == Set(1L, 2L))
  }

  test("a half-created branch (lost head marker) behaves as head == base") {
    val tbl = freshTable()
    Branches.createBranch(spark, tbl, "torn")
    // simulate the crash between the base write and the marker create
    val marker = new java.io.File(
      new java.net.URI(s"file:$tbl/_branches/torn/m00000001"))
    assert(marker.delete(), "fixture: the initial head marker must exist")
    assert(Branches.branchHead(spark, tbl, "torn").contains(1L))
    // merge of the untouched branch is a no-op, not a crash
    assert(Branches.mergeBranch(spark, tbl, "torn", "k", cmp, "d") == 1L)
    // and a publish onto the half-created branch carries on normally
    val head = Branches.publishToBranch(state((1L, "T", 1)), "d", tbl, "torn")
    assert(Branches.branchHead(spark, tbl, "torn").contains(head))
    assert(Branches.readBranch(spark, tbl, "torn")
      .select("v").as[String].collect().toSeq == Seq("T"))
  }

  test("a tag whose chain was pruned under the create releases itself") {
    val tbl = freshTable() // v1
    DeletionVectors.publishDeletes(spark, tbl, Seq(1L).toDF("k"), "k") // v2 → parent 1
    // the next publish's prune (retain 2) drops v1 — v2's parent —
    // exactly the state a tag create racing the prune observes
    Sinks.publishSnapshot(state((7L, "z", 1)), "d", tbl, retainVersions = 2) // v3
    assert(Sinks.listVersions(spark, tbl) == Seq(2L, 3L))
    val e = intercept[ConcurrentSnapshotUpdate] {
      Tags.createTag(spark, tbl, "broken", Some(2L))
    }
    assert(e.getMessage.contains("did not take"))
    // the half-taken pin was released: the tag does not exist
    assert(Tags.listTags(spark, tbl).isEmpty)
    // tagging the intact head still works
    assert(Tags.createTag(spark, tbl, "ok", Some(3L)) == 3L)
  }

  test("group commits sweep their claim files past the retain window") {
    val grp = graft.util.Scratch.dir("group_sweep") + "/g"
    def pub(round: Int): Unit = {
      Sinks.publishGroup(Seq(
        (s"$grp/ta", state((round.toLong, s"a$round", 1)), "d"),
        (s"$grp/tb", state((round.toLong, s"b$round", 1)), "d")),
        grp, retainGroups = 2, retainVersions = 3)
      ()
    }
    (1 to 4).foreach(pub)
    val claims = new java.io.File(new java.net.URI(s"file:$grp/_commits/_claims"))
      .list().toSeq.sorted
    // 4 commits → claims c1..c4; keepFloor = oldest retained marker (3)
    // → c1, c2 swept
    assert(claims == Seq("c00000003", "c00000004"))
  }
}
