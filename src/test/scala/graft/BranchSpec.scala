package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Branches, BranchMergeConflict, Sinks}

/** Branch semantics over the versioned snapshot store: isolation,
  * fast-forward as a marker-only commit, three-way merge outcomes per
  * conflict policy, Git's both-sides-identical non-conflict, and
  * branch deletion GC that never touches merged history. */
class BranchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def state(rows: (Long, String, Long)*): org.apache.spark.sql.DataFrame =
    rows.toDF("k", "v", "d").withColumn("d", to_date(concat(lit("2024-01-0"), col("d"))))

  private def snap(tbl: String): Map[Long, String] =
    Sinks.readSnapshot(spark, tbl).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private val cmp = Seq("v", "d")

  private def freshTable(): String = {
    val tbl = graft.util.Scratch.dir("branch_spec") + "/t"
    Sinks.publishSnapshot(
      state((1L, "a", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, retainVersions = 8)
    tbl
  }

  test("branch publishes are invisible to main; reads are isolated") {
    val tbl = freshTable()
    Branches.createBranch(spark, tbl, "x")
    val mainBefore = Sinks.currentVersion(spark, tbl).get
    Branches.publishToBranch(state((1L, "A", 1), (2L, "b", 1)), "d", tbl, "x")
    assert(Sinks.currentVersion(spark, tbl).get == mainBefore)
    assert(snap(tbl) == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    val br = Branches.readBranch(spark, tbl, "x").select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(br == Map(1L -> "A", 2L -> "b"))
  }

  test("fast-forward merge commits the branch version dir itself — no copy") {
    val tbl = freshTable()
    Branches.createBranch(spark, tbl, "x")
    val head = Branches.publishToBranch(
      state((1L, "A", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, "x")
    val merged = Branches.mergeBranch(spark, tbl, "x", "k", cmp, "d")
    // marker-only: the live main version IS the branch's version number
    assert(merged == head)
    assert(Sinks.currentVersion(spark, tbl).contains(head))
    assert(snap(tbl)(1L) == "A")
  }

  test("merging a branch that never moved is a no-op") {
    val tbl = freshTable()
    Branches.createBranch(spark, tbl, "idle")
    val before = Sinks.currentVersion(spark, tbl).get
    assert(Branches.mergeBranch(spark, tbl, "idle", "k", cmp, "d") == before)
  }

  test("diverged merge: disjoint edits from both sides land; conflicts fail loudly") {
    val tbl = freshTable()
    Branches.createBranch(spark, tbl, "x")
    // branch: update k=1, delete k=2, insert k=4
    Branches.publishToBranch(
      state((1L, "A", 1), (3L, "c", 2), (4L, "d4", 2)), "d", tbl, "x")
    // main moves independently: update k=3
    Sinks.publishSnapshot(
      state((1L, "a", 1), (2L, "b", 1), (3L, "C", 2)), "d", tbl, retainVersions = 8)
    Branches.mergeBranch(spark, tbl, "x", "k", cmp, "d", retainVersions = 8)
    assert(snap(tbl) == Map(1L -> "A", 3L -> "C", 4L -> "d4"))
  }

  test("conflicting key: fail raises with count, ours keeps main, theirs takes branch") {
    def diverge(): String = {
      val tbl = freshTable()
      Branches.createBranch(spark, tbl, "x")
      Branches.publishToBranch(
        state((1L, "BR", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, "x")
      Sinks.publishSnapshot(
        state((1L, "MAIN", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, retainVersions = 8)
      tbl
    }
    val t1 = diverge()
    val e = intercept[BranchMergeConflict] {
      Branches.mergeBranch(spark, t1, "x", "k", cmp, "d", retainVersions = 8)
    }
    assert(e.getMessage.contains("1 conflicting key"))
    val t2 = diverge()
    Branches.mergeBranch(spark, t2, "x", "k", cmp, "d", onConflict = "ours",
      retainVersions = 8)
    assert(snap(t2)(1L) == "MAIN")
    val t3 = diverge()
    Branches.mergeBranch(spark, t3, "x", "k", cmp, "d", onConflict = "theirs",
      retainVersions = 8)
    assert(snap(t3)(1L) == "BR")
  }

  test("both sides making the IDENTICAL change is not a conflict") {
    val tbl = freshTable()
    Branches.createBranch(spark, tbl, "x")
    Branches.publishToBranch(
      state((1L, "same", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, "x")
    Sinks.publishSnapshot(
      state((1L, "same", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, retainVersions = 8)
    Branches.mergeBranch(spark, tbl, "x", "k", cmp, "d", retainVersions = 8)
    assert(snap(tbl)(1L) == "same")
  }

  test("delete-vs-update IS a conflict; theirs resurrects, ours keeps the delete") {
    def diverge(): String = {
      val tbl = freshTable()
      Branches.createBranch(spark, tbl, "x")
      // branch updates k=1; main deletes it
      Branches.publishToBranch(
        state((1L, "BR", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, "x")
      Sinks.publishSnapshot(
        state((2L, "b", 1), (3L, "c", 2)), "d", tbl, retainVersions = 8)
      tbl
    }
    intercept[BranchMergeConflict] {
      Branches.mergeBranch(spark, diverge(), "x", "k", cmp, "d", retainVersions = 8)
    }
    val t2 = diverge()
    Branches.mergeBranch(spark, t2, "x", "k", cmp, "d", onConflict = "theirs",
      retainVersions = 8)
    assert(snap(t2).get(1L).contains("BR"))
    val t3 = diverge()
    Branches.mergeBranch(spark, t3, "x", "k", cmp, "d", onConflict = "ours",
      retainVersions = 8)
    assert(!snap(t3).contains(1L))
  }

  test("createBranch is conditional: a second create of the same name fails") {
    val tbl = freshTable()
    Branches.createBranch(spark, tbl, "dup")
    intercept[java.io.IOException] { Branches.createBranch(spark, tbl, "dup") }
    intercept[IllegalArgumentException] {
      Branches.createBranch(spark, tbl, "../escape")
    }
  }

  test("deleteBranch GCs unmerged branch versions but never merged history") {
    val tbl = freshTable()
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ff-merged branch: its version becomes main history, survives delete
    Branches.createBranch(spark, tbl, "kept")
    val mergedV = Branches.publishToBranch(
      state((1L, "A", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, "kept")
    Branches.mergeBranch(spark, tbl, "kept", "k", cmp, "d")
    Branches.deleteBranch(spark, tbl, "kept")
    assert(fs.exists(new org.apache.hadoop.fs.Path(tbl, f"v$mergedV%08d")))
    assert(snap(tbl)(1L) == "A")
    // abandoned branch: its unmerged version dir is swept
    Branches.createBranch(spark, tbl, "scrap")
    val scrapV = Branches.publishToBranch(
      state((9L, "z", 1)), "d", tbl, "scrap")
    Branches.deleteBranch(spark, tbl, "scrap")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tbl, f"v$scrapV%08d")))
    assert(Branches.branchHead(spark, tbl, "scrap").isEmpty)
  }

  test("rebase replays branch changes onto a moved main; merge then fast-forwards") {
    val tbl = freshTable()
    Branches.createBranch(spark, tbl, "x")
    // branch: update k=1, insert k=4; main independently updates k=3
    Branches.publishToBranch(
      state((1L, "A", 1), (2L, "b", 1), (3L, "c", 2), (4L, "d4", 2)), "d", tbl, "x")
    Sinks.publishSnapshot(
      state((1L, "a", 1), (2L, "b", 1), (3L, "C", 2)), "d", tbl, retainVersions = 8)
    val mHead = Sinks.currentVersion(spark, tbl).get
    val newHead = Branches.rebaseBranch(spark, tbl, "x", "k", cmp, "d")
    // base advanced to main's head; branch state carries BOTH edits
    assert(Branches.branchBase(spark, tbl, "x") == mHead)
    assert(Branches.branchHead(spark, tbl, "x").contains(newHead))
    val br = Branches.readBranch(spark, tbl, "x").select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(br == Map(1L -> "A", 2L -> "b", 3L -> "C", 4L -> "d4"))
    // main untouched by the rebase
    assert(snap(tbl) == Map(1L -> "a", 2L -> "b", 3L -> "C"))
    // and the merge is now a pure fast-forward: marker-only, same version
    assert(Branches.mergeBranch(spark, tbl, "x", "k", cmp, "d",
      retainVersions = 8) == newHead)
    assert(snap(tbl) == br)
  }

  test("rebase conflicts: fail raises; ours keeps main's state; theirs the branch's") {
    def diverge(): String = {
      val tbl = freshTable()
      Branches.createBranch(spark, tbl, "x")
      Branches.publishToBranch(
        state((1L, "BR", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, "x")
      Sinks.publishSnapshot(
        state((1L, "MAIN", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, retainVersions = 8)
      tbl
    }
    val t1 = diverge()
    val e = intercept[BranchMergeConflict] {
      Branches.rebaseBranch(spark, t1, "x", "k", cmp, "d")
    }
    assert(e.getMessage.contains("rebase") && e.getMessage.contains("1 conflicting key"))
    def branchV(tbl: String): String =
      Branches.readBranch(spark, tbl, "x").filter(col("k") === 1)
        .select("v").head().getString(0)
    val t2 = diverge()
    Branches.rebaseBranch(spark, t2, "x", "k", cmp, "d", onConflict = "ours")
    assert(branchV(t2) == "MAIN")
    val t3 = diverge()
    Branches.rebaseBranch(spark, t3, "x", "k", cmp, "d", onConflict = "theirs")
    assert(branchV(t3) == "BR")
  }

  test("rebase of an unmoved branch just advances the ref; no-op when main held still") {
    val tbl = freshTable()
    Branches.createBranch(spark, tbl, "idle")
    val b0 = Branches.branchBase(spark, tbl, "idle")
    // main held still: no-op, head stays at base
    assert(Branches.rebaseBranch(spark, tbl, "idle", "k", cmp, "d") == b0)
    Sinks.publishSnapshot(
      state((1L, "a2", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, retainVersions = 8)
    val mHead = Sinks.currentVersion(spark, tbl).get
    assert(Branches.rebaseBranch(spark, tbl, "idle", "k", cmp, "d") == mHead)
    assert(Branches.branchBase(spark, tbl, "idle") == mHead)
    // the adopted head is main history: deleting the branch must not GC it
    Branches.deleteBranch(spark, tbl, "idle")
    assert(snap(tbl)(1L) == "a2")
  }

  test("merge resolves a DV/MoR chain at main's head — and a chained base") {
    val tbl = freshTable()
    Branches.createBranch(spark, tbl, "x")
    // branch: update k=1
    Branches.publishToBranch(
      state((1L, "A", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, "x")
    // main moves as a CHAIN, never a rewrite: DV-delete k=2, then
    // MoR-upsert k=3 — the live "state" exists only merged
    sources.DeletionVectors.publishDeletes(spark, tbl, Seq(2L).toDF("k"), "k")
    sources.DeletionVectors.publishUpsert(spark, tbl,
      state((3L, "C3", 2)), "k", spark.emptyDataFrame.select(lit(0L).as("k")).limit(0))
    Branches.mergeBranch(spark, tbl, "x", "k", cmp, "d", retainVersions = 8)
    assert(snap(tbl) == Map(1L -> "A", 3L -> "C3"))
    // and a branch whose BASE is itself a chain version diffs correctly
    Branches.createBranch(spark, tbl, "y")
    sources.DeletionVectors.publishDeletes(spark, tbl, Seq(3L).toDF("k"), "k")
    Branches.publishToBranch(state((1L, "A", 1), (3L, "C3", 2), (9L, "ins", 2)),
      "d", tbl, "y")
    Branches.mergeBranch(spark, tbl, "y", "k", cmp, "d", retainVersions = 8)
    assert(snap(tbl) == Map(1L -> "A", 9L -> "ins"))
  }

  private def evolvedTable(): String = {
    val tbl = graft.util.Scratch.dir("branch_spec_ev") + "/t"
    sources.SchemaEvolution.publishEvolved(
      state((1L, "a", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, retainVersions = 8)
    tbl
  }

  test("merge across a rename on main is id-resolved; mapping rides the merged version") {
    val tbl = evolvedTable()
    Branches.createBranch(spark, tbl, "x")
    // branch edits k=1 under the OLD name v
    Branches.publishToBranch(
      state((1L, "BR", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, "x")
    // main renames v -> w (same id), bumps k=3
    sources.SchemaEvolution.publishEvolved(
      state((1L, "a", 1), (2L, "b", 1), (3L, "C", 2)).withColumnRenamed("v", "w"),
      "d", tbl, renamedFrom = Map("w" -> "v"), retainVersions = 8)
    val idOfW = sources.SchemaEvolution.schemaOf(spark, tbl,
      Sinks.currentVersion(spark, tbl).get).get.find(_.name == "w").get.id
    // evolved merges rebuild full rows: partial compareCols refuse
    intercept[IllegalArgumentException] {
      Branches.mergeBranch(spark, tbl, "x", "k", Seq("w"), "d", retainVersions = 8)
    }
    Branches.mergeBranch(spark, tbl, "x", "k", Seq("w", "d"), "d", retainVersions = 8)
    val live = Sinks.currentVersion(spark, tbl).get
    val got = Sinks.readSnapshot(spark, tbl).select("k", "w").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "BR", 2L -> "b", 3L -> "C"))
    // the merged version still maps w to the ORIGINAL id
    val sc = sources.SchemaEvolution.schemaOf(spark, tbl, live)
    assert(sc.exists(_.exists(c => c.name == "w" && c.id == idOfW)))
    // and an as-of read of pre-rename history through the live schema works
    val v1 = sources.SchemaEvolution.readSnapshotAs(spark, tbl, 1L)
    assert(v1.columns.contains("w"))
  }

  test("rebase across a rename lands the branch in the evolved schema; merge fast-forwards") {
    val tbl = evolvedTable()
    Branches.createBranch(spark, tbl, "x")
    Branches.publishToBranch(
      state((1L, "BR", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, "x")
    sources.SchemaEvolution.publishEvolved(
      state((1L, "a", 1), (2L, "b", 1), (3L, "C", 2)).withColumnRenamed("v", "w"),
      "d", tbl, renamedFrom = Map("w" -> "v"), retainVersions = 8)
    Branches.rebaseBranch(spark, tbl, "x", "k", Seq("w", "d"), "d")
    // the branch now speaks the evolved schema, values replayed
    val br = Branches.readBranch(spark, tbl, "x")
    assert(br.columns.contains("w") && !br.columns.contains("v"))
    val bHead = Branches.branchHead(spark, tbl, "x").get
    assert(sources.SchemaEvolution.schemaOf(spark, tbl, bHead)
      .exists(_.exists(_.name == "w")))
    val ffV = Branches.mergeBranch(spark, tbl, "x", "k", Seq("w", "d"), "d",
      retainVersions = 8)
    assert(ffV == bHead) // marker-only fast-forward
    val got = Sinks.readSnapshot(spark, tbl).select("k", "w").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "BR", 2L -> "b", 3L -> "C"))
  }

  test("branch publishes cannot change schema on an evolved table") {
    val tbl = evolvedTable()
    Branches.createBranch(spark, tbl, "x")
    val e = intercept[IllegalArgumentException] {
      Branches.publishToBranch(
        state((1L, "a", 1)).withColumnRenamed("v", "sneaky"), "d", tbl, "x")
    }
    assert(e.getMessage.contains("cannot change schema"))
  }

  test("column added on main mid-branch: branch-changed keys conflict; theirs null-fills") {
    val tbl = evolvedTable()
    Branches.createBranch(spark, tbl, "x")
    // branch edits k=1 under the pre-add schema
    Branches.publishToBranch(
      state((1L, "BR", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, "x")
    // main adds w, populated — which rewrites EVERY row, so every key
    // is a main-side update and the branch's k=1 edit is a conflict
    sources.SchemaEvolution.publishEvolved(
      state((1L, "a", 1), (2L, "b", 1), (3L, "c", 2))
        .withColumn("w", concat(lit("w"), col("k"))),
      "d", tbl, retainVersions = 8)
    val e = intercept[BranchMergeConflict] {
      Branches.mergeBranch(spark, tbl, "x", "k", Seq("v", "w", "d"), "d",
        retainVersions = 8)
    }
    assert(e.getMessage.contains("1 conflicting key"))
    // row-image semantics (documented in mergeBranch): under "theirs"
    // the branch's whole row wins for k=1, and the branch diverged
    // before w existed — NULL w; keys the branch left alone keep
    // main's populated w
    Branches.mergeBranch(spark, tbl, "x", "k", Seq("v", "w", "d"), "d",
      onConflict = "theirs", retainVersions = 8)
    val got = Sinks.readSnapshot(spark, tbl).select("k", "v", "w").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), Option(r.getString(2))))).toMap
    assert(got == Map(
      1L -> (("BR", None)),
      2L -> (("b", Some("w2"))),
      3L -> (("c", Some("w3")))))
    // the prescribed remedy: rebase under "theirs" (branch lands in
    // the evolved schema, w null for its changed keys), re-publish
    // with w populated, merge fast-forwards with full cells
    val tbl2 = evolvedTable()
    Branches.createBranch(spark, tbl2, "y")
    Branches.publishToBranch(
      state((1L, "BR", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl2, "y")
    sources.SchemaEvolution.publishEvolved(
      state((1L, "a", 1), (2L, "b", 1), (3L, "c", 2))
        .withColumn("w", concat(lit("w"), col("k"))),
      "d", tbl2, retainVersions = 8)
    Branches.rebaseBranch(spark, tbl2, "y", "k", Seq("v", "w", "d"), "d",
      onConflict = "theirs")
    val reb = Branches.readBranch(spark, tbl2, "y")
    assert(reb.filter(col("k") === 1L).select("w").head().isNullAt(0))
    Branches.publishToBranch(
      reb.withColumn("w", coalesce(col("w"), concat(lit("w"), col("k"))))
        .select("k", "v", "d", "w"),
      "d", tbl2, "y")
    Branches.mergeBranch(spark, tbl2, "y", "k", Seq("v", "w", "d"), "d",
      retainVersions = 8)
    val healed = Sinks.readSnapshot(spark, tbl2).select("k", "v", "w").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(healed == Map(
      1L -> (("BR", "w1")), 2L -> (("b", "w2")), 3L -> (("c", "w3"))))
  }

  test("MoR staging on a branch: O(changes) commits, merged reads, chain-adopting ff") {
    val tbl = freshTable() // base = v1: (1,a) (2,b) (3,c)
    val noDel = spark.emptyDataFrame.select(lit(0L).as("k")).limit(0)
    Branches.createBranch(spark, tbl, "x")
    // stage a delete and an upsert as chain links — never a full frame
    sources.DeletionVectors.publishDeletesToBranch(spark, tbl, "x",
      Seq(2L).toDF("k"), "k")
    sources.DeletionVectors.publishUpsertToBranch(spark, tbl, "x",
      state((1L, "A", 1), (9L, "i", 2)), "k", noDel)
    // the branch reads merged; main is untouched
    val br = Branches.readBranch(spark, tbl, "x").select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(br == Map(1L -> "A", 3L -> "c", 9L -> "i"))
    assert(snap(tbl) == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // main never moved → fast-forward adopts the WHOLE chain (links 2+3)
    val v = Branches.mergeBranch(spark, tbl, "x", "k", cmp, "d", retainVersions = 8)
    assert(v === 3L)
    assert(Sinks.listVersions(spark, tbl).sorted === Seq(1L, 2L, 3L))
    val live = sources.DeletionVectors.readMerged(spark, tbl)
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(live == Map(1L -> "A", 3L -> "c", 9L -> "i"))
    // the adopted intermediate link is real, readable main history
    val prefix = sources.DeletionVectors.readMergedAt(spark, tbl, 2L)
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(prefix == Map(1L -> "a", 3L -> "c"))
    // three-way path: a staged MoR branch merges over a moved main
    Branches.createBranch(spark, tbl, "y")
    sources.DeletionVectors.publishUpsertToBranch(spark, tbl, "y",
      state((3L, "C3", 2)), "k", noDel)
    sources.DeletionVectors.publishUpsert(spark, tbl,
      state((4L, "m", 1)), "k", noDel) // main inserts k=4 via its own MoR
    Branches.mergeBranch(spark, tbl, "y", "k", cmp, "d", retainVersions = 8)
    val merged = sources.DeletionVectors.readMerged(spark, tbl)
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged == Map(1L -> "A", 3L -> "C3", 4L -> "m", 9L -> "i"))
    // an unmerged staged chain GCs with its ref; merged history never
    Branches.createBranch(spark, tbl, "z")
    val zLink = sources.DeletionVectors.publishDeletesToBranch(spark, tbl, "z",
      Seq(1L).toDF("k"), "k")
    Branches.deleteBranch(spark, tbl, "z")
    intercept[java.io.FileNotFoundException] {
      sources.DeletionVectors.readMergedAt(spark, tbl, zLink).collect()
    }
    assert(sources.DeletionVectors.readMerged(spark, tbl)
      .count() === 4L)
  }

  test("three-way merge publishes with OCC: a racing claim aborts the merge") {
    val tbl = freshTable()
    Branches.createBranch(spark, tbl, "x")
    Branches.publishToBranch(
      state((1L, "A", 1), (2L, "b", 1), (3L, "c", 2)), "d", tbl, "x")
    Sinks.publishSnapshot(
      state((1L, "a", 1), (2L, "B", 1), (3L, "c", 2)), "d", tbl, retainVersions = 8)
    // simulate a concurrent publisher owning mainHead+1
    val mHead = Sinks.currentVersion(spark, tbl).get
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stolen = new org.apache.hadoop.fs.Path(tbl, f"_claims/c${mHead + 1}%08d")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(stolen.getParent.toUri.getPath))
    java.nio.file.Files.createFile(java.nio.file.Paths.get(stolen.toUri.getPath))
    intercept[graft.sources.ConcurrentSnapshotUpdate] {
      Branches.mergeBranch(spark, tbl, "x", "k", cmp, "d", retainVersions = 8)
    }
    // main state untouched by the aborted merge
    assert(snap(tbl)(2L) == "B")
  }
}
