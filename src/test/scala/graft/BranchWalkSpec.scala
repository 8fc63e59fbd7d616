package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Branches, BranchMergeConflict, DeletionVectors, SchemaEvolution, Sinks}

/** BRANCH-EXTENDED lakehouse random walk: one seeded sequence
  * interleaving git-style branch operations (create / publish / merge
  * under all three conflict policies / rebase / delete) with the full
  * main-side lifecycle the cross-feature walk already covers (rename,
  * drop, DV delete, MoR upsert, materialize, compact) — against ONE
  * plain-Scala model. The r10 MoR walk and schema-evolution walk each
  * caught a real bug alone, and the r11 cross-feature walk a third;
  * branches × chains × evolution is the next interaction surface.
  *
  * Model: every key k carries a multiplier; the cell for the logical
  * column with immutable tag t is k·mult·t, so states reduce to
  * `Map[key -> mult]` and a three-way merge reduces to feed algebra
  * over that map — branch feed = changes(base→branch), main feed =
  * changes(base→main), conflicts = keys in both feeds whose new state
  * differs, merged = main + branch feed (conflict keys dropped under
  * "ours"). Branch mults are odd and main mults even, so an
  * update-update collision can never be accidentally "identical".
  *
  * Walk policy, stated honestly: main may NOT add a column while a
  * branch is open. Row-image merges null-fill columns the branch never
  * knew for every branch-touched key (documented in
  * [[Branches.mergeBranch]]); the walk pins the null-free interactions
  * — renames and drops land mid-branch freely — and the add-mid-branch
  * null semantics are pinned separately in BranchSpec.
  */
class BranchWalkSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)
  private case class MCol(name: String, tag: Long)
  private case class Br(name: String, baseVersion: Long, gCols: Seq[MCol],
                        baseRows: Map[Long, Long], bRows: Map[Long, Long],
                        commits: Int)

  test("branch walk: 200 interleaved steps of branch/merge/rebase over chains and renames match the model") {
    val rnd = new scala.util.Random(2718281)
    val table = java.nio.file.Files.createTempDirectory("branch_walk").toString + "/t"
    val RETAIN = 600 // keep every version: bases must stay readable and the walk time-travels at the end

    var cols = Seq(MCol("c1", 1L), MCol("c2", 2L))
    var rows: Map[Long, Long] = (1L to 12L).map(k => k -> 2L).toMap
    var nextKey = 13L
    var nextTag = 3L
    var renamedN = 0
    var branch: Option[Br] = None
    var branchN = 0

    var history = Vector.empty[(Long, Seq[MCol], Map[Long, Long])]

    def frame(cs: Seq[MCol], rs: Map[Long, Long]) = {
      val base = rs.toSeq.sortBy(_._1)
        .map { case (k, v) => (k, v, d("2024-03-01")) }
        .toDF("k", "__v", "day")
      cs.foldLeft(base)((df, c) =>
          df.withColumn(c.name, col("k") * col("__v") * lit(c.tag)))
        .select(("k" +: cs.map(_.name) :+ "day").map(col): _*)
    }

    def expected(cs: Seq[MCol], rs: Map[Long, Long]): Set[Seq[Long]] =
      rs.map { case (k, v) => k +: cs.map(c => k * v * c.tag) }.toSet

    def collectRows(df: org.apache.spark.sql.DataFrame, cs: Seq[MCol]): Set[Seq[Long]] =
      df.select(("k" +: cs.map(_.name)).map(col): _*)
        .collect().map(r => (0 to cs.size).map(r.getLong).toSeq: Seq[Long]).toSet

    def record(version: Long, step: Int): Unit = {
      history :+= ((version, cols, rows))
      val got = collectRows(DeletionVectors.readMerged(spark, table), cols)
      assert(got === expected(cols, rows), s"step $step: merged live read diverged at version $version")
    }

    def checkBranch(br: Br, step: Int): Unit = {
      val got = collectRows(Branches.readBranch(spark, table, br.name), br.gCols)
      assert(got === expected(br.gCols, br.bRows), s"step $step: branch '${br.name}' read diverged")
    }

    // feed algebra: the plain-Scala twin of diffOf / applyDiff / the
    // conflict rule (None = delete)
    def changes(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Option[Long]] =
      (a.keySet ++ b.keySet).flatMap { k =>
        (a.get(k), b.get(k)) match {
          case (x, y) if x == y => None
          case (_, y)           => Some(k -> y)
        }
      }.toMap

    def applyFeed(m: Map[Long, Long], feed: Map[Long, Option[Long]]): Map[Long, Long] =
      feed.foldLeft(m) {
        case (acc, (k, Some(v))) => acc + (k -> v)
        case (acc, (k, None))    => acc - k
      }

    def mergeArgs: Seq[String] = cols.map(_.name) :+ "day"

    SchemaEvolution.publishEvolved(frame(cols, rows), "day", table,
      retainVersions = RETAIN)
    record(Sinks.currentVersion(spark, table).get, 0)

    for (step <- 1 to 200) {
      rnd.nextInt(16) match {
        case 0 => // main rename: fresh name, same tag (mid-branch allowed)
          val i = rnd.nextInt(cols.size)
          renamedN += 1
          val nu = s"r$renamedN"
          val renames = Map(nu -> cols(i).name)
          cols = cols.updated(i, cols(i).copy(name = nu))
          record(SchemaEvolution.publishEvolved(frame(cols, rows), "day", table,
            renamedFrom = renames, retainVersions = RETAIN), step)
        case 1 if branch.isEmpty && cols.size < 5 => // main add: only with no branch open
          cols = cols :+ MCol(s"a$step", nextTag); nextTag += 1
          record(SchemaEvolution.publishEvolved(frame(cols, rows), "day", table,
            retainVersions = RETAIN), step)
        case 2 if cols.size > 1 => // main drop (mid-branch allowed: projection loses the column)
          cols = cols.patch(rnd.nextInt(cols.size), Nil, 1)
          record(SchemaEvolution.publishEvolved(frame(cols, rows), "day", table,
            retainVersions = RETAIN), step)
        case 3 | 4 if rows.size > 4 => // main DV delete
          val del = rows.keys.toSeq.sorted.filter(_ => rnd.nextDouble() < 0.15)
          if (del.nonEmpty) {
            rows = rows -- del
            record(DeletionVectors.publishDeletes(spark, table, del.toDF("k"), "k"), step)
          }
        case 5 | 6 => // main MoR upsert (even mults)
          val ups = rows.keys.toSeq.sorted.filter(_ => rnd.nextDouble() < 0.2)
            .map(k => k -> 2L * step)
          val ins = (1 to rnd.nextInt(3)).map { _ =>
            val k = nextKey; nextKey += 1; k -> 2L * step
          }
          val dels = rows.keys.toSeq.sorted
            .filterNot(ups.map(_._1).contains)
            .filter(_ => rnd.nextDouble() < 0.05)
          val changed = (ups ++ ins).toMap
          if (changed.nonEmpty && (rows.size - dels.size) > 2) {
            rows = rows ++ changed -- dels
            record(DeletionVectors.publishUpsert(spark, table,
              frame(cols, changed), "k", dels.toDF("k")), step)
          }
        case 7 => // fold the chain
          record(DeletionVectors.materializeDeletes(spark, table, "day",
            retainVersions = RETAIN), step)
        case 8 => // content-neutral maintenance
          record(Sinks.compactSnapshot(spark, table, "day",
            retainVersions = RETAIN), step)
        case 9 | 10 => branch match {
          case None => // create at the current head (possibly a chain head)
            branchN += 1
            val name = s"b$branchN"
            val base = Branches.createBranch(spark, table, name)
            branch = Some(Br(name, base, cols, rows, rows, 0))
            checkBranch(branch.get, step)
          case Some(br) => // branch commit under the GOVERNING schema (odd mults):
            // a FULL frame or an O(changes) MoR staging link, drawn evenly
            val ups = br.bRows.keys.toSeq.sorted.filter(_ => rnd.nextDouble() < 0.2)
              .map(k => k -> (2L * step + 1))
            val ins = (1 to rnd.nextInt(3)).map { _ =>
              val k = nextKey; nextKey += 1; k -> (2L * step + 1)
            }
            val dels = br.bRows.keys.toSeq.sorted
              .filterNot(ups.map(_._1).contains)
              .filter(_ => rnd.nextDouble() < 0.1)
            val nb = applyFeed(br.bRows,
              ((ups ++ ins).map { case (k, v) => k -> Some(v) } ++
                dels.map(_ -> None)).toMap)
            if (nb.nonEmpty) {
              if (rnd.nextBoolean())
                Branches.publishToBranch(frame(br.gCols, nb), "day", table, br.name)
              else if ((ups ++ ins).nonEmpty)
                DeletionVectors.publishUpsertToBranch(spark, table, br.name,
                  frame(br.gCols, (ups ++ ins).toMap), "k", dels.toDF("k"))
              else
                DeletionVectors.publishDeletesToBranch(spark, table, br.name,
                  dels.toDF("k"), "k")
              branch = Some(br.copy(bRows = nb, commits = br.commits + 1))
              checkBranch(branch.get, step)
            }
        }
        case 11 | 12 => branch.foreach { br => // merge under a random policy
          if (br.commits == 0) {
            // nothing to merge: returns main's head, no new version
            val mHead = Sinks.currentVersion(spark, table).get
            assert(Branches.mergeBranch(spark, table, br.name, "k", mergeArgs,
              "day", retainVersions = RETAIN) === mHead, s"step $step: no-op merge moved main")
          } else {
            val theirs = changes(br.baseRows, br.bRows)
            val ours = changes(br.baseRows, rows)
            val conflicts = theirs.keySet.intersect(ours.keySet)
              .filter(k => theirs(k) != ours(k))
            val policy = Seq("fail", "ours", "theirs")(rnd.nextInt(3))
            if (policy == "fail" && conflicts.nonEmpty) {
              intercept[BranchMergeConflict] {
                Branches.mergeBranch(spark, table, br.name, "k", mergeArgs,
                  "day", retainVersions = RETAIN)
              }
            } else {
              val feed = if (policy == "ours") theirs -- conflicts else theirs
              rows = applyFeed(rows, feed)
              val v = Branches.mergeBranch(spark, table, br.name, "k", mergeArgs,
                "day", onConflict = policy, retainVersions = RETAIN)
              record(v, step)
              if (rnd.nextBoolean()) { // merged branches often retire
                Branches.deleteBranch(spark, table, br.name)
                branch = None
              }
            }
          }
        }
        case 13 => branch.foreach { br => // rebase onto main's head
          val mHead = Sinks.currentVersion(spark, table).get
          if (mHead != br.baseVersion) {
            if (br.commits == 0) {
              // ref-advance: the branch lands AT main's head, in main's schema
              assert(Branches.rebaseBranch(spark, table, br.name, "k", mergeArgs,
                "day") === mHead, s"step $step: ref-advance rebase missed main's head")
              branch = Some(Br(br.name, mHead, cols, rows, rows, 0))
              checkBranch(branch.get, step)
            } else {
              val theirs = changes(br.baseRows, br.bRows)
              val ours = changes(br.baseRows, rows)
              val conflicts = theirs.keySet.intersect(ours.keySet)
                .filter(k => theirs(k) != ours(k))
              val policy = Seq("fail", "ours", "theirs")(rnd.nextInt(3))
              if (policy == "fail" && conflicts.nonEmpty) {
                intercept[BranchMergeConflict] {
                  Branches.rebaseBranch(spark, table, br.name, "k", mergeArgs, "day")
                }
              } else {
                val feed = if (policy == "ours") theirs -- conflicts else theirs
                val nb = applyFeed(rows, feed)
                Branches.rebaseBranch(spark, table, br.name, "k", mergeArgs,
                  "day", onConflict = policy)
                branch = Some(Br(br.name, mHead, cols, rows, nb, br.commits + 1))
                checkBranch(branch.get, step)
              }
            }
          }
        }
        case 14 => branch.foreach { br => // abandon: GC must not disturb main
          Branches.deleteBranch(spark, table, br.name)
          branch = None
          val got = collectRows(DeletionVectors.readMerged(spark, table), cols)
          assert(got === expected(cols, rows), s"step $step: branch GC disturbed main")
        }
        case _ => () // no-op draw (also hit when a guard above fails)
      }
    }

    // time-travel sweep: every committed main version still reads as
    // the state the model held when it was committed — merged versions,
    // fast-forwarded branch dirs and chain links all resolve
    val sampled = history.zipWithIndex.filter(_._2 % 5 == 0).map(_._1)
    for ((v, cs, rs) <- sampled) {
      val got = collectRows(DeletionVectors.readMergedAt(spark, table, v), cs)
      assert(got === expected(cs, rs), s"historical version $v diverged")
    }
  }
}
