package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Branches, ConcurrentSnapshotUpdate, Sinks}

/** Multi-threaded stress over the shared claim space: OCC main
  * publishers (expectedVersion = head+1, retry on abort) racing branch
  * publishers that consume numbers from the SAME `_claims` namespace
  * without ever becoming main commits. This is exactly the interleaving
  * the r11 walk-past fix exists for — before it, one settled branch
  * publish would abort every later parent+1 main commit forever. The
  * single-writer-per-ref contract is honored (one thread per branch);
  * everything else races freely.
  *
  * Local[32] stands in for N drivers against one object store: the
  * claim protocol is conditional-create files, so thread-level races
  * exercise the same atomicity the multi-driver case relies on. */
class OccStressSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def stamp(tid: Int, seq: Int) =
    (0 until 8).map(i => (s"t$tid-s$seq", i.toLong, java.sql.Date.valueOf("2024-01-15")))
      .toDF("who", "i", "d")

  test("OCC main publishers race branch publishers: every commit lands once, none lost") {
    val tbl = graft.util.Scratch.dir("occ_stress") + "/t"
    val MAIN_THREADS = 3; val MAIN_PUBLISHES = 4
    val BRANCHES = 2; val BRANCH_PUBLISHES = 3
    Sinks.publishSnapshot(stamp(99, 0), "d", tbl, retainVersions = 100)
    (0 until BRANCHES).foreach(b => Branches.createBranch(spark, tbl, s"b$b"))
    val errors = new ConcurrentLinkedQueue[Throwable]()

    val mains = (0 until MAIN_THREADS).map { tid =>
      new Thread(() => {
        try {
          var done = 0
          var attempts = 0
          while (done < MAIN_PUBLISHES) {
            attempts += 1
            assert(attempts < 500, s"main thread $tid livelocked")
            val cur = Sinks.currentVersion(spark, tbl).get
            try {
              Sinks.publishSnapshot(stamp(tid, done), "d", tbl,
                retainVersions = 100, expectedVersion = Some(cur + 1))
              done += 1
            } catch { case _: ConcurrentSnapshotUpdate =>
              // lost the claim: back off, re-read, retry — the retry
              // loop must not SPIN while the winner's (seconds-long
              // under load) publish holds the claim, or the attempt
              // cap measures box speed instead of livelock
              Thread.sleep(25)
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    val branchers = (0 until BRANCHES).map { b =>
      new Thread(() => {
        try {
          (0 until BRANCH_PUBLISHES).foreach { seq =>
            Branches.publishToBranch(stamp(100 + b, seq), "d", tbl, s"b$b")
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    (mains ++ branchers).foreach(_.start())
    (mains ++ branchers).foreach(_.join(300000))
    assert(errors.isEmpty, errors.toArray.mkString("; "))

    // every main publish committed exactly once, each as a COMPLETE stamp
    val committed = Sinks.listVersions(spark, tbl)
    assert(committed.size === 1 + MAIN_THREADS * MAIN_PUBLISHES)
    val stamps = committed.map { v =>
      val rows = Sinks.readSnapshotAt(spark, tbl, v).select("who").as[String].collect()
      assert(rows.length === 8, s"version $v is a torn stamp")
      assert(rows.toSet.size === 1, s"version $v mixes stamps")
      rows.head
    }
    assert(stamps.toSet.size === stamps.size, "a stamp committed twice")
    val expected = (for (t <- 0 until MAIN_THREADS; s <- 0 until MAIN_PUBLISHES)
      yield s"t$t-s$s").toSet + "t99-s0"
    assert(stamps.toSet === expected)
    // per-thread sequence order is monotone in version number (a
    // thread publishes seq k only after k-1 committed)
    for (t <- 0 until MAIN_THREADS) {
      val seqsInOrder = committed.sorted.map(v => stamps(committed.indexOf(v)))
        .filter(_.startsWith(s"t$t-")).map(_.split("-s")(1).toInt)
      assert(seqsInOrder === seqsInOrder.sorted, s"thread $t committed out of order")
    }
    // branch refs advanced exactly their own commits, heads intact
    for (b <- 0 until BRANCHES) {
      val head = Branches.readBranch(spark, tbl, s"b$b")
        .select("who").as[String].collect()
      assert(head.toSet === Set(s"t${100 + b}-s${BRANCH_PUBLISHES - 1}"))
    }
    // no number was used twice: committed and branch-marked sets are
    // disjoint and their dirs all exist
    val branchMarked = (0 until BRANCHES)
      .flatMap(b => Branches.branchHead(spark, tbl, s"b$b")).toSet
    assert(committed.toSet.intersect(branchMarked).isEmpty)
  }
}
