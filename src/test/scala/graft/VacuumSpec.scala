package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Branches, Sinks, Tags}

/** Vacuum semantics: abandoned dirs and orphan claims reclaim; marked
  * versions (main, branch, tag-pinned) never do; the age guard holds
  * fresh debris. */
class VacuumSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def df(vals: Long*) = vals.map(v => (v, java.sql.Date.valueOf("2024-01-15")))
    .toDF("val", "transaction_date")

  test("vacuum reclaims abandoned dirs + orphan claims; committed, branch and tagged versions survive") {
    val tbl = graft.util.Scratch.dir("vacuum_spec") + "/t"
    Sinks.publishSnapshot(df(1L, 2L), "transaction_date", tbl, retainVersions = 4)
    Sinks.publishSnapshot(df(3L), "transaction_date", tbl, retainVersions = 4)
    Tags.createTag(spark, tbl, "pin", Some(1L))
    Branches.createBranch(spark, tbl, "side")
    val bv = Branches.publishToBranch(df(7L), "transaction_date", tbl, "side") // claims 3
    val a1 = Sinks.plantAbandonedVersion(df(9L), "transaction_date", tbl)      // 4
    val a2 = Sinks.plantAbandonedVersion(df(9L), "transaction_date", tbl)      // 5
    val oc = Sinks.plantOrphanClaim(spark, tbl)                                // 6
    assert((bv, a1, a2, oc) === ((3L, 4L, 5L, 6L)))
    val ledger = Sinks.vacuum(spark, tbl, olderThanMs = -1000L)
    assert(ledger === Seq(4L -> "abandoned_dir", 5L -> "abandoned_dir",
      6L -> "orphan_claim"))
    // nothing marked was touched
    assert(Sinks.listVersions(spark, tbl).sorted === Seq(1L, 2L))
    assert(Sinks.readSnapshot(spark, tbl).select("val").as[Long].head() === 3L)
    assert(Branches.readBranch(spark, tbl, "side")
      .select("val").as[Long].head() === 7L)
    assert(Tags.readTag(spark, tbl, "pin")
      .select("val").as[Long].collect().sorted === Array(1L, 2L))
    // idempotent: a second pass finds nothing
    assert(Sinks.vacuum(spark, tbl, olderThanMs = -1000L) === Seq.empty)
    // and the freed numbers are re-claimable: the next publish lands at 4
    assert(Sinks.publishSnapshot(df(8L), "transaction_date", tbl,
      retainVersions = 4) === 4L)
  }

  test("taggers racing publishes and vacuum: every tag that took stays readable") {
    // the r11 advice race, now driven concurrently: createTag's
    // conditional create races the retention prune inside every
    // publish (and a vacuum sweeping crash debris alongside). The
    // contract under test is refuse-don't-guess: createTag either
    // TAKES (and the pin then holds against every later prune) or
    // raises — a returned tag must never dangle at a pruned version.
    val tbl = graft.util.Scratch.dir("vacuum_tag_race") + "/t"
    Sinks.publishSnapshot(df(0L), "transaction_date", tbl, retainVersions = 2)
    val taken = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val publisher = new Thread(() => {
      try (1 to 25).foreach { i =>
        // aggressive retention: the prune chases the taggers hard
        Sinks.publishSnapshot(df(i.toLong), "transaction_date", tbl,
          retainVersions = 2)
      } finally stop.set(true)
    })
    def safeLoop(body: Int => Unit): Thread = new Thread(() => {
      var i = 0
      while (!stop.get()) {
        try body(i)
        catch {
          case _: graft.sources.ConcurrentSnapshotUpdate => () // refused loudly: fine
          case _: java.io.IOException => ()                    // name taken: fine
          case e: Throwable => errors.add(e)
        }
        i += 1
      }
    })
    val tagger = safeLoop { i =>
      val v = Tags.createTag(spark, tbl, s"rt$i") // current head
      taken.add(s"rt$i" -> v)
      ()
    }
    val sweeper = safeLoop { _ =>
      // sane horizon: vacuum must coexist with live writers (it only
      // ever touches unmarked, AGED entries — nothing here qualifies)
      Sinks.vacuum(spark, tbl, olderThanMs = 3600L * 1000)
      ()
    }
    publisher.start(); tagger.start(); sweeper.start()
    publisher.join(120000); tagger.join(120000); sweeper.join(120000)
    assert(errors.isEmpty, s"unexpected: ${errors.peek()}")
    import scala.jdk.CollectionConverters._
    val pins = taken.asScala.toSeq
    assert(pins.nonEmpty, "the race fixture must land at least one tag")
    // EVERY tag that took is still resolvable and its version retained
    // (cheap metadata checks); the full chain READ — a Spark job per
    // tag — verifies a bounded deterministic sample, because an
    // unthrottled tagger can land thousands of pins and the readback
    // loop dominated the whole suite's wall clock (~15 min) while
    // adding no coverage beyond the sampled reads
    val live = Sinks.listVersions(spark, tbl).toSet
    pins.foreach { case (name, v) =>
      assert(Tags.tagVersion(spark, tbl, name) === v)
      assert(live.contains(v), s"tag $name pins $v but it was pruned")
    }
    val sample = (pins.take(5) ++ pins.takeRight(5) ++
      pins.grouped(math.max(1, pins.size / 10)).map(_.head)).distinct
    sample.foreach { case (name, v) =>
      assert(Tags.readTag(spark, tbl, name).count() >= 1L, s"tag $name at $v unreadable")
    }
  }

  test("the age guard holds fresh debris: a young abandoned dir survives vacuum") {
    val tbl = graft.util.Scratch.dir("vacuum_spec_age") + "/t"
    Sinks.publishSnapshot(df(1L), "transaction_date", tbl)
    Sinks.plantAbandonedVersion(df(2L), "transaction_date", tbl)
    // everything here is milliseconds old: a 10-minute horizon sees no debris
    assert(Sinks.vacuum(spark, tbl, olderThanMs = 10L * 60 * 1000) === Seq.empty)
    // the dir is still there (an in-flight publisher would still own it)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(tbl, "v00000002")))
  }
}
