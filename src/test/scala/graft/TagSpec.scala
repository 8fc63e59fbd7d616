package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Branches, DeletionVectors, Sinks, Tags}

/** Tag semantics: immutable named version pointers, retention pinning
  * (whole DV/MoR chains included), release-on-delete, and the
  * connector's tag read path. */
class TagSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def df(vals: Long*) = vals.map(v => (v, java.sql.Date.valueOf("2024-01-15")))
    .toDF("val", "transaction_date")

  private def fresh(): String =
    graft.util.Scratch.dir("tag_spec") + "/t"

  test("create/list/read; tags are immutable; only committed versions are taggable") {
    val tbl = fresh()
    Sinks.publishSnapshot(df(1L, 2L), "transaction_date", tbl)
    Sinks.publishSnapshot(df(10L), "transaction_date", tbl)
    assert(Tags.createTag(spark, tbl, "head") === 2L) // defaults to the live head
    assert(Tags.createTag(spark, tbl, "first", Some(1L)) === 1L)
    assert(Tags.listTags(spark, tbl) === Map("head" -> 2L, "first" -> 1L))
    assert(Tags.readTag(spark, tbl, "first")
      .select("val").as[Long].collect().sorted === Array(1L, 2L))
    intercept[java.io.IOException] { Tags.createTag(spark, tbl, "head") }
    intercept[IllegalArgumentException] {
      Tags.createTag(spark, tbl, "ghost", Some(9L)) // never committed
    }
    // branch-only versions are not taggable: their lifetime belongs to the ref
    Branches.createBranch(spark, tbl, "x")
    val bv = Branches.publishToBranch(df(77L), "transaction_date", tbl, "x")
    intercept[IllegalArgumentException] {
      Tags.createTag(spark, tbl, "onbranch", Some(bv))
    }
  }

  test("a tagged version survives retention; untagged peers prune; delete releases the pin") {
    val tbl = fresh()
    Sinks.publishSnapshot(df(1L), "transaction_date", tbl, retainVersions = 2)
    Sinks.publishSnapshot(df(2L), "transaction_date", tbl, retainVersions = 2)
    Tags.createTag(spark, tbl, "keep", Some(1L))
    // push v1 (tagged) and v2 (untagged) past the 2-version window
    Sinks.publishSnapshot(df(3L), "transaction_date", tbl, retainVersions = 2)
    Sinks.publishSnapshot(df(4L), "transaction_date", tbl, retainVersions = 2)
    assert(Sinks.listVersions(spark, tbl).sorted === Seq(1L, 3L, 4L))
    assert(Tags.readTag(spark, tbl, "keep")
      .select("val").as[Long].head() === 1L)
    // and through the library time-travel + the connector tag read
    assert(Sinks.readSnapshotAt(spark, tbl, 1L)
      .select("val").as[Long].head() === 1L)
    assert(spark.read.format("graft-table").option("tag", "keep").load(tbl)
      .select("val").as[Long].head() === 1L)
    intercept[java.io.FileNotFoundException] {
      spark.read.format("graft-table").option("tag", "nope").load(tbl)
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft-table").option("tag", "keep")
        .option("versionAsOf", "1").load(tbl)
    }
    // releasing the pin lets the NEXT publish prune v1
    Tags.deleteTag(spark, tbl, "keep")
    Sinks.publishSnapshot(df(5L), "transaction_date", tbl, retainVersions = 2)
    assert(Sinks.listVersions(spark, tbl).sorted === Seq(4L, 5L))
    intercept[java.io.FileNotFoundException] {
      Tags.readTag(spark, tbl, "keep")
    }
  }

  test("tag-retention walk: 60 publishes under a 2-version window, random tag/untag — pins hold exactly") {
    val tbl = fresh()
    val rnd = new scala.util.Random(1414213)
    var tagged = Map.empty[String, (Long, Long)] // name -> (version, its val)
    var tagN = 0
    Sinks.publishSnapshot(df(0L), "transaction_date", tbl, retainVersions = 2)
    for (step <- 1 to 60) {
      val v = Sinks.publishSnapshot(df(step.toLong), "transaction_date", tbl,
        retainVersions = 2)
      if (rnd.nextDouble() < 0.25) { // pin the version just published
        tagN += 1
        val name = s"t$tagN"
        Tags.createTag(spark, tbl, name, Some(v))
        tagged += name -> ((v, step.toLong))
      }
      if (tagged.nonEmpty && rnd.nextDouble() < 0.15) { // release a random pin
        val name = tagged.keys.toSeq.sorted.apply(rnd.nextInt(tagged.size))
        Tags.deleteTag(spark, tbl, name)
        tagged -= name
      }
      // invariant at every step: committed = pinned ∪ newest window
      val committed = Sinks.listVersions(spark, tbl).toSet
      val all = (1L to v).toSet
      val window = all.toSeq.sorted.reverse.take(2).toSet
      val pinned = tagged.values.map(_._1).toSet
      // released pins below the window prune on the NEXT publish, not
      // eagerly — so committed may lag by the tags released this step;
      // it must always COVER pins + window and never exceed what was
      // ever pinned-or-recent
      assert((pinned ++ window).subsetOf(committed),
        s"step $step: a pin or the live window was pruned")
      // every pinned version still reads as the exact state it froze
      for ((name, (pv, pval)) <- tagged)
        assert(Tags.readTag(spark, tbl, name)
          .select("val").as[Long].head() === pval,
          s"step $step: tag $name diverged")
    }
    // after releasing everything, two more publishes shrink the store
    // back to the bare window
    tagged.keys.foreach(Tags.deleteTag(spark, tbl, _))
    Sinks.publishSnapshot(df(98L), "transaction_date", tbl, retainVersions = 2)
    Sinks.publishSnapshot(df(99L), "transaction_date", tbl, retainVersions = 2)
    assert(Sinks.listVersions(spark, tbl).size === 2)
  }

  test("a tag on a chain head pins the WHOLE DV/MoR chain against retention") {
    val tbl = fresh()
    Sinks.publishSnapshot(df(1L, 2L, 3L), "transaction_date", tbl, retainVersions = 2)
    // v2: DV delete of 3; v3: MoR insert of 20 — a 3-link chain
    DeletionVectors.publishDeletes(spark, tbl, Seq(3L).toDF("val"), "val")
    DeletionVectors.publishUpsert(spark, tbl, df(20L), "val",
      spark.emptyDataFrame.select(lit(0L).as("val")).limit(0))
    Tags.createTag(spark, tbl, "chained", Some(3L))
    // push the whole chain past the window; the pin must hold v1..v3
    Sinks.publishSnapshot(df(9L), "transaction_date", tbl, retainVersions = 1)
    Sinks.publishSnapshot(df(8L), "transaction_date", tbl, retainVersions = 1)
    assert(Sinks.listVersions(spark, tbl).sorted === Seq(1L, 2L, 3L, 5L))
    assert(Tags.readTag(spark, tbl, "chained")
      .select("val").as[Long].collect().sorted === Array(1L, 2L, 20L))
    // the connector refuses the chain head (its state exists only
    // merged). Since r12 the refusal is raised at scan build, not at
    // `.load()` — loading stays legal so that WRITES to a chained
    // store work — so the pin intercepts at action time.
    intercept[UnsupportedOperationException] {
      spark.read.format("graft-table").option("tag", "chained").load(tbl).collect()
    }
    // release: the whole chain prunes on the next publish
    Tags.deleteTag(spark, tbl, "chained")
    Sinks.publishSnapshot(df(7L), "transaction_date", tbl, retainVersions = 1)
    assert(Sinks.listVersions(spark, tbl).sorted === Seq(6L))
  }
}
