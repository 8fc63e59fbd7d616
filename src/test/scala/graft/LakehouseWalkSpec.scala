package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DeletionVectors, SchemaEvolution, Sinks}

/** CROSS-FEATURE lakehouse random walk: one seeded sequence
  * interleaving schema evolution (rename / add / drop), deletion
  * vectors, merge-on-read upserts, materialization, compaction, and
  * time-travel reads against ONE plain-Scala model — the r10 MoR walk
  * and schema-evolution walk each caught a real bug alone; their
  * INTERACTIONS (evolve on top of an unmaterialized chain,
  * materialize/compact of an evolved table, merged reads through an
  * as-of schema) are where the next one lives.
  *
  * Model: every key k carries a multiplier v(k); the cell for logical
  * column c (identified by its immutable value TAG) is k·v(k)·tag.
  * Renames keep the tag, adds mint a fresh tag, upserts bump v — so
  * value integrity across renames, null-fill across adds, and
  * supersession across chain links are all checkable cell-exactly.
  * Stable-id bookkeeping rides along: each tag's id must never change
  * once observed, and a retired (dropped) id must never be re-minted
  * for a different tag — even when the publish that mints sits on top
  * of an unmaterialized DV chain (the maxid high-water mark must
  * resolve THROUGH the chain).
  */
class LakehouseWalkSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)
  private case class MCol(name: String, tag: Long)

  test("cross-feature walk: 200 interleaved steps match the model, identities and history included") {
    val rnd = new scala.util.Random(1618033)
    val table = java.nio.file.Files.createTempDirectory("lake_walk").toString + "/t"
    val RETAIN = 500 // keep every version: the walk time-travels at the end

    var cols = Seq(MCol("c1", 1L), MCol("c2", 2L))
    var rows: Map[Long, Long] = (1L to 12L).map(k => k -> 1L).toMap
    var nextKey = 13L
    var nextTag = 3L
    var renamedN = 0
    var droppedNames = Vector.empty[String]

    // stable-id bookkeeping: id -> owning tag, plus the retired set
    var idOwner = Map.empty[Long, Long]
    var retired = Set.empty[Long]

    // committed history for the time-travel sweep: version -> state
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

    def checkIdentities(step: Int): Unit = {
      val live = Sinks.currentVersion(spark, table).get
      val sc = SchemaEvolution.schemaOf(spark, table, live)
        .getOrElse(fail(s"step $step: live version $live lost its schema mapping"))
      assert(sc.map(_.name) === ("k" +: cols.map(_.name) :+ "day"),
        s"step $step: live schema names diverged")
      val byName = sc.map(c => c.name -> c.id).toMap
      for (c <- cols) {
        val id = byName(c.name)
        idOwner.get(id) match {
          case Some(owner) =>
            assert(owner === c.tag,
              s"step $step: id $id moved from tag $owner to tag ${c.tag}")
          case None =>
            assert(!retired.contains(id),
              s"step $step: retired id $id re-minted for tag ${c.tag}")
            idOwner += id -> c.tag
        }
      }
    }

    def record(version: Long): Unit = {
      history :+= ((version, cols, rows))
      val got = collectRows(DeletionVectors.readMerged(spark, table), cols)
      assert(got === expected(cols, rows),
        s"merged live read diverged at version $version")
      checkIdentities(history.size)
    }

    SchemaEvolution.publishEvolved(frame(cols, rows), "day", table,
      retainVersions = RETAIN)
    record(Sinks.currentVersion(spark, table).get)

    for (step <- 1 to 200) {
      rnd.nextInt(10) match {
        case 0 if cols.nonEmpty => // rename: fresh name, same tag
          val i = rnd.nextInt(cols.size)
          renamedN += 1
          val nu = s"r$renamedN"
          val renames = Map(nu -> cols(i).name)
          cols = cols.updated(i, cols(i).copy(name = nu))
          record(SchemaEvolution.publishEvolved(frame(cols, rows), "day", table,
            renamedFrom = renames, retainVersions = RETAIN))
        case 1 if cols.size < 5 => // add: fresh tag; sometimes a re-used name
          val name = if (droppedNames.nonEmpty && rnd.nextBoolean())
            droppedNames(rnd.nextInt(droppedNames.size)) else s"a$step"
          cols = cols :+ MCol(name, nextTag); nextTag += 1
          record(SchemaEvolution.publishEvolved(frame(cols, rows), "day", table,
            retainVersions = RETAIN))
        case 2 if cols.size > 1 => // drop: retire the column's id
          val i = rnd.nextInt(cols.size)
          val dropped = cols(i)
          idOwner.find(_._2 == dropped.tag).foreach { case (id, _) =>
            retired += id; idOwner -= id
          }
          droppedNames :+= dropped.name
          cols = cols.patch(i, Nil, 1)
          record(SchemaEvolution.publishEvolved(frame(cols, rows), "day", table,
            retainVersions = RETAIN))
        case 3 | 4 if rows.size > 3 => // DV delete of a random live subset
          val del = rows.keys.toSeq.sorted.filter(_ => rnd.nextDouble() < 0.15)
          if (del.nonEmpty) {
            rows = rows -- del
            record(DeletionVectors.publishDeletes(spark, table,
              del.toDF("k"), "k"))
          }
        case 5 | 6 => // MoR upsert: bump some multipliers, insert fresh keys
          val ups = rows.keys.toSeq.sorted.filter(_ => rnd.nextDouble() < 0.2)
            .map(k => k -> (step + 1).toLong)
          val ins = (1 to rnd.nextInt(3)).map { _ =>
            val k = nextKey; nextKey += 1; k -> (step + 1).toLong
          }
          val dels = rows.keys.toSeq.sorted
            .filterNot(ups.map(_._1).contains)
            .filter(_ => rnd.nextDouble() < 0.05)
          val changes = (ups ++ ins).toMap
          if (changes.nonEmpty && (rows.size - dels.size) > 2) {
            rows = rows ++ changes -- dels
            record(DeletionVectors.publishUpsert(spark, table,
              frame(cols, changes), "k", dels.toDF("k")))
          }
        case 7 => // fold the chain back into a data version
          record(DeletionVectors.materializeDeletes(spark, table, "day",
            retainVersions = RETAIN))
        case 8 => // content-neutral maintenance (folds any chain first)
          record(Sinks.compactSnapshot(spark, table, "day",
            retainVersions = RETAIN))
        case _ => () // no-op draw (also hit when a guard above fails)
      }
    }

    // time-travel sweep: every 7th committed version still reads as
    // the state the model held when it was committed — chains resolve,
    // materialized folds match, evolved schemas project
    val sampled = history.zipWithIndex.filter(_._2 % 7 == 0).map(_._1)
    for ((v, cs, rs) <- sampled) {
      val got = collectRows(DeletionVectors.readMergedAt(spark, table, v), cs)
      assert(got === expected(cs, rs), s"historical version $v diverged")
    }

    // cross-schema merged reads: version v's MERGED rows projected
    // onto the as-of schema of a LATER sampled version — renamed
    // columns surface under their as-of names with v's values, columns
    // v never had null-fill, columns dropped by the as-of schema
    // vanish
    val pairs = (1 to 25).map { _ =>
      val i = rnd.nextInt(history.size); val j = rnd.nextInt(history.size)
      (history(math.min(i, j)), history(math.max(i, j)))
    }
    for (((v, vCols, vRows), (asOf, aCols, _)) <- pairs) {
      val vTags = vCols.map(_.tag).toSet
      val out = SchemaEvolution.readMergedAs(spark, table, v, Some(asOf))
      assert(out.columns.toSeq === ("k" +: aCols.map(_.name) :+ "day"),
        s"v=$v asOf=$asOf column set")
      val got = out.select(("k" +: aCols.map(_.name)).map(col): _*)
        .collect().map { r =>
          r.getLong(0) -> aCols.zipWithIndex.map { case (c, i) =>
            if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1))
          }
        }.toMap
      val want = vRows.map { case (k, mult) =>
        k -> aCols.map { c =>
          if (vTags.contains(c.tag)) Some(k * mult * c.tag) else None
        }
      }
      assert(got === want, s"v=$v asOf=$asOf merged as-of read diverged")
    }
  }
}
