package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SchemaEvolution

/** Randomized evolution-walk property check for the stable-id schema
  * mapping: a seeded random sequence of rename / add / drop steps is
  * applied to a versioned table while a plain-Scala model tracks what
  * every (version, as-of) read must return. The model gives each
  * logical column a value TAG fixed at add time (cell = k · tag), so
  * value integrity across renames — and null-fill for columns the
  * version never had — is checkable cell-exactly. Drop-then-re-add of
  * the same NAME must mint a fresh id: history reads of the re-added
  * column null-fill instead of resurrecting the retired column's
  * values.
  */
class SchemaEvolutionPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val keys = (1L to 5L).toSeq
  private def d(s: String) = java.sql.Date.valueOf(s)

  /** One logical column in the model: display name + value tag. */
  private case class MCol(name: String, tag: Long)

  private def frameFor(cols: Seq[MCol]) = {
    val rows = keys.map(k => (k, d("2024-01-15")))
    val base = rows.toDF("k", "transaction_date")
    cols.foldLeft(base)((df, c) => df.withColumn(c.name, col("k") * lit(c.tag)))
      .select(("k" +: cols.map(_.name) :+ "transaction_date").map(col): _*)
  }

  test("random rename/add/drop walk: every (version, as-of) read matches the model") {
    val rnd = new scala.util.Random(42)
    val table = java.nio.file.Files.createTempDirectory("sevo_prop").toString + "/t"
    var live = Seq(MCol("c1", 1L), MCol("c2", 2L))
    var history = Vector.empty[Seq[MCol]] // history(v-1) = model schema at v
    var nextTag = 3L
    var renamed = 0

    SchemaEvolution.publishEvolved(frameFor(live), "transaction_date", table,
      retainVersions = 20)
    history :+= live

    for (step <- 1 to 7) {
      val op = rnd.nextInt(3)
      var renames = Map.empty[String, String]
      if (op == 0) { // rename a random column, fresh name, same tag
        val i = rnd.nextInt(live.size)
        renamed += 1
        val nu = s"r$renamed"
        renames = Map(nu -> live(i).name)
        live = live.updated(i, live(i).copy(name = nu))
      } else if (op == 1 || live.size <= 1) { // add (also when too thin to drop)
        // reuse a previously-seen name sometimes: the drop-then-re-add
        // case must mint a fresh id (fresh tag in the model)
        val prior = history.flatten.map(_.name).distinct
          .filterNot(live.map(_.name).contains)
        val name = if (prior.nonEmpty && rnd.nextBoolean())
          prior(rnd.nextInt(prior.size)) else s"a$step"
        live = live :+ MCol(name, nextTag); nextTag += 1
      } else { // drop a random column
        live = live.patch(rnd.nextInt(live.size), Nil, 1)
      }
      SchemaEvolution.publishEvolved(frameFor(live), "transaction_date", table,
        renamedFrom = renames, retainVersions = 20)
      history :+= live
    }

    // model id resolution: a column's identity is (name-chain via
    // tag) — two MCols are the same logical column iff tags equal
    for (v <- 1 to history.size; asOf <- 1 to history.size) {
      val target = history(asOf - 1)
      val at = history(v - 1).map(c => c.tag -> c).toMap
      val out = SchemaEvolution.readSnapshotAs(spark, table, v.toLong,
        asOfVersion = Some(asOf.toLong))
      assert(out.columns.toSeq === ("k" +: target.map(_.name) :+ "transaction_date"),
        s"v=$v asOf=$asOf column set")
      val rows = out.select(("k" +: target.map(_.name)).map(col): _*)
        .orderBy("k").collect()
      for ((row, idx) <- rows.zipWithIndex; (c, ci) <- target.zipWithIndex) {
        val k = keys(idx)
        val expected: Option[Long] = at.get(c.tag).map(_ => k * c.tag)
        val got = if (row.isNullAt(ci + 1)) None else Some(row.getLong(ci + 1))
        assert(got === expected,
          s"v=$v asOf=$asOf col=${c.name} (tag ${c.tag}) k=$k")
      }
    }
  }

  test("drop then re-add same name retires the old id: history null-fills") {
    val table = java.nio.file.Files.createTempDirectory("sevo_readd").toString + "/t"
    def pub(cols: Seq[MCol]) =
      SchemaEvolution.publishEvolved(frameFor(cols), "transaction_date", table,
        retainVersions = 10)
    pub(Seq(MCol("price", 10L)))          // v1: price = k*10
    pub(Seq.empty)                        // v2: price DROPPED
    pub(Seq(MCol("price", 99L)))          // v3: price RE-ADDED (new values)
    // ids differ: the re-added price must NOT inherit the retired id
    val id1 = SchemaEvolution.schemaOf(spark, table, 1L).get
      .find(_.name == "price").get.id
    val id3 = SchemaEvolution.schemaOf(spark, table, 3L).get
      .find(_.name == "price").get.id
    assert(id1 !== id3, "re-added column resurrected the retired id")
    // so v1 read through the live schema null-fills price — the old
    // values belong to a DIFFERENT logical column
    val v1 = SchemaEvolution.readSnapshotAs(spark, table, 1L)
    assert(v1.filter(col("price").isNotNull).count() === 0)
    // while v3 reads its own values
    assert(SchemaEvolution.readSnapshotAs(spark, table, 3L)
      .select("k", "price").as[(Long, Long)].collect().toSet
      === keys.map(k => (k, k * 99L)).toSet)
  }
}
