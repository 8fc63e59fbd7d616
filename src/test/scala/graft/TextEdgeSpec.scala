package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Edge cases for the text operators through the DataFrame-input
  * variants: empty, whitespace-only, punctuation-only, CJK, and
  * duplicate documents. */
class TextEdgeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val docs = Seq(
    (1L, ""),
    (2L, "   \t  "),
    (3L, "...!!!???"),
    (4L, "the cat and the dog in the house"),
    (5L, "中文内容测试"),
    (6L, "the cat and the dog in the house") // exact dup of 4
  ).toDF("doc_id", "text")

  test("token counts: empty and whitespace-only texts have 0 tokens") {
    val m = TextOps.tokenCountsOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m(1L) === ((0L, 0L, 0L)))
    assert(m(2L)._1 === 0L)
    assert(m(3L) === ((1L, 9L, 9L))) // one ws token, 9 punct pieces
    assert(m(4L)._1 === 8L)
  }

  test("quality: ratios are 0 (not NaN/null) for empty inputs") {
    val rows = TextOps.qualityScoreOf(docs).collect()
    rows.foreach { r =>
      (3 to 5).foreach { i =>
        assert(!r.isNullAt(i), s"doc ${r.getLong(0)} col $i null")
        assert(!r.getDouble(i).isNaN, s"doc ${r.getLong(0)} col $i NaN")
      }
    }
    val m = rows.map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(m(1L) === 0.0 && m(2L) === 0.0)
    assert(m(4L) > 0.4) // 4 stopword hits of 8 tokens
  }

  test("langid: CJK → zh, no signal → unknown, english stopwords → en") {
    val m = TextOps.langIdOf(docs).collect()
      .map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(m(1L) === "unknown")
    assert(m(3L) === "unknown")
    assert(m(4L) === "en")
    assert(m(5L) === "zh")
  }

  test("exact dedup groups identical texts; hash dedup flags the later copy") {
    val dd = TextOps.dedupExactOf(docs)
    assert(dd.count() === 5) // 6 docs, one dup pair
    assert(dd.filter(col("n_copies") === 2).count() === 1)
    val firsts = TextOps.dedupHashOf(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(firsts(4L) === 1 && firsts(6L) === 0)
  }

  test("fingerprints: empty text yields empty winnow set, stable content hash") {
    val m = TextOps.fingerprintsOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(m(1L) === ((0L, 0L))) // poly hash of empty = 0, no k-grams
    assert(m(4L)._2 > 0L)
    assert(m(4L) === m(6L)) // identical docs → identical fingerprints
  }
}
