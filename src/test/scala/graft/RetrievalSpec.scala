package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Retrieval

/** Lexical retrieval (SURVEY.md §2): integer-exact term scoring and
  * BM25 over the inverted index. DuckDB parity of the integer scorer
  * is the oracle gate's job; these specs pin ranking SEMANTICS and
  * the plan shape that keeps the corpus from re-shuffling. */
class RetrievalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "apple fig"),
    (3L, "cherry durian cherry"),
    (4L, "banana banana banana fig"),
    (5L, "unrelated words only here"),
    (6L, "")) // empty doc never scores
    .toDF("doc_id", "text")

  private def ranks(q: String, bm25: Boolean = false): Seq[Long] = {
    val qs = Seq((1L, q)).toDF("query_id", "qtext")
    val out = if (bm25) Retrieval.searchBm25Of(docs, qs, 10)
              else Retrieval.searchOf(docs, qs, 10)
    out.orderBy("rank").collect().map(_.getLong(2)).toSeq
  }

  test("integer scorer: only matching docs return, ranked by rarity-weighted tf") {
    // "banana" df=2, "durian" df=1 (rarer → heavier): doc3 with one
    // durian (w = 5-1 = 4) beats doc2? doc2 has no query term; doc4
    // has 3×banana (w = 5-2 = 3) → 9 > doc3's 4 > doc1's 1×banana = 3
    val r = ranks("banana durian")
    assert(r === Seq(4L, 3L, 1L))
  }

  test("integer scorer: ties break on doc_id; query term repetition counts once") {
    // "fig fig" = "fig": docs 2 and 4 each have tf=1 → equal score
    assert(ranks("fig fig") === Seq(2L, 4L))
  }

  test("bm25: all-term doc outranks partial matches; non-matching docs absent") {
    val r = ranks("apple banana", bm25 = true)
    assert(r.head === 1L, s"doc with both terms should rank first, got $r")
    assert(r.toSet === Set(1L, 2L, 4L))
  }

  test("bm25: rarer term dominates a common one at equal tf") {
    // durian (df=1) vs fig (df=2): doc3 (durian) above docs with fig
    val r = ranks("durian fig", bm25 = true)
    assert(r.head === 3L)
  }

  test("k caps the per-query result and rank is dense from 1") {
    val qs = Seq((1L, "apple banana cherry fig")).toDF("query_id", "qtext")
    val out = Retrieval.searchOf(docs, qs, 2).collect()
    assert(out.length === 2)
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L))
  }

  test("plan: postings join is broadcast — the corpus never re-shuffles for the workload") {
    val qs = Seq((1L, "apple banana")).toDF("query_id", "qtext")
    val plan = Retrieval.searchOf(docs, qs, 10).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    val bm = Retrieval.searchBm25Of(docs, qs, 10).queryExecution.executedPlan.toString
    assert(bm.contains("BroadcastHashJoin"), bm)
  }

  test("registered workload values SQL mirrors the DataFrame workload") {
    val sql = Retrieval.workloadValuesSql
    Retrieval.queryWorkload.foreach { case (id, q) =>
      assert(sql.contains(s"($id, '$q')"))
    }
  }

  test("triplet mining: positive is rank 1, hard negatives the chosen band, easy never matches") {
    val qs = Seq((1L, "apple")).toDF("query_id", "qtext")
    // hard band 2..3 on this tiny corpus: matching docs are {1, 2};
    // rank 1 = doc 1 (tf 2), rank 2 = doc 2 — the one hard negative
    val out = Retrieval.tripletMiningOf(docs, qs, hardFrom = 2, hardTo = 3).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val hard = out.filter(_._1 == "hard")
    assert(hard === Array(("hard", 1L, 2L, 2L)))
    // the easy negative shares NO term with the query: drawn from
    // {3, 4, 5, 6?} — 6 is empty text, excluded by the corpus filter;
    // the draw is the minimum (md5(text), doc_id) among {3, 4, 5}
    val easy = out.filter(_._1 == "easy")
    assert(easy.length === 1)
    val (_, pos, negId, negRank) = easy.head
    assert(pos === 1L && negRank === 0L)
    assert(Set(3L, 4L, 5L).contains(negId))
    val expected = Seq(3L -> "cherry durian cherry", 4L -> "banana banana banana fig",
      5L -> "unrelated words only here")
      .map { case (id, t) => (java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString, id) }
      .min._2
    assert(negId === expected)
  }
}
