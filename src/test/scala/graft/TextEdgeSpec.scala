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

  test("gopher rules: integer cross-multiplied ratios match hand computation") {
    val corpus = Seq(
      (1L, ""),                                    // 0 words: every count-gated rule fails
      (2L, Seq.fill(30)("the data table").mkString(" ")), // 90 words, stopword-rich
      (3L, "- bullet one\n- bullet two\nplain line"),     // 2/3 bullet lines
      (4L, "trails off...\nand again…\nsolid end"),       // 2/3 ellipsis lines
      (5L, ("# " * 40) + Seq.fill(35)("word").mkString(" ")) // 40 symbols vs 75 words
    ).toDF("doc_id", "text")
    val m = TextOps.gopherRulesOf(corpus).collect()
      .map(r => r.getLong(0) -> r.getValuesMap[Long](Seq(
        "n_words", "n_symbols", "n_lines", "n_bullet_lines", "n_ellipsis_lines",
        "n_stopwords", "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_alpha_ratio", "ok_bullet", "ok_ellipsis", "keep"))).toMap
    assert(m(1L)("n_words") === 0L && m(1L)("ok_word_count") === 0L &&
      m(1L)("ok_mean_word_len") === 0L && m(1L)("keep") === 0L)
    assert(m(2L)("n_words") === 90L && m(2L)("n_stopwords") === 30L &&
      m(2L)("ok_word_count") === 1L && m(2L)("keep") === 1L)
    assert(m(3L)("n_lines") === 3L && m(3L)("n_bullet_lines") === 2L &&
      m(3L)("ok_bullet") === 1L) // 2·10 ≤ 3·9 — under the 90% cap
    assert(m(4L)("n_ellipsis_lines") === 2L &&
      m(4L)("ok_ellipsis") === 0L) // 2·10 > 3·3 — over the 30% cap
    assert(m(5L)("n_symbols") === 40L && m(5L)("n_words") === 75L &&
      m(5L)("ok_symbol_ratio") === 0L && // 400 > 75
      m(5L)("ok_alpha_ratio") === 0L)    // 35·5 < 75·4: '#' tokens aren't words
  }

  test("top terms rank by tf desc then df asc then term, capped at k") {
    val corpus = Seq(
      (1L, "alpha alpha beta gamma"), // tf: alpha 2; beta/gamma tie on tf=1
      (2L, "beta beta gamma delta"),  // df(beta)=2 = df(gamma), term order breaks
      (3L, "gamma epsilon")
    ).toDF("doc_id", "text")
    val rows = TextOps.topTermsOf(corpus, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows((1L, 1L)) === (("alpha", 2L, 1L))) // highest tf wins
    // beta and gamma both tf=1 in doc 1; df(beta)=2 < df(gamma)=3
    assert(rows((1L, 2L)) === (("beta", 1L, 2L)))
    assert(rows((2L, 1L)) === (("beta", 2L, 2L)))
    // doc 2 rank 2: gamma/delta tf=1; df(delta)=1 < df(gamma)=3
    assert(rows((2L, 2L)) === (("delta", 1L, 1L)))
    assert(rows.size === 6) // k=2 per doc, no overflow
  }

  test("lm coverage counts reference trigram hits; short docs carry no evidence") {
    val corpus = Seq(
      (1L, "a b c d"),        // trigrams: "a b c", "b c d"
      (2L, "a b c x y z"),    // "a b c" covered; "b c x","c x y","x y z" not
      (3L, "q r"),            // < 3 tokens: no evidence, passes
      (4L, "")                // empty: no evidence, passes
    ).toDF("doc_id", "text")
    val ref = Seq((10L, "a b c d")).toDF("doc_id", "text")
    val m = TextOps.lmCoverageOf(corpus, ref, minCoveredPct = 50).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m(1L) === ((2L, 2L, 1L)))  // fully covered
    assert(m(2L) === ((4L, 1L, 0L)))  // 1 of 4 < 50%
    assert(m(3L) === ((0L, 0L, 1L)))
    assert(m(4L) === ((0L, 0L, 1L)))
  }

  test("reservoir sample: exactly k per stratum, deterministic, salt-sensitive") {
    val corpus = (1L to 100L).map(i => (i, s"text $i", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    val s1 = TextOps.reservoirSampleOf(corpus, k = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // exact size per stratum, ranks 1..k
    assert(s1.groupBy(_._2).view.mapValues(_.map(_._3).sorted.toSeq).toMap
      === (0 until 4).map(i => s"src$i" -> (1L to 5L)).toMap)
    // deterministic: the same call yields the same sample
    val s2 = TextOps.reservoirSampleOf(corpus, k = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(s1.toSeq === s2.toSeq)
    // a different salt draws a different permutation (not id order)
    val other = TextOps.reservoirSampleOf(corpus, k = 5, salt = "other").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(s1.map(_._1).toSet !== other.map(_._1).toSet)
    assert(s1.map(_._1).toSeq !== (1L to 20L).toSeq) // md5 order, not doc order
  }

  test("per-source top tokens equal the exact per-source census when vocab fits") {
    val corpus = Seq(
      (1L, "x x x y y z", "a"), (2L, "x y", "a"),
      (3L, "p p q", "b"), (4L, "q q q p", "b")
    ).toDF("doc_id", "text", "source")
    val got = TextOps.sourceTopTokensOf(corpus, capacity = 16, topK = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(got(("a", 1L)) === (("x", 4L)))
    assert(got(("a", 2L)) === (("y", 3L)))
    assert(got(("b", 1L)) === (("q", 4L)))
    assert(got(("b", 2L)) === (("p", 3L)))
  }

  test("tokenize ids: rank order, OOV = 0, 1-based positions, round-trip") {
    val corpus = Seq(
      (1L, "b b b a a c"),   // cf: b=3, a=2(+1 below)=3 … see vocab calc
      (2L, "a c d"),
      (3L, "")
    ).toDF("doc_id", "text")
    // cf: a=3, b=3, c=2, d=1 → ids by (cf desc, token asc):
    //   a→1, b→2, c→3 (vocabSize=3), d is OOV → 0
    val rows = TextOps.tokenizeIdsOf(corpus, vocabSize = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3))))
    val m = rows.toMap
    assert(m((1L, 1L)) === (("b", 2L)))
    assert(m((1L, 4L)) === (("a", 1L)))
    assert(m((1L, 6L)) === (("c", 3L)))
    assert(m((2L, 3L)) === (("d", 0L))) // OOV
    // positions are 1-based and contiguous per doc; empty doc absent
    val byDoc = rows.groupBy(_._1._1).view.mapValues(_.map(_._1._2).sorted.toSeq)
    assert(byDoc(1L) === (1L to 6L) && byDoc(2L) === (1L to 3L))
    assert(!byDoc.toMap.contains(3L))
    // round-trip: tokens in position order reassemble the trimmed text
    val rebuilt = rows.filter(_._1._1 == 1L).sortBy(_._1._2)
      .map(_._2._1).mkString(" ")
    assert(rebuilt === "b b b a a c")
  }

  test("shuffle shard: exact permutation, deterministic, input-order invariant") {
    val corpus = (1L to 200L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val s1 = TextOps.shuffleShardOf(corpus, nShards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every doc exactly once; shards within range
    assert(s1.map(_._1).sorted.toSeq === (1L to 200L))
    assert(s1.forall(t => t._2 >= 0 && t._2 < 8))
    // per-shard positions are contiguous ranks 1..n
    s1.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq === (1L to g.length))
    }
    // not doc order: the permutation actually shuffles
    assert(s1.sortBy(t => (t._2, t._3)).map(_._1).toSeq !== (1L to 200L))
    // input order/partitioning changes nothing (cluster-reproducible)
    val s2 = TextOps.shuffleShardOf(
        corpus.orderBy(col("doc_id").desc).repartition(7), nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s1.sorted.toSeq === s2.sorted.toSeq)
  }

  test("bpe training reproduces the classic hand-computed merge sequence") {
    // Sennrich's example vocabulary (sans end-of-word marker):
    // low×5 lower×2 newest×6 widest×3. Hand-computed rounds:
    //   1: (e,s)  freq 9  — ties (s,t) 9, left-asc break
    //   2: (es,t) freq 9
    //   3: (l,o)  freq 7  — ties (o,w) 7, left-asc break
    //   4: (lo,w) freq 7
    val corpus = Seq(
      (1L, (("low " * 5) + ("lower " * 2) + ("newest " * 6) + ("widest " * 3)).trim)
    ).toDF("doc_id", "text")
    val merges = TextOps.bpeTrainOf(corpus, nMerges = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L), (3L, "l", "o", 7L), (4L, "lo", "w", 7L)))
    // early stop: a corpus whose pairs all fall under minFreq trains nothing
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    assert(TextOps.bpeTrainOf(tiny, nMerges = 4, minFreq = 2).collect().isEmpty)
    // apply: replaying the merges tokenizes a NOVEL word with the
    // learned subwords — "lowest" → low + est — and pieces always
    // reconstruct the word
    val applied = TextOps.bpeApplyOf(Seq((9L, "lowest")).toDF("doc_id", "text"),
        merges.map(m => (m._2, m._3)).toSeq).collect()
      .map(r => (r.getLong(2), r.getString(3)))
    assert(applied.sortBy(_._1).map(_._2).toSeq === Seq("low", "est"))
  }

  test("fingerprints: empty text yields empty winnow set, stable content hash") {
    val m = TextOps.fingerprintsOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(m(1L) === ((0L, 0L))) // poly hash of empty = 0, no k-grams
    assert(m(4L)._2 > 0L)
    assert(m(4L) === m(6L)) // identical docs → identical fingerprints
  }
}
