package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WebOps

/** Web-curation tier (SURVEY.md §2 rows 102-105): C4 line filtering,
  * URL canonicalization + dedup, CCNet perplexity buckets,
  * temperature-based source mixing. DuckDB value parity is the
  * oracle gate's job; these specs pin the SEMANTICS — which lines /
  * URLs / documents survive, and the exact-quota + flattening
  * properties of the mix. */
class WebOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // — C4 line filtering ————————————————————————————————————————————

  private def c4(rows: (Long, String)*) =
    WebOps.c4FilterOf(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("c4 keeps only terminal-punctuated lines with enough words") {
    val out = c4(1L -> ("A proper sentence with five words here.\n" +
      "too short.\n" +                       // < 5 words
      "no terminal punctuation on this line\n" +
      "Is a question fine as well?\n" +      // kept: ends '?'
      "He said \"stop right there now.\""))  // kept: ends '"'
    val (text, nLines, nKept, keep) = out(1L)
    assert(nLines === 5 && nKept === 3)
    assert(text === "A proper sentence with five words here.\n" +
      "Is a question fine as well?\nHe said \"stop right there now.\"")
    assert(keep === 1L) // 3 kept lines meets the page minimum
  }

  test("c4 drops javascript lines and whole pages with lorem ipsum or braces") {
    val good = "One good line that easily satisfies every rule here.\n" +
      "Another good line that easily satisfies every rule here.\n" +
      "A third good line that easily satisfies every rule here."
    val out = c4(
      1L -> (good + "\nPlease enable JavaScript to continue reading this."),
      2L -> (good + "\nLorem ipsum dolor sit amet, consectetur adipiscing elit."),
      3L -> (good + "\nfunction f() { return 1; }"),
      4L -> good)
    assert(out(1L)._3 === 3L && out(1L)._4 === 1L) // js line dropped, page kept
    assert(!out(1L)._1.toLowerCase.contains("javascript"))
    assert(out(2L)._4 === 0L) // lorem ipsum kills the page
    assert(out(3L)._4 === 0L) // curly brace kills the page
    assert(out(4L)._4 === 1L)
  }

  test("c4 drops pages with fewer than three surviving lines") {
    val out = c4(1L -> ("Only one acceptable line appears on this page.\n" +
      "short one.\nand no punctuation either on this line"))
    assert(out(1L)._3 === 1L && out(1L)._4 === 0L)
  }

  // — URL canonicalization —————————————————————————————————————————

  private def canon(url: String): String =
    Seq(url).toDF("u").select(WebOps.canonicalUrl(col("u")).as("c"))
      .head().getString(0)

  test("url canonicalization lowercases authority, strips www/port/fragment") {
    assert(canon("HTTP://WWW.Example.COM:80/Path/Index?a=1#frag")
      === "http://example.com/Path/Index?a=1")
    // path case is PRESERVED — only the authority lowercases
    assert(canon("https://Example.com:443/CaseSensitive")
      === "https://example.com/CaseSensitive")
    // non-default port survives
    assert(canon("http://example.com:8080/x") === "http://example.com:8080/x")
  }

  test("url canonicalization strips tracking params in every position") {
    assert(canon("http://e.com/p?utm_source=rss") === "http://e.com/p")
    assert(canon("http://e.com/p?utm_source=rss&ref=1") === "http://e.com/p?ref=1")
    assert(canon("http://e.com/p?ref=1&utm_source=rss") === "http://e.com/p?ref=1")
    assert(canon("http://e.com/p?utm_a=1&utm_b=2&ref=1&gclid=xyz&fbclid=q")
      === "http://e.com/p?ref=1")
  }

  test("url canonicalization tidies trailing slashes") {
    assert(canon("http://e.com/articles/5/") === "http://e.com/articles/5")
    assert(canon("http://e.com/articles/5/?ref=2") === "http://e.com/articles/5?ref=2")
    // all params stripped → dangling '?' goes too
    assert(canon("http://e.com/articles/5/?utm_x=1") === "http://e.com/articles/5")
  }

  test("url dedup keeps the earliest doc per canonical URL") {
    val docs = Seq(
      (10L, "http://www.e.com/a?utm_s=1"),
      (11L, "HTTP://E.COM:80/a"),
      (12L, "http://e.com/b")).toDF("doc_id", "url")
    val out = WebOps.urlDedupOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(10L)._1 === "http://e.com/a" && out(11L)._1 === "http://e.com/a")
    assert(out(10L)._2 === 1L && out(11L)._2 === 0L) // earliest wins
    assert(out(10L)._3 === 2L && out(12L)._2 === 1L && out(12L)._3 === 1L)
  }

  // — Domain blocklist —————————————————————————————————————————————

  test("domain filter blocks exact domains and all their subdomains") {
    val docs = Seq(
      (1L, "http://ads.example.com/x"),          // exact match
      (2L, "http://deep.ads.example.com/y"),     // subdomain match
      (3L, "http://example.com/z"),              // parent NOT blocked
      (4L, "http://notads.example.com/w"),       // label boundary respected
      (5L, "https://ADS.EXAMPLE.COM/c"))         // case-insensitive
      .toDF("doc_id", "url")
    val blocked = Seq("ads.example.com").toDF("domain")
    val out = WebOps.domainFilterOf(docs, blocked).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(out(1L) === (("ads.example.com", 0L)))
    assert(out(2L) === (("ads.example.com", 0L)))
    assert(out(3L) === (("", 1L)))
    assert(out(4L) === (("", 1L)))
    assert(out(5L) === (("ads.example.com", 0L)))
  }

  // — Boilerplate line removal —————————————————————————————————————

  test("boilerplate removal drops EVERY copy of corpus-frequent lines") {
    val banner = "We use cookies on this site"
    val docs = (1L to 12L).map(i => (i, s"$banner\nunique body line $i"))
      .toDF("doc_id", "text")
    val out = WebOps.boilerplateRemoveOf(docs, maxDocs = 10).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // the banner appears in 12 ≥ 10 docs → removed everywhere (no
    // canonical copy survives, unlike paragraph dedup)
    (1L to 12L).foreach { i =>
      assert(out(i) === ((s"unique body line $i", 2L, 1L)))
    }
  }

  test("boilerplate removal keeps lines under the frequency threshold") {
    val shared = "A merely popular line"
    val docs = (1L to 9L).map(i => (i, s"$shared\nbody $i"))
      .toDF("doc_id", "text")
    val out = WebOps.boilerplateRemoveOf(docs, maxDocs = 10).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === s"$shared\nbody 1") // 9 < 10 docs → survives
  }

  test("boilerplate frequency counts DISTINCT documents, not occurrences") {
    // one doc repeating a line 20 times must not make it corpus-boilerplate
    val docs = Seq((1L, Seq.fill(20)("echo echo echo").mkString("\n")),
      (2L, "other text")).toDF("doc_id", "text")
    val out = WebOps.boilerplateRemoveOf(docs, maxDocs = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) === 0L) // nothing removed: 1 distinct doc < 10
  }

  // — Curated crawl front door —————————————————————————————————————

  test("crawl curation dedups URL pairs and scrubs corpus-wide footers") {
    val footer = "Subscribe to our newsletter for more stories here"
    // 24 fetches of 12 stories: ids 2k/2k+1 share a canonical URL
    val crawled = (0L until 24L).map { id =>
      (id, s"Unique body of story ${id / 2}\n$footer", "en",
        (if (id % 2 == 0) s"HTTP://WWW.S.COM:80/story/${id / 2}?utm_x=$id"
         else s"http://s.com/story/${id / 2}"))
    }.toDF("doc_id", "text", "lang", "url")
    val out = WebOps.curateWebCrawl(crawled).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // the even fetch of each pair survives; its odd twin is gone
    assert(out.keySet === (0L until 24L by 2).toSet)
    // the footer appears in 12 ≥ 10 surviving docs → scrubbed from all
    out.foreach { case (id, text) =>
      assert(text === s"Unique body of story ${id / 2}")
    }
  }

  // — CCNet perplexity buckets —————————————————————————————————————

  test("ppl buckets rank by reference coverage within each language") {
    // ref doc covers "a b c d"'s trigrams; doc 3 shares them all,
    // doc 5 shares none, doc 7 half — head/tail order must follow
    val docs = Seq(
      (2L, "a b c d", "en"),       // the (even) reference doc
      (3L, "a b c d", "en"),       // full coverage
      (5L, "x y z w", "en"),       // zero coverage
      (7L, "a b c q", "en"))       // 1 of 2 trigrams covered
      .toDF("doc_id", "text", "lang")
    val out = WebOps.pplBucketsOf(docs, docs.filter($"doc_id" % 2 === 0))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(4)))).toMap
    assert(out(3L)._1 === 1000000L && out(5L)._1 === 0L && out(7L)._1 === 500000L)
    // four docs → ntile(3) gives sizes 2,1,1 ordered by coverage desc
    assert(out(2L)._2 === "head" && out(3L)._2 === "head")
    assert(out(7L)._2 === "middle")
    assert(out(5L)._2 === "tail")
  }

  // — Temperature mix ——————————————————————————————————————————————

  test("temperature mix hits exact per-source quotas that flatten the skew") {
    // source a: 900 docs, source b: 100 docs → α=0.5 weights 30:10,
    // budget 500 → raw quotas 375 / 125 (vs 450/50 proportional);
    // b's flattened quota EXCEEDS its size, so it caps at 100
    val docs = ((1L to 900L).map(i => (i, "a")) ++ (1001L to 1100L).map(i => (i, "b")))
      .toDF("doc_id", "source")
    val out = WebOps.temperatureMixOf(docs)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("a") === 375L && bySrc("b") === 100L)
    // quota column agrees with the realized counts; ranks are 1..k dense
    val ranks = out.filter($"source" === "b").select("mix_rank")
      .collect().map(_.getLong(0)).sorted
    assert(ranks === (1L to 100L).toArray)
  }

  test("temperature mix is deterministic and a subset of the corpus") {
    val docs = (1L to 200L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val a = WebOps.temperatureMixOf(docs).collect().map(_.getLong(0)).toSeq
    val b = WebOps.temperatureMixOf(docs).collect().map(_.getLong(0)).toSeq
    assert(a === b && a.toSet.subsetOf((1L to 200L).toSet))
  }
}
