package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Markup

/** Markup + encoding hygiene (SURVEY.md §2 rows 94-96): HTML
  * main-text extraction, Unicode normalization, paragraph dedup.
  * DuckDB value parity is the oracle gate's job (the SQL twins are
  * generated from the same step tables); these specs pin the
  * SEMANTICS — what gets dropped, what survives, idempotence. All
  * non-ASCII fixture chars are \u escapes so the bytes are exact. */
class MarkupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Markup.extractHtmlText(col("h")).as("t"))
      .head().getString(0)

  private def normalize(s: String): String =
    Seq(s).toDF("t").select(Markup.normalizeText(col("t")).as("n"))
      .head().getString(0)

  test("html extraction strips nested tags and keeps their text") {
    assert(extract("<div><p>outer <b>bold <i>deep</i></b> tail</p></div>")
      === "outer bold deep tail")
  }

  test("html extraction drops script/style/comment content entirely") {
    val html = "<p>keep</p><script>var hidden = 1 < 2;</script>" +
      "<style>.c { color: red }</style><!-- secret\nnote -->before<p>after</p>"
    val got = extract(html)
    assert(got === "keep\nbefore\nafter")
    assert(!got.contains("hidden") && !got.contains("color") && !got.contains("secret"))
  }

  test("html extraction decodes entities AFTER stripping — no tag resurrection") {
    // &lt;script&gt; must decode to visible text, never act as a tag
    assert(extract("<p>a &amp;&amp; b &lt;script&gt;x&lt;/script&gt; " +
        "&quot;q&quot; it&#39;s&nbsp;ok</p>")
      === "a && b <script>x</script> \"q\" it's ok")
  }

  test("html extraction turns block tags into line breaks, inline tags into joins") {
    assert(extract("<h1>Title</h1><p>one</p><p>two</p><ul><li>a</li><li>b</li></ul>")
      === "Title\none\ntwo\na\nb")
    // inline tags do NOT break the line
    assert(extract("in<b>line</b> <span>span</span>") === "in line span")
  }

  test("html extraction handles attributes, self-closing and uppercase tags") {
    assert(extract("""<DIV CLASS="x"><BR/><A HREF="http://e.com?a=1&amp;b=2">link</A></DIV>""")
      === "link")
    // an entity inside a surviving attribute dies with its tag
    assert(extract("""<span title="a&amp;b">text</span>""") === "text")
  }

  test("normalization recomposes NFD so dedup keys converge") {
    val nfd = "cafe\u0301"  // e + combining acute
    val nfc = "caf\u00E9"    // precomposed
    assert(normalize(nfd) === normalize(nfc))
    assert(normalize(nfd) === nfc)
    // the dedup-key claim itself: sha of normalized forms collides
    val keys = Seq((1L, nfd), (2L, nfc)).toDF("doc_id", "text")
      .select(sha2(Markup.normalizeText(col("text")), 256).as("k"))
      .distinct().count()
    assert(keys === 1L)
  }

  test("normalization strips zero-width chars, BOM and controls; keeps tab/newline") {
    assert(normalize("a\u200Bb\u200Cc\u200Dd\uFEFFe\u00ADf") === "abcdef")
    assert(normalize("x\u0007y\u0000z\u009Cw") === "xyzw")
    assert(normalize("keep\ttab\nand newline") === "keep\ttab\nand newline")
  }

  test("normalization repairs two- and three-byte cp1252 mojibake") {
    assert(normalize("\u00C3\u00A9clair") === "\u00E9clair")
    assert(normalize("don\u00E2\u20AC\u2122t") === "don\u2019t")
    assert(normalize("\u00E2\u20AC\u0153q\u00E2\u20AC\u201D") === "\u201Cq\u2014")
  }

  test("normalization is idempotent") {
    val dirty = "cafe\u0301 \u200B \u00C3\u00A9 don\u00E2\u20AC\u2122t \u0007"
    val once = normalize(dirty)
    assert(normalize(once) === once)
  }

  test("paragraph dedup keeps one canonical occurrence of shared boilerplate") {
    val docs = Seq(
      (1L, "unique body one\n\nshared footer"),
      (2L, "unique body two\n\nshared footer"),
      (3L, "unique body three\n\nshared footer\n\nother boilerplate"),
      (4L, "shared footer")) // doc that is ONLY boilerplate → empties
      .toDF("doc_id", "text")
    val out = Markup.paraDedupOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("unique body one\n\nshared footer", 2L, 0L)))
    assert(out(2L) === (("unique body two", 2L, 1L)))
    assert(out(3L) === (("unique body three\n\nother boilerplate", 3L, 1L)))
    assert(out(4L) === (("", 1L, 1L)))
  }

  test("paragraph dedup splits on any blank-line run; whitespace-only paras vanish") {
    val docs = Seq(
      (1L, "a\n\nb"),
      (2L, "a\n \n  \nb"), // wider blank runs, same two paragraphs
      (3L, "\n\na\n\n"))   // leading/trailing blanks → only 'a', a dup
      .toDF("doc_id", "text")
    val out = Markup.paraDedupOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("a\n\nb", 2L, 0L)))
    assert(out(2L) === (("", 2L, 2L)))
    assert(out(3L) === (("", 1L, 1L)))
  }

  test("sentence dedup keeps the corpus-first occurrence; short sentences never dedup") {
    val boiler = "Please subscribe to our newsletter today." // ≥20 chars → eligible
    val docs = Seq(
      (1L, s"Alpha body one is long enough here. $boiler"),
      (2L, s"$boiler Beta body two is also long enough."),
      (3L, "Yes. Gamma body three stands alone. Yes."), // "Yes." short → survives twice
      (4L, boiler)) // doc that is ONLY boilerplate → empties
      .toDF("doc_id", "text")
    val out = Markup.sentenceDedupOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((s"Alpha body one is long enough here. $boiler", 2L, 0L)))
    assert(out(2L) === (("Beta body two is also long enough.", 2L, 1L)))
    assert(out(3L) === (("Yes. Gamma body three stands alone. Yes.", 3L, 0L)))
    assert(out(4L) === (("", 1L, 1L)))
  }

  test("sentence dedup removes a within-doc repeat and preserves sentence order") {
    val s = "This exact sentence repeats inside one document."
    val docs = Seq((1L, s"$s Middle filler sentence long enough. $s"))
      .toDF("doc_id", "text")
    val r = Markup.sentenceDedupOf(docs).head()
    assert(r.getString(1) === s"$s Middle filler sentence long enough.")
    assert(r.getLong(2) === 3L && r.getLong(3) === 1L)
  }

  test("sentence segmentation: boundaries, abbreviation guard, punctuation runs") {
    def sents(s: String): Seq[String] =
      Markup.sentencesOf(Seq((1L, s)).toDF("doc_id", "text"))
        .select("sentence").as[String].collect().toSeq
    assert(sents("One here. Two here! Three here? Four")
      === Seq("One here.", "Two here!", "Three here?", "Four"))
    // "?!" runs split once, after the run
    assert(sents("Really?! Yes.") === Seq("Really?!", "Yes."))
    // abbreviations do not end sentences
    assert(sents("Dr. Smith met Mrs. Green. They left.")
      === Seq("Dr. Smith met Mrs. Green.", "They left."))
    // no terminal punctuation → one sentence; empty → none
    assert(sents("no punctuation at all") === Seq("no punctuation at all"))
    assert(sents("") === Seq.empty)
    // mid-text newlines count as boundary whitespace
    assert(sents("First.\nSecond.") === Seq("First.", "Second."))
  }

  test("code-switch detection: spliced docs flag mixed; same-language splices stay clean") {
    import graft.operators.Markup
    val en = "the cat and the dog went to the house of the king and it was cold in there"
    val de = "der hund und die katze ist nicht ein tier und das ist von der art mit allem"
    val d = Seq(
      (1L, s"$en. $de"),     // EN doc with a German sentence → mixed, main en (tie? en 1 sent, de 1 sent → count tie breaks on lang code: 'de' < 'en' → main de!)
      (2L, s"$en. $en. $de"), // majority en, one German sentence → mixed, main en
      (3L, s"$de. $de"),     // German both sentences → NOT mixed
      (4L, "qwzx vbnm asdf") // no stopwords → unknown, not mixed
    ).toDF("doc_id", "text")
    val out = Markup.langMixtureOf(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4), r.getLong(5)))).toMap
    // doc 1: 2 sentences, 2 languages, equal counts → tie breaks on
    // language code ('de' < 'en'), deterministic by construction
    assert(out(1L) === ((2L, 2L, "de", 1L, 1L)))
    // doc 2: en majority carries main_lang; still mixed
    assert(out(2L) === ((3L, 2L, "en", 2L, 1L)))
    // doc 3: two German sentences — mixture is about LANGUAGES, not
    // sentence count
    assert(out(3L) === ((2L, 1L, "de", 2L, 0L)))
    // doc 4: unknown never counts toward n_langs, never flags
    assert(out(4L) === ((1L, 0L, "unknown", 1L, 0L)))
  }

  test("registered markup queries have scale-sane plans") {
    // extraction + normalization are pure projections: no exchange at
    // all before the presentation orderBy's range partitioning
    for (q <- Seq("t_extract_html", "t_normalize")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"$q should be map-only, got:\n$plan")
    }
    // paragraph dedup shuffles on the md5 key / doc id, never a
    // cartesian or nested-loop anywhere
    val plan = SparkEntry.queries("d_para_dedup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }
}
