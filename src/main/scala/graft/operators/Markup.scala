package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Markup and encoding hygiene for web-crawl corpora — the stages
  * that run BEFORE langid/quality/gopher scoring in every real
  * pipeline (SURVEY.md §2 rows 94-96):
  *
  *  - HTML main-text extraction: tag strip, script/style/comment
  *    drop, entity decode, block-level newline normalization.
  *  - Unicode normalization: NFC composition (dedup keys for NFD
  *    twins), zero-width/control strip, cp1252 mojibake repair.
  *  - Paragraph-level dedup: the tier between document-level hash
  *    dedup and span-level ExactSubstr — boilerplate paragraphs
  *    (footers, subscribe blocks) keep one canonical occurrence
  *    corpus-wide.
  *
  * Every transform is a single codegen'd projection built by folding
  * a SHARED step table into either a Spark `Column` chain or the
  * equivalent DuckDB SQL expression — one source of truth, two
  * engines, so the oracle can never drift from the implementation.
  * Patterns stick to the RE2 ∩ java.util.regex dialect (no
  * backreferences, no lookaround; inline `(?is)` flags and `\x{…}`
  * classes are common to both).
  */
object Markup {

  /** A replacement step: regex or plain-string, applied in order. */
  private[operators] final case class Step(pattern: String, replacement: String, regex: Boolean)

  // — HTML extraction chain ————————————————————————————————————————
  // 1. drop content-free containers wholesale (script/style/comments);
  // 2. block-level tags become newlines so paragraphs survive;
  // 3. every remaining tag becomes a space;
  // 4. entities decode AFTER stripping (decoded "<b>" is text, not a
  //    tag — the standard injection-safe order);
  // 5. whitespace: horizontal runs collapse, newlines tidy, trim.
  private val htmlSteps: Seq[Step] = Seq(
    Step("(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->", " ", regex = true),
    Step("(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|table|blockquote|section|article)\\b[^>]*>",
      "\n", regex = true),
    Step("<[^>]*>", " ", regex = true),
    Step("&lt;", "<", regex = false),
    Step("&gt;", ">", regex = false),
    Step("&quot;", "\"", regex = false),
    Step("&#39;", "'", regex = false),
    Step("&nbsp;", " ", regex = false),
    Step("&amp;", "&", regex = false),
    Step("[ \\t]+", " ", regex = true),
    Step("\\s*\\n\\s*", "\n", regex = true),
    Step("^\\s+|\\s+$", "", regex = true))

  // — Unicode normalization chain (minus the NFC step, which is the
  //   native expression / DuckDB nfc_normalize) ————————————————————
  // cp1252 double-encoding repairs: UTF-8 bytes of a non-ASCII char
  // misdecoded as cp1252 ("é" → "Ã©", "—" → "â€”"). Fixed unambiguous
  // table; applied BEFORE the control strip (the sequences hold
  // printable cp1252 punctuation, never C1 controls).
  // \u escapes, not raw chars: the sequences ARE the spec, and a
  // source-encoding hiccup would silently change them
  private val mojibakeSteps: Seq[Step] = Seq(
    // two-byte Latin-1 victims: \u00C3 + second byte ("\u00C3\u00A9" -> e-acute, ...)
    "\u00C3\u00A9" -> "\u00E9", "\u00C3\u00A8" -> "\u00E8",
    "\u00C3\u00A4" -> "\u00E4", "\u00C3\u00B6" -> "\u00F6",
    "\u00C3\u00BC" -> "\u00FC", "\u00C3\u00B1" -> "\u00F1",
    "\u00C3\u00A7" -> "\u00E7",
    // three-byte punctuation victims: \u00E2\u20AC + the cp1252 image
    // of the third UTF-8 byte (curly quotes, dashes, ellipsis)
    "\u00E2\u20AC\u2122" -> "\u2019", "\u00E2\u20AC\u02DC" -> "\u2018",
    "\u00E2\u20AC\u0153" -> "\u201C", "\u00E2\u20AC\u201C" -> "\u2013",
    "\u00E2\u20AC\u201D" -> "\u2014", "\u00E2\u20AC\u00A6" -> "\u2026")
    .map { case (p, r) => Step(p, r, regex = false) }

  // zero-width + soft hyphen + BOM, then control chars (C0 minus
  // tab/newline, DEL, C1) — invisible bytes that split dedup keys
  private val stripSteps: Seq[Step] = Seq(
    Step("[\\x{200B}-\\x{200D}\\x{FEFF}\\x{00AD}]", "", regex = true),
    Step("[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}\\x{007F}-\\x{009F}]",
      "", regex = true))

  // — step-table folds: one for Spark, one for DuckDB ——————————————
  private[operators] def applySteps(c: Column, steps: Seq[Step]): Column =
    steps.foldLeft(c) { (acc, s) =>
      if (s.regex) regexp_replace(acc, s.pattern, s.replacement)
      else replace(acc, lit(s.pattern), lit(s.replacement))
    }

  /** SQL string literal with non-ASCII and control chars as chr(n)
    * concatenations — keeps the generated oracle pure-ASCII and
    * quote-safe. */
  private[operators] def sqlLit(s: String): String = {
    if (s.isEmpty) "''"
    else s.map { ch =>
      if (ch >= ' ' && ch < 0x7f && ch != '\'') s"'$ch'"
      else if (ch == '\'') "''''"
      else s"chr(${ch.toInt})"
    }.foldLeft(List.empty[String]) {
      // merge adjacent plain literals back together
      case (h :: t, nxt) if h.startsWith("'") && nxt.startsWith("'") =>
        (h.dropRight(1) + nxt.drop(1)) :: t
      case (acc, nxt) => nxt :: acc
    }.reverse.mkString(" || ")
  }

  private[operators] def sqlSteps(inner: String, steps: Seq[Step]): String =
    steps.foldLeft(inner) { (acc, s) =>
      if (s.regex) s"regexp_replace($acc, ${sqlLit(s.pattern)}, ${sqlLit(s.replacement)}, 'g')"
      else s"replace($acc, ${sqlLit(s.pattern)}, ${sqlLit(s.replacement)})"
    }

  // — HTML main-text extraction ————————————————————————————————————

  /** The extraction as a scalar column — one codegen'd projection. */
  def extractHtmlText(html: Column): Column = applySteps(html, htmlSteps)

  /** The same extraction as a DuckDB SQL expression over `inner`. */
  def extractHtmlSql(inner: String): String = sqlSteps(inner, htmlSteps)

  /** Deterministic HTML wrapper around a document — the planted
    * fixture both engines build identically: head noise (title/style/
    * script), comments, block structure, and entity-encoded text that
    * must decode to visible characters (not resurrect as tags). */
  def plantHtml(docId: Column, text: Column): Column = concat(
    lit("<html><head><title>Doc "), docId.cast(StringType), lit("</title>"),
    lit("<style type=\"text/css\">body { margin: 0; }</style>"),
    lit("<script>if (1 < 2 && 2 > 1) { var x = \"y\"; }</script>"),
    lit("</head><body><!-- boilerplate\nheader -->"),
    lit("<h1 class=\"t\">Doc "), docId.cast(StringType), lit("</h1><p>"),
    text,
    lit("</p><div id=\"f\">Tips &amp; tricks &lt;b&gt;bold&lt;/b&gt; "
      + "&quot;quoted&quot; it&#39;s&nbsp;done</div></body></html>"))

  /** SQL twin of [[plantHtml]]. */
  def plantHtmlSql(docId: String, text: String): String = Seq(
    sqlLit("<html><head><title>Doc "), s"CAST($docId AS VARCHAR)", sqlLit("</title>"),
    sqlLit("<style type=\"text/css\">body { margin: 0; }</style>"),
    sqlLit("<script>if (1 < 2 && 2 > 1) { var x = \"y\"; }</script>"),
    sqlLit("</head><body><!-- boilerplate\nheader -->"),
    sqlLit("<h1 class=\"t\">Doc "), s"CAST($docId AS VARCHAR)", sqlLit("</h1><p>"),
    text,
    sqlLit("</p><div id=\"f\">Tips &amp; tricks &lt;b&gt;bold&lt;/b&gt; "
      + "&quot;quoted&quot; it&#39;s&nbsp;done</div></body></html>"))
    .mkString(" || ")

  /** Registered `t_extract_html`: every document wrapped in the
    * planted HTML shell, then extracted — the oracle rebuilds the
    * shell and runs the generated twin chain, so construction AND
    * extraction hash-match end-to-end. Pure projection: no shuffle,
    * scales as a map-only pass. */
  def extractHtml(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        extractHtmlText(plantHtml(col("doc_id"), col("text"))).as("clean_text"))
      .withColumn("n_chars", length(col("clean_text")).cast(LongType))
      .orderBy("doc_id")

  def extractHtmlOracle: String =
    s"""SELECT doc_id, ${extractHtmlSql(plantHtmlSql("doc_id", "text"))} AS clean_text,
       |  CAST(length(${extractHtmlSql(plantHtmlSql("doc_id", "text"))}) AS BIGINT) AS n_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  // — Unicode normalization / mojibake repair ——————————————————————

  /** repair → NFC compose → invisible strip, as one projection.
    * Idempotent: repaired text holds no mojibake lead bytes, NFC is a
    * fixpoint, stripped classes never reappear (spec-pinned). */
  def normalizeText(text: Column): Column =
    applySteps(graft.functions.native.nfc_normalize(applySteps(text, mojibakeSteps)),
      stripSteps)

  /** The same normalization as a DuckDB SQL expression. */
  def normalizeTextSql(inner: String): String =
    sqlSteps(s"nfc_normalize(${sqlSteps(inner, mojibakeSteps)})", stripSteps)

  /** Deterministic dirty prefix: NFD sequence (e + combining acute),
    * zero-width joiners, a BOM, mojibake (two-byte and three-byte
    * cp1252 victims) - every branch of the normalizer fires on every
    * row. Built from \u escapes so the fixture bytes are exact. */
  private val dirtyPrefix =
    "cafe\u0301 " +                       // NFD e+acute -> recomposes
    "zero\u200Bwidth\u200D \uFEFF" +     // zero-widths + BOM -> stripped
    "\u00C3\u00A9clair " +                // mojibake e-acute -> repaired
    "\u00E2\u20AC\u2122s " +             // mojibake right-quote
    "\u00E2\u20AC\u0153q " +             // mojibake left-dquote
    "\u00E2\u20AC\u201Dd "               // mojibake em-dash

  /** Registered `t_normalize`: documents with the planted dirty
    * prefix, normalized; emits the cleaned text plus the two audit
    * counters a pipeline alerts on (chars removed, chars recomposed).
    * Map-only projection — scales like a scan. */
  def normalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), concat(lit(dirtyPrefix), col("text")).as("raw"))
      .select(col("doc_id"), normalizeText(col("raw")).as("clean_text"),
        (length(col("raw")) - length(normalizeText(col("raw"))))
          .cast(LongType).as("n_chars_removed"))
      .orderBy("doc_id")

  def normalizeOracle: String = {
    val raw = s"${sqlLit(dirtyPrefix)} || text"
    s"""SELECT doc_id, ${normalizeTextSql(raw)} AS clean_text,
       |  CAST(length($raw) - length(${normalizeTextSql(raw)}) AS BIGINT) AS n_chars_removed
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // — Web front door: wrap + clean, for the end-to-end export ——————

  /** A document as a web crawl delivers it: the HTML shell around a
    * body that leads with the encoding-damaged prefix. */
  def webWrap(docId: Column, text: Column): Column =
    plantHtml(docId, concat(lit(dirtyPrefix), text))

  def webWrapSql(docId: String, text: String): String =
    plantHtmlSql(docId, s"${sqlLit(dirtyPrefix)} || $text")

  /** The full web-hygiene pass: extraction then normalization. */
  def webClean(html: Column): Column = normalizeText(extractHtmlText(html))

  def webCleanSql(inner: String): String = normalizeTextSql(extractHtmlSql(inner))

  /** The documents table as a crawled-and-cleaned corpus, as a DuckDB
    * source subquery — the web variant of the corpus-export oracle
    * reads from this instead of raw `documents`. */
  def webSourceSql: String =
    s"(SELECT doc_id, ${webCleanSql(webWrapSql("doc_id", "text"))} AS text, lang FROM documents)"

  // — Paragraph-level dedup ————————————————————————————————————————

  /** Keep one canonical occurrence (smallest (doc_id, position)) of
    * every distinct paragraph corpus-wide; rebuild documents from
    * their surviving paragraphs. The tier between document-hash dedup
    * (whole-text key) and ExactSubstr (L-token spans): boilerplate
    * footers repeat verbatim across documents whose bodies differ.
    *
    * Scale shape: explode on blank-line splits → md5 paragraph keys
    * (32-byte shuffle keys, uniform — no skew) → one rank window
    * partitioned BY PARAGRAPH KEY (occurrence-count-sized partitions,
    * never by doc or corpus) → per-doc ordered reassembly. Same
    * shuffle budget as document-hash dedup, one tier finer. */
  def paraDedupOf(docs: DataFrame): DataFrame = {
    val paras = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\\n\\s*\\n")))
      .select(col("doc_id"), col("pos"), col("col").as("para"))
      .filter(length(TextOps.wsTrim(col("para"))) > 0)
    val w = Window.partitionBy("k").orderBy("doc_id", "pos")
    val kept = paras
      .withColumn("k", md5(col("para")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("para")))).as("pp"),
        count(lit(1)).as("n_kept"))
      .select(col("doc_id"),
        concat_ws("\n\n", transform(col("pp"), x => x.getField("para"))).as("clean_text"),
        col("n_kept"))
    paras.groupBy("doc_id").agg(count(lit(1)).as("n_paras"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_paras").cast(LongType).as("n_paras"),
        (col("n_paras") - coalesce(col("n_kept"), lit(0L)))
          .cast(LongType).as("n_dup_paras"))
      .orderBy("doc_id")
  }

  /** Registered `d_para_dedup`: the corpus has no native paragraph
    * structure, so both engines append the same two boilerplate
    * paragraphs — one global (dup across the whole corpus), one
    * per-source (dup across each source's documents). After dedup the
    * first document keeps the global footer, the first document of
    * each source keeps its source footer, and every body survives. */
  def paraDedup(spark: SparkSession, dir: String): DataFrame =
    paraDedupOf(Tables.documentsNarrow(spark, dir)
      .select(col("doc_id"), concat(col("text"),
        lit("\n\nsubscribe to the newsletter for weekly updates"),
        lit("\n\ncopyright "), col("source"),
        lit(" all rights reserved")).as("text")))

  // — Sentence segmentation ————————————————————————————————————————

  // abbreviations whose trailing period must NOT end a sentence; the
  // protect step marks them with \x02 (restored to a space after the
  // boundary pass), so no lookbehind is needed — the RE2 ∩ Java
  // dialect has none
  private val abbreviations = Seq("Mr", "Mrs", "Ms", "Dr", "Prof", "St", "No", "vs")

  // sentinels (outside any text alphabet): \u0001 marks a sentence
  // boundary, \u0002 protects an abbreviation's period+space; neither
  // is \s in either regex dialect, so protected periods never fire
  private val SB = "\u0001"
  private val AP = "\u0002"

  private val sentenceSteps: Seq[Step] =
    abbreviations.map(a => Step(s"$a. ", s"$a.$AP", regex = false)) ++ Seq(
      // terminal-punctuation run + whitespace → sentinel boundary; the
      // run's LAST char decides (".?!" each get a rule, so "?!" splits
      // after the "!")
      Step("\\.\\s+", "." + SB, regex = true),
      Step("!\\s+", "!" + SB, regex = true),
      Step("\\?\\s+", "?" + SB, regex = true),
      Step(AP, " ", regex = false))

  /** Boundary-marked text: sentences separated by \u0001. */
  private def markSentences(text: Column): Column = applySteps(text, sentenceSteps)

  /** Sentence segmentation: one row per sentence with its 1-based
    * index. Simple terminal-punctuation heuristic with an
    * abbreviation guard — the chunking granularity between characters
    * and paragraphs that dedup/quality stages key on. Map-only until
    * the explode; no shuffle before the presentation sort. */
  def sentencesOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(split(markSentences(col("text")), SB)))
      .select(col("doc_id"), (col("pos") + 1).cast(LongType).as("sent_idx"),
        TextOps.wsTrim(col("col")).as("sentence"))
      .filter(length(col("sentence")) > 0)
      .orderBy("doc_id", "sent_idx")

  /** Deterministic punctuation frame: the corpus has none of its own,
    * so both engines wrap each document in the same sentence shell —
    * abbreviations, a "?!" run, and an unterminated tail all fire. */
  def sentences(spark: SparkSession, dir: String): DataFrame =
    sentencesOf(Tables.documents(spark, dir)
      .select(col("doc_id"), concat(
        lit("Dr. Smith met Mrs. Green. It was cold! "), col("text"),
        lit(" Did the metrics move?! Yes. The end")).as("text")))

  def sentencesOracle: String = {
    val planted = sqlLit("Dr. Smith met Mrs. Green. It was cold! ") +
      " || text || " + sqlLit(" Did the metrics move?! Yes. The end")
    val marked = sqlSteps(planted, sentenceSteps)
    // sent_idx is the RAW segment index on both sides (not renumbered
    // post-filter), so a pathological empty segment gaps identically
    // in both engines
    s"""WITH sp AS (SELECT doc_id, string_split($marked, chr(1)) AS ss FROM documents),
       |se AS (SELECT doc_id, i, regexp_replace(ss[i], ${sqlLit("^\\s+|\\s+$")}, '', 'g') AS sentence
       |       FROM (SELECT doc_id, ss, unnest(generate_series(1, len(ss))) AS i FROM sp))
       |SELECT doc_id, CAST(i AS BIGINT) AS sent_idx, sentence
       |FROM se WHERE length(sentence) > 0 ORDER BY doc_id, sent_idx""".stripMargin
  }

  // — Code-switch (mixed-language) detection ———————————————————————

  /** The planted second-language sentence of the registered
    * code-switch query — ONE Scala constant feeds both the Spark
    * splice and the generated SQL twin. */
  private[operators] val codeSwitchSplice =
    ". Der hund und die katze ist nicht ein tier von der mit das und."

  /** CODE-SWITCH detection: per-SENTENCE language ID rolled up to a
    * document mixture profile — a document whose sentences disagree
    * on language is poison for a monolingual training corpus, and
    * document-level langid (one argmax over the whole text) cannot
    * see it: the dominant language drowns the spliced one. Pipeline:
    * sentence segmentation ([[sentencesOf]]) → the row-123 stopword
    * scorer per sentence (no mid-pipeline sort) → one count per
    * (doc, lang), one rank-1 window over language-count rows (bounded
    * by the dictionary size per doc, never sentence-count), one
    * per-doc aggregate. All-integer outputs; ties on sentence count
    * break on language code for a total, engine-reproducible order. */
  def langMixtureOf(docs: DataFrame): DataFrame = {
    val lab = TextOps.langScoredOf(
        sentencesOf(docs).select(col("doc_id"), col("sentence").as("text")))
      .select(col("doc_id"), col("detected_lang").as("lang"))
    val cnt = lab.groupBy("doc_id", "lang").agg(count(lit(1)).as("c"))
    val win = Window.partitionBy("doc_id").orderBy(col("c").desc, col("lang"))
    val dom = cnt.withColumn("rn", row_number().over(win)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("main_lang"), col("c").as("main_count"))
    val agg = lab.groupBy("doc_id").agg(
      count(lit(1)).as("n_sentences"),
      countDistinct(when(col("lang") =!= "unknown", col("lang"))).as("n_langs"))
    agg.join(dom, "doc_id")
      .select(col("doc_id"), col("n_sentences"), col("n_langs"),
        col("main_lang"), col("main_count"),
        when(col("n_langs") >= 2, 1L).otherwise(0L).as("is_mixed"))
      .orderBy("doc_id")
  }

  /** Registered `t_langid_mixed`: every fifth document gets
    * [[codeSwitchSplice]] appended (a strongly German sentence behind
    * a sentence boundary), so the corpus carries real code-switched
    * documents — and German base documents prove the flag is about
    * MIXTURE, not the splice (their n_langs stays 1). */
  def langMixture(spark: SparkSession, dir: String): DataFrame =
    langMixtureOf(Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(codeSwitchSplice)))
          .otherwise(col("text")).as("text")))

  /** Generated twin of [[langMixture]]: splice, segmentation steps,
    * and stopword alternations all derive from the same Scala values
    * as the Spark plan (the markup-twin discipline), so neither the
    * dictionaries nor the boundary rules can drift. */
  def langMixtureOracle: String = {
    val planted =
      s"CASE WHEN doc_id % 5 = 0 THEN text || ${sqlLit(codeSwitchSplice)} ELSE text END"
    val marked = sqlSteps(planted, sentenceSteps)
    val scores = TextOps.langDicts.map { case (lang, words) =>
      s"CAST(len(regexp_extract_all(lower(sentence), " +
        s"'\\b(${words.mkString("|")})\\b')) AS BIGINT) AS score_$lang"
    }.mkString(",\n       |    ")
    s"""WITH sp AS (SELECT doc_id, string_split($marked, chr(1)) AS ss FROM documents),
       |se AS (SELECT doc_id, regexp_replace(ss[i], ${sqlLit("^\\s+|\\s+$")}, '', 'g') AS sentence
       |       FROM (SELECT doc_id, ss, unnest(generate_series(1, len(ss))) AS i FROM sp)),
       |sent AS (SELECT doc_id, sentence FROM se WHERE length(sentence) > 0),
       |sc AS (SELECT doc_id,
       |    $scores,
       |    CAST(length(regexp_replace(sentence, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS BIGINT) AS score_zh
       |  FROM sent),
       |lab AS (SELECT doc_id,
       |    CASE WHEN score_zh > 0 THEN 'zh'
       |         WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'unknown'
       |         WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
       |         WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
       |         WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
       |         ELSE 'es' END AS lang
       |  FROM sc),
       |cnt AS (SELECT doc_id, lang, COUNT(*) AS c FROM lab GROUP BY 1, 2),
       |dom AS (SELECT doc_id, lang AS main_lang, c AS main_count,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lang) AS rn FROM cnt),
       |agg AS (SELECT doc_id, COUNT(*) AS n_sentences,
       |    COUNT(DISTINCT CASE WHEN lang <> 'unknown' THEN lang END) AS n_langs
       |  FROM lab GROUP BY doc_id)
       |SELECT a.doc_id, CAST(a.n_sentences AS BIGINT) AS n_sentences,
       |  CAST(a.n_langs AS BIGINT) AS n_langs, d.main_lang,
       |  CAST(d.main_count AS BIGINT) AS main_count,
       |  CAST(CASE WHEN a.n_langs >= 2 THEN 1 ELSE 0 END AS BIGINT) AS is_mixed
       |FROM agg a JOIN dom d ON d.doc_id = a.doc_id AND d.rn = 1
       |ORDER BY a.doc_id""".stripMargin
  }

  // — Sentence-level dedup ——————————————————————————————————————————

  /** Sentence-level exact dedup — the tier between paragraph dedup
    * and ExactSubstr spans, at the granularity CCNet dedups on:
    * share-bars and legal lines repeat as single sentences inside
    * otherwise-unique paragraphs, invisible to both coarser tiers.
    * Segmentation is [[sentencesOf]]'s boundary scheme; dedup is the
    * paragraph tier's rank idiom on md5(sentence) — 32-byte uniform
    * shuffle keys, rank window partitioned by the SENTENCE key
    * (occurrence-sized partitions, never doc- or corpus-sized).
    * Sentences shorter than `minChars` never dedup: "Yes." repeating
    * across a corpus is language, not boilerplate — the CCNet-style
    * length guard, and a skew guard too (tiny sentences are the
    * high-frequency keys). Eligibility is a function of the sentence
    * itself, so every occurrence of a key agrees on it. */
  def sentenceDedupOf(docs: DataFrame, minChars: Int = 20): DataFrame = {
    val sents = docs
      .select(col("doc_id"), posexplode(split(markSentences(col("text")), SB)))
      .select(col("doc_id"), col("pos"), TextOps.wsTrim(col("col")).as("sentence"))
      .filter(length(col("sentence")) > 0)
    val w = Window.partitionBy("k").orderBy("doc_id", "pos")
    val kept = sents
      .withColumn("k", md5(col("sentence")))
      .withColumn("eligible", length(col("sentence")) >= minChars)
      .withColumn("rn", row_number().over(w))
      .filter(!col("eligible") || col("rn") === 1)
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("sentence")))).as("ss"),
        count(lit(1)).as("n_kept"))
      .select(col("doc_id"),
        concat_ws(" ", transform(col("ss"), x => x.getField("sentence"))).as("clean_text"),
        col("n_kept"))
    sents.groupBy("doc_id").agg(count(lit(1)).as("n_sents"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_sents").cast(LongType).as("n_sents"),
        (col("n_sents") - coalesce(col("n_kept"), lit(0L)))
          .cast(LongType).as("n_dup_sents"))
      .orderBy("doc_id")
  }

  private val sentDupHead = "Subscribe to our free newsletter for weekly updates. "
  private val sentDupTail = ". All material on this site is copyright protected."

  /** Registered `d_sentence_dedup`: both engines frame each document
    * with the same two boilerplate sentences — the tail's leading
    * ". " also terminates the document body, so the planted sentences
    * segment identically everywhere. After dedup the corpus-first
    * occurrence of each boilerplate sentence survives, every document
    * body survives, and short sentences are never touched. */
  def sentenceDedup(spark: SparkSession, dir: String): DataFrame =
    sentenceDedupOf(Tables.documentsNarrow(spark, dir)
      .select(col("doc_id"),
        concat(lit(sentDupHead), col("text"), lit(sentDupTail)).as("text")))

  def sentenceDedupOracle: String = {
    val planted = sqlLit(sentDupHead) + " || text || " + sqlLit(sentDupTail)
    val marked = sqlSteps(planted, sentenceSteps)
    s"""WITH sp AS (SELECT doc_id, string_split($marked, chr(1)) AS ss FROM documents),
       |se AS (SELECT doc_id, i, regexp_replace(ss[i], ${sqlLit("^\\s+|\\s+$")}, '', 'g') AS sentence
       |       FROM (SELECT doc_id, ss, unnest(generate_series(1, len(ss))) AS i FROM sp)),
       |sf AS (SELECT doc_id, i, sentence, md5(sentence) AS k,
       |         length(sentence) >= 20 AS eligible
       |       FROM se WHERE length(sentence) > 0),
       |r AS (SELECT doc_id, i, sentence, eligible,
       |        ROW_NUMBER() OVER (PARTITION BY k ORDER BY doc_id, i) AS rn FROM sf),
       |kept AS (SELECT doc_id, string_agg(sentence, ' ' ORDER BY i) AS clean_text,
       |         count(*) AS n_kept FROM r WHERE NOT eligible OR rn = 1 GROUP BY doc_id),
       |tot AS (SELECT doc_id, count(*) AS n_sents FROM sf GROUP BY doc_id)
       |SELECT t.doc_id, COALESCE(k.clean_text, '') AS clean_text,
       |  CAST(t.n_sents AS BIGINT) AS n_sents,
       |  CAST(t.n_sents - COALESCE(k.n_kept, 0) AS BIGINT) AS n_dup_sents
       |FROM tot t LEFT JOIN kept k ON t.doc_id = k.doc_id ORDER BY t.doc_id""".stripMargin
  }

  def paraDedupOracle: String = {
    val planted = "text || " + sqlLit("\n\nsubscribe to the newsletter for weekly updates") +
      " || " + sqlLit("\n\ncopyright ") + " || source || " + sqlLit(" all rights reserved")
    s"""WITH p0 AS (SELECT doc_id, $planted AS text FROM documents),
       |sp AS (SELECT doc_id, regexp_split_to_array(text, ${sqlLit("\\n\\s*\\n")}) AS ps FROM p0),
       |pe AS (SELECT doc_id, i, ps[i] AS para
       |       FROM (SELECT doc_id, ps, unnest(generate_series(1, len(ps))) AS i FROM sp)),
       |pf AS (SELECT doc_id, i, para, md5(para) AS k FROM pe
       |       WHERE length(regexp_replace(para, ${sqlLit("^\\s+|\\s+$")}, '', 'g')) > 0),
       |r AS (SELECT doc_id, i, para,
       |        ROW_NUMBER() OVER (PARTITION BY k ORDER BY doc_id, i) AS rn FROM pf),
       |kept AS (SELECT doc_id, string_agg(para, chr(10) || chr(10) ORDER BY i) AS clean_text,
       |         count(*) AS n_kept FROM r WHERE rn = 1 GROUP BY doc_id),
       |tot AS (SELECT doc_id, count(*) AS n_paras FROM pf GROUP BY doc_id)
       |SELECT t.doc_id, COALESCE(k.clean_text, '') AS clean_text,
       |  CAST(t.n_paras AS BIGINT) AS n_paras,
       |  CAST(t.n_paras - COALESCE(k.n_kept, 0) AS BIGINT) AS n_dup_paras
       |FROM tot t LEFT JOIN kept k ON t.doc_id = k.doc_id ORDER BY t.doc_id""".stripMargin
  }
}
