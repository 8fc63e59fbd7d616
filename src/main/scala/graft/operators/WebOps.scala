package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.sources.Tables
import Markup.{Step, applySteps, sqlSteps, sqlLit}

/** Web-corpus curation operators (SURVEY.md §2 rows 102-105) — the
  * stages between [[Markup]]'s hygiene pass and [[TextOps]]' scoring
  * tiers in a crawl-to-training-mix pipeline:
  *
  *  - C4 line-level filtering (Raffel et al. 2020 §2.2): the
  *    canonical rule set every web corpus applies after main-text
  *    extraction — terminal-punctuation lines, minimum words per
  *    line, javascript/lorem-ipsum/curly-brace drops, minimum
  *    retained lines per page.
  *  - URL canonicalization + URL-level dedup: crawls revisit the
  *    same page under case/`www.`/default-port/tracking-param/
  *    fragment variants; canonicalize, then keep the earliest
  *    occurrence per canonical URL (the tier BEFORE content-hash
  *    dedup — it fires even when the fetched bodies differ by ads).
  *  - CCNet perplexity bucketing (Wenzek et al. 2020 §4.3): split
  *    each language's documents into head/middle/tail thirds by LM
  *    fluency — the corpus-quality partitioning downstream mixes
  *    key on.
  *  - Temperature-based source mixing (Gopher/Raffel multinomial
  *    sampling with α = 0.5): per-source quotas ∝ √(source size),
  *    flattening the source distribution so mega-sources stop
  *    dominating without starving small ones.
  *
  * Like [[Markup]], every text transform folds ONE shared step table
  * into both the Spark `Column` chain and the DuckDB oracle SQL, and
  * every threshold is integer arithmetic (or IEEE-correctly-rounded
  * `sqrt`, identical across engines), so each operator hash-matches
  * its oracle end-to-end.
  */
object WebOps {

  private def wsTrim(c: Column): Column = regexp_replace(c, "^\\s+|\\s+$", "")
  private def wsTrimSql(inner: String): String =
    s"regexp_replace($inner, ${sqlLit("^\\s+|\\s+$")}, '', 'g')"

  // — C4 line-level filtering ——————————————————————————————————————

  /** Line-keep rules (C4): ends in terminal punctuation, ≥ 5 words,
    * no "javascript". Page-keep rules: no "lorem ipsum", no "{",
    * ≥ 3 retained lines. */
  private val minWordsPerLine = 5
  private val minKeptLines    = 3

  private def lineKeep(lt: Column): Column =
    lt.rlike("[.!?\"]$") &&
      size(split(lt, "\\s+")) >= minWordsPerLine &&
      !lower(lt).contains("javascript")

  private def lineKeepSql(lt: String): String =
    s"(regexp_matches($lt, ${sqlLit("[.!?\"]$")})" +
      s" AND len(regexp_split_to_array($lt, ${sqlLit("\\s+")})) >= $minWordsPerLine" +
      s" AND NOT contains(lower($lt), 'javascript'))"

  /** C4 filtering over pre-split lines: keep qualifying lines in
    * order, flag pages that fail the page-level rules. Scale shape:
    * one explode on newline splits, per-line predicates are pure
    * codegen, reassembly is one doc-keyed aggregate — the same
    * shuffle budget as paragraph dedup, and the page flags ride the
    * SAME aggregate (no second pass over the corpus). */
  def c4FilterOf(docs: DataFrame): DataFrame = {
    val lines = docs
      .select(col("doc_id"), col("text"), posexplode(split(col("text"), "\n")))
      .select(col("doc_id"), col("text"), col("pos"), wsTrim(col("col")).as("lt"))
    lines
      .withColumn("keep_line", lineKeep(col("lt")))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast(LongType).as("n_lines"),
        sum(when(col("keep_line"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws("\n", transform(
          array_sort(collect_list(when(col("keep_line"),
            struct(col("pos"), col("lt"))))),
          x => x.getField("lt"))).as("clean_text"),
        max(lower(col("text")).contains("lorem ipsum")).as("has_lorem"),
        max(col("text").contains("{")).as("has_brace"))
      .select(col("doc_id"), col("clean_text"), col("n_lines"), col("n_kept"),
        when(!col("has_lorem") && !col("has_brace") &&
          col("n_kept") >= minKeptLines, 1L).otherwise(0L).as("keep_doc"))
      .orderBy("doc_id")
  }

  /** Deterministic page frame: seven lines exercising every line
    * rule, with the page-level lorem-ipsum / curly-brace triggers
    * planted on doc_id strides so both engines drop the same pages.
    * Kept lines per clean page: 1, 4, 6, 7 (n_kept = 4). */
  private def frameText(docId: Column, text: Column): Column = concat_ws("\n",
    lit("The quick survey of corpus hygiene is a rewarding pursuit."),
    lit("too short."),
    lit("Please enable JavaScript to view the comments powered here."),
    concat(text, lit(" and more filler words complete the line.")),
    lit("a line with no terminal punctuation at all"),
    when(docId % 7 === 0,
      lit("Lorem ipsum dolor sit amet, consectetur adipiscing elit."))
      .otherwise(lit("Our editors review every submission with considerable care.")),
    when(docId % 11 === 0, lit("function handler() { return window.status; }"))
      .otherwise(lit("Sign up for the weekly digest to receive curated updates.")))

  private def frameTextSql(docId: String, text: String): String = Seq(
    sqlLit("The quick survey of corpus hygiene is a rewarding pursuit."),
    sqlLit("too short."),
    sqlLit("Please enable JavaScript to view the comments powered here."),
    s"($text || ${sqlLit(" and more filler words complete the line.")})",
    sqlLit("a line with no terminal punctuation at all"),
    s"(CASE WHEN $docId % 7 = 0 THEN ${sqlLit("Lorem ipsum dolor sit amet, consectetur adipiscing elit.")}" +
      s" ELSE ${sqlLit("Our editors review every submission with considerable care.")} END)",
    s"(CASE WHEN $docId % 11 = 0 THEN ${sqlLit("function handler() { return window.status; }")}" +
      s" ELSE ${sqlLit("Sign up for the weekly digest to receive curated updates.")} END)")
    .mkString("(", " || chr(10) || ", ")")

  /** Registered `t_c4_filter`: every document wrapped in the planted
    * seven-line frame, then C4-filtered. */
  def c4Filter(spark: SparkSession, dir: String): DataFrame =
    c4FilterOf(Tables.documents(spark, dir)
      .select(col("doc_id"), frameText(col("doc_id"), col("text")).as("text")))

  def c4FilterOracle: String = {
    val framed = frameTextSql("doc_id", "text")
    s"""WITH f AS (SELECT doc_id, $framed AS text FROM documents),
       |sp AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls FROM f),
       |le AS (SELECT doc_id, text, i, ${wsTrimSql("ls[i]")} AS lt
       |       FROM (SELECT doc_id, text, ls, unnest(generate_series(1, len(ls))) AS i FROM sp)),
       |lk AS (SELECT doc_id, text, i, lt, ${lineKeepSql("lt")} AS keep_line FROM le),
       |ag AS (SELECT doc_id,
       |         count(*) AS n_lines,
       |         sum(CASE WHEN keep_line THEN 1 ELSE 0 END) AS n_kept,
       |         COALESCE(string_agg(CASE WHEN keep_line THEN lt END, chr(10) ORDER BY i)
       |           FILTER (WHERE keep_line), '') AS clean_text,
       |         max(CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END) AS has_lorem,
       |         max(CASE WHEN contains(text, '{') THEN 1 ELSE 0 END) AS has_brace
       |       FROM lk GROUP BY doc_id)
       |SELECT doc_id, clean_text, CAST(n_lines AS BIGINT) AS n_lines,
       |  CAST(n_kept AS BIGINT) AS n_kept,
       |  CAST(CASE WHEN has_lorem = 0 AND has_brace = 0 AND n_kept >= $minKeptLines
       |       THEN 1 ELSE 0 END AS BIGINT) AS keep_doc
       |FROM ag ORDER BY doc_id""".stripMargin
  }

  // — URL canonicalization + URL-level dedup ———————————————————————

  // authority part: scheme://host[:port] — extracted, lowercased,
  // de-www'd, default-port-stripped; the path/query remainder keeps
  // its case (paths ARE case-sensitive)
  private val authorityPattern = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  // remainder chain: fragment, tracking params (amp-led global, then
  // the question-led head with and without a successor), slash tidy.
  // No capture groups anywhere — backreference syntax differs between
  // java.util.regex ($1) and DuckDB/RE2 (\1), so the shared table
  // stays in the common dialect.
  private val trackingAlt = "(utm_[a-zA-Z0-9_]+|gclid|fbclid)"
  private val restSteps: Seq[Step] = Seq(
    Step("#.*$", "", regex = true),
    Step(s"&$trackingAlt=[^&#]*", "", regex = true),
    Step(s"\\?$trackingAlt=[^&#]*&", "?", regex = true),
    Step(s"\\?$trackingAlt=[^&#]*$$", "", regex = true),
    Step("/?", "?", regex = false),
    Step("/$", "", regex = true),
    Step("\\?$", "", regex = true))

  /** Canonical URL as one codegen projection. */
  def canonicalUrl(url: Column): Column = {
    val auth0 = lower(regexp_extract(url, authorityPattern, 0))
    val auth1 = regexp_replace(auth0, "^http://www\\.", "http://")
    val auth2 = regexp_replace(auth1, "^https://www\\.", "https://")
    val auth =
      when(auth2.startsWith("http://") && auth2.endsWith(":80"),
        auth2.substr(lit(1), length(auth2) - 3))
      .when(auth2.startsWith("https://") && auth2.endsWith(":443"),
        auth2.substr(lit(1), length(auth2) - 4))
      .otherwise(auth2)
    val rest = applySteps(regexp_replace(url, authorityPattern, ""), restSteps)
    concat(auth, rest)
  }

  /** The same canonicalization as a DuckDB SQL expression. */
  def canonicalUrlSql(url: String): String = {
    val auth0 = s"lower(regexp_extract($url, ${sqlLit(authorityPattern)}))"
    // rebuild the scheme prefix explicitly to stay backreference-free
    val authDeWww =
      s"""(CASE WHEN regexp_matches($auth0, ${sqlLit("^http://www\\.")})
         |  THEN 'http://' || substr($auth0, 12)
         |  WHEN regexp_matches($auth0, ${sqlLit("^https://www\\.")})
         |  THEN 'https://' || substr($auth0, 13)
         |  ELSE $auth0 END)""".stripMargin
    val auth =
      s"""(CASE WHEN starts_with($authDeWww, 'http://') AND $authDeWww LIKE '%:80'
         |  THEN left($authDeWww, length($authDeWww) - 3)
         |  WHEN starts_with($authDeWww, 'https://') AND $authDeWww LIKE '%:443'
         |  THEN left($authDeWww, length($authDeWww) - 4)
         |  ELSE $authDeWww END)""".stripMargin
    val rest = sqlSteps(s"regexp_replace($url, ${sqlLit(authorityPattern)}, '')", restSteps)
    s"($auth || $rest)"
  }

  /** Dedup by canonical URL, earliest doc_id wins — the [[Markup]]
    * paragraph-rank idiom one tier up. Scale shape: canonicalization
    * is a pure projection; the window partitions by CANONICAL URL
    * (duplicate-group-sized partitions, never by source or corpus),
    * so the shuffle moves one row per fetched page keyed on the
    * canonical string. */
  def urlDedupOf(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("canon_url")
    docs
      .withColumn("canon_url", canonicalUrl(col("url")))
      .withColumn("is_canonical",
        when(row_number().over(w.orderBy("doc_id")) === 1, 1L).otherwise(0L))
      .withColumn("n_dups", count(lit(1)).over(w).cast(LongType))
      .select("doc_id", "url", "canon_url", "is_canonical", "n_dups")
      .orderBy("doc_id")
  }

  /** Deterministic crawl-variant URL: case, `www.`, default port,
    * trailing slash, tracking params, and fragments all vary on
    * doc_id strides while the canonical form collapses to
    * (source, doc_id mod 40, doc_id mod 4). */
  private def plantUrl(docId: Column, source: Column): Column = concat(
    when(docId % 2 === 0, lit("HTTP")).otherwise(lit("http")),
    lit("://"),
    when(docId % 2 === 0, lit("WWW.News-")).otherwise(lit("www.news-")),
    source, lit(".COM"),
    when(docId % 3 === 0, lit(":80")).otherwise(lit("")),
    lit("/Articles/"), (docId % 40).cast(StringType),
    when(docId % 5 === 0, lit("/")).otherwise(lit("")),
    lit("?utm_source=feed&ref="), (docId % 4).cast(StringType),
    when(docId % 6 === 0, lit("&utm_campaign=spring")).otherwise(lit("")),
    when(docId % 4 === 0, lit("#comments")).otherwise(lit("")))

  private def plantUrlSql(docId: String, source: String): String = Seq(
    s"(CASE WHEN $docId % 2 = 0 THEN 'HTTP' ELSE 'http' END)",
    "'://'",
    s"(CASE WHEN $docId % 2 = 0 THEN 'WWW.News-' ELSE 'www.news-' END)",
    source, "'.COM'",
    s"(CASE WHEN $docId % 3 = 0 THEN ':80' ELSE '' END)",
    "'/Articles/'", s"CAST($docId % 40 AS VARCHAR)",
    s"(CASE WHEN $docId % 5 = 0 THEN '/' ELSE '' END)",
    "'?utm_source=feed&ref='", s"CAST($docId % 4 AS VARCHAR)",
    s"(CASE WHEN $docId % 6 = 0 THEN '&utm_campaign=spring' ELSE '' END)",
    s"(CASE WHEN $docId % 4 = 0 THEN '#comments' ELSE '' END)")
    .mkString("(", " || ", ")")

  /** Registered `d_url_dedup`. */
  def urlDedup(spark: SparkSession, dir: String): DataFrame =
    urlDedupOf(Tables.documents(spark, dir)
      .select(col("doc_id"), plantUrl(col("doc_id"), col("source")).as("url")))

  def urlDedupOracle: String = {
    val url = plantUrlSql("doc_id", "source")
    s"""WITH u AS (SELECT doc_id, $url AS url FROM documents),
       |c AS (SELECT doc_id, url, ${canonicalUrlSql("url")} AS canon_url FROM u),
       |r AS (SELECT doc_id, url, canon_url,
       |        ROW_NUMBER() OVER (PARTITION BY canon_url ORDER BY doc_id) AS rn,
       |        COUNT(*) OVER (PARTITION BY canon_url) AS n_dups
       |      FROM c)
       |SELECT doc_id, url, canon_url,
       |  CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_canonical,
       |  CAST(n_dups AS BIGINT) AS n_dups
       |FROM r ORDER BY doc_id""".stripMargin
  }

  // — Domain blocklist filtering ———————————————————————————————————

  /** Host part of a URL (no scheme, port, path). */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1)

  private def urlHostSql(url: String): String =
    s"regexp_extract($url, ${sqlLit("^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)")}, 1)"

  /** Domain blocklist filtering (RefinedWeb/FineWeb URL filtering):
    * a document is blocked when its host IS a listed domain or any
    * SUBDOMAIN of one ("x.ads.example.com" matches "ads.example.com").
    *
    * Spark-first shape: the host explodes into its dot-suffix chain
    * (≤ label-count rows, a map-side explode over a handful of
    * labels), which equi-joins the BROADCAST blocklist — never a
    * per-row `LIKE '%…'` scan over a blocklist of millions. The
    * doc-keyed re-aggregate emits the matched suffix (min, for
    * determinism when several levels match). */
  def domainFilterOf(docs: DataFrame, blocked: DataFrame): DataFrame = {
    val hosts = docs.select(col("doc_id"), lower(urlHost(col("url"))).as("host"))
    val labels = split(col("host"), "\\.")
    val suffixes = hosts
      .select(col("doc_id"), col("host"),
        explode(transform(sequence(lit(1), size(labels)), i =>
          concat_ws(".", slice(labels, i, size(labels) - i + 1)))).as("sfx"))
    val hits = suffixes
      .join(broadcast(blocked.select(lower(col("domain")).as("sfx"))), Seq("sfx"))
      .groupBy("doc_id").agg(min(col("sfx")).as("blocked_by"))
    hosts.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("host"),
        coalesce(col("blocked_by"), lit("")).as("blocked_by"),
        when(col("blocked_by").isNull, 1L).otherwise(0L).as("keep_doc"))
      .orderBy("doc_id")
  }

  /** Deterministic blocklist over the planted-URL hosts: two whole
    * sources plus one suffix that only matches at the domain level. */
  private val plantedBlocklist = Seq("news-src3.com", "news-src7.com", "invalid")

  /** Registered `t_domain_filter`: documents carry the same planted
    * crawl URLs as `d_url_dedup`; src3/src7 hosts are subdomain-level
    * matches of the blocked domains (host "www.news-src3.com" vs
    * blocked "news-src3.com"). */
  def domainFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    domainFilterOf(
      Tables.documents(spark, dir)
        .select(col("doc_id"), plantUrl(col("doc_id"), col("source")).as("url")),
      plantedBlocklist.toDF("domain"))
  }

  def domainFilterOracle: String = {
    val url = plantUrlSql("doc_id", "source")
    val blockedValues = plantedBlocklist.map(d => s"(${sqlLit(d)})").mkString(", ")
    s"""WITH u AS (SELECT doc_id, lower(${urlHostSql(url)}) AS host FROM documents),
       |bl(domain) AS (VALUES $blockedValues),
       |sx AS (SELECT doc_id, host,
       |         array_to_string(ls[i:], '.') AS sfx
       |       FROM (SELECT doc_id, host, string_split(host, '.') AS ls,
       |               unnest(generate_series(1, len(string_split(host, '.')))) AS i
       |             FROM u)),
       |h AS (SELECT doc_id, min(sfx) AS blocked_by
       |      FROM sx JOIN bl ON sx.sfx = lower(bl.domain) GROUP BY doc_id)
       |SELECT u.doc_id, u.host, COALESCE(h.blocked_by, '') AS blocked_by,
       |  CAST(CASE WHEN h.blocked_by IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep_doc
       |FROM u LEFT JOIN h ON u.doc_id = h.doc_id ORDER BY u.doc_id""".stripMargin
  }

  // — Frequent-line boilerplate removal ————————————————————————————

  /** Corpus-frequency line filter (CCNet §3.1 / Dolma): drop EVERY
    * occurrence of any line that appears in ≥ `maxDocs` distinct
    * documents — navigation menus, cookie banners, share bars. The
    * complement of paragraph dedup (row 96), which keeps one
    * canonical copy: boilerplate is junk in every copy.
    *
    * Scale shape: the frequency aggregate is md5-keyed (32-byte
    * uniform shuffle keys) and its `HAVING count ≥ K` OUTPUT — the
    * boilerplate set — is tiny relative to the corpus, so the removal
    * pass is a BROADCAST anti-join (plan-pinned): the corpus is
    * touched twice but shuffled only once, moving (key, doc) pairs,
    * never text. */
  def boilerplateRemoveOf(docs: DataFrame, maxDocs: Int = 10): DataFrame = {
    val lines = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\n")))
      .select(col("doc_id"), col("pos"), wsTrim(col("col")).as("lt"))
      .filter(length(col("lt")) > 0)
      .withColumn("k", md5(col("lt")))
    val frequent = lines.groupBy("k")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= maxDocs)
      .select("k")
    val kept = lines.join(broadcast(frequent), Seq("k"), "left_anti")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("lt")))).as("pp"),
        count(lit(1)).as("n_kept"))
      .select(col("doc_id"),
        concat_ws("\n", transform(col("pp"), x => x.getField("lt"))).as("clean_text"),
        col("n_kept"))
    lines.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines").cast(LongType).as("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L)))
          .cast(LongType).as("n_boiler"))
      .orderBy("doc_id")
  }

  /** Registered `t_boilerplate`: the corpus has no native line
    * structure, so both engines append the same cookie banner
    * (corpus-wide, 500 docs ≥ 10) and a per-(source, doc_id%2) share
    * bar (~12 docs each at sf0.01, straddling the threshold) while
    * every body line stays unique. */
  def boilerplateRemove(spark: SparkSession, dir: String): DataFrame =
    boilerplateRemoveOf(Tables.documents(spark, dir)
      .select(col("doc_id"), concat(
        lit("We use cookies to improve your experience\n"),
        col("text"),
        lit("\nShare this story from "), col("source"),
        lit(" lane "), (col("doc_id") % 2).cast(StringType)).as("text")))

  def boilerplateRemoveOracle: String = {
    val planted = sqlLit("We use cookies to improve your experience\n") +
      " || text || " + sqlLit("\nShare this story from ") +
      " || source || " + sqlLit(" lane ") + " || CAST(doc_id % 2 AS VARCHAR)"
    s"""WITH p0 AS (SELECT doc_id, $planted AS text FROM documents),
       |sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM p0),
       |le AS (SELECT doc_id, i, ${wsTrimSql("ls[i]")} AS lt
       |       FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i FROM sp)),
       |lf AS (SELECT doc_id, i, lt, md5(lt) AS k FROM le WHERE length(lt) > 0),
       |fr AS (SELECT k FROM (SELECT k, COUNT(DISTINCT doc_id) AS nd FROM lf GROUP BY k)
       |       WHERE nd >= 10),
       |kp AS (SELECT doc_id, string_agg(lt, chr(10) ORDER BY i) AS clean_text,
       |         count(*) AS n_kept
       |       FROM lf WHERE k NOT IN (SELECT k FROM fr) GROUP BY doc_id),
       |tot AS (SELECT doc_id, count(*) AS n_lines FROM lf GROUP BY doc_id)
       |SELECT t.doc_id, COALESCE(kp.clean_text, '') AS clean_text,
       |  CAST(t.n_lines AS BIGINT) AS n_lines,
       |  CAST(t.n_lines - COALESCE(kp.n_kept, 0) AS BIGINT) AS n_boiler
       |FROM tot t LEFT JOIN kp ON t.doc_id = kp.doc_id ORDER BY t.doc_id""".stripMargin
  }

  // — Curated crawl front door (for the end-to-end export) —————————

  /** Crawl-variant URL for the curated export: documents doc_id = 2k
    * and 2k+1 are the SAME story fetched twice under different
    * scheme-case / www-case / default-port / tracking-param /
    * fragment / trailing-slash noise — every varying piece
    * canonicalizes away, so each pair collapses to one canonical URL
    * and URL dedup keeps the even-id fetch. */
  def plantCrawlUrl(docId: Column): Column = concat(
    when(docId % 2 === 0, lit("HTTP")).otherwise(lit("http")),
    lit("://"),
    when(docId % 3 === 0, lit("WWW.Crawl.Example.COM:80"))
      .otherwise(lit("www.crawl.example.com")),
    lit("/story/"), shiftright(docId, 1).cast(StringType),
    when(docId % 5 === 0, lit("/")).otherwise(lit("")),
    lit("?utm_source=crawler"),
    when(docId % 6 === 0, lit("&utm_campaign=retarget")).otherwise(lit("")),
    when(docId % 4 === 0, lit("#latest")).otherwise(lit("")))

  private def plantCrawlUrlSql(docId: String): String = Seq(
    s"(CASE WHEN $docId % 2 = 0 THEN 'HTTP' ELSE 'http' END)",
    "'://'",
    s"(CASE WHEN $docId % 3 = 0 THEN 'WWW.Crawl.Example.COM:80' ELSE 'www.crawl.example.com' END)",
    "'/story/'", s"CAST($docId // 2 AS VARCHAR)",
    s"(CASE WHEN $docId % 5 = 0 THEN '/' ELSE '' END)",
    "'?utm_source=crawler'",
    s"(CASE WHEN $docId % 6 = 0 THEN '&utm_campaign=retarget' ELSE '' END)",
    s"(CASE WHEN $docId % 4 = 0 THEN '#latest' ELSE '' END)")
    .mkString("(", " || ", ")")

  /** The crawl-curation front door: URL-level dedup (earliest fetch
    * per canonical URL survives) then corpus-frequency boilerplate
    * removal. Input (doc_id, text, url, lang) → output
    * (doc_id, text, lang), ready for the export stages. The
    * boilerplate pass is what scrubs the shared footer the HTML shell
    * leaves in every extracted document — the exact shingle-poisoning
    * failure the web export fixture demonstrated. */
  def curateWebCrawl(crawled: DataFrame): DataFrame = {
    val canonical = crawled
      .withColumn("rn", row_number().over(
        Window.partitionBy(canonicalUrl(col("url"))).orderBy("doc_id")))
      .filter(col("rn") === 1)
      .select("doc_id", "text", "lang")
    canonical.select("doc_id", "lang")
      .join(boilerplateRemoveOf(canonical.select("doc_id", "text"))
        .select(col("doc_id"), col("clean_text")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("clean_text"), lit("")).as("text"),
        col("lang"))
  }

  /** The documents table as a crawled-deduped-descummed corpus, as a
    * DuckDB source subquery — [[Markup.webSourceSql]] plus the two
    * curation stages, generated from the same canonicalization /
    * line-filter logic as the Spark plan. */
  def curatedSourceSql: String = {
    val url = plantCrawlUrlSql("doc_id")
    val cleanText = Markup.webCleanSql(Markup.webWrapSql("doc_id", "text"))
    s"""(WITH web AS (SELECT doc_id, $cleanText AS text, lang, $url AS url FROM documents),
       |cu0 AS (SELECT doc_id, text, lang, ${canonicalUrlSql("url")} AS curl FROM web),
       |cu AS (SELECT doc_id, text, lang,
       |         ROW_NUMBER() OVER (PARTITION BY curl ORDER BY doc_id) AS rn FROM cu0),
       |kd AS (SELECT doc_id, text, lang FROM cu WHERE rn = 1),
       |csp AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM kd),
       |cle AS (SELECT doc_id, i, ${wsTrimSql("ls[i]")} AS lt
       |        FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i FROM csp)),
       |clf AS (SELECT doc_id, i, lt, md5(lt) AS k FROM cle WHERE length(lt) > 0),
       |cfr AS (SELECT k FROM (SELECT k, COUNT(DISTINCT doc_id) AS nd FROM clf GROUP BY k)
       |        WHERE nd >= 10),
       |ckp AS (SELECT doc_id, string_agg(lt, chr(10) ORDER BY i) AS clean_text
       |        FROM clf WHERE k NOT IN (SELECT k FROM cfr) GROUP BY doc_id)
       |SELECT kd.doc_id, COALESCE(ckp.clean_text, '') AS text, kd.lang
       |FROM kd LEFT JOIN ckp ON kd.doc_id = ckp.doc_id)""".stripMargin
  }

  // — CCNet perplexity bucketing ———————————————————————————————————

  /** Head/middle/tail thirds per language by LM-fluency order.
    * The fluency signal is [[TextOps.lmCoverageOf]]'s reference-
    * corpus trigram coverage (the integer stand-in for KenLM
    * perplexity — same ordering, cross-engine bit-exact); the
    * per-language NTILE runs over cov_ppm (integer parts-per-million,
    * `div` on both engines) with doc_id tiebreak, so bucket
    * boundaries can never drift on float formatting.
    *
    * Scale shape: coverage is one corpus-keyed aggregate; the NTILE
    * window partitions by language — bounded partition count, and
    * each partition carries only (doc_id, cov_ppm) pairs, not text.
    * CCNet itself shards this per (lang, snapshot); the same
    * composition applies here via a date column in the partition key. */
  def pplBucketsOf(docs: DataFrame, refDocs: DataFrame): DataFrame = {
    val cov = TextOps.lmCoverageOf(docs, refDocs)
      .select(col("doc_id"), col("n_trigrams"), col("n_covered"))
      .withColumn("cov_ppm",
        when(col("n_trigrams") === 0, 0L)
          .otherwise(expr("n_covered * 1000000 div n_trigrams")))
    val w = Window.partitionBy("lang").orderBy(col("cov_ppm").desc, col("doc_id"))
    docs.select(col("doc_id"), col("lang"))
      .join(cov, Seq("doc_id"))
      .withColumn("bucket_idx", ntile(3).over(w).cast(LongType))
      .withColumn("bucket",
        when(col("bucket_idx") === 1, "head")
          .when(col("bucket_idx") === 2, "middle").otherwise(lit("tail")))
      .select("doc_id", "lang", "cov_ppm", "bucket_idx", "bucket")
      .orderBy("doc_id")
  }

  /** Registered `t_ppl_buckets`: the even-doc_id half is the
    * reference corpus, matching `t_lm_score`'s convention. */
  def pplBuckets(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    pplBucketsOf(docs, docs.filter(col("doc_id") % 2 === 0))
  }

  def pplBucketsOracle: String =
    s"""WITH w AS (SELECT doc_id,
       |    regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$$', '', 'g'), '\\s+') AS ws,
       |    CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$$', '', 'g')) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$$', '', 'g'), '\\s+')) END AS n
       |  FROM documents),
       |tg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS tri
       |  FROM (SELECT doc_id, ws, unnest(generate_series(1, n - 2)) AS i
       |        FROM w WHERE n >= 3)),
       |ref AS (SELECT DISTINCT tri FROM tg WHERE doc_id % 2 = 0),
       |sc AS (SELECT t.doc_id, COUNT(*) AS n_trigrams, COUNT(r.tri) AS n_covered
       |  FROM tg t LEFT JOIN ref r ON t.tri = r.tri GROUP BY t.doc_id),
       |b AS (SELECT d.doc_id, d.lang,
       |    CASE WHEN COALESCE(sc.n_trigrams, 0) = 0 THEN 0
       |         ELSE (COALESCE(sc.n_covered, 0) * 1000000) // sc.n_trigrams END AS cov_ppm
       |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
       |nt AS (SELECT doc_id, lang, cov_ppm,
       |    NTILE(3) OVER (PARTITION BY lang ORDER BY cov_ppm DESC, doc_id) AS bi FROM b)
       |SELECT doc_id, lang, CAST(cov_ppm AS BIGINT) AS cov_ppm,
       |  CAST(bi AS BIGINT) AS bucket_idx,
       |  CASE bi WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
       |FROM nt ORDER BY doc_id""".stripMargin

  // — Temperature-based source mixing ——————————————————————————————

  /** Per-source sampling quotas ∝ n^α with α = 1/2: quota_s =
    * ⌊budget · w_s / Σw⌋ where w_s = ⌊√n_s · 10^6⌋ and budget =
    * ⌊total/2⌋ — all integer arithmetic except `sqrt`, which IEEE 754
    * correctly rounds to the SAME double in both engines, so the
    * floor is cross-engine exact.
    *
    * Selection is exact-k per source WITHOUT a source-sized window: a
    * map-side hash-threshold prefilter keeps documents whose 28-bit
    * md5 prefix falls under 4·quota/n of the hash space (zero-padded
    * hex strings compare numerically, so no hex→int conversion is
    * needed), then the rank window runs over the ~4·quota survivors —
    * budget-sized partitions, never source-sized. The 4× margin makes
    * a short-fall astronomically unlikely, and both engines apply the
    * identical filter, so the oracle is exact regardless.
    *
    * Scale shape at 100 TB: the stats aggregate is source-cardinality
    * output; the stats join is a broadcast; the prefilter is pure
    * codegen on a projected (doc_id, source) frame — the corpus text
    * never moves; the shuffle carries only prefilter survivors
    * (≈ 2·budget rows total across all sources). */
  def temperatureMixOf(docs: DataFrame, salt: String = "tmix"): DataFrame = {
    // the stats frame is source-cardinality-sized, so the single-
    // partition window over it is a bounded-row local sort, not a
    // corpus shuffle
    val wAll = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val stats = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt(col("n_docs").cast(DoubleType)) * 1000000.0).cast(LongType))
      .withColumn("total", sum("n_docs").over(wAll))
      .withColumn("wsum", sum("w").over(wAll))
      // a flattened quota can exceed a small source's size — cap at
      // availability (no upsampling here; epochs handle that tier)
      .withColumn("quota", expr("least(((total div 2) * w) div wsum, n_docs)"))
      .withColumn("thr",
        expr(s"least(${1L << 29}L, (4 * quota * ${1L << 28}L) div n_docs)"))
      .select("source", "n_docs", "quota", "thr")
    val keyed = docs.select(col("doc_id"), col("source"))
      .join(broadcast(stats), Seq("source"))
      .withColumn("k", md5(concat(col("doc_id").cast(StringType), lit(salt))))
      .filter(lpad(substring(col("k"), 1, 7), 8, "0") <
        format_string("%08x", col("thr")))
    keyed
      .withColumn("mix_rank",
        row_number().over(Window.partitionBy("source").orderBy("k", "doc_id"))
          .cast(LongType))
      .filter(col("mix_rank") <= col("quota"))
      .select(col("doc_id"), col("source"), col("mix_rank"),
        col("quota").cast(LongType).as("quota_docs"),
        col("n_docs").cast(LongType).as("n_source_docs"))
      .orderBy("source", "mix_rank")
  }

  /** Registered `t_temperature_mix`. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame =
    temperatureMixOf(Tables.documents(spark, dir))

  def temperatureMixOracle: String =
    s"""WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
       |s AS (SELECT source, n_docs,
       |        CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT) AS w
       |      FROM c),
       |t AS (SELECT source, n_docs, w,
       |        CAST(SUM(n_docs) OVER () AS BIGINT) AS total,
       |        CAST(SUM(w) OVER () AS BIGINT) AS wsum FROM s),
       |q AS (SELECT source, n_docs,
       |        least(((total // 2) * w) // wsum, n_docs) AS quota FROM t),
       |q2 AS (SELECT source, n_docs, quota,
       |        least(CAST(${1L << 29} AS BIGINT), (4 * quota * ${1L << 28}) // n_docs) AS thr
       |      FROM q),
       |d AS (SELECT doc_id, d.source, quota, n_docs, thr,
       |        md5(CAST(doc_id AS VARCHAR) || 'tmix') AS k
       |      FROM documents d JOIN q2 ON d.source = q2.source),
       |f AS (SELECT * FROM d
       |      WHERE lpad(substr(k, 1, 7), 8, '0') < printf('%08x', CAST(thr AS BIGINT))),
       |r AS (SELECT doc_id, source, quota, n_docs,
       |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY k, doc_id) AS rn FROM f)
       |SELECT doc_id, source, CAST(rn AS BIGINT) AS mix_rank,
       |  CAST(quota AS BIGINT) AS quota_docs, CAST(n_docs AS BIGINT) AS n_source_docs
       |FROM r WHERE rn <= quota ORDER BY source, mix_rank""".stripMargin
}
