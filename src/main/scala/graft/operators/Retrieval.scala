package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.sources.Tables

/** Lexical (term-based) retrieval over the corpus — the sparse
  * complement of the embedding-space ANN family: top-k documents per
  * query from an inverted index, the workhorse of training-data
  * curation tasks that start from a QUERY ("find documents about X to
  * upsample / audit / decontaminate against") rather than from a
  * vector.
  *
  * Plan shape at 100 TB: the corpus is tokenized ONCE into postings
  * (doc_id, term, tf) — one term-keyed shuffle, the same census
  * `t_top_terms` builds; document frequencies re-aggregate from the
  * postings (no second corpus scan). The query workload is small by
  * nature, so query terms join the df table BROADCAST, and the
  * weighted query-term table (queries × terms — tiny) broadcasts into
  * the postings join: the corpus shuffles once and never moves again;
  * per-query scoring is a keyed aggregation on the MATCHING postings
  * only. Top-k per query is a rank window that WindowGroupLimit
  * prunes before the final shuffle.
  */
object Retrieval {

  private def tokens(df: DataFrame, textCol: String): DataFrame =
    df.filter(length(TextOps.wsTrim(col(textCol))) > 0)

  /** Corpus postings: one row per (doc_id, term) with its term
    * frequency — the inverted index in relational form. */
  def postingsOf(docs: DataFrame): DataFrame =
    tokens(docs, "text")
      .select(col("doc_id"),
        explode(split(lower(TextOps.wsTrim(col("text"))), "\\s+")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Integer-exact retrieval: score(q, d) = Σ_{t ∈ q ∩ d} tf(t,d) ×
    * (N − df(t)). The rarity weight (N − df) preserves idf's ORDER
    * without the logarithm — all-integer arithmetic, so the ranking
    * is reproducible bit-exactly by any engine (the same tf-DESC /
    * df-ASC trade [[TextOps.topTermsOf]] makes). Query terms are
    * de-duplicated (a term counts once per query); ties break on
    * doc_id, so top-k is fully deterministic.
    *
    * `queries`: (query_id, qtext) — a query workload, small by
    * nature. Returns (query_id, rank, doc_id, score), rank 1-based,
    * at most `k` rows per query. */
  def searchOf(docs: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val tf = postingsOf(docs)
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = tokens(docs, "text").agg(count(lit(1)).as("n_docs"))
    val qt = queries
      .select(col("query_id"),
        explode(split(lower(TextOps.wsTrim(col("qtext"))), "\\s+")).as("term"))
      .distinct()
    // (query, term, weight): query-workload-sized — the corpus-sized
    // df table is probed with the BROADCAST query terms, then the
    // result broadcasts into the postings join
    val qterms = dfT.join(broadcast(qt), "term")
      .crossJoin(broadcast(n))
      .select(col("query_id"), col("term"), (col("n_docs") - col("df")).as("w"))
    val scored = tf.join(broadcast(qterms), "term")
      .groupBy("query_id", "doc_id")
      .agg(sum(col("tf") * col("w")).as("score"))
    val win = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(win).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
      .orderBy("query_id", "rank")
  }

  /** CONTRASTIVE TRIPLET MINING — the training-data product of the
    * retrieval stack: for each query a positive (its top-ranked
    * document), HARD negatives (documents ranked close behind — they
    * match terms yet lost the ranking, exactly the confusable cases a
    * reranker/embedding model learns most from), and one EASY negative
    * (a document sharing NO query term — the "uniform draw" of
    * contrastive recipes, made reproducible by taking the minimum
    * md5(text) among non-matching docs: hash order is the
    * deterministic stand-in for random). Built on the integer-exact
    * scorer ([[searchOf]]), so every triplet is bit-reproducible and
    * the whole mining run hash-matches an oracle — a float-scored
    * miner could never pin its negatives. Plan shape: the ranked list
    * is the searchOf plan; the easy draw anti-joins the corpus against
    * the match set per query (a 1×|workload| broadcast cross — the
    * packed-broadcast idiom — then one keyed aggregation). */
  def tripletMiningOf(docs: DataFrame, queries: DataFrame,
                      hardFrom: Int = 4, hardTo: Int = 8): DataFrame = {
    val ranked = searchOf(docs, queries, k = hardTo)
    val pos = ranked.filter(col("rank") === 1)
      .select(col("query_id"), col("doc_id").as("positive_id"))
    val hard = ranked.filter(col("rank") >= hardFrom && col("rank") <= hardTo)
      .select(col("query_id"), lit("hard").as("kind"),
        col("doc_id").as("negative_id"), col("rank").as("neg_rank"))
    val tf = postingsOf(docs)
    val qt = queries
      .select(col("query_id"),
        explode(split(lower(TextOps.wsTrim(col("qtext"))), "\\s+")).as("term"))
      .distinct()
    val matches = tf.join(broadcast(qt), "term")
      .select("query_id", "doc_id").distinct()
    // duplicate texts share an md5, so the draw orders by (hash, id)
    // — total, engine-reproducible
    val easy = tokens(docs, "text")
      .select(col("doc_id"), md5(col("text")).as("h"))
      .crossJoin(broadcast(queries.select("query_id")))
      .join(matches, Seq("query_id", "doc_id"), "left_anti")
      .groupBy("query_id")
      .agg(min(struct(col("h"), col("doc_id"))).as("m"))
      .select(col("query_id"), lit("easy").as("kind"),
        col("m.doc_id").as("negative_id"), lit(0L).as("neg_rank"))
    pos.join(hard.unionByName(easy), "query_id")
      .select("query_id", "kind", "positive_id", "negative_id", "neg_rank")
      .orderBy("query_id", "neg_rank", "negative_id")
  }

  /** Registered `s_triplets`: the three-query workload mined into
    * (positive, hard ranks 4-8, easy) triplets, hash-matched against
    * the searchOracle CTEs extended with the same anti-join draw. */
  def tripletMining(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tripletMiningOf(Tables.documents(spark, dir),
      queryWorkload.toDF("query_id", "qtext"))
  }

  def tripletOracle: String =
    s"""WITH c AS (SELECT doc_id, text FROM documents
       |  WHERE length(regexp_replace(text, '^\\s+|\\s+$$', '', 'g')) > 0),
       |t AS (SELECT doc_id,
       |    unnest(regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$$', '', 'g'), '\\s+')) AS term
       |  FROM c),
       |tc AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
       |dc AS (SELECT term, COUNT(*) AS df FROM tc GROUP BY term),
       |n AS (SELECT COUNT(*) AS n_docs FROM c),
       |q AS (SELECT DISTINCT query_id, term FROM (
       |    SELECT query_id, unnest(regexp_split_to_array(lower(qtext), '\\s+')) AS term
       |    FROM (VALUES ${workloadValuesSql}) AS v(query_id, qtext))),
       |s AS (SELECT q.query_id, tc.doc_id,
       |    SUM(tc.tf * (n.n_docs - dc.df)) AS score
       |  FROM q JOIN tc USING (term) JOIN dc USING (term) CROSS JOIN n
       |  GROUP BY 1, 2),
       |r AS (SELECT query_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank FROM s),
       |pos AS (SELECT query_id, doc_id AS positive_id FROM r WHERE rank = 1),
       |hard AS (SELECT query_id, 'hard' AS kind, doc_id AS negative_id,
       |         rank AS neg_rank FROM r WHERE rank BETWEEN 4 AND 8),
       |m AS (SELECT DISTINCT query_id, doc_id FROM q JOIN tc USING (term)),
       |nm AS (SELECT qq.query_id, d.doc_id, md5(d.text) AS h
       |       FROM c d CROSS JOIN (SELECT DISTINCT query_id FROM q) qq
       |       ANTI JOIN m ON m.query_id = qq.query_id AND m.doc_id = d.doc_id),
       |easy AS (SELECT query_id, 'easy' AS kind, doc_id AS negative_id,
       |         CAST(0 AS BIGINT) AS neg_rank
       |         FROM (SELECT query_id, doc_id,
       |                 row_number() OVER (PARTITION BY query_id ORDER BY h, doc_id) AS rn
       |               FROM nm) WHERE rn = 1)
       |SELECT CAST(p.query_id AS BIGINT) AS query_id, x.kind, p.positive_id,
       |  x.negative_id, x.neg_rank
       |FROM pos p JOIN (SELECT * FROM hard UNION ALL SELECT * FROM easy) x
       |  ON x.query_id = p.query_id
       |ORDER BY query_id, neg_rank, negative_id""".stripMargin

  /** Okapi BM25 (k1 = 1.2, b = 0.75) — the production lexical scorer:
    * saturating tf, length normalization against the corpus mean, and
    * the (transcendental) log idf, which is why this variant is
    * rows-only — ln is not bit-reproducible across engines, while the
    * integer sibling [[searchOf]] carries the oracle. Same plan
    * shape: one corpus tokenization, document lengths re-aggregated
    * from the postings, broadcast query-term weights, keyed scoring
    * aggregation, WindowGroupLimit top-k. */
  def searchBm25Of(docs: DataFrame, queries: DataFrame, k: Int = 10,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = postingsOf(docs)
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val qt = queries
      .select(col("query_id"),
        explode(split(lower(TextOps.wsTrim(col("qtext"))), "\\s+")).as("term"))
      .distinct()
    val qterms = dfT.join(broadcast(qt), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("term"), col("avgdl"),
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
          .as("idf"))
    val scored = tf
      .join(dl, "doc_id")
      .join(broadcast(qterms), "term")
      .withColumn("contrib",
        col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("score"))
    val win = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(win).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
      .orderBy("query_id", "rank")
  }

  // — registered bindings ————————————————————————————————————————————

  private[graft] val queryWorkload = Seq(
    (1L, "hash join order"),
    (2L, "window merge scan"),
    (3L, "stream batch spark"))

  /** Registered `s_search`: the integer-exact scorer over the corpus
    * vocabulary with a three-query workload; hash-matched against the
    * same inverted index built in SQL. */
  def search(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    searchOf(Tables.documents(spark, dir),
      queryWorkload.toDF("query_id", "qtext"), k = 10)
  }

  /** Registered `s_search_bm25`: the BM25 scorer on the same
    * workload, hash-matched against a DuckDB twin. The ln idf can
    * differ from libm by a final double ulp (measured: ≤1 ulp on
    * this corpus), so the registered score is the FLOAT cast — the
    * double-cast discipline: 29 discarded mantissa bits swallow the
    * ulp while keeping a meaningful score surface; ranks were already
    * ulp-proof (adjacent scores far apart, ties broken on doc_id). */
  def searchBm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    searchBm25Of(Tables.documents(spark, dir),
      queryWorkload.toDF("query_id", "qtext"), k = 10)
      .withColumn("score", col("score").cast("float"))
  }

  /** Generated VALUES clause so the Spark workload and the oracle's
    * can never drift. */
  private[graft] def workloadValuesSql: String =
    queryWorkload.map { case (id, q) => s"($id, '$q')" }.mkString(", ")

  def searchOracle: String =
    s"""WITH c AS (SELECT doc_id, text FROM documents
       |  WHERE length(regexp_replace(text, '^\\s+|\\s+$$', '', 'g')) > 0),
       |t AS (SELECT doc_id,
       |    unnest(regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$$', '', 'g'), '\\s+')) AS term
       |  FROM c),
       |tc AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
       |dc AS (SELECT term, COUNT(*) AS df FROM tc GROUP BY term),
       |n AS (SELECT COUNT(*) AS n_docs FROM c),
       |q AS (SELECT DISTINCT query_id, term FROM (
       |    SELECT query_id, unnest(regexp_split_to_array(lower(qtext), '\\s+')) AS term
       |    FROM (VALUES ${workloadValuesSql}) AS v(query_id, qtext))),
       |s AS (SELECT q.query_id, tc.doc_id,
       |    SUM(tc.tf * (n.n_docs - dc.df)) AS score
       |  FROM q JOIN tc USING (term) JOIN dc USING (term) CROSS JOIN n
       |  GROUP BY 1, 2),
       |r AS (SELECT query_id, doc_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank FROM s)
       |SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id,
       |  CAST(score AS BIGINT) AS score
       |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** BM25 twin of [[searchOracle]] — same postings CTEs, the Okapi
    * formula verbatim, and the float-cast score surface that absorbs
    * the cross-libm ln ulp (see [[searchBm25]]). */
  def searchBm25Oracle: String =
    s"""WITH c AS (SELECT doc_id, text FROM documents
       |  WHERE length(regexp_replace(text, '^\\s+|\\s+$$', '', 'g')) > 0),
       |t AS (SELECT doc_id,
       |    unnest(regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$$', '', 'g'), '\\s+')) AS term
       |  FROM c),
       |tc AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
       |dc AS (SELECT term, COUNT(*) AS df FROM tc GROUP BY term),
       |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tc GROUP BY 1),
       |st AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
       |q AS (SELECT DISTINCT query_id, term FROM (
       |    SELECT query_id, unnest(regexp_split_to_array(lower(qtext), '\\s+')) AS term
       |    FROM (VALUES ${workloadValuesSql}) AS v(query_id, qtext))),
       |qt AS (SELECT q.query_id, q.term, st.avgdl,
       |    ln((st.n_docs - dc.df + 0.5) / (dc.df + 0.5) + 1.0) AS idf
       |  FROM q JOIN dc USING (term) CROSS JOIN st),
       |s AS (SELECT qt.query_id, tc.doc_id,
       |    SUM(qt.idf * (tc.tf * (1.2 + 1.0)) /
       |        (tc.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / qt.avgdl))) AS score
       |  FROM tc JOIN dl USING (doc_id) JOIN qt USING (term)
       |  GROUP BY 1, 2),
       |r AS (SELECT query_id, doc_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank FROM s)
       |SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id,
       |  CAST(score AS REAL) AS score
       |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
}
