package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.QualityGate

/** WRITE-AUDIT-PUBLISH — the canonical lakehouse ingestion workflow
  * (Iceberg's WAP / Netflix's audit pattern), composed from this
  * store's own primitives: stage the feed as a BRANCH commit (write),
  * run the expectation set against what actually landed on disk
  * (audit — the committed bytes, not the in-memory frame that may
  * differ after a lossy cast or a non-deterministic source), and only
  * on all-green make it live (publish — a marker-only FAST-FORWARD
  * when main held still, the usual case for a single ingest pipeline;
  * a three-way merge with loud conflicts when it didn't).
  *
  * The reference runs exactly this shape by hand: upload staged rows,
  * verify row counts, then flip the live pointer
  * (`land_registry_monthly_update_database_upload.py` +
  * `..._database_verify.py`). Here the staging area is a real ref —
  * isolated from every main reader by construction — and the flip is
  * the store's transactional commit.
  *
  * Failure anatomy: a red audit throws [[QualityGate.ExpectationsFailed]]
  * and LEAVES the branch at the bad commit — the debugging artifact an
  * operator wants (query the staged state, diff it against main). A
  * retry stages the corrected FULL frame onto the same ref (snapshot
  * publishes supersede; the bad commit becomes unreachable history)
  * and publishes clean. After a green publish the ref is dropped by
  * default — the merged head is `_manifests`-adopted, so the drop GCs
  * only the superseded bad attempts, never live history.
  *
  * At 100 TB: write = the ordinary snapshot write path (no second
  * copy), audit = one validation pass over the staged version, publish
  * = one conditional marker create. The bad-feed case costs the staged
  * write only — main never sees a byte of it. */
object Wap {

  /** Run one write-audit-publish cycle; returns the new live main
    * version on green. `key`/`compareCols` are only exercised when
    * main moved mid-cycle (three-way merge); the fast-forward path
    * never touches them. */
  def writeAuditPublish(df: DataFrame, dateCol: String, tablePath: String,
                        checks: Seq[QualityGate.Check],
                        key: String, compareCols: Seq[String],
                        branch: String = "wap_audit",
                        retainVersions: Int = 2,
                        dropBranchOnPublish: Boolean = true): Long = {
    val spark = df.sparkSession
    val exists = try { Branches.branchBase(spark, tablePath, branch); true }
      catch { case _: java.io.FileNotFoundException => false }
    if (!exists) Branches.createBranch(spark, tablePath, branch)
    Branches.publishToBranch(df, dateCol, tablePath, branch)
    // audit what LANDED (txn_month is the writer's own layout column)
    val staged = Branches.readBranch(spark, tablePath, branch).drop("txn_month")
    val red = QualityGate.validate(staged, checks).filter(!col("pass"))
      .select("check_name", "violations").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    if (red.nonEmpty) throw new QualityGate.ExpectationsFailed(red)
    val v = Branches.mergeBranch(spark, tablePath, branch, key, compareCols,
      dateCol, retainVersions = retainVersions)
    if (dropBranchOnPublish) Branches.deleteBranch(spark, tablePath, branch)
    v
  }

  /** The INCREMENTAL cycle — the 100 TB shape: where
    * [[writeAuditPublish]] stages a full frame, this stages only the
    * batch ([[DeletionVectors.publishUpsertToBranch]] — one MoR chain
    * link, O(changes) bytes), audits the branch's MERGED state, and
    * publishes. With main unmoved the publish is the chain-adopting
    * fast-forward: marker creates only, the staged link dirs BECOME
    * main history — a full audit-gated ingest cycle that never
    * rewrites the base. A red audit leaves the staged link on the ref;
    * retry with the corrected batch chains over it (the superseding
    * link wins on its keys) or drop the ref and restage. */
  def writeAuditPublishDelta(spark: SparkSession, tablePath: String,
                             changes: DataFrame, deleteKeys: DataFrame,
                             checks: Seq[QualityGate.Check],
                             key: String, compareCols: Seq[String],
                             dateCol: String,
                             branch: String = "wap_audit",
                             retainVersions: Int = 2,
                             dropBranchOnPublish: Boolean = true): Long = {
    val exists = try { Branches.branchBase(spark, tablePath, branch); true }
      catch { case _: java.io.FileNotFoundException => false }
    if (!exists) Branches.createBranch(spark, tablePath, branch)
    DeletionVectors.publishUpsertToBranch(spark, tablePath, branch,
      changes, key, deleteKeys)
    val staged = Branches.readBranch(spark, tablePath, branch).drop("txn_month")
    val red = QualityGate.validate(staged, checks).filter(!col("pass"))
      .select("check_name", "violations").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    if (red.nonEmpty) throw new QualityGate.ExpectationsFailed(red)
    val v = Branches.mergeBranch(spark, tablePath, branch, key, compareCols,
      dateCol, retainVersions = retainVersions)
    if (dropBranchOnPublish) Branches.deleteBranch(spark, tablePath, branch)
    v
  }

  /** Registered `q_wap` (hash-oracled): both WAP outcomes against one
    * closed-form `orders` oracle. The fixture publishes a base, then
    * (1) stages a BAD feed — key class 4's prices negated — whose
    * audit fails on `non_negative:price` with exactly the class-4
    * count, proving main never saw it (post-fail census unchanged);
    * then (2) stages the corrected feed (class 7's status flipped)
    * which audits green and publishes as a marker-only fast-forward.
    * Ledger rows: the red check with its violation count, the
    * fail-path isolation census, and the final census (rows + 60-bit
    * key|status XOR) — every cell modular arithmetic over `orders`. */
  def wapResult(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixture = fixtures.computeIfAbsent(dir, _ => {
      val t = graft.util.Scratch.dir("wap_fx") + "/t"
      val base = Tables.orders(spark, dir).select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_orderdate").cast("date").as("odate"),
        col("o_orderstatus").cast("string").as("status"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      Sinks.publishSnapshot(base, "odate", t, retainVersions = 6)
      val checks = Seq(
        QualityGate.nonNegative("price"),
        QualityGate.notNull("status"),
        QualityGate.unique("o_orderkey"))
      val cmp = Seq("odate", "status", "price")
      val bad = base.withColumn("price",
        when(col("o_orderkey") % 10 === 4, -col("price")).otherwise(col("price")))
      val redLedger =
        try {
          writeAuditPublish(bad, "odate", t, checks, "o_orderkey", cmp)
          Seq.empty[(String, Long)]
        } catch {
          case e: QualityGate.ExpectationsFailed =>
            e.report.map { case (n, v) => s"fail:$n" -> v }
        }
      def census(phase: String): DataFrame =
        Sinks.readSnapshot(spark, t)
          .select(graft.operators.Reconcile.xorHash60(
            concat_ws("|", col("o_orderkey").cast("string"), col("status"))).as("h"))
          .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"))
          .select(lit(phase).as("entry"), col("n"),
            col("x").as("detail"))
      // main never saw the bad feed: census BEFORE the good publish
      val isolated = census("isolated_after_fail")
      val good = base.withColumn("status",
        when(col("o_orderkey") % 10 === 7, lit("W")).otherwise(col("status")))
      writeAuditPublish(good, "odate", t, checks, "o_orderkey", cmp)
      val ledger = redLedger.toDF("entry", "n")
        .withColumn("detail", lit(0L))
        .unionByName(isolated)
        .unionByName(census("final"))
      val f = graft.util.Scratch.dir("wap_fx_out")
      ledger.coalesce(1).write.parquet(s"$f/ledger")
      f
    })
    spark.read.parquet(s"$fixture/ledger").orderBy("entry")
  }

  private val fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
}
