package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** End-to-end training-corpus export: the one-call composition of the
  * LLM-pipeline operators, producing the manifest a trainer consumes.
  *
  * Stages (each individually registered and oracle/spec-checked):
  *   1. quality filter + near-dup canonicalization ([[NearDedup.cleanCorpus]])
  *   2. benchmark decontamination — contaminated docs DROPPED
  *      ([[NearDedup.decontaminateOf]], broadcast benchmark shingles)
  *   3. stratified per-language downsampling ([[TextOps.stratifiedSampleOf]])
  *   4. leakage-safe content-hash train/val/test split ([[TextOps.splitAssignOf]])
  *   5. per-shard sequence packing ([[TextOps.packSequencesOf]])
  *
  * Scale shape: every stage is the already-audited plan; the
  * composition adds only doc_id semi-joins between stages (uniform
  * key, AQE-sized). Nothing is collected on the driver.
  */
object CorpusExport {

  def exportCorpusOf(docs: DataFrame, benchmark: DataFrame,
                     rates: Map[String, Int]): DataFrame = {
    // the cleaned corpus feeds three downstream subplans (shingling,
    // the doc_id semi-joins, packing); materialize it ONCE instead of
    // re-running the iterative cluster resolution per reference — the
    // local analog of persisting the stage boundary on a cluster
    val clean = NearDedup.cleanCorpus(docs).localCheckpoint()
    val uncontaminated = NearDedup.decontaminateOf(clean, benchmark)
      .filter(col("is_contaminated") === 0)
      .select("doc_id")
    val surviving = clean.join(uncontaminated, "doc_id")
    val sampled = TextOps.stratifiedSampleOf(surviving, rates).select("doc_id")
    val kept = surviving.join(sampled, "doc_id")
    val split = TextOps.splitAssignOf(kept).select("doc_id", "split")
    TextOps.packSequencesOf(kept)
      .join(split, "doc_id")
      .orderBy("doc_id")
  }

  /** Registered binding: every 20th document plays the benchmark set
    * (as in d_decontaminate); the rest flow through the full export. */
  def exportCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    exportCorpusOf(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0),
      TextOps.sampleRates)
  }
}
