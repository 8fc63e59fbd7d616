package graft.plans

import java.util.Locale

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.Project

/** Registry of incrementally-maintained aggregates available for
  * automatic query rewrite ([[MatViewRewrite]]) — the engine's analog
  * of Calcite/Databricks materialized-view substitution. A view here
  * is any parquet directory holding the grouped aggregate of a graft
  * store's LIVE state — typically [[graft.streaming.FeedView]]'s
  * feed-maintained fold or [[graft.operators.SnapshotDiff]]'s batch
  * refresh — registered together with the SOURCE COMMIT VERSION it
  * reflects. The rewrite only ever fires when the reading query's
  * bound version equals that registered version: a stale view (source
  * published past it) silently stops matching rather than serving
  * stale numbers, and a time-travel/branch/tag read never matches at
  * all. Refuse-don't-guess, applied to plan substitution.
  *
  * Matching is NAME-normalized structural equality: expressions are
  * compared with attribute references reduced to their lower-cased
  * column name ([[MatViews.normalize]]), so the registration's
  * `trunc(col("d"), "month")` matches a query's `trunc(d, 'month')`
  * regardless of resolution-time expression ids. Best-effort by
  * design (the property every MV-rewrite engine shares): an
  * expression written differently simply reads the base table — the
  * rewrite is an optimization, never a correctness dependency. */
object MatViews {

  /** One registered view: the maintained aggregate of `basePath`'s
    * live state as of `asOfVersion`, stored at `viewPath`, with
    * grain `groups` (view column → normalized base expression),
    * `countCol` holding per-group live-row counts, and `sums` (view
    * column → normalized base sum operand). */
  final case class MatViewDef(
      basePath: String,
      viewPath: String,
      asOfVersion: Long,
      groups: Seq[(String, Expression)],
      countCol: Option[String],
      sums: Seq[(String, Expression)])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MatViewDef]()

  private[plans] def canonPath(p: String): String =
    p.replaceAll("/+$", "")

  /** Attribute references reduced to lower-cased-name placeholders so
    * two resolutions of the same column compare equal, then Catalyst
    * canonicalization for literal/commutation normal forms. */
  private[plans] def normalize(e: Expression): Expression =
    e.transform {
      case a: AttributeReference =>
        AttributeReference(a.name.toLowerCase(Locale.ROOT), a.dataType,
          nullable = true)(exprId = ExprId(0), qualifier = Nil)
    }.canonicalized

  /** Resolve a registration expression against the base table's
    * schema (analysis only — no scan is built). */
  private def resolved(spark: SparkSession, basePath: String, c: Column): Expression =
    spark.read.format("graft-table").load(basePath)
      .select(c.as("__mv")).queryExecution.analyzed match {
      case Project(Seq(Alias(e, _)), _) => e
      case other => throw new IllegalArgumentException(
        s"mat-view registration expression did not analyze to a single column: $other")
    }

  /** Register `viewPath` as the maintained aggregate of `basePath`'s
    * state at `asOfVersion`. `groups` maps each view grain column to
    * the base expression it was grouped by; `countCol` names the view
    * column holding `count(*)` per group (if maintained); `sums` maps
    * view columns to the base expressions they sum. Re-registering a
    * base path replaces the previous definition (newest wins). */
  def register(spark: SparkSession, basePath: String, viewPath: String,
               asOfVersion: Long, groups: Seq[(String, Column)],
               countCol: Option[String] = None,
               sums: Seq[(String, Column)] = Nil): Unit = {
    require(groups.nonEmpty || countCol.isDefined || sums.nonEmpty,
      "a mat-view registration needs at least one grain column or aggregate")
    val d = MatViewDef(
      canonPath(basePath), viewPath, asOfVersion,
      groups.map { case (vc, c) =>
        vc.toLowerCase(Locale.ROOT) -> normalize(resolved(spark, basePath, c)) },
      countCol.map(_.toLowerCase(Locale.ROOT)),
      sums.map { case (vc, c) =>
        vc.toLowerCase(Locale.ROOT) -> normalize(resolved(spark, basePath, c)) })
    registry.put(d.basePath, d)
  }

  /** Re-point an existing registration at a newer maintained state —
    * what a continuously-running view maintainer calls after each
    * fold, so the rewrite stays LIVE as the source commits (between a
    * source commit and its fold the version check makes the view
    * stale and queries read the base; the advance re-arms it).
    * Returns false when no registration exists for the base. */
  def advance(basePath: String, viewPath: String, asOfVersion: Long): Boolean = {
    val key = canonPath(basePath)
    Option(registry.get(key)) match {
      case Some(d) =>
        registry.put(key, d.copy(viewPath = viewPath, asOfVersion = asOfVersion))
        true
      case None => false
    }
  }

  def unregister(basePath: String): Unit = registry.remove(canonPath(basePath))

  def clear(): Unit = registry.clear()

  private[plans] def isEmpty: Boolean = registry.isEmpty

  private[plans] def lookup(basePath: String): Option[MatViewDef] =
    Option(registry.get(canonPath(basePath)))
}
