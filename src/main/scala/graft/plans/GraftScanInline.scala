package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, KnownNotNull, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Optimizer rule: INLINE a catalog chain-head read's merged plan
  * into the consuming query, eliding the V1 bridge entirely.
  *
  * A chain head's state exists only merged, and the DSv2 fallback that
  * serves it ([[graft.sources.MergedScanBuilder]]) is a
  * [[org.apache.spark.sql.connector.read.V1Scan]] whose relation
  * executes the merged plan as an opaque RDD. That bridge is correct
  * but costs three things at scale: the seam drops vectorized /
  * whole-stage-codegen output where the RDD surfaces, the outer
  * planner cannot price the scan (Spark wraps V1 scans in
  * `V1ScanWrapper`, which forwards no statistics — a small dimension
  * head is costed at `defaultSizeInBytes` and never auto-broadcasts),
  * and the inner plan optimizes in isolation from the consumer.
  *
  * This rule — running in the operator-optimization batch, BEFORE
  * scan pushdown — replaces the relation with the chain-merged
  * logical plan itself, output-aliased onto the relation's attribute
  * ids so every parent binds unchanged. The whole tree then optimizes
  * as ONE query: the consumer's filters and column pruning sink
  * through the delta-union and anti-join into the base parquet scan
  * by Catalyst's own rules, sizes flow from parquet file statistics
  * (the anti-join prices at its streamed side, the union as the sum —
  * bytes the planner trusts for broadcast decisions), and codegen
  * spans from the base scan up into the consumer. The V1 bridge stays
  * as the fallback for sessions that load the connector without
  * [[graft.GraftExtensions]].
  *
  * PER-RUN PLAN CACHE: a query touching the same (store path, bound
  * version) N times — self-joins, unions of the same head — pays ONE
  * chain resolution + nested optimization per run of this rule; the
  * second and later occurrences splice a [[freshIds]] copy of the
  * cached subtree (new expression ids throughout, so the self-join
  * pins still bind unambiguously). Version dirs are immutable, which
  * is what makes sharing the resolved plan sound; the cache dies with
  * the rule invocation, so nothing survives a store mutation.
  *
  * Safety: [[graft.sources.GraftTable.inlineKey]] is defined exactly
  * for catalog-mode chain heads (plain heads already delegate to
  * vectorized parquet scans); row-level-operation reads carry a
  * `RowLevelOperationTable`, write commands hold their target outside
  * the child list, and streaming relations are a different node — all
  * pass through untouched. The splice requires every relation output
  * attribute to match the merged plan by name and dataType, and makes
  * nullability EXPLICIT rather than inferred: a column the relation
  * schema narrowed to non-null (the merge key — a primary key by
  * construction) is spliced through KnownNotNull, so the declared
  * contract survives the inline instead of a conservatively-nullable
  * inner attribute silently contradicting it. The inlined subtree
  * contains no graft relation (chains resolve to parquet scans),
  * making the rule self-terminating under the optimizer's fixed
  * point. */
object GraftScanInline extends Rule[LogicalPlan] {

  /** Inner chain optimizations performed — test-visible so PlanSpec
    * can pin "a self-join pays ONE nested optimization". */
  private[graft] val innerOptimizations = new java.util.concurrent.atomic.AtomicLong

  /** A structurally identical copy with every expression id minted
    * fresh (consistently: each old id maps to one new id), so a
    * cached subtree can appear twice in one plan without ambiguous
    * attributes. Chain-merged plans are projections/filters/joins/
    * unions over parquet relations — the named things are attribute
    * references, aliases, and aggregate result ids, all covered by
    * transformAllExpressions (leaf relation outputs are constructor
    * args, which QueryPlan's expression transform reaches). */
  private def freshIds(plan: LogicalPlan): LogicalPlan = {
    val mapping = new java.util.HashMap[ExprId, ExprId]()
    def nid(id: ExprId): ExprId =
      mapping.computeIfAbsent(id, _ => NamedExpression.newExprId)
    plan.transformAllExpressions {
      case a: AttributeReference => a.withExprId(nid(a.exprId))
      case al: Alias =>
        Alias(al.child, al.name)(exprId = nid(al.exprId),
          qualifier = al.qualifier, explicitMetadata = al.explicitMetadata,
          nonInheritableMetadataKeys = al.nonInheritableMetadataKeys)
      case ae: AggregateExpression => ae.copy(resultId = nid(ae.resultId))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // ALTER TABLE … ADD CONSTRAINT: the command's child is the
    // existing-data validation scan, and DataSourceV2Strategy pattern-
    // matches it as a RAW DataSourceV2ScanRelation to recover the
    // catalog/table — inlining it would leave the command plan-less.
    // The validation is a one-off DDL scan; it keeps the V1 bridge.
    if (plan.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint])
      return plan
    // (path, version) → optimized merged subtree, scoped to THIS run
    val cache = scala.collection.mutable.Map.empty[String, LogicalPlan]
    var spliced = Set.empty[String] // keys already used verbatim once
    plan.transformUp {
      case r: DataSourceV2Relation =>
        r.table match {
          case t: graft.sources.GraftTable if t.inlineKey.isDefined =>
            val key = t.inlineKey.get
            val cached = cache.get(key)
            val inner = cached.getOrElse {
              // the OPTIMIZED inner plan: analysis output still carries
              // ResolvedHint nodes (the merged read broadcasts its
              // delete-key sides) whose elimination batch already ran —
              // splicing them back in would crash the planner. The
              // optimized subtree is hint-free and still participates
              // in the outer fixed point (filters push into it).
              innerOptimizations.incrementAndGet()
              val p = t.inlineReadPlan.get.queryExecution.optimizedPlan
              cache.put(key, p)
              p
            }
            val copy = if (spliced.contains(key)) freshIds(inner) else inner
            val byName = copy.output.map(a => a.name -> a).toMap
            if (r.output.forall(o =>
                byName.get(o.name).exists(_.dataType == o.dataType))) {
              spliced += key
              // nullability is carried EXPLICITLY from the relation's
              // declared schema: where the table narrowed a column to
              // non-null (the merge key — a primary key by
              // construction, see GraftTable.schema) but the merged
              // plan is conservatively nullable, KnownNotNull restates
              // the table's own contract on the spliced output, so
              // parents optimized under the declared non-nullness
              // never see a silently-nullable splice
              Project(r.output.map { o =>
                val i = byName(o.name)
                val child: org.apache.spark.sql.catalyst.expressions.Expression =
                  if (!o.nullable && i.nullable) KnownNotNull(i) else i
                Alias(child, o.name)(exprId = o.exprId)
              }, copy)
            } else r // shape drift keeps the V1 bridge
          case _ => r
        }
      }
  }
}
