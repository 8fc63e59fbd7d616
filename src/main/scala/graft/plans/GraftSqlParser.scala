package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** SQL front door for the engine's own DDL — the Delta `DeltaSqlParser`
  * idiom: a delegating [[ParserInterface]] that recognizes the two
  * statements Spark's grammar has no spelling for and hands everything
  * else to the session's parser untouched. Registered by
  * [[graft.GraftExtensions]] via `injectParser`.
  *
  *   CREATE MATERIALIZED VIEW '<view_path>' AS
  *     SELECT <grain exprs>, COUNT(*) AS n, COUNT(x) AS cx, SUM(x) AS sx
  *     FROM graft.`/store` GROUP BY …
  *
  * computes the aggregate AT the store's live version, writes it to
  * `view_path` as parquet, and registers it for automatic query
  * rewrite ([[MatViews.register]] — persisted under the store's
  * `_views` metadata, so the registration arms every session). The
  * SELECT must be a plain grouped aggregate directly over an unpinned
  * graft catalog read, with every output aliased: grain columns bind
  * as grain, `COUNT(*)`/`COUNT(1)` as the live-row count, `COUNT(x)`
  * as x's non-null count, `SUM(x)` as x's sum, `MIN(x)`/`MAX(x)` as
  * x's extremes — the exact shapes [[MatViewRewrite]] can derive
  * answers from. Anything else refuses
  * with the reason (a mat-view whose shape the rewrite cannot use is
  * a bug held for later, not a feature).
  *
  *   DROP MATERIALIZED VIEW FOR '<store_path>'
  *
  * unregisters the store's view (the parquet stays — it is data; the
  * registration is what arms the planner). Constraint DDL needs no
  * spelling here: `ALTER TABLE graft.`…` ADD/DROP CONSTRAINT` is
  * native Spark 4 grammar, routed through
  * [[graft.sources.GraftCatalog.alterTable]]. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val createRe =
    """(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?MATERIALIZED\s+VIEW\s+'([^']+)'(?:\s+NAMED\s+([A-Za-z0-9_]+))?\s+AS\s+(.+)$""".r
  private val dropRe =
    """(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+FOR\s+'([^']+)'(?:\s+NAMED\s+([A-Za-z0-9_]+))?\s*;?\s*$""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case createRe(orReplace, viewPath, name, query) =>
      CreateMatViewCommand(viewPath.trim,
        Option(name).getOrElse(MatViews.defaultName), query.trim,
        orReplace = orReplace != null)
    case dropRe(basePath, name) =>
      DropMatViewCommand(basePath.trim, Option(name))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

/** `CREATE [OR REPLACE] MATERIALIZED VIEW '<path>' [NAMED n] AS
  * <grouped aggregate>` — compute at the live version, persist,
  * register for rewrite under `n` (several named views may arm one
  * table at different grains). Bare CREATE refuses when the name is
  * already registered for the base (standard DDL semantics — silent
  * redefinition is how two maintainers end up fighting over one
  * slot); OR REPLACE recomputes and re-points it. */
case class CreateMatViewCommand(viewPath: String, name: String, query: String,
                                orReplace: Boolean)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("base", StringType, nullable = false)(),
    AttributeReference("view", StringType, nullable = false)(),
    AttributeReference("as_of_version", LongType, nullable = false)())

  private def refuse(why: String): Nothing = throw new IllegalArgumentException(
    s"CREATE MATERIALIZED VIEW needs a plain grouped aggregate over an unpinned " +
    s"graft store whose every output the rewrite can serve from — $why")

  override def run(spark: SparkSession): Seq[Row] = {
    val df = spark.sql(query)
    // strip analyzer aliases down to Aggregate(… , relation)
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => unwrap(c)
      case Project(list, c) if list.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(c) // a bare column-order projection changes nothing
      case other => other
    }
    val (groupExprs, aggExprs, relation) = unwrap(df.queryExecution.analyzed) match {
      case agg: Aggregate =>
        unwrap(agg.child) match {
          case r: DataSourceV2Relation =>
            (agg.groupingExpressions, agg.aggregateExpressions, r)
          case other => refuse(s"the aggregate must sit DIRECTLY on the store " +
            s"read (no filters/joins/projections below it), found: ${other.nodeName}")
        }
      case other => refuse(s"got a ${other.nodeName}, not a GROUP BY aggregate")
    }
    val table = relation.table match {
      case t: graft.sources.GraftTable => t
      case _ => refuse("the FROM must be a graft catalog read (graft.`/path`)")
    }
    val (basePath, version) = table.liveReadPoint.getOrElse(
      refuse("the read is version/branch/tag-pinned — a maintained view " +
        "reflects the live chain only"))

    val groupNorms = groupExprs.map(MatViews.normalize(_))
    val groups = Seq.newBuilder[(String, org.apache.spark.sql.Column)]
    val sums = Seq.newBuilder[(String, org.apache.spark.sql.Column)]
    val counts = Seq.newBuilder[(String, org.apache.spark.sql.Column)]
    val mins = Seq.newBuilder[(String, org.apache.spark.sql.Column)]
    val maxs = Seq.newBuilder[(String, org.apache.spark.sql.Column)]
    var countCol: Option[String] = None
    // the analyzed expressions carry catalog-qualified attributes
    // (`graft./path/t`.`d`); registration re-resolves against a bare
    // provider read, so serialize qualifier-free
    def asCol(e: Expression) = org.apache.spark.sql.functions.expr(
      e.transform { case a: AttributeReference => a.withQualifier(Nil) }.sql)
    aggExprs.foreach {
      case al @ Alias(ae: AggregateExpression, _) =>
        if (ae.isDistinct || ae.filter.isDefined)
          refuse(s"'${al.name}' is DISTINCT/FILTERed — not derivable under deletes")
        ae.aggregateFunction match {
          case c: Count if c.children.forall(ch =>
              ch.foldable && ch.eval() != null) =>
            countCol = Some(al.name)
          case c: Count if c.children.size == 1 =>
            counts += al.name -> asCol(c.children.head)
          case s: Sum => sums += al.name -> asCol(s.child)
          case m: Min => mins += al.name -> asCol(m.child)
          case m: Max => maxs += al.name -> asCol(m.child)
          case other => refuse(s"'${al.name}' is ${other.prettyName} — only " +
            "COUNT(*)/COUNT(x)/SUM(x)/MIN(x)/MAX(x) are " +
            "maintainable-and-derivable; avg derives automatically from a " +
            "SUM(x) + COUNT(x) pair")
        }
      case ne if groupNorms.contains(MatViews.normalize(ne match {
          case Alias(e, _) => e
          case e           => e
        })) =>
        groups += ne.name -> asCol(ne match {
          case Alias(e, _) => e
          case e           => e
        })
      case other => refuse(s"output '${other.name}' is neither a grouping " +
        "expression nor a supported aggregate")
    }
    val g = groups.result()
    if (g.size != groupExprs.size)
      refuse("every GROUP BY expression must appear (aliased) in the SELECT " +
        "list — the rewrite substitutes grain columns by name")

    // name conflict checked AFTER shape validation (an unservable
    // query is the more fundamental refusal) and BEFORE any write
    if (!orReplace && MatViews.lookup(spark, basePath, name).isDefined)
      throw new IllegalArgumentException(
        s"materialized view '$name' already registered for $basePath — " +
        "CREATE OR REPLACE MATERIALIZED VIEW re-points it, or DROP first")
    df.coalesce(1).write.mode("overwrite").parquet(viewPath)
    MatViews.register(spark, basePath, viewPath, version, g,
      countCol, sums.result(), counts.result(), name = name,
      mins = mins.result(), maxs = maxs.result())
    Seq(Row(basePath, viewPath, version))
  }
}

/** `DROP MATERIALIZED VIEW FOR '<store_path>' [NAMED n]` —
  * unregister the named view (or ALL of the store's views without
  * NAMED); the parquet stays (it is data; the registration is what
  * armed the planner). */
case class DropMatViewCommand(basePath: String, name: Option[String])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("base", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    name match {
      case Some(n) => MatViews.unregister(basePath, n)
      case None    => MatViews.unregister(basePath)
    }
    Seq(Row(basePath))
  }
}
