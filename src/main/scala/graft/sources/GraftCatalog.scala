package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** PATH-ADDRESSED TableCatalog for the versioned snapshot store — the
  * SQL front door that makes `MERGE INTO` / `UPDATE` / `DELETE` /
  * `INSERT INTO` reach the lakehouse without the Scala API (the
  * Delta-Lake `delta.`/path/`` idiom). Registered by
  * [[graft.GraftSession]] as
  *
  *   spark.sql.catalog.graft = graft.sources.GraftCatalog
  *
  * so SQL like
  *
  *   MERGE INTO graft.`/data/stores/orders` t USING changes c
  *     ON t.o_orderkey = c.o_orderkey
  *     WHEN MATCHED AND c.op = 'D' THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  *
  * resolves to a [[GraftTable]] in catalog mode: payload schema
  * (derived `txn_month` hidden, so write frames round-trip), DV/MoR
  * chain heads served MERGED, and row-level operations routed to
  * O(changes) MoR commits ([[GraftTable]]'s class doc has the write
  * semantics).
  *
  * Identifier = path: the backquoted identifier IS the store root
  * (multipart identifiers join with '/'; a relative path resolves
  * against the catalog's `root` option,
  * `spark.sql.catalog.graft.root = /warehouse`). The store is
  * self-describing (versions + commit markers + published schema
  * metadata), so the catalog holds NO state of its own: a table
  * "exists" iff its store has a committed version, and CREATE/DROP
  * are publish/retention operations, not catalog DDL — `createTable`
  * points at the bootstrap write path, `dropTable` refuses (deleting
  * 100 TB of committed history is an operator action, not a SQL
  * side-effect), and both time-travel spellings resolve here:
  * `VERSION AS OF` through [[Sinks.readSnapshotAt]]'s
  * refuse-don't-guess contract, `TIMESTAMP AS OF` through
  * [[Sinks.versionAsOfTimestamp]]'s newest-commit-at-or-before rule
  * over commit-marker mtimes.
  */
class GraftCatalog extends TableCatalog with ProcedureCatalog {

  private var catalogName: String = "graft"
  private var rootOpt: Option[String] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    rootOpt = Option(options.get("root"))
  }

  override def name(): String = catalogName

  /** Declares `ALTER TABLE … ADD/DROP CONSTRAINT` support so the
    * analyzer routes Spark 4's native constraint DDL to
    * [[alterTable]] (CHECK only — see there). */
  override def capabilities(): util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_TABLE_CONSTRAINT)

  private def spark: SparkSession = SparkSession.active

  private def pathOf(ident: Identifier): String = {
    val joined = (ident.namespace() :+ ident.name()).mkString("/")
    if (joined.startsWith("/") || joined.contains("://")) joined
    else rootOpt.fold(throw new IllegalArgumentException(
      s"graft catalog identifier '$joined' is a relative path but the catalog has no " +
      s"root — use an absolute path (MERGE INTO $catalogName.`/abs/path` …) or set " +
      s"spark.sql.catalog.$catalogName.root"))(r => s"$r/$joined")
  }

  /** A listing-free catalog: stores are addressed, not enumerated. */
  override def listTables(namespace: Array[String]): Array[Identifier] = Array.empty

  override def loadTable(ident: Identifier): Table = {
    val path = pathOf(ident)
    if (Sinks.currentVersion(spark, path).isEmpty) throw new NoSuchTableException(ident)
    GraftTable.forCatalog(spark, path, Map.empty)
  }

  /** `SELECT … FROM graft.`/path` VERSION AS OF n` — the SQL spelling
    * of [[Sinks.readSnapshotAt]]. */
  override def loadTable(ident: Identifier, version: String): Table =
    GraftTable.forCatalog(spark, pathOf(ident), Map("versionasof" -> version))

  /** `SELECT … FROM graft.`/path` TIMESTAMP AS OF '…'` — Spark hands
    * the parsed timestamp as epoch MICROseconds; resolution is
    * [[Sinks.versionAsOfTimestamp]]'s newest-commit-at-or-before rule
    * over commit-marker mtimes, refuse-don't-guess at both ends. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    GraftTable.forCatalog(spark, pathOf(ident),
      Map("timestampasof" -> (timestampMicros / 1000L).toString))

  override def tableExists(ident: Identifier): Boolean =
    Sinks.currentVersion(spark, pathOf(ident)).isDefined

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      s"the graft store at ${pathOf(ident)} is self-describing — bootstrap it with a " +
      "first publish instead of DDL: df.write.format(\"graft-table\")" +
      ".option(\"dateCol\", …).mode(\"overwrite\").save(path), or Sinks.publishSnapshot")

  /** The STANDARD SQL spellings of table maintenance, two families:
    *
    * CONSTRAINTS — `ALTER TABLE graft.`/path` ADD CONSTRAINT c CHECK
    * (expr)` / `… DROP CONSTRAINT c` through Spark 4's native DSv2
    * constraint DDL. Spark's AddCheckConstraintExec scans existing
    * data for violations BEFORE calling here (the same
    * refuse-if-violated contract [[Constraints.addConstraint]]
    * enforces for the library path), so the add persists without a
    * second scan.
    *
    * SCHEMA EVOLUTION — `ADD COLUMNS` / `RENAME COLUMN` /
    * `DROP COLUMN` / `ALTER COLUMN … TYPE` routed to
    * [[SchemaEvolution.alterColumns]]: every change in the statement
    * folds into ONE evolution publish (rename inherits the stable
    * column id via `renamedFrom`, add mints above the high-water
    * mark, drop retires the id, type changes are lossless widenings
    * only), so as-of reads keep resolving history by id across the
    * change — the capability the reference's migrate-by-recreate
    * never had.
    *
    * ATOMIC DDL: every change is classified BEFORE anything persists
    * — a statement containing any unsupported change (or mixing the
    * two families, which no standard grammar produces) refuses whole,
    * never half-applies. Column changes are one publish (atomic by
    * the commit-marker protocol); multi-ADD-CONSTRAINT statements
    * persist per constraint only after all are validated as CHECKs. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = pathOf(ident)
    // ---- classify and validate ALL changes before persisting ANY ----
    val constraintOps = changes.collect {
      case c: TableChange.AddConstraint  => c: TableChange
      case c: TableChange.DropConstraint => c: TableChange
    }
    val columnOps = changes.collect {
      case c: TableChange.AddColumn        => c: TableChange
      case c: TableChange.RenameColumn     => c: TableChange
      case c: TableChange.DeleteColumn     => c: TableChange
      case c: TableChange.UpdateColumnType => c: TableChange
    }
    val unsupported = changes.filterNot(c =>
      constraintOps.contains(c) || columnOps.contains(c))
    if (unsupported.nonEmpty) throw new UnsupportedOperationException(
      s"unsupported ALTER TABLE change(s) " +
      s"${unsupported.map(_.getClass.getSimpleName).mkString(", ")} on a graft " +
      "table: column add/rename/drop/type-widen (the evolution publish) and " +
      "CHECK constraint add/drop are the supported DDL surface")
    if (constraintOps.nonEmpty && columnOps.nonEmpty)
      throw new UnsupportedOperationException(
        "refusing to mix constraint and column changes in one ALTER TABLE " +
        "statement — they commit through different mechanisms and could not " +
        "apply atomically together; issue two statements")
    // one metadata read serves both passes (no validate/apply TOCTOU:
    // the drop decision is made against the set the refusal checked)
    val known: Set[String] =
      if (constraintOps.isEmpty) Set.empty
      else Constraints.constraintsOf(spark, path).keySet
    constraintOps.foreach {
      case add: TableChange.AddConstraint =>
        add.constraint() match {
          case _: org.apache.spark.sql.connector.catalog.constraints.Check => ()
          case other => throw new UnsupportedOperationException(
            s"graft tables support CHECK constraints only — got ${other.toDDL}; " +
            "primary/foreign keys and UNIQUE are not enforceable on a " +
            "snapshot store without an index structure it does not keep")
        }
      case drop: TableChange.DropConstraint =>
        if (!drop.ifExists() && !known.contains(drop.name()))
          throw new IllegalArgumentException(
            s"no CHECK constraint '${drop.name()}' on $path — " +
            "ALTER TABLE … DROP CONSTRAINT IF EXISTS tolerates unknown names")
    }
    // ---- apply ----
    constraintOps.foreach {
      case add: TableChange.AddConstraint =>
        val c = add.constraint()
          .asInstanceOf[org.apache.spark.sql.connector.catalog.constraints.Check]
        Constraints.persistValidated(spark, path, c.name(), c.predicateSql())
      case drop: TableChange.DropConstraint =>
        if (known.contains(drop.name()))
          Constraints.dropConstraint(spark, path, drop.name())
    }
    if (columnOps.nonEmpty) SchemaEvolution.alterColumns(spark, path, columnOps)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      s"refusing to drop committed snapshot history at ${pathOf(ident)} from SQL; " +
      "retention (publish retainVersions) and Sinks.vacuum are the store's " +
      "lifecycle operators")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "a graft table IS its path; relocate the directory tree (markers are " +
      "path-relative) instead of renaming through the catalog")

  // ——— maintenance verbs: CALL <catalog>.system.<verb>(…) ————————————
  //
  // The SQL spellings of DESCRIBE HISTORY / RESTORE / expiration live
  // here as NAMED procedures ([[GraftProcedures]]) — the dropTable
  // refusal above stands, because destroying history must be an
  // explicit verb with its own ledger result, never a DDL side-effect.

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace().isEmpty || ident.namespace().sameElements(Array("system")),
      s"graft procedures live in the 'system' namespace: CALL $catalogName.system." +
      s"${ident.name()}(…) — got namespace '${ident.namespace().mkString(".")}'")
    GraftProcedures.forName(ident.name(), rootOpt)
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      GraftProcedures.names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty
}
