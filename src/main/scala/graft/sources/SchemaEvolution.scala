package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Schema evolution for the versioned snapshot store — the migration
  * concern the reference handles by dropping and recreating every
  * table (`create_table_recreate_all_tables.py:1-21`); a lakehouse
  * keeps history readable across schema changes instead.
  *
  * Mechanism (the public Iceberg design): every logical column gets a
  * STABLE ID at first publish; a rename keeps the id under a new
  * name, an added column mints a new id. Each version carries its
  * id→(name, type) mapping as `_schema` metadata inside the version
  * dir ([[Sinks.publishSnapshot]] `extraMeta`, written before the
  * commit marker, so a committed version always has its mapping).
  * Reading an old version "as of" the live schema resolves columns BY
  * ID: renamed columns come back under their current name, columns
  * added later materialize as typed nulls — one scan, no rewrite of
  * history, no positional guessing.
  *
  * Scale: the mapping is one tiny file per version; resolution is a
  * driver-side projection decision. The data path stays a plain
  * column-pruned parquet scan of the immutable version dir.
  */
object SchemaEvolution {

  /** One logical column: stable id, current name, Spark DDL type. */
  final case class ColMeta(id: Long, name: String, ddl: String)

  private val metaName = "schema"

  /** The `extraMeta` key the id mapping rides under — exposed so the
    * branch publish path can carry and validate it. */
  private[sources] def schemaMetaName: String = metaName

  /** Parse a serialized mapping (the [[render]] inverse). */
  private[sources] def parseSchema(content: String): Seq[ColMeta] =
    content.split("\n").filter(_.nonEmpty).toSeq.map { line =>
      val Array(id, name, ddl) = line.split("\t", 3)
      ColMeta(id.toLong, name, ddl)
    }

  /** High-water mark of every id EVER minted, persisted with each
    * version. Minting above the LIVE mapping's max would be wrong:
    * drop the max-id column and the next add would re-mint the
    * retired id, silently resurrecting the dropped column's history
    * under the new column's name. Old versions also get pruned
    * (`retainVersions`), so the mark cannot be recovered by scanning
    * history — it must ride the metadata. */
  private val maxIdMeta = "schema_maxid"

  /** Serialize: one `id<TAB>name<TAB>ddl` line per column. Names are
    * parquet field names (no tabs/newlines possible); the format needs
    * no parser beyond split. */
  private def render(cols: Seq[ColMeta]): String =
    cols.map(c => s"${c.id}\t${c.name}\t${c.ddl}").mkString("\n")

  /** The id mapping governing `version`, if its chain was published
    * through [[publishEvolved]] (or inherited the mapping through a
    * metadata-carrying maintenance pass — see [[Sinks.compactSnapshot]]
    * and [[DeletionVectors.materializeDeletes]]). A DV/MoR commit
    * carries no publish metadata of its own, so the mapping resolves
    * at the chain's BASE data version — deletes and upserts leave the
    * schema exactly as the data they amend declared it. */
  def schemaOf(spark: SparkSession, tablePath: String, version: Long): Option[Seq[ColMeta]] =
    Sinks.versionMeta(spark, tablePath,
        DeletionVectors.baseDataVersion(spark, tablePath, version))
      .get(metaName).map(parseSchema)

  /** Publish `df` as the next version WITH its id mapping. Ids carry
    * over by name from the live version's mapping; `renamedFrom` maps
    * a NEW column name to the OLD name whose id it inherits (the
    * rename declaration — without it a renamed column would mint a
    * fresh id and read as add+drop). Unknown names mint new ids. */
  def publishEvolved(df: DataFrame, dateCol: String, tablePath: String,
                     renamedFrom: Map[String, String] = Map.empty,
                     retainVersions: Int = 2): Long = {
    val spark = df.sparkSession
    val liveVersion = Sinks.currentVersion(spark, tablePath)
    val prev: Seq[ColMeta] = liveVersion
      .flatMap(v => schemaOf(spark, tablePath, v)).getOrElse(Seq.empty)
    val prevByName = prev.map(c => c.name -> c).toMap
    renamedFrom.foreach { case (nu, old) =>
      require(prevByName.contains(old) || prev.isEmpty,
        s"renamedFrom: no column '$old' in the live schema to inherit for '$nu'")
      require(df.columns.contains(nu), s"renamedFrom: '$nu' not in the published frame")
    }
    // mint above every id EVER issued, not just the live ones —
    // retired (dropped) ids must never come back (see maxIdMeta).
    // Resolved through any live DV/MoR chain, like the mapping: a
    // publish on top of an unmaterialized delete must not restart the
    // id counter and silently re-mint retired ids.
    var nextId = liveVersion
      .map(v => DeletionVectors.baseDataVersion(spark, tablePath, v))
      .flatMap(v => Sinks.versionMeta(spark, tablePath, v).get(maxIdMeta))
      .map(_.toLong)
      .getOrElse(prev.map(_.id).maxOption.getOrElse(0L))
    val cols = df.schema.fields.toSeq.map { f =>
      val inherited = renamedFrom.get(f.name).flatMap(prevByName.get)
        .orElse(prevByName.get(f.name))
      inherited match {
        case Some(old) => ColMeta(old.id, f.name, f.dataType.sql)
        case None      => nextId += 1; ColMeta(nextId, f.name, f.dataType.sql)
      }
    }
    Sinks.publishSnapshot(df, dateCol, tablePath, retainVersions,
      extraMeta = Map(metaName -> render(cols), maxIdMeta -> nextId.toString))
  }

  /** Read committed `version` projected onto the schema of
    * `asOfVersion` (default: live). Columns resolve BY ID: present →
    * selected under the as-of name; absent at `version` (added later)
    * → typed null. A column DROPPED later simply has no id in the
    * as-of mapping and vanishes from the projection — history reads
    * never fail on schema drift in either direction. */
  def readSnapshotAs(spark: SparkSession, tablePath: String, version: Long,
                     asOfVersion: Option[Long] = None): DataFrame =
    projectAs(spark, tablePath, version, asOfVersion,
      Sinks.readSnapshotAt(spark, tablePath, version))

  /** [[readSnapshotAs]] over the MERGE-ON-READ state: `version`'s
    * deletion/upsert chain is resolved first
    * ([[DeletionVectors.readMergedAt]]), then the merged rows project
    * onto the as-of schema by id — the read a table that is both
    * evolving and MoR-amended serves its consumers. The chain's
    * mapping resolves at its base data version (deltas are validated
    * against the base's physical columns at publish, so the base
    * mapping governs every merged row). */
  def readMergedAs(spark: SparkSession, tablePath: String, version: Long,
                   asOfVersion: Option[Long] = None): DataFrame =
    projectAs(spark, tablePath, version, asOfVersion,
      DeletionVectors.readMergedAt(spark, tablePath, version))

  private def projectAs(spark: SparkSession, tablePath: String, version: Long,
                        asOfVersion: Option[Long], phys: DataFrame): DataFrame = {
    val asOf = asOfVersion.orElse(Sinks.currentVersion(spark, tablePath)).getOrElse(
      throw new java.io.FileNotFoundException(s"no published snapshot at $tablePath"))
    val target = schemaOf(spark, tablePath, asOf).getOrElse(
      throw new java.io.FileNotFoundException(
        s"version $asOf of $tablePath has no schema mapping " +
        "(published without SchemaEvolution.publishEvolved)"))
    val atV = schemaOf(spark, tablePath, version).getOrElse(
      throw new java.io.FileNotFoundException(
        s"version $version of $tablePath has no schema mapping"))
    projectByIds(phys, atV, target)
  }

  /** Project a physical state whose columns `atV` describes onto the
    * `target` mapping BY ID: present ids select under the target name
    * (lossless type widenings only), absent ids null-fill, ids the
    * target lacks vanish. The projection core of every as-of read;
    * also the branch-merge path's way of bringing a branch state
    * published under pre-evolution names into main's current schema. */
  private[sources] def projectByIds(phys: DataFrame, atV: Seq[ColMeta],
                                    target: Seq[ColMeta]): DataFrame = {
    val byId: Map[Long, ColMeta] = atV.map(c => c.id -> c).toMap
    val projection: Seq[Column] = target.map { c =>
      byId.get(c.id) match {
        case Some(old) if old.ddl == c.ddl => col(old.name).as(c.name)
        case Some(old) =>
          // TYPE evolution: follow the as-of schema, but only through
          // lossless widenings (int→long, float→double, decimal
          // scale-up — the Iceberg-permitted set); a narrowed read
          // would silently truncate history, so it refuses instead
          val from = DataType.fromDDL(old.ddl)
          val to = DataType.fromDDL(c.ddl)
          require(org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to),
            s"column '${c.name}' (id ${c.id}) evolved ${old.ddl} -> ${c.ddl}, " +
            "which is not a lossless widening; reading old versions through " +
            "this schema would corrupt history")
          col(old.name).cast(to).as(c.name)
        case None => lit(null).cast(DataType.fromDDL(c.ddl)).as(c.name)
      }
    }
    phys.select(projection: _*)
  }

  /** One evolved two-version table per source dir per JVM (same memo
    * rationale as SnapshotDiff.publishTimeline: the fixture build is
    * shared, the timed path is the evolved reads). */
  private val evolved = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** v1: (o_orderkey, price, transaction_date). v2: price RENAMED to
    * amount (id preserved via `renamedFrom`), values bumped +5.25, and
    * a `category` column ADDED. The evolution every long-lived table
    * hits: rename + add, with history still on disk under old names. */
  private def buildEvolved(spark: SparkSession, dir: String, tmp: String): String = {
    val table = s"$tmp/table"
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 4 =!= 0)
      .select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"),
        to_date(col("o_orderdate")).as("transaction_date"),
        col("o_orderpriority"))
    publishEvolved(base.drop("o_orderpriority"), "transaction_date", table)
    publishEvolved(base
        .select(col("o_orderkey"),
          (col("price") + lit(new java.math.BigDecimal("5.25"))).as("amount"),
          col("transaction_date"),
          col("o_orderpriority").as("category")),
      "transaction_date", table, renamedFrom = Map("amount" -> "price"))
    table
  }

  /** Registered `q_schema_evolution`: both versions read through the
    * LIVE schema in one projection each — v1's `price` surfaces as
    * `amount` (by id), its `category` as typed null; v2 reads as
    * itself. Hash-checked against a DuckDB reconstruction of both
    * states, so the id mapping provably round-trips values, names and
    * null semantics. */
  def evolutionResult(spark: SparkSession, dir: String): DataFrame = {
    val table = evolved.computeIfAbsent(dir,
      _ => buildEvolved(spark, dir, graft.util.Scratch.dir("schema_evolution_q")))
    def asOfLive(v: Long) = readSnapshotAs(spark, table, v)
      .select(lit(v).as("src_version"), col("o_orderkey"),
        col("amount").cast("double").as("amount"), col("category"))
    asOfLive(1L).unionByName(asOfLive(2L)).orderBy("src_version", "o_orderkey")
  }
}
