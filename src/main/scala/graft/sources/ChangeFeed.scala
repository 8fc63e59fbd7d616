package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The change-feed EMISSION shared by the streaming source
  * ([[GraftFeedSource]]) and the batch change-feed read
  * ([[ChangeFeedTable]] — Delta's
  * `spark.read.option("readChangeFeed", "true")` spelling): one
  * committed version → its feed rows, id-resolved onto the schema the
  * reader pinned at start. Semantics (documented at length on
  * [[GraftFeedSource]]): a MoR/DV link emits `upsert` + key-only
  * `delete` rows by default or the full Delta-CDF image shapes with
  * `preimages`; a plain data version emits its content as a
  * `snapshot` baseline; every row carries `_change_type` and
  * `_commit_version`. Emission is O(version bytes) by default — the
  * preimage join against the parent chain is the one opt-in
  * exception. */
private[sources] object ChangeFeed {

  /** Everything a change-feed read pins at construction: the payload
    * schema (chain-resolved, `txn_month` hidden), the stable-id
    * mapping of the pinning head (None for stores never published
    * through [[SchemaEvolution.publishEvolved]]), and whether link
    * versions resolve full old images. */
  case class Pin(root: String, payload: StructType,
                 mapping: Option[Seq[SchemaEvolution.ColMeta]],
                 preimages: Boolean)

  def pinAtHead(spark: SparkSession, root: String, preimages: Boolean): Pin =
    Pin(root,
      StructType(DeletionVectors.readMerged(spark, root).drop("txn_month")
        .schema.fields.toSeq),
      Sinks.currentVersion(spark, root)
        .flatMap(SchemaEvolution.schemaOf(spark, root, _)),
      preimages)

  /** Payload + `_change_type` + `_commit_version`, the feed schema. */
  def feedSchema(pin: Pin): StructType = StructType(pin.payload.fields.toSeq :+
    StructField("_change_type", StringType, nullable = false) :+
    StructField("_commit_version", LongType, nullable = false))

  /** Project one historical version's rows onto the pinned schema: BY
    * ID when the table carries stable-id mappings (the batch diff's
    * resolution), else by name with a DELIBERATE refusal naming the
    * evolved version when its columns don't cover the pinned schema.
    * Physical columns the pinned schema lacks (added after the pin,
    * under no mapping) are dropped — the feed's schema is fixed at
    * start by contract. */
  private def projectTo(spark: SparkSession, pin: Pin, df: DataFrame,
                        v: Long): DataFrame = pin.mapping match {
    case Some(target) =>
      val atV = SchemaEvolution.schemaOf(spark, pin.root, v).getOrElse(
        throw new IllegalStateException(
          s"change feed on ${pin.root}: version $v has no stable-id schema " +
          "mapping but the read pinned an evolved schema — history published " +
          "outside SchemaEvolution.publishEvolved cannot be id-resolved; start " +
          s"the feed past version $v"))
      SchemaEvolution.projectByIds(df, atV, target)
    case None =>
      val missing = pin.payload.fieldNames.filterNot(df.columns.contains)
      if (missing.nonEmpty) throw new IllegalStateException(
        s"change feed on ${pin.root}: version $v lacks column(s) " +
        s"${missing.mkString(", ")} of the schema pinned at feed start — the " +
        "table evolved mid-history without a stable-id mapping. Publish through " +
        "SchemaEvolution.publishEvolved (id-resolved feeds survive renames/adds) " +
        "or start the feed past the evolution boundary")
      df.select(pin.payload.fieldNames.map(col).toSeq: _*)
  }

  /** The pinned-schema name of version `v`'s chain key (the physical
    * key the link's vector and delta carry) — id-resolved across a
    * rename; refuses if the pinned schema dropped the key column. */
  private def pinnedKeyName(spark: SparkSession, pin: Pin, v: Long,
                            physKey: String): String = pin.mapping match {
    case None =>
      require(pin.payload.fieldNames.contains(physKey),
        s"chain key '$physKey' of version $v is not a payload column")
      physKey
    case Some(target) =>
      val atV = SchemaEvolution.schemaOf(spark, pin.root, v).getOrElse(
        throw new IllegalStateException(
          s"version $v of ${pin.root} has no schema mapping (see projectTo)"))
      val keyId = atV.find(_.name == physKey).getOrElse(throw new IllegalStateException(
        s"chain key '$physKey' of version $v is not in its schema mapping")).id
      target.find(_.id == keyId).map(_.name).getOrElse(throw new IllegalStateException(
        s"change feed on ${pin.root}: the chain key '$physKey' (id $keyId) of " +
        s"version $v was dropped from the schema pinned at feed start — keyed " +
        "changes cannot be expressed without their key column"))
  }

  /** One version's feed rows — O(this version's bytes) by default;
    * with `preimages`, plus the parent-state join that resolves full
    * old images. */
  def changeOf(spark: SparkSession, pin: Pin, v: Long): DataFrame =
    DeletionVectors.linkOf(spark, pin.root, v) match {
      case Some((physKey, parent, vec, delta)) =>
        val keyName = pinnedKeyName(spark, pin, v, physKey)
        val touched = vec.select(col(physKey).as(keyName))
        if (!pin.preimages) {
          val upserts = delta.map(d => stamp(projectTo(spark, pin, d, v), "upsert", v))
          // keys in the vector but NOT superseded by a delta image were
          // deleted outright: key column set, other payload columns null
          val delKeys = delta.fold(touched)(d =>
            touched.join(projectTo(spark, pin, d, v).select(col(keyName)),
              Seq(keyName), "left_anti"))
          val deletes = stamp(delKeys.select(pin.payload.fields.toSeq.map { f =>
            if (f.name == keyName) col(keyName).cast(f.dataType).as(f.name)
            else lit(null).cast(f.dataType).as(f.name)
          }: _*), "delete", v)
          upserts.fold(deletes)(_ unionByName deletes)
        } else {
          // full-image mode: old images of every touched key come from
          // the PARENT chain state — one keyed join against link-sized
          // broadcast key sets, never an all-pairs term; refuse-on-
          // pruned rides readMergedAt's own contract
          val parentState = projectTo(spark, pin,
            DeletionVectors.readMergedAt(spark, pin.root, parent), parent)
          val old = parentState.join(broadcast(touched), Seq(keyName), "left_semi")
          delta.map(d => projectTo(spark, pin, d, v)) match {
            case None => // pure delete link: every touched key had an image
              stamp(old, "delete", v)
            case Some(dt) =>
              val dKeys = dt.select(col(keyName)).withColumn("__in_delta", lit(1))
              val oldTagged = old.join(broadcast(dKeys), Seq(keyName), "left")
              val pre = stamp(oldTagged.filter(col("__in_delta").isNotNull)
                .drop("__in_delta"), "update_preimage", v)
              val dels = stamp(oldTagged.filter(col("__in_delta").isNull)
                .drop("__in_delta"), "delete", v)
              val oldKeys = old.select(col(keyName)).withColumn("__had_old", lit(1))
              val dTagged = dt.join(broadcast(oldKeys), Seq(keyName), "left")
              val posts = stamp(dTagged.filter(col("__had_old").isNotNull)
                .drop("__had_old"), "update_postimage", v)
              val ins = stamp(dTagged.filter(col("__had_old").isNull)
                .drop("__had_old"), "insert", v)
              pre.unionByName(dels).unionByName(posts).unionByName(ins)
          }
        }
      case None =>
        stamp(projectTo(spark, pin,
          Sinks.cachedParquetRead(spark, s"${pin.root}/${Sinks.versionDirName(v)}")
            .drop("txn_month"), v), "snapshot", v)
    }

  private def stamp(df: DataFrame, kind: String, v: Long): DataFrame =
    df.withColumn("_change_type", lit(kind))
      .withColumn("_commit_version", lit(v))

  /** The feed rows of `(from, to]` as one plan, refuse-don't-guess on
    * retention: every version in the range must still be readable — a
    * reader that fell behind must fail loudly naming the pruned
    * versions, never silently skip history. Column order fixed to the
    * feed schema. */
  def rangeFrame(spark: SparkSession, pin: Pin, from: Long, to: Long): DataFrame = {
    val range = (from + 1L) to to
    require(range.nonEmpty, s"empty change range ($from, $to]")
    val readable = Sinks.listVersions(spark, pin.root).toSet
    val lost = range.filterNot(readable)
    if (lost.nonEmpty)
      throw new java.io.FileNotFoundException(
        s"change feed on ${pin.root} needs version(s) ${lost.mkString(",")} but " +
        "retention pruned them — the consumer fell behind the retainVersions " +
        "window; restart from a retained startingVersion (or a fresh snapshot) " +
        "and size retention to cover consumer lag")
    range.map(changeOf(spark, pin, _)).reduce(_ unionByName _)
      .select(feedSchema(pin).fieldNames.map(col).toSeq: _*)
  }
}

/** BATCH change-feed read — Delta CDF's batch spelling, verbatim:
  *
  * {{{
  * spark.read.format("graft-table")
  *   .option("readChangeFeed", "true")
  *   .option("startingVersion", 2)          // or startingTimestamp
  *   .option("endingVersion", 5)            // or endingTimestamp; default: live head
  *   .load(storeRoot)
  * }}}
  *
  * Returns the payload plus `_change_type` / `_commit_version` for
  * every commit in `[startingVersion, endingVersion]` — the same
  * per-version emission the streaming feed produces ([[ChangeFeed]]),
  * including the opt-in `preimages` Delta-CDF image shapes, so a batch
  * backfill and a streaming tail of the same history are
  * row-identical. Where the batch [[graft.operators.SnapshotDiff]]
  * answers "what changed BETWEEN two states" (keyed diff, full
  * replaces resolved), this answers "what did each COMMIT do" — the
  * ledger shape.
  *
  * Refuse-don't-guess at construction: a starting point is REQUIRED
  * (`startingVersion` or `startingTimestamp` — an unbounded CDF read
  * silently re-reading a 100 TB history is the accident this
  * refuses), bounds must be committed versions within retention
  * (`endingVersion` beyond the live head names the head; a pruned
  * range names the pruned versions), starting/ending timestamp and
  * version spellings are mutually exclusive per bound, and point-read
  * options (branch/tag/versionAsOf/timestampAsOf) are rejected — the
  * feed reads MAIN history forward. The range and schema pin at
  * construction: a publish landing mid-read cannot move the default
  * ending bound.
  *
  * The scan reuses [[MergedScanBuilder]]: column pruning and every
  * translatable filter sink into the per-version plans (a
  * `_commit_version = 5` predicate prunes to one version's files;
  * payload predicates push into the link parquet scans), with all
  * filters kept as residual above — pushdown is an optimization,
  * never a correctness dependency. */
private[sources] class ChangeFeedTable(spark: SparkSession, root: String,
                                       params: Map[String, String])
  extends org.apache.spark.sql.connector.catalog.Table
  with org.apache.spark.sql.connector.catalog.SupportsRead {

  import org.apache.spark.sql.connector.catalog.TableCapability

  require(!Seq("branch", "tag", "versionasof", "timestampasof").exists(params.contains),
    "readChangeFeed reads MAIN history forward; point reads " +
    "(branch/tag/versionAsOf/timestampAsOf) are plain batch options")
  require(!(params.contains("startingversion") && params.contains("startingtimestamp")),
    "startingVersion and startingTimestamp are mutually exclusive — pick one")
  require(!(params.contains("endingversion") && params.contains("endingtimestamp")),
    "endingVersion and endingTimestamp are mutually exclusive — pick one")

  private val pin = ChangeFeed.pinAtHead(spark, root,
    params.get("preimages").exists(_.trim.equalsIgnoreCase("true")))

  private val head: Long = Sinks.currentVersion(spark, root).getOrElse(
    throw new java.io.FileNotFoundException(
      s"no published snapshot at $root — a change feed needs a first commit"))

  private val startingVersion: Long = params.get("startingversion").map(_.toLong)
    .orElse(params.get("startingtimestamp").map(s =>
      Sinks.firstVersionAtOrAfter(spark, root, GraftTable.parseTsMillis(s))))
    .getOrElse(throw new IllegalArgumentException(
      s"readChangeFeed on $root needs a starting point: pass startingVersion " +
      "or startingTimestamp (an unbounded feed read over a large history is " +
      "refused, not guessed)"))

  private val endingVersion: Long = params.get("endingversion").map(_.toLong)
    .orElse(params.get("endingtimestamp").map(s =>
      Sinks.versionAsOfTimestamp(spark, root, GraftTable.parseTsMillis(s))))
    .getOrElse(head)

  require(startingVersion >= 1,
    s"startingVersion must be a committed version number (>= 1), got $startingVersion")
  require(endingVersion <= head,
    s"endingVersion $endingVersion is beyond the live head $head of $root")
  require(startingVersion <= endingVersion,
    s"empty change range: startingVersion $startingVersion > " +
    s"endingVersion $endingVersion of $root")

  // refuse-don't-guess at CONSTRUCTION: the requested range must be
  // retained in full. The scan below prunes versions a
  // `_commit_version` predicate excludes, and a version-pruned scan
  // must not make a feed over partially-pruned history look healthy —
  // the refusal belongs to the range the user NAMED, not the subset a
  // particular query happened to touch.
  locally {
    val readable = Sinks.listVersions(spark, root).toSet
    val lost = (startingVersion to endingVersion).filterNot(readable)
    if (lost.nonEmpty)
      throw new java.io.FileNotFoundException(
        s"change feed on $root needs version(s) ${lost.mkString(",")} but " +
        "retention pruned them — the consumer fell behind the retainVersions " +
        "window; restart from a retained startingVersion (or a fresh snapshot) " +
        "and size retention to cover consumer lag")
  }

  override def name(): String =
    s"graft-table-changes:$root@v$startingVersion..v$endingVersion"

  override lazy val schema: StructType = ChangeFeed.feedSchema(pin)

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  /** Resolved once per (sub)range: the range plan lists files and
    * reads parquet footers per version — version dirs are immutable
    * and the range is pinned at construction, so a second action on
    * the same loaded DataFrame must not pay the resolution again (the
    * [[GraftTable.mergedDf]] memoization contract). Keyed by the
    * NARROWED bounds because the scan builder below prunes versions. */
  private val frames =
    new java.util.concurrent.ConcurrentHashMap[(Long, Long), org.apache.spark.sql.DataFrame]()
  private def frameOf(lo: Long, hi: Long): org.apache.spark.sql.DataFrame =
    frames.computeIfAbsent((lo, hi),
      _ => ChangeFeed.rangeFrame(spark, pin, lo - 1L, hi))

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    new ChangeFeedScanBuilder(spark, schema, startingVersion, endingVersion, frameOf)
}

/** Scan builder for the batch change feed: VERSION PRUNING at plan
  * time. A conjunctive `_commit_version` predicate (=, <, <=, >, >=,
  * IN, AND) narrows the [starting, ending] version range BEFORE the
  * range plan is built, so the scan lists and plans only the versions
  * the query can touch — over a 10k-version backlog,
  * `WHERE _commit_version = n` costs one version's file listing, not
  * ten thousand. Every filter stays residual above (the
  * [[MergedScanBuilder]] stance — each row carries its
  * `_commit_version`, so re-applying is correct by construction and a
  * bounds-extraction corner can never widen results); payload
  * predicates push into the per-version parquet scans through the
  * delegate exactly as chain-merged reads push them. */
private[sources] class ChangeFeedScanBuilder(
    spark: SparkSession, feedSchema: StructType,
    startV: Long, endV: Long,
    frameOf: (Long, Long) => org.apache.spark.sql.DataFrame)
  extends org.apache.spark.sql.connector.read.ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownFilters {

  import org.apache.spark.sql.sources._

  private var required: StructType = feedSchema
  private var stored: Array[Filter] = Array.empty
  private var lo = startV
  private var hi = endV

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long  => Some(l)
    case i: Int   => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte  => Some(b.toLong)
    case _        => None
  }

  private def bound(f: Filter): Unit = f match {
    case EqualTo("_commit_version", v) => asLong(v).foreach { n =>
      lo = math.max(lo, n); hi = math.min(hi, n) }
    case GreaterThan("_commit_version", v) => asLong(v).foreach(n => lo = math.max(lo, n + 1))
    case GreaterThanOrEqual("_commit_version", v) => asLong(v).foreach(n => lo = math.max(lo, n))
    case LessThan("_commit_version", v) => asLong(v).foreach(n => hi = math.min(hi, n - 1))
    case LessThanOrEqual("_commit_version", v) => asLong(v).foreach(n => hi = math.min(hi, n))
    case In("_commit_version", vs) if vs.nonEmpty =>
      val ns = vs.flatMap(asLong)
      if (ns.length == vs.length) { lo = math.max(lo, ns.min); hi = math.min(hi, ns.max) }
    case And(l, r) => bound(l); bound(r)
    case _ => () // disjunctions / other shapes: no narrowing, residual handles them
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    stored = filters
    filters.foreach(bound) // top-level array elements are conjuncts
    filters // ALL residual — narrowing + frame filters are optimizations
  }

  override def pushedFilters(): Array[Filter] =
    stored.filter(f =>
      V1Filters.toColumn(f, org.apache.spark.sql.functions.col).isDefined)

  override def build(): org.apache.spark.sql.connector.read.Scan = {
    val frame =
      if (lo > hi) // contradiction (e.g. _commit_version = 7 outside the range)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], feedSchema)
      else frameOf(lo, hi)
    val delegate = new MergedScanBuilder(frame)
    delegate.pruneColumns(required)
    delegate.pushFilters(stored)
    delegate.build()
  }
}
