package graft.sources

import java.util
import java.util.zip.ZipInputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The zip-archive extraction source as a real DataSource V2
  * connector — `spark.read.format("graft-zip").load(glob)` — the
  * engine-integrated sibling of [[ZipSource.entries]]'s
  * binaryFile+mapPartitions plan, and the library's demonstration of
  * the custom-source extension point the brief's preference ladder
  * ends at.
  *
  * What V2 integration buys over the function form:
  *   - **One InputPartition per archive**: Spark schedules archives
  *     directly (locality hints could ride here on a real cluster)
  *     instead of first materializing whole archives as binaryFile
  *     rows — the 2 GB binary-column ceiling no longer applies to the
  *     archive, only to single entries.
  *   - **Column pruning that changes IO**: prune `content` and entry
  *     payloads are never buffered (bytes stream through an
  *     incremental digest when `sha256` survives, or are discarded
  *     chunk-wise); results — including the `ok`/`err` quarantine
  *     verdicts — are projection-independent. Parsable archives are
  *     read through their CENTRAL DIRECTORY ([[SeekableZip]], any
  *     Hadoop scheme): a metadata census or a pushed entry-predicate
  *     miss inflates nothing at all, and consumed entries are
  *     reached by seek. Only structurally damaged archives fall back
  *     to the sequential inflate walk (where skipped data is still
  *     decompressed in passing — the cost of quarantining instead of
  *     failing). The pruned schema is visible in the scan
  *     (`readSchema`), like parquet's.
  *   - Catalog-ready: `USING `graft-zip`` DDL works (DataSourceRegister).
  *
  * Same quarantine contract as ZipSource: a corrupt / truncated /
  * empty / oversized archive yields an `ok = false` row, never a
  * failed task. Registered `q_zip_dsv2` runs the SAME round-trip
  * aggregate as `q_zip_ingest` through this connector against the
  * SAME DuckDB oracle — one truth, two source implementations.
  */
class ZipDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-zip"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZipDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ZipTable(new CaseInsensitiveStringMap(properties))
}

object ZipDataSource {
  val schema: StructType = StructType(Seq(
    StructField("archive", StringType, nullable = false),
    StructField("entry", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("sha256", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("ok", BooleanType, nullable = false),
    StructField("err", StringType, nullable = false)))
}

private[sources] class ZipTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-zip:${options.get("path")}"
  override def schema(): StructType = ZipDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ZipScanBuilder(new CaseInsensitiveStringMap(
      (options.asScala ++ opts.asScala).asJava))
}

private[sources] class ZipScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._
  private var required: StructType = ZipDataSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve OUR field order (readers emit positionally); empty
    // projections (count(*)) keep one cheap column
    required = StructType(ZipDataSource.schema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name))) match {
      case s if s.isEmpty => StructType(Seq(ZipDataSource.schema("archive")))
      case s => s
    }

  /** String predicates on `entry` / `archive` push into the scan:
    * archive predicates prune whole InputPartitions at planning
    * (those archives are never opened), entry predicates skip
    * non-matching entries before any buffering/hashing — "select the
    * target entry" (the reference's wrong-month-sibling rule) without
    * materializing the siblings (their bytes are still inflated in
    * passing; see the class doc's honest limit). Every pushed filter
    * is also RETAINED (returned from pushFilters), so Spark
    * re-applies them and the result is bit-identical to the unpushed
    * plan (including dropping quarantine rows whose empty entry name
    * fails the predicate) — the source only PREFILTERS IO, it never
    * owns truth. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def pushable(f: Filter): Boolean = f match {
      case EqualTo(a, _: String) => a == "entry" || a == "archive"
      case StringStartsWith(a, _) => a == "entry" || a == "archive"
      case StringEndsWith(a, _) => a == "entry" || a == "archive"
      case StringContains(a, _) => a == "entry" || a == "archive"
      case _ => false
    }
    pushed = filters.filter(pushable)
    filters // all retained: the source prefilters IO, Spark keeps truth
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ZipScan(options, required, pushed)
}

private[sources] class ZipScan(options: CaseInsensitiveStringMap,
                               required: StructType,
                               pushed: Array[org.apache.spark.sql.sources.Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-zip ${options.get("path")} [${required.fieldNames.mkString(",")}]" +
      (if (pushed.nonEmpty) s" pushed: ${pushed.mkString(", ")}" else "")

  /** Matching archives (glob + pushed archive predicates), sorted by
    * path — shared by the batch planner and the streaming offsets. */
  private[sources] def listArchives(): Seq[org.apache.hadoop.fs.FileStatus] = {
    val glob = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-zip: .load(path) required"))
    val p = new Path(glob)
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.isFile).sortBy(_.getPath.toString)
      // archive predicates prune whole archives here (Spark
      // re-applies the filter, so pruning is IO-only)
      .filter(s => ZipFilterEval.matches(pushed, "archive", s.getPath.toString))
  }

  override def planInputPartitions(): Array[InputPartition] =
    listArchives()
      .map(s => ZipPartition(s.getPath.toString, s.getLen): InputPartition)
      .toArray

  private[sources] def streamReaderFactory(): PartitionReaderFactory =
    createReaderFactory()

  override def createReaderFactory(): PartitionReaderFactory = {
    val maxEntry = Option(options.get("maxEntryBytes"))
      .map(_.toLong).getOrElse(1L << 30)
    // executors have no SparkSession: the Hadoop conf ships with the
    // factory (the standard connector pattern)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    ZipReaderFactory(required.fieldNames, maxEntry, conf,
      pushed.filter(ZipFilterEval.references(_, "entry")))
  }

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ZipMicroBatchStream(options, this)
}

/** STREAMING zip ingestion — `spark.readStream.format("graft-zip")`:
  * the reference's actual arrival regime (a new monthly archive lands
  * in the feed directory; the pipeline picks it up) as a first-class
  * Structured Streaming source.
  *
  * Offset contract: archive NAMES must be arrival-monotone
  * (lexicographically increasing — the monthly convention
  * `PPMS_update_YYYY-MM.zip` already is). An offset is simply the
  * last processed name; a micro-batch is every archive in
  * (startName, endName], one InputPartition each. This is the Kafka
  * discipline applied to a drop directory: restart-safe from the
  * checkpoint alone, no side log of seen files — and a late archive
  * sorting BEFORE the watermark name is ignored exactly like a
  * too-old Kafka offset. The contract is also ENFORCED, not just
  * documented: each listing is diffed against the last, so a name
  * that first appears at or below the committed offset is detected
  * and logged (or fails the stream with `onLateName=fail`); feeds
  * that cannot guarantee monotone names need the file-log decision
  * path, row 9. */
private[sources] class ZipMicroBatchStream(options: CaseInsensitiveStringMap,
                                           scan: ZipScan)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def allNames(): Seq[(String, Long)] = scan.listArchives()
    .map(s => (s.getPath.toString, s.getLen))

  private var availableNowCap: Option[String] = None

  // Late-arrival guard: the offset contract requires arrival-monotone
  // names, but nothing in a drop directory ENFORCES it — an archive
  // landing with a name inside an already-committed (start, end]
  // range would silently change a replayed batch (an exactly-once
  // violation), and a name below the watermark is skipped forever.
  // Each listing is therefore diffed against every name seen in any
  // EARLIER listing of this instance: a name at or below the
  // committed offset that was never listed before is a detected late
  // arrival (a name that was listed above the offset and then aged
  // below it as batches committed is the normal case, not late).
  // `onLateName=warn` (default) logs to stderr as a visible signal;
  // `onLateName=fail` kills the stream loudly — the right setting
  // for feeds that claim the monotone contract rather than merely
  // hoping for it. The first listing after a restart only baselines
  // (already-processed and late names are indistinguishable without
  // a side log — feeds that need that distinction need the file-log
  // decision path, row 9).
  private val onLateName =
    Option(options.get("onLateName")).getOrElse("warn")
  private var seenNames: Option[Set[String]] = None

  private def guardLateNames(listing: Seq[String], committed: String): Unit = {
    val all = listing.toSet
    seenNames match {
      case Some(seen) =>
        val late = all.filter(n => n <= committed && !seen.contains(n))
        if (late.nonEmpty) {
          val msg = s"graft-zip: ${late.size} archive(s) appeared at or " +
            s"below the committed offset '$committed' — late, non-monotone " +
            s"arrival(s) that this stream will NOT process: " +
            late.toSeq.sorted.mkString(", ")
          if (onLateName == "fail") throw new IllegalStateException(msg)
          System.err.println(s"WARN $msg")
        }
        seenNames = Some(seen ++ all)
      case None => seenNames = Some(all)
    }
  }

  override def prepareForTriggerAvailableNow(): Unit =
    // AvailableNow contract: fix the end of the world ONCE, so the
    // drain terminates even while new archives keep landing
    availableNowCap = Some(allNames().map(_._1).maxOption.getOrElse(""))

  override def initialOffset(): Offset = ZipOffset("")

  override def getDefaultReadLimit:
      org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    Option(options.get("maxFilesPerTrigger"))
      .map(n => ReadLimit.maxFiles(n.toInt))
      .getOrElse(ReadLimit.allAvailable())
  }

  /** Admission-controlled end offset: at most `maxFilesPerTrigger`
    * archives per micro-batch (the monthly replay can be sequenced
    * one archive per trigger, like the CDC stream's file drops),
    * never past the AvailableNow cap. */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles}
    val s = start.asInstanceOf[ZipOffset].lastName
    val listing = allNames().map(_._1)
    guardLateNames(listing, s)
    val names0 = listing.filter(_ > s).sorted
    val names = availableNowCap match {
      case Some(cap) => names0.filter(_ <= cap)
      case None => names0
    }
    val taken = limit match {
      case mf: ReadMaxFiles => names.take(mf.maxFiles())
      case _ => names
    }
    ZipOffset(taken.lastOption.getOrElse(s))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is used")
  override def deserializeOffset(json: String): Offset = ZipOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ZipOffset].lastName
    val e = end.asInstanceOf[ZipOffset].lastName
    allNames()
      .filter { case (n, _) => n > s && n <= e }
      .sortBy(_._1)
      .map { case (n, len) => ZipPartition(n, len): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scan.streamReaderFactory()
}

/** The offset: last processed archive name (names arrival-monotone),
  * HEX-armored in the checkpoint JSON — a path is arbitrary bytes
  * (newlines and quotes are legal POSIX filenames), and any
  * escape-based encoding eventually meets the character it forgot;
  * hex round-trips every name verbatim and keeps the offset a single
  * token a regex can parse after a restart. */
private[sources] case class ZipOffset(lastName: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val hex = lastName.getBytes("UTF-8").map(b => f"$b%02x").mkString
    s"""{"lastNameHex":"$hex"}"""
  }
}

private[sources] object ZipOffset {
  def fromJson(json: String): ZipOffset = {
    val m = """\{"lastNameHex":"([0-9a-f]*)"\}""".r
    json match {
      case m(v) =>
        ZipOffset(new String(
          v.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray, "UTF-8"))
      case _ => throw new IllegalArgumentException(s"bad zip offset: $json")
    }
  }
}

/** Tiny evaluator for the pushable string-predicate subset. */
private[sources] object ZipFilterEval {
  import org.apache.spark.sql.sources._
  def references(f: Filter, attr: String): Boolean = f.references.contains(attr)
  def matches(filters: Array[Filter], attr: String, value: String): Boolean =
    filters.filter(references(_, attr)).forall {
      case EqualTo(`attr`, v: String)    => value == v
      case StringStartsWith(`attr`, v)   => value.startsWith(v)
      case StringEndsWith(`attr`, v)     => value.endsWith(v)
      case StringContains(`attr`, v)     => value.contains(v)
      case _                             => true // unknown: let Spark decide
    }
}

private[sources] case class ZipPartition(path: String, len: Long)
    extends InputPartition

private[sources] case class ZipReaderFactory(
    fields: Array[String], maxEntryBytes: Long,
    conf: org.apache.spark.util.SerializableConfiguration,
    entryFilters: Array[org.apache.spark.sql.sources.Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ZipPartitionReader(partition.asInstanceOf[ZipPartition],
      fields, maxEntryBytes, conf.value, entryFilters)
}

/** Streams one archive PULL-BASED: one entry is processed per
  * `next()` call, so peak memory is one entry (or one 64 KB chunk
  * when `content` is pruned), never the decompressed archive — a
  * `LIMIT 1` stops after one entry. Payload work is demand-driven by
  * the pruned schema: `content` absent → bytes stream through an
  * incremental digest and are never retained; the zip-bomb cap and
  * `ok`/`err` stay FAITHFUL under any projection (the payload walk
  * also runs when `ok`/`err` are required, so pruning can never flip
  * a quarantine verdict — "pruning only changes IO" is a results
  * contract). A pruned-away entry is skipped without BUFFERING its
  * bytes.
  *
  * TWO read strategies, picked by whether the archive PARSES, not by
  * where it lives:
  *   - CENTRAL DIRECTORY (any scheme): [[SeekableZip]] reads the
  *     archive's table of contents from the file tail through
  *     Hadoop's seekable `FSDataInputStream` — entry names and
  *     declared sizes come from directory records, so a metadata
  *     census or a pushed entry-predicate miss inflates NOTHING, the
  *     zip-bomb verdict reads the declared size without touching
  *     entry data, and a consumed entry is reached by seek, never by
  *     inflating its predecessors. This is the one code path for
  *     `file:`, `hdfs:`, `s3a:`, and any other mounted scheme.
  *   - STREAMING FALLBACK: an archive whose central directory does
  *     not parse (garbage bytes, truncation, structural damage) is
  *     re-walked sequentially with `ZipInputStream` — reproducing
  *     the binaryFile plan's quarantine classification exactly
  *     (garbage → "no entries in archive", mid-stream damage →
  *     "unreadable archive").
  * Open/listing failures quarantine like corrupt bytes: a file
  * deleted between planning and read yields an `ok=false` row,
  * never a dead stream. */
private[sources] class ZipPartitionReader(
    part: ZipPartition, fields: Array[String], maxEntryBytes: Long,
    conf: org.apache.hadoop.conf.Configuration,
    entryFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends PartitionReader[InternalRow] {
  private val path = part.path
  private val needContent = fields.contains("content")
  private val needSha = fields.contains("sha256")
  private val needSize = fields.contains("n_bytes")
  // ok/err must be computed faithfully whenever observable, and Spark
  // includes filter references in the required columns — so the
  // payload walk runs for them too (it decides the oversize verdict)
  private val readPayload = needContent || needSha || needSize ||
    fields.contains("ok") || fields.contains("err")

  private var zin: ZipInputStream = null
  private var cdIter: Iterator[SeekableZip.CdEntry] = null
  private var seekIn: org.apache.hadoop.fs.FSDataInputStream = null
  private var openErr: String = null
  try {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    SeekableZip.centralDirectory(fs, p, part.len) match {
      case Some(entries) =>
        cdIter = entries.iterator
        seekIn = fs.open(p)
      case None =>
        zin = new ZipInputStream(new java.io.BufferedInputStream(fs.open(p)))
    }
  } catch { case ex: Exception =>
    openErr = s"unopenable archive: ${ex.getClass.getSimpleName}"
  }

  private var sawEntry = false
  private var finished = false
  private var current: InternalRow = _

  /** The capped payload walk shared by both strategies: stream the
    * entry through the optional buffer/digest, quarantining past the
    * byte cap. Closes nothing — the caller owns the stream. */
  private def readEntry(in: java.io.InputStream, name: String,
                        declared: Long): InternalRow = {
    val buf = if (needContent) new java.io.ByteArrayOutputStream() else null
    val md = if (needSha)
      java.security.MessageDigest.getInstance("SHA-256") else null
    val chunk = new Array[Byte](64 * 1024)
    var total = 0L
    var n = in.read(chunk)
    while (n >= 0 && total <= maxEntryBytes) {
      if (buf != null) buf.write(chunk, 0, n)
      if (md != null) md.update(chunk, 0, n)
      total += n; n = in.read(chunk)
    }
    if (total > maxEntryBytes)
      row(name, if (declared >= 0) declared else total, "",
        Array.emptyByteArray, ok = false, "entry exceeds maxEntryBytes")
    else {
      val sha = if (md != null) md.digest().map(x => f"$x%02x").mkString else ""
      row(name, total, sha,
        if (buf != null) buf.toByteArray else Array.emptyByteArray,
        ok = true, "")
    }
  }

  private def exhausted(): InternalRow = {
    finished = true
    if (!sawEntry)
      // archive-level quarantine reports the ARCHIVE size (the
      // ZipSource.entries convention). Keyed on sawEntry, not
      // emitted-row count: an archive whose entries were all
      // SKIPPED by a pushed predicate is healthy, and fabricating
      // a quarantine row would diverge from the unpushed plan
      row("", part.len, "", Array.emptyByteArray, ok = false,
        "no entries in archive")
    else null
  }

  /** Advance to the next emitted row; null when exhausted. One entry
    * per call — the pull contract. */
  private def fetch(): InternalRow = {
    if (finished) return null
    if (openErr != null) {
      finished = true
      return row("", part.len, "", Array.emptyByteArray, ok = false, openErr)
    }
    try {
      if (cdIter != null) {
        // central-directory walk: a non-matching or metadata-only
        // entry inflates NOTHING, on any filesystem scheme
        while (cdIter.hasNext) {
          val e = cdIter.next()
          if (!e.isDirectory) {
            sawEntry = true
            if (ZipFilterEval.matches(entryFilters, "entry", e.name)) {
              if (!readPayload)
                return row(e.name, 0L, "", Array.emptyByteArray, ok = true, "")
              if (e.uncompressedSize > maxEntryBytes)
                // declared-size verdict: the bomb is never inflated
                return row(e.name, e.uncompressedSize, "", Array.emptyByteArray,
                  ok = false, "entry exceeds maxEntryBytes")
              val in = SeekableZip.entryStream(seekIn, e)
              try return readEntry(in, e.name, e.uncompressedSize)
              finally in.close()
            }
          }
        }
        exhausted()
      } else {
        var e = zin.getNextEntry
        while (e != null) {
          if (!e.isDirectory) {
            sawEntry = true
            if (ZipFilterEval.matches(entryFilters, "entry", e.getName)) {
              if (!readPayload)
                return row(e.getName, 0L, "", Array.emptyByteArray, ok = true, "")
              return readEntry(zin, e.getName, e.getSize)
            }
          }
          e = zin.getNextEntry
        }
        exhausted()
      }
    } catch { case ex: Exception =>
      finished = true
      row("", part.len, "", Array.emptyByteArray, ok = false,
        s"unreadable archive: ${ex.getClass.getSimpleName}")
    }
  }

  private def row(entry: String, nBytes: Long, sha: String,
                  content: Array[Byte], ok: Boolean, err: String): InternalRow = {
    val values: Array[Any] = fields.map {
      case "archive" => UTF8String.fromString(path)
      case "entry"   => UTF8String.fromString(entry)
      case "n_bytes" => nBytes
      case "sha256"  => UTF8String.fromString(sha)
      case "content" => content
      case "ok"      => ok
      case "err"     => UTF8String.fromString(err)
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def next(): Boolean = {
    current = fetch()
    current != null
  }
  override def get(): InternalRow = current
  override def close(): Unit = {
    if (zin != null) zin.close()
    if (seekIn != null) seekIn.close()
  }
}
