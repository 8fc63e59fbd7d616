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
  * PERSISTENCE: a registration is TABLE metadata, not process state.
  * It lives as one small file per registration under
  * `basePath/_views/<name>` (the `_constraints` idiom —
  * [[graft.sources.Constraints]]; a table may carry SEVERAL views at
  * different grains), so registrations survive JVM restarts and arm
  * EVERY session's reads: the rewrite rule resolves them through
  * [[lookupAll]], which reloads a file whenever its (mtime, length)
  * changes and otherwise serves a per-JVM cache. The maintainer's
  * per-fold [[advance]] rewrites its file in place
  * (staged-then-rename — a reader racing the swap sees "no
  * registration" for an instant and simply reads the base).
  *
  * REGISTRATION CONTRACT (what the rewrite's correctness rests on):
  *   - the view holds exactly one row per live group — NO empty
  *     groups: a base GROUP BY emits no row for a group whose rows
  *     were all deleted, so a view retaining (count = 0) groups would
  *     produce phantom rows in rewritten results. [[register]] probes
  *     the count column for `<= 0` rows and refuses; [[advance]]
  *     trusts the maintainer (FeedView filters `n_live > 0` on every
  *     fold) and stays O(1).
  *   - a `sums` column is NULL exactly when the group has no non-null
  *     operand rows (base SUM semantics); its paired `counts` column
  *     holds the per-group NON-NULL operand count — together these
  *     make `sum`, `count(col)` and `avg` exactly derivable under
  *     deletes, all-null groups included.
  *   - a `mins`/`maxs` column holds the per-group MIN/MAX of its
  *     operand at the operand's own type, NULL exactly when the group
  *     has no non-null operand rows. Deletes break the signed-delta
  *     algebra for extremes, so the maintainer owns the repair: when a
  *     retirement touches a group's stored extremum, THAT group
  *     recomputes from the base (O(affected groups) — the FeedView
  *     fold's dirty-group pass).
  *
  * Matching is NAME-normalized structural equality: expressions are
  * compared with attribute references reduced to their lower-cased
  * column name ([[MatViews.normalize]]), so the registration's
  * `trunc(col("d"), "month")` matches a query's `trunc(d, 'month')`
  * regardless of resolution-time expression ids. Best-effort by
  * design (the property every MV-rewrite engine shares): an
  * expression written differently simply reads the base table — the
  * rewrite is an optimization, never a correctness dependency. */
object MatViews extends org.apache.spark.internal.Logging {

  /** One registered column binding: the view column's name, the base
    * expression it reflects as resolved SQL (the persisted form), and
    * the name-normalized expression the rewrite matches on.
    *
    * `norm` is LAZY for persisted registrations: resolving the SQL
    * re-analyzes it against the base table's CURRENT schema, which can
    * legitimately fail after a supported schema evolution renamed or
    * dropped a bound column — but an evolution also advanced the
    * table's version, so such a registration is STALE and the rewrite
    * never needs its bindings. Deferring resolution until after the
    * freshness check (plus the NonFatal guard in [[MatViewRewrite]])
    * keeps the documented contract: a registration is an optimization,
    * never something a base query can fail on. A failed resolution is
    * not cached — the next access retries (lazy-val semantics). */
  final class Binding private (val viewCol: String, val sql: String,
                               resolve: () => Expression) {
    lazy val norm: Expression = resolve()
  }

  object Binding {
    /** Eager binding (the register path): resolution failures surface
      * immediately at the registration boundary, where they belong. */
    def apply(viewCol: String, sql: String, norm: Expression): Binding = {
      val n = norm
      new Binding(viewCol, sql, () => n)
    }

    /** Deferred binding (the persisted-lookup path): resolution waits
      * until the rewrite actually needs the normalized expression. */
    def deferred(viewCol: String, sql: String, resolve: () => Expression): Binding =
      new Binding(viewCol, sql, resolve)
  }

  /** One registered view: the maintained aggregate of `basePath`'s
    * live state as of `asOfVersion`, stored at `viewPath`, with
    * grain `groups`, `countCol` holding per-group live-row counts,
    * `sums` (view column → base sum operand), `counts` (view
    * column → base operand whose per-group NON-NULL count it holds —
    * the piece that makes `avg`/`count(col)` derivable), and
    * `mins`/`maxs` (view column → base operand whose per-group
    * MIN/MAX it holds — maintainable under deletes because the
    * maintainer recomputes a group from the base when a retirement
    * touches its stored extremum; see
    * [[graft.streaming.FeedView]]). `name` distinguishes
    * registrations when a table carries SEVERAL views at different
    * grains (one `_views/<name>` file each). */
  final case class MatViewDef(
      basePath: String,
      name: String,
      viewPath: String,
      asOfVersion: Long,
      groups: Seq[Binding],
      countCol: Option[String],
      sums: Seq[Binding],
      counts: Seq[Binding],
      mins: Seq[Binding] = Nil,
      maxs: Seq[Binding] = Nil)

  /** The unnamed-registration name — what single-view callers (the
    * feed maintainer, the plain procedure spelling) read and write. */
  val defaultName = "registration"
  private val dirName = "_views"
  private val nameRe = "[A-Za-z0-9_]{1,64}".r

  /** (mtime, length) of a registration file when the cached def was
    * parsed — the staleness key, per (base, name). [[persist]] pads
    * every swap to be strictly longer than the file it replaces, so
    * persisted lengths grow monotonically and a stale cached stamp
    * (however old) can never match a newer file — discrimination
    * never rests on mtime granularity alone. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, ((Long, Long), MatViewDef)]()

  private def cacheKey(basePath: String, name: String) = s"$basePath\u0000$name"

  private[plans] def canonPath(p: String): String =
    p.replaceAll("/+$", "")

  private def regFile(basePath: String, name: String) =
    new org.apache.hadoop.fs.Path(canonPath(basePath), s"$dirName/$name")

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

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

  private def binding(spark: SparkSession, basePath: String,
                      vc: String, c: Column): Binding = {
    val r = resolved(spark, basePath, c)
    val sql = r.sql
    require(!sql.exists(ch => ch == '\t' || ch == '\n' || ch == '\r'),
      s"mat-view registration expression for '$vc' serializes with control " +
      s"characters — not persistable: $sql")
    Binding(vc.toLowerCase(Locale.ROOT), sql, normalize(r))
  }

  private def serialize(d: MatViewDef): String = {
    val sb = new StringBuilder
    sb ++= "v1\n"
    sb ++= s"view\t${d.viewPath}\n"
    sb ++= s"version\t${d.asOfVersion}\n"
    d.groups.foreach(b => sb ++= s"group\t${b.viewCol}\t${b.sql}\n")
    d.countCol.foreach(c => sb ++= s"count_star\t$c\n")
    d.sums.foreach(b => sb ++= s"sum\t${b.viewCol}\t${b.sql}\n")
    d.counts.foreach(b => sb ++= s"count\t${b.viewCol}\t${b.sql}\n")
    d.mins.foreach(b => sb ++= s"min\t${b.viewCol}\t${b.sql}\n")
    d.maxs.foreach(b => sb ++= s"max\t${b.viewCol}\t${b.sql}\n")
    sb.result()
  }

  private def deserialize(spark: SparkSession, basePath: String, name: String,
                          content: String): MatViewDef = {
    var viewPath: Option[String] = None
    var version: Option[Long] = None
    val groups = Seq.newBuilder[Binding]
    val sums = Seq.newBuilder[Binding]
    val counts = Seq.newBuilder[Binding]
    val mins = Seq.newBuilder[Binding]
    val maxs = Seq.newBuilder[Binding]
    var countCol: Option[String] = None
    // DEFERRED bindings: the persisted SQL is NOT re-analyzed here.
    // Deserialization runs inside the optimizer (lookup), where a
    // resolution failure against an evolved schema must never break
    // the query — the norm resolves lazily, after the freshness check,
    // under MatViewRewrite's NonFatal guard.
    def bind(parts: Array[String]): Binding =
      Binding.deferred(parts(1).toLowerCase(Locale.ROOT), parts(2),
        () => normalize(resolved(SparkSession.active, basePath,
          org.apache.spark.sql.functions.expr(parts(2)))))
    val lines = content.split("\n").toSeq
      .filter(l => l.nonEmpty && !l.startsWith("#")) // "#" = stamp padding
    require(lines.headOption.contains("v1"),
      s"unrecognized mat-view registration format at $basePath/$dirName/$name " +
      s"— first line '${lines.headOption.getOrElse("")}' (expected 'v1')")
    lines.tail.foreach { line =>
      val parts = line.split("\t", 3)
      parts(0) match {
        case "view"       => viewPath = Some(parts(1))
        case "version"    => version = Some(parts(1).toLong)
        case "group"      => groups += bind(parts)
        case "count_star" => countCol = Some(parts(1))
        case "sum"        => sums += bind(parts)
        case "count"      => counts += bind(parts)
        case "min"        => mins += bind(parts)
        case "max"        => maxs += bind(parts)
        case other => throw new IllegalArgumentException(
          s"unrecognized mat-view registration entry '$other' at $basePath")
      }
    }
    MatViewDef(canonPath(basePath), name,
      viewPath.getOrElse(throw new IllegalArgumentException(
        s"mat-view registration at $basePath has no view path")),
      version.getOrElse(throw new IllegalArgumentException(
        s"mat-view registration at $basePath has no version")),
      groups.result(), countCol, sums.result(), counts.result(),
      mins.result(), maxs.result())
  }

  /** Staged-write-then-swap of a registration file. The instant
    * between delete and rename reads as "no registration" — a racing
    * query then takes the base scan, which is always correct.
    *
    * The cache staleness key is (mtime, length), and consecutive
    * advance states routinely serialize to the SAME length (fixed-width
    * version digits), which would leave discrimination to mtime
    * granularity alone. So the written file is padded with a `#`
    * comment line (deserialize skips `#` lines) to be STRICTLY LONGER
    * than the one it replaces whenever the natural content isn't:
    * persisted lengths grow monotonically, so no later state can ever
    * re-collide with ANY earlier cached stamp — not just the immediate
    * predecessor's. */
  private def persist(spark: SparkSession, d: MatViewDef): Unit = {
    val file = regFile(d.basePath, d.name)
    val fs = fsOf(spark, file)
    val dir = file.getParent
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val prevLen: Option[Long] =
      try Some(fs.getFileStatus(file).getLen)
      catch { case _: java.io.FileNotFoundException => None }
    var bytes = serialize(d).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // pad to STRICTLY LONGER than the replaced file (not merely
    // different): equal-pad would let lengths alternate L, L+k, L and
    // re-collide with a reader's two-states-old cached stamp —
    // monotonic growth can never revisit an earlier length
    prevLen.filter(_ >= bytes.length).foreach { pl =>
      bytes = bytes ++ ("#" * (pl - bytes.length + 1).toInt)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    val staged = new org.apache.hadoop.fs.Path(dir, s".staged_${d.name}")
    val out = fs.create(staged, true)
    try out.write(bytes)
    finally out.close()
    if (fs.exists(file)) fs.delete(file, false)
    if (!fs.rename(staged, file)) throw new java.io.IOException(
      s"mat-view registration swap failed at $file")
    val st = fs.getFileStatus(file)
    cache.put(cacheKey(d.basePath, d.name), ((st.getModificationTime, st.getLen), d))
  }

  /** Register `viewPath` as the maintained aggregate of `basePath`'s
    * state at `asOfVersion`. `groups` maps each view grain column to
    * the base expression it was grouped by; `countCol` names the view
    * column holding `count(*)` per group (if maintained); `sums` maps
    * view columns to the base expressions they sum; `counts` maps
    * view columns to base expressions whose per-group NON-NULL counts
    * they hold (enables `count(col)` and, paired with the matching
    * sum, exact `avg`). A table may carry SEVERAL registrations at
    * different grains — `name` distinguishes them (one
    * `_views/<name>` file each; the rewrite tries every fresh one);
    * re-registering a (base, name) replaces that definition. The
    * registration persists under the TABLE, so it survives JVM
    * restarts and arms every session that reads the store. */
  def register(spark: SparkSession, basePath: String, viewPath: String,
               asOfVersion: Long, groups: Seq[(String, Column)],
               countCol: Option[String] = None,
               sums: Seq[(String, Column)] = Nil,
               counts: Seq[(String, Column)] = Nil,
               name: String = defaultName,
               mins: Seq[(String, Column)] = Nil,
               maxs: Seq[(String, Column)] = Nil): Unit = {
    require(groups.nonEmpty || countCol.isDefined || sums.nonEmpty,
      "a mat-view registration needs at least one grain column or aggregate")
    require(nameRe.pattern.matcher(name).matches(),
      s"mat-view name '$name' must match ${nameRe.pattern} — it becomes a file name")
    val d = MatViewDef(
      canonPath(basePath), name, viewPath, asOfVersion,
      groups.map { case (vc, c) => binding(spark, basePath, vc, c) },
      countCol.map(_.toLowerCase(Locale.ROOT)),
      sums.map { case (vc, c) => binding(spark, basePath, vc, c) },
      counts.map { case (vc, c) => binding(spark, basePath, vc, c) },
      mins.map { case (vc, c) => binding(spark, basePath, vc, c) },
      maxs.map { case (vc, c) => binding(spark, basePath, vc, c) })
    // the no-empty-groups contract, probed at the register boundary:
    // a view row with a non-positive live count would surface groups
    // the base GROUP BY never emits. One small read of a groups-sized
    // parquet — advance() (the per-fold hot path) skips it.
    d.countCol.foreach { cc =>
      import org.apache.spark.sql.functions.col
      val empty = spark.read.parquet(viewPath).filter(col(cc) <= 0).limit(1).count()
      if (empty > 0) throw new IllegalArgumentException(
        s"refusing mat-view registration for $basePath: view $viewPath retains " +
        s"group rows with $cc <= 0 — a base GROUP BY emits no row for an empty " +
        "group, so the rewrite would produce phantom rows. Filter empty groups " +
        "out of the maintained view (the FeedView fold's n_live > 0 filter)")
    }
    persist(spark, d)
  }

  /** Re-point an existing registration at a newer maintained state —
    * what a continuously-running view maintainer calls after each
    * fold, so the rewrite stays LIVE as the source commits (between a
    * source commit and its fold the version check makes the view
    * stale and queries read the base; the advance re-arms it).
    * Returns false when no registration exists for the base. */
  def advance(spark: SparkSession, basePath: String, viewPath: String,
              asOfVersion: Long, name: String = defaultName): Boolean =
    lookup(spark, basePath, name) match {
      case Some(d) =>
        persist(spark, d.copy(viewPath = viewPath, asOfVersion = asOfVersion))
        true
      case None => false
    }

  /** Remove ONE named registration (file + cache); subsequent
    * aggregates that matched it read the base again. Idempotent. */
  def unregister(basePath: String, name: String): Unit = {
    val key = canonPath(basePath)
    val file = regFile(key, name)
    val fs = fsOf(SparkSession.active, file)
    if (fs.exists(file)) fs.delete(file, false)
    cache.remove(cacheKey(key, name))
    ()
  }

  /** Remove ALL of the store's registrations. Idempotent. */
  def unregister(basePath: String): Unit = {
    val key = canonPath(basePath)
    val dir = new org.apache.hadoop.fs.Path(key, dirName)
    val fs = fsOf(SparkSession.active, dir)
    if (fs.exists(dir)) fs.delete(dir, true)
    val prefix = cacheKey(key, "")
    cache.keySet().removeIf(_.startsWith(prefix))
    ()
  }

  /** Drop the per-JVM cache only — persisted registrations re-arm on
    * the next lookup. Test hygiene, not an unregister. */
  def clear(): Unit = cache.clear()

  /** One named registration of `basePath`, resolved THROUGH the
    * table's metadata: one getFileStatus per call (absent → None),
    * the parsed definition cached per-JVM on the file's (mtime,
    * length). This is what lets a registration made by another
    * session — or a previous run of this one — arm this session's
    * reads. */
  private[graft] def lookup(spark: SparkSession, basePath: String,
                            name: String = defaultName): Option[MatViewDef] = {
    val key = canonPath(basePath)
    val file = regFile(key, name)
    val fs = fsOf(spark, file)
    val st =
      try Some(fs.getFileStatus(file))
      catch { case _: java.io.FileNotFoundException => None }
    st match {
      case None =>
        cache.remove(cacheKey(key, name))
        None
      case Some(s) =>
        val stamp = (s.getModificationTime, s.getLen)
        Option(cache.get(cacheKey(key, name))) match {
          case Some((cached, d)) if cached == stamp => Some(d)
          case _ =>
            val in = fs.open(file)
            val content =
              try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
                java.nio.charset.StandardCharsets.UTF_8)
              finally in.close()
            val d = deserialize(spark, key, name, content)
            cache.put(cacheKey(key, name), (stamp, d))
            Some(d)
        }
    }
  }

  /** ALL registrations arming `basePath`, name-sorted (the rewrite's
    * deterministic trial order): one directory listing, then the
    * per-file cache above. Staged swap files (dot-prefixed) are
    * invisible, and an UNREADABLE file (corrupt content, a foreign
    * file that happens to match the name pattern, a racing writer's
    * torn state) is SKIPPED with a warning rather than thrown: this
    * runs inside the optimizer, where a bad registration must degrade
    * to "no rewrite", never break the query. */
  private[graft] def lookupAll(spark: SparkSession, basePath: String): Seq[MatViewDef] = {
    val key = canonPath(basePath)
    val dir = new org.apache.hadoop.fs.Path(key, dirName)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.map(_.getPath.getName).sorted
      .filter(n => nameRe.pattern.matcher(n).matches())
      .flatMap { n =>
        try lookup(spark, key, n)
        catch {
          case scala.util.control.NonFatal(e) =>
            logWarning(s"skipping unreadable mat-view registration '$n' at $key " +
              s"(queries fall back to the base read): $e")
            None
        }
      }
  }
}
