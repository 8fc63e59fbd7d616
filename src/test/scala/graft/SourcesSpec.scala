package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.PricePaidCsv
import graft.multimodal.Media

/** The reference's real input format (price-paid CSV) and the
  * multimodal binary-column plumbing. */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def writeSample(): String = {
    val dir = Files.createTempDirectory("ppcsv").toFile
    val f = new java.io.File(dir, "pp-monthly-update.txt")
    // shape of a real pp-monthly-update row (all fields quoted, no header)
    val rows = Seq(
      """"{8C16F3A0-0001-4D45-E053-6B04A8C0F3A0}","250000","2024-01-15 00:00","SW1A 1AA","F","N","L","10","FLAT 2","DOWNING STREET","","LONDON","WESTMINSTER","GREATER LONDON","A","A"""",
      """"{8C16F3A0-0002-4D45-E053-6B04A8C0F3A0}","185000","2024-02-01 00:00","M1 2AB","T","Y","F","22","","OXFORD ROAD","","MANCHESTER","MANCHESTER","GREATER MANCHESTER","B","C"""",
      """"{8C16F3A0-0003-4D45-E053-6B04A8C0F3A0}","99950","2024-02-20 00:00","LS1 4HT","S","N","F","5","","BRIGGATE","","LEEDS","LEEDS","WEST YORKSHIRE","A","D"""")
    Files.write(f.toPath, rows.mkString("\n").getBytes("UTF-8"))
    f.getAbsolutePath
  }

  test("price-paid csv reads headerless quoted rows with the reference schema") {
    val df = PricePaidCsv.read(spark, writeSample())
    assert(df.columns.take(16).toSeq === PricePaidCsv.columns)
    assert(df.count() === 3)
    val r = df.orderBy("transaction_unique_id").head()
    assert(r.getAs[Long]("price") === 250000L)
    assert(r.getAs[String]("postcode") === "SW1A 1AA")
    assert(r.getAs[String]("record_op") === "A")
  }

  test("normalized parses dates and uppercases categoricals; ops are A/C/D") {
    val df = PricePaidCsv.normalized(spark, writeSample())
    assert(df.filter(col("transaction_date").isNull).count() === 0)
    val ops = df.select("record_op").as[String].collect().toSet
    assert(ops === Set("A", "C", "D"))
    assert(df.schema("transaction_date").dataType.typeName === "date")
  }

  test("15-column historical layout (no ppd_cat) normalizes to the same schema") {
    val dir = Files.createTempDirectory("ppold").toFile
    val f = new java.io.File(dir, "pp-monthly-update-historical.txt")
    // same rows as writeSample() minus the ppd_cat field
    val rows = Seq(
      """"{8C16F3A0-0001-4D45-E053-6B04A8C0F3A0}","250000","2024-01-15 00:00","SW1A 1AA","F","N","L","10","FLAT 2","DOWNING STREET","","LONDON","WESTMINSTER","GREATER LONDON","A"""",
      """"{8C16F3A0-0002-4D45-E053-6B04A8C0F3A0}","185000","2024-02-01 00:00","M1 2AB","T","Y","F","22","","OXFORD ROAD","","MANCHESTER","MANCHESTER","GREATER MANCHESTER","C"""")
    Files.write(f.toPath, rows.mkString("\n").getBytes("UTF-8"))
    // cache: count() after the corrupt-filter would otherwise prune to
    // a corrupt-column-only CSV query, which Spark disallows
    val old = PricePaidCsv.normalized(spark, f.getAbsolutePath, hasPpdCat = false).cache()
    val modern = PricePaidCsv.normalized(spark, writeSample()).cache()
    // identical normalized schema → mixed-era backfills union cleanly
    assert(old.schema === modern.schema)
    assert(old.count() === 2)
    val r = old.orderBy("transaction_unique_id").head()
    assert(r.getAs[Long]("price") === 250000L)
    assert(r.getAs[String]("record_op") === "A")
    assert(r.getAs[String]("ppd_cat") === null)
    assert(old.unionByName(modern).count() === 5)
  }

  test("corrupt csv rows are quarantined, not fatal") {
    val dir = Files.createTempDirectory("ppbad").toFile
    val f = new java.io.File(dir, "pp.txt")
    Files.write(f.toPath, Seq(
      """"{T1}","100000","2024-01-01 00:00","PC1","F","N","L","1","","S","","T","D","C","A","A"""",
      """"{T2}","NOT_A_NUMBER","2024-01-01 00:00","PC1","F","N","L","1","","S","","T","D","C","A","A""""
    ).mkString("\n").getBytes("UTF-8"))
    // cache before filtering on the corrupt column alone — Spark
    // disallows corrupt-column-only queries on raw CSV scans
    val raw = PricePaidCsv.read(spark, f.getAbsolutePath).cache()
    assert(raw.count() === 2)
    assert(raw.filter(col("_corrupt").isNotNull).count() === 1)
    val clean = PricePaidCsv.normalized(spark, f.getAbsolutePath)
    assert(clean.count() === 1)
    assert(clean.head().getAs[String]("transaction_unique_id") === "{T1}")
  }

  test("scene cuts recover exactly the planted shot boundaries; motion is silent") {
    val ids = Seq(3L, 6L, 7L, 11L)
    val clips = ids.map(id => (id, "video", Media.syntheticShotGif(id)))
      .toDF("media_id", "kind", "payload")
    val cuts = Media.sceneCutsOf(clips).collect()
      .groupBy(_.media_id)
    for (id <- ids) {
      val shots = Media.shotsFor(id)
      val fps = Media.framesPerShot
      // planted boundaries: first frame of every shot after the first
      val expected = (1 until shots).map(s => (s * fps).toLong).toSet
      val got = cuts(id).filter(_.is_cut).map(_.frame_idx).toSet
      assert(got === expected, s"clip $id: cuts $got, planted $expected")
      // within-shot transitions exist and score (near) zero: the
      // histogram is position-blind, so pure motion cannot alarm
      val quiet = cuts(id).filter(c => !expected.contains(c.frame_idx))
      assert(quiet.nonEmpty && quiet.forall(_.dist_ppm < 50000L),
        s"clip $id: motion frames not quiet: ${quiet.mkString(",")}")
      // and a corrupt payload contributes nothing rather than failing
    }
    val bad = Seq((99L, "video", Array[Byte](1, 2, 3)))
      .toDF("media_id", "kind", "payload")
    assert(Media.sceneCutsOf(bad).count() === 0)
    // per-shot sampling: exactly one representative frame per planted
    // shot, each inside its shot's frame range
    val reps = Media.shotRepresentativeFrames(clips).collect()
      .groupBy(_.getLong(0))
    for (id <- ids) {
      val fps = Media.framesPerShot
      val r = reps(id).sortBy(_.getLong(1))
      assert(r.length === Media.shotsFor(id), s"clip $id shot count")
      r.zipWithIndex.foreach { case (row, s) =>
        val (start, len, rep) = (row.getLong(2), row.getLong(3), row.getLong(4))
        assert(start === s * fps && len === fps, s"clip $id shot $s bounds")
        assert(rep >= start && rep < start + len, s"clip $id shot $s rep")
      }
    }
  }

  test("media table carries binary payloads with kinds; decode emits typed metadata") {
    val m = Media.mediaTable(spark, sf)
    assert(m.schema("payload").dataType.typeName === "binary")
    val meta = Media.decodeMeta(m)
    val rows = meta.collect()
    assert(rows.length === m.count())
    assert(rows.forall(_.n_bytes > 0))
    assert(rows.filter(_.kind == "image").forall(r => r.width >= 16 && r.height >= 16))
    assert(rows.filter(_.kind == "audio").forall(_.sample_rate > 0))
    assert(rows.filter(_.kind == "video").forall(_.n_frames >= 1))
  }

  test("image resize fits the box, preserves aspect ratio, and shrinks payloads") {
    val resized = Media.resizeImages(Media.mediaTable(spark, sf), maxSide = 64).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(math.max(r.width, r.height) <= 64, s"${r.media_id} exceeds the box")
      assert(r.width >= 1 && r.height >= 1)
      // aspect ratio preserved within integer rounding
      val srcRatio = r.src_width.toDouble / r.src_height
      val dstRatio = r.width.toDouble / r.height
      assert(math.abs(srcRatio - dstRatio) / srcRatio < 0.1,
        s"${r.media_id}: ratio $srcRatio -> $dstRatio")
      assert(r.payload.length >= 1)
    }
    // an image already inside the box is untouched
    val big = Media.resizeImages(Media.mediaTable(spark, sf), maxSide = 8192).collect()
    assert(big.forall(r => r.width == r.src_width && r.height == r.src_height))
  }

  test("perceptual dedup: band search is EXACT vs brute force; planted pairs survive") {
    val table = Media.imageTableWithNearDups(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
    val off = docs.agg(org.apache.spark.sql.functions.max(col("doc_id")))
      .head().getLong(0) + 1L
    val plantedIds = docs.filter(col("doc_id") % 24 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val hashes = Media.imageHashes(table).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Media.imageNearDupOf(table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val found = pairs.map(p => (p._1, p._2)).toSet
    // the multi-index search equals brute force over the same hashes —
    // the pigeonhole completeness claim, checked pair-exhaustively
    val ids = hashes.keys.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      if java.lang.Long.bitCount(hashes(i) ^ hashes(j)) <= 7
    } yield (i, j)).toSet
    assert(found === brute)
    // the perturbation is perceptually mild: most planted copies stay
    // inside the Hamming budget and are therefore recovered
    val within = plantedIds.filter(id =>
      java.lang.Long.bitCount(hashes(id) ^ hashes(id + off)) <= 7)
    assert(within.size * 10 >= plantedIds.size * 7,
      s"only ${within.size}/${plantedIds.size} planted pairs within budget")
    within.foreach(id => assert(found.contains((id, id + off))))
    // dHash is deterministic: rebuilding the table reproduces the pairs
    val again = Media.imageNearDupOf(Media.imageTableWithNearDups(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === again.toSeq)
    // distinct source images don't collapse wholesale: pairs stay rare
    val nImages = table.count()
    assert(pairs.length < nImages, s"${pairs.length} pairs from $nImages images")
  }

  test("hamming band search equals brute force on random hashes, any threshold") {
    // the pigeonhole completeness claim over arbitrary inputs, not
    // just the planted media fixtures: random 64-bit hashes plus
    // planted near-neighbors at every distance 0..7 (pure-random
    // pairs almost never land within 7 bits, so without planting the
    // sweep would verify an empty set)
    val rnd = new scala.util.Random(20260813)
    val base = Seq.tabulate(120)(i => (i.toLong, rnd.nextLong()))
    val planted = (0 to 7).map { d =>
      val (srcId, h) = base(rnd.nextInt(base.length))
      // flip exactly d distinct bit positions
      val bits = rnd.shuffle((0 until 64).toList).take(d)
      (srcId, 1000L + d, d, bits.foldLeft(h)((acc, b) => acc ^ (1L << b)))
    }
    val all = base ++ planted.map(p => (p._2, p._4))
    val df = all.toDF("id", "hash").withColumn("part", lit(0))
      .select(col("id"), col("part"), col("hash"))
    for (t <- Seq(0, 3, 7)) {
      val got = Media.hammingBandPairs(df, maxHamming = t)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = (for {
        (ia, ha) <- all; (ib, hb) <- all if ia < ib
        if java.lang.Long.bitCount(ha ^ hb) <= t
      } yield (ia, ib)).toSet
      assert(got === brute, s"mismatch at maxHamming=$t")
      // every planted neighbor at distance ≤ t is in the verified set
      planted.filter(_._3 <= t).foreach { case (src, pid, d, _) =>
        assert(brute.contains((src, pid)), s"planted d=$d pair missing at t=$t")
      }
    }
  }

  test("audio dedup: band search exact vs brute force; volume-dropped copies recovered") {
    val table = Media.audioTableWithNearDups(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
    val off = docs.agg(org.apache.spark.sql.functions.max(col("doc_id")))
      .head().getLong(0) + 1L
    val plantedIds = docs.filter(col("doc_id") % 24 === 1)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val prints = Media.audioFingerprints(table).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Media.audioNearDupOf(table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val found = pairs.map(p => (p._1, p._2)).toSet
    // completeness: the band search equals brute force over the prints
    val ids = prints.keys.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      if java.lang.Long.bitCount(prints(i) ^ prints(j)) <= 7
    } yield (i, j)).toSet
    assert(found === brute)
    // the 80%-volume + sub-threshold-noise copy keeps its profile:
    // every planted pair stays within the Hamming budget (the margin
    // absorbs crossing-migration at window edges) and is recovered
    plantedIds.foreach { id =>
      val d = java.lang.Long.bitCount(prints(id) ^ prints(id + off))
      assert(d <= 7, s"planted audio pair $id drifted to Hamming $d")
      assert(found.contains((id, id + off)))
    }
    // distinct melodies don't collapse wholesale
    assert(pairs.length < prints.size, s"${pairs.length} pairs from ${prints.size} clips")
  }

  test("video dedup: frame-aligned overlap recovers filter-passed copies") {
    val table = Media.videoTableWithNearDups(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
    val off = docs.agg(org.apache.spark.sql.functions.max(col("doc_id")))
      .head().getLong(0) + 1L
    val plantedIds = docs.filter(col("doc_id") % 24 === 2)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val pairs = Media.videoNearDupOf(table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val found = pairs.map(p => (p._1, p._2)).toSet
    // every brightness-lifted whole-clip copy is recovered, with full
    // frame counts on both sides (the copy has the same frame count)
    plantedIds.foreach { id =>
      assert(found.contains((id, id + off)), s"planted clip pair ($id, ${id + off}) missed")
    }
    pairs.filter(p => plantedIds.contains(p._1) && p._2 == p._1 + off).foreach { p =>
      assert(p._3 * 100 >= p._4 * 60, s"pair $p under the overlap floor")
    }
    // distinct clips (different moving-block trajectories) stay apart
    val nClips = table.count()
    assert(pairs.length < nClips, s"${pairs.length} pairs from $nClips clips")
  }

  test("versioned snapshot publish: a reader resolved before the swap is undisturbed") {
    import graft.sources.Sinks
    val table = Files.createTempDirectory("vsnap").toString + "/t"
    val d1 = Seq(("A", 1L, java.sql.Date.valueOf("2024-01-15")),
                 ("B", 2L, java.sql.Date.valueOf("2024-02-15")))
      .toDF("k", "price", "transaction_date")
    val d2 = Seq(("A", 10L, java.sql.Date.valueOf("2024-01-15")))
      .toDF("k", "price", "transaction_date")
    assert(Sinks.publishSnapshot(d1, "transaction_date", table) === 1L)
    assert(Sinks.currentVersion(spark, table) === Some(1L))
    // a reader that resolved the manifest BEFORE the swap: its plan is
    // pinned to the immutable v1 dir
    val pinned = Sinks.readSnapshot(spark, table)
    assert(Sinks.publishSnapshot(d2, "transaction_date", table) === 2L)
    // the pre-swap reader still sees ALL of v1 (never half-old/half-new,
    // never a missing path — the transactional-visibility contract)
    assert(pinned.select("k", "price").as[(String, Long)].collect().toSet
      === Set(("A", 1L), ("B", 2L)))
    // a post-swap reader resolves v2
    assert(Sinks.readSnapshot(spark, table).count() === 1L)
    // retention: v1 kept as the grace window, pruned after the NEXT publish
    val root = new java.io.File(table)
    assert(root.listFiles().map(_.getName).count(_.matches("v\\d{8}")) === 2)
    assert(Sinks.publishSnapshot(d1, "transaction_date", table) === 3L)
    val dirs = root.listFiles().map(_.getName).filter(_.matches("v\\d{8}")).toSet
    assert(dirs === Set("v00000002", "v00000003"))
  }

  test("group publish: a member advancing alone never moves the committed vector") {
    import graft.sources.Sinks
    val root = Files.createTempDirectory("vgroup").toString
    val (grp, ta, tb) = (s"$root/grp", s"$root/a", s"$root/b")
    def df(v: Long) = Seq((v, java.sql.Date.valueOf("2024-01-15")))
      .toDF("val", "transaction_date")
    val v1 = Sinks.publishGroup(Seq((ta, df(1), "transaction_date"),
      (tb, df(2), "transaction_date")), grp)
    assert(v1 === Map(ta -> 1L, tb -> 2L) || v1 === Map(ta -> 1L, tb -> 1L))
    assert(Sinks.currentGroup(spark, grp) === v1)
    // the crash window: table a commits a member version, no group marker
    Sinks.publishSnapshot(df(99), "transaction_date", ta)
    // the table's OWN readers see the new version (single-table truth)…
    assert(Sinks.readSnapshot(spark, ta).select("val").as[Long].head() === 99L)
    // …but the GROUP still serves the committed pair, both tables
    assert(Sinks.currentGroup(spark, grp) === v1)
    assert(Sinks.readGroupTable(spark, grp, ta).select("val").as[Long].head() === 1L)
    assert(Sinks.readGroupTable(spark, grp, tb).select("val").as[Long].head() === 2L)
    // the next full group commit advances both atomically
    val v2 = Sinks.publishGroup(Seq((ta, df(10), "transaction_date"),
      (tb, df(20), "transaction_date")), grp)
    assert(Sinks.readGroupTable(spark, grp, ta).select("val").as[Long].head() === 10L)
    assert(Sinks.readGroupTable(spark, grp, tb).select("val").as[Long].head() === 20L)
    assert(v2(ta) > v1(ta) && v2(tb) > v1(tb))
    // a non-member path refuses instead of guessing a version
    intercept[java.io.FileNotFoundException] {
      Sinks.readGroupTable(spark, grp, s"$root/nope")
    }
    // staged tmp markers never linger; group retention bounds markers
    val cdir = new java.io.File(s"$grp/_commits")
    assert(cdir.listFiles().map(_.getName).count(_.startsWith(".tmp")) === 0)
    assert(cdir.listFiles().map(_.getName).count(_.matches("g\\d{8}")) === 2)
  }

  test("group store random walk: committed vectors always serve; pruned references refuse loudly") {
    import graft.sources.Sinks
    val rnd = new scala.util.Random(20260814L)
    val root = Files.createTempDirectory("vgroupwalk").toString
    val (grp, ta, tb) = (s"$root/grp", s"$root/a", s"$root/b")
    def df(v: Long) = Seq((v, java.sql.Date.valueOf("2024-01-15")))
      .toDF("val", "transaction_date")
    // plain-Scala model: the live group vector (version, value) per
    // table, and each table's RETAINED committed versions (top-2, the
    // publish default) — interleaved solo publishes can age a
    // group-referenced version out, and the contract is an explicit
    // refusal (readSnapshotAt), never silently serving debris
    var committed: Option[((Long, Long), (Long, Long))] = None
    val live = Map(ta -> scala.collection.mutable.Map.empty[Long, Long],
                   tb -> scala.collection.mutable.Map.empty[Long, Long])
    def retain(t: String): Unit = {
      val keep = live(t).keys.toSeq.sorted.reverse.take(2).toSet
      live(t).keys.toSeq.foreach(v => if (!keep.contains(v)) live(t).remove(v))
    }
    var tick = 0L
    def next(): Long = { tick += 1; tick }
    for (step <- 1 to 40) {
      rnd.nextInt(4) match {
        case 0 => // full group publish
          val (va, vb) = (next(), next())
          val vec = Sinks.publishGroup(Seq((ta, df(va), "transaction_date"),
            (tb, df(vb), "transaction_date")), grp)
          live(ta)(vec(ta)) = va; retain(ta)
          live(tb)(vec(tb)) = vb; retain(tb)
          committed = Some(((vec(ta), va), (vec(tb), vb)))
        case 1 | 2 => // torn member publish (the crash window)
          val t = if (rnd.nextBoolean()) ta else tb
          val v = next()
          val n = Sinks.publishSnapshot(df(v), "transaction_date", t)
          live(t)(n) = v; retain(t)
        case 3 => // read through the group, checked against the model
          committed match {
            case None =>
              assert(Sinks.currentGroup(spark, grp) === Map.empty)
            case Some(((vA, valA), (vB, valB))) =>
              assert(Sinks.currentGroup(spark, grp) === Map(ta -> vA, tb -> vB),
                s"step $step: vector drifted")
              for ((t, v, value) <- Seq((ta, vA, valA), (tb, vB, valB))) {
                if (live(t).contains(v))
                  assert(Sinks.readGroupTable(spark, grp, t)
                    .select("val").as[Long].head() === value, s"step $step: $t")
                else intercept[java.io.FileNotFoundException] {
                  Sinks.readGroupTable(spark, grp, t).collect()
                }
              }
          }
      }
    }
  }

  test("graft-table connector: live + versionAsOf reads, DDL, pushdown, refusal") {
    import graft.sources.Sinks
    val table = Files.createTempDirectory("tbl_dsv2").toString + "/t"
    def df(vals: Seq[Long]) = vals.map(v => (v, java.sql.Date.valueOf("2024-01-15")))
      .toDF("val", "transaction_date")
    Sinks.publishSnapshot(df(Seq(1L, 2L, 3L)), "transaction_date", table)
    Sinks.publishSnapshot(df(Seq(10L, 20L)), "transaction_date", table)
    // live read resolves the newest COMMITTED version
    val live = spark.read.format("graft-table").load(table)
    assert(live.select("val").as[Long].collect().sorted === Array(10L, 20L))
    // time travel with the refuse-don't-guess contract
    val v1 = spark.read.format("graft-table").option("versionAsOf", "1").load(table)
    assert(v1.select("val").as[Long].collect().sorted === Array(1L, 2L, 3L))
    intercept[java.io.FileNotFoundException] {
      spark.read.format("graft-table").option("versionAsOf", "9").load(table)
    }
    // a reader resolved BEFORE a publish stays pinned to its version
    Sinks.publishSnapshot(df(Seq(99L)), "transaction_date", table)
    assert(live.select("val").as[Long].collect().sorted === Array(10L, 20L))
    // parquet delegation: filters push into the scan, columns prune,
    // and the month partition column materializes for pruning
    val plan = spark.read.format("graft-table").load(table)
      .filter(col("val") > 15L).select("val")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(val), GreaterThan(val,15)"), plan)
    assert(spark.read.format("graft-table").load(table)
      .columns.contains("txn_month"))
    // catalog DDL round trip
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_tbl " +
      s"USING `graft-table` OPTIONS (path '$table')")
    assert(spark.sql("SELECT count(*) FROM graft_tbl").head().getLong(0) === 1L)
    // branch reads bind to the ref head; main stays what it was
    graft.sources.Branches.createBranch(spark, table, "side")
    graft.sources.Branches.publishToBranch(df(Seq(7L, 8L)), "transaction_date",
      table, "side")
    assert(spark.read.format("graft-table").option("branch", "side").load(table)
      .select("val").as[Long].collect().sorted === Array(7L, 8L))
    assert(spark.read.format("graft-table").load(table)
      .select("val").as[Long].collect().sorted === Array(99L))
    intercept[java.io.FileNotFoundException] {
      spark.read.format("graft-table").option("branch", "nope").load(table)
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft-table").option("branch", "side")
        .option("versionAsOf", "1").load(table)
    }
    // chain guard: a DV-amended head refuses rather than silently
    // serving the unmerged directory — for the live read AND a fresh
    // branch whose ref still points at the amended main head
    Sinks.publishSnapshot(df(Seq(98L, 99L)), "transaction_date", table,
      retainVersions = 12)
    graft.sources.DeletionVectors.publishDeletes(spark, table,
      Seq(99L).toDF("val"), "val")
    // (since round 12 the refusal raises at scan build, not load —
    // loading a chained table must stay possible so WRITES to it work)
    val refusal = intercept[UnsupportedOperationException] {
      spark.read.format("graft-table").load(table).count()
    }
    assert(refusal.getMessage.contains("readMergedAt"))
    graft.sources.Branches.createBranch(spark, table, "atchain")
    intercept[UnsupportedOperationException] {
      spark.read.format("graft-table").option("branch", "atchain").load(table).count()
    }
    // folding the chain restores connector readability
    graft.sources.DeletionVectors.materializeDeletes(spark, table,
      "transaction_date", retainVersions = 12)
    assert(spark.read.format("graft-table").load(table)
      .select("val").as[Long].collect() === Array(98L))
    // pure-SQL users reach refs through DDL OPTIONS — no graft imports
    graft.sources.Tags.createTag(spark, table, "rel", Some(2L)) // v2 = (10, 20)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_branch " +
      s"USING `graft-table` OPTIONS (path '$table', branch 'side')")
    assert(spark.sql("SELECT count(*) FROM graft_branch").head().getLong(0) === 2L)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_tag " +
      s"USING `graft-table` OPTIONS (path '$table', tag 'rel')")
    assert(spark.sql("SELECT sum(val) FROM graft_tag").head().getLong(0) === 30L)
  }

  test("group store is relocatable: nested members resolve wherever the tree lands") {
    import graft.sources.Sinks
    val root = Files.createTempDirectory("vgroupmove").toString
    val grp = s"$root/grp"
    val d = Seq((42L, java.sql.Date.valueOf("2024-01-15")))
      .toDF("val", "transaction_date")
    Sinks.publishGroup(Seq((s"$grp/member", d, "transaction_date")), grp)
    // markers hold group-RELATIVE member paths, so moving the whole
    // tree leaves every reference valid at the new location
    val moved = s"$root/relocated"
    assert(new java.io.File(grp).renameTo(new java.io.File(moved)))
    assert(Sinks.currentGroup(spark, moved) === Map(s"$moved/member" -> 1L))
    assert(Sinks.readGroupTable(spark, moved, s"$moved/member")
      .select("val").as[Long].head() === 42L)
  }

  test("group publish: retention shorter than group history is rejected up front") {
    import graft.sources.Sinks
    val root = Files.createTempDirectory("vgroup2").toString
    val d = Seq((1L, java.sql.Date.valueOf("2024-01-15")))
      .toDF("val", "transaction_date")
    intercept[IllegalArgumentException] {
      Sinks.publishGroup(Seq((s"$root/a", d, "transaction_date")), s"$root/grp",
        retainGroups = 3, retainVersions = 2)
    }
    // nothing half-committed: no group dir, no table version
    assert(!new java.io.File(s"$root/grp/_commits").exists())
  }

  test("time travel reads retained history; pruned and uncommitted versions refuse") {
    import graft.sources.Sinks
    val table = Files.createTempDirectory("vtravel").toString + "/t"
    def df(p: Long) = Seq(("A", p, java.sql.Date.valueOf("2024-01-15")))
      .toDF("k", "price", "transaction_date")
    (1L to 3L).foreach(v => Sinks.publishSnapshot(df(v * 100), "transaction_date",
      table, retainVersions = 2))
    assert(Sinks.listVersions(spark, table) === Seq(2L, 3L)) // v1 pruned
    // the retained historical version reads bit-exact while live moved on
    assert(Sinks.readSnapshotAt(spark, table, 2L)
      .select("price").as[Long].collect().toSeq === Seq(200L))
    assert(Sinks.readSnapshot(spark, table)
      .select("price").as[Long].collect().toSeq === Seq(300L))
    // pruned version: refuse with the available range, never read debris
    val pruned = intercept[java.io.FileNotFoundException](
      Sinks.readSnapshotAt(spark, table, 1L))
    assert(pruned.getMessage.contains("[2, 3]"))
    // a bare version DIR without a commit marker (concurrent publisher
    // mid-write / crashed writer) must never be served either
    new java.io.File(table, "v00000007").mkdirs()
    intercept[java.io.FileNotFoundException](Sinks.readSnapshotAt(spark, table, 7L))
    assert(Sinks.listVersions(spark, table) === Seq(2L, 3L))
  }

  test("snapshot diff emits exactly the changed rows, typed by change kind") {
    import graft.operators.SnapshotDiff
    val v1 = Seq((1L, Some(10L), "F"), (2L, Some(20L), "F"), (3L, Some(30L), "F"),
        (5L, None: Option[Long], "F"))
      .toDF("id", "price", "is_deleted")
    val v2 = Seq((1L, Some(10L), "F"), (2L, Some(25L), "F"), (4L, Some(40L), "F"),
        (5L, None: Option[Long], "F"))
      .toDF("id", "price", "is_deleted")
    val d = SnapshotDiff.diffOf(v1, v2, "id", Seq("price", "is_deleted")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 unchanged (dropped), 5 unchanged with a NULL compare column
    // (null-safe equality — not a spurious update), 2 updated,
    // 3 only-in-old, 4 only-in-new
    assert(d === Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
  }

  test("applying a snapshot diff to the old state reconstructs the new state exactly") {
    import graft.operators.SnapshotDiff
    val v1 = Seq((1L, Some(10L), "F"), (2L, Some(20L), "F"), (3L, Some(30L), "F"),
        (5L, None: Option[Long], "F"))
      .toDF("id", "price", "is_deleted")
    // exercises every feed branch: update (2), hard delete (3),
    // insert (4), untouched null-compare row (5), null ARRIVING via an
    // update (1: value → null must round-trip, not resurrect 10)
    val v2 = Seq((1L, None: Option[Long], "F"), (2L, Some(25L), "F"), (4L, Some(40L), "F"),
        (5L, None: Option[Long], "F"))
      .toDF("id", "price", "is_deleted")
    val feed = SnapshotDiff.diffOf(v1, v2, "id", Seq("price", "is_deleted"))
    val rebuilt = SnapshotDiff.applyDiff(v1, feed, "id", Seq("price", "is_deleted"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getString(2))).toSet
    val expected = v2.collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2))).toSet
    assert(rebuilt === expected)
  }

  test("incremental aggregate refresh from a change feed equals full recompute") {
    import graft.operators.SnapshotDiff
    def d(s: String) = java.sql.Date.valueOf(s)
    def p(v: String) = new java.math.BigDecimal(v)
    val v1 = Seq(
      (1L, p("10.00"), "F", d("2024-01-05")), // untouched
      (2L, p("20.00"), "F", d("2024-01-20")), // price update, same month
      (3L, p("30.00"), "F", d("2024-02-03")), // moves month (date update)
      (4L, p("40.00"), "F", d("2024-02-09")), // soft-delete flip F→T
      (5L, p("50.00"), "T", d("2024-03-14")), // dead in both (never counted)
      (6L, p("60.00"), "F", d("2024-04-01"))) // hard delete empties April
      .toDF("id", "price", "is_deleted", "transaction_date")
    val v2 = Seq(
      (1L, p("10.00"), "F", d("2024-01-05")),
      (2L, p("25.00"), "F", d("2024-01-20")),
      (3L, p("30.00"), "F", d("2024-03-03")),
      (4L, p("40.00"), "T", d("2024-02-09")),
      (5L, p("50.00"), "T", d("2024-03-14")),
      (7L, p("70.00"), "F", d("2024-05-30"))) // insert opens May
      .toDF("id", "price", "is_deleted", "transaction_date")
    val feed = SnapshotDiff.diffOf(v1, v2, "id",
      Seq("price", "is_deleted", "transaction_date"))
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDecimal(2).doubleValue())).toSet
    val refreshed = norm(SnapshotDiff.refreshAgg(SnapshotDiff.monthlyAgg(v1), feed))
    assert(refreshed === norm(SnapshotDiff.monthlyAgg(v2)))
    // the emptied months (February lost its only live row to March and
    // the flip; April's row hard-deleted) must be GONE, not zero rows
    assert(!refreshed.exists(_._1.startsWith("2024-02")))
    assert(!refreshed.exists(_._1.startsWith("2024-04")))
    assert(refreshed.map(_._1) === Set("2024-01-01", "2024-03-01", "2024-05-01"))
  }

  test("versioned snapshot publish: concurrent reads across repeated swaps never fail") {
    import graft.sources.Sinks
    val table = Files.createTempDirectory("vsnap_conc").toString + "/t"
    def df(p: Long) = Seq(("A", p, java.sql.Date.valueOf("2024-01-15")),
                          ("B", p, java.sql.Date.valueOf("2024-02-15")))
      .toDF("k", "price", "transaction_date")
    Sinks.publishSnapshot(df(0), "transaction_date", table)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      try {
        while (!stop.get()) {
          // each read resolves the manifest fresh and must see a complete
          // 2-row snapshot with one consistent price — even mid-publish
          val rows = Sinks.readSnapshot(spark, table)
            .select("price").as[Long].collect()
          assert(rows.length === 2 && rows.toSet.size === 1)
        }
      } catch { case t: Throwable => failure.set(t) }
    })
    reader.start()
    // retainVersions = 3: one extra grace version so a reader that
    // resolved just before two back-to-back swaps still finds its files
    (1L to 5L).foreach(v =>
      Sinks.publishSnapshot(df(v), "transaction_date", table, retainVersions = 3))
    stop.set(true)
    reader.join(60000)
    assert(failure.get() === null, s"concurrent reader failed: ${failure.get()}")
    assert(Sinks.currentVersion(spark, table) === Some(6L))
  }

  test("versioned snapshot publish: concurrent publishers claim distinct versions") {
    import graft.sources.Sinks
    import scala.jdk.CollectionConverters._
    val table = Files.createTempDirectory("vsnap_race").toString + "/t"
    def df(p: Long) = Seq(("A", p, java.sql.Date.valueOf("2024-01-15")))
      .toDF("k", "price", "transaction_date")
    val out = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    // two publishers race list-versions → claim → write → commit; the
    // _claims conditional create means they can never write the same dir
    val ts = (1 to 2).map(t => new Thread(() =>
      try (1 to 3).foreach(i =>
        out.add(Sinks.publishSnapshot(df(t * 10L + i), "transaction_date", table,
          retainVersions = 10)))
      catch { case e: Throwable => failure.set(e) }))
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(failure.get() === null, s"concurrent publish failed: ${failure.get()}")
    val versions = out.asScala.toSeq
    assert(versions.size === 6 && versions.distinct.size === 6,
      s"version claimed twice: $versions")
    assert(Sinks.currentVersion(spark, table) === Some(versions.max))
  }

  test("prune never touches an unmarked version dir (slow concurrent writer safety)") {
    import graft.sources.Sinks
    val table = Files.createTempDirectory("vsnap_unmarked").toString + "/t"
    def df(p: Long) = Seq(("A", p, java.sql.Date.valueOf("2024-01-15")))
      .toDF("k", "price", "transaction_date")
    Sinks.publishSnapshot(df(1), "transaction_date", table)
    // a concurrent publisher mid-write: version dir present, no marker —
    // indistinguishable by number from crash debris, so prune must skip it
    val inflight = new java.io.File(table, "v00000002")
    assert(inflight.mkdirs())
    Sinks.publishSnapshot(df(3), "transaction_date", table, retainVersions = 1)
    Sinks.publishSnapshot(df(4), "transaction_date", table, retainVersions = 1)
    assert(inflight.exists(), "unmarked dir was pruned out from under a slow writer")
    assert(Sinks.currentVersion(spark, table) === Some(4L))
    assert(Sinks.readSnapshot(spark, table).count() === 1)
  }

  test("recognized-but-truncated image payloads degrade instead of failing the batch") {
    // 30 bytes = valid PNG signature + a cut-off IHDR: ImageIO's PNG
    // reader CLAIMS it then throws (not the unrecognized→null path)
    val png = Media.encodePng(new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB))
    val truncated = png.take(30)
    val m = Seq((1L, "image", truncated)).toDF("media_id", "kind", "payload")
    val meta = Media.decodeMeta(m).collect().head // stub fall-back, no throw
    assert(meta.n_bytes === 30 && meta.width >= 16)
    assert(Media.resizeImages(m).collect().isEmpty) // dropped, not fatal
  }

  test("corrupt payloads route to quarantine; healthy rows and counts unaffected") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val maxReal = docs.agg(max(col("doc_id"))).head().getLong(0)
    val nPlanted = docs.filter(col("doc_id") % 25 === 0).count()
    assert(nPlanted > 0)
    // every planted (truncated) payload — one per modality in the
    // round-robin — lands in quarantine, and nothing else does
    val q = Media.mediaQuarantine(spark, sf).collect()
    assert(q.length === nPlanted, s"expected $nPlanted quarantined, got ${q.length}")
    assert(q.forall(_.getLong(0) > maxReal), "a healthy (real-id) row was quarantined")
    assert(q.forall(_.getLong(2) === 10L)) // the truncated size is audited
    assert(q.map(_.getString(1)).toSet.subsetOf(Set("image", "audio", "video")))
    // the tagged decode splits cleanly: ok-rows = all real ids
    val tagged = Media.decodeMetaTagged(Media.mediaTable(spark, sf, plantCorrupt = true))
    assert(tagged.filter(col("decode_ok")).count() === docs.count())
    // the un-planted registered meta query is unchanged by the feature
    assert(Media.mediaMeta(spark, sf).count() === docs.count())
  }

  test("image decode is real: a planted PNG reports its true bitstream dimensions") {
    val png = Media.encodePng(new java.awt.image.BufferedImage(
      123, 45, java.awt.image.BufferedImage.TYPE_INT_RGB))
    val m = Seq((1L, "image", png)).toDF("media_id", "kind", "payload")
    val meta = Media.decodeMeta(m).collect().head
    assert(meta.width === 123 && meta.height === 45 && meta.n_frames === 1)
    // the resized payload is itself a decodable PNG of the target box
    val r = Media.resizeImages(m, maxSide = 60).collect().head
    assert(r.src_width === 123 && r.src_height === 45)
    assert(math.max(r.width, r.height) === 60)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
    assert(back.getWidth === r.width && back.getHeight === r.height)
    // the registered media table carries genuine PNG payloads
    Media.mediaTable(spark, sf).filter(col("kind") === "image")
      .limit(3).collect().foreach { row =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("payload")))
        assert(img != null && img.getWidth >= 16 && img.getHeight >= 16)
      }
  }

  test("audio decode is real: a planted WAV reports its true header metadata") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // hand-built RIFF/WAVE at a rate the fixture never uses: 321 frames
    // of 16-bit mono PCM at 22050 Hz
    val pcm = new Array[Byte](321 * 2)
    val fmt = new AudioFormat(22050f, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, 321L)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    val m = Seq((1L, "audio", out.toByteArray)).toDF("media_id", "kind", "payload")
    val meta = Media.decodeMeta(m).collect().head
    assert(meta.sample_rate === 22050 && meta.n_frames === 321)
    // the registered media table carries genuine WAV payloads whose
    // header metadata matches the fixture formula
    Media.mediaTable(spark, sf).filter(col("kind") === "audio")
      .limit(3).collect().foreach { row =>
        val id = row.getAs[Long]("media_id")
        val aff = AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("payload")))
        assert(aff.getFormat.getSampleRate.toInt === Media.wavRates(((id % 4) + 4).toInt % 4))
        assert(aff.getFrameLength === 200 + ((id * 11) % 1800).toInt)
      }
    // an undecodable audio payload falls back to the stub, not a failure
    val bad = Seq((2L, "audio", Array[Byte](1, 2, 3))).toDF("media_id", "kind", "payload")
    assert(Media.decodeMeta(bad).collect().head.sample_rate > 0)
    // an undecodable image payload is dropped by resize, not fatal
    val badImg = Seq((3L, "image", Array[Byte](9, 9))).toDF("media_id", "kind", "payload")
    assert(Media.resizeImages(badImg).collect().isEmpty)
  }

  test("video decode is real: a planted multi-frame GIF reports its true frame count") {
    // hand-built 5-frame animated GIF through the JDK writer
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    (1 to 5).foreach { _ =>
      w.writeToSequence(new javax.imageio.IIOImage(
        new java.awt.image.BufferedImage(37, 21,
          java.awt.image.BufferedImage.TYPE_INT_RGB), null, null), null)
    }
    w.endWriteSequence(); w.dispose(); ios.close()
    val m = Seq((1L, "video", out.toByteArray)).toDF("media_id", "kind", "payload")
    val meta = Media.decodeMeta(m).collect().head
    assert(meta.n_frames === 5 && meta.width === 37 && meta.height === 21)
    // the registered media table carries genuine GIF containers whose
    // frame counts match the fixture formula
    Media.mediaTable(spark, sf).filter(col("kind") === "video")
      .limit(3).collect().foreach { row =>
        val id = row.getAs[Long]("media_id")
        val got = Media.decodeMeta(
          Seq((id, "video", row.getAs[Array[Byte]]("payload")))
            .toDF("media_id", "kind", "payload")).collect().head
        assert(got.n_frames === Media.gifFramesFor(id),
          s"video $id frame count mismatch")
      }
    // corrupt video payloads degrade to the stub, not a failure
    val bad = Seq((2L, "video", Array[Byte](1, 2, 3))).toDF("media_id", "kind", "payload")
    assert(Media.decodeMeta(bad).collect().head.n_frames >= 1)
  }

  test("schema evolution: rename/add/drop resolve by stable id across versions") {
    import graft.sources.{SchemaEvolution, Sinks}
    val table = Files.createTempDirectory("sevo").toString + "/t"
    def d(s: String) = java.sql.Date.valueOf(s)
    // v1: (k, price, transaction_date)
    SchemaEvolution.publishEvolved(
      Seq((1L, 10L, d("2024-01-15")), (2L, 20L, d("2024-02-15")))
        .toDF("k", "price", "transaction_date"),
      "transaction_date", table)
    // v2: price RENAMED to amount, category ADDED
    SchemaEvolution.publishEvolved(
      Seq((1L, 11L, d("2024-01-15"), "a"), (2L, 21L, d("2024-02-15"), "b"))
        .toDF("k", "amount", "transaction_date", "category"),
      "transaction_date", table, renamedFrom = Map("amount" -> "price"))
    // v1 through the live schema: price surfaces AS amount, with v1
    // VALUES; the later-added category is a typed null
    val v1 = SchemaEvolution.readSnapshotAs(spark, table, 1L)
    assert(v1.columns.toSeq === Seq("k", "amount", "transaction_date", "category"))
    assert(v1.select("k", "amount").as[(Long, Long)].collect().toSet
      === Set((1L, 10L), (2L, 20L)))
    assert(v1.schema("category").dataType.typeName === "string")
    assert(v1.filter(col("category").isNotNull).count() === 0)
    // v2 through its own schema is the identity
    assert(SchemaEvolution.readSnapshotAs(spark, table, 2L)
      .select("k", "amount", "category").as[(Long, Long, String)].collect().toSet
      === Set((1L, 11L, "a"), (2L, 21L, "b")))
    // v3 DROPS category and renames amount onward to total: old
    // versions read through v3 lose category and follow the id chain
    SchemaEvolution.publishEvolved(
      Seq((1L, 12L, d("2024-01-15"))).toDF("k", "total", "transaction_date"),
      "transaction_date", table, renamedFrom = Map("total" -> "amount"),
      retainVersions = 3)
    val v1asV3 = SchemaEvolution.readSnapshotAs(spark, table, 1L)
    assert(v1asV3.columns.toSeq === Seq("k", "total", "transaction_date"))
    assert(v1asV3.select("k", "total").as[(Long, Long)].collect().toSet
      === Set((1L, 10L), (2L, 20L)))
    // and v1 read through the OLD v2 schema still works (pinned as-of)
    assert(SchemaEvolution.readSnapshotAs(spark, table, 1L, asOfVersion = Some(2L))
      .columns.toSeq === Seq("k", "amount", "transaction_date", "category"))
    // physical history is untouched: the raw v1 dir still says "price"
    assert(Sinks.readSnapshotAt(spark, table, 1L).columns.contains("price"))
  }

  test("schema evolution survives compaction: the id map rides the maintenance republish") {
    import graft.sources.{SchemaEvolution, Sinks}
    val table = Files.createTempDirectory("sevo_c").toString + "/t"
    def d(s: String) = java.sql.Date.valueOf(s)
    SchemaEvolution.publishEvolved(
      Seq((1L, 10L, d("2024-01-15")), (2L, 20L, d("2024-02-15")))
        .toDF("k", "price", "transaction_date"),
      "transaction_date", table)
    SchemaEvolution.publishEvolved(
      Seq((1L, 11L, d("2024-01-15"), "a")).toDF("k", "amount", "transaction_date", "category"),
      "transaction_date", table, renamedFrom = Map("amount" -> "price"),
      retainVersions = 3)
    // a content-neutral maintenance pass republishes v2 as v3
    val v3 = Sinks.compactSnapshot(spark, table, "transaction_date", retainVersions = 3)
    assert(v3 === 3L)
    // the compacted version kept its schema mapping: evolved reads of
    // BOTH the compacted version and retained history still resolve
    assert(SchemaEvolution.readSnapshotAs(spark, table, 3L)
      .columns.toSeq === Seq("k", "amount", "transaction_date", "category"))
    val v1 = SchemaEvolution.readSnapshotAs(spark, table, 1L)
    assert(v1.columns.toSeq === Seq("k", "amount", "transaction_date", "category"))
    assert(v1.select("k", "amount").as[(Long, Long)].collect().toSet
      === Set((1L, 10L), (2L, 20L)))
    // and the values survived the rewrite bit-exact
    assert(SchemaEvolution.readSnapshotAs(spark, table, 3L)
      .select("k", "amount").as[(Long, Long)].collect().toSet === Set((1L, 11L)))
  }

  test("schema evolution: filters on renamed columns push down to the old physical name") {
    import graft.sources.SchemaEvolution
    val table = Files.createTempDirectory("sevo_p").toString + "/t"
    def d(s: String) = java.sql.Date.valueOf(s)
    SchemaEvolution.publishEvolved(
      (1L to 50L).map(i => (i, i * 10L, d("2024-01-15")))
        .toDF("k", "price", "transaction_date"),
      "transaction_date", table)
    SchemaEvolution.publishEvolved(
      Seq((1L, 999L, d("2024-01-15"))).toDF("k", "amount", "transaction_date"),
      "transaction_date", table, renamedFrom = Map("amount" -> "price"))
    // a filter written against the LIVE name must reach the v1 parquet
    // scan as a pushed filter on the OLD physical name — the id-map
    // projection is an alias, not a barrier
    val plan = SchemaEvolution.readSnapshotAs(spark, table, 1L)
      .filter(col("amount") > 300L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(price,300)"),
      s"filter did not push down under the physical name:\n$plan")
  }

  test("schema evolution: type widening on read is lossless-only") {
    import graft.sources.SchemaEvolution
    val table = Files.createTempDirectory("sevo_t").toString + "/t"
    def d(s: String) = java.sql.Date.valueOf(s)
    // v1: price is INT
    SchemaEvolution.publishEvolved(
      Seq((1L, 10, d("2024-01-15"))).toDF("k", "price", "transaction_date"),
      "transaction_date", table)
    // v2: same id, widened to LONG (and bumped)
    SchemaEvolution.publishEvolved(
      Seq((1L, 11L, d("2024-01-15"))).toDF("k", "price", "transaction_date"),
      "transaction_date", table)
    val v1 = SchemaEvolution.readSnapshotAs(spark, table, 1L)
    assert(v1.schema("price").dataType.typeName === "long")
    assert(v1.select("price").as[Long].collect().toSeq === Seq(10L))
    // a NARROWING evolution (long→int) must refuse at read time: v2
    // read through v1's int schema would truncate history
    val e = intercept[IllegalArgumentException](
      SchemaEvolution.readSnapshotAs(spark, table, 2L, asOfVersion = Some(1L)))
    assert(e.getMessage.contains("not a lossless widening"))
  }

  test("events loader is timestamp-unit robust: NANOS and MICROS files read identically") {
    // The driver's testdata generator has shipped events.ts as both
    // parquet TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across rounds;
    // the round-8 regression was the loader assuming one of them.
    // Pin: the SAME logical instants, written under each encoding, come
    // out of Tables.events as identical session-TZ microsecond
    // timestamps — whichever unit future testdata carries.
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.MessageTypeParser
    // instants with sub-microsecond noise: truncation (div 1000), not
    // rounding, is the pinned nanos→micros semantics
    val micros = Seq(1700000000000001L, 1700000003999999L, 1700086400123456L)
    val rows = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, 100L + i, s"type_$i", i * 1.5, s"""{"k":$i}""") }

    val nanosDir = Files.createTempDirectory("ev_nanos").toString
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,false));
        |  required int64 user_id;
        |  optional binary event_type (STRING);
        |  optional double value;
        |  optional binary props (STRING);
        |}""".stripMargin)
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$nanosDir/events.parquet"))
      .withConf(conf).build()
    val gf = new SimpleGroupFactory(schema)
    rows.foreach { case (id, us, uid, et, v, props) =>
      writer.write(gf.newGroup()
        .append("event_id", id).append("ts", us * 1000L + id * 37L % 1000L)
        .append("user_id", uid).append("event_type", et)
        .append("value", v).append("props", props))
    }
    writer.close()

    val microsDir = Files.createTempDirectory("ev_micros").toString
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us"))
        .cast(org.apache.spark.sql.types.TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$microsDir/events.parquet")

    val fromNanos = graft.sources.Tables.events(spark, nanosDir)
    val fromMicros = graft.sources.Tables.events(spark, microsDir)
    // both normalize to session-TZ TIMESTAMP at microsecond precision
    assert(fromNanos.schema("ts").dataType.typeName === "timestamp")
    assert(fromMicros.schema("ts").dataType.typeName === "timestamp")
    def dump(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), unix_micros(col("ts")), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(dump(fromNanos) === dump(fromMicros))
    assert(dump(fromNanos).map(_(1)) === micros)
    // a file already carrying session-TZ TIMESTAMP also passes through
    val tzDir = Files.createTempDirectory("ev_tz").toString
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$tzDir/events.parquet")
    assert(dump(graft.sources.Tables.events(spark, tzDir)) === dump(fromMicros))
  }

  test("zip entries round-trip content and sha256; corrupt archives quarantine") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = Files.createTempDirectory("zips").toString
    def put(zos: ZipOutputStream, name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    val zos = new ZipOutputStream(new java.io.FileOutputStream(s"$dir/good.zip"))
    put(zos, "a.txt", "hello\nworld"); put(zos, "b.txt", "solo"); zos.close()
    // garbage bytes: no zip signature anywhere
    Files.write(new java.io.File(dir, "garbage.zip").toPath,
      "not a zip at all".getBytes("UTF-8"))
    // truncated: a real zip cut mid-stream
    val full = Files.readAllBytes(new java.io.File(dir, "good.zip").toPath)
    Files.write(new java.io.File(dir, "trunc.zip").toPath, full.take(30))
    val ents = graft.sources.ZipSource.entries(spark, s"$dir/*.zip")
    val ok = ents.filter(col("ok")).orderBy("entry").collect()
    assert(ok.map(_.getAs[String]("entry")).toSeq === Seq("a.txt", "b.txt"))
    val a = ok.head
    assert(new String(a.getAs[Array[Byte]]("content"), "UTF-8") === "hello\nworld")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest("hello\nworld".getBytes("UTF-8")).map(x => f"$x%02x").mkString
    assert(a.getAs[String]("sha256") === sha)
    val bad = ents.filter(!col("ok"))
      .select(element_at(split(col("archive"), "/"), -1), col("err")).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(bad.keySet === Set("garbage.zip", "trunc.zip"))
    assert(bad.values.forall(_.nonEmpty))
    // zip-bomb guard: a tiny cap quarantines the oversized entries
    val capped = graft.sources.ZipSource.entries(spark, s"$dir/good.zip",
      maxEntryBytes = 5)
    assert(capped.filter(!col("ok")).count() === 1) // a.txt (11 bytes) trips it
    assert(capped.filter(col("ok")).count() === 1)  // b.txt (4 bytes) survives
  }

  test("graft-zip DSv2 source matches the binaryFile plan and prunes payload work") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = Files.createTempDirectory("zips_dsv2").toString
    def put(zos: ZipOutputStream, name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    val z1 = new ZipOutputStream(new java.io.FileOutputStream(s"$dir/a.zip"))
    put(z1, "x.txt", "alpha\nbeta"); put(z1, "y.txt", "gamma"); z1.close()
    val z2 = new ZipOutputStream(new java.io.FileOutputStream(s"$dir/b.zip"))
    put(z2, "z.txt", "delta"); z2.close()
    Files.write(new java.io.File(dir, "bad.zip").toPath,
      "garbage".getBytes("UTF-8"))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(element_at(split(col("archive"), "/"), -1).as("a"),
        col("entry"), col("n_bytes"), col("sha256"),
        hex(col("content")).as("hx"), col("ok"), col("err").isNotNull)
      .collect().map(_.toString).sorted.toSeq
    // full-schema parity with the function-form source, quarantine included
    val v2 = spark.read.format("graft-zip").load(s"$dir/*.zip")
    assert(norm(v2) === norm(graft.sources.ZipSource.entries(spark, s"$dir/*.zip")))
    // one input partition per archive — archives are the unit of parallelism
    assert(v2.rdd.getNumPartitions === 3)
    // column pruning reaches the scan: a metadata-only projection reads
    // no payload fields, visible in the scan description
    val meta = v2.select("archive", "entry", "ok")
    val plan = meta.queryExecution.executedPlan.toString
    assert(plan.contains("graft-zip") && plan.contains("[archive,entry,ok]"),
      s"pruned scan not visible:\n$plan")
    assert(meta.filter(col("ok")).count() === 3)
    // short name also resolves through SQL DDL (DataSourceRegister)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW zips_v2 " +
      s"USING `graft-zip` OPTIONS (path '$dir/*.zip')")
    assert(spark.table("zips_v2").filter(!col("ok")).count() === 1)
    // entry predicates PUSH into the scan (skipping payloads at the
    // source) and are retained, so results equal the unpushed plan
    val filtered = v2.filter(col("entry") === "x.txt")
    val fplan = filtered.queryExecution.executedPlan.toString
    assert(fplan.contains("pushed:") && fplan.contains("EqualTo(entry,x.txt)"),
      s"entry filter not pushed:\n$fplan")
    assert(filtered.select("entry").as[String].collect().toSeq === Seq("x.txt"))
    // archive predicates prune whole InputPartitions at planning
    val oneArchive = v2.filter(col("archive").endsWith("a.zip"))
    assert(oneArchive.rdd.getNumPartitions === 1)
    assert(oneArchive.count() === 2)
    // a pushed predicate matching NOTHING fabricates no quarantine rows
    assert(v2.filter(col("entry") === "absent.txt").count() === 0)
  }

  test("writeZips emits one archive per key plus a decoy; textLines round-trips") {
    val dir = Files.createTempDirectory("zipw").toString
    val rows = Seq(("2024-01", "k1,10.00"), ("2024-01", "k2,20.00"),
      ("2024-02", "k3,30.00")).toDF("m", "line")
    graft.sources.ZipSource.writeZips(rows, "m", "line", dir,
      m => s"PPMS_update_$m.txt")
    val ents = graft.sources.ZipSource.entries(spark, s"$dir/*.zip")
    // every archive carries its data entry AND the decoy README
    val names = ents.select("entry").as[String].collect().sorted
    assert(names === Array("PPMS_update_2024-01.txt", "PPMS_update_2024-02.txt",
      "README.txt", "README.txt"))
    val lines = graft.sources.ZipSource.textLines(ents)
      .filter(col("entry").startsWith("PPMS_update_"))
      .select("line").as[String].collect().sorted
    assert(lines === Array("k1,10.00", "k2,20.00", "k3,30.00"))
  }

  test("jsonl round-trip is byte-exact through gzip partitions; corrupt lines quarantine") {
    import graft.sources.{JsonlDocs, Sinks}
    val dir = Files.createTempDirectory("jsonl_rt").toString
    val tricky = "line1\nline2\t\"quoted\" \\ backslash é中文 ctrl"
    val docs = Seq(
      (1L, tricky, "en", "s1", "train", 0L),
      (2L, "", "fr", "s2", "val", 1L),
      (3L, null.asInstanceOf[String], "de", "s1", "train", 0L))
      .toDF("doc_id", "text", "lang", "source", "split", "shard")
    Sinks.writeCorpusJsonl(docs, dir)
    Files.write(new java.io.File(dir, "split=train/bad.json").toPath,
      "{\"doc_id\": definitely not json\n".getBytes("UTF-8"))
    val back = JsonlDocs.readClean(spark, dir).orderBy("doc_id").collect()
    assert(back.length === 3) // the corrupt line is quarantined, not read
    assert(back(0).getAs[String]("text") === tricky) // escapes round-trip
    assert(back(1).getAs[String]("text") === "")
    assert(back(2).isNullAt(1))
    // (materialize the full projection: Spark refuses plans that end
    // up referencing only the internal corrupt column, and count()
    // would prune doc_id back out)
    val bad = JsonlDocs.read(spark, dir)
      .select("doc_id", "_corrupt_record").collect()
      .count(r => !r.isNullAt(1))
    assert(bad === 1)
  }

  test("jsonl and zip round-trips survive randomized adversarial content") {
    import graft.sources.{JsonlDocs, Sinks, ZipSource}
    val rnd = new scala.util.Random(7)
    // printable-BMP random strings peppered with the characters that
    // break naive encoders: quotes, backslashes, newlines, tabs,
    // delimiters, JSON/zip syntax, multi-byte unicode. (Lone
    // surrogates are excluded — they cannot survive UTF-8 by design.)
    val spice = Array('"', '\\', '\n', '\t', ',', '|', '{', '}', '[', ']',
      ':', 'é', '中', '€', ' ', '​')
    def randText(): String = {
      val n = rnd.nextInt(60)
      val sb = new StringBuilder
      for (_ <- 0 until n)
        sb.append(
          if (rnd.nextBoolean()) spice(rnd.nextInt(spice.length))
          else (0x20 + rnd.nextInt(0x5f)).toChar)
      sb.toString
    }
    val docs = (1L to 120L).map(i => (i, randText(), "xx", "fuzz",
      if (i % 3 == 0) "val" else "train", i % 4))
      .toDF("doc_id", "text", "lang", "source", "split", "shard")
    val expected = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    // JSONL: write partitioned gzip, read back, every text byte-equal
    val jd = Files.createTempDirectory("jsonl_fuzz").toString
    Sinks.writeCorpusJsonl(docs, jd)
    val backJ = JsonlDocs.readClean(spark, jd)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(backJ === expected)
    // ZIP: one-line-per-doc entries keyed by shard; newlines inside a
    // text would shear the line framing, so this path (like any
    // line-oriented interchange) carries hex-armored payloads (NOT
    // Spark's base64, which emits MIME-chunked output with embedded
    // newlines — exactly the shear this test exists to catch)
    val zd = Files.createTempDirectory("zip_fuzz").toString
    val lines = docs.select(col("shard").cast("string").as("f"),
      concat_ws(",", col("doc_id").cast("string"),
        hex(col("text").cast("binary"))).as("line"))
    ZipSource.writeZips(lines, "f", "line", zd, s => s"part_$s.txt")
    val backZ = ZipSource.textLines(
        ZipSource.entries(spark, s"$zd/*.zip"))
      .filter(col("entry").startsWith("part_"))
      .select(split(col("line"), ",").getItem(0).cast("long").as("doc_id"),
        unhex(split(col("line"), ",").getItem(1)).cast("string").as("text"))
      .as[(Long, String)].collect().toMap
    assert(backZ === expected)
  }

  test("decode is deterministic and frame sampling explodes every Nth frame") {
    val meta1 = Media.mediaMeta(spark, sf).collect()
    val meta2 = Media.mediaMeta(spark, sf).collect()
    assert(meta1.map(_.toString).toSeq === meta2.map(_.toString).toSeq)
    val frames = Media.sampleFrames(Media.decodeMeta(Media.mediaTable(spark, sf)).toDF())
    val byId = frames.groupBy("media_id").agg(max("frame_idx").as("mx"), count(lit(1)).as("n"))
      .join(Media.decodeMeta(Media.mediaTable(spark, sf)).toDF(), "media_id")
    assert(byId.filter(col("mx") >= col("n_frames")).count() === 0)
  }

  test("central-directory census inflates nothing: corrupted payload bytes are invisible to metadata reads") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    // a valid archive ...
    val dir = Files.createTempDirectory("zip_cd").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(s"$dir/a.zip"))
    zos.putNextEntry(new ZipEntry("keep.txt"))
    zos.write(("payload " * 50).getBytes("UTF-8")); zos.closeEntry()
    zos.putNextEntry(new ZipEntry("skip.txt"))
    zos.write(("other " * 50).getBytes("UTF-8")); zos.closeEntry()
    zos.close()
    // ... whose ENTRY DATA is then vandalized in place (the central
    // directory at the tail stays intact). Any plan that inflates
    // payloads now fails on these entries — so a clean metadata
    // census over this file PROVES the scan read only directory
    // records through the seekable stream, on any FS scheme.
    val raf = new java.io.RandomAccessFile(s"$dir/a.zip", "rw")
    raf.seek(40); raf.write(Array.fill[Byte](60)(0x5a)); raf.close()
    // NOTE the projection: archive+entry only — including `ok` would
    // (by documented contract) force the payload walk so pruning can
    // never flip a quarantine verdict
    val v2 = spark.read.format("graft-zip").load(s"$dir/a.zip")
    assert(v2.select("archive", "entry").orderBy("entry")
      .select("entry").as[String].collect().toSeq ===
      Seq("keep.txt", "skip.txt"))
    // a pushed entry-predicate miss also never touches the damage
    assert(v2.filter(col("entry") === "absent.txt")
      .select("archive", "entry").count() === 0)
    // whereas actually CONSUMING a vandalized payload surfaces it:
    // the inflate fails and the archive-level quarantine row reports
    // it (never a dead task)
    val full = v2.select("entry", "sha256", "ok", "err").collect()
    assert(full.exists(r => !r.getAs[Boolean]("ok")),
      s"corrupt payload read should quarantine: ${full.mkString("; ")}")
  }

  test("seekable zip parses hand-built zip64 structures") {
    // java's ZipOutputStream only emits zip64 when sizes demand it, so
    // assemble a minimal zip64 archive by hand: one STORED entry whose
    // CD record defers size+offset to a 0x0001 extra field, closed by
    // an EOCD64 record + locator + sentinel-bearing classic EOCD
    val body = "zip64 payload".getBytes("UTF-8")
    val name = "big.bin".getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    def w64(v: Long): Unit = { w32(v & 0xffffffffL); w32((v >>> 32) & 0xffffffffL) }
    val crc = new java.util.zip.CRC32(); crc.update(body)
    // local header @0
    w32(0x04034b50L); w16(45); w16(0); w16(0) /*stored*/; w16(0); w16(0)
    w32(crc.getValue); w32(body.length.toLong); w32(body.length.toLong)
    w16(name.length); w16(0); bos.write(name); bos.write(body)
    val cdStart = bos.size()
    // central directory record: sizes + offset deferred to zip64 extra
    w32(0x02014b50L); w16(45); w16(45); w16(0); w16(0) /*stored*/
    w16(0); w16(0); w32(crc.getValue)
    w32(0xffffffffL); w32(0xffffffffL) // csize/usize -> extra
    w16(name.length); w16(8 * 3 + 4); w16(0); w16(0); w16(0); w32(0)
    w32(0xffffffffL) // local header offset -> extra
    bos.write(name)
    w16(0x0001); w16(8 * 3); w64(body.length.toLong); w64(body.length.toLong); w64(0L)
    val cdLen = bos.size() - cdStart
    val eocd64 = bos.size()
    // zip64 EOCD record
    w32(0x06064b50L); w64(44L); w16(45); w16(45); w32(0); w32(0)
    w64(1L); w64(1L); w64(cdLen.toLong); w64(cdStart.toLong)
    // zip64 EOCD locator
    w32(0x07064b50L); w32(0); w64(eocd64.toLong); w32(1)
    // classic EOCD, all sentinels
    w32(0x06054b50L); w16(0); w16(0); w16(0xffff); w16(0xffff)
    w32(0xffffffffL); w32(0xffffffffL); w16(0)
    val dir = Files.createTempDirectory("zip64").toString
    Files.write(new java.io.File(dir, "z64.zip").toPath, bos.toByteArray)
    val rows = spark.read.format("graft-zip").load(s"$dir/z64.zip")
      .select("entry", "n_bytes", "sha256", "ok").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("entry") === "big.bin")
    assert(rows.head.getAs[Boolean]("ok"))
    assert(rows.head.getAs[Long]("n_bytes") === body.length.toLong)
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(body).map(x => f"$x%02x").mkString
    assert(rows.head.getAs[String]("sha256") === sha)
  }

  test("writeZips rejects group keys that escape the output directory") {
    val dir = Files.createTempDirectory("zipsafe").toString
    val rows = Seq(("../evil", "a,1")).toDF("m", "line")
    val ex = intercept[org.apache.spark.SparkException] {
      graft.sources.ZipSource.writeZips(rows, "m", "line", dir,
        m => s"PPMS_update_$m.txt")
    }
    assert(ex.getMessage.contains("not a safe file name") ||
      Option(ex.getCause).exists(_.getMessage.contains("not a safe file name")))
    assert(new java.io.File(dir).listFiles().forall(!_.getName.endsWith(".zip")))
  }

  test("quarantine ledger classes all three planted corruption modes deterministically") {
    val led = graft.sources.ZipSource.zipQuarantine(spark, sf)
      .select("archive", "entry", "n_bytes", "kind").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(led.toSeq === Seq(
      ("PPMS_update_corrupt.zip", "", 25L, "no_entries"),
      ("PPMS_update_oversized.zip", "BULK_dump.bin", 2097152L, "oversized_entry"),
      ("PPMS_update_truncated.zip", "", 100L, "unreadable")))
    // read-path independence: the DSv2 connector (central-directory
    // reads + streaming fallback for damaged archives) must class the
    // same three plants into the SAME ledger rows
    val fx = graft.sources.ZipSource.monthlyZipFixture(spark, sf)
    val v2led = graft.sources.ZipSource.quarantineLedger(
        spark.read.format("graft-zip")
          .option("maxEntryBytes", (1L << 20).toString)
          .load(s"$fx/*.zip"))
      .select("archive", "entry", "n_bytes", "kind").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(v2led.toSeq === led.toSeq)
  }

  test("zip stream detects late non-monotone arrivals and can fail fast") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = Files.createTempDirectory("zip_late").toString
    def drop(nm: String): Unit = {
      val z = new ZipOutputStream(new java.io.FileOutputStream(s"$dir/$nm"))
      z.putNextEntry(new ZipEntry("e.txt")); z.write("x".getBytes)
      z.closeEntry(); z.close()
    }
    def drain(ckpt: String, onLate: String): Unit =
      spark.readStream.format("graft-zip")
        .option("maxFilesPerTrigger", "1")
        .option("onLateName", onLate)
        .load(s"$dir/*.zip")
        .writeStream.option("checkpointLocation", ckpt).format("parquet")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(s"$dir/out_${ckpt.hashCode.toHexString}")
        .awaitTermination()
    drop("feed_005.zip")
    drain(s"$dir/c1", "fail") // baseline run: no prior listing, no failure
    // RESTART semantics: a below-offset name present at instance start
    // is baselined, not failed (already-processed and late names are
    // indistinguishable without a side log — documented contract)
    drop("feed_001.zip")
    drain(s"$dir/c1", "fail") // must NOT fail
    // LIVE-INSTANCE case: landing a below-offset name between
    // micro-batches of one running stream must be detected by the
    // next listing and (onLateName=fail) kill the stream loudly.
    val dir2 = Files.createTempDirectory("zip_late2").toString
    def drop2(nm: String): Unit = {
      val z = new ZipOutputStream(new java.io.FileOutputStream(s"$dir2/$nm"))
      z.putNextEntry(new ZipEntry("e.txt")); z.write("x".getBytes)
      z.closeEntry(); z.close()
    }
    drop2("feed_100.zip"); drop2("feed_200.zip"); drop2("feed_300.zip")
    val q = spark.readStream.format("graft-zip")
      .option("maxFilesPerTrigger", "1")
      .option("onLateName", "fail")
      .load(s"$dir2/*.zip")
      .writeStream.option("checkpointLocation", s"$dir2/ckpt").format("parquet")
      .start(s"$dir2/out")
    try {
      // wait until at least one batch committed, then land a late name
      val deadline = System.currentTimeMillis() + 30000
      while (q.lastProgress == null && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      drop2("feed_000.zip") // sorts below everything already committed
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable(); q.awaitTermination(30000)
      }
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
          .map(e => Option(e.getMessage).getOrElse("")).toSeq
      assert(chain(ex).exists(_.contains("below the committed offset")),
        s"expected late-name failure, got: ${chain(ex).mkString(" | ")}")
    } finally if (q.isActive) q.stop()
  }
}
