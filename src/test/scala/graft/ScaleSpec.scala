package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew
import graft.sources.{Sinks, Tables}

/** Scale utilities: salted joins must equal plain joins; partitioned
  * sinks must produce prunable layouts. */
class ScaleSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join returns exactly the rows of the plain join") {
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = l.join(o, "l_orderkey")
    val salted = Skew.saltedJoin(l, o, "l_orderkey", saltFactor = 4)
    assert(salted.count() === plain.count())
    // the hot-key-safe variant: mix a unique column into the salt so
    // even identical duplicate rows spread
    val saltedU = Skew.saltedJoin(
      l.withColumn("uid", monotonically_increasing_id()), o, "l_orderkey",
      saltFactor = 4, uniqueCol = Some("uid"))
    assert(saltedU.count() === plain.count())
    assert(salted.columns.sorted.sameElements(plain.columns.sorted))
    // checksum equality, order-independent
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(col("l_quantity")), sum(col("o_totalprice"))).head().toString
    assert(sig(salted) === sig(plain))
  }

  test("monthly snapshot sink partitions by month and prunes on read") {
    val out = Files.createTempDirectory("snap").toString
    val df = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
    Sinks.writeMonthlySnapshot(df, "o_orderdate", out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("txn_month=")))
    assert(dirs.length > 12, s"expected many month partitions, got ${dirs.length}")
    val oneMonth = dirs.head.stripPrefix("txn_month=")
    val read = spark.read.parquet(out).filter(col("txn_month") === oneMonth)
    read.count()
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(df.count() === spark.read.parquet(out).count())
  }

  test("key-partitioned sink co-locates keys into the requested file count") {
    val out = Files.createTempDirectory("keyed").toString
    Sinks.writeKeyPartitioned(Tables.orders(spark, sf), "o_custkey", out, numFiles = 8)
    val files = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files === 8)
    assert(spark.read.parquet(out).count() === Tables.orders(spark, sf).count())
  }

  test("persisted IVF index: probe prunes to the probed cell partitions and matches inline search") {
    import graft.operators.{IvfIndex, SimilarityOps}
    val idx = Files.createTempDirectory("ivfidx").toString
    val v0 = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    IvfIndex.build(v0, idx, kCells = 8, iters = 1)
    val queries = v0.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val fromIndex = IvfIndex.probe(spark, idx, queries, k = 5, nProbe = 2)
    // same search against an in-memory assignment built from the SAME
    // persisted centroids — proves the persisted layout loses nothing.
    // The persisted probe treats query ids as an EXTERNAL numbering
    // (no self-exclusion), so the inline comparison disables it too.
    val cents = IvfIndex.centroids(spark, idx)
    val v = v0.withColumn("nrm", SimilarityOps.norm(col("embedding")))
    val q = queries.withColumn("q_nrm", SimilarityOps.norm(col("q_emb")))
    val inline = SimilarityOps.searchAssigned(
      SimilarityOps.nearestCell(v, cents),
      SimilarityOps.probeCells(cents, q, nProbe = 2), k = 5, excludeSelf = false)
    assert(fromIndex.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      inline.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    // externally-numbered probe: a corpus vec_id colliding with a
    // query_id is a legitimate neighbor, NOT silently dropped — here
    // the identical vector ranks first with cosine ≈ 1
    val top = fromIndex.filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    queries.collect().map(_.getLong(0)).foreach { qid =>
      assert(top(qid)._1 === qid && top(qid)._2 > 0.999,
        s"query $qid should see its id-colliding corpus twin at rank 1")
    }
    // the probe scan must prune cell directories, not filter rows
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), plan)
    // corpus layout is actually cell-partitioned on disk
    val dirs = new java.io.File(idx + "/corpus").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("cell=")))
  }

  test("snapshot compaction bin-packs each month to its target file count") {
    import graft.sources.Sinks
    val table = Files.createTempDirectory("compact").toString + "/t"
    val df = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"),
        to_date(col("o_orderdate")).as("transaction_date"))
    // repartition(8) fragments every month into 8 files — the shape an
    // append-heavy table drifts into
    Sinks.publishSnapshot(df.repartition(8), "transaction_date", table)
    def monthFiles(): Map[String, Int] = {
      val vdir = new java.io.File(Sinks.currentVersionDir(spark, table))
      vdir.listFiles().filter(f => f.isDirectory && f.getName.startsWith("txn_month="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    def checksum(): (Long, Long) = {
      // key-sum is order-independent (a double sum would wobble with
      // the partitioning under test)
      val r = Sinks.readSnapshot(spark, table)
        .agg(count(lit(1)), sum(col("o_orderkey"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val before = monthFiles()
    assert(before.values.max > 1, "fixture should start fragmented")
    val sumBefore = checksum()
    // huge target → every month compacts to exactly one file
    assert(Sinks.compactSnapshot(spark, table, "transaction_date",
      targetFileBytes = 1L << 30) === 2L)
    val after = monthFiles()
    assert(after.keySet === before.keySet)
    assert(after.values.forall(_ === 1), s"not fully compacted: $after")
    assert(checksum() === sumBefore)
    // tiny target (~a few rows per file) → months SPLIT again
    // (bin-packing works both directions)
    Sinks.compactSnapshot(spark, table, "transaction_date", targetFileBytes = 64)
    assert(monthFiles().values.max > 1)
    assert(checksum() === sumBefore)
  }

  test("compaction splits a giant month across multiple writer tasks") {
    import graft.sources.Sinks
    val table = Files.createTempDirectory("bigmonth").toString + "/t"
    // one hot month — the case the old single-task-per-month layout
    // serialized onto one writer
    val df = spark.range(20000).select(
      col("id").as("k"),
      (rand(7) * 1000).as("v"),
      to_date(lit("2024-06-15")).as("transaction_date"))
    Sinks.publishSnapshot(df.repartition(8), "transaction_date", table)
    def monthDir(): java.io.File =
      new java.io.File(Sinks.currentVersionDir(spark, table), "txn_month=2024-06")
    def checksum(): (Long, Long) = {
      val r = Sinks.readSnapshot(spark, table).agg(count(lit(1)), sum(col("k"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val before = checksum()
    val monthBytes = monthDir().listFiles().map(_.length()).sum
    // target ≈ an eighth of the month → the month must split
    Sinks.compactSnapshot(spark, table, "transaction_date",
      targetFileBytes = math.max(1L, monthBytes / 8))
    val parts = monthDir().listFiles().map(_.getName).filter(_.endsWith(".parquet"))
    assert(parts.length >= 2, s"month did not split: ${parts.toSeq}")
    // part-NNNNN is the writer task id: >1 distinct id = parallel write
    val taskIds = parts.flatMap("part-(\\d+)-".r.findFirstMatchIn(_)).map(_.group(1)).distinct
    assert(taskIds.length > 1, s"month written by a single task: ${parts.toSeq}")
    assert(checksum() === before)
  }

  test("publishSnapshot expectedVersion: optimistic-concurrency abort writes nothing") {
    import graft.sources.{ConcurrentSnapshotUpdate, Sinks}
    val table = Files.createTempDirectory("occ").toString + "/t"
    val df = spark.range(100).select(col("id").as("k"),
      to_date(lit("2024-01-01")).as("transaction_date"))
    assert(Sinks.publishSnapshot(df, "transaction_date", table) === 1L)
    assert(Sinks.publishSnapshot(df, "transaction_date", table,
      expectedVersion = Some(2L)) === 2L)
    // a compaction of v1 arriving now would demand v2 — already taken
    intercept[ConcurrentSnapshotUpdate] {
      Sinks.publishSnapshot(df, "transaction_date", table, expectedVersion = Some(2L))
    }
    assert(Sinks.currentVersion(spark, table) === Some(2L))
    assert(!new java.io.File(table, "v00000003").exists(), "aborted publish wrote data")
    // an exact-version abort burns NOTHING — the very next publish
    // takes 3 (unique and monotone; gaps only from crashes)
    (3L to 6L).foreach { v =>
      assert(Sinks.publishSnapshot(df, "transaction_date", table) === v)
    }
    // claim sweep: with retainVersions=2 the oldest retained committed
    // version is 5 — every claim below it must be pruned, bounding
    // inode growth
    val claims = new java.io.File(table, "_claims").listFiles().map(_.getName)
    assert(claims.forall(_.stripPrefix("c").toLong >= 5L), claims.toSeq.toString)
  }

  test("compaction yields to a contending claim and succeeds once publishes move past it") {
    import graft.sources.{ConcurrentSnapshotUpdate, Sinks}
    val table = Files.createTempDirectory("occ_retry").toString + "/t"
    val df = spark.range(500).select(col("id").as("k"),
      to_date(lit("2024-03-01")).as("transaction_date"))
    Sinks.publishSnapshot(df, "transaction_date", table) // v1
    // a "publisher crashed between claim and write": claim c2 exists,
    // no data, no marker — compaction may only commit as v2, so every
    // attempt must abort (cheaply, before writing) rather than shadow
    // a possibly-live writer
    val c2 = new java.io.File(table, "_claims/c00000002")
    assert(c2.createNewFile())
    intercept[ConcurrentSnapshotUpdate] {
      Sinks.compactSnapshot(spark, table, "transaction_date", maxAttempts = 2)
    }
    assert(Sinks.currentVersion(spark, table) === Some(1L))
    assert(!new java.io.File(table, "v00000003").exists(), "aborted compaction wrote data")
    // a real publish moves the frontier past the orphan…
    assert(Sinks.publishSnapshot(df, "transaction_date", table) === 3L)
    // …and the next maintenance pass compacts that version as v4
    assert(Sinks.compactSnapshot(spark, table, "transaction_date") === 4L)
    val r = Sinks.readSnapshot(spark, table).agg(count(lit(1)), sum(col("k"))).head()
    assert((r.getLong(0), r.getLong(1)) === (500L, 500L * 499 / 2))
  }

  test("4-column z-order (numeric, date, string): trailing columns still prune") {
    import graft.sources.ZOrder
    val out = Files.createTempDirectory("zorder4").toString
    val df = Tables.orders(spark, sf)
      .select(col("o_custkey").cast("double").as("ck"), col("o_totalprice").as("tp"),
        to_date(col("o_orderdate")).as("od"), col("o_orderpriority").as("pr"))
    // 4 cols × 8 bits = 32 bits — over the old int budget, inside the
    // long one; date and string columns ride their numeric surrogates
    ZOrder.writeZOrdered(df, Seq("ck", "tp", "od", "pr"), out, nFiles = 16)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length === 16)
    assert(spark.read.parquet(out).count() === df.count())
    val stats = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("od"), max("od"), min("pr"), max("pr")).head()
      (r.getDate(0), r.getDate(1), r.getString(2), r.getString(3))
    }
    // date slice: first quartile of order dates
    val dCut = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
      df.select(unix_date(col("od")).cast("double").as("d")).stat
        .approxQuantile("d", Array(0.25), 0.01).head.toLong))
    val dateTouched = stats.count { case (dMin, _, _, _) => !dMin.after(dCut) }
    assert(dateTouched < files.length, "date-only slice touched every file")
    // string point-lookup on the lexicographically smallest priority
    val prLo = df.agg(min("pr")).head().getString(0)
    val prTouched = stats.count { case (_, _, pMin, pMax) =>
      pMin <= prLo && prLo <= pMax
    }
    assert(prTouched < files.length, "string lookup touched every file")
  }

  test("timestamp z-columns ride the epoch-second surrogate") {
    import graft.sources.ZOrder
    val out = Files.createTempDirectory("zorder_ts").toString
    // raw TIMESTAMP column (the orders fixture's native o_orderdate type)
    val df = Tables.orders(spark, sf).select(col("o_orderdate").as("ts"))
    ZOrder.writeZOrdered(df, Seq("ts"), out, nFiles = 4)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length === 4)
    assert(spark.read.parquet(out).count() === df.count())
    // 1-D curve = a plain sort: per-file time ranges must not interleave
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("ts"), max("ts")).head()
      def epoch(i: Int) = r.getAs[java.time.LocalDateTime](i)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000L
      (epoch(0), epoch(1))
    }.sortBy(_._1)
    ranges.zip(ranges.tail).foreach { case ((_, aMax), (bMin, _)) =>
      assert(aMax <= bMin + 1000L, s"file time ranges interleave: $aMax vs $bMin")
    }
  }

  test("maintain with zorderCols: one republish both bin-packs and clusters") {
    import graft.sources.Sinks
    val table = Files.createTempDirectory("optimize").toString + "/t"
    val df = spark.range(20000).select(
      col("id").as("k"),
      (col("id") % 997).cast("double").as("ck"),
      (rand(11) * 10000).as("tp"),
      to_date(lit("2024-06-15")).as("transaction_date"))
    Sinks.publishSnapshot(df.repartition(8), "transaction_date", table)
    def monthDir(): java.io.File =
      new java.io.File(Sinks.currentVersionDir(spark, table), "txn_month=2024-06")
    def checksum(): (Long, Long) = {
      val r = Sinks.readSnapshot(spark, table).agg(count(lit(1)), sum(col("k"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val before = checksum()
    val monthBytes = monthDir().listFiles().map(_.length()).sum
    assert(Pipeline.maintain(spark, table,
      targetFileBytes = math.max(1L, monthBytes / 8),
      zorderCols = Seq("ck", "tp")) === 2L)
    assert(checksum() === before)
    val files = monthDir().listFiles().map(_.getAbsolutePath)
      .filter(_.endsWith(".parquet"))
    assert(files.length >= 4, s"expected a packed-and-split month, got ${files.length} files")
    // clustering: per-file min/max boxes must let a slice on EITHER
    // z-column skip files — the OPTIMIZE ZORDER property
    val stats = files.map { f =>
      val r = spark.read.parquet(f).agg(min("ck"), max("ck"), min("tp"), max("tp")).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    val ckTouched = stats.count { case (ckMin, _, _, _) => ckMin <= 997 / 4.0 }
    val tpTouched = stats.count { case (_, _, tpMin, _) => tpMin <= 2500.0 }
    assert(ckTouched < files.length, "ck slice touched every file")
    assert(tpTouched < files.length, "tp slice touched every file")
    // the same maintenance call with the Hilbert curve: next version,
    // identical data, still clustered
    assert(Pipeline.maintain(spark, table,
      targetFileBytes = math.max(1L, monthBytes / 8),
      zorderCols = Seq("ck", "tp"), hilbertCurve = true) === 3L)
    assert(checksum() === before)
    val hFiles = monthDir().listFiles().map(_.getAbsolutePath)
      .filter(_.endsWith(".parquet"))
    val hCk = hFiles.map(f => spark.read.parquet(f).agg(min("ck")).head().getDouble(0))
    assert(hCk.count(_ <= 997 / 4.0) < hFiles.length, "hilbert ck slice touched every file")
  }

  test("native bucket id equals the composed fold, boundary values included") {
    import graft.sources.ZOrder
    import spark.implicits._
    val df = Tables.orders(spark, sf).select(col("o_totalprice").as("v"))
    val bounds = df.stat.approxQuantile(Array("v"),
      (1 until 64).map(_ / 64.0).toArray, 0.01)(0).toSeq.distinct.sorted
    // real values — many land EXACTLY on a boundary (they came from
    // the same data), the case where off-by-one bugs live
    val diffs = df
      .withColumn("a", ZOrder.bucketOf(col("v"), bounds))
      .withColumn("b", ZOrder.bucketOfComposed(col("v"), bounds))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diffs === 0L)
    // planted edge values: below-all, exact boundary, between, above-all
    val edge = Seq(bounds.head - 1, bounds.head, (bounds.head + bounds(1)) / 2,
      bounds.last, bounds.last + 1).toDF("v")
    val e = edge
      .withColumn("a", ZOrder.bucketOf(col("v"), bounds))
      .withColumn("b", ZOrder.bucketOfComposed(col("v"), bounds))
      .collect()
    e.foreach(r => assert(r.getInt(1) === r.getInt(2), s"edge ${r.getDouble(0)}"))
  }

  test("z-ordered layout: files cover hypercubes, so boxes on EITHER column prune files") {
    import graft.sources.ZOrder
    val out = Files.createTempDirectory("zorder").toString
    val df = Tables.orders(spark, sf)
      .select(col("o_custkey").cast("double").as("ck"), col("o_totalprice").as("tp"))
    ZOrder.writeZOrdered(df, Seq("ck", "tp"), out, nFiles = 16)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length === 16)
    assert(spark.read.parquet(out).count() === df.count())
    // per-file min/max = exactly what parquet footer pruning sees
    val stats = files.map { f =>
      val r = spark.read.parquet(f).agg(min("ck"), max("ck"), min("tp"), max("tp")).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    val q = df.stat.approxQuantile(Array("ck", "tp"), Array(0.25), 0.01)
    val (ckQ, tpQ) = (q(0)(0), q(1)(0))
    // 2-D quarter box: ideal z-order touches ~1/16 of files; half is
    // the loose bound that still proves multi-column clustering
    val both = stats.count { case (ckMin, _, tpMin, _) => ckMin <= ckQ && tpMin <= tpQ }
    assert(both <= files.length / 2, s"2-D box touched $both/${files.length} files")
    // a slice on the SECOND column alone must also skip — the property
    // a single-column sort layout cannot provide
    val tpOnly = stats.count { case (_, _, tpMin, _) => tpMin <= tpQ }
    assert(tpOnly < files.length, s"tp-only slice touched every file")
  }

  test("snapshot publishes can carry parquet bloom filters on the lookup key") {
    import graft.sources.Sinks
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.api.Binary
    import scala.jdk.CollectionConverters._
    val table = Files.createTempDirectory("bloom").toString + "/t"
    val df = spark.range(5000).select(
      concat(lit("TUID-"), format_string("%08d", col("id") * 7919 % 100000)).as("tuid"),
      col("id").as("k"),
      to_date(lit("2024-05-01")).as("transaction_date"))
    // one file → its bloom covers every written key (a multi-file
    // write gives each file a bloom over only ITS keys)
    Sinks.publishSnapshot(df.coalesce(1), "transaction_date", table,
      writerOptions = Sinks.bloomFilterOptions(Seq("tuid"), expectedNdv = 10000))
    val vdir = new java.io.File(Sinks.currentVersionDir(spark, table))
    val parts = vdir.listFiles().filter(_.getName.startsWith("txn_month="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(parts.nonEmpty)
    val conf = spark.sparkContext.hadoopConfiguration
    parts.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try reader.getRowGroups.asScala.foreach { rg =>
        val byName = rg.getColumns.asScala.map(c => c.getPath.toDotString -> c).toMap
        // the keyed column carries a bloom filter…
        val bloom = reader.getBloomFilterDataReader(rg).readBloomFilter(byName("tuid"))
        assert(bloom != null, s"${f.getName}: no bloom filter on tuid")
        // …that answers membership: a present key hits, a key outside
        // the written domain misses (false negatives are impossible)
        assert(bloom.findHash(bloom.hash(Binary.fromString("TUID-00007919"))))
        assert(!bloom.findHash(bloom.hash(Binary.fromString("TUID-NOT-THERE"))))
        // …and the un-keyed column does not pay for one
        assert(reader.getBloomFilterDataReader(rg).readBloomFilter(byName("k")) == null,
          s"${f.getName}: unexpected bloom filter on k")
      } finally reader.close()
    }
    // the read path is unchanged semantically
    assert(Sinks.readSnapshot(spark, table)
      .filter(col("tuid") === "TUID-00007919").count() >= 1L)
  }

  test("hilbert layout prunes on either column and never cuts more boxes than morton") {
    import graft.sources.ZOrder
    val zOut = Files.createTempDirectory("curve_z").toString
    val hOut = Files.createTempDirectory("curve_h").toString
    val df = Tables.orders(spark, sf)
      .select(col("o_custkey").cast("double").as("ck"), col("o_totalprice").as("tp"))
    ZOrder.writeZOrdered(df, Seq("ck", "tp"), zOut, nFiles = 16)
    ZOrder.writeHilbertOrdered(df, Seq("ck", "tp"), hOut, nFiles = 16)
    assert(spark.read.parquet(hOut).count() === df.count())
    def boxTouch(out: String): (Int, Int, Int) = {
      val files = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      val stats = files.map { f =>
        val r = spark.read.parquet(f).agg(min("ck"), max("ck"), min("tp"), max("tp")).head()
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      }
      val q = df.stat.approxQuantile(Array("ck", "tp"), Array(0.25), 0.01)
      val (ckQ, tpQ) = (q(0)(0), q(1)(0))
      (stats.count { case (ckMin, _, tpMin, _) => ckMin <= ckQ && tpMin <= tpQ },
       stats.count { case (_, _, tpMin, _) => tpMin <= tpQ },
       files.length)
    }
    val (hBoth, hTp, hN) = boxTouch(hOut)
    val (zBoth, _, _) = boxTouch(zOut)
    assert(hN === 16)
    // the multi-column clustering properties the z test pins…
    assert(hBoth <= hN / 2, s"2-D box touched $hBoth/$hN hilbert files")
    assert(hTp < hN, "tp-only slice touched every hilbert file")
    // …and the Hilbert walk (unit steps, no quadrant jumps) must not
    // be WORSE than Morton on the 2-D box — the reason it exists
    assert(hBoth <= zBoth, s"hilbert box-touch $hBoth worse than morton $zBoth")
  }

  test("jsonl corpus round-trips through the split-partitioned gzip sink") {
    import graft.sources.JsonlDocs
    val out = Files.createTempDirectory("jsonl").toString
    val docs = Tables.documents(spark, sf)
      .join(graft.operators.TextOps.splitAssign(spark, sf).select("doc_id", "split"), "doc_id")
      .withColumn("shard", col("doc_id") % 4)
      .select("doc_id", "text", "lang", "source", "split", "shard")
    Sinks.writeCorpusJsonl(docs, out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet.subsetOf(Set("split=train", "split=val", "split=test")))
    val back = JsonlDocs.readClean(spark, out + "/split=train")
    assert(back.columns.toSeq === Seq("doc_id", "text", "lang", "source"))
    val trainIds = docs.filter(col("split") === "train").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(back.collect().map(_.getLong(0)).toSet === trainIds)
  }

  test("jsonl reader quarantines corrupt lines instead of failing the job") {
    import graft.sources.JsonlDocs
    val dir = Files.createTempDirectory("jsonlbad").toFile
    val f = new java.io.File(dir, "part.jsonl")
    val w = new java.io.PrintWriter(f)
    w.println("""{"doc_id": 1, "text": "good line", "lang": "en", "source": "s"}""")
    w.println("""{"doc_id": 2, "text": "truncated""")
    w.println("""not json at all""")
    w.println("""{"doc_id": 3, "text": "also good", "lang": "de", "source": "s"}""")
    w.close()
    val all = JsonlDocs.read(spark, f.getPath)
    assert(all.count() === 4)
    val clean = JsonlDocs.readClean(spark, f.getPath)
    assert(clean.collect().map(_.getLong(0)).toSet === Set(1L, 3L))
  }

  // ---- manifest file stats (zone maps) ---------------------------------

  private def statsFixture(table: String): org.apache.spark.sql.DataFrame = {
    // k range-clustered into 10 tasks → each file covers a narrow k
    // interval; s tracks k (string pruning), c is null for the lower
    // half of k (all-null-file pruning), dt spreads over ~14 months
    val df = spark.range(20000).select(
      col("id").as("k"),
      (col("id") % 97).cast("double").as("p"),
      format_string("w%05d", col("id")).as("s"),
      when(col("id") < 10000, lit(null).cast("long")).otherwise(col("id")).as("c"),
      date_add(to_date(lit("2023-01-01")), (col("id") % 400).cast("int")).as("dt"))
      .repartitionByRange(10, col("k"))
    Sinks.publishSnapshot(df, "dt", table, statsCols = Seq("k", "p", "s", "c"))
    Sinks.readSnapshot(spark, table)
  }

  private def sigOf(df: org.apache.spark.sql.DataFrame) =
    df.agg(count(lit(1)), sum("k"), sum("p"), min("s"), max("s")).head().toString

  test("file-stats manifest: skipping read prunes files and matches the plain filtered read") {
    import graft.sources.FileStats.ColRange
    val table = Files.createTempDirectory("fstats").toString + "/t"
    val full = statsFixture(table)
    val totalFiles = full.inputFiles.length
    assert(totalFiles > 20, s"fixture should span many files, got $totalFiles")

    val kSlice = Sinks.readSnapshotSkipping(spark, table,
      Seq(ColRange("k", Some(0L), Some(999L))))
    assert(kSlice.inputFiles.length < totalFiles / 2,
      s"k-slice read ${kSlice.inputFiles.length} of $totalFiles files")
    assert(kSlice.count() === 1000)
    assert(sigOf(kSlice) === sigOf(full.filter(col("k").between(0, 999))))

    // string interval prunes in parquet's unsigned UTF-8 byte order
    val sSlice = Sinks.readSnapshotSkipping(spark, table,
      Seq(ColRange("s", Some("w00100"), Some("w00299"))))
    assert(sSlice.inputFiles.length < totalFiles / 2)
    assert(sigOf(sSlice) ===
      sigOf(full.filter(col("s") >= "w00100" && col("s") <= "w00299")))

    // a 2-D box composes pruning evidence across columns
    val box = Sinks.readSnapshotSkipping(spark, table,
      Seq(ColRange("k", None, Some(999L)), ColRange("p", None, Some(50.0))))
    assert(sigOf(box) === sigOf(full.filter(col("k") <= 999 && col("p") <= 50.0)))
  }

  test("file-stats manifest: all-null files prune under any bounded range; empty prune keeps schema") {
    import graft.sources.FileStats.ColRange
    val table = Files.createTempDirectory("fstatsn").toString + "/t"
    val full = statsFixture(table)
    val totalFiles = full.inputFiles.length
    // c is entirely null for k < 10000 → those files carry flag n and
    // drop without being opened (a range predicate never matches null)
    val cSlice = Sinks.readSnapshotSkipping(spark, table,
      Seq(ColRange("c", Some(1L), None)))
    assert(cSlice.inputFiles.length < totalFiles)
    assert(cSlice.count() === 10000)
    assert(sigOf(cSlice) === sigOf(full.filter(col("c") >= 1)))
    // a range outside every file's interval prunes everything but
    // keeps the schema (txn_month partition column included)
    val none = Sinks.readSnapshotSkipping(spark, table,
      Seq(ColRange("k", Some(1000000L), None)))
    assert(none.count() === 0)
    assert(none.columns.toSet === full.columns.toSet)
  }

  test("file-stats manifest: long string extrema truncate to sound outer bounds") {
    import graft.sources.FileStats.ColRange
    val table = Files.createTempDirectory("fstatst").toString + "/t"
    // a free-text-shaped column: hundreds of chars, sortable prefix —
    // full extrema in the manifest would embed two documents per file
    val df = spark.range(0, 2000)
      .selectExpr("id AS k",
        "concat('doc-', lpad(id, 6, '0'), '-', repeat('lorem ipsum ', 40)) AS body",
        "date_add(DATE '2024-01-01', CAST(id % 3 AS INT)) AS dt")
      .repartitionByRange(8, col("k"))
    Sinks.publishSnapshot(df, "dt", table, statsCols = Seq("k", "body"))
    // the manifest stays small: no stored bound longer than the cap + 1
    val meta = Sinks.versionMeta(spark, table, 1L)(graft.sources.FileStats.metaName)
    assert(meta.length < 20000, s"manifest is ${meta.length} bytes")
    assert(!meta.contains("lorem ipsum lorem ipsum lorem ipsum lorem ipsum lorem ipsum lorem"),
      "a full document leaked into the manifest")
    // pruning on the truncated bounds is still evidence-based: the
    // skipping read drops files yet matches the plain filtered read
    val full = Sinks.readSnapshot(spark, table)
    val slice = Sinks.readSnapshotSkipping(spark, table,
      Seq(ColRange("body", Some("doc-000100"), Some("doc-000399"))))
    assert(slice.inputFiles.length < full.inputFiles.length,
      s"expected pruning, read ${slice.inputFiles.length} of ${full.inputFiles.length}")
    assert(slice.agg(count(lit(1)), sum("k")).head().toString ===
      full.filter(col("body") >= "doc-000100" && col("body") <= "doc-000399")
        .agg(count(lit(1)), sum("k")).head().toString)
    // metadata aggregates: count(body) still serves (null counts are
    // exact, independent of truncation) — min/max must REFUSE: a
    // truncated bound is not a value that occurs in the data
    spark.read.format("graft-table").load(table).createOrReplaceTempView("fstats_t")
    val served = spark.sql("SELECT count(*) AS n, count(body) AS nb FROM fstats_t")
    assert(served.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
    val sr = served.head()
    assert(sr.getLong(0) === 2000L && sr.getLong(1) === 2000L)
    val refused = spark.sql("SELECT min(body) AS mn, max(body) AS mx FROM fstats_t")
    assert(!refused.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
    val rr = refused.head()
    assert(rr.getString(0).startsWith("doc-000000-") &&
      rr.getString(1).startsWith("doc-001999-"))
  }

  test("file-stats manifest: compaction recomputes stats for the rewritten layout") {
    import graft.sources.{FileStats, Sinks}
    import graft.sources.FileStats.ColRange
    val table = Files.createTempDirectory("fstatsc").toString + "/t"
    val full = statsFixture(table)
    val expected = sigOf(full.filter(col("k").between(0, 999)))
    val v2 = Sinks.compactSnapshot(spark, table, "dt", targetFileBytes = 1L << 20)
    val meta = Sinks.versionMeta(spark, table, v2)
    assert(meta.contains(FileStats.metaName), "compacted version lost its stats manifest")
    assert(FileStats.colsOf(meta(FileStats.metaName)) === Seq("k", "p", "s", "c"))
    // the manifest describes the files that EXIST now — every entry
    // must resolve inside the compacted version dir
    val vdir = Sinks.currentVersionDir(spark, table)
    val kept = FileStats.prune(meta(FileStats.metaName),
      Seq(ColRange("k", Some(0L), Some(999L))))
    assert(kept.nonEmpty)
    kept.foreach(p => assert(new java.io.File(s"$vdir/$p").exists(), s"stale stats path $p"))
    val skim = Sinks.readSnapshotSkipping(spark, table,
      Seq(ColRange("k", Some(0L), Some(999L))))
    assert(sigOf(skim) === expected)
  }

  test("file-stats manifest: z-ordered compaction tightens pruning on BOTH clustered columns") {
    import graft.sources.FileStats.ColRange
    val table = Files.createTempDirectory("fstatsz").toString + "/t"
    // write UNCLUSTERED on purpose: (k, p) scattered across files →
    // stats intervals span the domain and prune nothing
    val df = spark.range(20000).select(
      col("id").as("k"),
      pmod(col("id") * 7919, lit(20000)).as("p"),
      to_date(lit("2024-06-01")).as("dt"))
      .repartition(16) // round-robin: every file sees the full k range
    Sinks.publishSnapshot(df, "dt", table, statsCols = Seq("k", "p"))
    val before = Sinks.readSnapshotSkipping(spark, table,
      Seq(ColRange("k", Some(0L), Some(999L)))).inputFiles.length
    val total = Sinks.readSnapshot(spark, table).inputFiles.length
    assert(before === total, "scattered layout should not prune (intervals span the domain)")
    // one maintenance pass: z-order on (k, p) AND recompute stats —
    // the same publish does both, and the skipping read now prunes on
    // EITHER clustered column
    Sinks.compactSnapshot(spark, table, "dt", targetFileBytes = 16L << 10,
      zorderCols = Seq("k", "p"))
    val kAfter = Sinks.readSnapshotSkipping(spark, table,
      Seq(ColRange("k", Some(0L), Some(999L))))
    val pAfter = Sinks.readSnapshotSkipping(spark, table,
      Seq(ColRange("p", Some(0L), Some(999L))))
    val totalAfter = Sinks.readSnapshot(spark, table).inputFiles.length
    assert(kAfter.inputFiles.length < totalAfter,
      s"k-slice still reads ${kAfter.inputFiles.length}/$totalAfter files after z-order")
    assert(pAfter.inputFiles.length < totalAfter,
      s"p-slice still reads ${pAfter.inputFiles.length}/$totalAfter files after z-order")
    assert(kAfter.count() === 1000)
    assert(pAfter.count() === 1000)
  }

  test("file-stats manifest: uncovered and unsupported columns degrade to full reads, never wrong ones") {
    import graft.sources.FileStats.ColRange
    val table = Files.createTempDirectory("fstatsu").toString + "/t"
    // statsCols includes a boolean — no sound total order here → flag u
    val df = spark.range(5000).select(
      col("id").as("k"),
      (col("id") % 2 === 0).as("b"),
      to_date(lit("2024-03-01")).as("dt"))
      .repartitionByRange(4, col("k"))
    Sinks.publishSnapshot(df, "dt", table, statsCols = Seq("k", "b"))
    val full = Sinks.readSnapshot(spark, table)
    // range on a column with unknown stats keeps every file but still
    // filters rows
    val bSlice = Sinks.readSnapshotSkipping(spark, table,
      Seq(ColRange("k", None, Some(4999L))))
    assert(bSlice.count() === 5000)
    // range on a column NOT in the manifest: residual filter only
    val pSlice = Sinks.readSnapshotSkipping(spark, table,
      Seq(ColRange("txn_month", Some("2024-03"), Some("2024-03"))))
    assert(pSlice.count() === full.count())
  }
}
