package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.native._

/** Value semantics of the native Catalyst expressions, checked against
  * plain-Scala reference implementations. */
class ExpressionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("dot_f matches a scala reference dot product and the composed zip_with form") {
    val a = Array(1.0f, 2.0f, 3.0f, 0.5f)
    val b = Array(4.0f, -1.0f, 0.25f, 8.0f)
    val expected = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val df = Seq((a, b)).toDF("a", "b")
    val native = df.select(dot_f(col("a"), col("b"))).as[Double].head()
    val composed = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)).as[Double].head()
    assert(native === expected)
    assert(native === composed)
  }

  test("nfc_normalize composes NFD, passes NFC through by reference; eval = codegen") {
    val nfd = "cafe\u0301 A\u030Agua"  // decomposed e-acute, A-ring
    val nfc = "caf\u00E9 \u00C5gua"    // precomposed twins
    val docs = Seq((1L, nfd), (2L, nfc), (3L, "plain ascii"), (4L, ""))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        graft.functions.native.nfc_normalize(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(nfd !== nfc)               // the fixture really is two encodings
    assert(out(1L) === nfc)           // composition happened
    assert(out(2L) === nfc)           // already-NFC unchanged
    assert(out(3L) === "plain ascii") // ASCII fast path
    assert(out(4L) === "")
    // interpreted eval agrees with the df (codegen) path
    import org.apache.spark.sql.catalyst.expressions.Literal
    val evaled = org.apache.spark.sql.graft.NfcNormalize(Literal(nfd))
      .eval(null).toString
    assert(evaled === nfc)
    // the SQL surface is registered through GraftExtensions (Spark
    // chr() is ASCII-mod-256, so the combining acute rides a \u escape)
    assert(spark.sql("SELECT nfc_normalize('cafe\\u0301') AS n")
      .head().getString(0) === "caf\u00E9")
    // matches the JDK normalizer on arbitrary combining sequences
    // (dot-below/dot-above in both orders -> canonical reordering)
    val tricky = "q\u0323\u0307 x\u0307\u0323"
    val got = docs.sparkSession.range(1).select(
      graft.functions.native.nfc_normalize(lit(tricky))).head().getString(0)
    assert(got === java.text.Normalizer.normalize(tricky, java.text.Normalizer.Form.NFC))
  }

  test("deflate_size separates repetition from randomness; eval = codegen") {
    // deterministic pseudo-random text via an LCG (no Random seed API
    // drift), printable ASCII so UTF-8 length == char count
    var x = 123456789L
    val rnd = new StringBuilder
    (1 to 400).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      rnd.append((33 + Math.floorMod(x >>> 33, 94L)).toChar)
    }
    val docs = Seq(
      (1L, "ab" * 200),      // 400 bytes of pure repetition
      (2L, rnd.toString),    // 400 bytes of LCG noise
      (3L, "")
    ).toDF("doc_id", "text")
    val m = docs.select(col("doc_id"), deflate_size(col("text")).as("z"))
      .as[(Long, Int)].collect().toMap
    // repetition compresses below 10%; noise stays above 60%
    assert(m(1L) * 100 < 400 * 10, s"repetitive ratio too high: ${m(1L)}")
    assert(m(2L) * 100 > 400 * 60, s"random ratio too low: ${m(2L)}")
    assert(m(3L) > 0 && m(3L) <= 8) // deflate's empty-stream frame
    // interpreted eval agrees with the df (codegen) path
    import org.apache.spark.sql.catalyst.expressions.Literal
    val evaled = org.apache.spark.sql.graft.DeflateSize(Literal("ab" * 200))
      .eval(null).asInstanceOf[Int]
    assert(evaled === m(1L))
    // and the flags classify accordingly through the operator (maxPct
    // lowered to 80: printable-ASCII noise deflates to ~83% — Huffman
    // recovers the 6.55-vs-8-bit alphabet slack even without matches)
    val flags = graft.operators.TextOps.compressionScoreOf(docs, maxPct = 80).collect()
      .map(r => r.getLong(0) -> ((r.getInt(3), r.getInt(4), r.getInt(5)))).toMap
    assert(flags(1L) === ((1, 0, 0))) // repetitive
    assert(flags(2L) === ((0, 1, 0))) // random
    assert(flags(3L) === ((0, 0, 0))) // empty: neither, not kept
  }

  test("merge_pair: leftmost non-overlapping BPE rewrite; eval = codegen") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "b", "b")),
      (2L, Seq("a", "a", "a")),   // overlap: leftmost wins, no chain
      (3L, Seq("x")),
      (4L, Seq.empty[String])
    ).toDF("id", "syms")
    val outAb = df.select(col("id"), merge_pair(col("syms"), lit("a"), lit("b")))
      .as[(Long, Seq[String])].collect().toMap
    assert(outAb(1L) === Seq("ab", "ab", "b"))
    assert(outAb(3L) === Seq("x") && outAb(4L) === Seq.empty)
    val outAa = df.select(col("id"), merge_pair(col("syms"), lit("a"), lit("a")))
      .as[(Long, Seq[String])].collect().toMap
    assert(outAa(2L) === Seq("aa", "a")) // not ("aa" then merge again)
    // concatenation is preserved by any merge (the BPE invariant)
    assert(outAb(1L).mkString === "ababb" && outAa(2L).mkString === "aaa")
    // interpreted eval agrees with the codegen path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val evaled = org.apache.spark.sql.graft.MergePair(
      Literal.create(Seq("a", "b", "a", "b", "b"),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      Literal("a"), Literal("b")).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until evaled.numElements()).map(evaled.getUTF8String(_).toString)
      === Seq("ab", "ab", "b"))
  }

  test("count-min sketch: reference-exact, overcount-only, partition-invariant") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.graft.CountMinSketch
    val rnd = new scala.util.Random(11)
    val vocab = Seq.tabulate(40)(i => s"tok$i")
    // zipf-ish draws so counts differ
    val tokens = Seq.fill(600)(vocab(math.min(rnd.nextInt(40), rnd.nextInt(40))))
    val truth = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (depth, width) = (3, 64) // width < vocab·2 → collisions happen
    val df = tokens.map(Tuple1(_)).toDF("token")
    val sk = df.agg(count_min_sketch_agg(col("token"), depth, width))
      .head().getSeq[Long](0).toArray
    // bit-exact vs a plain-Scala replay of the same kernel
    val ref = new Array[Long](depth * width)
    tokens.foreach { t =>
      (0 until depth).foreach { d =>
        ref(d * width + CountMinSketch.bucket(UTF8String.fromString(t), d, width)) += 1L
      }
    }
    assert(sk.toSeq === ref.toSeq)
    // estimates never undercount; collisions were actually exercised
    val ests = vocab.map(t =>
      t -> CountMinSketch.estimate(sk, UTF8String.fromString(t), depth, width)).toMap
    vocab.foreach { t =>
      assert(ests(t) >= truth.getOrElse(t, 0L), s"$t undercounted")
    }
    assert(vocab.exists(t => ests(t) > truth.getOrElse(t, 0L)),
      "no collision at width 64 — the overcount branch went untested")
    // a wide sketch is exact on this vocabulary
    val wide = df.agg(count_min_sketch_agg(col("token"), depth, 4096))
      .head().getSeq[Long](0).toArray
    vocab.foreach { t =>
      assert(CountMinSketch.estimate(wide, UTF8String.fromString(t), depth, 4096)
        === truth.getOrElse(t, 0L))
    }
    // pointwise merge: any partitioning yields the identical sketch
    val sk7 = df.repartition(7).agg(count_min_sketch_agg(col("token"), depth, width))
      .head().getSeq[Long](0).toArray
    assert(sk7.toSeq === sk.toSeq)
  }

  test("merge_pair preserves concatenation and never overlaps, randomized") {
    val rnd = new scala.util.Random(77)
    val syms = Seq("a", "b", "c", "ab")
    val rows = Seq.tabulate(60)(i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(syms(rnd.nextInt(syms.length)))))
    val df = rows.toDF("id", "s")
    for ((l, r) <- Seq(("a", "b"), ("b", "b"), ("ab", "c"))) {
      val out = df.select(col("id"), merge_pair(col("s"), lit(l), lit(r)))
        .as[(Long, Seq[String])].collect().toMap
      rows.foreach { case (id, in) =>
        val o = out(id)
        assert(o.mkString === in.mkString, s"concat broken for $in with ($l,$r)")
        // a merged symbol is never the left half of another merge in
        // the same pass (leftmost non-overlapping semantics): scanning
        // the reference single pass reproduces the output exactly
        val ref = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < in.length) {
          if (i + 1 < in.length && in(i) == l && in(i + 1) == r) {
            ref += (l + r); i += 2
          } else { ref += in(i); i += 1 }
        }
        assert(o === ref.toSeq, s"pass semantics broken for $in with ($l,$r)")
      }
    }
  }

  test("hilbert index is a true Hilbert curve: bijective with unit steps, exhaustively") {
    // every cell of small 2-D/3-D/4-D grids through the REGISTERED
    // expression (not just the kernel): indices must be a permutation
    // of 0..cells-1, and walking them in order must move exactly one
    // coordinate by exactly 1 each step — the defining property Morton
    // order lacks (its quadrant jumps are what Hilbert removes)
    for ((n, bits) <- Seq((2, 3), (3, 2), (4, 2))) {
      val size = 1 << bits
      val cells = Seq.fill(n)(0 until size).foldLeft(Seq(Seq.empty[Int])) {
        (acc, r) => acc.flatMap(p => r.map(p :+ _))
      }
      val got = cells.map(_.toArray).toDF("c")
        .select(col("c"), hilbert_index(col("c"), bits).as("h"))
        .collect().map(r => r.getSeq[Int](0) -> r.getLong(1))
      assert(got.map(_._2).sorted.sameElements(cells.indices.map(_.toLong)),
        s"$n-D/$bits-bit indices are not a permutation")
      val walk = got.sortBy(_._2).map(_._1).toSeq
      walk.zip(walk.tail).foreach { case (a, b) =>
        val d = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
        assert(d === 1, s"$n-D/$bits-bit walk jumps from $a to $b")
      }
    }
  }

  test("dot_f handles nulls and empty arrays") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]]),
                 (Some(Array.empty[Float]), Some(Array.empty[Float]))).toDF("a", "b")
    val out = df.select(dot_f(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) === 0.0)
  }

  test("poly_hash64 matches the scala reference rolling hash") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xff))
    val inputs = Seq("", "a", "hello world", "ünïcødé 中文", "x" * 1000)
    val got = inputs.toDF("s").select(poly_hash64(col("s"))).as[Long].collect()
    assert(got.toSeq === inputs.map(ref))
  }

  test("poly_hash64 is injective on distinct sample docs and stable across runs") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val h1 = docs.select(poly_hash64(col("text"))).as[Long].collect()
    val h2 = docs.select(poly_hash64(col("text"))).as[Long].collect()
    assert(h1.toSeq === h2.toSeq)
  }

  test("winnow fingerprints overlap heavily for a small edit, little for different docs") {
    val base = "the quick brown fox jumps over the lazy dog " * 10
    val edited = base.replaceFirst("lazy", "idle")
    val other = "entirely unrelated content with different words " * 10
    val df = Seq((1L, base), (2L, edited), (3L, other)).toDF("id", "text")
    val fps = df.select(col("id"), winnow_fingerprint(col("text")).as("fp"))
      .as[(Long, Array[Long])].collect().toMap
    def jac(a: Array[Long], b: Array[Long]) = {
      val (sa, sb) = (a.toSet, b.toSet)
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    assert(jac(fps(1L), fps(2L)) > 0.7, "near-identical docs must share fingerprints")
    assert(jac(fps(1L), fps(3L)) < 0.1, "unrelated docs must not")
  }

  test("winnow guarantee: shared substring of length >= k+w-1 yields a shared fingerprint") {
    val shared = "ABCDEFGHIJKLMNOPQR" // length 18 >= 5+4-1
    val d1 = s"xxxxxxxx${shared}yyyyyyyy"
    val d2 = s"qqqqqqqqqq${shared}zzzz"
    val fps = Seq((1L, d1), (2L, d2)).toDF("id", "text")
      .select(col("id"), winnow_fingerprint(col("text")).as("fp"))
      .as[(Long, Array[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
  }

  test("WordSetScores equals the \\b-regex counts, including boundary edge cases") {
    import graft.operators.TextOps
    val texts = Seq(
      "the cat and the dog",           // plain hits
      "it's the1 lala the_x the",      // boundaries: apostrophe splits, digits/underscore join
      "THE THE the",                   // caller lowercases
      "", "   ", "中文 the 中文",        // empty / whitespace / CJK-delimited
      "a-the-b the,und;von"            // punctuation boundaries
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val dicts = TextOps.langDicts.map(_._2)
    val native = df.select(col("doc_id"),
      graft.functions.native.word_set_scores(lower(col("text")), dicts).as("sc"))
      .as[(Long, Seq[Long])].collect().toMap
    val regex = df.select(col("doc_id"),
      array(dicts.map(d => size(regexp_extract_all(lower(col("text")),
        lit("\\b(" + d.mkString("|") + ")\\b"), lit(0))).cast("long")): _*).as("sc"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native === regex)
  }

  test("CharClassCounts equals the regex character-class counts") {
    val texts = Seq("", "abc DEF 123", "...!?'\"", "中文 mixed, text!", "  \t ")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = df.select(col("doc_id"),
      graft.functions.native.char_class_counts(col("text")).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    val regex = df.select(col("doc_id"), array(
      length(col("text")).cast("long"),
      length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long"),
      length(regexp_replace(col("text"), "[^.,;:!?'\"]", "")).cast("long")).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native === regex)
  }

  test("SimHashAgg equals the 64-column conditional-sum formulation") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val words = docs
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("h", xxhash64(col("word")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val reference = words.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseXOR(b)).as("simhash"))
      .as[(Long, Long)].collect().toMap
    val agg = graft.operators.NearDedup.simHashes(docs)
      .as[(Long, Long)].collect().toMap
    assert(agg === reference)
  }

  test("hyperplane_buckets: deterministic, bounded, scale-invariant sign bits") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(20)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val nBands = 8; val nPlanes = 4
    val out = df.select(col("vec_id"),
      hyperplane_buckets(col("embedding"), nBands, nPlanes).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out.values.forall(_.length === nBands))
    assert(out.values.flatten.forall(b => b >= 0 && b < (1L << nPlanes)))
    // deterministic across plans
    val again = df.select(col("vec_id"),
      hyperplane_buckets(col("embedding"), nBands, nPlanes).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(again === out)
    // sign bits depend only on direction: a positively-scaled vector
    // lands in exactly the same buckets
    val scaled = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_ * 3.5f)) }
      .toDF("vec_id", "embedding")
    val outScaled = scaled.select(col("vec_id"),
      hyperplane_buckets(col("embedding"), nBands, nPlanes).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(outScaled === out)
    // eval path (no codegen) agrees bit-for-bit with the codegen path
    val expr = org.apache.spark.sql.graft.HyperplaneBuckets(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        vecs.head, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      nBands, nPlanes)
    val evaled = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    assert(evaled === out(0L))
  }

  test("minhash_signature is bit-identical to the composed array_min/transform form") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(20)(Seq.fill(1 + rnd.nextInt(30))(rnd.nextLong()))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = rows.toDF("doc_id", "s")
    val n = 16
    val nativeSig = df.select(col("doc_id"), minhash_signature(col("s"), n).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val composedSig = df.select(col("doc_id"),
      array((0 until n).map(i =>
        array_min(transform(col("s"), x => xxhash64(lit(i), x)))): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(nativeSig === composedSig)
  }

  test("misra-gries: exact when the vocabulary fits, regardless of partitioning") {
    // vocab of 20 tokens with distinct frequencies, scattered over 7
    // partitions: capacity 32 > vocab → no decrement ever fires, so
    // every merge path must reproduce the exact census
    val toks = (1 to 20).flatMap(i => Seq.fill(i * 3)(s"tok$i"))
    val df = scala.util.Random.shuffle(toks).toDF("t").repartition(7)
    val got = df.agg(misra_gries_topk(col("t"), 32).as("s"))
      .select(explode(col("s")))
      .select(col("col.token"), col("col.est_count"))
      .as[(String, Long)].collect().toMap
    assert(got === (1 to 20).map(i => s"tok$i" -> i.toLong * 3).toMap)
  }

  test("misra-gries: heavy hitter survives a tiny capacity within the undercount bound") {
    // 400 of 1000 tokens are "hh", the rest 600 distinct singletons:
    // with capacity 8, anything above n/(cap+1) = 111 MUST survive,
    // estimates never overcount, and the undercount is bounded
    val toks = Seq.fill(400)("hh") ++ (1 to 600).map(i => s"rare$i")
    val df = scala.util.Random.shuffle(toks).toDF("t").repartition(5)
    val got = df.agg(misra_gries_topk(col("t"), 8).as("s"))
      .select(explode(col("s")))
      .select(col("col.token"), col("col.est_count"))
      .as[(String, Long)].collect().toMap
    assert(got.contains("hh"), s"heavy hitter evicted: $got")
    assert(got("hh") <= 400L, "MG must never overcount")
    assert(400L - got("hh") <= 1000L / 9 + 1, s"undercount beyond bound: ${got("hh")}")
    assert(got.size <= 8)
  }

  test("vocab sketch reproduces the exact census on the corpus (vocab fits capacity)") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val exact = graft.operators.TextOps.vocabStatsOf(docs)
      .select(col("token"), col("cf")).as[(String, Long)].collect()
    val sketch = graft.operators.TextOps.vocabSketchOf(docs)
      .select(col("token"), col("est_count")).as[(String, Long)].collect()
    assert(sketch.toSeq === exact.toSeq) // same tokens, counts, AND order
  }

  test("native functions are callable from SQL via GraftExtensions") {
    // TestSpark session is built by GraftSession, which registers the
    // extensions — so plain SQL can use the engine's functions.
    val d = spark.sql("SELECT dot_f(array(cast(1.0 as float), cast(2.0 as float)), " +
      "array(cast(3.0 as float), cast(4.0 as float))) AS d").head().getDouble(0)
    assert(d === 11.0)
    val h = spark.sql("SELECT poly_hash64('abc') AS h").head().getLong(0)
    val ref = "abc".getBytes("UTF-8").foldLeft(0L)((a, b) => a * 31L + (b & 0xff))
    assert(h === ref)
    assert(spark.sql("SELECT size(winnow_fingerprint('hello world hello world')) AS n")
      .head().getInt(0) > 0)
    assert(spark.sql(
      "SELECT size(hyperplane_buckets(array(cast(1.0 as float), cast(-2.0 as float)), 4, 3)) AS n")
      .head().getInt(0) === 4)
    assert(spark.sql(
      "SELECT size(minhash_signature(array(1L, 2L, 3L), 8)) AS n").head().getInt(0) === 8)
    assert(spark.sql(
      "SELECT repetition_stats('a b a b c') AS r").head().getSeq[Long](0) === Seq(5L, 3L, 2L))
    assert(spark.sql("SELECT deflate_size(repeat('ab', 200)) AS z").head().getInt(0) ===
      org.apache.spark.sql.graft.DeflateSize.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("ab" * 200)))
    assert(spark.sql("SELECT merge_pair(array('a','b','b'), 'a', 'b') AS m")
      .head().getSeq[String](0) === Seq("ab", "b"))
    // the SQL hilbert index agrees with the registered expression
    val sqlH = spark.sql("SELECT hilbert_index(array(1, 2), 2) AS h").head().getLong(0)
    val colH = Seq((Seq(1, 2))).toDF("cells")
      .select(hilbert_index(col("cells"), 2)).head().getLong(0)
    assert(sqlH === colH)
  }

  test("jaro_winkler matches DuckDB bit-for-bit on pinned references") {
    import org.apache.spark.sql.graft.JaroWinkler
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // values computed with duckdb 1.0 jaro_winkler_similarity — the
    // oracle engine; includes the both-empty-→-0.0 convention, the
    // boost-threshold boundary (CRATE/TRACE sits above 0.7 with a
    // zero prefix) and the integer-halved transposition path
    val pinned = Seq(
      ("martha", "marhta") -> 0.9611111111111111,
      ("DIXON", "DICKSONX") -> 0.8133333333333332,
      ("JELLYFISH", "SMELLYFISH") -> 0.8962962962962964,
      ("", "abc") -> 0.0, ("", "") -> 0.0,
      ("a", "a") -> 1.0, ("abc", "abc") -> 1.0,
      ("CRATE", "TRACE") -> 0.7333333333333334,
      ("arnab", "raanb") -> 0.8666666666666667,
      ("dwayne", "duane") -> 0.8400000000000001,
      ("udvzrjod", "u") -> 0.7375,
      ("crxutmeuiuz", "mtcezap") -> 0.45598845598845594,
      ("zivs", "dzzvaqwlbrj") -> 0.5606060606060607,
      ("qnylwvfghgpg", "vbtxrvn") -> 0.31746031746031744)
    pinned.foreach { case ((a, b), want) =>
      assert(JaroWinkler.compute(u(a), u(b)) === want, s"$a/$b")
      assert(JaroWinkler.compute(u(b), u(a)) === want, s"$b/$a sym")
    }
    // and the column wrapper runs inside whole-stage codegen
    val df = Seq(("martha", "marhta")).toDF("a", "b").repartition(1)
      .select(jaro_winkler(col("a"), col("b")).as("jw"))
      .filter(col("jw") > 0)
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(0.9611111111111111))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.contains("jarowinkler"), plan)
  }

  test("dot_f runs inside whole-stage codegen (no fallback in the ANN plan)") {
    val df = graft.sources.Tables.embeddings(spark, sf)
      .select(dot_f(col("embedding"), col("embedding")).as("d")).filter(col("d") > 0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen stage marker in plan strings
    assert(plan.contains("*(1)"), plan)
    assert(plan.contains("dotproductf"), plan)
    // and the ANN plan actually uses the native expression
    val ann = operators.SimilarityOps.annBruteForce(spark, sf, 2, 3)
    assert(ann.queryExecution.executedPlan.toString.contains("dotproductf"))
  }
}
