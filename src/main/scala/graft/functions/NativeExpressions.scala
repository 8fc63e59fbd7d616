// Hosted under org.apache.spark.sql so the expressions can use the
// private[sql] ExpectsInputTypes/AbstractDataType machinery and the
// Column↔Expression bridge — the standard packaging for Catalyst
// extension libraries.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot paths where composed
  * built-ins are wasteful (SURVEY.md §4). Every scalar expression is
  * whole-stage-codegen capable — kernels are shared between eval and
  * generated code (static call, or an expression reference object
  * where instance state like dictionary sets is needed), so no
  * operator splits the scan pipeline.
  */

/** dot(a, b) over two float vectors, accumulated left-to-right in
  * double — replaces zip_with+aggregate, which materializes an
  * intermediate array per pair. Same accumulation order → bit-identical
  * to the composed version. */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  // mismatched lengths → null, matching zip_with+aggregate (which
  // null-pads the shorter side and poisons the sum) — a truncated
  // partial dot product would silently rank corrupt vectors instead
  // of surfacing them
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    $acc += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductF =
    copy(left = l, right = r)
}

object BucketId {
  /** Count of sorted `bounds` ≤ v — binary search, shared by eval and
    * generated code. -0.0 normalizes to 0.0 first: Spark's `>=` treats
    * them equal while `Arrays.binarySearch` orders them, and the
    * composed reference formulation must stay bit-equal. */
  def bucket(bounds: Array[Double], v0: Double): Int = {
    val v = if (v0 == 0.0d) 0.0d else v0
    val idx = java.util.Arrays.binarySearch(bounds, v)
    if (idx >= 0) idx + 1 else -(idx + 1)
  }
}

/** Equi-depth bucket id of a double against a sorted boundary array:
  * a per-row binary search (log₂ 256 = 8 compares) replacing the
  * composed `aggregate` fold over a 256-element literal array (256
  * interpreted compares per row per column) — the z-order write path's
  * hot loop. NaN ranks after every boundary, matching Spark's
  * NaN-greatest comparison semantics. */
case class BucketId(child: Expression, bounds: Seq[Double])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  private lazy val arr: Array[Double] = bounds.toArray

  override protected def nullSafeEval(v: Any): Any =
    BucketId.bucket(arr, v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", arr, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graft.BucketId.bucket($ref, $v);")
  }

  override protected def withNewChildInternal(c: Expression): BucketId = copy(child = c)
}

object HilbertIndex {
  /** Hilbert distance of an n-dimensional point with `bits` bits per
    * coordinate: Skilling's axes→transpose transform (John Skilling,
    * "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004)
    * followed by an MSB-first dimension-cycling bit interleave. The
    * unit-step property (consecutive indices = grid neighbors) is
    * spec-verified exhaustively on small grids. */
  def index(coords: ArrayData, bits: Int): Long = {
    val n = coords.numElements()
    val x = new Array[Long](n)
    var i = 0
    while (i < n) { x(i) = coords.getInt(i).toLong; i += 1 }
    var q = 1L << (bits - 1)
    while (q > 1) { // axes → transpose, in place
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 } // Gray encode
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    var h = 0L // transpose → index: MSB-first, cycling dimensions
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) { h = (h << 1) | ((x(i) >> b) & 1L); i += 1 }
      b -= 1
    }
    h
  }
}

/** Hilbert-curve index of an array of bucket ids (each in
  * 0..2^bits−1): the locality-preserving alternative to the Morton/
  * z-value interleave — a Hilbert walk never takes the long diagonal
  * jumps Morton order takes between quadrants, so file boundaries cut
  * fewer hypercubes (the idea behind Databricks' Hilbert-based
  * clustering). Null coordinates must be resolved to bucket 0 BEFORE
  * the array (same contract as the z-value path). */
case class HilbertIndex(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 16, "bits per coordinate must be 1..16")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    HilbertIndex.index(v.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cls = HilbertIndex.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.index($v, $bits);"
    })

  override protected def withNewChildInternal(c: Expression): HilbertIndex = copy(child = c)
}

/** 64-bit polynomial rolling hash over the UTF-8 bytes of a string:
  * h = h*31 + byte (mod 2^64). The per-document content fingerprint
  * (SURVEY.md §2 #29); codegen'd, zero allocation. */
case class PolyHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xff); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val b = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $b = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $b.length; $i++) { $h = $h * 31L + ($b[$i] & 0xff); }
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PolyHash64 = copy(child = c)
}

/** Deflate-compressed size of the UTF-8 text (raw deflate, fixed
  * level) — the compression-ratio quality signal web-corpus pipelines
  * use to flag machine-generated repetition (ratio far below prose)
  * and binary/encrypted junk (ratio at or above 1). A scalar codegen
  * expression calling a static kernel, so the whole quality pass
  * stays one scan pipeline; the Deflater is created per call (cheap
  * against per-document compression work, and thread-safe under
  * Spark's task parallelism where a shared instance would not be). */
case class DeflateSize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    DeflateSize.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = DeflateSize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.compute($s);"
    })

  override protected def withNewChildInternal(c: Expression): DeflateSize = copy(child = c)
}

object DeflateSize {
  /** Raw-deflate byte count at the default level, shared by eval and
    * generated code. Level is pinned (6) so the signal is stable
    * across JVM default changes. */
  def compute(v: UTF8String): Int = {
    val in = v.getBytes
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** Unicode NFC normalization (canonical composition) — the dedup-key
  * prerequisite: NFD twins ("é" as e+combining-acute vs precomposed)
  * hash apart and defeat every content-hash-keyed operator unless the
  * corpus is composed first. A scalar codegen expression over the JDK
  * normalizer (the same Unicode normalization DuckDB's nfc_normalize
  * implements, so the oracle surface is cross-engine); the common
  * already-NFC case is detected without allocating. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    NfcNormalize.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $cls.compute($s);"
    })

  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
}

object NfcNormalize {
  /** Shared by eval and generated code. isNormalized is a cheap
    * quick-check scan; ASCII (the overwhelming web-corpus case) takes
    * it without ever decoding to String. */
  def compute(v: UTF8String): UTF8String = {
    val s = v.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

/** One BPE merge step over a symbol sequence: replace every
  * non-overlapping adjacent (left, right) occurrence, scanning left
  * to right, with the concatenation — the inner rewrite of
  * byte-pair-encoding tokenizer training (Sennrich et al. 2016).
  * A native expression so the per-round rewrite of the whole word
  * table stays inside whole-stage codegen (a higher-order-function
  * fold here runs as interpreted lambdas). */
case class MergePair(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), StringType, StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(arr: Any, l: Any, r: Any): Any =
    MergePair.merge(arr.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, l, r) => {
      val cls = MergePair.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls.merge($a, $l, $r);"
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): MergePair =
    copy(first = f, second = s, third = t)
}

object MergePair {
  /** Leftmost-first non-overlapping merge, shared by eval and
    * generated code. */
  def merge(arr: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    var k = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (i + 1 < n && s.equals(l) && arr.getUTF8String(i + 1).equals(r)) {
        out(k) = UTF8String.concat(l, r)
        i += 2
      } else {
        out(k) = s
        i += 1
      }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], k))
  }
}

/** Winnowing document fingerprint (Schleimer et al., SIGMOD 2003, the
  * standard MOSS scheme): rolling k-gram hashes, then the minimum of
  * each sliding window of `w` hashes; returns the sorted distinct
  * selected hashes. Guarantees every substring match of length
  * ≥ k+w−1 shares a fingerprint — the property plain sampling lacks. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 2 && w >= 1)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    WinnowFingerprint.compute(v.asInstanceOf[UTF8String], k, w)

  // codegen calls the same static kernel as eval — keeps the
  // fingerprint inside the whole-stage-codegen span (a CodegenFallback
  // here used to split the documents-scan pipeline in two)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = WinnowFingerprint.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls.compute($s, $k, $w);"
    })

  override protected def withNewChildInternal(c: Expression): WinnowFingerprint = copy(child = c)
}

object WinnowFingerprint {
  /** The winnowing kernel, shared by eval and generated code. */
  def compute(v: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = v.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // rolling k-gram hashes: h_i = sum b[i+j] * B^(k-1-j)
    val B = 257L
    var pow = 1L // B^(k-1)
    var j = 1
    while (j < k) { pow *= B; j += 1 }
    val grams = new Array[Long](n - k + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
    grams(0) = h
    i = k
    while (i < n) {
      h = (h - (bytes(i - k) & 0xff) * pow) * B + (bytes(i) & 0xff)
      grams(i - k + 1) = h
      i += 1
    }
    // winnow: rightmost minimum of each window of w grams; selections
    // are gathered into a flat array, sorted, deduped in place —
    // no per-row tree allocation on the scan hot path
    val sel =
      if (grams.length <= w) Array(grams.min)
      else {
        val out = new Array[Long](grams.length - w + 1)
        var s = 0
        while (s + w <= grams.length) {
          var mi = s
          var t = s + 1
          while (t < s + w) { if (grams(t) <= grams(mi)) mi = t; t += 1 }
          out(s) = grams(mi)
          s += 1
        }
        out
      }
    java.util.Arrays.sort(sel)
    var m = 0
    i = 0
    while (i < sel.length) {
      if (m == 0 || sel(m - 1) != sel(i)) { sel(m) = sel(i); m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sel, m))
  }
}

/** Count, per dictionary, how many tokens of the input belong to the
  * dictionary — ONE tokenization pass replacing one
  * `regexp_extract_all('\b(w1|w2|…)\b')` scan per dictionary.
  * Tokens are maximal ASCII word-char runs ([A-Za-z0-9_]), exactly
  * the `\b`-delimited alternation semantics of the Java/RE2 regexes
  * it replaces (both treat \w as ASCII by default), so counts are
  * identical to the regex formulation for pure-letter dictionary
  * words. Codegen'd via an expression reference object (the dictionary
  * sets live in the instance), so the scan pipeline stays in one
  * whole-stage span. */
case class WordSetScores(child: Expression, dicts: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {
  // a dictionary word with a non-ASCII-word character ("für",
  // "l'eau") can never equal an ASCII token, silently diverging from
  // the regex formulation — reject at construction instead
  require(dicts.flatten.forall(_.forall(c =>
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
    (c >= '0' && c <= '9') || c == '_')),
    "dictionary words must consist of ASCII word characters [A-Za-z0-9_]")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    dicts.map { d =>
      val s = new java.util.HashSet[String]()
      d.foreach(w => s.add(w))
      s
    }.toArray

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
    (c >= '0' && c <= '9') || c == '_'

  /** Public: called from generated code via a reference object. */
  def compute(v: UTF8String): ArrayData = {
    val s = v.toString
    val counts = new Array[Long](sets.length)
    var i = 0
    val n = s.length
    while (i < n) {
      if (isWordChar(s.charAt(i))) {
        val start = i
        while (i < n && isWordChar(s.charAt(i))) i += 1
        val tok = s.substring(start, i)
        var d = 0
        while (d < sets.length) {
          if (sets(d).contains(tok)) counts(d) += 1
          d += 1
        }
      } else i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("wordSetScores", this)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($s);"
    })

  override protected def withNewChildInternal(c: Expression): WordSetScores = copy(child = c)
}

/** Character-class census in one scan: returns
  * [n_chars, n_alpha (A-Za-z), n_punct (.,;:!?'")] — replacing one
  * regexp_replace+length pass per class in quality scoring. Counts are
  * identical to the regex character-class formulation (n_chars counts
  * code points like SQL length(); the classes themselves are pure
  * ASCII, unaffected by surrogate pairs). Codegen calls the same
  * static kernel as eval. */
case class CharClassCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    CharClassCounts.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = CharClassCounts.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls.compute($s);"
    })

  override protected def withNewChildInternal(c: Expression): CharClassCounts = copy(child = c)
}

object CharClassCounts {
  /** The census kernel, shared by eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    val n = s.numChars()
    var alpha = 0L
    var punct = 0L
    var i = 0
    val str = s.toString
    while (i < str.length) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha += 1
      else if (c == '.' || c == ',' || c == ';' || c == ':' || c == '!' ||
               c == '?' || c == '\'' || c == '"') punct += 1
      i += 1
    }
    new GenericArrayData(Array(n.toLong, alpha, punct))
  }
}

/** Banded random-hyperplane LSH signature in one corpus pass: returns
  * `nBands` bucket values, bit j of band b = sign of the dot product
  * with pseudo-random plane b*nPlanes+j. Plane components are derived
  * inline from a splitmix64-style mix of (plane, index) — seed-stable
  * across executors with nothing to broadcast — mapped to [-1, 1).
  * Replaces nBands*nPlanes zip_with+aggregate trees (each of which
  * materialized an intermediate array and hashed every element),
  * which dominated the LSH paths' cost. Codegen'd; eval and codegen
  * use identical double arithmetic, so plans agree bit-for-bit. */
case class HyperplaneBuckets(child: Expression, nBands: Int, nPlanes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nBands >= 1 && nPlanes >= 1 && nPlanes <= 63)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val emb = v.asInstanceOf[ArrayData]
    val n = emb.numElements()
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var bucket = 0L
      var j = 0
      while (j < nPlanes) {
        val plane = b * nPlanes + j
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += emb.getFloat(i).toDouble * HyperplaneBuckets.coef(plane, i)
          i += 1
        }
        if (acc >= 0) bucket |= (1L << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = HyperplaneBuckets.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      s"""
         |long[] $out = new long[$nBands];
         |for (int $b = 0; $b < $nBands; $b++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $nPlanes; $j++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $a.numElements(); $i++) {
         |      $acc += (double)$a.getFloat($i) * $cls.coef($b * $nPlanes + $j, $i);
         |    }
         |    if ($acc >= 0) $bucket |= (1L << $j);
         |  }
         |  $out[$b] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets = copy(child = c)
}

object HyperplaneBuckets {
  /** Deterministic plane component in [-1, 1): splitmix64 finalizer
    * over a (plane, index) key. Shared by eval and generated code. */
  def coef(plane: Int, i: Int): Double = {
    var z = plane * 0x9E3779B97F4A7C15L + i * 0xBF58476D1CE4E5B9L
    z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL
    z ^= (z >>> 31)
    z.toDouble / 9.223372036854776E18 // 2^63 → [-1, 1)
  }
}

/** MinHash signature over a shingle-hash array in ONE pass: value i of
  * the output is min over elements x of xxhash64(i, x), bit-identical
  * to Spark's `xxhash64(lit(i), x)` (the per-permutation seed is
  * XXH64.hashInt(i, 42) — exactly how the builtin folds an int
  * literal child into the stream). Replaces numHashes separate
  * `array_min(transform(...))` trees, which run as interpreted
  * higher-order lambdas and traverse the array once PER permutation.
  * Inputs are non-empty by construction (shingle sets exist only for
  * docs with >= n tokens); an empty array would yield a MaxValue-
  * filled signature where the composed form yields nulls. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes >= 1)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    MinHashSignature.compute(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = MinHashSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls.compute($a, $numHashes);"
    })

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

object MinHashSignature {
  // per-permutation seeds: Spark's xxhash64 folds children left to
  // right, so the int literal i contributes hashInt(i, 42) as the
  // running seed before the shingle long is hashed
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def seeds(n: Int): Array[Long] =
    seedCache.computeIfAbsent(n, k => Array.tabulate(k)(i =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 42L)))

  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val s = seeds(numHashes)
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val x = arr.getLong(j)
      var i = 0
      while (i < numHashes) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(x, s(i))
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** SimHash as a single typed-imperative aggregate: the per-bit ±1
  * vote tally lives in one int[64] buffer updated in tight JVM code —
  * one aggregation pass instead of 64 separate conditional-sum
  * aggregate expressions (which widen every aggregation row to 64
  * columns and dominate the simhash pipeline's cost). */
case class SimHashAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Int]]
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) { buf(i) += ((((h >>> i) & 1L) << 1) - 1).toInt; i += 1 }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var out = 0L
    var i = 0
    while (i < 64) { if (buf(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(256)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SimHashAgg =
    copy(child = c.head)
}

/** Mergeable Misra–Gries heavy-hitter summary (Agarwal et al.,
  * "Mergeable Summaries", PODS'12) — the sketch tier of the
  * vocabulary census: the exact `t_vocab` shuffles EVERY token to its
  * reducer; this aggregate keeps at most `capacity` counters per
  * partition and merges capacity-sized buffers, so a 100 TB token
  * stream costs one map pass + tiny merges, like the HLL and
  * approx-percentile tiers beside it.
  *
  * Classic MG update (absent item on a full buffer decrements all
  * counters and is itself dropped) and the mergeable-summaries merge
  * (pointwise sum, then subtract the (capacity+1)-th largest count
  * and keep the positive survivors). Estimates UNDERCOUNT by at most
  * n/(capacity+1) — any token more frequent than that bound is
  * guaranteed present, and when the true vocabulary fits the capacity
  * no decrement ever fires, so counts are exact (both spec-pinned).
  *
  * eval returns the summary as (token, est_count) structs sorted by
  * (est_count DESC, token) — deterministic output order for whatever
  * survives. */
case class MisraGriesTopK(child: Expression, capacity: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with ExpectsInputTypes {
  require(capacity >= 1, "capacity must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(tok)
      if (cur != 0L || buf.containsKey(tok)) buf.put(tok, cur + 1L)
      else if (buf.size < capacity) buf.put(tok, 1L)
      else {
        // full and absent: the arrival cancels against one unit of
        // every resident counter (amortized O(1) — each decrement
        // pairs with a past increment)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
                     b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    b.forEach((k, v) => a.merge(k, v, (x: Long, y: Long) => x + y))
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count, keep positives —
      // at most `capacity` survive and each error adds the subtracted
      // amount, preserving the n/(capacity+1) bound across merges
      val counts = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(a.size - capacity - 1)
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new java.util.ArrayList(buf.entrySet())
    entries.sort { (x: java.util.Map.Entry[String, Long], y: java.util.Map.Entry[String, Long]) =>
      val c = java.lang.Long.compare(y.getValue, x.getValue)
      if (c != 0) c else x.getKey.compareTo(y.getKey)
    }
    val rows = new Array[Any](entries.size)
    var i = 0
    while (i < entries.size) {
      val e = entries.get(i)
      rows(i) = InternalRow(UTF8String.fromString(e.getKey), e.getValue)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (k, v) => out.writeUTF(k); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) { m.put(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = c.head)
}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the
  * point-frequency member of the mergeable-summary family next to
  * [[MisraGriesTopK]]'s heavy hitters: `depth` hash rows × `width`
  * counters; an item's estimate is the MIN of its counters, an
  * overcount-only bound of ≤ N/width per row whp. Buffers are flat
  * long arrays, merge is pointwise addition — partition-order
  * independent, so the sketch is identical at any parallelism. */
case class CountMinSketch(child: Expression, depth: Int, width: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]]
    with ExpectsInputTypes {
  require(depth >= 1 && width >= 1)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String]
      var d = 0
      while (d < depth) {
        buf(d * width + CountMinSketch.bucket(tok, d, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinSketch =
    copy(child = c.head)
}

object CountMinSketch {
  /** Row-`seed` bucket of a token: FNV-style byte fold with a
    * per-row offset, splitmix finalizer — deterministic across JVMs
    * and partitionings, shared by the aggregate and the estimator. */
  def bucket(tok: UTF8String, seed: Int, width: Int): Int = {
    val bytes = tok.getBytes
    var h = seed * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL
    var i = 0
    while (i < bytes.length) { h = h * 1099511628211L + (bytes(i) & 0xff); i += 1 }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    Math.floorMod(h, width.toLong).toInt
  }

  /** Plain-Scala reference estimate for specs. */
  def estimate(counters: Array[Long], tok: UTF8String, depth: Int, width: Int): Long = {
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = counters(d * width + bucket(tok, d, width))
      if (c < est) est = c
      d += 1
    }
    est
  }
}

/** Point-frequency estimate from a [[CountMinSketch]] counter array:
  * min of the token's `depth` counters. Scalar and codegen-capable,
  * so estimating a whole token list against one broadcast sketch row
  * stays inside whole-stage codegen. */
case class CmsEstimate(left: Expression, right: Expression, depth: Int, width: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(sk: Any, tok: Any): Any = {
    val arr = sk.asInstanceOf[ArrayData].toLongArray()
    CountMinSketch.estimate(arr, tok.asInstanceOf[UTF8String], depth, width)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, tok) => {
      val cls = CountMinSketch.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.estimate($sk.toLongArray(), $tok, $depth, $width);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(left = l, right = r)
}

/** Repetition census for the Gopher/MassiveText repetition rules:
  * `[n_tokens, n_distinct, top_bigram_n]` in ONE tokenization pass.
  * Tokens are maximal runs of non-ASCII-whitespace in the LOWERCASED
  * text — exactly `split(regexp_trim(lower(text)), "\s+")` (Java `\s`
  * is ASCII-only without UNICODE_CHARACTER_CLASS), and bigram keys are
  * the space-joined neighbor pairs — so all three counts are
  * bit-identical to the composed array-algebra form, which needed an
  * array_sort + an interpreted higher-order fold per row. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    RepetitionStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = RepetitionStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls.compute($s);"
    })

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

object RepetitionStats {
  private def isWs(c: Char): Boolean = // Java regex \s (ASCII)
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** The census kernel, shared by eval and generated code. */
  def compute(v: UTF8String): ArrayData = {
    val s = v.toLowerCase.toString // same lowercase as Spark's lower()
    val n = s.length
    val distinct = new java.util.HashSet[String]()
    val bigrams = new java.util.HashMap[String, Int]()
    var nTok = 0L
    var topBigram = 0L
    var prev: String = null
    var i = 0
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(s.charAt(i))) i += 1
        val tok = s.substring(start, i)
        nTok += 1
        distinct.add(tok)
        if (prev != null) {
          val c = bigrams.merge(prev + " " + tok, 1, Integer.sum)
          if (c > topBigram) topBigram = c.toLong
        }
        prev = tok
      }
    }
    new GenericArrayData(Array(nTok, distinct.size.toLong, topBigram))
  }
}

/** Column-level entry points. */
/** Jaro-Winkler similarity — the OTHER classic fuzzy-match verifier
  * (levenshtein is built in; JW weights shared prefixes, the right
  * bias for names/addresses, the reference's identity domain). The
  * standard algorithm (match window ⌊max/2⌋−1, half-transposition
  * integer division, 0.7 boost threshold, 0.1 prefix weight capped at
  * 4) over UTF-8 BYTES, mirroring DuckDB's RapidFuzz port operation
  * for operation so the similarity is cross-engine bit-equal and can
  * carry a hash oracle. Whole-stage-codegen via the shared kernel. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = JaroWinkler.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
    copy(left = l, right = r)
}

object JaroWinkler {
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes; val t = b.getBytes
    // either side empty → 0.0, INCLUDING both-empty (the DuckDB
    // convention; classic definitions say 1.0 there — pinned in spec)
    if (s.length == 0 || t.length == 0) return 0.0
    val bound = math.max(math.max(s.length, t.length) / 2 - 1, 0)
    val sM = new Array[Boolean](s.length)
    val tM = new Array[Boolean](t.length)
    var m = 0
    var i = 0
    while (i < s.length) {
      val hi = math.min(t.length - 1, i + bound)
      var j = math.max(0, i - bound)
      var done = false
      while (j <= hi && !done) {
        if (!tM(j) && s(i) == t(j)) { sM(i) = true; tM(j) = true; m += 1; done = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both match sequences in order, count
    // positional mismatches, HALVE by integer division (the RapidFuzz
    // convention)
    var tr = 0; var k = 0; i = 0
    while (i < s.length) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (s(i) != t(k)) tr += 1
        k += 1
      }
      i += 1
    }
    tr /= 2
    val jaro = (m.toDouble / s.length + m.toDouble / t.length +
      (m - tr).toDouble / m) / 3.0
    if (jaro > 0.7) {
      val pMax = math.min(4, math.min(s.length, t.length))
      var p = 0
      while (p < pMax && s(p) == t(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

object native {
  def dot_f(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductF(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def poly_hash64(c: Column): Column =
    ExpressionUtils.column(PolyHash64(ExpressionUtils.expression(c)))
  def bucket_id(c: Column, bounds: Seq[Double]): Column =
    ExpressionUtils.column(BucketId(ExpressionUtils.expression(c), bounds))
  def deflate_size(c: Column): Column =
    ExpressionUtils.column(DeflateSize(ExpressionUtils.expression(c)))
  def nfc_normalize(c: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(c)))
  def merge_pair(arr: Column, l: Column, r: Column): Column =
    ExpressionUtils.column(MergePair(ExpressionUtils.expression(arr),
      ExpressionUtils.expression(l), ExpressionUtils.expression(r)))
  def winnow_fingerprint(c: Column, k: Int = 5, w: Int = 4): Column =
    ExpressionUtils.column(WinnowFingerprint(ExpressionUtils.expression(c), k, w))
  def minhash_signature(c: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(c), numHashes))
  def hyperplane_buckets(c: Column, nBands: Int, nPlanes: Int): Column =
    ExpressionUtils.column(
      HyperplaneBuckets(ExpressionUtils.expression(c), nBands, nPlanes))
  def simhash_agg(c: Column): Column =
    ExpressionUtils.column(
      SimHashAgg(ExpressionUtils.expression(c)).toAggregateExpression())
  def word_set_scores(c: Column, dicts: Seq[Seq[String]]): Column =
    ExpressionUtils.column(WordSetScores(ExpressionUtils.expression(c), dicts))
  def char_class_counts(c: Column): Column =
    ExpressionUtils.column(CharClassCounts(ExpressionUtils.expression(c)))
  def repetition_stats(c: Column): Column =
    ExpressionUtils.column(RepetitionStats(ExpressionUtils.expression(c)))
  def hilbert_index(c: Column, bits: Int): Column =
    ExpressionUtils.column(HilbertIndex(ExpressionUtils.expression(c), bits))
  def misra_gries_topk(c: Column, capacity: Int): Column =
    ExpressionUtils.column(
      MisraGriesTopK(ExpressionUtils.expression(c), capacity).toAggregateExpression())
  def count_min_sketch_agg(c: Column, depth: Int, width: Int): Column =
    ExpressionUtils.column(
      CountMinSketch(ExpressionUtils.expression(c), depth, width).toAggregateExpression())
  def cms_estimate(sketch: Column, token: Column, depth: Int, width: Int): Column =
    ExpressionUtils.column(CmsEstimate(ExpressionUtils.expression(sketch),
      ExpressionUtils.expression(token), depth, width))
  def jaro_winkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinkler(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))
}
