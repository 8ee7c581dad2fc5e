package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** q327's portable-hash kernels as native expressions. The pipeline is
  * the ORACLED MinHash-LSH twin, so the hash family must stay exactly
  * the DuckDB-replayable closed forms — these expressions change only
  * the execution: the composable forms
  * (`array_distinct(transform(sequence(...), i -> fold(...)))` and
  * `transform(sequence(0,31), i -> array_min(transform(gh, ...)))`)
  * run as interpreted higher-order lambdas, ~6k ops per document
  * (measured 16 s of the sf0.1 bench on q327 alone); the native pair
  * runs the same arithmetic in tight codegen-resident loops.
  */
object PolyHash {
  private[functions] val P = 1000000007L
}

/** DISTINCT polynomial gram hashes of a string — exactly
  * `array_distinct(transform(sequence(1, len-n+1), i ->
  * fold_{o<n} (h·257 + ascii(char at i+o)) mod 1e9+7))`, first-
  * occurrence order, code-point semantics (Spark's ascii = the full
  * code point; see [[WinnowFingerprints]]). Empty array when the
  * string has fewer than `gramLen` codepoints. */
case class GramHashSet(child: Expression, gramLen: Int)
    extends UnaryExpression {
  require(gramLen >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hash_set"

  override def nullSafeEval(input: Any): Any =
    GramHashSet.compute(input.asInstanceOf[UTF8String], gramLen)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cls = GramHashSet.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $cls.compute($t, $gramLen);")
  }

  override protected def withNewChildInternal(c: Expression): GramHashSet =
    copy(child = c)
}

/** ALL polynomial gram hashes of a string, position order, repeats
  * kept — [[GramHashSet]] without the dedup: exactly
  * `transform(sequence(1, len-n+1), i -> fold_{o<n} (h·257 +
  * ascii(char at i+o)) mod 1e9+7)`. For consumers whose aggregates
  * COUNT gram occurrences (q313's per-(doc, bucket) counts), where the
  * distinct kernel would change the arithmetic. Empty array when the
  * string has fewer than `gramLen` codepoints. */
case class GramHashes(child: Expression, gramLen: Int)
    extends UnaryExpression {
  require(gramLen >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(input: Any): Any =
    GramHashes.compute(input.asInstanceOf[UTF8String], gramLen)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cls = GramHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $cls.compute($t, $gramLen);")
  }

  override protected def withNewChildInternal(c: Expression): GramHashes =
    copy(child = c)
}

object GramHashes {
  /** Shared eval/codegen kernel (public only for generated code). */
  def compute(s: UTF8String, gramLen: Int): GenericArrayData = {
    val cv = s.toString.codePoints().toArray
    val nGrams = cv.length - gramLen + 1
    if (nGrams < 1) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 0L
      var o = 0
      while (o < gramLen) { h = (h * 257 + cv(i + o)) % PolyHash.P; o += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, gramLen: Int): Column =
    Bridge.column(GramHashes(Bridge.expression(text), gramLen))
}

object GramHashSet {
  /** Shared eval/codegen kernel (public only for generated code). */
  def compute(s: UTF8String, gramLen: Int): GenericArrayData = {
    val cv = s.toString.codePoints().toArray
    val nGrams = cv.length - gramLen + 1
    if (nGrams < 1) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < nGrams) {
      var h = 0L
      var o = 0
      while (o < gramLen) { h = (h * 257 + cv(i + o)) % PolyHash.P; o += 1 }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def apply(text: Column, gramLen: Int): Column =
    Bridge.column(GramHashSet(Bridge.expression(text), gramLen))
}

/** Portable polynomial hash of ONE string — the [[GramHashSet]] fold
  * applied to the whole value: h = fold over code points of
  * (h·257 + cp) mod 1e9+7. Replays in DuckDB as
  * `list_reduce(list_transform(range(1, length(s)+1), p ->
  * ascii(substr(s, p, 1))), (a, c) -> (a*257 + c) % 1000000007)` —
  * closed-form integer arithmetic, no wrapping (every intermediate
  * < 257·1e9+0x10FFFF < 2^38), unlike [[RollingFingerprint]]'s
  * wrapping base-31 Horner which no overflow-checked engine can
  * follow. Empty string hashes to 0. */
case class PolyStrHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_str_hash"

  override def nullSafeEval(input: Any): Any =
    PolyStrHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cls = PolyStrHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.compute($t);")
  }

  override protected def withNewChildInternal(c: Expression): PolyStrHash =
    copy(child = c)
}

object PolyStrHash {
  /** Shared eval/codegen kernel (public only for generated code). */
  def compute(s: UTF8String): Long = {
    val cv = s.toString.codePoints().toArray
    var h = 0L
    var i = 0
    while (i < cv.length) { h = (h * 257 + cv(i)) % PolyHash.P; i += 1 }
    h
  }

  def apply(text: Column): Column =
    Bridge.column(PolyStrHash(Bridge.expression(text)))
}

/** [[PolyStrHash]] mapped over an array<string> in one codegen pass —
  * element order preserved, null elements pass through as null (the
  * shape `transform(arr, x -> poly_str_hash(x))` would have, but
  * `transform` is a CodegenFallback higher-order function that would
  * de-compile the enclosing stage; this kernel keeps the hot dedup
  * pipelines codegen-resident, the [[GramHashSet]] rationale). */
case class PolyHashArr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "poly_hash_arr"

  override def nullSafeEval(input: Any): Any =
    PolyHashArr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cls = PolyHashArr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression): PolyHashArr =
    copy(child = c)
}

object PolyHashArr {
  /** Shared eval/codegen kernel (public only for generated code). */
  def compute(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        out(i) = PolyStrHash.compute(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(tokens: Column): Column =
    Bridge.column(PolyHashArr(Bridge.expression(tokens)))
}

/** MinHash signature over a long-array column under the PORTABLE
  * affine family h_i(g) = ((2i+1)·g + 7919·i) mod 1e9+7 — exactly
  * `transform(sequence(0, k-1), i -> array_min(transform(gh, ...)))`
  * in one pass (element-outer, seed-inner). Null elements are skipped
  * like the builtin array_min; an empty/all-null input yields
  * Long.MaxValue per position (array_min of empty is NULL — callers
  * filter empty gram sets first, as q327 does via its length guard). */
case class AffineMinHash(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "affine_minhash"

  override def nullSafeEval(input: Any): Any =
    AffineMinHash.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cls = AffineMinHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $cls.compute($a, $k);")
  }

  override protected def withNewChildInternal(c: Expression): AffineMinHash =
    copy(child = c)
}

object AffineMinHash {
  /** Shared eval/codegen kernel (public only for generated code). */
  def compute(arr: ArrayData, k: Int): GenericArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val g = arr.getLong(i)
        var s = 0
        while (s < k) {
          val h = ((2L * s + 1L) * g + 7919L * s) % PolyHash.P
          if (h < mins(s)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def apply(grams: Column, k: Int): Column =
    Bridge.column(AffineMinHash(Bridge.expression(grams), k))
}

/** Portable SimHash over a gram-hash array under the SAME affine
  * family as [[AffineMinHash]]: bit s of the fingerprint is set iff
  * Σ_{g ∈ gh} (+1 if h_s(g) is odd else −1) > 0, with
  * h_s(g) = ((2s+1)·g + 7919·s) mod 1e9+7. Parity of an affine image
  * mod an odd prime splits the gram domain ~evenly per seed, which is
  * all simhash needs from its per-bit projections — and unlike
  * xxhash64 bit-slices (q25's production form) every vote replays in
  * DuckDB as closed-form integer arithmetic, so the fingerprint, the
  * hamming distances, and any downstream near-dup verdict are
  * hash-oracle-able end to end (q328). Equivalent composable form
  * (pinned by NativeEquivalenceSpec):
  * `aggregate(transform(sequence(0,k-1), s -> CASE sign CASE), ...)`
  * — interpreted lambdas, k·|gh| ops/row; this kernel is the same
  * arithmetic codegen-resident. Empty/all-null input → 0L. */
case class AffineSimHash(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 63)
  override def dataType: DataType = LongType
  override def prettyName: String = "affine_simhash"

  override def nullSafeEval(input: Any): Any =
    AffineSimHash.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cls = AffineSimHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $cls.compute($a, $k);")
  }

  override protected def withNewChildInternal(c: Expression): AffineSimHash =
    copy(child = c)
}

object AffineSimHash {
  /** Shared eval/codegen kernel (public only for generated code). */
  def compute(arr: ArrayData, k: Int): Long = {
    val acc = new Array[Long](k)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val g = arr.getLong(i)
        var s = 0
        while (s < k) {
          val h = ((2L * s + 1L) * g + 7919L * s) % PolyHash.P
          acc(s) += (if ((h & 1L) == 1L) 1L else -1L)
          s += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var s = 0
    while (s < k) { if (acc(s) > 0L) fp |= (1L << s); s += 1 }
    fp
  }

  def apply(grams: Column, k: Int): Column =
    Bridge.column(AffineSimHash(Bridge.expression(grams), k))
}

/** Dual-base 60-bit LSH band keys over a minhash signature, NATIVE
  * (codegen-resident). The composable transform/foldLeft form runs
  * interpreted — higher-order functions are CodegenFallback — and the
  * round-12 dual-base recall widening DOUBLED its interpreted tree:
  * q23 solo measured 3.37 s (composable, dual fold) vs 1.54 s
  * (composable, single fold) same-box. This kernel computes BOTH
  * folds in one pass per band (each signature position read once)
  * inside whole-stage codegen. Values are IDENTICAL to the
  * documented closed form (folds over base 1000003 and 1000033, both
  * mod 1e9+7, packed fold1·2^30 + fold2 — P < 2^30 keeps the packing
  * injective and overflow-free: fold < 2^30, fold·base < 2^50),
  * which is what the q23/q327 oracles replay; NativeEquivalenceSpec
  * pins the kernel against the composable form. Output is positional
  * (bkey of band b at index b) — consumers posexplode into
  * (band, bkey). */
case class LshBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(bands >= 1 && rowsPerBand >= 1)
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  // ArrayData.getLong on an array<int> (or a too-short array) reads
  // raw UnsafeArrayData bytes — garbage, not an error — so reject the
  // wrong element type at ANALYSIS time and short inputs at RUN time
  // (the replaced element_at form degraded to null instead).
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    LshBandKeys.compute(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cls = LshBandKeys.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $cls.compute($a, $bands, $rowsPerBand);")
  }

  override protected def withNewChildInternal(c: Expression): LshBandKeys =
    copy(child = c)
}

object LshBandKeys {
  /** Shared eval/codegen kernel (public only for generated code). */
  def compute(sig: ArrayData, bands: Int,
              rowsPerBand: Int): GenericArrayData = {
    if (sig.numElements < bands * rowsPerBand)
      throw new IllegalArgumentException(
        s"lsh_band_keys: signature has ${sig.numElements} elements, " +
          s"needs bands*rowsPerBand = ${bands * rowsPerBand}")
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var f1 = 0L
      var f2 = 0L
      var r = 0
      while (r < rowsPerBand) {
        val v = sig.getLong(b * rowsPerBand + r)
        f1 = (f1 * 1000003L + v) % PolyHash.P
        f2 = (f2 * 1000033L + v) % PolyHash.P
        r += 1
      }
      out(b) = f1 * 1073741824L + f2
      b += 1
    }
    new GenericArrayData(out)
  }

  def apply(sig: Column, bands: Int, rowsPerBand: Int): Column =
    Bridge.column(LshBandKeys(Bridge.expression(sig), bands, rowsPerBand))
}
