package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (the MOSS scheme) as ONE native
  * expression: per row, the DISTINCT minima of every `window`-length
  * sliding window over the polynomial hashes of the string's
  * `gramLen`-codepoint grams — i.e. exactly
  *
  * {{{
  *   h_i   = fold over gram chars: (h·257 + ascii(char)) mod 1e9+7
  *   wm_j  = min(h_j .. h_{j+window-1})     (j over full windows only)
  *   out   = distinct { wm_j }              (first-occurrence order)
  * }}}
  *
  * byte-for-byte the q309 relational chain (explode gram index →
  * unrolled 8-term hash → per-doc rowsBetween(0, window−1) min →
  * filter to full windows → distinct). Char values are Spark's
  * `ascii(substr(t, i, 1))`: the full CODE POINT at position i
  * (233 for 'é', 26085 for '日' — measured against the builtin), so
  * multibyte text hashes identically to the builtin chain and to
  * DuckDB's ascii().
  *
  * Why native: the relational form is correct and oracled but its
  * window stage is a full shuffle+sort of every gram row (≈190× the
  * doc count) — measured 8.3× on the second probe decade at fixed
  * cores once the sort spills. The pure-SQL array form avoids the
  * shuffle but runs interpreted higher-order lambdas (4.3×/decade,
  * yet ~2× slower at bench scale). This expression is both: one
  * codegen-resident pass per row, no shuffle before the aggregate,
  * O(nGrams·window) time, O(nGrams) scratch. Empty output for
  * strings with fewer than `gramLen + window − 1` codepoints (no
  * full window exists), matching the relational filter. */
case class WinnowFingerprints(child: Expression, gramLen: Int, window: Int)
    extends UnaryExpression {
  require(gramLen >= 1 && window >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String],
      gramLen, window)

  /** Generated code calls the same static compute as eval — the body is
    * a single JVM method, so inlining it as source would only duplicate
    * logic; what matters is staying inside whole-stage codegen (no
    * CodegenFallback boundary de-compiling the enclosing stage). */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cls = WinnowFingerprints.getClass.getName.stripSuffix("$") +
      "$.MODULE$"
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $cls.compute($t, $gramLen, $window);")
  }

  override protected def withNewChildInternal(c: Expression)
      : WinnowFingerprints = copy(child = c)
}

object WinnowFingerprints {
  private val P = 1000000007L

  /** Shared eval/codegen kernel (public only for generated code). */
  def compute(s: UTF8String, gramLen: Int, window: Int)
      : GenericArrayData = {
    // code points, exactly Spark's ascii(substr(t, i, 1)) per position
    // (ascii returns the full code point — 233 for 'é', 26085 for '日';
    // codePoints() steps surrogate pairs the way substr steps
    // UTF8String character boundaries)
    val cv = s.toString.codePoints().toArray
    val nCp = cv.length
    val nGrams = nCp - gramLen + 1
    if (nGrams < window) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 0L
      var o = 0
      while (o < gramLen) { h = (h * 257 + cv(i + o)) % P; o += 1 }
      hs(i) = h
      i += 1
    }
    // distinct window minima, first-occurrence order (deterministic)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var w0 = 0
    while (w0 <= nGrams - window) {
      var m = hs(w0)
      var w = 1
      while (w < window) { if (hs(w0 + w) < m) m = hs(w0 + w); w += 1 }
      seen.add(m)
      w0 += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def apply(text: Column, gramLen: Int, window: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text),
      gramLen, window))
}
