package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro and Jaro–Winkler string similarity — the record-linkage scorer
  * (name/title matching) that complements the edit-distance tier
  * (`levenshtein`, q42) with a similarity normalized to [0,1] that
  * rewards shared prefixes.
  *
  * Native Catalyst expressions (not UDFs): they evaluate directly on
  * `UTF8String` bytes and stay inside whole-stage codegen via a static
  * call, so a blocked fuzzy join scoring millions of candidate pairs
  * never leaves the codegen'd loop.
  *
  * Semantics are pinned to the OTHER engine's independent
  * implementation (DuckDB's `jaro_winkler_similarity`), probed
  * empirically and encoded here so the oracle is a genuine
  * cross-implementation check:
  *  - operates on UTF-8 BYTES, not code points ('aé居b' vs 'aé居c'
  *    scores as length-7 sequences — probed 0.9047619…);
  *  - either side empty → 0.0, including BOTH empty (DuckDB returns 0
  *    for '' vs '', not the textbook 1);
  *  - match window = max(la,lb)/2 − 1 (integer division, floored at 0);
  *  - transpositions = FLOOR(mismatched-match-pairs / 2) — an INTEGER,
  *    not the textbook half-count (probed: 32-byte pairs with an odd
  *    mismatch count score 0.7008 in DuckDB vs 0.6932 half-counted;
  *    pinned by a 3000-pair random fuzz against DuckDB);
  *  - Winkler boost only when jaro > 0.7, prefix capped at 4 BYTES,
  *    scale 0.1: jw = j + 0.1·l·(1−j).
  */
object JaroWinkler {

  /** Jaro similarity over raw byte arrays. */
  def jaroBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // walk both match sequences in order; each position where the
    // matched bytes differ is half a transposition
    var mismatches = 0
    var j = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(j)) j += 1
        if (a(i) != b(j)) mismatches += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - mismatches / 2) / md) / 3.0
  }

  def jaro(a: UTF8String, b: UTF8String): Double =
    jaroBytes(a.getBytes, b.getBytes)

  /** Winkler prefix boost: applied only above the 0.7 jaro threshold,
    * common prefix measured in bytes and capped at 4. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val ab = a.getBytes
    val bb = b.getBytes
    val j = jaroBytes(ab, bb)
    if (j <= 0.7) return j
    val cap = math.min(4, math.min(ab.length, bb.length))
    var l = 0
    while (l < cap && ab(l) == bb(l)) l += 1
    j + 0.1 * l * (1.0 - j)
  }
}

/** `jaro_sim(a, b)` — Jaro similarity in [0,1] over UTF-8 bytes. */
case class JaroSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.jaro($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroSim = copy(left = l, right = r)
}

/** `jaro_winkler_sim(a, b)` — Jaro–Winkler similarity in [0,1]. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinklerSim =
    copy(left = l, right = r)
}
