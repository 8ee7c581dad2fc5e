package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom scalar expressions for document fingerprinting, implemented as
  * native Catalyst `Expression`s (not Scala UDFs) so they evaluate on
  * Catalyst's internal row format without SerDe.
  *
  * History: this file also held the xxhash64-family SimHash64 and the
  * wrapping base-31 RollingFingerprint until round 11, when the
  * PORTABLE mod-P family ([[PolyStrHash]]/[[PolyHashArr]]/
  * [[AffineSimHash]] in PolyHash.scala) was measured within noise of
  * them on the full q25 pipeline (0.97×) and promoted to the
  * production forms — closed-form integer arithmetic any SQL engine
  * replays, which is what makes q25 hash-oracle-able. The
  * engine-specific kernels were deleted rather than kept as a second
  * variant nothing used.
  */

/** Count of DISTINCT character n-gram shingles in one pass — equivalent
  * to `size(array_distinct(transform(sequence(0, greatest(len-n, 0)),
  * i -> substr(text, i+1, n))))` but without materializing the shingle
  * array, and codegen-friendly (higher-order functions are
  * CodegenFallback, which would de-compile the whole enclosing stage).
  * Substrings via UTF8String.substringSQL — exactly the builtin substr
  * semantics (code-point indexed, end-clipped).
  */
case class CharShingleCount(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "char_shingle_count"

  override def nullSafeEval(input: Any): Any =
    CharShingleCount.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val obj = CharShingleCount.getClass.getName.stripSuffix("$") +
      "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $obj.compute($a, $n);")
  }

  override protected def withNewChildInternal(c: Expression)
      : CharShingleCount = copy(child = c)
}

object CharShingleCount {
  /** Distinct windows counted as wrapping 64-bit polynomial hashes of
    * their code points (base 1000003) in an open-addressed long set —
    * no per-window string allocation (the HashSet[UTF8String] form
    * this replaced made q25 the decade audit's worst row: the count
    * was ~60% substring+boxing overhead). Hashing is exact-in-practice
    * for COUNTING: two distinct windows collide with probability
    * ~2^-64, ~2e-13 per large document (the rareShinglePairs
    * precedent — and unlike a join key, a collision here only
    * undercounts one distinct gram). Window semantics unchanged:
    * numChars >= n → every full n-gram; shorter input → one window,
    * the whole string (substr end-clipping). */
  /** Hard bound on the open-addressed table (2^28 slots = 2 GiB of
    * longs): a document with more windows than half this is already
    * a >100M-char single row — reject it with a clear error instead
    * of the former behavior, where `wins * 2` overflowed Int around
    * a 1G-char document and the doubling loop either spun forever or
    * exited with an undersized table whose full-table linear probe
    * then hung the executor (round-11 advice item). */
  val MaxTableCap: Int = 1 << 28

  /** Table capacity for `wins` windows, computed in Long so the
    * doubling can never wrap. ≥ 2× `wins` keeps load factor ≤ 0.5, so
    * the table always has empty slots and probes stay O(1). Factored
    * out (vs inline in [[compute]]) so the overflow boundary is unit-
    * testable without allocating a 100M-char fixture string. */
  def tableCap(wins: Int): Int = {
    val need = wins.toLong * 2L
    require(need <= MaxTableCap,
      s"char_shingle_count: $wins shingle windows in a single document " +
        s"exceeds the ${MaxTableCap / 2} per-document bound")
    var cap = 16
    while (cap < need) cap <<= 1
    cap
  }

  def compute(s: UTF8String, n: Int): Int = {
    val cp = s.toString.codePoints().toArray
    val len = cp.length
    val wins = math.max(len - n, 0) + 1
    val wLen = math.min(n, len) // the single short window is clipped
    val cap = tableCap(wins)
    val table = new Array[Long](cap)
    val mask = cap - 1
    var count = 0
    var i = 0
    while (i < wins) {
      var h = 0L
      var o = 0
      while (o < wLen) { h = h * 1000003L + cp(i + o); o += 1 }
      if (h == 0L) h = 1L // 0 is the empty-slot sentinel
      var idx = (scala.util.hashing.byteswap64(h) & mask).toInt
      var done = false
      while (!done) {
        val v = table(idx)
        if (v == 0L) { table(idx) = h; count += 1; done = true }
        else if (v == h) done = true
        else idx = (idx + 1) & mask
      }
      i += 1
    }
    count
  }
}

object TextHashes {
  def charShingleCount(text: Column, n: Int): Column =
    Bridge.column(CharShingleCount(Bridge.expression(text), n))
}
