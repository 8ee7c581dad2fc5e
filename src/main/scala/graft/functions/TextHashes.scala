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
  def compute(s: UTF8String, n: Int): Int = {
    val upper = math.max(s.numChars() - n, 0)
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i <= upper) {
      seen.add(s.substringSQL(i + 1, n))
      i += 1
    }
    seen.size
  }
}

object TextHashes {
  def charShingleCount(text: Column, n: Int): Column =
    Bridge.column(CharShingleCount(Bridge.expression(text), n))
}
