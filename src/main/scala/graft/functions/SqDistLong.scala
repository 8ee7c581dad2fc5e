package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Integer squared-L2 distance between two long arrays as one native
  * fused loop — exactly
  * `aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), 0L, +)`,
  * including the null semantics: unequal lengths (zip_with null-pads)
  * or any null element poison the sum to NULL, and the arithmetic is
  * Java long (wrapping) like the composable form's. That form runs as
  * interpreted higher-order lambdas with a per-row accumulator
  * closure — the ANN-family hot loop (q265 PQ code assignment runs it
  * 64× per (vector, subspace); q295/q321 per candidate pair).
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sq_dist_long"
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    SqDistLong.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cls = SqDistLong.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = $cls.compute($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $boxed).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SqDistLong = copy(left = l, right = r)
}

object SqDistLong {
  /** Returns java.lang.Long, or null on length mismatch / null element
    * (matching zip_with's null-padding poisoning the aggregate). */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  def apply(a: Column, b: Column): Column =
    Bridge.column(SqDistLong(Bridge.expression(a), Bridge.expression(b)))
}
