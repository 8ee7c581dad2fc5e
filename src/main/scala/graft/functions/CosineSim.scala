package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Cosine similarity of two numeric arrays as one native expression: a
  * single fused loop computing dot product and both norms in double
  * precision. The composable form (zip_with + aggregate + sqrt) is three
  * interpreted higher-order passes per row — this is the hot inner loop of
  * every ANN scan, so it gets the native treatment (SURVEY.md §7.4
  * preference order: custom Expression before mapPartitions).
  *
  * Accepts float or double element types; null elements count as 0.
  * Returns NULL if either array is empty or a norm is zero.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def get(arr: ArrayData, i: Int, float: Boolean): Double =
    if (arr.isNullAt(i)) 0.0
    else if (float) arr.getFloat(i).toDouble
    else arr.getDouble(i)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // ragged arrays → NULL (matching the zip_with/aggregate composable
    // form, where zip_with null-pads and the null poisons the sum) —
    // a truncated-prefix similarity would be silently wrong data
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    if (n == 0) return null
    val fa = isFloat(left)
    val fb = isFloat(right)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, fa)
      val y = get(b, i, fb)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Generated code: the same fused loop, inlined into whole-stage
    * codegen so the ANN scan never leaves generated code. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    def getter(e: Expression, arr: String, i: String): String =
      if (isFloat(e)) s"(double) $arr.getFloat($i)"
      else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements() || $n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $a.isNullAt($i) ? 0.0 : ${getter(left, a, i)};
         |    double $y = $b.isNullAt($i) ? 0.0 : ${getter(right, b, i)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} =
         |      $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSim = copy(left = l, right = r)
}

object CosineSim {
  def apply(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
}
