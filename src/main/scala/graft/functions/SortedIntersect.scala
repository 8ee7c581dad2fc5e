package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Intersection of two SORTED DISTINCT long arrays as one native
  * merge-walk — the triangle-enumeration inner loop. `array_intersect`
  * is semantically identical on such inputs (result keeps the first
  * argument's order = ascending) but its generic implementation builds
  * a boxed `OpenHashSet[Any]` PER ROW over the first array and probes
  * with boxed elements — on the q131/q178/q307 co-purchase graph that
  * is ~80M boxed-Long allocations per pass, the measured GC driver of
  * the whole triangle family. The merge-walk touches both arrays once
  * with primitive longs and allocates exactly the result.
  *
  * CONTRACT (callers: [[graft.operators.Graph.triangles]]): both inputs
  * sorted ascending, no duplicates, no null elements — the shape
  * `sort_array(collect_list(...))` over a distinct edge list produces.
  * On such inputs the result is bit-identical to `array_intersect`.
  */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_long_intersect"

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedLongIntersect.compute(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cls = SortedLongIntersect.getClass.getName.stripSuffix("$") +
      "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $cls.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedLongIntersect =
    copy(left = l, right = r)
}

object SortedLongIntersect {
  /** Merge-walk over primitive longs; out buffer sized to the smaller
    * input (an intersection can never be larger). */
  def compute(a: ArrayData, b: ArrayData): GenericArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    new GenericArrayData(
      if (k == out.length) out else java.util.Arrays.copyOf(out, k))
  }

  def apply(a: Column, b: Column): Column =
    Bridge.column(SortedLongIntersect(
      Bridge.expression(a), Bridge.expression(b)))
}
