package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle set as one native expression.
  *
  * Semantics mirror the composable-SQL form exactly (and q24's DuckDB
  * oracle): tokens = whitespace-split of trimmed text; for i in
  * 0..max(len-n, 0) emit space-joined tokens[i, i+n) (clipped at the end);
  * first-occurrence-ordered distinct. One pass, no per-element
  * interpreted lambdas — the SQL form costs ~3.5s per branch at sf0.1 and
  * is re-evaluated in every plan branch that needs shingles.
  *
  * Codegen delegates to the static [[WordShingles.compute]] — a
  * CodegenFallback here would kick the ENTIRE enclosing operator out of
  * WholeStageCodegen (CollapseCodegenStages rejects operators containing
  * any fallback expression), de-compiling every other expression in the
  * dedup pipelines' scan stages.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val obj = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $obj.compute($a, $n);")
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

object WordShingles {
  /** The whole shingling pass as one static call, shared by interpreted
    * eval and generated code. */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val text = input.toString.trim
    val toks = text.split("\\s+")
    val upper = math.max(toks.length - n, 0)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= upper) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = UTF8String.fromString(it.next())
      k += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))
}
