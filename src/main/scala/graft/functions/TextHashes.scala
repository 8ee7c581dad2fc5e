package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom scalar expressions for document fingerprinting. Implemented as
  * native Catalyst `Expression`s (not Scala UDFs) so they evaluate on
  * Catalyst's internal row format without SerDe; hashing reuses Spark's own
  * XxHash64Function so SimHash bits are consistent with the `xxhash64`
  * SQL builtin (seed 42).
  */

/** 64-bit SimHash over an array of string tokens: each token votes its
  * xxhash64 bit pattern +1/-1 per bit position; the sign of each
  * accumulator becomes the output bit. Near-identical token multisets give
  * near-identical (low Hamming distance) fingerprints.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(
          arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val xxh = XxHash64Function.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val stringTypeRef = ctx.addReferenceObj("stringType", StringType,
      StringType.getClass.getName.stripSuffix("$"))
    nullSafeCodeGen(ctx, ev, a => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $acc = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = $xxh.hash($a.getUTF8String($i), $stringTypeRef, 42L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $acc[$b]++; else $acc[$b]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($acc[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** Polynomial rolling-hash fingerprint of a string (base-31 Horner over
  * UTF-8 bytes, wrapping 64-bit arithmetic). The classic content-defined
  * document fingerprint; stable across partitions/engines by construction.
  * Full codegen — the loop inlines into the stage, no fallback.
  */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31L * h + bytes(i)
      i += 1
    }
    h
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $a.getBytes();
         |long $h = 1125899906842597L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = 31L * $h + $bytes[$i];
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression)
      : RollingFingerprint = copy(child = c)
}

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
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
  def rollingFingerprint(text: Column): Column =
    Bridge.column(RollingFingerprint(Bridge.expression(text)))
  def charShingleCount(text: Column, n: Int): Column =
    Bridge.column(CharShingleCount(Bridge.expression(text), n))
}
