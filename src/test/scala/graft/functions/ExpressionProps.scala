package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck properties over the native expressions' eval functions —
  * pure JVM (no SparkSession), so hundreds of cases run in milliseconds.
  * (SURVEY.md §5: property tests for the tricky semantics.)
  */
object ExpressionProps extends Properties("graft.functions") {

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(8))
  private val text: Gen[String] =
    Gen.listOf(word).map(_.mkString(" "))

  private def evalShingles(s: String, n: Int): Seq[String] = {
    val e = WordShingles(org.apache.spark.sql.catalyst.expressions.Literal(
      UTF8String.fromString(s), org.apache.spark.sql.types.StringType), n)
    e.nullSafeEval(UTF8String.fromString(s)).asInstanceOf[ArrayData]
      .toArray[UTF8String](org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq
  }

  /** Model implementation of word shingling. */
  private def modelShingles(s: String, n: Int): Seq[String] = {
    val toks = s.trim.split("\\s+")
    (0 to math.max(toks.length - n, 0))
      .map(i => toks.slice(i, i + n).mkString(" ")).distinct
  }

  property("wordShingles matches the model") =
    forAll(text, Gen.choose(1, 5)) { (s, n) =>
      evalShingles(s, n) == modelShingles(s, n)
    }

  property("wordShingles output is distinct") =
    forAll(text, Gen.choose(1, 4)) { (s, n) =>
      val out = evalShingles(s, n)
      out.distinct == out
    }

  private def utf8Array(words: Seq[String]): ArrayData =
    new GenericArrayData(
      words.map(w => UTF8String.fromString(w): Any).toArray)

  property("minHashSig: signature of a superset is elementwise <=") =
    forAll(Gen.nonEmptyListOf(word), Gen.listOf(word)) { (base, extra) =>
      val k = 8
      val e = MinHashSig(org.apache.spark.sql.catalyst.expressions.Literal(
        null, org.apache.spark.sql.types.StringType), k)
      val s1 = e.nullSafeEval(utf8Array(base)).asInstanceOf[ArrayData]
        .toLongArray()
      val s2 = e.nullSafeEval(utf8Array(base ++ extra))
        .asInstanceOf[ArrayData].toLongArray()
      s1.zip(s2).forall { case (a, b) => b <= a }
    }

  property("minHashSig is order- and duplicate-insensitive") =
    forAll(Gen.nonEmptyListOf(word)) { words =>
      val k = 8
      val e = MinHashSig(org.apache.spark.sql.catalyst.expressions.Literal(
        null, org.apache.spark.sql.types.StringType), k)
      val a = e.nullSafeEval(utf8Array(words)).asInstanceOf[ArrayData]
        .toLongArray().toSeq
      val b = e.nullSafeEval(utf8Array(
        scala.util.Random.shuffle(words ++ words)))
        .asInstanceOf[ArrayData].toLongArray().toSeq
      a == b
    }

  property("simhash64 of identical token lists is identical") =
    forAll(Gen.nonEmptyListOf(word)) { words =>
      val e = SimHash64(org.apache.spark.sql.catalyst.expressions.Literal(
        null, org.apache.spark.sql.types.StringType))
      e.nullSafeEval(utf8Array(words)) == e.nullSafeEval(utf8Array(words))
    }

  property("rollingFingerprint: distinct for distinct short strings") =
    forAll(word, word) { (a, b) =>
      val e = RollingFingerprint(
        org.apache.spark.sql.catalyst.expressions.Literal(
          null, org.apache.spark.sql.types.StringType))
      (a == b) == (e.nullSafeEval(UTF8String.fromString(a)) ==
        e.nullSafeEval(UTF8String.fromString(b)))
    }

  property("cosineSim is symmetric and bounded") = {
    val vec = Gen.listOfN(8, Gen.choose(-100, 100).map(_.toDouble))
      .suchThat(v => v.exists(_ != 0.0))
    forAll(vec, vec) { (a, b) =>
      val e = CosineSim(
        org.apache.spark.sql.catalyst.expressions.Literal(null,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.catalyst.expressions.Literal(null,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))
      val ad = new GenericArrayData(a.toArray)
      val bd = new GenericArrayData(b.toArray)
      val ab = e.nullSafeEval(ad, bd).asInstanceOf[Double]
      val ba = e.nullSafeEval(bd, ad).asInstanceOf[Double]
      Prop(ab == ba && ab >= -1.0000001 && ab <= 1.0000001)
    }
  }
}
