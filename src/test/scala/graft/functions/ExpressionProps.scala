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

  // the production MinHash family (round 11: portable polynomial
  // string hashes + affine per-position images — see
  // Dedup.minHashSignature): the MinHash guarantees must hold over
  // the COMPOSED pipeline PolyHashArr -> AffineMinHash
  private def portableSig(words: Seq[String], k: Int): Seq[Long] = {
    val hashed = PolyHashArr(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
      .nullSafeEval(utf8Array(words)).asInstanceOf[ArrayData]
    AffineMinHash(org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)), k)
      .nullSafeEval(hashed).asInstanceOf[ArrayData].toLongArray().toSeq
  }

  property("portable minhash: signature of a superset is elementwise <=") =
    forAll(Gen.nonEmptyListOf(word), Gen.listOf(word)) { (base, extra) =>
      val s1 = portableSig(base, 8)
      val s2 = portableSig(base ++ extra, 8)
      s1.zip(s2).forall { case (a, b) => b <= a }
    }

  property("portable minhash is order- and duplicate-insensitive") =
    forAll(Gen.nonEmptyListOf(word)) { words =>
      portableSig(words, 8) ==
        portableSig(scala.util.Random.shuffle(words ++ words), 8)
    }

  property("affine simhash of identical hashed token lists is identical") =
    forAll(Gen.nonEmptyListOf(word)) { words =>
      def fp(): Long = {
        val hashed = PolyHashArr(
          org.apache.spark.sql.catalyst.expressions.Literal(null,
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StringType)))
          .nullSafeEval(utf8Array(words)).asInstanceOf[ArrayData]
        AffineSimHash(org.apache.spark.sql.catalyst.expressions.Literal(
            null, org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType)), 32)
          .nullSafeEval(hashed).asInstanceOf[Long]
      }
      fp() == fp()
    }

  property("polyStrHash: distinct for distinct short strings") =
    // mod-P collisions are possible in principle (the range is 1e9+7);
    // at ScalaCheck volume over <=8-char lowercase words the expected
    // collision count is ~1e-7 per run — a failure here means a real
    // determinism/aliasing bug, not hash bad luck
    forAll(word, word) { (a, b) =>
      (a == b) == (PolyStrHash.compute(UTF8String.fromString(a)) ==
        PolyStrHash.compute(UTF8String.fromString(b)))
    }

  property("polyStrHash matches the codepoint Horner model") =
    forAll(text) { s =>
      val model = s.codePoints().toArray
        .foldLeft(0L)((h, c) => (h * 257 + c) % 1000000007L)
      PolyStrHash.compute(UTF8String.fromString(s)) == model
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

  // --- round-9 native text kernels: total on ARBITRARY unicode -------

  private val anyText: Gen[String] = Gen.oneOf(
    Gen.listOf(org.scalacheck.Arbitrary.arbitrary[Char]).map(_.mkString),
    Gen.listOf(Gen.oneOf("é日𝄞 ab\u0000\n\t".toSeq)).map(_.mkString),
    text)

  private def winnowEval(s: String, g: Int, w: Int): Seq[Long] = {
    WinnowFingerprints.compute(UTF8String.fromString(s), g, w)
      .toLongArray().toSeq
  }

  /** Model: code-point gram hashes → all window minima → distinct. */
  private def winnowModel(s: String, g: Int, w: Int): Seq[Long] = {
    val cp = s.codePoints().toArray
    val n = cp.length - g + 1
    if (n < w) return Seq.empty
    val hs = (0 until n).map(i =>
      (0 until g).foldLeft(0L)((h, o) => (h * 257 + cp(i + o)) % 1000000007L))
    (0 to n - w).map(j => hs.slice(j, j + w).min).distinct
  }

  // the model reads what a Spark column actually holds: lone
  // surrogates (which arbitrary[Char] generates freely) cannot exist
  // in UTF-8, so UTF8String.fromString replaces them — compare the
  // kernel against the model of the ROUNDTRIPPED string, while still
  // feeding the raw arbitrary string through the kernel (totality)
  property("winnowFingerprints: total on arbitrary unicode and equal " +
      "to the model (code-point grams, window minima, distinct)") =
    forAll(anyText, Gen.choose(1, 9), Gen.choose(1, 5)) { (s, g, w) =>
      val norm = UTF8String.fromString(s).toString
      winnowEval(s, g, w) == winnowModel(norm, g, w)
    }

  property("gramHashSet: total on arbitrary unicode; distinct; equals " +
      "the model hash set") =
    forAll(anyText, Gen.choose(1, 9)) { (s, g) =>
      val got = GramHashSet.compute(UTF8String.fromString(s), g)
        .toLongArray().toSeq
      val cp = UTF8String.fromString(s).toString.codePoints().toArray
      val model = (0 to cp.length - g).map(i =>
        (0 until g).foldLeft(0L)((h, o) =>
          (h * 257 + cp(i + o)) % 1000000007L)).distinct
      got == model && got.distinct == got
    }

  property("affineMinHash: superset signatures are elementwise <= and " +
      "the family matches the closed form") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 1000000006L)),
      Gen.listOf(Gen.choose(0L, 1000000006L))) { (a, b) =>
      val k = 16
      def sig(xs: Seq[Long]): Seq[Long] =
        AffineMinHash.compute(new GenericArrayData(xs.toArray), k)
          .toLongArray().toSeq
      val sa = sig(a)
      val sab = sig(a ++ b)
      val model = (0 until k).map(i =>
        a.map(g => ((2L * i + 1) * g + 7919L * i) % 1000000007L).min)
      sa == model && sa.zip(sab).forall { case (x, y) => y <= x }
    }
}
