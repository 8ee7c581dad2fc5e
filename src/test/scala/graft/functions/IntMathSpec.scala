package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Exact integer square root: the defining inequality on every input,
  * plus the boundaries where floor(sqrt(double)) goes wrong (ints
  * above 2^52 are not representable as doubles, and near perfect
  * squares the rounded double sqrt can floor one too high). */
object IntMathProps extends Properties("IntMath.isqrt") {

  private val magnitudes = Gen.oneOf(
    Gen.chooseNum(0L, 1000000L),
    Gen.chooseNum(0L, (1L << 40) - 1),
    // the band above 2^52 where doubles stop representing ints
    Gen.chooseNum((1L << 52) - 1000, (1L << 52) + 1000000),
    Gen.chooseNum((1L << 62) - 1000000, (1L << 62) + 1000000))

  property("r*r <= x < (r+1)*(r+1) across magnitudes") =
    forAll(magnitudes) { x =>
      val r = IntMath.isqrt(x)
      r >= 0 &&
        BigInt(r) * BigInt(r) <= BigInt(x) &&
        BigInt(r + 1) * BigInt(r + 1) > BigInt(x)
    }

  property("exact at large perfect squares and their neighbors — the " +
      "floor(sqrt(double)) failure class") = {
    Seq(3037000499L, 3037000498L, 2147483647L, 1L << 31,
      (1L << 31) + 1).forall { s =>
      val x = s * s
      IntMath.isqrt(x) == s &&
        IntMath.isqrt(x - 1) == s - 1 &&
        IntMath.isqrt(x + 1) == s
    } && IntMath.isqrt(0L) == 0L && IntMath.isqrt(1L) == 1L &&
      IntMath.isqrt(2L) == 1L && IntMath.isqrt(3L) == 1L &&
      IntMath.isqrt(4L) == 2L
  }
}

/** SQL registration + null propagation of the isqrt expression. */
class IntMathSpec extends graft.SparkSpec {
  test("isqrt is registered as a SQL function with null propagation") {
    val got = spark.sql(
      "SELECT isqrt(81L) AS a, isqrt(80L) AS b, " +
        "isqrt(CAST(NULL AS BIGINT)) AS c").collect()(0)
    assert(got.getLong(0) === 9L)
    assert(got.getLong(1) === 8L)
    assert(got.isNullAt(2))
  }
}
