package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.types.{DecimalType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Properties of the DECIMAL(38,18) amount path (SURVEY §7.4d): the
  * string→decimal→string cast chain must be lossless for 18-fractional-
  * digit balances at magnitudes where doubles have already lost the tail.
  * Pure Catalyst expression eval — no SparkSession needed.
  */
object DecimalProps extends Properties("graft.decimal") {

  private def roundTrip(s: String): String = {
    val dec = Cast(Literal(UTF8String.fromString(s), StringType),
      DecimalType(38, 18)).eval()
    Cast(Literal(dec, DecimalType(38, 18)), StringType).eval()
      .asInstanceOf[UTF8String].toString
  }

  private val intPart = Gen.choose(0L, 999999999999999999L)
  private val fracPart = Gen.choose(0L, 999999999999999999L)

  property("string→decimal(38,18)→string round-trips exactly") =
    forAll(intPart, fracPart) { (ip, fp) =>
      val s = s"$ip.${"%018d".format(fp)}"
      roundTrip(s) == s
    }

  property("negative amounts round-trip (sign preserved)") =
    forAll(Gen.choose(1L, 999999999999999999L), fracPart) { (ip, fp) =>
      val s = s"-$ip.${"%018d".format(fp)}"
      roundTrip(s) == s
    }

  property("a double corrupts what the decimal path preserves") =
    forAll(Gen.choose(100000000000000000L, 999999999999999999L),
      Gen.choose(1L, 999999999999999999L)) { (ip, fp) =>
      // ≥1e17 with a non-zero fraction needs >30 significant digits;
      // the nearest double is integer-spaced there, so it ALWAYS differs
      val s = s"$ip.${"%018d".format(fp)}"
      roundTrip(s) == s && BigDecimal(s.toDouble) != BigDecimal(s)
    }
}
