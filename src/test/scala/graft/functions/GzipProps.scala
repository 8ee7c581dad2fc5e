package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** gzip codec: exact roundtrip on arbitrary bytes; truncation always
  * rejects (the trailer CRC is unreachable), never a wrong answer. */
object GzipProps extends Properties("GzipCodec") {

  private val bytesGen = Gen.oneOf(
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray),
    // highly compressible runs — exercises multi-read inflation
    Gen.chooseNum(0, 50000).map(n => Array.fill[Byte](n)(7)))

  property("gunzip(gzip(b)) == b") = forAll(bytesGen) { b =>
    java.util.Arrays.equals(GzipCodec.gunzip(GzipCodec.gzip(b)), b)
  }

  property("truncated payload yields null, never a wrong answer") =
    forAll(bytesGen) { b =>
      val gz = GzipCodec.gzip(b)
      GzipCodec.gunzip(gz.take(gz.length / 2)) == null
    }

  property("garbage (no gzip magic) yields null") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue,
        Byte.MaxValue)).map(_.toArray)) { b =>
      val bad = b.clone(); bad(0) = 0x00 // break the 0x1f magic
      GzipCodec.gunzip(bad) == null
    }
}

/** SQL registration + null propagation of gunzip. */
class GzipSpec extends graft.SparkSpec {
  test("gunzip registered; decodes a literal and nulls bad input") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(("ok", GzipCodec.gzip("hello graft".getBytes("UTF-8"))),
        ("bad", Array[Byte](1, 2, 3)))
      .toDF("tag", "p")
    val got = df.select($"tag",
        expr("CAST(gunzip(p) AS STRING)").as("t"))
      .collect().map(r => r.getString(0) ->
        Option(r.getString(1))).toMap
    assert(got("ok").contains("hello graft"))
    assert(got("bad").isEmpty)
  }
}
