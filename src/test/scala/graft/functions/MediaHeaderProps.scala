package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Fuzz properties for the media container parsers: `parse` must NEVER
  * throw — corrupt payloads are data at 100 TB, and a single exception
  * in the per-row decode path kills a whole task. (A code-review round
  * found exactly this class of bug: a uint32 WAV chunk size wrapping an
  * Int index.) Pure byte-array functions — no SparkSession needed.
  */
object MediaHeaderProps extends Properties("graft.mediaheaders") {

  private val arbitraryBytes: Gen[Array[Byte]] =
    Gen.choose(0, 256).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))

  // adversarial: a valid RIFF/WAVE preamble followed by random chunk
  // soup — exercises the chunk walk with hostile id/size fields,
  // including sizes whose uint32 value exceeds Int.MaxValue
  private val riffSoup: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 64)
    body <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield "RIFF".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0) ++
    "WAVE".getBytes("ISO-8859-1") ++ body.toArray

  // same idea for the JPEG marker walk
  private val jpegSoup: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 64)
    body <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield Array[Byte](0xff.toByte, 0xd8.toByte) ++ body.toArray

  // prefixing with each known magic steers the fuzz into every parser's
  // deep path, not just the signature rejects
  private val magics: Gen[Array[Byte]] = Gen.oneOf(
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
    "GIF89a".getBytes("ISO-8859-1"),
    "BM".getBytes("ISO-8859-1"))
  private val magicSoup: Gen[Array[Byte]] = for {
    m <- magics
    n <- Gen.choose(0, 64)
    body <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield m ++ body.toArray

  private def safe(b: Array[Byte]): Boolean = {
    MediaHeaders.parse(b) // must not throw; result content is free
    true
  }

  property("parse never throws on arbitrary bytes") =
    forAll(arbitraryBytes)(safe)

  property("parse never throws on RIFF/WAVE chunk soup") =
    forAll(riffSoup)(safe)

  property("parse never throws on JPEG marker soup") =
    forAll(jpegSoup)(safe)

  property("parse never throws on magic-prefixed soup") =
    forAll(magicSoup)(safe)

  property("parse of null is None, parse of empty is None") = {
    MediaHeaders.parse(null).isEmpty &&
      MediaHeaders.parse(Array.emptyByteArray).isEmpty
  }
}
