package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Fuzz + roundtrip properties for the PCM WAV sample decoder: `decode`
  * must NEVER throw (corrupt payloads are data at 100 TB — the
  * MediaHeaders lesson applied to the sample tier), and every
  * encoder-built file must decode back to its exact generation
  * parameters and amplitude stats. Pure byte-array functions — no
  * SparkSession needed.
  */
object WavPcmProps extends Properties("graft.wavpcm") {

  private val arbitraryBytes: Gen[Array[Byte]] =
    Gen.choose(0, 256).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))

  // valid RIFF/WAVE preamble + random chunk soup: drives the chunk walk
  // with hostile id/size fields, including uint32 sizes past Int.MaxValue
  private val riffSoup: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 96)
    body <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield "RIFF".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0) ++
    "WAVE".getBytes("ISO-8859-1") ++ body.toArray

  // a REAL encoded file with trailing/interior corruption: truncations
  // exercise every length guard on the fmt/data reads
  private val truncated: Gen[Array[Byte]] = for {
    rate <- Gen.choose(1, 96000)
    ch <- Gen.choose(1, 4)
    frames <- Gen.choose(0, 32)
    keep <- Gen.choose(0, 44 + frames * ch * 2)
  } yield WavPcm.encode(rate, ch, frames, (t, c) => t * 31 + c).take(keep)

  private def safe(b: Array[Byte]): Boolean = {
    WavPcm.decode(b) // must not throw; result content is free
    true
  }

  property("decode never throws on arbitrary bytes") =
    forAll(arbitraryBytes)(safe)

  property("decode never throws on RIFF/WAVE chunk soup") =
    forAll(riffSoup)(safe)

  property("decode never throws on truncated real files") =
    forAll(truncated)(safe)

  property("encode→decode roundtrips params and exact stats") =
    forAll(Gen.choose(1, 96000), Gen.choose(1, 4), Gen.choose(1, 32),
      Gen.choose(-32768, 32767)) { (rate, ch, frames, amp) =>
      val b = WavPcm.encode(rate, ch, frames, (t, c) =>
        if ((t + c) % 2 == 0) amp else 0)
      val f = WavPcm.decode(b).get
      val n = frames.toLong * ch
      val nAmp = (0 until frames).flatMap(t => (0 until ch).map(c =>
        if ((t + c) % 2 == 0) amp.toLong else 0L))
      val mean = nAmp.sum.toDouble / n
      val rms = math.sqrt(nAmp.map(v => v.toDouble * v).sum / n)
      f.sampleRate == rate && f.channels == ch &&
        f.nFrames == frames.toLong &&
        math.abs(f.meanAmp - mean) < 1e-9 &&
        math.abs(f.rms - rms) < 1e-9 &&
        f.peak == nAmp.map(math.abs).max
    }

  property("samples returns the exact interleaved int16 stream and " +
      "never throws on corrupt input") =
    forAll(Gen.choose(1, 96000), Gen.choose(1, 3), Gen.choose(0, 24),
      Gen.choose(-32768, 32767)) { (rate, ch, frames, amp) =>
      val gen = (t: Int, c: Int) =>
        ((amp.toLong * (t + 1) * (c + 2)) % 65536 - 32768).toInt
      val b = WavPcm.encode(rate, ch, frames, (t, c) =>
        gen(t, c) & 0xffff)
      val (f, s) = WavPcm.samples(b).get
      val want = (0 until frames).flatMap(t => (0 until ch).map(c =>
        (gen(t, c) & 0xffff).toShort.toInt))
      WavPcm.samples(b.take(20)) // corrupt: must not throw
      f.channels == ch && s.toSeq == want
    }
}
