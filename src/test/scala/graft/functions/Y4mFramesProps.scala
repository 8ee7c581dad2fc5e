package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Fuzz + roundtrip properties for the YUV4MPEG2 frame decoder:
  * `decode` must NEVER throw (corrupt payloads are data at 100 TB —
  * the WavPcm/MediaHeaders discipline applied to the frame tier), and
  * every encoder-built stream must decode back to its exact generation
  * parameters and plane statistics. Pure byte-array functions — no
  * SparkSession needed.
  */
object Y4mFramesProps extends Properties("graft.y4m") {

  private val arbitraryBytes: Gen[Array[Byte]] =
    Gen.choose(0, 256).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))

  // valid magic + random header/body soup: drives the header tokenizer
  // and frame walk with hostile W/H/F/C fields and junk frames
  private val headerSoup: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 128)
    body <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield "YUV4MPEG2 ".getBytes("ISO-8859-1") ++ body.toArray

  // a REAL encoded stream truncated at every possible byte: exercises
  // the partial-final-frame drop and every frame-walk length guard
  private val truncated: Gen[Array[Byte]] = for {
    w <- Gen.choose(1, 4).map(_ * 2)
    h <- Gen.choose(1, 3).map(_ * 2)
    frames <- Gen.choose(0, 6)
    full = Y4mFrames.encode(w, h, 30, 1, frames,
      (f, x, y) => f + x + y, (f, u, v) => f * u + v, (f, u, v) => f ^ u)
    keep <- Gen.choose(0, full.length)
  } yield full.take(keep)

  private def safe(b: Array[Byte]): Boolean = {
    Y4mFrames.decode(b) // must not throw; result content is free
    true
  }

  property("decode never throws on arbitrary bytes") =
    forAll(arbitraryBytes)(safe)

  property("decode never throws on YUV4MPEG2 header soup") =
    forAll(headerSoup)(safe)

  property("decode never throws on truncated real streams") =
    forAll(truncated)(safe)

  property("truncation keeps exactly the complete frames") =
    forAll(Gen.choose(1, 3).map(_ * 2), Gen.choose(1, 2).map(_ * 2),
      Gen.choose(1, 5), Gen.choose(0, 200)) { (w, h, frames, cut) =>
      val full = Y4mFrames.encode(w, h, 25, 1, frames,
        (f, x, y) => 7 * f + x + y, (f, u, v) => u + v, (f, u, v) => v)
      val b = full.take(math.max(0, full.length - cut))
      val header = full.indexOf('\n'.toByte) + 1
      val per = 6 + w * h + 2 * (w / 2) * (h / 2) // "FRAME\n" + planes
      val expect = math.max(0L, (b.length - header).toLong / per)
      Y4mFrames.decode(b) match {
        case Some(f) => f.nFrames == expect
        case None => expect == 0 // zero complete frames → not a video
      }
    }

  property("encode→decode roundtrips params and exact stats") =
    forAll(Gen.choose(1, 4).map(_ * 2), Gen.choose(1, 3).map(_ * 2),
      Gen.choose(1, 6), Gen.choose(1, 120), Gen.choose(0, 255)) {
      (w, h, frames, fps, base) =>
        val y = (f: Int, x: Int, yy: Int) => (base + f * 17 + x + yy) % 256
        val b = Y4mFrames.encode(w, h, fps, 1, frames, y,
          (f, u, v) => (base + u * 3 + v) % 256,
          (f, u, v) => (base + u + v * 5) % 256)
        val g = Y4mFrames.decode(b).get
        val ys = for (f <- 0 until frames; x <- 0 until w; yy <- 0 until h)
          yield y(f, x, yy)
        val motion =
          if (frames < 2) 0.0
          else (for (f <- 1 until frames; x <- 0 until w; yy <- 0 until h)
            yield math.abs(y(f, x, yy) - y(f - 1, x, yy)).toDouble)
            .sum / ((frames - 1).toDouble * w * h)
        g.width == w && g.height == h && g.fpsNum == fps &&
          g.fpsDen == 1 && g.nFrames == frames &&
          math.abs(g.meanY - ys.sum.toDouble / ys.length) < 1e-9 &&
          math.abs(g.motion - motion) < 1e-9
    }

  property("C444 and C422 plane sizes decode correctly") =
    forAll(Gen.choose(1, 3).map(_ * 2), Gen.choose(1, 2).map(_ * 2),
      Gen.choose(1, 4), Gen.oneOf("C444", "C422")) { (w, h, frames, c) =>
      val b = Y4mFrames.encode(w, h, 30, 1, frames,
        (f, x, y) => 100, (f, u, v) => 50, (f, u, v) => 200, chroma = c)
      val g = Y4mFrames.decode(b).get
      g.nFrames == frames && g.meanY == 100.0 && g.meanCb == 50.0 &&
        g.meanCr == 200.0 && g.motion == 0.0
    }
}
