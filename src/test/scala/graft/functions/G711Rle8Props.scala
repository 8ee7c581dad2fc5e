package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Roundtrip + fuzz properties for the round-8 coded-media decoders.
  *
  * G.711: the expansion tables are verified by the INVERSE direction —
  * an independently implemented segmented COMPRESSOR (linear →
  * codeword, the spec's boundary-search algorithm, not the expander's
  * arithmetic) must map every expanded value back to its codeword for
  * all 256 codes of both laws; plus file-level decode vs an
  * independent per-sample replay, and never-throws fuzzing.
  *
  * RLE8: the decoder reaches the composited buffer through the actual
  * bitstream (delta escapes, run/absolute modes, bottom-up flip,
  * early-EOB carry); the property replays the frame SEMANTICS directly
  * (a plain 2-D array where the latest row patch wins) and the two
  * must agree on every feature, including the position-weighted
  * checksum. Pure byte-array functions — no SparkSession needed.
  */
object G711Rle8Props extends Properties("graft.g711_rle8") {

  // ---------------------------------------------------------------- G.711

  /** Independent μ-law COMPRESSOR (the spec's segment search over the
    * BIASED magnitude — seg s covers t ∈ [0x100<<(s−1), 0x100<<s);
    * complemented output). */
  private def ulawCompress(sample: Int): Int = {
    val sign = if (sample < 0) 0x80 else 0
    var mag = math.min((if (sample < 0) -sample else sample) + 0x84, 0x7fff)
    var seg = 0
    var probe = 0x100
    while (seg < 7 && mag >= probe) { seg += 1; probe <<= 1 }
    val mant = (mag >> (seg + 3)) & 0x0f
    (~(sign | (seg << 4) | mant)) & 0xff
  }

  /** Independent A-law COMPRESSOR (0x55 toggle, seg-0 linear zone,
    * same segment-boundary search on the unbiased magnitude). */
  private def alawCompress(sample: Int): Int = {
    val sign = if (sample >= 0) 0x80 else 0
    var mag = math.min(if (sample >= 0) sample else -sample, 0x7fff)
    var seg = 0
    var probe = 0x100
    while (seg < 7 && mag >= probe) { seg += 1; probe <<= 1 }
    val mant =
      if (seg == 0) (mag >> 4) & 0x0f
      else (mag >> (seg + 3)) & 0x0f
    (sign | (seg << 4) | mant) ^ 0x55
  }

  // μ-law has TWO zero codes (0x7f and 0xff both expand to 0) — the
  // spec's one non-injective point — so the compressor maps the
  // expanded 0 back to the canonical 0xff; every other code inverts.
  property("ulaw: compress(expand(k)) == k for all 256 codewords") =
    org.scalacheck.Prop((0 until 256).forall { k =>
      ulawCompress(G711Wav.ulawExpand(k)) == (if (k == 0x7f) 0xff else k)
    })

  property("alaw: compress(expand(k)) == k for all 256 codewords") =
    org.scalacheck.Prop((0 until 256).forall { k =>
      alawCompress(G711Wav.alawExpand(k)) == k
    })

  property("g711: spec landmark values") = org.scalacheck.Prop(
    G711Wav.ulawExpand(0xff) == 0 &&        // μ-law positive zero
      G711Wav.ulawExpand(0x7f) == 0 &&      // μ-law negative zero
      G711Wav.ulawExpand(0x80) == 32124 &&  // μ-law full scale
      G711Wav.ulawExpand(0x00) == -32124 &&
      G711Wav.alawExpand(0xd5) == 8 &&      // A-law smallest positive
      G711Wav.alawExpand(0x55) == -8 &&     // A-law smallest negative
      G711Wav.alawExpand(0xaa) == 32256 &&  // A-law full scale
      G711Wav.alawExpand(0x2a) == -32256)

  private val g711File: Gen[(Boolean, Int, Int, Array[Int])] = for {
    mu <- Gen.oneOf(true, false)
    ch <- Gen.choose(1, 4)
    nf <- Gen.choose(0, 64)
    codes <- Gen.listOfN(nf * ch, Gen.choose(0, 255))
  } yield (mu, ch, nf, codes.toArray)

  property("g711 file decode == independent per-sample replay") =
    forAll(g711File) { case (mu, ch, nf, codes) =>
      val bytes = G711Wav.encode(mu, 8000, ch, nf,
        (t, c) => codes(t * ch + c))
      val got = G711Wav.decode(bytes)
      val vals = codes.map(k =>
        if (mu) G711Wav.ulawExpand(k) else G711Wav.alawExpand(k))
      if (nf == 0)
        got.exists(f => f.nFrames == 0 && f.meanAmp == 0.0 &&
          f.peak == 0)
      else {
        val n = vals.length.toDouble
        val mean = vals.map(_.toDouble).sum / n
        val rms = math.sqrt(vals.map(v => v.toDouble * v).sum / n)
        got.exists(f =>
          f.codec == (if (mu) "ulaw" else "alaw") &&
            f.sampleRate == 8000 && f.channels == ch &&
            f.nFrames == nf && f.meanAmp == mean && f.rms == rms &&
            f.peak == vals.map(math.abs).max &&
            f.lastSample == vals.last)
      }
    }

  property("g711: PCM WAV files are rejected (WavPcm's domain)") =
    forAll(Gen.choose(1, 16)) { n =>
      val pcm = WavPcm.encode(8000, 1, n, (t, _) => t * 100)
      G711Wav.decode(pcm).isEmpty
    }

  private val arbitraryBytes: Gen[Array[Byte]] =
    Gen.choose(0, 256).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))

  private val corruptG711: Gen[Array[Byte]] = for {
    mu <- Gen.oneOf(true, false)
    nf <- Gen.choose(1, 16)
    full = G711Wav.encode(mu, 8000, 2, nf, (t, c) => (t * 31 + c) % 256)
    at <- Gen.choose(0, full.length - 1)
    v <- Gen.choose(Byte.MinValue, Byte.MaxValue)
  } yield { val b = full.clone(); b(at) = v; b }

  property("g711 decode never throws on arbitrary bytes") =
    forAll(arbitraryBytes) { b => G711Wav.decode(b); true }

  property("g711 decode never throws on corrupted real files") =
    forAll(corruptG711) { b => G711Wav.decode(b); true }

  // ---------------------------------------------------------------- RLE8

  private val rle8Clip: Gen[(Int, Int, Int, Long)] = for {
    w <- Gen.choose(3, 24)
    h <- Gen.choose(1, 12)
    nf <- Gen.choose(1, 24)
    seed <- Gen.choose(0L, 1000000L)
  } yield (w, h, nf, seed)

  /** Same frame list the generator feeds the encoder, replayed as
    * plain semantics: a mutable image-coordinate raster where the
    * latest writer wins. */
  private def frames(w: Int, h: Int, nf: Int, seed: Long): Seq[Rle8Avi.Frame] =
    Rle8Avi.Full((x, y) => ((seed * 7 + x * 3 + y * 5) % 200).toInt) +:
      (1 until nf).map { f =>
        if (f % 2 == 1)
          Rle8Avi.RowPatch(f % h, run = true,
            _ => ((seed * 7 + f * 11) % 200).toInt)
        else
          Rle8Avi.RowPatch(f % h, run = false,
            x => ((seed * 7 + f * 11 + x * 3) % 200).toInt)
      }

  property("rle8 decode == direct semantic compositor replay") =
    forAll(rle8Clip) { case (w, h, nf, seed) =>
      val bytes = Rle8Avi.encode(w, h, frames(w, h, nf, seed))
      val got = Rle8Avi.decode(bytes)
      // independent replay: apply each frame onto a raster directly
      val buf = Array.ofDim[Int](h, w)
      var sumAll = 0L; var diffAll = 0L; var prev: Array[Array[Int]] = null
      frames(w, h, nf, seed).foreach { fr =>
        val snap = buf.map(_.clone())
        fr match {
          case Rle8Avi.Full(px) =>
            for (y <- 0 until h; x <- 0 until w) buf(y)(x) = px(x, y)
          case Rle8Avi.RowPatch(y, _, px) =>
            for (x <- 0 until w) buf(y)(x) = px(x)
        }
        for (y <- 0 until h; x <- 0 until w) {
          sumAll += buf(y)(x)
          if (prev != null) diffAll += math.abs(buf(y)(x) - snap(y)(x))
        }
        prev = snap
      }
      var ck = 0L
      for (y <- 0 until h; x <- 0 until w)
        ck += buf(y)(x).toLong * (y * w + x + 1)
      val nPix = nf.toLong * w * h
      val motion =
        if (nf < 2) 0.0 else diffAll.toDouble / ((nf - 1).toLong * w * h)
      got.exists(f =>
        f.nFrames == nf && f.width == w && f.height == h &&
          f.meanVal == sumAll.toDouble / nPix && f.motion == motion &&
          f.finalCk == ck)
    }

  private val corruptRle8: Gen[Array[Byte]] = for {
    (w, h, nf, seed) <- rle8Clip
    full = Rle8Avi.encode(w, h, frames(w, h, nf, seed))
    at <- Gen.choose(0, full.length - 1)
    v <- Gen.choose(Byte.MinValue, Byte.MaxValue)
  } yield { val b = full.clone(); b(at) = v; b }

  property("rle8 decode never throws on arbitrary bytes") =
    forAll(arbitraryBytes) { b => Rle8Avi.decode(b); true }

  property("rle8 decode never throws on corrupted real files") =
    forAll(corruptRle8) { b => Rle8Avi.decode(b); true }

  property("rle8: MJPEG AVIs are rejected (MjpegAvi's domain)") =
    org.scalacheck.Prop {
      val avi = MjpegAvi.encodeGrayBlocks(2, 2, 2, (f, bx, by) =>
        (f * 37 + bx * 11 + by * 29) % 256)
      Rle8Avi.decode(avi).isEmpty
    }

  // --- container-hardening regressions (the round-8 static findings) ---

  private def le32b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def asc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  property("rle8: a 10k-deep nested-LIST bomb decodes to None, no " +
    "StackOverflow (the walk is depth-bounded)") =
    org.scalacheck.Prop {
      // RIFF('AVI ' LIST(x LIST(x LIST(... )))): each nested LIST claims
      // the rest of the payload — unbounded recursion would take a stack
      // frame per level
      val depth = 10000
      val bos = new java.io.ByteArrayOutputStream()
      var inner = Array.emptyByteArray
      // build innermost-out so sizes are consistent
      for (_ <- 1 to depth)
        inner = asc("LIST") ++ le32b(inner.length + 4) ++ asc("movi") ++ inner
      val body = asc("AVI ") ++ inner
      bos.write(asc("RIFF")); bos.write(le32b(body.length)); bos.write(body)
      Rle8Avi.decode(bos.toByteArray).isEmpty // no frames → None, no throw
    }

  property("rle8: a second stream's strf neither overwrites w/h nor " +
    "rejects the file (strf binds to the first vids/MRLE strh)") =
    org.scalacheck.Prop {
      val base = Rle8Avi.encode(8, 4, frames(8, 4, 3, 7L))
      // append an 'auds' strl whose strf is NOT a BI_RLE8 bitmap header:
      // pre-fix it would set badFmt (16 bpp ≠ 8) and reject the file
      val strh = asc("strh") ++ le32b(48) ++ asc("auds") ++ asc("NONE") ++
        Array.fill(40)(0.toByte)
      val bogusStrf = asc("strf") ++ le32b(40) ++ le32b(40) ++ le32b(999) ++
        le32b(999) ++ Array[Byte](1, 0) ++ Array[Byte](16, 0) ++ le32b(0) ++
        Array.fill(16)(0.toByte)
      val extra = asc("LIST") ++
        le32b(4 + strh.length + bogusStrf.length) ++ asc("strl") ++
        strh ++ bogusStrf
      // splice before movi: rebuild RIFF = AVI  + hdrl+extra + movi tail
      // (simplest valid placement: append as a top-level LIST after movi —
      // the walk visits it either way)
      val body = java.util.Arrays.copyOfRange(base, 8, base.length) ++ extra
      val rebuilt = asc("RIFF") ++ le32b(body.length) ++ body
      val a = Rle8Avi.decode(base); val b = Rle8Avi.decode(rebuilt)
      b.isDefined && a == b
    }

  property("rle8: '##db' (uncompressed DIB) chunks are not RLE8 frames") =
    org.scalacheck.Prop {
      val base = Rle8Avi.encode(8, 4, frames(8, 4, 2, 11L))
      // flip every frame id 00dc → 00db: no compressed frames remain
      val mut = base.clone()
      var i = 0
      var flipped = 0
      while (i + 4 <= mut.length) {
        if (mut(i) == '0' && mut(i + 1) == '0' && mut(i + 2) == 'd' &&
            mut(i + 3) == 'c') { mut(i + 3) = 'b'; flipped += 1 }
        i += 1
      }
      flipped == 2 && Rle8Avi.decode(mut).isEmpty
    }
}
