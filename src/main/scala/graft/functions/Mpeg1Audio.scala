package graft.functions

/** MPEG-1 Audio (ISO/IEC 11172-3) Layer I — REAL bitstream decode to
  * the SUBBAND-SAMPLE tier, in exact integer arithmetic:
  *
  *  - frame header: 12-bit sync 0xFFF, ID (MPEG-1), layer code,
  *    protection bit, 4-bit bitrate index, 2-bit sampling-frequency
  *    index, padding, mode (stereo / joint / dual / single) and
  *    mode_extension (the Layer-I intensity bound = (ext+1)·4),
  *    frame length in 32-bit slots = 12·bitrate/fs (+padding);
  *  - bit allocation: 4 bits per (subband, channel) below the joint
  *    bound, 4 bits per subband above it (one shared sample stream,
  *    TWO scalefactors — intensity stereo); code 0 = silent, code
  *    a ∈ 1..14 → nb = a+1 bit samples, code 15 forbidden (drop);
  *  - scalefactors: 6 bits per allocated (subband, channel), index
  *    0..62 into SF(idx) = 2·2^(−idx/3) (63 forbidden → drop);
  *  - samples: 12 per allocated subband, nb-bit codes c with the sign
  *    MSB inverted; dequantization is the spec's
  *      s'' = (2^nb/(2^nb−1)) · (s''' + 2^(1−nb)),
  *      s''' = c·2^(1−nb) − 1,
  *    which collapses to the RATIONAL s'' = (2c + 2 − 2^nb)/(2^nb−1),
  *    and s = s''·SF(idx). The decoder computes the FIXED-POINT value
  *      s_fp = (2c + 2 − 2^nb) · QSF(idx, nb),
  *      QSF(idx, nb) = round(2^16·SF(idx)/(2^nb−1))
  *    — one integer multiply per sample, exact and engine-portable
  *    (the QSF table is built once from StrictMath.pow, which is
  *    bit-deterministic on every JVM, and the q330 oracle embeds the
  *    SAME constants, so the decode replays in DuckDB to hash
  *    equality). Relative precision of the fixed-point grid is 2^-16
  *    of full scale — the quantizer's own step at nb=15.
  *
  * SEAM (documented, like the image-lib seam in
  * [[graft.operators.Multimodal]]): Layers II/III and the PCM
  * polyphase synthesis are NOT implemented, and the boundary is
  * data, not math — Layer II needs the allocation tables 3-B.2a–d
  * and synthesis needs the 512-coefficient window of Table 3-B.3,
  * both of which exist only as numeric tables in the spec (the
  * matrixing cosines are closed-form; the window is not). Everything
  * on THIS side of the seam — sync walking, header fields, frame
  * sizing, allocation/scalefactor/sample bit layout, intensity
  * bound, exact dequantization — is closed-form spec semantics and
  * is hash-oracled end to end by q330. A Layer II/III header parses
  * (fields + frame length) but returns None from [[decode]].
  */
object Mpeg1Audio {

  /** Layer I bitrates (kbit/s) by header index; 0 = free format
    * (unsupported), 15 = forbidden. */
  private val BitrateL1 =
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
      416, 448)

  private val SampleRate = Array(44100, 48000, 32000, 0)

  /** QSF(idx)(nb) = round(2^16 · 2·2^(−idx/3) / (2^nb − 1)) — the one
    * fixed-point constant per (scalefactor index, sample width). Built
    * from StrictMath (bit-identical on every JVM); q330's oracle SQL
    * interpolates these very values, so decoder and oracle share the
    * table by construction. */
  val QSF: Array[Array[Long]] = Array.tabulate(63, 16) { (idx, nb) =>
    if (nb < 2) 0L
    else Math.round(65536.0 * 2.0 * StrictMath.pow(2.0, -idx / 3.0) /
      ((1L << nb) - 1).toDouble)
  }

  /** Exact integer dequantization of one Layer I sample code. */
  def dequantFp(c: Int, nb: Int, scfIdx: Int): Long =
    (2L * c + 2L - (1L << nb)) * QSF(scfIdx)(nb)

  /** Per-clip decoded-subband statistics. All sample-domain fields are
    * in the 2^16 fixed-point domain and integer-EXACT (sums of ≤2^18
    * magnitudes over ≤ thousands of samples sit far below 2^63), so
    * every column hashes. `lastFp` pins bit order through the whole
    * parse; `nActive` counts allocated (frame, channel, subband)
    * slots — a mis-parsed allocation table cannot hide. */
  case class Features(sampleRate: Int, bitrateKbps: Int, modeCode: Int,
                      nChannels: Int, nFrames: Int, nSamples: Long,
                      nActive: Long, sumAbsFp: Long, peakFp: Long,
                      lastFp: Long)

  private final class ParseEx extends RuntimeException(
    null, null, false, false)
  private def bail(): Nothing = throw new ParseEx

  /** MSB-first bit reader over a byte range. */
  private final class BitReader(b: Array[Byte], from: Int, until: Int) {
    private var pos = from.toLong * 8
    private val end = until.toLong * 8
    def bits(n: Int): Int = {
      if (pos + n > end) bail()
      var v = 0
      var i = 0
      while (i < n) {
        val byteIdx = (pos >> 3).toInt
        val bitIdx = 7 - (pos & 7).toInt
        v = (v << 1) | ((b(byteIdx) >> bitIdx) & 1)
        pos += 1
        i += 1
      }
      v
    }
  }

  /** Decode a payload of back-to-back Layer I frames (byte-aligned
    * sync, the shape real .mp1/.mp2 streams have). Returns None for
    * anything malformed or beyond the Layer I seam — data, not an
    * exception (the [[FlacAudio.decode]] contract). */
  def decode(b: Array[Byte]): Option[Features] =
    try {
      var off = 0
      var nFrames = 0
      var nSamples = 0L
      var nActive = 0L
      var sumAbs = 0L
      var peak = 0L
      var last = 0L
      var sampleRate = 0
      var bitrate = 0
      var modeCode = -1
      var nCh = 0
      while (off + 4 <= b.length) {
        val h = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
          ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
        if ((h >>> 20) != 0xfff) bail() // 12-bit sync
        if (((h >>> 19) & 1) != 1) bail() // ID: MPEG-1 only (no LSF)
        val layerCode = (h >>> 17) & 3 // 3=I, 2=II, 1=III, 0=reserved
        if (layerCode != 3) return None // the documented Layer II/III seam
        val protection = (h >>> 16) & 1
        val brIdx = (h >>> 12) & 0xf
        val fsIdx = (h >>> 10) & 3
        val padding = (h >>> 9) & 1
        val mode = (h >>> 6) & 3
        val modeExt = (h >>> 4) & 3
        if (brIdx == 0 || brIdx == 15 || fsIdx == 3) bail()
        val fs = SampleRate(fsIdx)
        val br = BitrateL1(brIdx) * 1000
        if (nFrames == 0) {
          sampleRate = fs; bitrate = BitrateL1(brIdx); modeCode = mode
          nCh = if (mode == 3) 1 else 2
        } else if (fs != sampleRate || mode != modeCode) bail()
        val slots = 12 * br / fs + padding
        val frameLen = slots * 4
        if (off + frameLen > b.length) bail()
        val r = new BitReader(b, off + 4, off + frameLen)
        if (protection == 0) r.bits(16) // crc_check present; not verified
        val bound = if (mode == 1) (modeExt + 1) * 4 else 32
        // bit allocation: per channel below the bound, shared above
        val alloc = Array.ofDim[Int](2, 32)
        var sb = 0
        while (sb < 32) {
          if (sb < bound || nCh == 1) {
            var ch = 0
            while (ch < nCh) {
              val a = r.bits(4)
              if (a == 15) bail()
              alloc(ch)(sb) = if (a == 0) 0 else a + 1
              if (a != 0) nActive += 1
              ch += 1
            }
          } else {
            val a = r.bits(4)
            if (a == 15) bail()
            alloc(0)(sb) = if (a == 0) 0 else a + 1
            alloc(1)(sb) = alloc(0)(sb)
            if (a != 0) nActive += 2
          }
          sb += 1
        }
        // scalefactors: one per allocated (subband, channel) — joint
        // bands share samples but keep PER-CHANNEL scalefactors
        val scf = Array.ofDim[Int](2, 32)
        sb = 0
        while (sb < 32) {
          var ch = 0
          while (ch < nCh) {
            if (alloc(ch)(sb) != 0) {
              val s = r.bits(6)
              if (s == 63) bail()
              scf(ch)(sb) = s
            }
            ch += 1
          }
          sb += 1
        }
        // samples: 12 granule steps × subbands × channels (shared
        // codes above the intensity bound)
        var t = 0
        while (t < 12) {
          sb = 0
          while (sb < 32) {
            if (sb < bound || nCh == 1) {
              var ch = 0
              while (ch < nCh) {
                val nb = alloc(ch)(sb)
                if (nb != 0) {
                  val c = r.bits(nb)
                  val s = dequantFp(c, nb, scf(ch)(sb))
                  nSamples += 1
                  sumAbs += math.abs(s)
                  if (math.abs(s) > peak) peak = math.abs(s)
                  last = s
                }
                ch += 1
              }
            } else if (alloc(0)(sb) != 0) {
              val nb = alloc(0)(sb)
              val c = r.bits(nb)
              var ch = 0
              while (ch < 2) { // both channels, own scalefactor each
                val s = dequantFp(c, nb, scf(ch)(sb))
                nSamples += 1
                sumAbs += math.abs(s)
                if (math.abs(s) > peak) peak = math.abs(s)
                last = s
                ch += 1
              }
            }
            sb += 1
          }
          t += 1
        }
        nFrames += 1
        off += frameLen // remaining frame bits are ancillary data
      }
      if (nFrames == 0 || off != b.length) bail()
      Some(Features(sampleRate, bitrate, modeCode, nCh, nFrames,
        nSamples, nActive, sumAbs, peak, last))
    } catch { case _: ParseEx | _: ArrayIndexOutOfBoundsException => None }

  /** MSB-first bit writer (fixture synthesis). */
  private final class BitWriter {
    private val buf = collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nBits += 1
        if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
        i -= 1
      }
    }
    def padToBytes(total: Int): Array[Byte] = {
      if (nBits > 0) { buf += (cur << (8 - nBits)).toByte; cur = 0; nBits = 0 }
      while (buf.length < total) buf += 0.toByte
      buf.toArray
    }
  }

  /** Synthesize a conformant Layer I frame sequence from closed-form
    * allocation / scalefactor / code generators (the q326 fixture
    * pattern: the encoder writes the exact bit layout the decoder
    * parses, and the oracle recomputes the generators symbolically).
    *
    *  - `allocCode(ch, sb)`: 0 (silent) or 1..14; above the intensity
    *    bound channel 0's value is used (joint layout).
    *  - `scfIdx(ch, sb)`: 0..62, read only where allocated.
    *  - `code(f, t, ch, sb)`: raw sample code, masked to nb bits here;
    *    above the bound channel 0's stream is shared.
    *  - `mode`: 3 = mono, 0 = stereo, 1 = joint (bound = (ext+1)·4).
    *
    * Throws if the chosen bitrate cannot fit the payload — a fixture
    * bug, not a decode case. */
  def encodeLayer1(nFrames: Int, brIdx: Int, fsIdx: Int, mode: Int,
                   modeExt: Int,
                   allocCode: (Int, Int) => Int,
                   scfIdx: (Int, Int) => Int,
                   code: (Int, Int, Int, Int) => Int): Array[Byte] = {
    require(brIdx >= 1 && brIdx <= 14 && fsIdx >= 0 && fsIdx <= 2)
    val nCh = if (mode == 3) 1 else 2
    val bound = if (mode == 1) (modeExt + 1) * 4 else 32
    val slots = 12 * (BitrateL1(brIdx) * 1000) / SampleRate(fsIdx)
    val frameLen = slots * 4
    val out = collection.mutable.ArrayBuffer.empty[Byte]
    for (f <- 0 until nFrames) {
      val w = new BitWriter
      w.put(0xfff, 12); w.put(1, 1) // sync, ID=MPEG-1
      w.put(3, 2) // layer I
      w.put(1, 1) // protection_bit=1: no CRC
      w.put(brIdx, 4); w.put(fsIdx, 2)
      w.put(0, 1) // padding
      w.put(0, 1) // private
      w.put(mode, 2); w.put(modeExt, 2)
      w.put(0, 1); w.put(1, 1) // copyright, original
      w.put(0, 2) // emphasis
      for (sb <- 0 until 32) {
        if (sb < bound || nCh == 1)
          for (ch <- 0 until nCh) w.put(allocCode(ch, sb) & 0xf, 4)
        else w.put(allocCode(0, sb) & 0xf, 4)
      }
      for (sb <- 0 until 32; ch <- 0 until nCh) {
        val a = if (sb < bound || nCh == 1) allocCode(ch, sb)
          else allocCode(0, sb)
        if (a != 0) w.put(scfIdx(ch, sb) % 63, 6)
      }
      for (t <- 0 until 12; sb <- 0 until 32) {
        if (sb < bound || nCh == 1) {
          for (ch <- 0 until nCh) {
            val a = allocCode(ch, sb)
            if (a != 0) w.put(code(f, t, ch, sb) & ((1 << (a + 1)) - 1),
              a + 1)
          }
        } else if (allocCode(0, sb) != 0) {
          val a = allocCode(0, sb)
          w.put(code(f, t, 0, sb) & ((1 << (a + 1)) - 1), a + 1)
        }
      }
      out ++= w.padToBytes(frameLen)
      require(out.length == (f + 1) * frameLen,
        s"fixture payload overflows the $frameLen-byte Layer I frame")
    }
    out.toArray
  }
}
