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
  * LAYER II ([[decodeL2]], round 12) crosses the former "spec data"
  * seam: the allocation tables 3-B.2a–d are embedded ([[L2Nbal]]/
  * [[L2Row]]/[[L2ClsOfIdx]] — which quantizer each 2/3/4-bit
  * allocation index selects per subband, per table, chosen from
  * (sampling frequency, bitrate per channel) exactly as the spec's
  * table headers prescribe), plus the Layer II machinery on top of
  * Layer I's: 1152-sample frames (144·bitrate/fs byte slots),
  * granule-grouped samples (3 samples of a 3/5/9-step quantizer in
  * one 5/7/10-bit codeword, degrouped base-`steps` lowest digit
  * first), scfsi (2 bits per allocated channel-subband selecting 1,
  * 2 or 3 transmitted scalefactors for the frame's three 12-sample
  * parts), and the table-3-B.4 dequantization — which collapses to
  * ONE closed form shared with Layer I:
  *    s_fp = (2c + 1 − steps) · QSF2(idx, cls),
  *    QSF2(idx, cls) = round(2^16·SF(idx)/steps_cls)
  * (for ungrouped steps = 2^nb−1 this is exactly Layer I's
  * (2c+2−2^nb)·QSF; for grouped steps 3/5/9 the spec's C = 2^nb/steps,
  * D = 1/2 reduce to the same 2c+1−steps numerator).
  *
  * PCM TIER (round 13): the polyphase SYNTHESIS of §2.4.3.2.2 is
  * implemented in exact integer arithmetic ([[SynthState]],
  * [[decodePcm]]/[[decodeL2Pcm]]): the 64×32 matrixing
  * N(i,k) = cos((16+i)(2k+1)π/64) is CLOSED-FORM spec math,
  * fixed-pointed once as [[Nfp]] = round(2^16·N) (StrictMath, bit-
  * deterministic, argument reduced mod 128 half-turns first), the
  * V/U shift-register and the 16-tap windowed sum follow the spec
  * figure verbatim, and every intermediate is a Long with proven
  * headroom (see [[SynthState.processGroup]]). q332 hash-oracles the
  * whole tier: the DuckDB oracle replays matrixing + windowing as a
  * relational convolution against the SAME embedded Nfp/[[WindowD]]
  * integer tables.
  *
  * SEAM (documented, like the image-lib seam in
  * [[graft.operators.Multimodal]]), now narrowed to DATA ONLY: the
  * LITERAL 512 coefficient values of Table 3-B.3 are a numeric table
  * with no closed form, and they are not reproducible in this
  * offline build environment — so [[WindowD]] ships a clearly-marked
  * deterministic STAND-IN with the spec table's structure (multiples
  * of 2^-16, D[0] = 0, peak 75038/2^16 at the center, the half-table
  * symmetry D[512−i] = −D[i] except at i ≡ 0 mod 64): swap the 257
  * half-table values for the spec's and every downstream number is
  * bit-true ISO output with NO code change. MDCT-class codecs
  * (Layer III, AAC) remain out of scope. Everything else — sync
  * walking, header fields, frame sizing, allocation/scfsi/
  * scalefactor/sample bit layout for BOTH layers, intensity bound,
  * grouping, exact dequantization, matrixing, windowing — is spec
  * semantics, hash-oracled end to end by q330/q331 (subband tier)
  * and q332 (PCM tier). A Layer III header parses (fields + frame
  * length) but returns None.
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

  /** ISO 11172-3 §2.4.3.1 CRC-16: generator X^16 + X^15 + X^2 + 1
    * (0x8005 msb-first), initial state 0xFFFF, fed the PROTECTED
    * bits — header bits 16..31 plus, for Layer I, the bit-allocation
    * field and, for Layer II, the allocation and scfsi fields. The
    * same accumulator runs in the decoder (verify) and the fixture
    * encoder (emit), so the spec's bit order is pinned by the
    * round-trip rather than assumed twice. */
  private[graft] final class Crc16 {
    private var c = 0xffff
    def feed(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        val b = (v >>> i) & 1
        val msb = (c >>> 15) & 1
        c = (c << 1) & 0xffff
        if ((b ^ msb) == 1) c ^= 0x8005
        i -= 1
      }
    }
    def value: Int = c
  }

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

  /** One parsed Layer I frame: the intensity bound, the per-(channel,
    * subband) sample width (0 = silent), and the DENSE dequantized
    * fixed-point samples `sfp(t)(sb)(ch)` (0 where silent) — the
    * common input of the stats walk ([[decode]]) and the polyphase
    * synthesis ([[decodePcm]]). */
  private final class L1Frame(val bound: Int,
                              val alloc: Array[Array[Int]],
                              val sfp: Array[Array[Array[Long]]])

  private final class L1Parsed(val sampleRate: Int, val bitrate: Int,
                               val modeCode: Int, val nCh: Int,
                               val frames: Vector[L1Frame])

  /** Shared Layer I frame walker — header fields, frame sizing, CRC
    * verification, allocation / scalefactor / sample bit layout and
    * the exact dequantization, exactly as before the round-13 split
    * (the [[decode]] stats derived from the dense arrays are pinned
    * byte-identical by the q330 hash oracle across the refactor). */
  private def parseL1(b: Array[Byte]): Option[L1Parsed] =
    try {
      var off = 0
      var sampleRate = 0
      var bitrate = 0
      var modeCode = -1
      var nCh = 0
      val frames = Vector.newBuilder[L1Frame]
      var nFrames = 0
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
        val crcRead = if (protection == 0) r.bits(16) else -1
        val crc = if (protection == 0) new Crc16 else null
        if (crc != null) crc.feed(h & 0xffff, 16)
        val bound = if (mode == 1) (modeExt + 1) * 4 else 32
        // bit allocation: per channel below the bound, shared above
        val alloc = Array.ofDim[Int](2, 32)
        var sb = 0
        while (sb < 32) {
          if (sb < bound || nCh == 1) {
            var ch = 0
            while (ch < nCh) {
              val a = r.bits(4)
              if (crc != null) crc.feed(a, 4)
              if (a == 15) bail()
              alloc(ch)(sb) = if (a == 0) 0 else a + 1
              ch += 1
            }
          } else {
            val a = r.bits(4)
            if (crc != null) crc.feed(a, 4)
            if (a == 15) bail()
            alloc(0)(sb) = if (a == 0) 0 else a + 1
            alloc(1)(sb) = alloc(0)(sb)
          }
          sb += 1
        }
        // Layer I protects header bits 16-31 + the allocation field;
        // a mismatch means a corrupt frame -> the whole-payload drop
        if (crc != null && crc.value != crcRead) bail()
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
        val sfp = Array.ofDim[Long](12, 32, 2)
        var t = 0
        while (t < 12) {
          sb = 0
          while (sb < 32) {
            if (sb < bound || nCh == 1) {
              var ch = 0
              while (ch < nCh) {
                val nb = alloc(ch)(sb)
                if (nb != 0)
                  sfp(t)(sb)(ch) = dequantFp(r.bits(nb), nb, scf(ch)(sb))
                ch += 1
              }
            } else if (alloc(0)(sb) != 0) {
              val nb = alloc(0)(sb)
              val c = r.bits(nb)
              var ch = 0
              while (ch < 2) { // both channels, own scalefactor each
                sfp(t)(sb)(ch) = dequantFp(c, nb, scf(ch)(sb))
                ch += 1
              }
            }
            sb += 1
          }
          t += 1
        }
        frames += new L1Frame(bound, alloc, sfp)
        nFrames += 1
        off += frameLen // remaining frame bits are ancillary data
      }
      if (nFrames == 0 || off != b.length) bail()
      Some(new L1Parsed(sampleRate, bitrate, modeCode, nCh,
        frames.result()))
    } catch { case _: ParseEx | _: ArrayIndexOutOfBoundsException => None }

  /** Decode a payload of back-to-back Layer I frames (byte-aligned
    * sync, the shape real .mp1/.mp2 streams have) to the subband-
    * sample stats tier. Returns None for anything malformed or beyond
    * the seam — data, not an exception (the [[FlacAudio.decode]]
    * contract). Stats walk the dense arrays in the original sample-
    * instance order (t, sb, ch-innermost), so `lastFp` and the counts
    * are bit-identical to the pre-refactor single pass. */
  def decode(b: Array[Byte]): Option[Features] =
    parseL1(b).map { p =>
      var nSamples = 0L
      var nActive = 0L
      var sumAbs = 0L
      var peak = 0L
      var last = 0L
      p.frames.foreach { fr =>
        var sb = 0
        while (sb < 32) { // allocated slot count: shared bands copied
          var ch = 0     // alloc(1) = alloc(0), so the loop counts 2
          while (ch < p.nCh) {
            if (fr.alloc(ch)(sb) != 0) nActive += 1
            ch += 1
          }
          sb += 1
        }
        var t = 0
        while (t < 12) {
          sb = 0
          while (sb < 32) {
            var ch = 0
            while (ch < p.nCh) {
              if (fr.alloc(ch)(sb) != 0) {
                val s = fr.sfp(t)(sb)(ch)
                nSamples += 1
                sumAbs += math.abs(s)
                if (math.abs(s) > peak) peak = math.abs(s)
                last = s
              }
              ch += 1
            }
            sb += 1
          }
          t += 1
        }
      }
      Features(p.sampleRate, p.bitrate, p.modeCode, p.nCh,
        p.frames.length, nSamples, nActive, sumAbs, peak, last)
    }

  // -------------------------------------------------------------------
  // Polyphase synthesis (ISO/IEC 11172-3 §2.4.3.2.2) — the PCM tier.
  // -------------------------------------------------------------------

  /** Matrixing constants Nfp(i)(k) = round(2^16 · cos((16+i)(2k+1)π/64))
    * — the spec's 64×32 matrix N, CLOSED-FORM spec math fixed-pointed
    * at 2^16. The integer argument (16+i)(2k+1) is reduced mod 128
    * half-π/64-turns BEFORE the double multiply (cos has period 128 in
    * these units), so StrictMath.cos sees arguments in [0, 2π) — bit-
    * deterministic on every JVM and free of large-argument reduction
    * error. q332's oracle interpolates these very integers. */
  val Nfp: Array[Array[Long]] = Array.tabulate(64, 32) { (i, k) =>
    val a = ((16 + i) * (2 * k + 1)) % 128
    Math.round(65536.0 * StrictMath.cos(a * (Math.PI / 64.0)))
  }

  /** The 512-coefficient synthesis window, 2^16 fixed-point.
    *
    * DOCUMENTED DATA STAND-IN — this is the ONE piece of the audio
    * tier that is not the ISO table verbatim: Table 3-B.3's literal
    * values have no closed form and are not reproducible in this
    * offline build environment (no spec text, no codec library to
    * read them from). The stand-in keeps every STRUCTURAL property of
    * the spec table so it is drop-in replaceable: all values are
    * integer multiples of 2^-16 (the spec table's own grid), D(0) = 0,
    * the peak is 75038 = round(1.144989014·2^16) at the center tap,
    * and the second half obeys the spec's symmetry classes
    * D(512−i) = −D(i) for i ≢ 0 (mod 64), D(512−i) = +D(i) for
    * i ≡ 0 (mod 64). The half-table body is a Hann-windowed sinc at
    * the filterbank's nominal prototype cutoff π/64 — the same filter
    * class the spec window is a (ripple-optimized) member of. Swap
    * the 257 half-table values for the spec's and decoder AND oracle
    * are bit-true ISO (the oracle embeds THIS array, so the two can
    * never disagree with each other). */
  val WindowD: Array[Long] = {
    val d = new Array[Long](512)
    var i = 0
    while (i <= 256) {
      val x = (i - 256) / 64.0
      val sinc =
        if (i == 256) 1.0
        else StrictMath.sin(Math.PI * x) / (Math.PI * x)
      val hann = 0.5 * (1.0 - StrictMath.cos(2.0 * Math.PI * i / 512.0))
      d(i) = Math.round(75038.0 * sinc * hann)
      i += 1
    }
    i = 1
    while (i < 256) {
      d(512 - i) = if (i % 64 == 0) d(i) else -d(i)
      i += 1
    }
    d
  }

  /** Deployment hook for the REAL ISO Table 3-B.3 (round-13 verdict:
    * the literal values are unobtainable in this offline build, but a
    * deployment that HAS them should get bit-true PCM without a
    * rebuild). The override is installed from the system property
    * `graft.audio.windowTablePath` at class-init time — one integer
    * per line, 512 lines of the table's 2^16 fixed-point values; on a
    * cluster, set it on every executor via
    * `spark.executor.extraJavaOptions` (the decode runs executor-side
    * and this object initializes per-JVM). [[installWindowTable]] is
    * the programmatic form (tests, notebooks). Validation enforces
    * the structural invariants the headroom proof and the oracle rely
    * on: 512 values, D(0) = 0, |D| < 2^17, and the spec's symmetry
    * classes — an array that fails them is rejected loudly, never
    * half-installed. [[windowIsSpecTable]] is the machine-visible
    * conformance marker the round-13 advice asked for: `false` means
    * PCM output is the documented internally-consistent stand-in
    * domain, NOT bit-true ISO; code that needs conformance asserts on
    * it instead of parsing prose. */
  @volatile private var windowOverride: Option[Array[Long]] = None

  /** The window table every synthesis (and every oracle literal) uses:
    * the installed ISO table if present, else the [[WindowD]]
    * stand-in. Capture it ONCE per decode ([[SynthState]] does) so a
    * concurrent install can never tear a stream mid-clip. */
  def windowTable: Array[Long] = windowOverride.getOrElse(WindowD)

  /** True iff a deployment installed the real Table 3-B.3 — i.e. PCM
    * output is bit-true ISO rather than the documented stand-in
    * domain. */
  def windowIsSpecTable: Boolean = windowOverride.isDefined

  def installWindowTable(values: Array[Long]): Unit = {
    require(values.length == 512,
      s"window table must have 512 values, got ${values.length}")
    require(values(0) == 0L, "Table 3-B.3 has D(0) = 0")
    require(values.forall(v => math.abs(v) < (1L << 17)),
      "window values exceed the |D| < 2^17 headroom bound")
    for (i <- 1 until 256) {
      val want = if (i % 64 == 0) values(i) else -values(i)
      require(values(512 - i) == want,
        s"symmetry violated at D(${512 - i}): expected $want, " +
          s"got ${values(512 - i)}")
    }
    windowOverride = Some(values.clone())
  }

  def loadWindowTable(path: String): Unit =
    installWindowTable(
      scala.io.Source.fromFile(path).getLines()
        .map(_.trim).filter(_.nonEmpty).map(_.toLong).toArray)

  /** Revert to the stand-in (test hygiene). */
  def clearWindowTable(): Unit = windowOverride = None

  sys.props.get("graft.audio.windowTablePath").foreach(loadWindowTable)

  /** Per-channel synthesis state: the spec's 1024-value V shift
    * register. [[processGroup]] is §2.4.3.2.2 verbatim in exact
    * integer arithmetic:
    *
    *  1. shift V by 64;
    *  2. matrixing V(i) = (Σ_k Nfp(i,k)·S(k)) >> 16 — the >> 16
    *     (arithmetic = floor, replayed in the oracle as DuckDB's
    *     BIGINT `>>`, verified floor-identical) drops the matrix's
    *     2^16 scale so V stays in the subband samples' own 2^16
    *     fixed-point domain. Headroom: |S| ≤ 2^18, so
    *     |Σ| ≤ 32·2^16·2^18 = 2^39 — exact in a Long;
    *  3. the U map U(64m+j) = V(128m+j), U(64m+32+j) = V(128m+96+j)
    *     and the windowed 16-tap sum
    *     pcm(j) = Σ_{m<8} D(j+64m)·V(128m+j) + D(j+64m+32)·V(128m+96+j)
    *     fused into one loop. Headroom: |V| ≤ 2^23, |D| ≤ 2^17, 16
    *     terms → |pcm| ≤ 2^44 — exact in a Long, in the 2^32
    *     fixed-point domain (sample 2^16 × window 2^16).
    */
  final class SynthState {
    private val v = new Array[Long](1024)
    private val d = windowTable // captured once; see windowOverride doc
    def processGroup(s: Array[Long], out: Array[Long]): Unit = {
      System.arraycopy(v, 0, v, 64, 960)
      var i = 0
      while (i < 64) {
        val n = Nfp(i)
        var acc = 0L
        var k = 0
        while (k < 32) { acc += n(k) * s(k); k += 1 }
        v(i) = acc >> 16
        i += 1
      }
      var j = 0
      while (j < 32) {
        var acc = 0L
        var m = 0
        while (m < 8) {
          acc += d(j + 64 * m) * v(128 * m + j)
          acc += d(j + 64 * m + 32) * v(128 * m + 96 + j)
          m += 1
        }
        out(j) = acc
        j += 1
      }
    }
  }

  /** Per-(channel, group) PCM statistics in the 2^32 fixed-point
    * domain, integer-exact: one row per 32-sample synthesis output.
    * `t` is the GLOBAL group index (frame·12 + granule for Layer I),
    * `last` is pcm(31) — with sum/peak it pins the full 64×32-tap +
    * 16-tap convolution cross-engine. */
  case class PcmGroup(ch: Int, t: Int, sumAbs: Long, peak: Long,
                      last: Long)

  /** Layer I decode THROUGH the polyphase synthesis: one [[PcmGroup]]
    * per (channel, 32-sample group), groups in stream order per
    * channel (each channel runs its own V register, seeded zero as
    * the spec prescribes). None exactly when [[decode]] is None. */
  def decodePcm(b: Array[Byte]): Option[Seq[PcmGroup]] =
    parseL1(b).map { p =>
      val out = Vector.newBuilder[PcmGroup]
      var ch = 0
      while (ch < p.nCh) {
        val st = new SynthState
        val s = new Array[Long](32)
        val pcm = new Array[Long](32)
        var tau = 0
        p.frames.foreach { fr =>
          var t = 0
          while (t < 12) {
            var sb = 0
            while (sb < 32) { s(sb) = fr.sfp(t)(sb)(ch); sb += 1 }
            st.processGroup(s, pcm)
            var sumAbs = 0L
            var peak = 0L
            var j = 0
            while (j < 32) {
              val a = math.abs(pcm(j))
              sumAbs += a
              if (a > peak) peak = a
              j += 1
            }
            out += PcmGroup(ch, tau, sumAbs, peak, pcm(31))
            tau += 1
            t += 1
          }
        }
        ch += 1
      }
      out.result()
    }

  /** Layer I decode to the RAW PCM sample tier: per channel, the
    * concatenated 2^32-fixed-point PCM (nFrames·384 values) — the DSP
    * input tier ([[graft.operators.Multimodal.decodeWavSamples]]'
    * analog for synthesized audio:
    * q334 runs its FIR downsample as codegen Column arithmetic over
    * this array, certifying that downstream operators consume the
    * synthesis output end-to-end). */
  def decodePcmSamples(b: Array[Byte]): Option[Seq[(Int, Array[Long])]] =
    parseL1(b).map { p =>
      (0 until p.nCh).map { ch =>
        val st = new SynthState
        val s = new Array[Long](32)
        val pcm = new Array[Long](32)
        val all = new Array[Long](p.frames.length * 384)
        var off = 0
        p.frames.foreach { fr =>
          var t = 0
          while (t < 12) {
            var sb = 0
            while (sb < 32) { s(sb) = fr.sfp(t)(sb)(ch); sb += 1 }
            st.processGroup(s, pcm)
            System.arraycopy(pcm, 0, all, off, 32)
            off += 32
            t += 1
          }
        }
        (ch, all)
      }
    }

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
                   code: (Int, Int, Int, Int) => Int,
                   withCrc: Boolean = false,
                   padOf: Int => Int = _ => 0): Array[Byte] = {
    require(brIdx >= 1 && brIdx <= 14 && fsIdx >= 0 && fsIdx <= 2)
    val nCh = if (mode == 3) 1 else 2
    val bound = if (mode == 1) (modeExt + 1) * 4 else 32
    val out = collection.mutable.ArrayBuffer.empty[Byte]
    var lenSoFar = 0
    for (f <- 0 until nFrames) {
      // per-frame padding (the 44.1 kHz cadence pattern): one extra
      // 32-bit slot when padOf(f) = 1, exactly what the decoder's
      // slot arithmetic consumes — padding bytes are ancillary, so
      // decoded features must match the unpadded stream (spec-pinned)
      val pad = padOf(f) & 1
      val slots = 12 * (BitrateL1(brIdx) * 1000) / SampleRate(fsIdx) + pad
      val frameLen = slots * 4
      val w = new BitWriter
      val crc = if (withCrc) new Crc16 else null
      def hdr16(v: Int, n: Int): Unit = { // header bits 16-31: protected
        w.put(v, n); if (crc != null) crc.feed(v, n)
      }
      w.put(0xfff, 12); w.put(1, 1) // sync, ID=MPEG-1
      w.put(3, 2) // layer I
      w.put(if (withCrc) 0 else 1, 1) // protection_bit: 0 = CRC present
      hdr16(brIdx, 4); hdr16(fsIdx, 2)
      hdr16(pad, 1) // padding
      hdr16(0, 1) // private
      hdr16(mode, 2); hdr16(modeExt, 2)
      hdr16(0, 1); hdr16(1, 1) // copyright, original
      hdr16(0, 2) // emphasis
      if (withCrc) w.put(0, 16) // CRC placeholder, patched below
      for (sb <- 0 until 32) {
        def putA(v: Int): Unit = {
          w.put(v, 4); if (crc != null) crc.feed(v, 4)
        }
        if (sb < bound || nCh == 1)
          for (ch <- 0 until nCh) putA(allocCode(ch, sb) & 0xf)
        else putA(allocCode(0, sb) & 0xf)
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
      val bytes = w.padToBytes(frameLen)
      if (crc != null) { // CRC lives in the two bytes after the header
        bytes(4) = ((crc.value >>> 8) & 0xff).toByte
        bytes(5) = (crc.value & 0xff).toByte
      }
      out ++= bytes
      lenSoFar += frameLen
      require(out.length == lenSoFar,
        s"fixture payload overflows the $frameLen-byte Layer I frame")
    }
    out.toArray
  }

  // -------------------------------------------------------------------
  // Layer II (ISO/IEC 11172-3 §2.4.1.6, 2.4.2.2, tables 3-B.2a–d and
  // 3-B.4). Spec DATA embedded below; everything else is spec math.
  // -------------------------------------------------------------------

  /** Layer II bitrates (kbit/s) by header index; 0 = free format
    * (unsupported), 15 = forbidden. */
  private[graft] val BitrateL2 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
      384)

  /** The 17 Layer II quantizer classes (1-based; 0 = not allocated):
    * number of steps, codeword bits, and whether three consecutive
    * samples share one grouped codeword (steps 3/5/9 → one 5/7/10-bit
    * base-`steps` number). Spec table 3-B.4's rows in step order. */
  private[graft] val ClsSteps: Array[Int] =
    Array(0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
      8191, 16383, 32767, 65535)
  private[graft] val ClsBits: Array[Int] =
    Array(0, 5, 7, 3, 10, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private[graft] val ClsGrouped: Array[Boolean] =
    ClsSteps.map(s => s == 3 || s == 5 || s == 9)

  /** Allocation-index → quantizer-class rows shared by tables
    * 3-B.2a–d. Row 0 serves the 2-bit subbands of tables a/b, row 1
    * their 3-bit subbands, rows 2/3 their 4-bit subbands, row 4 every
    * subband of the low-rate tables c/d (its first 4/8/16 entries are
    * the 2/3/4-bit column of those tables). Index 0 is always
    * "no samples". */
  private[graft] val AllocRows: Array[Array[Int]] = Array(
    Array(0, 1, 2, 17),
    Array(0, 1, 2, 3, 4, 5, 6, 17),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 17),
    Array(0, 1, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17),
    Array(0, 1, 2, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16))

  /** Subband limits of tables 3-B.2a–d (tab ids 0–3). */
  private[graft] val L2SbLimit = Array(27, 30, 8, 12)

  /** Per-(table, subband) allocation-field width. Tables a/b: 4 bits
    * for subbands 0–10, 3 for 11–22, 2 above; tables c/d: 4 bits for
    * subbands 0–1, 3 above. */
  private[graft] val L2Nbal: Array[Array[Int]] = Array.tabulate(4, 30) {
    (tab, sb) =>
      if (sb >= L2SbLimit(tab)) 0
      else if (tab <= 1) { if (sb < 11) 4 else if (sb < 23) 3 else 2 }
      else { if (sb < 2) 4 else 3 }
  }

  /** Per-(table, subband) [[AllocRows]] row. Tables a/b: row 3 for
    * subbands 0–2 (the no-5/9-step high-resolution column), row 2 for
    * 3–10, row 1 for 11–22, row 0 above; tables c/d: row 4 throughout. */
  private[graft] val L2Row: Array[Array[Int]] = Array.tabulate(4, 30) {
    (tab, sb) =>
      if (sb >= L2SbLimit(tab)) 0
      else if (tab <= 1) { if (sb < 3) 3 else if (sb < 11) 2
        else if (sb < 23) 1 else 0 }
      else 4
  }

  /** Quantizer class for (table, subband, allocation index). */
  private[graft] def l2ClsOfIdx(tab: Int, sb: Int, idx: Int): Int =
    AllocRows(L2Row(tab)(sb))(idx)

  /** Allocation-table selection from the 3-B.2a–d table headers:
    * per-channel bitrate (total/2 for any two-channel mode) and
    * sampling frequency pick the table; combinations outside the
    * headers (e.g. mono above 192 kbit/s, stereo at 32 kbit/s total)
    * have no table and are malformed (−1). */
  private[graft] def l2AllocTable(fsIdx: Int, brPerCh: Int): Int =
    fsIdx match {
      case 1 => // 48 kHz: no 3-B.2b rates
        if (brPerCh == 32 || brPerCh == 48) 2
        else if (brPerCh >= 56 && brPerCh <= 192) 0
        else -1
      case 0 => // 44.1 kHz
        if (brPerCh == 32 || brPerCh == 48) 2
        else if (brPerCh >= 56 && brPerCh <= 80) 0
        else if (brPerCh >= 96 && brPerCh <= 192) 1
        else -1
      case 2 => // 32 kHz: low rates use 3-B.2d
        if (brPerCh == 32 || brPerCh == 48) 3
        else if (brPerCh >= 56 && brPerCh <= 80) 0
        else if (brPerCh >= 96 && brPerCh <= 192) 1
        else -1
      case _ => -1
    }

  /** QSF2(idx)(cls) = round(2^16 · 2·2^(−idx/3) / steps_cls) — the
    * Layer II fixed-point constant per (scalefactor index, quantizer
    * class). For ungrouped classes (steps = 2^nb − 1) this EQUALS
    * [[QSF]](idx)(nb); built from StrictMath like QSF, and q331's
    * oracle interpolates the same values. */
  val QSF2: Array[Array[Long]] = Array.tabulate(63, 18) { (idx, cls) =>
    if (cls == 0) 0L
    else Math.round(65536.0 * 2.0 * StrictMath.pow(2.0, -idx / 3.0) /
      ClsSteps(cls).toDouble)
  }

  /** Exact integer dequantization of one Layer II sample code: the
    * 3-B.4 formula s'' = C·(s''' + D) with C = 2^nb/steps and
    * D = 2^(1−nb) (ungrouped) or 1/2 (grouped) collapses in both
    * cases to the rational (2c + 1 − steps)/steps, times SF(idx). */
  def dequantFp2(c: Int, cls: Int, scfIdx: Int): Long =
    (2L * c + 1L - ClsSteps(cls)) * QSF2(scfIdx)(cls)

  /** Per-clip Layer II decoded-subband statistics, all integer-exact
    * in the 2^16 fixed-point domain. Beyond [[Features]]' fields:
    * `tabId`/`sbLimit` pin the 3-B.2 table selection, `nScf` counts
    * TRANSMITTED scalefactors (3/2/1 per allocated channel-subband
    * depending on scfsi — a mis-parsed scfsi cannot hide). */
  case class Features2(sampleRate: Int, bitrateKbps: Int, modeCode: Int,
                       nChannels: Int, tabId: Int, sbLimit: Int,
                       nFrames: Int, nSamples: Long, nActive: Long,
                       nScf: Long, sumAbsFp: Long, peakFp: Long,
                       lastFp: Long)

  /** One parsed Layer II frame: quantizer classes per (channel,
    * subband) and the DENSE dequantized samples `sfp(g)(sb)(ch)` for
    * the frame's 36 sample groups g = granule·3 + i — the common
    * input of [[decodeL2]]'s stats walk and [[decodeL2Pcm]]'s
    * synthesis. */
  private final class L2Frame(val cls: Array[Array[Int]],
                              val sfp: Array[Array[Array[Long]]])

  private final class L2Parsed(val sampleRate: Int, val bitrate: Int,
                               val modeCode: Int, val nCh: Int,
                               val tabId: Int, val nActive: Long,
                               val nScf: Long,
                               val frames: Vector[L2Frame])

  /** Shared Layer II frame walker — identical bit layout, CRC, table
    * selection, grouping and dequantization as before the round-13
    * split (q331's hash oracle pins the derived stats across the
    * refactor). */
  private def parseL2(b: Array[Byte]): Option[L2Parsed] =
    try {
      var off = 0
      var nFrames = 0
      var nActive = 0L
      var nScf = 0L
      var sampleRate = 0
      var bitrate = 0
      var modeCode = -1
      var nCh = 0
      var tabId = -1
      val frames = Vector.newBuilder[L2Frame]
      while (off + 4 <= b.length) {
        val h = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
          ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
        if ((h >>> 20) != 0xfff) bail()
        if (((h >>> 19) & 1) != 1) bail() // MPEG-1 only
        if (((h >>> 17) & 3) != 2) return None // Layer II code = 0b10
        val protection = (h >>> 16) & 1
        val brIdx = (h >>> 12) & 0xf
        val fsIdx = (h >>> 10) & 3
        val padding = (h >>> 9) & 1
        val mode = (h >>> 6) & 3
        val modeExt = (h >>> 4) & 3
        if (brIdx == 0 || brIdx == 15 || fsIdx == 3) bail()
        val fs = SampleRate(fsIdx)
        val br = BitrateL2(brIdx) * 1000
        val ch = if (mode == 3) 1 else 2
        val tab = l2AllocTable(fsIdx, BitrateL2(brIdx) / ch)
        if (tab < 0) bail()
        if (nFrames == 0) {
          sampleRate = fs; bitrate = BitrateL2(brIdx); modeCode = mode
          nCh = ch; tabId = tab
        } else if (fs != sampleRate || mode != modeCode || tab != tabId)
          bail()
        val sbLimit = L2SbLimit(tab)
        // Layer II slots are BYTES: 144·bitrate/fs (+padding)
        val frameLen = 144 * br / fs + padding
        if (off + frameLen > b.length) bail()
        val r = new BitReader(b, off + 4, off + frameLen)
        val crcRead = if (protection == 0) r.bits(16) else -1
        val crc = if (protection == 0) new Crc16 else null
        if (crc != null) crc.feed(h & 0xffff, 16)
        val bound = math.min(
          if (mode == 1) (modeExt + 1) * 4 else sbLimit, sbLimit)
        // bit allocation: per channel below the intensity bound, one
        // shared field above it; the (tab, sb) row maps the index to
        // a quantizer class (every index is defined — no forbidden
        // codes in Layer II allocation)
        val cls = Array.ofDim[Int](2, 30)
        var sb = 0
        while (sb < sbLimit) {
          val nbal = L2Nbal(tab)(sb)
          if (sb < bound || nCh == 1) {
            var c = 0
            while (c < nCh) {
              val av = r.bits(nbal)
              if (crc != null) crc.feed(av, nbal)
              cls(c)(sb) = l2ClsOfIdx(tab, sb, av)
              if (cls(c)(sb) != 0) nActive += 1
              c += 1
            }
          } else {
            val av = r.bits(nbal)
            if (crc != null) crc.feed(av, nbal)
            cls(0)(sb) = l2ClsOfIdx(tab, sb, av)
            cls(1)(sb) = cls(0)(sb)
            if (cls(0)(sb) != 0) nActive += 2
          }
          sb += 1
        }
        // scfsi: 2 bits per allocated (subband, channel) — above the
        // bound samples are shared but scalefactors stay per-channel,
        // so BOTH channels transmit scfsi and scalefactors
        val scfsi = Array.ofDim[Int](2, 30)
        sb = 0
        while (sb < sbLimit) {
          var c = 0
          while (c < nCh) {
            if (cls(c)(sb) != 0) {
              val sv = r.bits(2)
              if (crc != null) crc.feed(sv, 2)
              scfsi(c)(sb) = sv
            }
            c += 1
          }
          sb += 1
        }
        // Layer II protects header bits 16-31 + allocation + scfsi
        if (crc != null && crc.value != crcRead) bail()
        // scalefactors: scfsi selects how many of the frame's three
        // 12-sample parts share a transmitted value —
        //   0: three values (one per part)   1: two (parts 01, part 2)
        //   2: one (all parts)               3: two (part 0, parts 12)
        val scf = Array.ofDim[Int](2, 30, 3)
        sb = 0
        while (sb < sbLimit) {
          var c = 0
          while (c < nCh) {
            if (cls(c)(sb) != 0) {
              def rd(): Int = {
                val s = r.bits(6)
                if (s == 63) bail() // index 63 illegal, as in Layer I
                nScf += 1
                s
              }
              scfsi(c)(sb) match {
                case 0 =>
                  scf(c)(sb)(0) = rd(); scf(c)(sb)(1) = rd()
                  scf(c)(sb)(2) = rd()
                case 1 =>
                  val a = rd(); val z = rd()
                  scf(c)(sb)(0) = a; scf(c)(sb)(1) = a; scf(c)(sb)(2) = z
                case 2 =>
                  val a = rd()
                  scf(c)(sb)(0) = a; scf(c)(sb)(1) = a; scf(c)(sb)(2) = a
                case _ =>
                  val a = rd(); val z = rd()
                  scf(c)(sb)(0) = a; scf(c)(sb)(1) = z; scf(c)(sb)(2) = z
              }
            }
            c += 1
          }
          sb += 1
        }
        // samples: 12 granules of 3 samples; grouped classes pack the
        // triplet into one base-`steps` codeword (lowest digit =
        // first sample); shared subbands decode channel 0's codes and
        // apply each channel's own scalefactor (channel-major, so the
        // sample-instance order is (granule, sb, channel, i) for
        // every subband)
        val sfp = Array.ofDim[Long](36, 30, 2)
        val tmp = new Array[Int](3)
        var gr = 0
        while (gr < 12) {
          val part = gr >> 2
          sb = 0
          while (sb < sbLimit) {
            val shared = sb >= bound && nCh == 2
            val nStreams = if (shared) 1 else nCh
            var s = 0
            while (s < nStreams) {
              val k = cls(s)(sb)
              if (k != 0) {
                if (ClsGrouped(k)) {
                  var g = r.bits(ClsBits(k))
                  val st = ClsSteps(k)
                  tmp(0) = g % st; g /= st
                  tmp(1) = g % st; tmp(2) = g / st
                  if (tmp(2) >= st) bail() // codeword ≥ steps^3
                } else {
                  tmp(0) = r.bits(ClsBits(k)); tmp(1) = r.bits(ClsBits(k))
                  tmp(2) = r.bits(ClsBits(k))
                }
                val applyCh = if (shared) 2 else 1
                var a = 0
                while (a < applyCh) {
                  val c = if (shared) a else s
                  var i = 0
                  while (i < 3) {
                    sfp(gr * 3 + i)(sb)(c) =
                      dequantFp2(tmp(i), k, scf(c)(sb)(part))
                    i += 1
                  }
                  a += 1
                }
              }
              s += 1
            }
            sb += 1
          }
          gr += 1
        }
        frames += new L2Frame(cls, sfp) // both allocated per frame
        nFrames += 1
        off += frameLen // remaining frame bits are ancillary data
      }
      if (nFrames == 0 || off != b.length) bail()
      Some(new L2Parsed(sampleRate, bitrate, modeCode, nCh, tabId,
        nActive, nScf, frames.result()))
    } catch { case _: ParseEx | _: ArrayIndexOutOfBoundsException => None }

  /** Decode a payload of back-to-back Layer II frames to the subband-
    * sample stats tier. Same contract as [[decode]]: None for
    * anything malformed or beyond the seam (Layer I/III headers
    * included — one payload, one layer). Stats walk the dense arrays
    * in the original instance order (granule, sb, channel, i-inner),
    * so `lastFp` and the counts are bit-identical to the
    * pre-refactor single pass. */
  def decodeL2(b: Array[Byte]): Option[Features2] =
    parseL2(b).map { p =>
      val sbLimit = L2SbLimit(p.tabId)
      var nSamples = 0L
      var sumAbs = 0L
      var peak = 0L
      var last = 0L
      p.frames.foreach { fr =>
        var gr = 0
        while (gr < 12) {
          var sb = 0
          while (sb < sbLimit) {
            var ch = 0
            while (ch < p.nCh) { // shared bands: cls(1) copied = emit 2
              if (fr.cls(ch)(sb) != 0) {
                var i = 0
                while (i < 3) {
                  val v = fr.sfp(gr * 3 + i)(sb)(ch)
                  nSamples += 1
                  sumAbs += math.abs(v)
                  if (math.abs(v) > peak) peak = math.abs(v)
                  last = v
                  i += 1
                }
              }
              ch += 1
            }
            sb += 1
          }
          gr += 1
        }
      }
      Features2(p.sampleRate, p.bitrate, p.modeCode, p.nCh, p.tabId,
        sbLimit, p.frames.length, nSamples, p.nActive, p.nScf, sumAbs,
        peak, last)
    }

  /** Layer II decode THROUGH the polyphase synthesis — [[decodePcm]]'s
    * exact contract with 36 groups per frame (granule·3 + i): one
    * [[PcmGroup]] per (channel, group), per-channel zero-seeded V
    * registers, hash-oracled by q333. */
  def decodeL2Pcm(b: Array[Byte]): Option[Seq[PcmGroup]] =
    parseL2(b).map { p =>
      val sbLimit = L2SbLimit(p.tabId)
      val out = Vector.newBuilder[PcmGroup]
      var ch = 0
      while (ch < p.nCh) {
        val st = new SynthState
        val s = new Array[Long](32)
        val pcm = new Array[Long](32)
        var tau = 0
        p.frames.foreach { fr =>
          var g = 0
          while (g < 36) {
            var sb = 0
            while (sb < 32) {
              s(sb) = if (sb < sbLimit) fr.sfp(g)(sb)(ch) else 0L
              sb += 1
            }
            st.processGroup(s, pcm)
            var sumAbs = 0L
            var peak = 0L
            var j = 0
            while (j < 32) {
              val a = math.abs(pcm(j))
              sumAbs += a
              if (a > peak) peak = a
              j += 1
            }
            out += PcmGroup(ch, tau, sumAbs, peak, pcm(31))
            tau += 1
            g += 1
          }
        }
        ch += 1
      }
      out.result()
    }

  /** Layer II decode to the RAW PCM sample tier ([[decodePcmSamples]]'
    * contract with 36 groups per frame): per channel, the concatenated
    * 2^32-fixed-point PCM (nFrames·1152 values). q335 runs the FIR
    * downsample over this array — both layers now feed DSP end to
    * end. */
  def decodeL2PcmSamples(b: Array[Byte])
      : Option[Seq[(Int, Array[Long])]] =
    parseL2(b).map { p =>
      val sbLimit = L2SbLimit(p.tabId)
      (0 until p.nCh).map { ch =>
        val st = new SynthState
        val s = new Array[Long](32)
        val pcm = new Array[Long](32)
        val all = new Array[Long](p.frames.length * 1152)
        var off = 0
        p.frames.foreach { fr =>
          var g = 0
          while (g < 36) {
            var sb = 0
            while (sb < 32) {
              s(sb) = if (sb < sbLimit) fr.sfp(g)(sb)(ch) else 0L
              sb += 1
            }
            st.processGroup(s, pcm)
            System.arraycopy(pcm, 0, all, off, 32)
            off += 32
            g += 1
          }
        }
        (ch, all)
      }
    }

  /** Synthesize a conformant Layer II frame sequence from closed-form
    * generators (the [[encodeLayer1]] fixture pattern). Generators:
    *
    *  - `allocIdx(ch, sb)`: allocation index, bounded by the (table,
    *    subband) field width; above the intensity bound channel 0's
    *    value is used.
    *  - `scfsiOf(ch, sb)`: 0..3, read only where allocated.
    *  - `scfIdx(ch, sb, part)`: 0..62 per 12-sample part; scfsi
    *    decides which parts' values are transmitted (1 → parts 0 and
    *    2; 3 → parts 0 and 1's... see [[decodeL2]]: the TRANSMITTED
    *    values are part 0('s shared run) first, so scfsi 1 sends
    *    (part01, part2) = (scfIdx(·,·,0), scfIdx(·,·,2)) and scfsi 3
    *    sends (part0, part12) = (scfIdx(·,·,0), scfIdx(·,·,1)) — the
    *    oracle's effective-scalefactor CASE mirrors this exactly.
    *  - `code(f, gr, i, ch, sb)`: raw sample value; grouped classes
    *    take it mod `steps` per sample and pack the base-steps
    *    triplet, ungrouped mask it to the codeword width. Above the
    *    bound channel 0's stream is shared.
    *
    * Throws if the payload overflows the frame — a fixture bug. */
  def encodeLayer2(nFrames: Int, brIdx: Int, fsIdx: Int, mode: Int,
                   modeExt: Int,
                   allocIdx: (Int, Int) => Int,
                   scfsiOf: (Int, Int) => Int,
                   scfIdx: (Int, Int, Int) => Int,
                   code: (Int, Int, Int, Int, Int) => Int,
                   withCrc: Boolean = false,
                   padOf: Int => Int = _ => 0): Array[Byte] = {
    require(brIdx >= 1 && brIdx <= 14 && fsIdx >= 0 && fsIdx <= 2)
    val nCh = if (mode == 3) 1 else 2
    val tab = l2AllocTable(fsIdx, BitrateL2(brIdx) / nCh)
    require(tab >= 0,
      s"no 3-B.2 table for fsIdx=$fsIdx brIdx=$brIdx nCh=$nCh")
    val sbLimit = L2SbLimit(tab)
    val bound = math.min(
      if (mode == 1) (modeExt + 1) * 4 else sbLimit, sbLimit)
    val baseLen = 144 * (BitrateL2(brIdx) * 1000) / SampleRate(fsIdx)
    val out = collection.mutable.ArrayBuffer.empty[Byte]
    var lenSoFar = 0
    def clsAt(ch: Int, sb: Int): Int = {
      val src = if (sb >= bound && nCh == 2) 0 else ch
      l2ClsOfIdx(tab, sb, allocIdx(src, sb) & ((1 << L2Nbal(tab)(sb)) - 1))
    }
    for (f <- 0 until nFrames) {
      val pad = padOf(f) & 1 // Layer II pads by ONE byte slot
      val frameLen = baseLen + pad
      val w = new BitWriter
      val crc = if (withCrc) new Crc16 else null
      def hdr16(v: Int, n: Int): Unit = {
        w.put(v, n); if (crc != null) crc.feed(v, n)
      }
      w.put(0xfff, 12); w.put(1, 1) // sync, ID=MPEG-1
      w.put(2, 2) // layer II
      w.put(if (withCrc) 0 else 1, 1) // protection_bit: 0 = CRC present
      hdr16(brIdx, 4); hdr16(fsIdx, 2)
      hdr16(pad, 1); hdr16(0, 1) // padding, private
      hdr16(mode, 2); hdr16(modeExt, 2)
      hdr16(0, 1); hdr16(1, 1); hdr16(0, 2) // copyright, original, emph
      if (withCrc) w.put(0, 16) // CRC placeholder, patched below
      for (sb <- 0 until sbLimit) {
        val nbal = L2Nbal(tab)(sb)
        def putA(v: Int): Unit = {
          w.put(v, nbal); if (crc != null) crc.feed(v, nbal)
        }
        if (sb < bound || nCh == 1)
          for (ch <- 0 until nCh) putA(allocIdx(ch, sb) & ((1 << nbal) - 1))
        else putA(allocIdx(0, sb) & ((1 << nbal) - 1))
      }
      for (sb <- 0 until sbLimit; ch <- 0 until nCh)
        if (clsAt(ch, sb) != 0) {
          val sv = scfsiOf(ch, sb) & 3
          w.put(sv, 2); if (crc != null) crc.feed(sv, 2)
        }
      for (sb <- 0 until sbLimit; ch <- 0 until nCh) {
        if (clsAt(ch, sb) != 0) {
          (scfsiOf(ch, sb) & 3) match {
            case 0 => for (p <- 0 to 2) w.put(scfIdx(ch, sb, p) % 63, 6)
            case 1 => w.put(scfIdx(ch, sb, 0) % 63, 6)
              w.put(scfIdx(ch, sb, 2) % 63, 6)
            case 2 => w.put(scfIdx(ch, sb, 0) % 63, 6)
            case _ => w.put(scfIdx(ch, sb, 0) % 63, 6)
              w.put(scfIdx(ch, sb, 1) % 63, 6)
          }
        }
      }
      for (gr <- 0 until 12; sb <- 0 until sbLimit) {
        val shared = sb >= bound && nCh == 2
        val nStreams = if (shared) 1 else nCh
        for (s <- 0 until nStreams) {
          val k = clsAt(s, sb)
          if (k != 0) {
            if (ClsGrouped(k)) {
              val st = ClsSteps(k)
              val g = (code(f, gr, 0, s, sb) % st) +
                st * ((code(f, gr, 1, s, sb) % st) +
                  st * (code(f, gr, 2, s, sb) % st))
              w.put(g, ClsBits(k))
            } else for (i <- 0 until 3)
              w.put(code(f, gr, i, s, sb) & ((1 << ClsBits(k)) - 1),
                ClsBits(k))
          }
        }
      }
      val bytes = w.padToBytes(frameLen)
      if (crc != null) {
        bytes(4) = ((crc.value >>> 8) & 0xff).toByte
        bytes(5) = (crc.value & 0xff).toByte
      }
      out ++= bytes
      lenSoFar += frameLen
      require(out.length == lenSoFar,
        s"fixture payload overflows the $frameLen-byte Layer II frame")
    }
    out.toArray
  }
}
