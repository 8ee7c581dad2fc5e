package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM gates for the MPEG-1 Layer I subband decoder: encode →
  * decode round-trips against an independent Scala model of the
  * dequantization, plus the malformed-payload drop contract (None,
  * never an exception — the FlacAudio posture). The cross-engine
  * certification lives in q330's DuckDB oracle; this spec is the fast
  * in-build gate. */
class Mpeg1AudioSpec extends AnyFunSuite {

  private def alloc(id: Long)(ch: Int, sb: Int): Int =
    if ((id + sb) % 3 == 0) 0 else 1 + ((id * 5 + sb * 7) % 8).toInt
  private def scf(id: Long)(ch: Int, sb: Int): Int =
    ((id * 7 + sb * 11 + ch * 3) % 63).toInt
  private def code(id: Long)(f: Int, t: Int, ch: Int, sb: Int): Int =
    ((id * 97 + f * 31 + t * 13 + sb * 17 + ch * 29) % 65536).toInt

  private def fixture(id: Long): Array[Byte] = {
    val kind = (id % 3).toInt
    val mode = kind match { case 0 => 3; case 1 => 0; case _ => 1 }
    Mpeg1Audio.encodeLayer1(1 + (id % 2).toInt, 14, 2, mode,
      (id % 4).toInt, alloc(id), scf(id), code(id))
  }

  /** Independent model: every decoded sample instance in scan order. */
  private def model(id: Long): Seq[Long] = {
    val kind = (id % 3).toInt
    val nCh = if (kind == 0) 1 else 2
    val bound = if (kind == 2) ((id % 4).toInt + 1) * 4 else 32
    val nFr = 1 + (id % 2).toInt
    for {
      f <- 0 until nFr
      t <- 0 until 12
      sb <- 0 until 32
      ch <- 0 until nCh
      a = alloc(id)(0, sb)
      if a != 0
    } yield {
      val nb = a + 1
      val srcCh = if (sb >= bound) 0 else ch
      val c = code(id)(f, t, srcCh, sb) & ((1 << nb) - 1)
      Mpeg1Audio.dequantFp(c, nb, scf(id)(ch, sb))
    }
  }

  test("round-trip: mono / stereo / joint, 1-2 frames, all stats") {
    for (id <- 0L until 24L) {
      val f = Mpeg1Audio.decode(fixture(id))
        .getOrElse(fail(s"decode failed for id=$id"))
      val m = model(id)
      assert(f.sampleRate === 32000)
      assert(f.bitrateKbps === 448)
      assert(f.nChannels === (if (id % 3 == 0) 1 else 2))
      assert(f.nFrames === 1 + (id % 2).toInt)
      assert(f.nSamples === m.size.toLong, s"id=$id")
      assert(f.sumAbsFp === m.map(math.abs).sum, s"id=$id")
      assert(f.peakFp === m.map(math.abs).max, s"id=$id")
      assert(f.lastFp === m.last, s"id=$id")
      assert(f.nActive === m.size / 12, s"id=$id")
    }
  }

  test("malformed payloads drop (None), never throw") {
    val good = fixture(7L)
    assert(Mpeg1Audio.decode(Array.empty[Byte]).isEmpty)
    assert(Mpeg1Audio.decode(good.take(10)).isEmpty) // truncated frame
    val badSync = good.clone(); badSync(0) = 0x12
    assert(Mpeg1Audio.decode(badSync).isEmpty)
    val lsf = good.clone(); lsf(1) = (lsf(1) & 0xf7).toByte // ID=0
    assert(Mpeg1Audio.decode(lsf).isEmpty)
    val badBr = good.clone() // bitrate index 15 (forbidden)
    badBr(2) = (badBr(2) | 0xf0).toByte
    assert(Mpeg1Audio.decode(badBr).isEmpty)
    // allocation code 15 in the first slot (forbidden)
    val badAlloc = good.clone()
    badAlloc(4) = (badAlloc(4) | 0xf0).toByte
    assert(Mpeg1Audio.decode(badAlloc).isEmpty)
    // trailing garbage after the last frame
    assert(Mpeg1Audio.decode(good ++ Array[Byte](1, 2, 3)).isEmpty)
  }

  test("Layer II/III headers are the documented seam: None, not a parse") {
    val good = fixture(3L)
    val l2 = good.clone()
    // layer bits live at header bits 17-18 (byte 1, bits 1-2): I=11 -> II=10
    l2(1) = ((l2(1) & 0xf9) | 0x04).toByte
    assert(Mpeg1Audio.decode(l2).isEmpty)
    val l3 = good.clone()
    l3(1) = ((l3(1) & 0xf9) | 0x02).toByte
    assert(Mpeg1Audio.decode(l3).isEmpty)
  }

  test("QSF table: positive, decreasing in scf index, spec magnitudes") {
    for (nb <- 2 to 15) {
      assert(Mpeg1Audio.QSF(0)(nb) > 0)
      for (idx <- 1 until 63)
        assert(Mpeg1Audio.QSF(idx)(nb) <= Mpeg1Audio.QSF(idx - 1)(nb))
    }
    // idx=0 -> SF=2.0 exactly: QSF = round(131072 / (2^nb - 1))
    assert(Mpeg1Audio.QSF(0)(2) === Math.round(131072.0 / 3))
    assert(Mpeg1Audio.QSF(0)(15) === Math.round(131072.0 / 32767))
  }
}
