package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** QOI codec gates: a hand-assembled known-bytes vector (decode is
  * checked against the spec, not against our own encoder), encoder/
  * decoder round-trip against independently recomputed pixel moments,
  * an op-census proving the q220 fixture exercises every op family,
  * and no-throw fuzz over corrupt/truncated payloads (corrupt payloads
  * are data at 100 TB).
  */
object QoiPixelsProps extends Properties("graft.qoi") {

  // ---- hand-assembled 2×2 file straight from the spec ----
  // RGB(10,20,30); RUN(1); DIFF(+1,0,-1); INDEX[9] = the first color
  private val known: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    "qoif".foreach(c => w8(c))
    Seq(0, 0, 0, 2, 0, 0, 0, 2).foreach(w8) // w=2 h=2 big-endian
    w8(3); w8(0)
    w8(0xfe); w8(10); w8(20); w8(30) // OP_RGB
    w8(0xc0)                         // OP_RUN, 1 copy
    w8(0x40 | (3 << 4) | (2 << 2) | 1) // OP_DIFF +1,0,-1
    w8(0x09)                         // OP_INDEX hash(10,20,30,255)=9
    Seq(0, 0, 0, 0, 0, 0, 0, 1).foreach(w8)
    out.toByteArray
  }

  property("known-bytes vector decodes per spec") = {
    val f = QoiPixels.decode(known).get
    // pixels: (10,20,30) (10,20,30) / (11,20,29) (10,20,30)
    val ck = 140L * 1 + 140L * 2 + (11 + 40 + 87).toLong * 3 + 140L * 4
    f.width == 2 && f.height == 2 &&
    math.abs(f.meanR - 41.0 / 4) < 1e-12 &&
    math.abs(f.meanG - 80.0 / 4) < 1e-12 &&
    math.abs(f.meanB - 119.0 / 4) < 1e-12 &&
    f.ordCk == ck
  }

  private def formula(id: Long): (Int, Int, (Int, Int) => (Int, Int, Int)) =
    ((8 + id % 5).toInt, (6 + id % 4).toInt, (x, y) =>
      if (y % 4 == 3) {
        val r = ((x * 3 + id) % 256).toInt
        (r, ((r + 2) % 256).toInt, ((x + id) % 256).toInt)
      } else {
        val v = (((id * 7 + (x / 3) * 5 + (y / 2) * 11) % 8) * 36).toInt
        (v, (v * 2) % 256, 255 - v)
      })

  property("round-trip equals recomputed moments (q220 fixtures)") =
    forAll(Gen.choose(0L, 200L)) { id =>
      val (w, h, px) = formula(id)
      val f = QoiPixels.decode(QoiPixels.encodeRgb(w, h, px)).get
      var sr = 0L; var sg = 0L; var sb = 0L; var ck = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = px(x, y); val p = y * w + x
        sr += r; sg += g; sb += b
        ck += (r + 2L * g + 3L * b) * (p % 97 + 1)
      }
      val n = w * h
      f.width == w && f.height == h && f.ordCk == ck &&
      math.abs(f.meanR - sr.toDouble / n) < 1e-9 &&
      math.abs(f.meanG - sg.toDouble / n) < 1e-9 &&
      math.abs(f.meanB - sb.toDouble / n) < 1e-9
    }

  /** Walk the chunk stream with spec framing and count op families. */
  private def opCensus(b: Array[Byte], nPix: Int): Map[String, Int] = {
    var i = 14; var p = 0
    var m = Map("rgb" -> 0, "index" -> 0, "diff" -> 0, "luma" -> 0,
      "run" -> 0)
    while (p < nPix) {
      val op = b(i) & 0xff; i += 1
      if (op == 0xfe) { m = m.updated("rgb", m("rgb") + 1); i += 3; p += 1 }
      else (op >> 6) match {
        case 0 => m = m.updated("index", m("index") + 1); p += 1
        case 1 => m = m.updated("diff", m("diff") + 1); p += 1
        case 2 => m = m.updated("luma", m("luma") + 1); i += 1; p += 1
        case _ => m = m.updated("run", m("run") + 1); p += (op & 0x3f) + 1
      }
    }
    m
  }

  property("q220 fixture payloads exercise every op family") = {
    val census = (0L until 48L).map { id =>
      val (w, h, px) = formula(id)
      opCensus(QoiPixels.encodeRgb(w, h, px), w * h)
    }.reduce((a, b) => a.map { case (k, v) => k -> (v + b(k)) })
    census.forall { case (op, n) => n > 0 }
  }

  property("truncations and bit flips never throw") =
    forAll(Gen.choose(0L, 50L), Gen.choose(0, 400), Gen.choose(0, 255)) {
      (id, cut, flip) =>
        val (w, h, px) = formula(id)
        val full = QoiPixels.encodeRgb(w, h, px)
        QoiPixels.decode(full.take(cut % (full.length + 1)))
        val mut = full.clone()
        mut(flip % mut.length) = (mut(flip % mut.length) ^ 0x55).toByte
        QoiPixels.decode(mut)
        true
    }

  property("arbitrary byte soup never throws") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { l =>
      QoiPixels.decode(l.toArray); true
    }
}
