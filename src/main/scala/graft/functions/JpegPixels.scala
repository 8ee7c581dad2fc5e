package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** REAL pixel decode for the format everyone assumed needed a native
  * library: baseline JPEG, via the JDK's own `javax.imageio` codec
  * (`com.sun.imageio.plugins.jpeg`, shipped in every stock JDK — no
  * new dependency, no JNI). This closes the "JPEG pixels are fake"
  * gap: [[graft.operators.Multimodal]]'s pixel tier now has a real
  * decode slice for BMP, PNG, WAV, Y4M AND JPEG; only natively-CODED
  * audio/video (MP3/AAC/H.264) remain on the fake tier.
  *
  * Oracle strategy (the part that makes this TESTABLE, not just
  * callable): JPEG is lossy, so an arbitrary image cannot be
  * hash-compared against a SQL formula. But a GRAYSCALE image whose
  * 8×8 blocks are each constant, encoded at compression quality 1.0,
  * round-trips EXACTLY: every AC coefficient of a constant block is
  * zero, the DC coefficient quantizes with step 1 at quality 1.0, and
  * grayscale has no chroma subsampling or YCbCr rounding. The q189
  * fixtures are exactly that profile, so DuckDB can recompute the
  * decoded means from the generation formula without ever parsing a
  * JPEG. RGB JPEGs decode through the same path for real use, but the
  * writer's 4:2:0 subsampling makes them approximate — they are
  * tolerance-gated in the spec, not oracled.
  */
object JpegPixels {

  /** Per-image pixel statistics; grayscale reports its mean on all
    * three channels (luma = the same value, consistent with Rec.601
    * weights summing to 1). */
  case class Features(width: Int, height: Int, channels: Int,
                      meanR: Double, meanG: Double, meanB: Double,
                      meanLuma: Double)

  /** Decode a JPEG payload to pixel statistics with the JDK codec;
    * None for anything ImageIO rejects (corrupt rows are data at
    * scale, not exceptions). */
  def decode(b: Array[Byte]): Option[Features] = {
    if (b == null || b.length < 4) return None
    // cheap magic check (SOI marker) before handing to ImageIO
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    val img =
      try ImageIO.read(new ByteArrayInputStream(b))
      catch { case _: Exception => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val bands = raster.getNumBands
    if (w <= 0 || h <= 0 || bands < 1) return None
    val n = w.toLong * h
    if (bands == 1) {
      var s = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { s += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      val m = s.toDouble / n
      Some(Features(w, h, 1, m, m, m, m))
    } else {
      var sr, sg, sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          sr += raster.getSample(x, y, 0)
          sg += raster.getSample(x, y, 1)
          sb += raster.getSample(x, y, 2)
          x += 1
        }
        y += 1
      }
      val (mr, mg, mb) = (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      Some(Features(w, h, 3, mr, mg, mb,
        0.299 * mr + 0.587 * mg + 0.114 * mb))
    }
  }

  private def write(img: BufferedImage, quality: Float): Array[Byte] = {
    val it = ImageIO.getImageWritersByFormatName("jpeg")
    val writer = it.next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), p)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** FIXTURE synthesis (bounded; test/oracle side only): a grayscale
    * JPEG whose 8×8 blocks are each the constant `block(bx, by)`
    * (values 0..255), dimensions in whole blocks, quality 1.0 — the
    * exactly-round-tripping profile described in the class doc. */
  def encodeGrayBlocks(wBlocks: Int, hBlocks: Int,
                       block: (Int, Int) => Int): Array[Byte] = {
    val (w, h) = (wBlocks * 8, hBlocks * 8)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, block(x / 8, y / 8) & 0xff)
        x += 1
      }
      y += 1
    }
    write(img, 1.0f)
  }

  /** FIXTURE synthesis: an RGB JPEG from a per-pixel color function —
    * the LOSSY profile (subsampled chroma), for tolerance-gated decode
    * coverage of the 3-channel path. */
  def encodeRgb(w: Int, h: Int,
                px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        raster.setSample(x, y, 0, r & 0xff)
        raster.setSample(x, y, 1, g & 0xff)
        raster.setSample(x, y, 2, b & 0xff)
        x += 1
      }
      y += 1
    }
    write(img, 1.0f)
  }
}
