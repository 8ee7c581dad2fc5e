package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** gzip payload codec — the ingestion path for compressed columns
  * (gzipped request bodies, Kafka payloads, archived log lines land
  * as `binary` and must inflate INSIDE the scan projection, not in a
  * driver-side loop). Decode is the JDK's own GZIPInputStream — the
  * same no-new-dependency stance as the PNG inflater and the
  * javax.imageio JPEG tier. Malformed input yields NULL (the
  * try_cast convention: a poisoned row must not fail a 100 TB job;
  * count the nulls downstream), which is also what makes the
  * expression safe under speculative re-execution.
  *
  * Compression output bytes are JDK-version-specific, so only the
  * DECODED side may sit under a cross-engine oracle (q303 checks
  * decoded stats against the source text, never payload bytes).
  */
object GzipCodec {
  def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(b.length / 2 + 64)
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  /** Hard ceiling on inflated size: DEFLATE expands up to ~1032×, so a
    * 100 KB poisoned payload could demand ~100 MB and OOM an executor
    * instead of yielding NULL. 64 MiB comfortably covers any real row
    * payload while bounding per-row memory; an over-limit payload is
    * REJECTED (null), the same contract as malformed input. */
  val MaxInflatedBytes: Int = 64 << 20

  /** Inflate, or null on any malformation (truncation, bad CRC,
    * wrong magic) or on exceeding [[MaxInflatedBytes]] — a
    * decompression bomb is data-quality, not a job failure. */
  def gunzip(b: Array[Byte]): Array[Byte] =
    try {
      val in = new GZIPInputStream(
        new java.io.ByteArrayInputStream(b), 8192)
      val out = new ByteArrayOutputStream(
        math.min(b.length * 3 + 64, MaxInflatedBytes))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      var total = 0L
      while (n >= 0) {
        total += n
        if (total > MaxInflatedBytes) { in.close(); return null }
        out.write(buf, 0, n); n = in.read(buf)
      }
      in.close()
      out.toByteArray
    } catch { case _: java.io.IOException => null }
}

/** `gunzip(payload)` — inflate a gzip binary column; NULL on bad
  * input. */
case class Gunzip(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gunzip"

  override def nullSafeEval(b: Any): Any =
    GzipCodec.gunzip(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GzipCodec.gunzip($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Gunzip =
    copy(child = c)
}
