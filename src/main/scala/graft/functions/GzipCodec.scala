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

  /** Inflate, or null on any malformation (truncation, bad CRC,
    * wrong magic). */
  def gunzip(b: Array[Byte]): Array[Byte] =
    try {
      val in = new GZIPInputStream(
        new java.io.ByteArrayInputStream(b), 8192)
      val out = new ByteArrayOutputStream(b.length * 3 + 64)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
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
