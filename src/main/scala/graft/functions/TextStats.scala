package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-quality statistics — the q28 fusion (round-12 item:
  * q28 was the decade audit's worst row at 4.8×/10× because its five
  * metrics each re-tokenized the document: four independent
  * `split(trim(text), "\\s+")` array materializations plus a
  * regexp_extract_all and a regexp_replace, ~6 regex passes and ~5
  * transient arrays per document). This native `Expression` computes
  * every counter those passes derived in ONE scan of the string with
  * zero per-row allocation beyond the 5-field output struct, exactly
  * preserving the composable forms' semantics (the CharShingleCount
  * precedent; equivalence is pinned per-field against the original
  * column expressions in NativeEquivalenceSpec, and q28's DuckDB
  * oracle is unchanged — hash equality across the rewrite certifies
  * the kernel):
  *
  *  - `n_ws`/`n_stop`/`sum_wlen` replicate
  *    `split(trim(text), "\\s+")` + stopword filter + per-token
  *    length sum: trim strips U+0020 only (Spark `trim`), separators
  *    are Java regex `\s` = [ \t\n\x0B\f\r], fields = separator runs
  *    + 1 (leading/trailing empty fields included, as Java split with
  *    limit -1 keeps them), and the guarded empty-trim case reports 0
  *    so `n_ws == 0` is exactly the old `length(trim(text)) == 0`
  *    guard. Stopwords are matched allocation-free by packing ≤4-char
  *    ASCII tokens into a length-tagged long.
  *  - `n_bpe` replicates `regexp_extract_all(text,
  *    " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+")` counting: maximal
  *    same-class runs (letter / digit / other-than-alnum-or-space) —
  *    the optional leading space only affects match SPANS, never the
  *    count.
  *  - `n_punct` replicates the `regexp_replace(text,
  *    "[.,!?;:'\"()\\-]", "")` length delta.
  *
  * All counts are code-point based, matching `length()` /
  * `UTF8String.numChars` on every side. */
case class TextQualityStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextQualityStats.schema
  override def prettyName: String = "text_quality_stats"

  override def nullSafeEval(input: Any): Any =
    TextQualityStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val obj = TextQualityStats.getClass.getName.stripSuffix("$") +
      "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $obj.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression)
      : TextQualityStats = copy(child = c)
}

object TextQualityStats {
  val schema: StructType = StructType(Seq(
    StructField("n_ws", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("sum_wlen", LongType, nullable = false),
    StructField("n_bpe", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false)))

  /** [[graft.operators.TextAnalysis.StopWords]] packed as
    * (len << 32) | ascii bytes — all ten are ≤4 lowercase ASCII chars,
    * so a token is a stopword iff its running packed key equals one of
    * these ten longs. */
  private val StopPacked: Array[Long] =
    graft.operators.TextAnalysis.StopWords.map { w =>
      require(w.length <= 4 && w.forall(c => c >= 'a' && c <= 'z'))
      (w.length.toLong << 32) |
        w.foldLeft(0L)((acc, c) => (acc << 8) | c)
    }.toArray

  private def isWsSep(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' ||
      cp == '\r'

  private def isPunct(cp: Int): Boolean = cp match {
    case '.' | ',' | '!' | '?' | ';' | ':' | '\'' | '"' | '(' | ')' |
        '-' => true
    case _ => false
  }

  // BPE pre-tokenizer character classes
  private final val ClsLetter = 0
  private final val ClsDigit = 1
  private final val ClsOther = 2
  private final val ClsSpace = 3
  private def bpeCls(cp: Int): Int =
    if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) ClsLetter
    else if (cp >= '0' && cp <= '9') ClsDigit
    else if (cp == ' ') ClsSpace
    else ClsOther

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val n = str.length
    // Spark trim strips U+0020 only; both bounds are single code units
    var lo = 0
    while (lo < n && str.charAt(lo) == ' ') lo += 1
    var hi = n
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
    var sepRuns = 0
    var inSep = false
    var nStop = 0
    var sumWlen = 0L
    var tokLen = 0
    var tokKey = 0L // 0 while viable; -1 once non-stopword-shaped
    var nBpe = 0
    var prevCls = ClsSpace
    var nPunct = 0
    def closeToken(): Unit = {
      if (tokLen >= 1 && tokLen <= 4 && tokKey >= 0) {
        val key = (tokLen.toLong << 32) | tokKey
        var j = 0
        while (j < StopPacked.length) {
          if (StopPacked(j) == key) { nStop += 1; j = StopPacked.length }
          else j += 1
        }
      }
      tokLen = 0; tokKey = 0L
    }
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      // BPE run counting and punct counting see the FULL string
      val cls = bpeCls(cp)
      if (cls != ClsSpace && cls != prevCls) nBpe += 1
      prevCls = cls
      if (isPunct(cp)) nPunct += 1
      if (i >= lo && i < hi) { // inside the trimmed range: ws stats
        if (isWsSep(cp)) {
          if (!inSep) { sepRuns += 1; inSep = true; closeToken() }
        } else {
          inSep = false
          sumWlen += 1
          tokLen += 1
          tokKey =
            if (tokKey < 0 || tokLen > 4 || cp < 'a' || cp > 'z') -1L
            else (tokKey << 8) | cp
        }
      }
      i += Character.charCount(cp)
    }
    closeToken()
    val nWs = if (lo >= hi) 0 else sepRuns + 1
    val out = new GenericInternalRow(5)
    out.setInt(0, nWs)
    out.setInt(1, if (lo >= hi) 0 else nStop)
    out.setLong(2, if (lo >= hi) 0L else sumWlen)
    out.setInt(3, nBpe)
    out.setInt(4, nPunct)
    out
  }
}

object TextStats {
  def textQualityStats(text: Column): Column =
    Bridge.column(TextQualityStats(Bridge.expression(text)))
}
