package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID heuristics. All pure `Column` expressions
  * (codegen'd, no UDFs) so they run inside WholeStageCodegen over a 100 TB
  * documents table without serialization breaks.
  */
object TextAnalysis {

  val StopWords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: runs of letters, runs of digits, or runs of
    * other non-space symbols, each with an optional leading space — the
    * GPT-2 pre-tokenizer shape without the merges table. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text,
      lit(" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"), lit(0)))

  /** Fraction of whitespace tokens that are stopwords. (Guard is on the
    * trimmed length: split of an empty string yields [""], so a
    * size(toks)==0 check would never fire.) */
  def stopwordRatio(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val stops = filter(toks, t => t.isin(StopWords: _*))
    when(length(trim(text)) === 0, 0.0)
      .otherwise(size(stops).cast("double") / size(toks).cast("double"))
  }

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[.,!?;:'\"()\\-]", "")))
        .cast("double") / length(text).cast("double"))

  /** Mean word length over whitespace tokens. */
  def meanWordLen(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    when(length(trim(text)) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite quality score in [0, 1]: length sweet-spot, low punctuation,
    * moderate stopword presence. A simple, fully-deterministic heuristic —
    * the shape of C4/Gopher-style quality filters. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 5.0, lit(1.0))
    graft.Fns.roundU(lenScore * 0.5 + stopScore * 0.3 + (lit(1.0) - punctPenalty) * 0.2, 4)
  }

  /** Stopword-driven language-ID heuristic: scores English stopword density
    * and classifies en / other. (The driver's synthetic corpus uses one
    * vocabulary for all langs, so this demonstrates the operator shape, not
    * linguistic accuracy.) */
  def langIdHeuristic(text: Column): Column =
    when(stopwordRatio(text) >= 0.03, "en").otherwise("other")
}
