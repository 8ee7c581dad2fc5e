package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer APPLICATION — the other half of q79's pair counting:
  * given a learned merge table (pair → rank), tokenize text and report
  * per-document token statistics. This is the canonical
  * tokens-per-document pass of a training-data pipeline (token budgets,
  * fertility monitoring, packing inputs all start here).
  *
  * Scale shape: the merge table is a MODEL ARTIFACT (tens of thousands
  * of rows for real tokenizers), so it broadcasts — the classic
  * small-model-large-data asymmetry. The corpus side is one
  * mapPartitions pass with the rank map built ONCE per partition from
  * the broadcast (not per row, not per word): per-row pure compute with
  * zero shuffle beyond the final bounded aggregate. The apply loop is
  * per-WORD with words capped at a few dozen chars — the quadratic
  * worst case of greedy BPE is bounded by word length, not document
  * length.
  *
  * Greedy-apply semantics (the public BPE algorithm of Sennrich et al.
  * 2016 and the GPT-2 reference tokenizer): start from characters;
  * repeatedly select the adjacent pair with the LOWEST rank and merge
  * all its non-overlapping occurrences left-to-right; stop at a fixed
  * point. Engine-specific by construction (a merge loop has no SQL
  * form), so results ride deterministic spec gates, not a DuckDB
  * oracle — the q23/q25/q40 treatment.
  */
object Tokenize {

  /** Apply `ranks` to one pre-split word. Deterministic: ties in rank
    * cannot occur (ranks are distinct by construction in [[bpeStats]];
    * duplicated pairs in a caller-built map keep the map's value).
    *
    * Initial units are Unicode CODE POINTS, not UTF-16 chars: a
    * surrogate-pair character (emoji, supplementary CJK) must enter as
    * one unit, both because half-surrogate "tokens" are not strings a
    * model can use and because [[deriveCharMerges]]'s Spark-side
    * `substr` indexes by code point — the two sides must agree on what
    * a character is. */
  def tokenizeWord(word: String,
                   ranks: Map[(String, String), Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var toks = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var at = 0
    while (at < word.length) {
      val cp = word.codePointAt(at)
      val n = Character.charCount(cp)
      toks(i) = word.substring(at, at + n)
      at += n
      i += 1
    }
    var done = toks.length < 2 || ranks.isEmpty
    while (!done) {
      // lowest-rank adjacent pair present in the word
      var best = Int.MaxValue
      var j = 0
      while (j < toks.length - 1) {
        val r = ranks.getOrElse((toks(j), toks(j + 1)), Int.MaxValue)
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge ALL non-overlapping occurrences left-to-right: "aaa"
        // under (a,a) becomes ["aa","a"], not ["a","aa"]
        val out = new scala.collection.mutable.ArrayBuffer[String](
          toks.length)
        var k = 0
        while (k < toks.length) {
          if (k < toks.length - 1 &&
            ranks.getOrElse((toks(k), toks(k + 1)), Int.MaxValue)
              == best) {
            out += toks(k) + toks(k + 1)
            k += 2
          } else {
            out += toks(k)
            k += 1
          }
        }
        toks = out.toArray
        done = toks.length < 2
      }
    }
    toks
  }

  /** Per-document token statistics under a merge table.
    *
    * `merges` is (a, b) pair columns ordered by a `rank` column
    * (lower = applied first) — collected and broadcast; `maxMerges`
    * guards the driver against a fact table mistakenly passed as the
    * model (fail loud, not OOM). Words are whitespace-split to mirror
    * [[TextAnalysis]]'s tokenization. Output per doc: word count,
    * token count, fertility (tokens/word) and mean token length.
    */
  def bpeStats(docs: DataFrame, idCol: String, textCol: String,
               merges: DataFrame, aCol: String, bCol: String,
               rankCol: String, maxMerges: Int = 1000000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val m = merges.select(col(aCol).cast("string"),
      col(bCol).cast("string"), col(rankCol).cast("int"))
      .limit(maxMerges + 1).collect()
    require(m.length <= maxMerges,
      s"merge table exceeds $maxMerges rows — not a model artifact")
    val ranks = m.map(r => ((r.getString(0), r.getString(1)),
      r.getInt(2))).toMap
    val bc = spark.sparkContext.broadcast(ranks)
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val rk = bc.value // resolved once per partition
        rows.map { case (id, text) =>
          val words =
            if (text == null) Array.empty[String]
            else text.split("\\s+").filter(_.nonEmpty)
          var nTok = 0L
          var tokLen = 0L
          words.foreach { w =>
            val t = tokenizeWord(w, rk)
            nTok += t.length
            var i = 0
            while (i < t.length) {
              // code points, matching tokenizeWord's unit of character
              tokLen += t(i).codePointCount(0, t(i).length)
              i += 1
            }
          }
          (id, words.length.toLong, nTok, tokLen)
        }
      }
      .toDF(idCol, "n_words", "n_tokens", "__tok_len")
      .select(col(idCol), $"n_words", $"n_tokens",
        when($"n_words" > 0,
          $"n_tokens".cast("double") / $"n_words").otherwise(0.0)
          .as("fertility"),
        when($"n_tokens" > 0,
          $"__tok_len".cast("double") / $"n_tokens").otherwise(0.0)
          .as("mean_token_len"))
  }

  /** Derive a deterministic character-pair merge table from the corpus
    * itself: the `nMerges` most frequent adjacent character pairs
    * inside words, ranked by (count desc, pair asc). One aggregation
    * pass — the single-iteration approximation of BPE training (the
    * full trainer is q79's count→merge→recount driver loop); what
    * matters for [[bpeStats]] is that the table is deterministic and
    * corpus-derived, so specs and runs reproduce it bit-for-bit. */
  def deriveCharMerges(docs: DataFrame, textCol: String,
                       nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(split(col(textCol), "\\s+")).as("__w"))
      .filter(length($"__w") >= 2)
      .select(explode(transform(sequence(lit(0), length($"__w") - 2),
        i => struct($"__w".substr(i + 1, lit(1)).as("a"),
          $"__w".substr(i + 2, lit(1)).as("b")))).as("p"))
      .groupBy($"p.a", $"p.b")
      .agg(count(lit(1)).as("__n"))
      .orderBy($"__n".desc, $"a", $"b")
      .limit(nMerges)
      .select($"a", $"b",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"__n".desc, $"a", $"b")) - 1).as("rank"))
  }
}
