package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  // hand-computed greedy-BPE fixtures: rank order decides merge order,
  // all non-overlapping occurrences merge left-to-right per step
  test("tokenizeWord follows rank order and left-to-right merging") {
    val ranks = Map(("a", "b") -> 0, ("ab", "c") -> 1, ("c", "d") -> 2)
    // step1 merges both "ab"s; step2 merges "ab"+"c" → "abc"
    assert(Tokenize.tokenizeWord("abcab", ranks).toSeq ===
      Seq("abc", "ab"))
    // (c,d) never fires: by the time rank2 is reachable, "c" is gone
    assert(Tokenize.tokenizeWord("abcd", ranks).toSeq ===
      Seq("abc", "d"))
    // rank 0 beats rank 1 even when both are present
    assert(Tokenize.tokenizeWord("cab", ranks).toSeq ===
      Seq("c", "ab"))
  }

  test("overlapping occurrences merge left-to-right, not nested") {
    val ranks = Map(("a", "a") -> 0)
    assert(Tokenize.tokenizeWord("aaa", ranks).toSeq === Seq("aa", "a"))
    // 4 a's: one step merges both non-overlapping pairs; (aa,aa) is
    // not a rule, so that's the fixed point
    assert(Tokenize.tokenizeWord("aaaa", ranks).toSeq === Seq("aa", "aa"))
  }

  test("tokenization invariants over random words and merge tables") {
    val rng = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val word = (1 to (1 + rng.nextInt(12)))
        .map(_ => ('a' + rng.nextInt(3)).toChar).mkString
      val pairs = (1 to rng.nextInt(6)).map(_ =>
        (('a' + rng.nextInt(3)).toChar.toString,
          ('a' + rng.nextInt(3)).toChar.toString)).distinct
      val ranks = pairs.zipWithIndex.toMap
      val toks = Tokenize.tokenizeWord(word, ranks)
      // concatenation preserves the word exactly
      assert(toks.mkString === word, s"word=$word ranks=$ranks")
      // fixed point: no adjacent pair in the result is mergeable
      toks.toSeq.sliding(2).foreach {
        case Seq(x, y) =>
          assert(!ranks.contains((x, y)),
            s"non-fixed-point: ($x,$y) in ${toks.toSeq} for $word")
        case _ =>
      }
      // empty table → characters
      assert(Tokenize.tokenizeWord(word, Map.empty).toSeq ===
        word.map(_.toString))
    }
  }

  test("surrogate-pair characters stay whole code points") {
    // U+1F600 is a surrogate pair in UTF-16: with no merges it must
    // come back as ONE token, not two broken half-surrogates — and
    // merges over it must work like any other character
    val emoji = new String(Character.toChars(0x1F600))
    val word = s"a${emoji}b"
    assert(Tokenize.tokenizeWord(word, Map.empty).toSeq ===
      Seq("a", emoji, "b"))
    val merged = Tokenize.tokenizeWord(word, Map(("a", emoji) -> 0))
    assert(merged.toSeq === Seq(s"a$emoji", "b"))
    assert(merged.mkString === word)
  }

  test("bpeStats computes counts, fertility and token length per doc") {
    val docs = Seq((1L, "abcab abcd"), (2L, ""), (3L, "xyz"))
      .toDF("doc_id", "text")
    val merges = Seq(("a", "b", 0), ("ab", "c", 1)).toDF("a", "b", "rank")
    val r = Tokenize.bpeStats(docs, "doc_id", "text", merges,
      "a", "b", "rank").orderBy($"doc_id").collect()
    // doc1: "abcab"→[abc,ab]=2 toks, "abcd"→[abc,d]=2 toks; 4 toks,
    // 2 words, fertility 2.0, total len 3+2+3+1=9 → mean 2.25
    assert(r(0).getLong(1) === 2L && r(0).getLong(2) === 4L)
    assert(r(0).getDouble(3) === 2.0 && r(0).getDouble(4) === 2.25)
    // empty text: all zeros, no NaN
    assert(r(1).getLong(1) === 0L && r(1).getLong(2) === 0L)
    assert(r(1).getDouble(3) === 0.0 && r(1).getDouble(4) === 0.0)
    // no applicable merge: chars
    assert(r(2).getLong(2) === 3L && r(2).getDouble(3) === 3.0)
  }

  test("bpeStats rejects an oversized merge table loudly") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val merges = spark.range(50)
      .select(lit("a").as("a"), lit("b").as("b"), $"id".cast("int")
        .as("rank"))
    intercept[IllegalArgumentException] {
      Tokenize.bpeStats(docs, "doc_id", "text", merges, "a", "b",
        "rank", maxMerges = 10)
    }
  }

  test("deriveCharMerges is deterministic and respects frequency order") {
    val docs = Seq("aab aab", "aab", "xy").toDF("text")
    val m = Tokenize.deriveCharMerges(docs, "text", 3).collect()
    // pairs: (a,a)×3, (a,b)×3, (x,y)×1 → ties break by pair asc
    assert(m.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("a", "a"), ("a", "b"), ("x", "y")))
    assert(m.map(_.getInt(2)).toSeq === Seq(0, 1, 2))
  }
}
