package graft.functions

import scala.util.Random

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** Seeded-random equivalence: each native expression must agree exactly
  * with the composable-SQL formulation it replaced (the rewrite is a
  * performance change, not a semantics change).
  */
class NativeEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)
  private val vocab = Vector("spark", "row", "agg", "join", "the", "a",
    "batch", "window", "merge", "scan", "data", "col", "x1", "y2")

  private def randText(): String =
    Seq.fill(rnd.nextInt(30) + 1)(vocab(rnd.nextInt(vocab.size)))
      .mkString(" ")

  test("WordShingles == composable split/slice/array_join form") {
    val texts = Seq.fill(200)(randText()) :+ "solo" :+ "a b" :+ "  x  y  "
    val df = texts.toDF("t")
    for (n <- Seq(2, 3, 5)) {
      val toks = split(trim($"t"), "\\s+")
      val composable = array_distinct(transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      val diff = df.select(
          WordShingles($"t", n).as("nat"), composable.as("sql"))
        .filter(not($"nat" === $"sql")).count()
      assert(diff === 0, s"n=$n")
    }
  }

  test("production minhash (PolyHashArr -> AffineMinHash) == composable " +
      "poly-hash/affine-min form over word shingles") {
    val df = Seq.fill(100)(randText()).toDF("t")
      .select(WordShingles($"t", 2).as("sh"))
    val P = 1000000007L
    val k = 16
    // composable PolyStrHash: Horner base 257 over code points, mod P
    def polyStr(x: org.apache.spark.sql.Column) =
      aggregate(sequence(lit(1), length(x)), lit(0L),
        (h, i) => (h * 257 + ascii(x.substr(i, lit(1))).cast("long")) % P)
    val composable = transform(sequence(lit(0), lit(k - 1)), s =>
      array_min(transform($"sh", x =>
        ((lit(2L) * s + lit(1L)) * polyStr(x) + lit(7919L) * s) % P)))
    val diff = df.select(
        graft.operators.Dedup.minHashSignature($"sh", k).as("nat"),
        composable.as("sql"))
      .filter(not($"nat" === $"sql")).count()
    assert(diff === 0)
  }

  test("WinnowFingerprints == composable gram-hash/slice-minima form " +
      "(incl. multibyte: ascii = the full code point)") {
    val texts = Seq.fill(200)(randText()) ++ Seq(
      "", "short", "exactly11ch", // below/at the full-window boundary
      "déjà vu déjà vu déjà vu encore une fois",
      "日本語のテキストです、もう少し長くします",
      "aaaaaaaaaaaaaaaaaaaa") // constant grams → one fingerprint
    val df = texts.toDF("t")
    for ((g, w) <- Seq((8, 4), (5, 3))) {
      def gramHash(i: org.apache.spark.sql.Column) =
        (0 until g).foldLeft(lit(0L): org.apache.spark.sql.Column) {
          (h, o) => (h * 257 + ascii($"t".substr(i + lit(o), lit(1)))
            .cast("long")) % 1000000007L
        }
      val hs = transform(sequence(lit(1),
        greatest(length($"t") - (g - 1), lit(0))), i => gramHash(i))
      val m = size(hs) - (w - 1)
      def least2(a: org.apache.spark.sql.Column,
                 b: org.apache.spark.sql.Column) =
        zip_with(a, b, (x, y) => least(x, y))
      val wm = (2 to w).foldLeft(slice(hs, lit(1), m)) { (acc, r) =>
        least2(acc, slice(hs, lit(r), m))
      }
      val composable = when(m >= 1, array_distinct(wm))
        .otherwise(array().cast("array<bigint>"))
      val diff = df.select(
          array_sort(WinnowFingerprints($"t", g, w)).as("nat"),
          array_sort(composable).as("sql"))
        .filter(not($"nat" === $"sql")).count()
      assert(diff === 0, s"gram=$g window=$w")
    }
  }

  test("GramHashes == transform(gram-hash) form (repeats kept, position " +
      "order; the q313 occurrence-counting kernel)") {
    val texts = Seq.fill(200)(randText()) ++ Seq(
      "", "short!", "exactly8", "déjà vu déjà vu déjà vu encore",
      "aaaaaaaaaaaaaaaa") // constant grams → repeated hashes KEPT
    val df = texts.toDF("t")
    val g = 8
    def gramHash(i: org.apache.spark.sql.Column) =
      (0 until g).foldLeft(lit(0L): org.apache.spark.sql.Column) {
        (h, o) => (h * 257 + ascii($"t".substr(i + lit(o), lit(1)))
          .cast("long")) % 1000000007L
      }
    val ghSql = transform(
      sequence(lit(1), length($"t") - (g - 1)), i => gramHash(i))
    // NO array_sort: position order is part of the contract
    val diffG = df.filter(length($"t") >= g)
      .select(graft.functions.GramHashes($"t", g).as("nat"),
        ghSql.as("sql"))
      .filter(not($"nat" === $"sql")).count()
    assert(diffG === 0)
    val shortBad = df.filter(length($"t") < g)
      .select(graft.functions.GramHashes($"t", g).as("nat"))
      .filter(size($"nat") =!= 0).count()
    assert(shortBad === 0)
  }

  test("GramHashSet == array_distinct(transform(gram-hash)) form; " +
      "AffineMinHash == nested transform/array_min form") {
    val texts = Seq.fill(200)(randText()) ++ Seq(
      "", "short!", "exactly8", "déjà vu déjà vu déjà vu encore",
      "aaaaaaaaaaaaaaaa")
    val df = texts.toDF("t")
    val P = 1000000007L
    val g = 8
    def gramHash(i: org.apache.spark.sql.Column) =
      (0 until g).foldLeft(lit(0L): org.apache.spark.sql.Column) {
        (h, o) => (h * 257 + ascii($"t".substr(i + lit(o), lit(1)))
          .cast("long")) % P
      }
    // the composable reference is only well-formed at length >= g
    // (sequence(1, 0) is DESCENDING in Spark — q327 guards with the
    // same length filter); below g the native form must return empty
    val ghSql = array_distinct(transform(
      sequence(lit(1), length($"t") - (g - 1)), i => gramHash(i)))
    val diffG = df.filter(length($"t") >= g)
      .select(GramHashSet($"t", g).as("nat"), ghSql.as("sql"))
      .filter(not($"nat" === $"sql")).count()
    assert(diffG === 0)
    val shortBad = df.filter(length($"t") < g)
      .select(GramHashSet($"t", g).as("nat"))
      .filter(size($"nat") =!= 0).count()
    assert(shortBad === 0)
    // signature parity on non-empty gram sets (array_min of an empty
    // array is NULL in SQL; q327 filters empties before signing)
    val withG = df.select(GramHashSet($"t", g).as("gh"))
      .filter(size($"gh") > 0)
    val k = 32
    val sigSql = transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform($"gh", x =>
        ((lit(2L) * i + lit(1L)) * x + lit(7919L) * i) % P)))
    val diffS = withG.select(AffineMinHash($"gh", k).as("nat"),
        sigSql.as("sql"))
      .filter(not($"nat" === $"sql")).count()
    assert(diffS === 0)
    // simhash parity: per-bit vote = sign of Σ ±1 by parity of the
    // affine image; fingerprint folds positive accumulators into 2^s.
    // The aggregate runs over filter(gh, NOT NULL) — the kernel SKIPS
    // null elements (a null gram is no vote, not a -1 vote), and the
    // twin must encode the same rule to be the pinned semantics
    val simSql = aggregate(
      transform(sequence(lit(0), lit(k - 1)), s =>
        when(aggregate(filter($"gh", x => x.isNotNull), lit(0L),
            (acc, x) =>
            acc + when((((lit(2L) * s + lit(1L)) * x + lit(7919L) * s)
              % P) % 2 === 1, lit(1L)).otherwise(lit(-1L))) > 0,
          pow(lit(2.0), s).cast("long"))
          .otherwise(lit(0L))),
      lit(0L), (acc, b) => acc + b)
    val diffH = withG.select(AffineSimHash($"gh", k).as("nat"),
        simSql.as("sql"))
      .filter(not($"nat" <=> $"sql")).count()
    assert(diffH === 0)
    // null elements: kernel and twin agree on arrays WITH nulls (the
    // null contributes nothing — dropping it leaves the other votes)
    val withNulls = df.select(array(lit(5L), lit(null).cast("long"),
        lit(123456789L)).as("gh")).limit(5)
    val diffN = withNulls.select(AffineSimHash($"gh", k).as("nat"),
        simSql.as("sql"))
      .filter(not($"nat" <=> $"sql")).count()
    assert(diffN === 0)
    // empty input -> 0L fingerprint
    val emptyFp = df.filter(length($"t") < g)
      .select(AffineSimHash(GramHashSet($"t", g), k).as("nat"))
      .filter($"nat" =!= 0L).count()
    assert(emptyFp === 0)
  }

  test("CharShingleCount == size(array_distinct(transform(substr))) form") {
    val texts = Seq.fill(200)(randText()) ++
      Seq("", "ab", "aaaa", "déjà vu déjà", "日本語のテキストです")
    val df = texts.toDF("t")
    for (n <- Seq(2, 5)) {
      val composable = size(array_distinct(transform(
        sequence(lit(0), greatest(length($"t") - n, lit(0))),
        i => $"t".substr(i + 1, lit(n)))))
      val diff = df.select(
          TextHashes.charShingleCount($"t", n).as("nat"),
          composable.as("sql"))
        .filter($"nat" =!= $"sql").count()
      assert(diff === 0, s"n=$n")
    }
  }

  test("LshBandKeys == the composable dual-base transform/fold form") {
    val sigs = Seq.fill(100)(Array.fill(32)(
      math.abs(rnd.nextLong()) % 1000000007L)).map(Tuple1(_))
    val df = sigs.toDF("sig")
    for ((bands, rpb) <- Seq((8, 4), (4, 8), (16, 2))) {
      def fold(b: Column, base: Long): Column =
        (0 until rpb).foldLeft(lit(0L): Column) { (acc, r) =>
          (acc * base +
            element_at($"sig", (b * rpb + r + 1).cast("int"))) %
            1000000007L
        }
      val composable = transform(sequence(lit(0), lit(bands - 1)),
        b => fold(b, 1000003L) * 1073741824L + fold(b, 1000033L))
      val diff = df.select(
          LshBandKeys($"sig", bands, rpb).as("nat"),
          composable.as("sql"))
        .filter(not($"nat" === $"sql")).count()
      assert(diff === 0, s"bands=$bands rpb=$rpb")
    }
  }

  test("LshBandKeys input validation: wrong element type fails " +
      "analysis; short signature fails loudly, not as garbage") {
    // array<int> would read raw UnsafeArrayData bytes under getLong —
    // must be rejected at ANALYSIS time (r12 advice item)
    val ints = Seq(Tuple1(Array(1, 2, 3, 4))).toDF("sig")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(LshBandKeys($"sig", 2, 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<bigint>"))
    // a too-short array<long> must throw the explicit length error
    val short = Seq(Tuple1(Array(1L, 2L, 3L))).toDF("sig")
    val t = intercept[Throwable] {
      short.select(LshBandKeys($"sig", 2, 2)).collect()
    }
    def chain(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: chain(x.getCause)
    assert(chain(t).exists(c =>
      Option(c.getMessage).exists(_.contains("lsh_band_keys"))))
  }

  test("TextQualityStats == the five composable q28 forms it fused") {
    import graft.operators.TextAnalysis
    // seeded-random docs plus the shapes that exercise every branch:
    // empty, space-only, mixed-\s separators with leading/trailing
    // runs (Java split keeps those empty fields), punctuation runs,
    // digits/letters/other BPE transitions, unicode, >4-char and
    // uppercase stopword near-misses
    val texts = Seq.fill(300)(randText()) ++ Seq(
      "", " ", "   ", "\t", " \tthe and\t ", "a\tb\ncd\fe\rf",
      "the a an and of to in is it that", "The THE thee that. that",
      "ab1c2,3.4!?(x)-y'z\";:", "déjà vu 42 naïve—dash", "和 the 或",
      "  leading", "trailing  ", "a  b   c", "one.two,three",
      "12 345 6a7", "----", "...", "'''", "x", "that")
    val df = texts.toDF("t")
    val st = TextStats.textQualityStats($"t").as("st")
    // the ORIGINAL composable formulations, stated inline — since
    // round 12 TextAnalysis itself derives these metrics from the
    // kernel, so referencing it here would compare kernel to kernel
    val toks = split(trim($"t"), "\\s+")
    val wsC = when(length(trim($"t")) === 0, 0)
      .otherwise(size(toks))
    val bpeC = size(regexp_extract_all($"t",
      lit(" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"), lit(0)))
    val stopC = when(length(trim($"t")) === 0, 0.0)
      .otherwise(size(filter(toks,
          t => t.isin(TextAnalysis.StopWords: _*))).cast("double") /
        size(toks).cast("double"))
    val mwlC = when(length(trim($"t")) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / size(toks).cast("double"))
    val prC = when(length($"t") === 0, 0.0).otherwise(
      (length($"t") - length(regexp_replace($"t", "[.,!?;:'\"()\\-]",
        ""))).cast("double") / length($"t").cast("double"))
    val diff = df.select($"t", st,
        wsC.as("ws"),
        bpeC.as("bpe"),
        stopC.as("stop"),
        mwlC.as("mwl"),
        prC.as("pr"))
      .filter(
        not($"st.n_ws" === $"ws") ||
        not($"st.n_bpe" === $"bpe") ||
        not(when($"st.n_ws" === 0, 0.0)
          .otherwise($"st.n_stop".cast("double") /
            $"st.n_ws".cast("double")) <=> $"stop") ||
        not(when($"st.n_ws" === 0, 0.0)
          .otherwise($"st.sum_wlen".cast("double") /
            $"st.n_ws".cast("double")) <=> $"mwl") ||
        not(when(length($"t") === 0, 0.0)
          .otherwise($"st.n_punct".cast("double") /
            length($"t").cast("double")) <=> $"pr"))
      .collect()
    assert(diff.isEmpty,
      diff.take(3).map(_.toString).mkString("; "))
  }

  test("CharShingleCount.tableCap: Long arithmetic at the overflow " +
      "boundary; pathological window counts fail fast, never hang") {
    // small counts: next power of two >= 2*wins, floor 16 (load <= 0.5)
    assert(CharShingleCount.tableCap(1) === 16)
    assert(CharShingleCount.tableCap(100) === 256)
    assert(CharShingleCount.tableCap(1 << 20) === (1 << 21))
    // exact bound: wins*2 == MaxTableCap is the largest admissible
    val maxWins = CharShingleCount.MaxTableCap / 2
    assert(CharShingleCount.tableCap(maxWins) ===
      CharShingleCount.MaxTableCap)
    // past the bound — including the shapes where `wins * 2` used to
    // overflow Int (wins >= 2^30 → negative, doubling loop spun or
    // exited with an undersized table) — the kernel must THROW with a
    // clear message, not hang an executor on a ~1G-char document
    for (wins <- Seq(maxWins + 1, 1 << 30, Int.MaxValue))
      assertThrows[IllegalArgumentException](
        CharShingleCount.tableCap(wins))
  }

  test("VectorMean == posexplode/avg-per-position form") {
    val vecs = Seq.tabulate(50)(i =>
      (i % 3).toLong -> Array.fill(8)(rnd.nextFloat()))
    val df = vecs.toDF("k", "v")
    val nat = df.groupBy($"k").agg(VectorMean($"v").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val model = vecs.groupBy(_._1).map { case (k, xs) =>
      k -> (0 until 8).map(p =>
        (xs.map(_._2(p).toDouble).sum / xs.size).toFloat)
    }
    for ((k, m) <- model; p <- 0 until 8)
      assert(math.abs(nat(k)(p) - m(p)) < 1e-6f, s"k=$k p=$p")
  }

  test("VectorMean: ragged vectors average per position over contributors") {
    val df = Seq(
      (1L, Array(1.0f, 1.0f)),
      (1L, Array(3.0f, 3.0f, 3.0f)),
      (1L, Array.empty[Float]))
      .toDF("k", "v")
      // partition per row: the result must not depend on merge order
      .repartition(3)
    val r = df.groupBy($"k").agg(VectorMean($"v").as("m"))
      .collect()(0).getSeq[Float](1)
    assert(r.toSeq === Seq(2.0f, 2.0f, 3.0f))
  }

  test("CosineSim == zip_with/aggregate form (bit-identical)") {
    val vecs = Seq.fill(100)((
      Array.fill(16)(rnd.nextFloat() * 2 - 1),
      Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("a", "b")
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val composable = dot($"a", $"b") /
      (sqrt(dot($"a", $"a")) * sqrt(dot($"b", $"b")))
    val diff = df.select(CosineSim($"a", $"b").as("nat"),
        composable.as("sql"))
      .filter($"nat" =!= $"sql").count() // exact double equality
    assert(diff === 0)
  }

  test("CosineSim: ragged arrays yield NULL (as the composable form does)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val r = df.select(CosineSim($"a", $"b").as("c")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("Similarity.cosine handles double arrays too") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val r = df.select(Similarity.cosine($"a", $"b")).collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("SqDistLong == aggregate(zip_with((x-y)^2)) incl. ragged/null-" +
      "element poisoning (values in the non-overflowing range the " +
      "callers' millis-quantized embeddings occupy)") {
    def arr(n: Int): Array[java.lang.Long] =
      Array.fill(n)(java.lang.Long.valueOf(
        (rnd.nextInt(400000000) - 200000000).toLong))
    val rows: Seq[(Array[java.lang.Long], Array[java.lang.Long])] =
      Seq.fill(300)((arr(8), arr(8))) ++
        Seq((arr(4), arr(7)), // ragged -> NULL
          (Array[java.lang.Long](1L, null, 3L), arr(3)), // null el -> NULL
          (Array.empty[java.lang.Long], Array.empty[java.lang.Long]))
    val df = rows.toDF("a", "b")
    val composable = aggregate(zip_with($"a", $"b",
      (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
    val diff = df.select(SqDistLong($"a", $"b").as("nat"),
        composable.as("sql"))
      .filter(not($"nat" <=> $"sql")).count()
    assert(diff === 0)
  }

  test("SortedLongIntersect == array_intersect on sorted distinct long " +
      "arrays (the Graph.triangles contract, incl. empty/disjoint)") {
    def sortedDistinct(): Array[Long] =
      Array.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
    val rows = Seq.fill(500)((sortedDistinct(), sortedDistinct())) ++
      Seq((Array.empty[Long], sortedDistinct()),
        (sortedDistinct(), Array.empty[Long]),
        (Array(1L, 2L, 3L), Array(4L, 5L)), // disjoint
        (Array(1L, 2L, 3L), Array(1L, 2L, 3L))) // identical
    val df = rows.toDF("a", "b")
    val diff = df.select(SortedLongIntersect($"a", $"b").as("nat"),
        array_intersect($"a", $"b").as("sql"))
      .filter(not($"nat" === $"sql")).count()
    assert(diff === 0)
  }
}
