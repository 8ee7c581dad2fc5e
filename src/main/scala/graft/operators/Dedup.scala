package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora: exact (hash group-by),
  * MinHash+LSH near-dup candidates, and exact n-gram Jaccard verification.
  *
  * Scale design: everything is a hash-shuffle on a short key (digest or
  * band hash) — never an all-pairs comparison. The LSH band join is the
  * only quadratic step and it is quadratic only within a bucket, which the
  * banding parameters keep tiny. This is the standard shape used at
  * 100 TB (e.g. the C4/RefinedWeb dedup recipes).
  */
object Dedup {

  /** Exact duplicate groups by content digest. Emits one row per distinct
    * digest with the surviving (minimum) id and the duplicate count. The
    * map-side partial agg means the full text never shuffles — only its
    * 128-bit digest. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Character n-gram shingle set (distinct). */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(length(text) - n, lit(0))),
      i => text.substr(i + 1, lit(n))))

  /** Word n-gram shingle set (distinct), from whitespace tokens. Native
    * expression ([[graft.functions.WordShingles]]) — the composable form
    * (`array_distinct(transform(sequence(...), i => array_join(slice(
    * split(...)...))))`) has identical semantics but re-evaluates the
    * split in every branch and runs interpreted per element. */
  def wordShingles(text: Column, n: Int): Column =
    graft.functions.WordShingles(text, n)

  /** MinHash signature: k independent min-hashes over the shingle set,
    * under the PORTABLE polynomial family — shingle strings hash once
    * through [[graft.functions.PolyHashArr]] (Horner base 257 mod
    * 1e9+7 per string, one codegen pass) and the k positions are
    * [[graft.functions.AffineMinHash]]'s affine images
    * h_i(g) = ((2i+1)·g + 7919·i) mod 1e9+7. Promoted from the q327
    * twin to THE production family in round 11: measured head-to-head
    * against the previous xxhash64-seed family on the identical
    * full-text q23 pipeline at sf0.1, portable/xxhash64 = 1.02× — the
    * engine-specific family bought nothing, and the closed-form
    * arithmetic makes every signature (hence LSH candidacy itself)
    * replayable in any SQL engine, so the near-dup pipeline is
    * hash-oracle-able end to end. */
  def minHashSignature(shingles: Column, k: Int): Column =
    graft.functions.AffineMinHash(graft.functions.PolyHashArr(shingles), k)

  /** LSH band keys: split the k-length signature into `bands` bands of
    * `rowsPerBand` and reduce each band to one key (the key of band b
    * at array index b — consumers posexplode into (band, bkey)). Two
    * docs sharing any band key are candidates. The key is the same
    * portable fold family the signatures use, WIDENED to two
    * independent mod-P folds (bases 1000003 and 1000033, both mod
    * 1e9+7) packed into one 60-bit value: bkey = fold1·2^30 + fold2
    * (P < 2^30, so the packing is injective and overflow-free in any
    * BIGINT engine). Round-12 fix of a round-11 advice item: a
    * single ~2^30-key fold makes birthday collisions routine once a
    * band has ~33k populated buckets, and a collision doesn't just
    * ADD spurious candidates (harmless — exact verification removes
    * them), it can also inflate a bucket past
    * [[minHashCandidates]]'s `maxBucket` skew cap, and a PRUNED
    * bucket drops its genuine pairs — a silent recall term at corpus
    * scale. Two independent folds put collisions at ~P^-2 ≈ 1e-18
    * per pair: gone in practice, still a closed form both engines
    * replay exactly. Computed by the NATIVE
    * [[graft.functions.LshBandKeys]] kernel — the composable
    * transform/fold form is a higher-order function (interpreted),
    * and the dual fold doubled its tree: q23 solo 3.37 s composable
    * vs the kernel's single codegen pass per signature. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    graft.functions.LshBandKeys(sig, bands, rowsPerBand)

  /** Pick (bands, rowsPerBand) for a target Jaccard threshold: an LSH
    * banding (b, r) has its S-curve inflection at t ≈ (1/b)^(1/r) —
    * pairs above t are likely candidates, below likely not. Given the
    * signature length k, choose the divisor split whose inflection sits
    * closest to the requested threshold (low thresholds → many short
    * bands for recall; high thresholds → few long bands for precision).
    * This is how the banding parameters should scale with the corpus's
    * duplication profile instead of being hand-picked per job. */
  def lshParams(k: Int, threshold: Double): (Int, Int) = {
    require(k > 0 && threshold > 0 && threshold < 1)
    val bands = (1 to k).filter(k % _ == 0).minBy { b =>
      val r = k / b
      math.abs(math.pow(1.0 / b, 1.0 / r) - threshold)
    }
    (bands, k / bands)
  }

  /** [[minHashCandidates]] with banding auto-tuned for a target Jaccard
    * threshold via [[lshParams]]. */
  def minHashCandidatesAt(df: DataFrame, textCol: String, idCol: String,
                          threshold: Double, shingleWords: Int = 3,
                          k: Int = 32, maxBucket: Int = 64): DataFrame = {
    val (bands, _) = lshParams(k, threshold)
    minHashCandidates(df, textCol, idCol, shingleWords, k, bands, maxBucket)
  }

  /** Candidate near-dup pairs via MinHash LSH. Returns (id_a, id_b,
    * est_jaccard) with id_a < id_b, est_jaccard = fraction of agreeing
    * signature positions. One shuffle on the band key; bucket joins are
    * local. */
  def minHashCandidates(df: DataFrame, textCol: String, idCol: String,
                        shingleWords: Int = 3, k: Int = 32,
                        bands: Int = 8, maxBucket: Int = 64): DataFrame = {
    require(k % bands == 0,
      s"signature length k=$k must divide evenly into bands=$bands " +
        "(a remainder would silently drop signature positions from LSH)")
    val rowsPerBand = k / bands
    val withSig = df.select(col(idCol).as("id"),
        wordShingles(col(textCol), shingleWords).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minHashSignature(col("sh"), k))
    // Signatures are cheap to recompute but expensive to shuffle with
    // band multiplicity; candidate generation works on (band, bkey, id)
    // triples only, and signatures are joined back ONCE per unique pair.
    val banded = withSig.select(col("id"),
        posexplode(lshBandKeys(col("sig"), bands, rowsPerBand)))
      .select(col("id"), col("pos").as("band"), col("col").as("bkey"))
    // Skew guard: a band key shared by a huge fraction of the corpus (a
    // stop-shingle) would make the bucket join quadratic in that bucket.
    // Cap bucket size — oversized buckets carry no dedup signal anyway.
    // Window count (not groupBy + join-back) so the scan subtree isn't
    // duplicated into an extra plan branch.
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bkey"))
    val pruned = banded
      .withColumn("__bsz", count(lit(1)).over(wBucket))
      .filter(col("__bsz") > 1 && col("__bsz") <= maxBucket)
      .drop("__bsz")
    val pairs = pruned.select(col("band"), col("bkey"),
        col("id").as("id_a"))
      .join(pruned.select(col("band"), col("bkey"), col("id").as("id_b")),
        Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val sigs = withSig.select(col("id"), col("sig"))
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")),
        Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), p => p)).cast("double") / k).as("est_jaccard"))
  }

  /** Deterministic near-dup candidate pairs by RARE-shingle co-occurrence:
    * pairs sharing at least one shingle with document frequency ≤ `maxDf`.
    * Unlike MinHash banding this is exact (no hash family), so the output
    * is reproducible in plain SQL — the oracle-able candidate generator.
    *
    * Recall contract: COMPLETE only for pairs whose shared shingles
    * include one with df ≤ maxDf — i.e. duplicate clusters of at most
    * ~maxDf members. A boilerplate document copied more than maxDf times
    * shares ONLY high-df shingles and produces no candidates; collapse
    * exact duplicates first ([[exactGroups]], keeping one representative
    * per digest) so surviving near-dup clusters are small, or raise
    * maxDf at the cost of a heavier self-join. Frequent (stop) shingles
    * carry no pair signal either way — capping them is what keeps the
    * self-join linear.
    */
  def rareShinglePairs(df: DataFrame, textCol: String, idCol: String,
                       shingleWords: Int = 3, maxDf: Int = 10): DataFrame = {
    // shingles reduce to 64-bit hashes BEFORE any shuffle: the df count,
    // the rarity join and the pair self-join all move 8-byte keys
    // instead of shingle strings. A collision in the join keys can only
    // ADD a candidate pair (the exact-Jaccard verification downstream is
    // the gate). A collision in the df count is the one way a pair can
    // DROP: two distinct shingles merging inflates the combined df, which
    // can push a genuinely rare shingle above maxDf — probability
    // ~2^-64 per shingle pair, accepted; compute df on exact shingle
    // strings (hashing only the join keys) if even that is unacceptable.
    val sh = df.select(col(idCol).as("__rid"),
        explode(wordShingles(col(textCol), shingleWords)).as("__rg0"))
      .select(col("__rid"), xxhash64(col("__rg0")).as("__rg"))
    val rare = sh.groupBy(col("__rg"))
      .agg(count(lit(1)).as("__rdf")).filter(col("__rdf") <= maxDf)
      .select(col("__rg"))
    val r = sh.join(rare, Seq("__rg"))
    r.select(col("__rg"), col("__rid").as("id_a"))
      .join(r.select(col("__rg"), col("__rid").as("id_b")), Seq("__rg"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Duplicate-CLUSTER resolution: connected components over a near-dup
    * pair graph — the final step of corpus dedup (pairs alone don't say
    * which docs to drop; the canonical survivor is per component). Returns
    * (node, cluster_id) with cluster_id = the component's minimum id.
    *
    * Iterative min-label propagation WITH POINTER DOUBLING: each round a
    * node takes the min of its own label, its neighbors' labels, and its
    * label's label (one extra self-join — every label is a node id in
    * the same component, so chasing it stays within the component and
    * labels only ever decrease toward the true minimum). Neighbor
    * propagation alone needs diameter rounds — an adversarial
    * 10,000-link chain is 10,000 shuffles; the label-of-label hop
    * doubles the reach each round, so convergence is O(log diameter)
    * (the [[dupClustersStats]] spec pins this on a long chain). All
    * state is distributed; each round's labels are persisted and the
    * loop's only driver traffic is the changed-row count.
    */
  def dupClusters(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    dupClustersStats(pairs, aCol, bCol)._1

  /** [[dupClusters]] plus the number of rounds the loop ran (exposed for
    * convergence tests and job-level metrics). */
  def dupClustersStats(pairs: DataFrame, aCol: String, bCol: String)
      : (DataFrame, Int) = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // pairs is typically an EXPENSIVE pipeline (candidate generation +
    // exact verification); the symmetric-edge union references it twice,
    // so cache it for the one materialization and drop it at the end
    val p = pairs.persist(MEMORY_AND_DISK)
    val edges = p.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(p.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(MEMORY_AND_DISK)
    // seed labels with the CLOSED-NEIGHBORHOOD minimum (same one
    // aggregation the plain distinct would cost): for the dominant
    // shallow-graph case — isolated near-dup pairs and small stars —
    // every node starts at its component minimum, so the loop converges
    // on its first no-change round instead of spending a round
    // propagating. Deeper graphs lose nothing: the seed is exactly the
    // state after a round-0 neighbor-min pass.
    var labels = edges.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("__mn"))
      .select(col("node"), least(col("node"), col("__mn")).as("label"))
      .persist(MEMORY_AND_DISK)
    // the handle persist() was called on (labels itself may be a
    // projection over it, which unpersist would not match)
    var cached = labels
    var converged = false
    var rounds = 0
    while (!converged) {
      rounds += 1
      val neighborMin = edges
        .join(labels.select(col("node").as("src"),
          col("label").as("__nl")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("__nl")).as("__nmin"))
      // pointer doubling: look up the current label's OWN label (left
      // join on labels keyed by node=label) and take the min of all
      // three. (A second chase per round — label of label of label —
      // was measured and REJECTED: on the deepest-looped caller (q71,
      // 10 rounds) it reduced zero rounds while adding a join to every
      // round, a net ~10% regression; on chain graphs it did cut
      // rounds 8→6, but no production caller is chain-bound.)
      val grandparent = labels
        .select(col("node").as("__gnode"), col("label").as("__gl"))
      // the update join already sees old and new label side by side, so
      // the convergence flag rides along — no separate old-vs-new compare
      // join per round
      // localCheckpoint, not persist: the round references `labels` three
      // times, so bare caching grows the logical plan 3^rounds — plan
      // stringification alone OOMs past ~9 rounds. The eager checkpoint
      // materializes the round AND truncates lineage to the stored
      // blocks. (Trade: an executor loss mid-algorithm fails the job
      // instead of recomputing — the standard iterative-graph trade; a
      // cluster deployment would set a reliable checkpoint dir.)
      val next = labels
        .join(neighborMin, Seq("node"), "left_outer")
        .join(grandparent, col("label") === col("__gnode"), "left_outer")
        .select(col("node"),
          least(col("label"),
            least(coalesce(col("__nmin"), col("label")),
              coalesce(col("__gl"), col("label")))).as("label"),
          (least(coalesce(col("__nmin"), col("label")),
            coalesce(col("__gl"), col("label"))) < col("label"))
            .as("__chg"))
        .localCheckpoint(true)
      val changed = next.filter(col("__chg")).count()
      // round 1's seed labels live in the CacheManager (unpersist);
      // later rounds are checkpointed RDD blocks, which unpersist does
      // NOT reach — free them explicitly or every round leaks a full
      // label-table copy until driver GC
      cached.unpersist()
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(cached)
      cached = next
      labels = next.select(col("node"), col("label"))
      converged = changed == 0
    }
    // the result is already materialized (the convergence count ran over
    // it); pairs/edges are only lineage now — recomputable if the result
    // is ever evicted — so release them. The returned DataFrame's
    // checkpointed blocks are freed by the ContextCleaner once the
    // caller drops the reference (or eagerly via
    // Bridge.unpersistCheckpoint).
    edges.unpersist()
    p.unpersist()
    (labels.select(col("node"), col("label").as("cluster_id")), rounds)
  }

  /** SURVIVORSHIP after clustering: per cluster, keep the member with
    * the largest `weightCol` (quality-based canonicalization — e.g.
    * token count; ties break to the LOWEST id for determinism) and
    * report what deduplication keeps vs drops. One hash aggregate with
    * map-side combine — no window, no per-cluster sort; the max_by
    * ordering key `(weight, -id)` is total because ids are unique.
    * Output: (clusterCol, survivor_id, n_members, weight_kept,
    * weight_dropped). */
  def survivorship(members: DataFrame, clusterCol: String, idCol: String,
                   weightCol: String): DataFrame =
    members.groupBy(col(clusterCol)).agg(
      max_by(col(idCol),
        struct(col(weightCol), (-col(idCol)).as("__nid")))
        .as("survivor_id"),
      count(lit(1)).as("n_members"),
      max(col(weightCol)).as("weight_kept"),
      (sum(col(weightCol)) - max(col(weightCol))).as("weight_dropped"))

  /** [[exactJaccard]] by COUNTS instead of array joins: intersection
    * sizes come from a narrow (pair × shared-shingle-hash) join-aggregate
    * and union sizes from per-doc set sizes, so no shingle array ever
    * shuffles onto the pair set. Shingles compare by xxhash64 (a
    * collision can only nudge one intersection count by 1 in ~2^-64 of
    * pairs). Output schema and values match [[exactJaccard]].
    *
    * When to prefer which (measured): for NEAR-DUP candidates the pairs
    * share most of their shingles, so this join emits nearly as many
    * narrow rows as the arrays carry plus an extra shuffle — the array
    * form wins (q52: 4.9s vs 10.1s at sf0.1). Counts win when the pair
    * set is mostly LOW-overlap (e.g. scoring an unfiltered blocking
    * output where typical intersections are a few shingles) or when
    * documents are so large that per-pair array attach can't fit the
    * shuffle comfortably. */
  def exactJaccardCounts(df: DataFrame, textCol: String, idCol: String,
                         pairs: DataFrame, shingleWords: Int = 3)
      : DataFrame = {
    val sh = df.select(col(idCol).as("__jid"),
        explode(wordShingles(col(textCol), shingleWords)).as("__jg0"))
      .select(col("__jid"), xxhash64(col("__jg0")).as("__jg"))
    val sizes = sh.groupBy(col("__jid")).agg(count(lit(1)).as("__jn"))
    val ni = pairs
      .join(sh.select(col("__jid").as("id_a"), col("__jg")), Seq("id_a"))
      .join(sh.select(col("__jid").as("id_b"), col("__jg")),
        Seq("id_b", "__jg"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("__ni"))
    pairs
      .join(ni, Seq("id_a", "id_b"), "left_outer")
      .join(sizes.select(col("__jid").as("id_a"), col("__jn").as("__na")),
        Seq("id_a"))
      .join(sizes.select(col("__jid").as("id_b"), col("__jn").as("__nb")),
        Seq("id_b"))
      .withColumn("jaccard", graft.Fns.roundU(
        coalesce(col("__ni"), lit(0L)).cast("double") /
          (col("__na") + col("__nb") - coalesce(col("__ni"), lit(0L)))
            .cast("double"), 4))
      .drop("__ni", "__na", "__nb")
  }

  /** Length-filter pruning (the classic size bound from the set-
    * similarity-join literature): Jaccard(A,B) ≤ min(|A|,|B|) /
    * max(|A|,|B|), so a pair whose shingle-set sizes are too far apart
    * can never reach `threshold` — drop it BEFORE attaching the arrays.
    * Provably lossless for a downstream `jaccard ≥ threshold` filter:
    * only pairs with an upper bound strictly below `threshold` are
    * removed. Pass the PRE-ROUNDING threshold margin (e.g. 0.4999 for a
    * rounded-to-4-digits ≥ 0.5 filter) so boundary pairs survive to the
    * exact computation. Sizes join is two narrow broadcasts/hash joins —
    * tiny next to the array shuffle it saves. */
  def sizeCompatiblePairs(df: DataFrame, textCol: String, idCol: String,
                          pairs: DataFrame, shingleWords: Int,
                          threshold: Double): DataFrame = {
    val sizes = df.select(col(idCol).as("__sid"),
      size(wordShingles(col(textCol), shingleWords)).as("__sn"))
    pairs
      .join(sizes.select(col("__sid").as("id_a"), col("__sn").as("__sna")),
        Seq("id_a"))
      .join(sizes.select(col("__sid").as("id_b"), col("__sn").as("__snb")),
        Seq("id_b"))
      .filter(least(col("__sna"), col("__snb")).cast("double") /
        greatest(col("__sna"), col("__snb")).cast("double") >= threshold)
      .drop("__sna", "__snb")
  }

  /** Exact Jaccard similarity between the word-shingle sets of given id
    * pairs (verification step after LSH candidate generation). `pairs`
    * must have columns id_a, id_b. */
  def exactJaccard(df: DataFrame, textCol: String, idCol: String,
                   pairs: DataFrame, shingleWords: Int = 3): DataFrame = {
    val sets = df.select(col(idCol).as("__jid"),
      wordShingles(col(textCol), shingleWords).as("__jsh"))
    pairs
      .join(sets.withColumnRenamed("__jid", "id_a")
        .withColumnRenamed("__jsh", "sh_a"), Seq("id_a"))
      .join(sets.withColumnRenamed("__jid", "id_b")
        .withColumnRenamed("__jsh", "sh_b"), Seq("id_b"))
      .withColumn("jaccard",
        graft.Fns.roundU(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 4))
      .drop("sh_a", "sh_b")
  }

  /** Per-doc shingle set reduced to 64-BIT HASHES: (id, sh: array<long>).
    * The one scan-and-shingle pass for a whole dedup pipeline — candidate
    * generation ([[rareShinglePairsFromSets]]) and exact verification
    * ([[jaccardFromSets]]) both derive from it, so a call site that runs
    * candidates AND verification should compute this ONCE and persist it
    * (the lifecycle is the caller's, per the no-operator-internal-cache
    * policy). Hashing up front means no downstream stage ever shuffles a
    * shingle string: an 8-byte long per shingle instead of ~25 bytes of
    * text, and long equality instead of string compares in every join and
    * intersection. Jaccard over the hashed sets differs from the
    * string-set value only on a 64-bit collision (~2^-64 per shingle
    * pair — accepted and documented at [[rareShinglePairs]]). */
  def hashedShingleSets(df: DataFrame, textCol: String, idCol: String,
                        shingleWords: Int = 3,
                        carryCols: Seq[String] = Nil): DataFrame =
    // carryCols lets one shingling pass serve multiple downstream
    // splits (e.g. a train/eval partition by source): shingle once,
    // persist, filter the RESULT — instead of scanning and shingling
    // the corpus once per split
    df.select(col(idCol).as("id") +: carryCols.map(col) :+
      transform(wordShingles(col(textCol), shingleWords),
        g => xxhash64(g)).as("sh"): _*)

  /** [[rareShinglePairs]] over a precomputed [[hashedShingleSets]] table —
    * same output (modulo the documented hash-collision cases) in ONE
    * aggregation instead of three extra shuffles: the df-count, the
    * rarity join-back and the pair self-join collapse into a capped
    * collect per shingle ([[graft.functions.CollectCapped]] — state stays
    * bounded even on a stop-shingle key) followed by a local i<j pair
    * expansion (at most C(maxDf,2) rows per surviving shingle) and the
    * pair distinct. Null-id rows COUNT toward a shingle's df (they make
    * it less rare, matching the join form, where nulls fall out only at
    * the `<` predicate) but never appear in a pair; internally they ride
    * as a Long.MinValue sentinel through the capped collect, so a
    * corpus using Long.MinValue as a REAL id is not supported here. */
  def rareShinglePairsFromSets(sets: DataFrame, maxDf: Int = 10)
      : DataFrame = {
    val ids = col("__ids")
    val pairCombos = flatten(transform(sequence(lit(0), size(ids) - 2),
      i => transform(sequence(i + 1, size(ids) - 1),
        j => struct(element_at(ids, i + 1).as("x"),
          element_at(ids, j + 1).as("y")))))
    sets.select(explode(col("sh")).as("__rg"),
        coalesce(col("id"), lit(Long.MinValue)).as("id"))
      .groupBy(col("__rg"))
      .agg(graft.functions.CollectCapped(maxDf)(col("id")).as("__ids0"))
      .filter(col("__ids0").isNotNull)
      .withColumn("__ids", array_remove(col("__ids0"), Long.MinValue))
      .filter(size(ids) >= 2)
      .select(explode(pairCombos).as("__p"))
      .select(least(col("__p.x"), col("__p.y")).as("id_a"),
        greatest(col("__p.x"), col("__p.y")).as("id_b"))
      .distinct()
  }

  /** INCREMENTAL dedup: near-dup candidate pairs BETWEEN an incoming
    * batch and an existing corpus — the admission screen an ingestion
    * pipeline runs before adding documents (within-batch and
    * within-corpus duplicates are someone else's job: [[dupClusters]]).
    * Both inputs are [[hashedShingleSets]] tables with ids unique ACROSS
    * the two — a shared id would make a pair's side ambiguous, so this
    * is a hard contract (same class as the Long.MinValue reservation in
    * [[rareShinglePairsFromSets]]); prefix or offset one side's ids if
    * the corpora number independently.
    *
    * Candidates come from ONE rare-shingle aggregation over the union —
    * document frequency deliberately counts BOTH sides, so a shingle
    * common in the corpus is correctly non-discriminative even if rare
    * in the batch — then pairs are cut to those crossing the
    * batch/corpus boundary by two narrow (id, side) hash joins. The
    * C(maxDf,2) same-side combos generated and dropped are bounded per
    * shingle and never see text. Returns (new_id, corpus_id).
    *
    * Recall contract is inherited from [[rareShinglePairsFromSets]]:
    * complete for pairs sharing a shingle with union-df ≤ maxDf — i.e.
    * content duplicated at most ~maxDf times across batch+corpus;
    * collapse exact duplicates first for heavily-copied content. */
  def crossCorpusPairsFromSets(newSets: DataFrame, corpusSets: DataFrame,
                               maxDf: Int = 10): DataFrame = {
    val tagged = newSets.select(col("id"), col("sh"))
      .withColumn("__side", lit("n"))
      .unionByName(corpusSets.select(col("id"), col("sh"))
        .withColumn("__side", lit("c")))
    val sides = tagged.select(col("id"), col("__side"))
    val pairs = rareShinglePairsFromSets(tagged.select(col("id"),
      col("sh")), maxDf)
    pairs
      .join(sides.select(col("id").as("id_a"), col("__side").as("__sa")),
        Seq("id_a"))
      .join(sides.select(col("id").as("id_b"), col("__side").as("__sb")),
        Seq("id_b"))
      .filter(col("__sa") =!= col("__sb"))
      .select(
        when(col("__sa") === "n", col("id_a")).otherwise(col("id_b"))
          .as("new_id"),
        when(col("__sa") === "n", col("id_b")).otherwise(col("id_a"))
          .as("corpus_id"))
  }

  /** Train/eval CONTAMINATION check — the n-gram containment screen run
    * before any benchmark evaluation of a model trained on the corpus:
    * for each eval document, the fraction of its shingles that appear
    * anywhere in the training corpus. containment ≈ 1 means the eval doc
    * is (nearly) memorizable from training data.
    *
    * Both inputs are [[hashedShingleSets]] tables. The train side
    * collapses to a DISTINCT single-column long table (map-side combine;
    * at 100 TB this is the one big shuffle and it moves 8-byte keys
    * only), the eval side explodes to (id, shingle) rows, and one
    * left join + per-doc count aggregate yields the containment. For
    * repeated screening against a fixed training corpus, persist the
    * distinct train table — or replace the join with a bloom filter
    * built over it (one false-positive-bounded scan, no shuffle of the
    * eval side) when an approximate upper bound is acceptable.
    *
    * Returns (id, n_shingles, n_matched, containment∈[0,1] rounded
    * half-up to 4). */
  def containment(trainSets: DataFrame, evalSets: DataFrame): DataFrame = {
    val train = trainSets.select(explode(col("sh")).as("__g")).distinct()
    evalSets.select(col("id"), explode(col("sh")).as("__g"))
      .join(train.withColumn("__hit", lit(1)), Seq("__g"), "left_outer")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_matched"))
      .withColumn("containment",
        graft.Fns.roundU(col("n_matched").cast("double") /
          col("n_shingles").cast("double"), 4))
  }

  /** [[containment]]'s no-shuffle scale path: the train shingle set
    * collapses into a broadcast Bloom filter (built by treeAggregate —
    * the train side never shuffles at all) and each eval shingle probes
    * it locally, so the screen's only shuffle is the per-doc count
    * aggregate of the EVAL side — the small side by definition.
    *
    * The result is an UPPER BOUND: false positives inflate n_matched by
    * at most ~fpp·n_shingles (no false negatives), which is the safe
    * direction for a contamination screen — docs flagged clean really
    * are. Filter size is ~1.44·log2(1/fpp) bits per distinct train
    * shingle (≈1.2 GB per billion shingles at 1%) — past broadcast
    * comfort, shard the filter by shingle-hash range and probe the
    * matching shard.
    *
    * Same output schema as [[containment]]. */
  def containmentApprox(trainSets: DataFrame, evalSets: DataFrame,
                        expectedItems: Long, fpp: Double = 0.01)
      : DataFrame = {
    val bf = trainSets.select(explode(col("sh")).as("__g"))
      .stat.bloomFilter("__g", expectedItems, fpp)
    val bc = trainSets.sparkSession.sparkContext.broadcast(bf)
    val probe = udf((h: Long) => bc.value.mightContainLong(h))
    evalSets.select(col("id"), explode(col("sh")).as("__g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(probe(col("__g")), 1L).otherwise(0L)).as("n_matched"))
      .withColumn("containment",
        graft.Fns.roundU(col("n_matched").cast("double") /
          col("n_shingles").cast("double"), 4))
  }

  /** [[containmentApprox]] with the Bloom filter SHARDED by shingle-hash
    * range — the build path for train sets whose single filter would be
    * uncomfortable to funnel through one treeAggregate chain: each shard's
    * filter is built independently by the shard's reducer (a hash
    * aggregation with [[graft.functions.BloomAgg]] — map-side partial
    * filters merge like any aggregation buffer), so build memory per task
    * is one shard's filter, not the whole thing.
    *
    * Probing COGROUPs the filter rows with the probe rows on the shard
    * id: each task receives one shard's serialized filter plus every
    * probe whose shingle hashes into that shard, deserializes the filter
    * once, and streams the probes through it. The filters never visit
    * the driver and are never broadcast — the whole dataflow is
    * shuffles on (shard, digest) keys, which is the property sharding
    * exists to buy. The trade: probe-stage parallelism is bounded by
    * `shards` (each shard's filter lives in exactly one task), so pick
    * shards ≥ the cluster's task slots when probe volume dominates; for
    * a build-once / probe-many corpus screen, persist the filters with
    * [[writeShardedBloom]] and probe via [[containmentApproxStored]],
    * which keeps full probe parallelism.
    *
    * Same output schema and upper-bound semantics as
    * [[containmentApprox]] (`expectedItems` is the TOTAL distinct-shingle
    * estimate; each shard sizes for its 1/shards share). */
  def containmentApproxSharded(trainSets: DataFrame, evalSets: DataFrame,
                               shards: Int, expectedItems: Long,
                               fpp: Double = 0.01): DataFrame = {
    require(shards >= 1)
    val spark = trainSets.sparkSession
    import spark.implicits._
    val perShard = math.max(expectedItems / shards, 1L)
    val shardFilters = trainSets.select(explode(col("sh")).as("__g"))
      .withColumn("__s", pmod(col("__g"), lit(shards.toLong)))
      .groupBy(col("__s"))
      .agg(graft.functions.BloomAgg(perShard, fpp)(col("__g")).as("bf"))
      .as[(Long, Array[Byte])]
    val probes = evalSets
      .select(col("id").cast("long"), explode(col("sh")).as("__g"))
      .select(col("id"), col("__g"),
        pmod(col("__g"), lit(shards.toLong)).as("__s"))
      .as[(Long, Long, Long)]
    val hits = probes.groupByKey(_._3)
      .cogroup(shardFilters.groupByKey(_._1)) { (_, probeRows, filterRows) =>
        // at most one filter row per shard (it's a groupBy output); a
        // shard no train shingle hashed into simply misses everything
        val bf = filterRows.nextOption().map(r =>
          org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(r._2)))
        bf match {
          case Some(f) => probeRows.map { case (id, g, _) =>
            (id, if (f.mightContainLong(g)) 1L else 0L) }
          case None => probeRows.map { case (id, _, _) => (id, 0L) }
        }
      }
    hits.toDF("id", "__hit")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(col("__hit")).as("n_matched"))
      .withColumn("containment",
        graft.Fns.roundU(col("n_matched").cast("double") /
          col("n_shingles").cast("double"), 4))
  }

  /** Build-and-persist half of the storage-backed contamination screen:
    * each shard's Bloom filter is built by its reducer task
    * ([[graft.functions.BloomAgg]]) and written by that same task to
    * `dir/shard-<s>.bloom` through the Hadoop filesystem API — works
    * unchanged on local disk, HDFS, or an object store, and the filter
    * bytes never pass through the driver. Build once, then screen any
    * number of eval corpora with [[containmentApproxStored]] — the
    * amortization that motivates persisting filters at all. */
  def writeShardedBloom(trainSets: DataFrame, shards: Int,
                        expectedItems: Long, dir: String,
                        fpp: Double = 0.01): Unit = {
    require(shards >= 1)
    val spark = trainSets.sparkSession
    import spark.implicits._
    val perShard = math.max(expectedItems / shards, 1L)
    // SerializableWritable ships the Hadoop conf to executors (the conf
    // itself isn't Serializable); public DeveloperApi
    val confW = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    trainSets.select(explode(col("sh")).as("__g"))
      .withColumn("__s", pmod(col("__g"), lit(shards.toLong)))
      .groupBy(col("__s"))
      .agg(graft.functions.BloomAgg(perShard, fpp)(col("__g")).as("bf"))
      .as[(Long, Array[Byte])]
      .foreachPartition { (it: Iterator[(Long, Array[Byte])]) =>
        if (it.hasNext) {
          val base = new org.apache.hadoop.fs.Path(dir)
          val fs = base.getFileSystem(confW.value)
          it.foreach { case (s, bytes) =>
            // write-then-rename commit: a retried or speculative task
            // attempt writing the final path directly could leave a
            // truncated/interleaved file that readFrom later chokes on.
            // Each attempt writes a unique temp name; the rename is the
            // atomic commit, and a loser whose rename fails (another
            // attempt already committed the shard) just cleans up.
            val tmp = new org.apache.hadoop.fs.Path(base,
              s".shard-$s.${java.util.UUID.randomUUID()}.tmp")
            val out = fs.create(tmp, true)
            try out.write(bytes) finally out.close()
            val dst = new org.apache.hadoop.fs.Path(base, s"shard-$s.bloom")
            if (!fs.rename(tmp, dst)) {
              if (!fs.exists(dst))
                throw new java.io.IOException(s"commit failed for $dst")
              fs.delete(tmp, false)
            }
          }
        }
      }
  }

  /** Probe half of the storage-backed screen: probes are partitioned by
    * (shard, salt) where the salt fans each shard over
    * ~shufflePartitions/shards buckets — parallelism stays at the full
    * shuffle width even with few shards (a bare repartition(__s) would
    * cap it at `shards`), while each task still touches only the ~1-2
    * shard files its bucket covers, caching each deserialized filter
    * for the partition's lifetime. No driver-side filter assembly, no
    * broadcast; many tasks may read the same shard file concurrently,
    * which storage serves trivially. A missing shard file means no train
    * shingle hashed there: those probes miss, they don't fail.
    *
    * `shards` must equal the value passed to [[writeShardedBloom]].
    * Same output schema and upper-bound semantics as
    * [[containmentApprox]]. */
  def containmentApproxStored(evalSets: DataFrame, shards: Int,
                              dir: String): DataFrame = {
    require(shards >= 1)
    val spark = evalSets.sparkSession
    import spark.implicits._
    val confW = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val slots = math.max(1,
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt / shards)
    val probes = evalSets
      .select(col("id").cast("long"), explode(col("sh")).as("__g"))
      .select(col("id"), col("__g"),
        pmod(col("__g"), lit(shards.toLong)).as("__s"))
      // xxhash64 (not another pmod of __g) for the salt: a modulus
      // sharing factors with `shards` would make the salt a function of
      // the shard id and collapse the fan-out
      .withColumn("__salt", pmod(xxhash64(col("__g")), lit(slots.toLong)))
      .repartition(col("__s"), col("__salt"))
      .drop("__salt")
      .as[(Long, Long, Long)]
    val hits = probes.mapPartitions { it =>
      val cache = scala.collection.mutable.Map[
        Long, Option[org.apache.spark.util.sketch.BloomFilter]]()
      var fs: org.apache.hadoop.fs.FileSystem = null
      it.map { case (id, g, s) =>
        val bf = cache.getOrElseUpdate(s, {
          if (fs == null)
            fs = new org.apache.hadoop.fs.Path(dir)
              .getFileSystem(confW.value)
          val p = new org.apache.hadoop.fs.Path(
            new org.apache.hadoop.fs.Path(dir), s"shard-$s.bloom")
          if (fs.exists(p)) {
            val in = fs.open(p)
            try Some(org.apache.spark.util.sketch.BloomFilter.readFrom(in))
            finally in.close()
          } else None
        })
        (id, if (bf.exists(_.mightContainLong(g))) 1L else 0L)
      }
    }
    hits.toDF("id", "__hit")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(col("__hit")).as("n_matched"))
      .withColumn("containment",
        graft.Fns.roundU(col("n_matched").cast("double") /
          col("n_shingles").cast("double"), 4))
  }

  /** Exact Jaccard for candidate pairs over a precomputed
    * [[hashedShingleSets]] table. Attaches the long-hash arrays (3-4×
    * lighter on the wire than the string arrays [[exactJaccard]] ships)
    * and computes |A∩B| / (|A| + |B| - |A∩B|) — the union size comes from
    * the set sizes, not an array_union allocation, since the sets are
    * distinct by construction. Output schema matches [[exactJaccard]]:
    * pairs' columns + jaccard (rounded half-up to 4). */
  def jaccardFromSets(sets: DataFrame, pairs: DataFrame): DataFrame = {
    val ni = size(array_intersect(col("__ja"), col("__jb")))
    pairs
      .join(sets.select(col("id").as("id_a"), col("sh").as("__ja")),
        Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("__jb")),
        Seq("id_b"))
      .withColumn("jaccard", graft.Fns.roundU(ni.cast("double") /
        (size(col("__ja")) + size(col("__jb")) - ni).cast("double"), 4))
      .drop("__ja", "__jb")
  }

  /** EXACT set-similarity self-join via prefix filtering (the
    * AllPairs/PPJoin candidate scheme, Bayardo et al. WWW'07 / Xiao et
    * al. WWW'08 — public literature): every pair of documents whose
    * word-shingle Jaccard is ≥ tauNum/tauDen, with NO approximation —
    * the complete complement to the recall-bounded MinHash path (q23).
    *
    * Scale shape: tokens are globally ordered by (document frequency,
    * token) ascending; each document keeps only its PREFIX — the
    * |x| − ⌈τ·|x|⌉ + 1 rarest tokens. The prefix-filtering lemma
    * guarantees any qualifying pair shares a prefix token, so candidate
    * generation is an equi-join ON THE PREFIX TOKENS ONLY (rare by
    * construction — Σ df_prefix² stays near-linear where the naive
    * shared-any-token join pays Σ df² on stopword shingles), plus the
    * lossless size filter den·min ≥ num·max (J ≤ min/max). Verification
    * is a counted intersection join on candidate pairs. Every stage is
    * a hash shuffle; the per-document prefix rank window partitions by
    * doc (bounded by document length, never corpus-sized). The τ cut is
    * INTEGER (den·i ≥ num·u) — no float boundary to disagree on.
    */
  def prefixFilterJoin(df: DataFrame, textCol: String, idCol: String,
                       tauNum: Int, tauDen: Int,
                       shingleWords: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persisted: five downstream scans (sizes, df, prefix, verify×2)
    // would each re-run the explode; released by the per-query session
    // cache clear (Verify/Bench) like the other call-site persists
    val sh = df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("__pid"),
        explode(wordShingles(col(textCol), shingleWords)).as("__tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
    val dfreq = sh.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    // prefix length L = n − ⌈τ·n⌉ + 1, all-integer ceil
    val pref = sh.join(dfreq, Seq("__tok")).join(sizes, Seq("__pid"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(col("__df"), col("__tok"))))
      .filter(col("__rk") <=
        col("__n") - expr(s"($tauNum * __n + $tauDen - 1) div $tauDen")
          + lit(1))
      .select(col("__pid"), col("__tok"), col("__n"), col("__rk"))
    val a = pref.select(col("__pid").as("id_a"), col("__tok"),
      col("__n").as("__na"), col("__rk").as("__ra"))
    val b = pref.select(col("__pid").as("id_b"), col("__tok"),
      col("__n").as("__nb"), col("__rk").as("__rb"))
    // candidate pruning = length filter (den·min ≥ num·max, exactly
    // the overlap requirement α = ⌈num·(na+nb)/(den+num)⌉ applied to
    // min(na,nb), per-row BEFORE the shuffle) PLUS the CUMULATIVE
    // positional filter (round 11, replacing the per-occurrence
    // ANY-pass bound): the distinct-per-pair aggregate now also counts
    // the shared prefix tokens c and takes the LAST shared ranks
    // (ra*, rb*) — shared tokens appear in the same relative order in
    // both df-sorted lists (one global (df, token) total order), so
    // max(ra) and max(rb) name the same token. Every common token
    // at global order ≤ t* lies inside BOTH prefixes (rank < prefix
    // length on each side) and is therefore counted in c, and commons
    // after t* number at most min(na−ra*, nb−rb*), so
    //   overlap ≤ c + min(na − ra*, nb − rb*)
    // — lossless, and strictly tighter than the old per-occurrence
    // min(ra−1, rb−1)+1+min(...) bound (c ≤ min(ra*, rb*) always,
    // with equality only when the prefixes agree completely). This is
    // the PPJoin positional filter at full strength; the PPJoin+
    // hierarchical suffix probe is deliberately NOT implemented — it
    // needs the suffix token lists at candidate time, which would
    // shuffle full documents into the candidate join and defeat the
    // prefix design (the verify stage's hashed-set intersection plays
    // that role at one row per doc). All-integer test
    // ((den+num)·bound ≥ num·(na+nb)); the groupBy combines map-side,
    // so the shuffle stays ~one row per (pair, partition) like the
    // distinct it replaces.
    val cands = a.join(b, Seq("__tok"))
      .filter(col("id_a") < col("id_b") &&
        lit(tauDen) * least(col("__na"), col("__nb")) >=
          lit(tauNum) * greatest(col("__na"), col("__nb")))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("__c"),
        max(col("__ra")).as("__mra"), max(col("__rb")).as("__mrb"),
        first(col("__na")).as("__cna"), first(col("__nb")).as("__cnb"))
      .filter(lit(tauDen + tauNum) *
          (col("__c") + least(col("__cna") - col("__mra"),
            col("__cnb") - col("__mrb"))) >=
        lit(tauNum) * (col("__cna") + col("__cnb")))
      .select(col("id_a"), col("id_b"))
    // exact verify on per-doc HASHED token sets (one row per doc, ~8 B
    // per token on the wire) rather than a counted intersection over
    // the exploded token table — the token table would shuffle twice
    // at full |tokens| width; the set table shuffles at |docs|. Token
    // hashing is collision-free in practice (64-bit over a corpus
    // vocabulary; same precedent as exactJaccardCounts/q24) and
    // cancels out of the Jaccard VALUE either way.
    val hsets = sh.select(col("__pid"), xxhash64(col("__tok")).as("__h"))
      .groupBy(col("__pid")).agg(collect_list(col("__h")).as("__set"))
    val i = cands
      .join(hsets.select(col("__pid").as("id_a"),
        col("__set").as("__sa")), Seq("id_a"))
      .join(hsets.select(col("__pid").as("id_b"),
        col("__set").as("__sb")), Seq("id_b"))
      .withColumn("__i",
        size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("__u",
        size(col("__sa")).cast("long") + size(col("__sb")) - col("__i"))
      .drop("__sa", "__sb")
    i.filter(lit(tauDen) * col("__i") >= lit(tauNum) * col("__u"))
      .select(col("id_a"), col("id_b"),
        (col("__i").cast("double") / col("__u").cast("double"))
          .as("jaccard"))
  }
}
