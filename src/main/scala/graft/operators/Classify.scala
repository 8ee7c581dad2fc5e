package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-based quality filtering — the trainable half of the
  * CCNet/GPT-3-style document filter (a tiny linear model over cheap
  * surface statistics, trained on the corpus, then used to score every
  * document). The reference has no training stage; this is the
  * LLM-pipeline superset mandate, sibling to the unigram-LM surprisal
  * filter (q44) and the DSIR importance weights (q313).
  *
  * Everything here is FIXED-POINT Long arithmetic so the whole training
  * run — every gradient of every iteration — replays bit-for-bit in the
  * DuckDB oracle (the q329 fixed-point k-means discipline):
  *
  *  - weights live in Q = 2^16 units (the MPEG synthesis scale);
  *  - the link is the Elliott "fast sigmoid" σ̃(t) = 1/2 + t/(2(1+|t|))
  *    (Elliott 1993) instead of the logistic — σ̃ is RATIONAL, so the
  *    linked probability is one exact integer division instead of an
  *    exp() whose last ulp differs across math libraries. In Q units:
  *    p = ⌊ Q·(Q + |z| + z) / (2·(Q + |z|)) ⌋, numerator and denominator
  *    non-negative Longs, so floor == truncate and a double division is
  *    EXACT while the numerator stays under 2^53 (proved per batch by
  *    [[trainDelta]]'s bound check, never assumed);
  *  - the update is the delta rule w' = w − η·Σ(p − y·Q)·x / n — the
  *    cross-entropy gradient of a logistic model with σ̃ substituted for
  *    the sigmoid (the standard fast-sigmoid swap). η = etaNum/etaDen is
  *    rational; the one signed division per weight truncates toward zero
  *    in BOTH engines (Java `/` == DuckDB `//`).
  *
  * Scale shape (the broadcast-model contract, as q329's k-row centroid
  * loop): the model is d+1 Longs held on the driver and inlined as
  * literals, so each iteration is ONE whole-stage-codegen'd scan of the
  * feature table ending in a d+1-column sum aggregate — map-side
  * partials, a 1-row collect, no shuffle of anything but the partial
  * sums. The corpus is never collected and never re-shuffled; at 100 TB
  * an iteration costs exactly one pass, and the feature table is the
  * caller's to cache or re-derive (at one pass per iteration, persisting
  * it is the right call — the callers here do).
  */
object Classify {

  /** Fixed-point scale: weights, linked probabilities and labels all live
    * in units of 1/Q. */
  val Q: Long = 1L << 16

  /** Training result: `trace(k)` is the weight vector (bias first) AFTER
    * k iterations — trace(0) is the all-zero start, trace(iters) ==
    * `weights`. Exposing the whole trace makes the training itself
    * hash-oracleable, not just the endpoint. */
  final case class Trained(weights: Seq[Long], trace: Seq[Seq[Long]],
                           n: Long)

  /** z = w·x in Q units: bias + Σ w_j·x_j over integer feature columns.
    * Pure Long column arithmetic — stays in codegen. */
  def zFixed(w: Seq[Long], feats: Seq[Column]): Column = {
    require(w.length == feats.length + 1,
      s"weights (${w.length}) must be features+bias (${feats.length + 1})")
    feats.zip(w.tail).map { case (x, wj) => x.cast("long") * lit(wj) }
      .foldLeft(lit(w.head): Column)(_ + _)
  }

  /** Elliott-linked probability in Q units, p ∈ [0, Q]:
    * p = ⌊ Q·(Q + |z| + z) / (2·(Q + |z|)) ⌋. Numerator and denominator
    * are non-negative, so the floor of the (exact, see bound check)
    * double division equals the truncating integer division DuckDB's
    * `//` would compute — either spelling replays. */
  def elliottQ(z: Column): Column = {
    val az = abs(z)
    floor((lit(Q) * (lit(Q) + az + z)).cast("double") /
      ((lit(2L) * (lit(Q) + az)).cast("double"))).cast("long")
  }

  /** Truncating Long division — Java `/` semantics, spelled out so the
    * driver-side update documents that it matches DuckDB `//`. */
  private def tdiv(a: Long, b: Long): Long = a / b

  /** Full-batch delta-rule training of a linear classifier with the
    * Elliott link, `iters` iterations from w = 0.
    *
    * `rows` must carry integer-valued feature columns (bounded — the
    * fixed-point contract is CHECKED against the measured per-feature
    * max each iteration, q329-style: d·terms under 2^53 or throw) and a
    * 0/1 integer label column. η = etaNum/etaDen.
    *
    * One job per iteration (scan + 1-row aggregate collect), one job up
    * front for the per-feature max-abs bound and the row count. */
  def trainDelta(rows: DataFrame, featCols: Seq[String], labelCol: String,
                 iters: Int, etaNum: Long, etaDen: Long): Trained = {
    require(iters >= 1 && etaNum > 0 && etaDen > 0)
    val d = featCols.length
    val feats = featCols.map(col)
    // one bounded job: n plus max|x_j| per feature (for the overflow
    // proof; also catches a non-integer feature column at analysis time
    // via the long cast)
    val bounds = rows.agg(count(lit(1)).as("n"),
      featCols.map(c => max(abs(col(c).cast("long"))).as(c)): _*).head()
    val n = bounds.getLong(0)
    require(n > 0, "trainDelta: empty training set")
    val maxAbs = (1 to d).map(i => bounds.getLong(i))
    var w: Seq[Long] = Seq.fill(d + 1)(0L)
    val trace = Seq.newBuilder[Seq[Long]]
    trace += w
    for (_ <- 1 to iters) {
      // |z| ≤ |w0| + Σ|w_j|·max|x_j|; the elliott numerator is
      // Q·(Q + 2|z|) and must stay exact in a double (< 2^53), the
      // gradient sums n·Q·max|x_j| and must stay in a Long with the
      // etaNum headroom. Checked, not assumed — past the bound the two
      // engines would diverge silently (Long wrap vs BIGINT raise).
      val zMax = math.abs(w.head) +
        w.tail.zip(maxAbs).map { case (wj, m) => math.abs(wj) * m }.sum
      require(Q.toDouble * (Q + 2.0 * zMax) < math.pow(2, 53),
        s"trainDelta fixed-point bound exceeded: zMax=$zMax -> " +
          "Q*(Q+2|z|) >= 2^53; shrink eta or rescale the features")
      require(n.toDouble * Q * (maxAbs.max max 1L) * etaNum <
        math.pow(2, 62),
        s"trainDelta gradient bound exceeded at n=$n")
      val z = zFixed(w, feats)
      val r = elliottQ(z) - col(labelCol).cast("long") * lit(Q)
      // one scan: d+1 partial sums, 1-row collect
      val g = rows.agg(sum(r).as("g0"),
        feats.map(x => sum(r * x.cast("long"))): _*).head()
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - tdiv(g.getLong(j) * etaNum, n * etaDen) }
      trace += w
    }
    Trained(w, trace.result(), n)
  }

  /** Score rows with a trained model: the linked probability in Q units
    * (0..Q), exact. */
  def scoreQ(w: Seq[Long], feats: Seq[Column]): Column =
    elliottQ(zFixed(w, feats))
}
