package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames.
  *
  * Reference behavior: none (the reference has no graph stage); this is
  * SURVEY §2.4-class coverage, sibling to [[Dedup.dupClusters]]'s
  * connected components. Same iterative-DataFrame discipline as there:
  * each iteration is hash joins + hash aggregates on the edge
  * partitioning, lineage is truncated with `localCheckpoint` on a fixed
  * cadence so a 50-iteration run doesn't compile a 50-deep plan, and
  * nothing ever collects to the driver.
  */
object Graph {

  /** PageRank over a DIRECTED edge list (pass both directions for an
    * undirected graph). Fixed `iters` power iterations of
    *
    *   r'(v) = (1-d)/N + d·( Σ_{(u,v)∈E} r(u)/outdeg(u) + dangling/N )
    *
    * where `dangling` is the rank mass sitting on nodes with no
    * out-edges — redistributed uniformly, the standard correction that
    * keeps Σr = 1 (drop it and ranks leak every iteration on any graph
    * with sinks). Per iteration: one join of ranks onto edges (both
    * sides pre-partitioned on the node key by the shuffle, so iterations
    * 2..k reuse the exchange), one hash aggregate per destination, one
    * broadcast of the 1-row dangling aggregate. State per iteration is
    * one (node, rank) row per node — never materialized on the driver.
    *
    * Fixed iteration count (not convergence-tested) on purpose: the
    * result is a deterministic function of the graph, so it can be
    * oracle-checked, and at cluster scale a convergence test is one
    * extra aggregate the caller can layer on top. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               damping: Double = 0.85, iters: Int = 3,
               checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
    val outDeg = e.groupBy(col("__src").as("node"))
      .agg(count(lit(1)).as("__deg"))
    // degree rides the rank table so the per-iteration join is
    // ranks⋈edges only; left join keeps sink nodes (deg NULL)
    val base = nodes.join(outDeg, Seq("node"), "left")
    val nN = nodes.count()
    var ranks = base.withColumn("rank", lit(1.0 / nN))
    for (i <- 1 to iters) {
      val dangling = ranks.filter(col("__deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
      val contrib = ranks.filter(col("__deg").isNotNull)
        .join(e, col("node") === col("__src"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("rank") / col("__deg")).as("__in"))
      ranks = base
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"), col("__deg"),
          (lit((1.0 - damping) / nN) +
            lit(damping) * (coalesce(col("__in"), lit(0.0)) +
              col("__dm") / nN)).as("rank"))
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), col("rank"))
  }
}
