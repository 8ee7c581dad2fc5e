package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial radius joins at corpus scale: GRID-CELL bucketing instead of
  * the cross join that dies first on a real cluster.
  *
  * The operator family a geo-enriched pipeline needs ("which points of
  * B lie within r of each point of A") is a JOIN with an inequality
  * predicate — Spark would otherwise plan a cartesian product and
  * filter N·M pairs. [[radiusJoin]] makes it an EQUI-join: bucket both
  * sides into grid cells at least one radius wide, explode the smaller
  * side to its 3×3 cell neighborhood, hash-join on the cell key, and
  * only then evaluate the distance predicate. Every within-radius pair
  * is provably in the neighborhood (cell edge ≥ r in both axes), so
  * the result is EXACTLY the cross-join-filter semantics at a shuffle
  * cost of |A| + 9·|B| keyed rows — the same discipline as the LSH/IVF
  * families: bucket first, compare inside buckets only.
  *
  * At 100 TB: the join shuffles on the cell id, so co-located cells
  * hash-partition evenly for uniform data; a dense city cell is the
  * usual skew story (salt the hot cells or shrink the cell edge — both
  * compose with this plan unchanged). The 9× replication rides the
  * SMALLER side by argument order, and Catalyst broadcast-joins it
  * outright when it fits.
  *
  * DISTANCE MODEL: planar equirectangular kilometres with fixed
  * per-degree scales — pure `*`/`+`/`sqrt`, every op IEEE-exact, so
  * two engines computing the predicate agree bit-for-bit (the q190
  * oracle relies on this). Swapping in great-circle haversine is a
  * one-Column change at [[planarKm]]'s call site; trig parity across
  * engines then bounds the oracle instead of IEEE exactness.
  */
object Geo {

  /** Kilometres per degree of latitude (planar model constant). */
  val KmPerDegLat = 111.0

  /** Kilometres per degree of longitude at the working band's
    * reference parallel (planar model constant — fixed, NOT a cos(lat)
    * term, so the metric stays IEEE-exact and engine-portable). */
  val KmPerDegLon = 85.0

  /** Planar distance in km between two (lat, lon) points: sqrt of the
    * axis-scaled squared differences. Each operation is IEEE-754
    * correctly rounded (no libm), so any engine evaluates it to the
    * identical double. */
  def planarKm(lat1: Column, lon1: Column,
               lat2: Column, lon2: Column): Column = {
    val dx = (lat1 - lat2) * lit(KmPerDegLat)
    val dy = (lon1 - lon2) * lit(KmPerDegLon)
    sqrt(dx * dx + dy * dy)
  }

  /** Synthesize a deterministic (lat, lon) in a 10°×10° band from an
    * int64 key via the engine-portable Knuth hash — the fixture
    * generator for geo queries over keyed tables (a real deployment
    * reads real coordinates; everything downstream is unchanged).
    * Mirrors exactly in SQL, see q190's oracle. */
  def syntheticPoint(key: Column): (Column, Column) = {
    val u1 = Sampling.consistentHash(key)
    val u2 = Sampling.consistentHash(key + lit(1000003L))
    (lit(40.0) + u1.cast("double") / lit(4294967296.0) * 10.0,
      lit(-80.0) + u2.cast("double") / lit(4294967296.0) * 10.0)
  }

  /** All pairs (left row, right row) with planar distance ≤ `radiusKm`,
    * as `left.* ++ right.* ++ dist_km` — exact radius-join semantics
    * through the grid-cell equi-join described in the class doc.
    *
    * `right` should be the smaller side: it carries the 9× neighborhood
    * replication (and is the broadcast candidate). Column names must
    * not collide across sides (select/alias first). */
  def radiusJoin(left: DataFrame, leftLat: String, leftLon: String,
                 right: DataFrame, rightLat: String, rightLon: String,
                 radiusKm: Double): DataFrame = {
    require(radiusKm > 0, "radiusKm must be positive")
    // cell edges: exactly one radius in each axis ⇒ any pair within r
    // spans at most one cell boundary per axis ⇒ 3×3 probe suffices
    val cellLat = radiusKm / KmPerDegLat
    val cellLon = radiusKm / KmPerDegLon
    def cx(lat: Column) = floor(lat / lit(cellLat)).cast("long")
    def cy(lon: Column) = floor(lon / lit(cellLon)).cast("long")
    val l = left.withColumn("__gx", cx(col(leftLat)))
      .withColumn("__gy", cy(col(leftLon)))
    val r = right.withColumn("__gx0", cx(col(rightLat)))
      .withColumn("__gy0", cy(col(rightLon)))
      .withColumn("__dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__gx", col("__gx0") + col("__dx"))
      .withColumn("__gy", col("__gy0") + col("__dy"))
      .drop("__gx0", "__gy0", "__dx", "__dy")
    val d = planarKm(col(leftLat), col(leftLon),
      col(rightLat), col(rightLon))
    l.join(r, Seq("__gx", "__gy"))
      .filter(d <= lit(radiusKm))
      .withColumn("dist_km", d)
      .drop("__gx", "__gy")
  }

  /** Point-in-polygon classification (geofencing): one output row per
    * (point, containing polygon), all point columns carried through
    * plus the polygon's `zone`.
    *
    * `edges` must have columns (zone, x1, y1, x2, y2) — one row per
    * polygon edge, integer coordinates (micro-degrees), polygons
    * closed by the caller. Containment is the crossing-number parity
    * of a +x ray in PURE INT64: the PNPOLY half-open rule
    * `(y1>py) ≠ (y2>py)` skips horizontal edges and counts a
    * ray-through-vertex hit exactly once, and the "px left of the
    * edge at height py" test is cross-multiplied by (y2−y1) with the
    * sign flip spelled out — no division, no float, so any two
    * engines (and the q256 oracle) evaluate the identical predicate,
    * boundary collisions included. Coordinate budget: |coord| ≤ 2³¹
    * keeps every product under 2⁶² — int64-exact.
    *
    * Plan shape: polygon layers are DIMENSIONS — broadcast
    * nested-loop of points × edges with the crossing predicate
    * inline (map-side, no pair shuffle), partial counts combine
    * map-side, and the one shuffle carries only CROSSING rows (≈2
    * per inside point). A million-edge layer grid-buckets edges by
    * y-band first (the [[radiusJoin]] discipline) and the parity
    * math is unchanged. */
  def pointInPolygons(points: DataFrame, idCol: String,
                      pxCol: String, pyCol: String,
                      edges: DataFrame): DataFrame = {
    val px = col(pxCol); val py = col(pyCol)
    val t = (py - col("y1")) * (col("x2") - col("x1")) -
      (px - col("x1")) * (col("y2") - col("y1"))
    val carries = points.columns.filterNot(_ == idCol).toSeq
    points.join(broadcast(edges),
        ((col("y1") > py) =!= (col("y2") > py)) &&
          when(col("y2") > col("y1"), t > 0).otherwise(t < 0))
      .groupBy(col(idCol), col("zone"))
      .agg(count(lit(1)).as("__k"),
        carries.map(c => max(col(c)).as(c)): _*)
      .filter(col("__k") % 2 === 1)
      .drop("__k")
  }
}
