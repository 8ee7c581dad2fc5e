package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("radiusJoin equals brute-force cross-join-filter (the exactness " +
      "contract), including pairs straddling cell borders") {
    // points engineered around the r=60 km cell lattice: the cell edge
    // is 60/111 deg lat × 60/85 deg lon, so consecutive multiples of
    // ~0.5405/0.7059 sit on borders; offsets of ±1e-6 deg place pairs
    // in DIFFERENT cells at ~sub-metre truedistance — the exact case a
    // wrong neighborhood (or an off-by-one floor for negative lon)
    // silently drops
    val cellLat = 60.0 / Geo.KmPerDegLat
    val cellLon = 60.0 / Geo.KmPerDegLon
    val pts = Seq(
      (1L, 2 * cellLat - 1e-6, -3 * cellLon - 1e-6),
      (2L, 2 * cellLat + 1e-6, -3 * cellLon + 1e-6), // corner straddle
      (3L, 2.5 * cellLat, -2.5 * cellLon),
      (4L, 3 * cellLat - 1e-6, -2.5 * cellLon), // lat-border straddle
      (5L, 3 * cellLat + 1e-6, -2.5 * cellLon),
      (6L, 10 * cellLat, 10 * cellLon) // far away: matches nothing
    ) ++ (0 until 40).map { i => // pseudo-random cloud
      (100L + i, 1.0 + (i * 37 % 100) / 100.0 * 2.5,
        -2.0 + (i * 91 % 100) / 100.0 * 2.5)
    }
    val a = pts.toDF("a_id", "a_lat", "a_lon")
    val b = pts.map { case (id, la, lo) => (id + 1000, la, lo) }
      .toDF("b_id", "b_lat", "b_lon")
    val got = Geo.radiusJoin(a, "a_lat", "a_lon", b, "b_lat", "b_lon", 60.0)
      .select($"a_id", $"b_id").collect().map(r => (r.getLong(0),
        r.getLong(1))).toSet
    val brute = a.crossJoin(b)
      .filter(Geo.planarKm($"a_lat", $"a_lon", $"b_lat", $"b_lon")
        <= 60.0)
      .select($"a_id", $"b_id").collect().map(r => (r.getLong(0),
        r.getLong(1))).toSet
    assert(got === brute)
    assert(brute.contains((1L, 1002L)), "corner-straddling pair present")
    assert(brute.contains((4L, 1005L)), "lat-border pair present")
    // the far-away point matches ONLY its own zero-distance twin in b
    assert(brute.filter(_._1 == 6L) === Set((6L, 1006L)))
  }

  test("radiusJoin plans a hash equi-join on the cell key, never a " +
      "cartesian product") {
    val a = (1L to 200L).map(i => (i, 40.0 + i * 0.01, -80.0 + i * 0.013))
      .toDF("a_id", "a_lat", "a_lon")
    val b = (1L to 50L).map(i => (i, 40.0 + i * 0.04, -80.0 + i * 0.05))
      .toDF("b_id", "b_lat", "b_lon")
    val plan = Geo.radiusJoin(a, "a_lat", "a_lon", b, "b_lat", "b_lon",
      25.0).queryExecution.executedPlan
    val bad = plan.collect {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec =>
        j.nodeName
      case j: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => j.nodeName
    }
    assert(bad.isEmpty, s"non-equi join in plan: $bad")
  }

  test("syntheticPoint lands in the documented 10-degree band and is " +
      "reproducible") {
    val df = (1L to 500L).toDF("k")
    val (la, lo) = Geo.syntheticPoint($"k")
    val r = df.select(min(la), max(la), min(lo), max(lo)).head()
    assert(r.getDouble(0) >= 40.0 && r.getDouble(1) < 50.0)
    assert(r.getDouble(2) >= -80.0 && r.getDouble(3) < -70.0)
    val once = df.select($"k", la.as("a"), lo.as("b")).collect().toSeq
    val again = df.select($"k", la.as("a"), lo.as("b")).collect().toSeq
    assert(once.map(_.toSeq) === again.map(_.toSeq))
  }

  /** q256's zone fixtures as (zone, closed vertex list). */
  private val zones: Seq[(String, Seq[(Long, Long)])] = Seq(
    "ell" -> Seq((-79000000L, 45000000L), (-76000000L, 45000000L),
      (-76000000L, 46000000L), (-78000000L, 46000000L),
      (-78000000L, 48500000L), (-79000000L, 48500000L)),
    "quad" -> Seq((-75000000L, 45000000L), (-72000000L, 45500000L),
      (-71500000L, 48000000L), (-74500000L, 47500000L)),
    "tri" -> Seq((-79500000L, 41000000L), (-76000000L, 41500000L),
      (-78000000L, 44000000L)))

  private def zoneEdges = zones.flatMap { case (z, vs) =>
    vs.zip(vs.tail :+ vs.head).map { case ((x1, y1), (x2, y2)) =>
      (z, x1, y1, x2, y2) } }.toDF("zone", "x1", "y1", "x2", "y2")

  test("pointInPolygons: hand-picked interior / exterior / concave-" +
      "notch points classify exactly") {
    // the ell notch: x ∈ (−78°, −76°), y ∈ (46°, 48.5°) is OUTSIDE
    // the L even though it's inside the bounding box
    val pts = Seq(
      (1L, -78500000L, 46000000L + 500000L), // ell arm interior
      (2L, -77000000L, 45500000L),           // ell base interior
      (3L, -77000000L, 47000000L),           // bbox yes, notch → outside
      (4L, -73500000L, 46500000L),           // quad interior
      (5L, -78000000L - 500000L, 42000000L), // tri interior
      (6L, -70500000L, 41000000L)            // nowhere
    ).toDF("id", "px", "py")
    val got = Geo.pointInPolygons(pts, "id", "px", "py", zoneEdges)
      .select($"id", $"zone").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "ell"), (2L, "ell"), (4L, "quad"),
      (5L, "tri")))
  }

  test("pointInPolygons matches the JDK's independent Path2D winding " +
      "test on a pseudo-random cloud (off-boundary points)") {
    import java.awt.geom.Path2D
    val paths = zones.map { case (z, vs) =>
      val p = new Path2D.Double()
      p.moveTo(vs.head._1.toDouble, vs.head._2.toDouble)
      vs.tail.foreach { case (x, y) => p.lineTo(x.toDouble, y.toDouble) }
      p.closePath(); z -> p
    }
    // hash-scattered points over the band; odd micro-degree offsets
    // keep them off every axis-aligned edge so the two boundary
    // conventions (PNPOLY half-open vs Path2D) can never disagree
    val pts = (0 until 400).map { i =>
      (i.toLong, (-80000000L + i * 2654435761L % 10000000L) | 1L,
        (40000000L + i * 40503L * 40503L % 10000000L) | 1L)
    }
    val got = Geo.pointInPolygons(pts.toDF("id", "px", "py"),
        "id", "px", "py", zoneEdges)
      .select($"id", $"zone").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val want = (for {
      (i, x, y) <- pts
      (z, p) <- paths if p.contains(x.toDouble, y.toDouble)
    } yield (i, z)).toSet
    assert(got === want)
    assert(want.nonEmpty, "fixture must land points inside zones")
  }
}
