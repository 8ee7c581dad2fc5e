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
}
