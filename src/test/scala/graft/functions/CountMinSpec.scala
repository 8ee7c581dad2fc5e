package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("CM sketch: overestimate-only, exact for spread keys, mergeable") {
    val depth = 4
    val width = 256
    // zipf-ish: key k_i appears i times, i in 1..40 → 820 rows, plus a
    // heavy key far above the rest
    val rows = (1 to 40).flatMap(i => Seq.fill(i)(s"k_$i")) ++
      Seq.fill(500)("heavy")
    val df = rows.toDF("k").repartition(8) // force map-side partials
    val sketch = df.agg(CountMinAgg(depth, width)($"k").as("cm"))
      .collect()(0).getAs[collection.Seq[Long]]("cm").toArray
    assert(sketch.length === depth * width)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // CM can only OVERestimate — never under
    exact.foreach { case (k, n) =>
      val est = CountMinAgg.estimate(sketch, k, depth, width)
      assert(est >= n, s"$k underestimated: $est < $n")
      // with 41 keys in 4x256 cells, collisions are rare: allow a
      // small absolute slack rather than demanding exactness per key
      assert(est <= n + 40, s"$k wildly overestimated: $est vs $n")
    }
    assert(CountMinAgg.estimate(sketch, "heavy", depth, width) >= 500L)
    // a never-seen key may collide but stays within the error bound
    assert(CountMinAgg.estimate(sketch, "absent", depth, width) <= 40L)
    // deterministic across partitionings (merge order must not matter)
    val again = rows.toDF("k").repartition(3)
      .agg(CountMinAgg(depth, width)($"k").as("cm"))
      .collect()(0).getAs[collection.Seq[Long]]("cm").toArray
    assert(again.toSeq === sketch.toSeq)
  }

  test("CM sketch per group: one fixed-size buffer per group") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("g", "k")
    val r = df.groupBy($"g")
      .agg(CountMinAgg(2, 16)($"k").as("cm"))
      .collect().map(x => x.getString(0) ->
        x.getAs[collection.Seq[Long]]("cm").toArray).toMap
    assert(r("a").length === 32 && r("b").length === 32)
    assert(CountMinAgg.estimate(r("a"), "x", 2, 16) === 2L)
    assert(CountMinAgg.estimate(r("a"), "y", 2, 16) === 1L)
    assert(CountMinAgg.estimate(r("b"), "z", 2, 16) === 1L)
    assert(CountMinAgg.estimate(r("b"), "x", 2, 16) <= 1L)
  }
}
