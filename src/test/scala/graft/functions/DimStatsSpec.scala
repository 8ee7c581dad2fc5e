package graft.functions

import graft.SparkSpec

class DimStatsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs: Seq[Seq[Float]] = Seq(
    Seq(1f, 0f, 2f), Seq(3f, 0f, 2f), Seq(5f, 4f, 2f), Seq(7f, 0f, 2f))

  test("DimStatsAgg matches hand-computed stats and correlations") {
    val p = vecs.toDF("embedding")
      .agg(DimStatsAgg($"embedding").as("p"))
      .select($"p.*").as[DimProfile].collect()(0)
    // dim 0: mean 4, pop var ((1-4)²+(3-4)²+(5-4)²+(7-4)²)/4 = 5
    val d0 = p.dims(0)
    assert(d0.mean === 4.0 && d0.variance === 5.0 && d0.zero_frac === 0.0)
    // dim 1: zeros in 3 of 4 rows
    assert(p.dims(1).zero_frac === 0.75)
    // dim 2: constant → variance 0
    assert(p.dims(2).variance === 0.0)
    // pair (0,1): cov = E[xy] − E[x]E[y] = (0+0+20+0)/4 − 4·1 = 1;
    // corr = 1/√(5·3)
    val p01 = p.pairs.find(q => q.i == 0 && q.j == 1).get
    assert(math.abs(p01.corr - 1.0 / math.sqrt(15.0)) < 1e-12)
  }

  test("result is independent of partition/merge order") {
    val one = vecs.toDF("embedding").coalesce(1)
      .agg(DimStatsAgg($"embedding")).collect()(0)
    val many = spark.createDataFrame(
        spark.sparkContext.parallelize(vecs.map(Tuple1(_)), 4))
      .toDF("embedding")
      .agg(DimStatsAgg($"embedding")).collect()(0)
    assert(one === many)
  }

  test("empty vectors never count — stats identical with and without " +
      "them, in any partition order") {
    val withEmpty: Seq[Seq[Float]] =
      Seq(Seq.empty[Float]) ++ vecs ++ Seq(Seq.empty[Float])
    for (parts <- Seq(1, 3)) {
      val a = spark.createDataFrame(
          spark.sparkContext.parallelize(withEmpty.map(Tuple1(_)), parts))
        .toDF("embedding").agg(DimStatsAgg($"embedding")).collect()(0)
      val b = vecs.toDF("embedding").coalesce(1)
        .agg(DimStatsAgg($"embedding")).collect()(0)
      assert(a === b, s"parts=$parts")
    }
  }

  test("zero-variance dimensions report in dims but never emit NaN " +
      "pairs") {
    val p = vecs.toDF("embedding")
      .agg(DimStatsAgg($"embedding").as("p"))
      .select($"p.*").as[DimProfile].collect()(0)
    // dim 2 is constant: it must appear in the profile with variance 0
    assert(p.dims(2).variance === 0.0)
    // and in no pair — 3 dims would give 3 pairs, dim-2 exclusion
    // leaves exactly the (0,1) pair
    assert(p.pairs.map(q => (q.i, q.j)) === Seq((0, 1)))
    assert(!p.pairs.exists(_.corr.isNaN))
  }

  test("ragged vectors fail loudly, never mis-index the triangle") {
    val e = intercept[org.apache.spark.SparkException] {
      Seq(Seq(1f, 2f), Seq(1f, 2f, 3f)).toDF("embedding")
        .coalesce(1).agg(DimStatsAgg($"embedding")).collect()
    }
    assert(e.getMessage.contains("ragged")
      || e.getCause != null && e.getCause.getMessage.contains("ragged"))
  }
}
