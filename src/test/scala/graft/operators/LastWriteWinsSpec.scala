package graft.operators

import graft.SparkSpec

class LastWriteWinsSpec extends SparkSpec {
  import spark.implicits._

  test("typed LWW aggregator keeps the value with the greatest ord") {
    val ds = Seq(
      ("k1", 1L, "first"), ("k1", 3L, "last"), ("k1", 2L, "mid"),
      ("k2", 10L, "only"))
      .toDS()
    val lww = new LastWriteWins[String]()
    val r = ds.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(lww.toColumn.name("v"))
      .collect().toMap
    assert(r === Map("k1" -> Some("last"), "k2" -> Some("only")))
  }

  test("typed LWW agrees with the Column-form mergeAgg on one side") {
    val tagged = Seq(
      ("a", "pre", 1.0, 1), ("a", "pre", 9.0, 5), ("a", "pre", 4.0, 3))
      .toDF("k", "side", "v", "ord")
    val colForm = PrePostMerge.mergeAgg(tagged, Seq("k"), "side", "v",
      org.apache.spark.sql.functions.col("ord"))
      .collect()(0).getAs[Double]("pre_value")
    val typed = tagged.as[(String, String, Double, Int)]
      .groupByKey(_._1)
      .mapValues(t => (t._4.toLong, t._3))
      .agg(new LastWriteWins[Double]().toColumn.name("v"))
      .collect()(0)._2
    assert(typed === Some(colForm))
  }
}
