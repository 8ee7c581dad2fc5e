package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  // live-session registration (the shared test session already exists, so
  // the build-time extensions path wouldn't apply — same builders either
  // way, see GraftFunctions)
  private lazy val spark: SparkSession = {
    val s = SparkSpec.session
    GraftFunctions.register(s)
    s
  }

  test("custom expressions are callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  simhash64(array('a', 'b')) AS sh,
        |  rolling_fingerprint('abc') AS fp,
        |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs,
        |  word_shingles('a b c d', 2) AS ws,
        |  size(minhash_sig(array('x', 'y'), 8)) AS mh
        |""".stripMargin).collect()(0)
    assert(r.getAs[Long]("fp") != 0L)
    assert(math.abs(r.getAs[Double]("cs") - 1.0) < 1e-12)
    assert(r.getAs[Seq[String]]("ws") === Seq("a b", "b c", "c d"))
    assert(r.getAs[Int]("mh") === 8)
  }

  test("SQL simhash64 equals the Column API form") {
    import graft.functions.TextHashes
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql(
      "SELECT simhash64(array('spark', 'catalyst')) AS h").collect()(0)
      .getLong(0)
    val viaCol = spark.range(1)
      .select(TextHashes.simhash64(
        array(lit("spark"), lit("catalyst"))).as("h"))
      .collect()(0).getLong(0)
    assert(viaSql === viaCol)
  }
}
