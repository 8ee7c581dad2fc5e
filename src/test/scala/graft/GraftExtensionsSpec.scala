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
        |  affine_simhash(poly_hash_arr(array('a', 'b')), 32) AS sh,
        |  poly_str_hash('abc') AS fp,
        |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs,
        |  word_shingles('a b c d', 2) AS ws,
        |  size(affine_minhash(poly_hash_arr(array('x', 'y')), 8)) AS mh,
        |  size(gram_hash_set('abcdefgh', 3)) AS gh
        |""".stripMargin).collect()(0)
    // 'abc' -> ((0*257+97)*257+98)*257+99 mod P = 6436961*257+99... the
    // closed form: 97*257^2 + 98*257 + 99
    assert(r.getAs[Long]("fp") ===
      (97L * 257 * 257 + 98L * 257 + 99L) % 1000000007L)
    assert(math.abs(r.getAs[Double]("cs") - 1.0) < 1e-12)
    assert(r.getAs[Seq[String]]("ws") === Seq("a b", "b c", "c d"))
    assert(r.getAs[Int]("mh") === 8)
    assert(r.getAs[Int]("gh") === 6)
  }

  test("nfc_normalize recomposes combining marks and passes canonical " +
      "text through untouched") {
    import spark.implicits._
    // "e" + U+0301 must compose to U+00E9; already-canonical and pure
    // ASCII strings are identity (the zero-allocation fast path)
    val df = Seq("école", "école", "plain ascii", "Å")
      .toDF("s")
      .selectExpr("s", "nfc_normalize(s) AS n", "length(s) AS ls",
        "length(nfc_normalize(s)) AS ln")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1),
      r.getInt(2), r.getInt(3)))
    assert(rows(0)._2 === "école" && rows(0)._3 === 6 &&
      rows(0)._4 === 5)
    assert(rows(1)._2 === "école" && rows(1)._4 === 5)
    assert(rows(2)._2 === "plain ascii")
    assert(rows(3)._2 === "Å" && rows(3)._4 === 1)
    // null-safe
    assert(spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING)) AS n")
      .collect()(0).isNullAt(0))
  }

  test("register injects the top-k strategy and pushdown rule (idempotent)") {
    GraftFunctions.register(spark) // second call must not duplicate
    GraftFunctions.register(spark)
    assert(spark.experimental.extraStrategies
      .count(_ == graft.plans.TopKStrategy) === 1)
    assert(spark.experimental.extraOptimizations
      .count(_ == graft.plans.PushFilterThroughTopK) === 1)
  }

  test("build-time extensions object injects strategy + rule") {
    // the withExtensions path can't run on the shared test SparkContext
    // (getOrCreate would return the existing session, ignoring the
    // extensions) — so assert directly on what the extensions object
    // injects, via the package-internal build accessors
    import org.apache.spark.sql.SparkSessionExtensions
    import org.apache.spark.sql.graft.TestBridge
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(TestBridge.plannerStrategies(ext, spark)
      .contains(graft.plans.TopKStrategy))
    assert(TestBridge.optimizerRules(ext, spark)
      .contains(graft.plans.PushFilterThroughTopK))
  }

  test("SQL affine_simhash equals the Column API form") {
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql(
      "SELECT affine_simhash(poly_hash_arr(array('spark', 'catalyst'))," +
        " 32) AS h").collect()(0)
      .getLong(0)
    val viaCol = spark.range(1)
      .select(graft.functions.AffineSimHash(graft.functions.PolyHashArr(
        array(lit("spark"), lit("catalyst"))), 32).as("h"))
      .collect()(0).getLong(0)
    assert(viaSql === viaCol)
  }
}
