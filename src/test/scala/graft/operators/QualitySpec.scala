package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("every rule type detects seeded violations at the right rate") {
    // 10 rows with known defects: 2 nulls, 1 out-of-range, 1 regex
    // miss, 2 rows sharing a key, 1 FK orphan, 1 predicate violation
    val child = Seq(
      (1L, Some("a@x.com"), 5.0, "A"),
      (2L, Some("b@x.com"), 5.0, "B"),
      (3L, None, 5.0, "A"),            // null email
      (4L, None, 5.0, "B"),            // null email
      (5L, Some("not-an-email"), 5.0, "A"), // regex miss
      (6L, Some("c@x.com"), 99.0, "B"),     // out of range
      (7L, Some("d@x.com"), 5.0, "A"),
      (7L, Some("e@x.com"), 5.0, "B"),      // dup key with previous
      (8L, Some("f@x.com"), 5.0, "A"),
      (9L, Some("g@x.com"), -1.0, "C"))     // predicate viol (+range)
      .toDF("id", "email", "score", "grade")
    val parent = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L).toDF("pid")
    val r = Quality.report(child, Seq(
      Quality.NotNull("email_not_null", "email", maxFrac = 0.2),
      Quality.InRange("score_0_10", "score", 0, 10, maxFrac = 0.1),
      Quality.Matches("email_shape", "email", "^[a-z]+@[a-z.]+$"),
      Quality.Predicate("score_positive", $"score" < 0),
      Quality.Unique("id_key", Seq("id")),
      Quality.ForeignKey("id_fk", "id", parent, "pid")))
      .collect().map(x => x.getString(0) ->
        (x.getDouble(1), x.getBoolean(3))).toMap
    assert(r("email_not_null") === ((0.2, true)))   // 2/10, at threshold
    assert(r("score_0_10") === ((0.2, false)))      // 99.0 and -1.0
    // denominator is ALL rows for every rule (consistent semantics):
    // 1 regex miss / 10 rows, not / 8 non-null
    assert(r("email_shape") === ((0.1, false)))
    assert(r("score_positive") === ((0.1, false)))
    assert(r("id_key") === ((0.2, false)))          // both id=7 rows
    assert(r("id_fk") === ((0.1, false)))           // id=9 orphan
  }

  test("a clean table passes every rule") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    val r = Quality.report(df, Seq(
      Quality.NotNull("tag_nn", "tag"),
      Quality.Unique("id_key", Seq("id"))))
      .collect()
    assert(r.forall(_.getBoolean(3)), r.mkString(";"))
    assert(r.forall(_.getDouble(1) === 0.0))
  }

  test("zero-tolerance fails on a violation below display rounding") {
    // 1 NULL in 3M rows: raw fraction 3.3e-7 rounds to metric 0.0 at 6
    // decimals, but ok must be decided on the RAW fraction — a
    // maxFrac=0 rule with any violation fails. (The admission-gate bug
    // class: rounding meant for display must not admit a bad batch.)
    val df = spark.range(3000000)
      .select(when($"id" === 0L, lit(null)).otherwise($"id").as("v"))
    val r = Quality.report(df, Seq(Quality.NotNull("v_nn", "v")))
      .collect().head
    assert(r.getDouble(1) === 0.0)     // displayed metric rounds to 0
    assert(r.getBoolean(3) === false)  // but the rule fails
  }

  test("empty input reports 0.0/ok=true for every rule kind") {
    val empty = Seq.empty[(Long, String)].toDF("id", "tag")
    val parent = Seq(1L).toDF("pid")
    val r = Quality.report(empty, Seq(
      Quality.NotNull("tag_nn", "tag"),
      Quality.InRange("id_range", "id", 0, 10),
      Quality.Matches("tag_shape", "tag", "^[a-z]+$"),
      Quality.Predicate("id_pos", $"id" < 0),
      Quality.Unique("id_key", Seq("id")),
      Quality.ForeignKey("id_fk", "id", parent, "pid")))
      .collect()
    assert(r.length === 6)
    // no branch may go NULL while another reports 0.0 — consumers
    // (Streams.qualityMonitor callbacks) read metric/ok unconditionally
    r.foreach { row =>
      assert(!row.isNullAt(1) && row.getDouble(1) === 0.0, row.toString)
      assert(!row.isNullAt(3) && row.getBoolean(3), row.toString)
    }
  }
}
