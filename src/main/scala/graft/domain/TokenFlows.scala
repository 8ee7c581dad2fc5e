package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Fns, Tables}
import graft.operators.{Joins, Tagging}

/** The flagship "token-flow ledger" re-expressed over the driver's star
  * schema (SURVEY.md §7.2): the reference's hot path emits, per watched
  * transaction, one row per (wallet, mint) with pre/post balances, vault/
  * mint tags and attached USD prices. Here: per (user, event_type) with
  * first/last observed value, membership tags and an attached per-type
  * "price" dimension.
  *
  * Pipeline shape (one shuffle on (user_id, event_type), everything else
  * broadcast):
  *   semi-join fact→watch-list (O20) → first/last pivot (O24) → emit filter
  *   (O25) → surrogate key (O26) → isin tags (O29) → broadcast price attach
  *   (O30) → ordered projection (O31).
  */
object TokenFlows {

  private val baseTypes  = Seq("purchase", "click")
  private val quoteTypes = Seq("view", "signup")

  def eventLedger(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)

    // Watch-list dimension: deterministic subset of users. Built as a
    // DataFrame (not a collected literal) — at 100 TB the watch-list is a
    // table you broadcast, not an InSet you inline.
    val watch = e.select(col("user_id")).distinct()
      .filter(col("user_id") % 7 === 0)

    val fact = Joins.semiFilter(e, "user_id", watch, "user_id")

    // First/last value per (user, event_type): single hash aggregate with
    // map-side partial combine; ties broken by event_id (last-write-wins).
    val ord = struct(col("ts"), col("event_id"))
    val merged = fact.groupBy(col("user_id"), col("event_type")).agg(
      min_by(col("value"), ord).as("pre_value"),
      max_by(col("value"), ord).as("post_value"),
      count(lit(1)).as("n_events"))

    // Per-type price dimension derived from the full fact table, then
    // broadcast back — the stream–static dim join of the reference, made
    // deterministic (snapshot semantics; SURVEY.md §3.3).
    val prices = e.groupBy(col("event_type"))
      .agg(Fns.roundU(avg(col("value")), 2).as("price"))

    val withDims = Joins.attachDim(merged, "event_type", prices,
      "event_type", Seq("price"))

    withDims
      .filter(col("pre_value").isNotNull || col("post_value").isNotNull)
      .withColumn("signature",
        Tagging.surrogateKey(col("user_id"), col("event_type"), lit("1")))
      .withColumn("base_tag",
        Tagging.isinTag(col("event_type"), baseTypes))
      .withColumn("quote_tag",
        Tagging.isinTag(col("event_type"), quoteTypes))
      .select(col("user_id"), col("event_type"), col("signature"),
        col("pre_value"), col("post_value"), col("n_events"),
        col("base_tag"), col("quote_tag"), col("price"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** DuckDB oracle for [[eventLedger]] — identical semantics in ANSI SQL. */
  val eventLedgerOracle: String =
    """WITH f AS (SELECT * FROM events WHERE user_id % 7 = 0),
      |ranked AS (
      |  SELECT user_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts ASC, event_id ASC) AS rna,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts DESC, event_id DESC) AS rnd
      |  FROM f),
      |merged AS (
      |  SELECT user_id, event_type,
      |    max(CASE WHEN rna = 1 THEN value END) AS pre_value,
      |    max(CASE WHEN rnd = 1 THEN value END) AS post_value,
      |    count(*) AS n_events
      |  FROM ranked GROUP BY user_id, event_type),
      |prices AS (
      |  SELECT event_type, floor((avg(value)) * 100 + 0.5) / 100.0 AS price
      |  FROM events GROUP BY event_type)
      |SELECT m.user_id, m.event_type,
      |  concat(m.user_id, '-', m.event_type, '-', '1') AS signature,
      |  m.pre_value, m.post_value, m.n_events,
      |  CASE WHEN m.event_type IN ('purchase','click')
      |       THEN m.event_type END AS base_tag,
      |  CASE WHEN m.event_type IN ('view','signup')
      |       THEN m.event_type END AS quote_tag,
      |  p.price
      |FROM merged m LEFT JOIN prices p USING (event_type)
      |WHERE m.pre_value IS NOT NULL OR m.post_value IS NOT NULL
      |ORDER BY m.user_id, m.event_type""".stripMargin
}
