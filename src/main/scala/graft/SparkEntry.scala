package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators._
import graft.domain.TokenFlows

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry is a pure (SparkSession, sfDir) => DataFrame over the
  * driver-provided star schema, paired (where SQL-expressible) with an ANSI
  * SQL oracle run by DuckDB on the same parquet tables. Column names and row
  * ordering are aligned between the two on purpose: the driver sorts columns
  * by name before hashing values.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.2 token-flow slice) on sf0.001; driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TokenFlows.eventLedger(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Queries. Names are stable ids the judge matches against SURVEY.md §2.
  // ---------------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O24/O27-family: hash aggregate with partial (map-side) combine.
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2)
            .as("sum_disc_price"),
          round(avg($"l_quantity"), 2).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // Predicate + projection pushed to the parquet scan (PushedFilters).
    "q02_filter_pushdown" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1996-01-01").cast("timestamp") &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
          $"l_quantity" < 24)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          round($"l_extendedprice" * $"l_discount", 4).as("revenue"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // 3-way join: broadcast customer/orders dims into the lineitem fact.
    "q03_join_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2)
            .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy($"c_mktsegment")
    }),

    // O20: broadcast LEFT SEMI join (EXISTS).
    "q04_semi_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val bigDisc = Tables.lineitem(s, d).filter($"l_discount" > lit(0.08))
      Joins.semiFilter(o, "o_orderkey", bigDisc, "l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 2).as("sum_price"))
        .orderBy($"o_orderpriority")
    }),

    // LEFT ANTI join (NOT EXISTS).
    "q05_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val jumbo = Tables.orders(s, d).filter($"o_totalprice" > 450000)
      Joins.antiFilter(c, "c_custkey", jumbo, "o_custkey")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    }),

    // O24+O25: pre/post FULL OUTER merge with last-write-wins, single hash
    // aggregate (mergeAgg) — view events are the 'pre' side, purchase the
    // 'post' side, latest per (user, side) wins.
    "q06_prepost_merge" -> ((s, d) => {
      val e = Tables.events(s, d)
      val tagged = e
        .filter($"event_type".isin("view", "purchase"))
        .withColumn("side",
          when($"event_type" === "view", "pre").otherwise("post"))
      val merged = PrePostMerge.mergeAgg(tagged, Seq("user_id"), "side",
        "value", struct($"ts", $"event_id"))
      PrePostMerge.eitherPresent(merged)
        .orderBy($"user_id")
    }),

    // Window ranking: top-3 orders by totalprice per priority class.
    "q07_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"o_orderpriority", $"rk", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderpriority", $"rk")
    }),

    // O35 batch form: lag-window change suppression (>10% relative move).
    "q08_change_suppression" -> ((s, d) => {
      ChangeSuppression.lagFilter(
          Tables.events(s, d).filter($"event_type" === "purchase"),
          "user_id", struct($"ts", $"event_id"), "value", 0.1)
        .select($"user_id", $"event_id", $"value")
        .orderBy($"user_id", $"event_id")
    }),

    // Distinct aggregation (exact). Approx variant is a separate
    // rows-only query (HLL implementations differ across engines).
    "q09_distinct_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    }),

    // Grouping sets / ROLLUP with explicit null-first ordering.
    "q10_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // Global sort + limit (top-k). TakeOrderedAndProject, not a full sort.
    "q11_sort_limit" -> ((s, d) => {
      Tables.lineitem(s, d)
        .orderBy($"l_extendedprice".desc, $"l_orderkey".asc,
          $"l_linenumber".asc)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .limit(10)
    }),

    // Set operations: INTERSECT / EXCEPT on user sets.
    "q12_setops" -> ((s, d) => {
      val e = Tables.events(s, d)
      def users(t: String, minV: Double) =
        e.filter($"event_type" === t && $"value" > minV)
          .select($"user_id").distinct()
      users("click", 90).intersect(users("purchase", 90))
        .except(users("error", 97))
        .orderBy($"user_id")
    }),

    // Flagship: the SURVEY §7.2 token-flow slice (semi-join → pre/post
    // merge → tags → broadcast price attach → projection).
    "q13_tokenflow" -> ((s, d) => TokenFlows.eventLedger(s, d)),

    // String scalar functions (O16/O18/O26/O33 family): regex extract,
    // split-count, substring, concat, case transforms.
    "q14_strings" -> ((s, d) => {
      Tables.documents(s, d)
        .select($"doc_id",
          regexp_extract($"text", "^(\\w+)", 1).as("first_word"),
          size(split($"text", " ")).as("n_words"),
          upper(substring($"source", 1, 3)).as("src3"),
          concat($"lang", lit(":"), $"source").as("lang_src"),
          (instr($"text", "spark") > 0).as("mentions_spark"),
          length($"text").as("len"))
        .orderBy($"doc_id")
    }),

    // Date/time scalar functions (O28/O34 family).
    "q15_dates" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(year($"o_orderdate").as("yr"),
          month($"o_orderdate").as("mo"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 2).as("sum_price"))
        .orderBy($"yr", $"mo")
    }),

    // JSON extraction (§2.2 collapsed): props is a JSON string column.
    "q16_json" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k_val", get_json_object($"props", "$.k").cast("int"))
        .groupBy($"k_val")
        .agg(count(lit(1)).as("n"), round(avg($"value"), 2).as("avg_value"))
        .orderBy($"k_val")
    }),

    // O22: positional join — per-user event sequence with position index
    // (collect sorted → posexplode; oracle = row_number - 1).
    "q17_positional" -> ((s, d) => {
      val e = Tables.events(s, d).filter($"user_id" < 20)
      e.groupBy($"user_id")
        .agg(sort_array(collect_list(
          struct($"ts", $"event_id", $"event_type"))).as("seq"))
        .select($"user_id", posexplode($"seq").as(Seq("pos", "ev")))
        .select($"user_id", $"pos", $"ev.event_type".as("event_type"),
          $"ev.event_id".as("event_id"))
        .orderBy($"user_id", $"pos")
    }),

    // As-of join: each click sees the latest prior-or-simultaneous
    // purchase value of the same user. Sort-based single-pass (no per-row
    // range probe) — the formulation that survives 100× scale.
    "q18_asof_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id", $"value")
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"value")
      Joins.asOfJoin(clicks, purchases, "user_id", "ts", "value",
          "last_purchase", $"event_id")
        .select($"user_id", $"event_id", $"value", $"last_purchase")
        .orderBy($"user_id", $"event_id")
    }),

    // Range join with an equi-key prefilter: lineitems shipped within 30
    // days of their order's date (hash join + residual range predicate).
    "q19_range_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      Joins.rangeJoin(li, o, li("l_orderkey") === o("o_orderkey"),
          li("l_shipdate"), o("o_orderdate"),
          o("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(year($"o_orderdate").as("yr"))
        .agg(count(lit(1)).as("n_fast_lines"),
          round(sum($"l_extendedprice"), 2).as("sum_price"))
        .orderBy($"yr")
    }),

    // Skew-safe salted join (result identical to the plain equi-join):
    // events (5-key skew) against a per-type dim derived from itself.
    "q20_salted_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val dim = e.groupBy($"event_type")
        .agg(round(avg($"value"), 2).as("price"))
      Joins.saltedJoin(e, "event_type", $"event_id", dim, "event_type", 8)
        .groupBy($"event_type", $"price")
        .agg(count(lit(1)).as("n"))
        .orderBy($"event_type")
    }),

    // O37/O38: guarded derived scalars (div-by-zero defaulting, casts).
    "q21_scalars" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter($"l_orderkey" % 997 === 0)
        .select($"l_orderkey", $"l_linenumber",
          round($"l_extendedprice" * (lit(1) - $"l_discount") *
            (lit(1) + $"l_tax"), 2).as("charge"),
          when($"l_discount" > 0, round($"l_tax" / $"l_discount", 4))
            .otherwise(0.0).as("tax_ratio"),
          $"l_quantity".cast("int").as("qty_int"))
        .orderBy($"l_orderkey", $"l_linenumber")
    })
  )

  // ---------------------------------------------------------------------
  // DuckDB oracles. Same column names, same ORDER BY as the Spark side.
  // Sums of integer-typed columns are cast to BIGINT (DuckDB widens to
  // HUGEINT); doubles are rounded identically on both sides.
  // ---------------------------------------------------------------------
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  round(l_extendedprice * l_discount, 4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_agg" ->
      """SELECT c_mktsegment,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q05_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "q06_prepost_merge" ->
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN event_type = 'view' THEN 'pre' ELSE 'post' END AS side
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |ranked AS (
        |  SELECT user_id, side, value, row_number() OVER (
        |    PARTITION BY user_id, side ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM tagged)
        |SELECT user_id,
        |  max(CASE WHEN side = 'pre' AND rn = 1 THEN value END) AS pre_value,
        |  max(CASE WHEN side = 'post' AND rn = 1 THEN value END) AS post_value
        |FROM ranked GROUP BY user_id
        |HAVING pre_value IS NOT NULL OR post_value IS NOT NULL
        |ORDER BY user_id""".stripMargin,

    "q07_topk_per_group" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice, row_number()
        |    OVER (PARTITION BY o_orderpriority
        |          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 3
        |ORDER BY o_orderpriority, rk""".stripMargin,

    "q08_change_suppression" ->
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value, lag(value) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events WHERE event_type = 'purchase')
        |WHERE prev IS NULL OR abs(value - prev) > abs(prev) * 0.1
        |ORDER BY user_id, event_id""".stripMargin,

    "q09_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q10_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,

    "q11_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 10""".stripMargin,

    "q12_setops" ->
      """(SELECT DISTINCT user_id FROM events
        |   WHERE event_type = 'click' AND value > 90
        | INTERSECT
        | SELECT DISTINCT user_id FROM events
        |   WHERE event_type = 'purchase' AND value > 90)
        |EXCEPT
        |SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'error' AND value > 97
        |ORDER BY user_id""".stripMargin,

    "q13_tokenflow" -> TokenFlows.eventLedgerOracle,

    "q14_strings" ->
      """SELECT doc_id,
        |  regexp_extract(text, '^(\w+)', 1) AS first_word,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |  upper(substr(source, 1, 3)) AS src3,
        |  concat(lang, ':', source) AS lang_src,
        |  (strpos(text, 'spark') > 0) AS mentions_spark,
        |  CAST(length(text) AS INT) AS len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q15_dates" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,

    "q16_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        |  count(*) AS n, round(avg(value), 2) AS avg_value
        |FROM events GROUP BY 1 ORDER BY k_val""".stripMargin,

    "q17_positional" ->
      """SELECT user_id,
        |  CAST(row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) - 1 AS INT) AS pos,
        |  event_type, event_id
        |FROM events WHERE user_id < 20 ORDER BY user_id, pos""".stripMargin,

    "q18_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT *, last_value(CASE WHEN side = 0 THEN value END
        |      IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, side
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_purchase
        |  FROM u)
        |SELECT user_id, event_id, value, last_purchase FROM w
        |WHERE side = 1 ORDER BY user_id, event_id""".stripMargin,

    "q19_range_join" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  count(*) AS n_fast_lines,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY 1 ORDER BY yr""".stripMargin,

    "q20_salted_join" ->
      """WITH dim AS (SELECT event_type, round(avg(value), 2) AS price
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, d.price, count(*) AS n
        |FROM events e JOIN dim d ON e.event_type = d.event_type
        |GROUP BY 1, 2 ORDER BY e.event_type""".stripMargin,

    "q21_scalars" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2)
        |    AS charge,
        |  CASE WHEN l_discount > 0 THEN round(l_tax / l_discount, 4)
        |       ELSE 0.0 END AS tax_ratio,
        |  CAST(l_quantity AS INT) AS qty_int
        |FROM lineitem WHERE l_orderkey % 997 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )

  // sugar so the query bodies read like notebook Spark
  private implicit class Sym(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }
}
