package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Tagging

/** The reference's end-to-end query surface over real nested block JSON:
  * the per-block token-flow ledger (hot path), pool detection (regex log
  * scan), and price derivation. Batch forms here; streaming wrappers in
  * [[graft.streaming.Streams]].
  *
  * Everything is one declarative plan per query — Spark distributes what
  * the reference hand-wove across processes/threads (SURVEY.md §3.1).
  */
object Rugpull {

  /** Parse raw block JSON lines (one getBlock response per line) with the
    * pruned explicit schema. */
  def parseBlocks(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(BlockSchema.block).json(path)

  /** [[parseBlocks]] with malformed-input accounting: returns (parsed
    * blocks, corrupt raw lines). The default PERMISSIVE read silently
    * nulls out a malformed block — on a real ingest feed that reads as
    * "empty block", and a systematic upstream corruption (truncated
    * uploads, encoding bugs) goes unnoticed. Here the corrupt raw text
    * is captured in a side output the pipeline can count, alert on, and
    * replay after a fix; the good side is byte-identical to
    * [[parseBlocks]] output. */
  def parseBlocksTolerant(spark: SparkSession, path: String)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val withCorrupt = spark.read
      .schema(BlockSchema.block.add("_corrupt_record",
        org.apache.spark.sql.types.StringType))
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // Spark requires referencing corrupt-record queries cached
    val good = withCorrupt.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val bad = withCorrupt.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw"))
    (good, bad)
  }

  /** The flagship token-flow ledger (SURVEY.md §0). Output schema matches
    * FIXTURES.md §4:
    * timestamp, wallet, signature, mint, pre_balance, post_balance,
    * baseVault, quoteVault, baseMint, quoteMint, base_price, quote_price.
    *
    * Semantics preserved from the reference:
    *  - tx qualifies iff any address in accountKeys ∪ writable ∪ readonly
    *    is watch-listed (hash semi-join, O20);
    *  - accountIndex addresses the concatenation accountKeys ++ writable
    *    ++ readonly (positional lookup join, O22);
    *  - row key = hot-address-at-index if present else balance owner (O23);
    *  - duplicate (wallet, mint) within a side: LAST occurrence wins (O24);
    *  - empty balance string ⇒ SQL NULL; row emitted iff either side
    *    non-empty (O25);
    *  - signature = blockTime-txIdx-1 (O26).
    *
    * @param blocks      parsed block DataFrame (schema [[BlockSchema.block]])
    * @param hot         watch-list dimension: column `addr`
    * @param watchlists  dimension (kind ∈ {BASE_VAULTS, QUOTE_VAULTS,
    *                    BASE_MINTS, QUOTE_MINTS}, addr)
    * @param prices      dimension (vault, side ∈ {base, quote}, price_usd)
    */
  def tokenFlows(blocks: DataFrame, hot: DataFrame, watchlists: DataFrame,
                 prices: DataFrame): DataFrame = {
    // Per-block identity: blockTime alone is NOT unique (Solana emits
    // multiple blocks per second at second resolution). Without it, two
    // blocks sharing a blockTime would merge their tx0/tx1/... into one
    // group — duplicate positional-map keys or silently fused balances.
    // The id must also be DETERMINISTIC under re-evaluation: this plan
    // branches (txs → hits, then txs ⋈ hits), and a non-deterministic id
    // (monotonically_increasing_id) re-evaluates independently per branch,
    // silently pairing hits with the wrong block after any upstream
    // repartition. A content hash is stable across re-evaluation; two
    // byte-identical blocks collapse into one group, which yields the
    // identical (deduplicated) ledger rows — idempotent re-ingest.
    // The surrogate signature stays blockTime-txIdx-1 (reference
    // behavior, which tolerates signature collisions) but grouping keys
    // include __block_id.
    // xxhash64 hashes the parsed struct natively — no to_json
    // serialization of multi-MB blocks, which would run once per plan
    // branch on the hot path.
    val txs = blocks
      .withColumn("__block_id", xxhash64(col("result.blockTime"),
        col("result.transactions")))
      .select(
        col("__block_id"),
        col("result.blockTime").as("timestamp"),
        posexplode(col("result.transactions")).as(Seq("txIdx", "tx")))
      .withColumn("allAddrs", concat(
        coalesce(col("tx.transaction.message.accountKeys"),
          array().cast("array<string>")),
        coalesce(col("tx.meta.loadedAddresses.writable"),
          array().cast("array<string>")),
        coalesce(col("tx.meta.loadedAddresses.readonly"),
          array().cast("array<string>"))))

    // Semi-join + positional lookup in ONE pass: explode addresses with
    // their index, broadcast-join the hot list, and fold the hits back
    // into a pos→addr map per tx. Transactions with no hit disappear at
    // the inner join — the reference's early-exit filter, distributed.
    val hotDim = broadcast(hot.select(col("addr").as("__hot_addr"))
      .distinct())
    val hits = txs.select(col("__block_id"), col("txIdx"),
        posexplode(col("allAddrs")).as(Seq("pos", "addr")))
      .join(hotDim, col("addr") === col("__hot_addr"), "inner")
      .groupBy(col("__block_id"), col("txIdx"))
      .agg(map_from_entries(collect_list(
        struct(col("pos"), col("addr")))).as("hotAt"))

    val hotTxs = txs.join(hits, Seq("__block_id", "txIdx"), "inner")

    // Side-tagged balance entries with their within-array position (the
    // LWW ordering key). Missing uiAmountString ⇒ null ⇒ treated like the
    // reference's empty string.
    def side(s: String, arr: Column): Column =
      coalesce(transform(arr, (b, i) => struct(
        lit(s).as("side"), i.as("entryIdx"),
        b.getField("accountIndex").as("accountIndex"),
        b.getField("mint").as("mint"),
        b.getField("owner").as("owner"),
        b.getField("uiTokenAmount").getField("uiAmountString").as("bal"))),
        array().cast(
          "array<struct<side:string,entryIdx:int,accountIndex:int," +
            "mint:string,owner:string,bal:string>>"))

    val entries = hotTxs.select(col("__block_id"), col("timestamp"),
        col("txIdx"), col("hotAt"),
        explode(concat(side("pre", col("tx.meta.preTokenBalances")),
          side("post", col("tx.meta.postTokenBalances")))).as("e"))
      .select(col("__block_id"), col("timestamp"), col("txIdx"),
        Tagging.coalesceKey(col("hotAt")(col("e.accountIndex")),
          col("e.owner")).as("wallet"),
        col("e.mint").as("mint"), col("e.side").as("side"),
        col("e.entryIdx").as("entryIdx"), col("e.bal").as("bal"))
      .filter(col("wallet").isNotNull)

    // O24: last-write-wins pre/post pivot — one hash aggregate with
    // map-side combine (no window sort, no join).
    val merged = entries
      .groupBy(col("__block_id"), col("timestamp"), col("txIdx"),
        col("wallet"), col("mint"))
      .agg(
        max_by(when(col("side") === "pre", coalesce(col("bal"), lit(""))),
          when(col("side") === "pre", col("entryIdx"))).as("pre_raw"),
        max_by(when(col("side") === "post", coalesce(col("bal"), lit(""))),
          when(col("side") === "post", col("entryIdx"))).as("post_raw"))
      .withColumn("pre_balance", Tagging.emptyToNull(col("pre_raw")))
      .withColumn("post_balance", Tagging.emptyToNull(col("post_raw")))
      .filter(col("pre_balance").isNotNull || col("post_balance").isNotNull)
      .withColumn("signature", Tagging.surrogateKey(col("timestamp"),
        col("txIdx"), lit("1")))

    // Enrichment: four membership tags + two price attaches, all
    // broadcast left joins against tiny dims (O29/O30).
    def tag(df: DataFrame, kind: String, keyCol: String,
            outName: String): DataFrame =
      Tagging.isinTagJoin(df, keyCol,
        watchlists.filter(col("kind") === kind), "addr", outName)

    def price(df: DataFrame, sideName: String, outName: String)
        : DataFrame = {
      val p = prices.filter(col("side") === sideName)
        .select(col("vault").as(s"__pv_$sideName"),
          col("price_usd").as(outName))
      df.join(broadcast(p),
        df("wallet") === col(s"__pv_$sideName"), "left_outer")
        .drop(s"__pv_$sideName")
    }

    val tagged = price(price(
      tag(tag(tag(tag(merged,
        "BASE_VAULTS", "wallet", "baseVault"),
        "QUOTE_VAULTS", "wallet", "quoteVault"),
        "BASE_MINTS", "mint", "baseMint"),
        "QUOTE_MINTS", "mint", "quoteMint"),
      "base", "base_price"), "quote", "quote_price")

    tagged.select(col("timestamp"), col("wallet"), col("signature"),
      col("mint"), col("pre_balance"), col("post_balance"),
      col("baseVault"), col("quoteVault"), col("baseMint"),
      col("quoteMint"), col("base_price"), col("quote_price"))
  }

  /** Pool-detection filter (O33): a tx qualifies if its joined log text
    * contains a watched program id AND matches `Instruction: <name>\b` for
    * one of that program's instruction names. Emits candidate txs with
    * their accountKeys for downstream metadata resolution. */
  def detectPools(blocks: DataFrame,
                  programs: Map[String, Seq[String]]): DataFrame = {
    val txs = blocks.select(col("result.blockTime").as("blockTime"),
        posexplode(col("result.transactions")).as(Seq("txIdx", "tx")))
      .withColumn("logText",
        array_join(coalesce(col("tx.meta.logMessages"),
          array().cast("array<string>")), " "))
    val cond = programs.map { case (prog, instrs) =>
      // empty instruction list matches NOTHING (an empty rlike pattern
      // would match everything); names are regex-quoted so a literal
      // like "Init(v2)" can't change the pattern's meaning. The
      // boundary is (?!\w), not \b: after a non-word final char like
      // ')' \b would REQUIRE a following word char, silently
      // unmatching exactly those quoted names.
      if (instrs.isEmpty) lit(false)
      else col("logText").contains(prog) &&
        col("logText").rlike(instrs.map(i =>
            "Instruction: " + java.util.regex.Pattern.quote(i) + "(?!\\w)")
          .mkString("|"))
    }.reduceOption(_ || _).getOrElse(lit(false))
    txs.filter(cond)
      .select(col("blockTime"), col("txIdx"),
        col("tx.transaction.message.accountKeys").as("accountKeys"))
  }

  /** Decimal enrichment of the ledger (SURVEY §7.4d): exact
    * DECIMAL(38,18) amounts and the per-row flow delta, computed
    * losslessly from the string balances. Kept OUT of [[tokenFlows]]'s
    * output so the FIXTURES.md §4 schema contract stays byte-identical
    * with the reference; analytical consumers opt in here. */
  def withDecimalBalances(ledger: DataFrame): DataFrame =
    ledger
      .withColumn("pre_amount", graft.Fns.toAmount(col("pre_balance")))
      .withColumn("post_amount", graft.Fns.toAmount(col("post_balance")))
      // subtraction of two DECIMAL(38,18) would need precision 39, so
      // Spark truncates the result scale to 17 — one digit lost. Casting
      // the operands to (37,18) first (one fewer integral digit, still
      // 10^19 whole tokens) makes the difference land exactly in (38,18).
      .withColumn("delta_amount",
        coalesce(col("post_amount"), lit(0)).try_cast("decimal(37,18)") -
          coalesce(col("pre_amount"), lit(0)).try_cast("decimal(37,18)"))

  /** Pool-metadata resolution contract (O6/O7): the reference resolves a
    * candidate tx's accountKeys through a REST API into the full 5-field
    * pool payload — pool_address, base/quote mint, base/quote vault
    * (reference: SERVER/combined_subscriber.py:78-84). The HTTP call is
    * out of engine scope, so resolution is PLUGGABLE: any transform from
    * [[detectPools]] candidates (blockTime, txIdx, accountKeys) to the
    * payload schema
    * (blockTime, pool_address, base_mint, quote_mint, base_vault,
    * quote_vault). [[stubResolver]] is the deterministic default used on
    * fixtures; a production deployment swaps in a resolver that joins a
    * REST-fed metadata table — nothing downstream changes.
    */
  type PoolResolver = DataFrame => DataFrame

  /** STUB resolver: reads the payload positionally out of accountKeys.
    * Deterministic and total (missing positions ⇒ NULL); candidates
    * without a resolvable pool_address are dropped, like a failed REST
    * lookup in the reference. */
  val stubResolver: PoolResolver = cands =>
    cands.select(col("blockTime"),
        try_element_at(col("accountKeys"), lit(1)).as("pool_address"),
        try_element_at(col("accountKeys"), lit(2)).as("base_mint"),
        try_element_at(col("accountKeys"), lit(3)).as("quote_mint"),
        try_element_at(col("accountKeys"), lit(4)).as("base_vault"),
        try_element_at(col("accountKeys"), lit(5)).as("quote_vault"))
      .filter(col("pool_address").isNotNull)

  /** Explode a 5-field pool-registry snapshot into the (kind, addr)
    * watch-list dimension [[tokenFlows]] consumes — the SURVEY §3.2 loop:
    * detected pools feed the next micro-batch's vault/mint tagging. */
  def registryToWatchlists(registry: DataFrame): DataFrame =
    registry.select(explode(array(
        struct(lit("BASE_VAULTS").as("kind"), col("base_vault").as("addr")),
        struct(lit("QUOTE_VAULTS").as("kind"), col("quote_vault").as("addr")),
        struct(lit("BASE_MINTS").as("kind"), col("base_mint").as("addr")),
        struct(lit("QUOTE_MINTS").as("kind"), col("quote_mint").as("addr"))))
        .as("e"))
      .select(col("e.kind").as("kind"), col("e.addr").as("addr"))
      .filter(col("addr").isNotNull)
      .distinct()

  /** Pool freshness filter (O34): keep pools opened within `windowSec` of
    * `now` (an explicit column, not wall-clock, for determinism). */
  def freshPools(pools: DataFrame, now: Column,
                 windowSec: Long = 300L): DataFrame =
    pools.filter(now - col("openTime") <= windowSec)

  /** Price derivation (O37/O38): quote USD price from base USD and the
    * native pair price, guarded against zero/empty. */
  def derivedQuotePrice(baseUsd: Column, priceNative: Column): Column = {
    // try_cast: empty/malformed price strings degrade to 0.0 instead of
    // failing the job under ANSI mode (reference: float(str or 0)).
    val native = coalesce(priceNative.try_cast("double"), lit(0.0))
    val base = coalesce(baseUsd.try_cast("double"), lit(0.0))
    when(native > 0, base / native).otherwise(0.0)
  }
}
