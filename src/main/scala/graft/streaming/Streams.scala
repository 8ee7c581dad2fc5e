package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.domain.{BlockSchema, Rugpull}

/** Structured Streaming forms of the reference's pipelines. The reference
  * hand-built micro-batching (shared-memory mailbox + poll loops, SURVEY.md
  * §1.1); here each arriving block file is a micro-batch and backpressure,
  * retries and exactly-once sink semantics come from the engine.
  */
object Streams {

  /** Price event for stateful change suppression (shape of the reference's
    * prices_channel payloads). */
  case class PriceEvent(pair: String, ts: Long, basePrice: Double,
                        quotePrice: Double)

  /** Streaming token-flow ledger: watch a directory for block JSON files,
    * run the flagship query per micro-batch, hand each batch to `sink`.
    * Dimensions are re-read per batch via the closure — the stream–static
    * join semantics of the reference (dims re-fetched every chunk, O9).
    */
  def tokenFlowsStream(spark: SparkSession, blocksDir: String,
                       hot: DataFrame, watchlists: DataFrame,
                       prices: DataFrame)
                      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val blocks = spark.readStream
      .schema(BlockSchema.block)
      .option("maxFilesPerTrigger", 1) // one block file per micro-batch
      .json(blocksDir)
    blocks.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(Rugpull.tokenFlows(batch, hot, watchlists, prices), id)
      }
      .start()
  }

  /** Stateful change suppression (exact reference semantics, O35): emit a
    * price event iff the pair is unseen or base/quote moved >`threshold`
    * relative to the LAST EMITTED event. State = last emitted prices per
    * pair. Works on both streaming and batch Datasets (same code path).
    */
  def suppressPrices(events: Dataset[PriceEvent], threshold: Double)
      : Dataset[PriceEvent] = {
    import events.sparkSession.implicits._

    def moved(prev: Double, cur: Double): Boolean =
      math.abs(cur - prev) > math.abs(prev) * threshold

    events.groupByKey(_.pair)
      .flatMapGroupsWithState[(Double, Double), PriceEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state: GroupState[(Double, Double)]) =>
          // within a batch, process in event order
          val sorted = rows.toSeq.sortBy(e => (e.ts, e.pair))
          val out = Seq.newBuilder[PriceEvent]
          var last = state.getOption
          sorted.foreach { e =>
            val emit = last match {
              case None => true
              case Some((b, q)) =>
                moved(b, e.basePrice) || moved(q, e.quotePrice)
            }
            if (emit) {
              out += e
              last = Some((e.basePrice, e.quotePrice))
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Windowed event-time aggregation with a watermark — the general
    * streaming aggregation the reference lacked (SURVEY.md §2.4): counts
    * and value sums per tumbling window per key, late data bounded by the
    * watermark. */
  def windowedEventStats(events: DataFrame, tsCol: String, keyCol: String,
                         valueCol: String, window_ : String,
                         watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))

  /** Session-window aggregation with a watermark — the streaming-native
    * form of the batch sessionization (q37). Sessions merge as events
    * arrive; a session is finalized (and emitted, in append mode) once
    * the watermark passes its close. State per key is bounded by the
    * watermark horizon — the property that lets sessionization run
    * forever on an unbounded stream. */
  def sessionStats(events: DataFrame, tsCol: String, keyCol: String,
                   valueCol: String, gap: String, watermark: String)
      : DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col(keyCol), col("w.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** The SURVEY §3.2 dimension-build pipeline, streaming form: watch the
    * block stream, regex-detect pool-creation transactions (O33), and
    * upsert the candidates into a parquet registry snapshot via
    * [[graft.operators.Registry.snapshotUpserter]] — the Spark analog of
    * the reference's regex-scan → Redis SADD side process. The main
    * ledger query then re-reads the snapshot per micro-batch (O9
    * semantics). */
  def poolRegistryStream(spark: SparkSession, blocksDir: String,
                         programs: Map[String, Seq[String]],
                         registryPath: String,
                         resolver: Rugpull.PoolResolver =
                           Rugpull.stubResolver): StreamingQuery = {
    val blocks = spark.readStream
      .schema(BlockSchema.block)
      .option("maxFilesPerTrigger", 1)
      .json(blocksDir)
    val upsert = graft.operators.Registry.snapshotUpserter(
      registryPath, Seq("pool_address"), "blockTime")
    blocks.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // detect → resolve (pluggable; REST in the reference, stub here)
        // → upsert the 5-field payload keyed on pool_address
        upsert(resolver(Rugpull.detectPools(batch, programs)), id)
      }
      .start()
  }

  /** Streaming exact dedup with bounded state: duplicates of the same
    * keys arriving within the watermark horizon are dropped; state for
    * old keys is evicted once the watermark passes — the property that
    * lets exact dedup run forever on an unbounded stream. */
  def streamingDedup(df: DataFrame, keyCols: Seq[String], tsCol: String,
                     watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Watermarked stream–stream interval join: each left event pairs with
    * right events of the same key whose event time is within
    * [leftTs - lookback, leftTs]. Both sides need watermarks so the
    * engine can bound join state — the scale property that matters with
    * unbounded streams. Columns: left(key, lts, ...), right(key, rts,
    * ...); caller ensures distinct names apart from the key. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String, lookback: String,
                   watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
      .withColumnRenamed(keyCol, s"__r_$keyCol")
    l.join(r, expr(
      s"""$keyCol = __r_$keyCol AND
         |$rightTs >= $leftTs - INTERVAL $lookback AND
         |$rightTs <= $leftTs""".stripMargin))
      .drop(s"__r_$keyCol")
  }
}
