package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The connector contracts, proven on the physical plan — not on the
  * connector's word: height filters prune PLANNED PARTITIONS (not just
  * rows), pruned projections reach the reader as a narrow schema, and
  * the generated content matches an independent replay of the formula.
  */
class BlocksSourceSpec extends SparkSpec {
  import spark.implicits._

  private def blocks(n: Long, shards: Int) = spark.read
    .format(classOf[BlocksSource].getName)
    .option("blocks", n.toString).option("shards", shards.toString)
    .load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("content matches the formula, full scan") {
    val got = blocks(1000, 4).collect()
    assert(got.length === 1000)
    val h = 937L
    val row = got.find(_.getLong(0) == h).get
    assert(row.getLong(1) === BlocksSource.GENESIS + 12 * h)
    assert(row.getLong(2) === BlocksSource.nTx(h))
    assert(row.getLong(3) === BlocksSource.feeCents(h))
    assert(row.getString(4) === BlocksSource.miner(h))
  }

  test("height range filters prune planned partitions AND rows") {
    val df = blocks(10000, 8).filter($"height" >= 5000L &&
      $"height" < 6250L)
    // 8 shards of 1250 heights; [5000, 6250) is exactly shard 4
    assert(scanOf(df).inputRDD.getNumPartitions === 1,
      "pushdown must prune 7 of 8 shards")
    val rows = df.agg(count(lit(1)), min($"height"), max($"height"))
      .collect()(0)
    assert(rows.getLong(0) === 1250L)
    assert(rows.getLong(1) === 5000L && rows.getLong(2) === 6249L)
  }

  test("equality filter plans exactly one single-height partition") {
    val df = blocks(10000, 8).filter($"height" === 7777L)
    assert(scanOf(df).inputRDD.getNumPartitions === 1)
    val got = df.collect()
    assert(got.length === 1 && got(0).getLong(0) === 7777L)
  }

  test("non-height filters stay residual and still apply") {
    val df = blocks(2000, 4).filter($"miner" === "m13")
    // residual filter: all 4 partitions planned, Spark filters rows
    assert(scanOf(df).inputRDD.getNumPartitions === 4)
    val got = df.select($"height").as[Long].collect().sorted
    assert(got.toSeq === (0L until 2000L).filter(_ % 97 == 13))
  }

  test("micro-batch stream: rate-limited triggers cover every height " +
      "exactly once") {
    val q = spark.readStream
      .format(classOf[BlocksSource].getName)
      .option("blocks", "1000").option("shards", "4")
      .option("perTrigger", "100")
      .load()
      .writeStream.format("memory").queryName("blocks_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("blocks_stream")
        .select($"height").as[Long].collect().sorted
      assert(got.toSeq === (0L until 1000L),
        "every height exactly once, no gaps, no dupes")
      assert(q.recentProgress.count(_.numInputRows > 0) >= 10,
        "admission control must split the feed into >= 10 batches")
    } finally q.stop()
  }

  test("micro-batch stream: checkpoint restart does not re-emit " +
      "committed blocks") {
    // memory sink refuses checkpoint recovery; foreachBatch is the
    // recovery-capable sink, counting emitted rows per run
    val ckpt = java.nio.file.Files
      .createTempDirectory("blocks-ckpt").toString
    val emitted = new java.util.concurrent.atomic.AtomicLong(0)
    def start() = spark.readStream
      .format(classOf[BlocksSource].getName)
      .option("blocks", "500").option("shards", "2")
      .option("perTrigger", "200")
      .load()
      .writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        emitted.addAndGet(batch.count()): Unit)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(emitted.get() === 500L)
    } finally q1.stop()
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(emitted.get() === 500L,
        "restarted query must resume at the committed offset, " +
          s"not re-emit (saw ${emitted.get()})")
    } finally q2.stop()
  }

  test("column pruning reaches the reader schema") {
    val df = blocks(1000, 2).select($"height", $"fee_cents")
    assert(scanOf(df).schema.fieldNames.toSeq ===
      Seq("height", "fee_cents"))
    assert(df.agg(sum($"fee_cents")).collect()(0).getLong(0) ===
      (0L until 1000L).map(BlocksSource.feeCents).sum)
  }
}
