package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** Long-haul soak tests: run each stateful stream for 50+ micro-batches
  * and assert the STATE STORE stays bounded — the state-leak class
  * (watermark never evicting, per-key state growing with events) that a
  * 2-batch parity test can't catch. The bound asserted is the design's
  * own: drainAlerts keys × O(1), priceBars open-windows-only,
  * streamingDedup keys-within-watermark-only.
  */
class SoakSpec extends SparkSpec {
  import spark.implicits._

  /** Atomic drop into a stream-watched directory (see StreamsSpec), with
    * an EXPLICIT strictly-increasing mtime: FileStreamSource orders
    * pending files by modification time, and 55 files written in one
    * tight loop all land in the same millisecond — leaving the
    * micro-batch order to tie-break luck, which scrambles event-time
    * order and fails watermark-dependent assertions nondeterministically. */
  private def dropFile(dir: java.io.File, name: String, seq: Int,
                       content: String): Unit = {
    val tmp = Files.createTempFile(dir.toPath.getParent, s".$name", ".tmp")
    Files.writeString(tmp, content)
    val target = dir.toPath.resolve(name)
    Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    Files.setLastModifiedTime(target,
      java.nio.file.attribute.FileTime.fromMillis(1700000000000L + seq * 10000L))
  }

  /** Last progress that actually carried state metrics, total state rows
    * across operators, and the number of micro-batches the query ran. */
  private def stateRowsAndBatches(q: StreamingQuery): (Long, Long) = {
    val withState = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(withState.nonEmpty, "no stateful progress recorded")
    val last = withState.last
    (last.stateOperators.map(_.numRowsTotal).sum,
      q.recentProgress.map(_.batchId).max + 1)
  }

  test("soak drainAlerts: 50+ batches, state stays #keys × O(1)") {
    val dir = Files.createTempDirectory("soak-drain").toFile
    val keys = Seq("p1", "p2", "p3", "p4")
    // 55 batches alternating collapse (drop 70% from peak) and recovery
    // — each key re-arms and re-alerts continuously, the worst case for
    // a state-per-alert leak
    (0 until 55).foreach { b =>
      val bal = if (b % 2 == 0) 100.0 else 30.0
      dropFile(dir, f"b$b%03d.json", b, keys.map(k =>
        s"""{"key":"$k","ts":$b,"balance":$bal}""").mkString("\n"))
    }
    val stream = spark.readStream
      .schema("key STRING, ts LONG, balance DOUBLE")
      .option("maxFilesPerTrigger", 1).json(dir.getAbsolutePath)
      .as[Streams.BalanceEvent]
    val q = Streams.drainAlerts(stream, threshold = 0.5)
      .writeStream.format("memory").queryName("soak_drains")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val (stateRows, batches) = stateRowsAndBatches(q)
      assert(batches >= 50, s"only $batches micro-batches ran")
      // state is exactly one row per key — NOT per event (220 events)
      // or per alert (~27 per key)
      assert(stateRows === keys.length.toLong,
        s"state grew to $stateRows rows for ${keys.length} keys")
      // the stream really did keep alerting (re-arm works across the
      // whole run): one alert per collapse batch per key
      val alerts = spark.table("soak_drains").count()
      assert(alerts === 27L * keys.length, s"alerts=$alerts")
    } finally q.stop()
  }

  test("soak debounceStream: 55 batches, state is exactly one scalar " +
      "per key and decisions chain across the whole run") {
    val dir = Files.createTempDirectory("soak-debounce").toFile
    // 6 keys, 4 events per key per batch at 100 s spacing, window
    // 250 s: every decision depends on the previous KEPT timestamp,
    // so a state reset anywhere in 55 batches would flip later keeps
    (0 until 55).foreach { b =>
      val lines = (0 until 6).flatMap { k =>
        (0 until 4).map { j =>
          val ts = (b * 4 + j) * 100L
          val id = (b * 24 + k * 4 + j).toLong
          s"""{"key":$k,"ts":$ts,"id":$id}"""
        }
      }
      dropFile(dir, f"b$b%03d.json", b, lines.mkString("\n"))
    }
    val stream = spark.readStream
      .schema("key LONG, ts LONG, id LONG")
      .option("maxFilesPerTrigger", 1).json(dir.getAbsolutePath)
      .as[Streams.StampedEvent]
    val q = Streams.debounceStream(stream, 250L)
      .writeStream.format("memory").queryName("soak_debounce")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val (stateRows, batches) = stateRowsAndBatches(q)
      assert(batches >= 50, s"only $batches micro-batches ran")
      assert(stateRows === 6L,
        s"state grew to $stateRows rows for 6 keys")
      // 100 s spacing under a 250 s window keeps every 3rd event:
      // 220 timestamps per key → ceil(220/3) = 74 keeps
      val kept = spark.table("soak_debounce")
        .groupBy($"key").agg(org.apache.spark.sql.functions
          .sum($"kept".cast("long")).as("nk"))
        .collect().map(_.getLong(1)).toSeq
      assert(kept === Seq.fill(6)(74L), s"per-key keeps: $kept")
    } finally q.stop()
  }

  test("soak priceBars: 55 hourly batches, only open windows in state") {
    val dir = Files.createTempDirectory("soak-bars").toFile
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    // one batch per hour-window, two trades each, event time advancing
    // monotonically — the watermark must finalize and EVICT every closed
    // window, or state grows by one row per hour forever
    (0 until 55).foreach { b =>
      val t1 = base.plusSeconds(b * 3600L + 300)
      val t2 = base.plusSeconds(b * 3600L + 2400)
      dropFile(dir, f"b$b%03d.json", b, Seq(
        s"""{"pair":"p1","id":${b * 2L},"ts":"$t1","value":${b + 1}.0}""",
        s"""{"pair":"p1","id":${b * 2L + 1},"ts":"$t2","value":${b + 2}.0}""")
        .mkString("\n"))
    }
    val stream = spark.readStream
      .schema("pair STRING, id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", 1).json(dir.getAbsolutePath)
    val q = Streams.priceBars(stream, "ts", "pair", "id", "value",
        bar = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("soak_bars")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val (stateRows, batches) = stateRowsAndBatches(q)
      assert(batches >= 50, s"only $batches micro-batches ran")
      // every closed window evicted: state holds the still-open tail
      // (the current window, plus at most a not-yet-cleaned neighbor),
      // not the 55 windows the stream produced
      assert(stateRows <= 4, s"state held $stateRows window rows")
      // 54 of the 55 windows are past the final watermark and emitted
      assert(spark.table("soak_bars").count() === 54)
    } finally q.stop()
  }

  test("soak streamingDedup: 55 batches, closed-watermark keys evicted") {
    val dir = Files.createTempDirectory("soak-dedup").toFile
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    // 5 fresh keys per batch (each written twice — the dup to drop),
    // event time advancing one minute per batch, watermark 5 minutes:
    // state may hold only the last ~6 minutes of keys, never all 275
    (0 until 55).foreach { b =>
      val ts = base.plusSeconds(b * 60L)
      val rows = (0 until 5).flatMap { i =>
        val line = s"""{"k":"k${b}_$i","ts":"$ts"}"""
        Seq(line, line)
      }
      dropFile(dir, f"b$b%03d.json", b, rows.mkString("\n"))
    }
    val stream = spark.readStream
      .schema("k STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1).json(dir.getAbsolutePath)
    val q = Streams.streamingDedup(stream, Seq("k"), "ts", "5 minutes")
      .writeStream.format("memory").queryName("soak_dedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val (stateRows, batches) = stateRowsAndBatches(q)
      assert(batches >= 50, s"only $batches micro-batches ran")
      // 275 distinct keys passed through; watermark eviction must cap
      // state at the in-horizon tail (5 min watermark + trigger slack)
      assert(stateRows <= 50, s"state held $stateRows of 275 keys")
      // each key emitted exactly once (its duplicate dropped)
      assert(spark.table("soak_dedup").count() === 275)
      assert(spark.table("soak_dedup").select("k").distinct().count()
        === 275)
    } finally q.stop()
  }

  test("swapSnapshot crash-safety: an interrupt at every mid-swap point " +
      "recovers to old or new state, never torn and never empty-reset") {
    import org.apache.hadoop.fs.Path
    import graft.operators.Registry
    val dir = Files.createTempDirectory("graft-swap-kill").toFile
    val snap = s"${dir.getAbsolutePath}/reg"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val upserter = Registry.snapshotUpserter(snap, Seq("k"), "ts")
    def batch(rows: (String, Double, Long)*) =
      rows.toSeq.toDF("k", "v", "ts")
    def state(): Seq[(String, Double)] = spark.read.parquet(snap)
      .orderBy("k").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Double]("v"))).toSeq

    upserter(batch(("a", 1.0, 1L)), 0L)
    assert(state() === Seq(("a", 1.0)))

    // CRASH POINT 1: .writing completed, stage rename never ran. A
    // reader sees the OLD snapshot; the next batch overwrites the
    // orphan and the crashed batch's content never leaks (the engine
    // replays that batch — at-least-once from the source).
    batch(("zz", 9.0, 9L)).write.mode("overwrite")
      .parquet(snap + ".writing")
    assert(state() === Seq(("a", 1.0))) // reader: old, not torn
    upserter(batch(("b", 2.0, 2L)), 1L)
    assert(state() === Seq(("a", 1.0), ("b", 2.0))) // no zz

    // CRASH POINT 2: .staged completed, live not yet deleted. Reader
    // sees OLD; the next swap DISCARDS the stale .staged (the failed
    // batch gets replayed) rather than promoting it over live.
    batch(("zz", 7.0, 7L)).write.parquet(snap + ".staged")
    assert(state() === Seq(("a", 1.0), ("b", 2.0))) // reader: old
    upserter(batch(("c", 3.0, 3L)), 2L)
    assert(state() === Seq(("a", 1.0), ("b", 2.0), ("c", 3.0))) // no zz
    assert(!fs.exists(new Path(snap + ".staged")))

    // CRASH POINT 3: live deleted, completed .staged not yet renamed —
    // the one window with no live dir. A reader fails loudly (missing
    // path — no torn read is possible); recovery must PROMOTE the
    // staged snapshot, not treat the run as first-batch (which would
    // silently reset the registry to the incoming batch alone).
    assert(fs.rename(new Path(snap), new Path(snap + ".staged")))
    assert(!fs.exists(new Path(snap)))
    intercept[Exception](state()) // loud, not torn
    upserter(batch(("d", 4.0, 4L)), 3L)
    assert(state() === Seq(("a", 1.0), ("b", 2.0), ("c", 3.0),
      ("d", 4.0))) // full history survived the interrupted promote
  }
}
