package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sessionization operators beyond the built-in `session_window`.
  *
  * The gap-only rule (q37) is a prefix sum over break indicators —
  * windows handle it. The CAPPED rule here (break on gap OR on span
  * since the current session's start) is a genuinely SEQUENTIAL
  * recurrence: whether an event opens a session depends on where the
  * previous session started, which depends on every earlier split.
  * No window/prefix-sum form exists, so this is the batch home of the
  * secondary-sort streaming scan ([[ChangeSuppression.suppress]]'s
  * discipline): one shuffle on the key, a within-partition sort on
  * (key, ts, id), and an O(1)-state pass — a key's history is never
  * materialized (the external sorter spills; the scan holds four
  * scalars), which is what survives unbounded per-key history at
  * 100 TB. Oracle-able because the recurrence replays in SQL as a
  * recursive CTE (one event per key per iteration).
  */
object Sessionize {

  /** One row per event: (key, ts, id, session_idx, is_start).
    * A session BREAKS before event t when
    *   t - prev_t  > gapSec   (inactivity), or
    *   t - session_start > capSec  (max session span — forces rotation
    *   even under continuous activity, the rule that defeats windows).
    * `session_idx` is 0-based per key; ids break ts ties
    * deterministically. */
  def cappedSessions(df: DataFrame, keyCol: String, tsCol: String,
                     idCol: String, gapSec: Long, capSec: Long)
      : DataFrame = {
    require(gapSec > 0 && capSec > 0, "positive gap and cap")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long").as("__k"),
        col(tsCol).cast("long").as("__t"),
        col(idCol).cast("long").as("__i"))
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"), col("__i"))
      .as[(Long, Long, Long)]
      .mapPartitions { rows =>
        var curKey = Long.MinValue
        var haveKey = false
        var sess = -1L
        var sessStart = 0L
        var prevT = 0L
        rows.map { case (k, t, i) =>
          if (!haveKey || k != curKey) {
            curKey = k; haveKey = true; sess = -1L
          }
          val isStart = sess < 0L || (t - prevT) > gapSec ||
            (t - sessStart) > capSec
          if (isStart) { sess += 1L; sessStart = t }
          prevT = t
          (k, t, i, sess, isStart)
        }
      }
      .toDF(keyCol, tsCol, idCol, "session_idx", "is_start")
  }

  /** Debounce / idempotency-window dedup: an event is KEPT iff it is
    * its key's first, or at least `minGapSec` after the last KEPT
    * event. Like [[cappedSessions]] this is a genuinely SEQUENTIAL
    * recurrence — eligibility depends on which earlier events were
    * kept, which depends on every prior decision — so no
    * window/prefix-sum form exists ("distinct on 10-minute buckets"
    * is a different, boundary-artifacted rule). Same secondary-sort
    * O(1)-state scan: one shuffle on the key, within-partition
    * (key, ts, id) sort, two scalars of state. Oracle-able as a
    * recursive-CTE replay of the recurrence. */
  def debounce(df: DataFrame, keyCol: String, tsCol: String,
               idCol: String, minGapSec: Long): DataFrame = {
    require(minGapSec > 0, "positive window")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long").as("__k"),
        col(tsCol).cast("long").as("__t"),
        col(idCol).cast("long").as("__i"))
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"), col("__i"))
      .as[(Long, Long, Long)]
      .mapPartitions { rows =>
        var curKey = Long.MinValue
        var haveKey = false
        var lastKept = 0L
        rows.map { case (k, t, i) =>
          if (!haveKey || k != curKey) {
            curKey = k; haveKey = true; lastKept = Long.MinValue
          }
          val kept = lastKept == Long.MinValue || t - lastKept >= minGapSec
          if (kept) lastKept = t
          (k, t, i, kept)
        }
      }
      .toDF(keyCol, tsCol, idCol, "kept")
  }

  /** INTERVAL-SCHEDULING maximization (activity selection): per key,
    * scan intervals in (end, start, id) order and ACCEPT one iff its
    * start ≥ the last ACCEPTED interval's end (half-open [s, e) —
    * touching intervals are compatible). The earliest-deadline-first
    * greedy is optimal by the classic exchange argument, and like
    * [[debounce]] it is a genuinely sequential recurrence (whether an
    * interval is accepted depends on every prior acceptance), so no
    * window/prefix-sum form exists. Same secondary-sort O(1)-state
    * scan — the only difference from the session family is that the
    * within-partition sort runs on the interval END. Oracle-able as a
    * recursive-CTE replay (q263). Returns one row per interval:
    * (key, start, end, id, accepted). */
  def greedySchedule(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long").as("__k"),
        col(startCol).cast("long").as("__s"),
        col(endCol).cast("long").as("__e"),
        col(idCol).cast("long").as("__i"))
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__e"), col("__s"),
        col("__i"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { rows =>
        var curKey = Long.MinValue
        var haveKey = false
        var lastEnd = Long.MinValue
        rows.map { case (k, s, e, i) =>
          if (!haveKey || k != curKey) {
            curKey = k; haveKey = true; lastEnd = Long.MinValue
          }
          val ok = lastEnd == Long.MinValue || s >= lastEnd
          if (ok) lastEnd = e
          (k, s, e, i, ok)
        }
      }
      .toDF(keyCol, startCol, endCol, idCol, "accepted")
  }

  /** TOKEN-BUCKET RATE LIMITER replay (API throttling audit): per
    * key, a bucket of `capMilli` milli-tokens starts full, refills at
    * `refillNumer/refillDenom` milli-tokens per second of elapsed
    * time (integer arithmetic: `(Δt · numer) div denom`, truncation
    * == floor on the non-negative Δt), and an event is ALLOWED iff
    * `costMilli` tokens are available (then deducted; denied events
    * deduct nothing). The two-sided clamp (cap above, cost-gated
    * floor below) plus the allow-conditional deduction make this a
    * genuinely sequential recurrence — not expressible as q196's
    * prefix-sum/running-min identity, which handles only the
    * one-sided clamp — so it runs as the [[cappedSessions]]
    * secondary-sort O(1)-state scan (state: two longs per key) and
    * replays in SQL as a one-event-per-iteration recursive CTE.
    * Returns (key, ts, id, allowed). */
  def rateLimit(df: DataFrame, keyCol: String, tsCol: String,
                idCol: String, capMilli: Long, costMilli: Long,
                refillNumer: Long, refillDenom: Long): DataFrame = {
    require(capMilli > 0 && costMilli > 0 && refillNumer >= 0 &&
      refillDenom > 0, "positive cap/cost, non-negative refill")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long").as("__k"),
        col(tsCol).cast("long").as("__t"),
        col(idCol).cast("long").as("__i"))
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"), col("__i"))
      .as[(Long, Long, Long)]
      .mapPartitions { rows =>
        var curKey = Long.MinValue
        var haveKey = false
        var tokens = 0L
        var lastT = 0L
        rows.map { case (k, t, i) =>
          if (!haveKey || k != curKey) {
            curKey = k; haveKey = true; tokens = capMilli; lastT = t
          }
          tokens = math.min(capMilli,
            tokens + (t - lastT) * refillNumer / refillDenom)
          lastT = t
          val ok = tokens >= costMilli
          if (ok) tokens -= costMilli
          (k, t, i, ok)
        }
      }
      .toDF(keyCol, tsCol, idCol, "allowed")
  }

  /** Wilder exponential smoothing of per-step gains/losses — the RSI
    * recurrence, kept in pure int64 so both engines replay it exactly:
    * per key, rows sorted on `tsCol` (a long; caller pre-aggregates to
    * one row per (key, ts)), with v = `valCol` (long units, e.g. cents),
    *
    *   g_t = max(v_t − v_{t−1}, 0),  l_t = max(v_{t−1} − v_t, 0)
    *   AG_t = (AG_{t−1}·(n−1) + g_t) div n      (AG_first = 0)
    *   AL_t = (AL_{t−1}·(n−1) + l_t) div n
    *
    * where div is integer division — all operands non-negative, so
    * Spark's trunc-div and DuckDB's floor-div agree. The classic RSI
    * readout 100·AG/(AG+AL) is emitted as the exact integer
    * rsi_ppm = (1 000 000·AG) div (AG+AL), NULL while AG+AL = 0.
    * Like [[rateLimit]], the smoothing state at t depends on every
    * earlier row (an exponentially-weighted sum has no window/prefix
    * form once the div floors each step), so this is the same
    * secondary-sort O(1)-state scan: one shuffle on the key, a
    * within-partition sort, four longs of state — per-key history is
    * never materialized, which is what survives unbounded series at
    * 100 TB. Oracle: one event per key per recursive-CTE iteration. */
  def wilderSmooth(df: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, n: Int): DataFrame = {
    require(n >= 2, "smoothing period >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("__k"),
        col(tsCol).cast("long").as("__t"),
        col(valCol).cast("long").as("__v"))
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"))
      .as[(String, Long, Long)]
      .mapPartitions { rows =>
        var curKey: String = null
        var prevV = 0L
        var havePrev = false
        var ag = 0L
        var al = 0L
        rows.map { case (k, t, v) =>
          if (curKey == null || k != curKey) {
            curKey = k; havePrev = false; ag = 0L; al = 0L
          }
          if (havePrev) {
            val g = math.max(v - prevV, 0L)
            val l = math.max(prevV - v, 0L)
            ag = (ag * (n - 1) + g) / n
            al = (al * (n - 1) + l) / n
          }
          prevV = v; havePrev = true
          val rsi = if (ag + al > 0) Some(1000000L * ag / (ag + al))
            else None
          (k, t, v, ag, al, rsi)
        }
      }
      .toDF(keyCol, tsCol, valCol, "avg_gain", "avg_loss", "rsi_ppm")
  }
}
