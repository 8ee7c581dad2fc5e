package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for LLM pretraining: concatenate each group's token
  * stream in a deterministic document order and chunk it into fixed-size
  * context windows. The core primitive is a DISTRIBUTED PREFIX SUM —
  * the sequential-looking computation Spark's window functions can only
  * express as one sort task per group key (a 5-language corpus would run
  * on 5 tasks at any cluster size).
  */
object Packing {

  /** Running total of `valCol` over rows ordered by (grpCols, ordCols),
    * restarting at every group — equal to `sum(val) OVER (PARTITION BY
    * grp ORDER BY ord ROWS UNBOUNDED PRECEDING)` but parallel in the
    * TOTAL row count, not in the number of groups:
    *
    *  1. range-repartition + sort by (grp, ord) — the one shuffle;
    *  2. per-(partition, group) totals (a distributed aggregate), FILTERED
    *     to groups spanning more than one partition — at most partitions-1
    *     of them under range partitioning — then collected to the driver;
    *  3. each row's prefix = its partition's group offset (broadcast map)
    *     plus a running counter inside its sorted partition (streamed,
    *     no per-group state beyond one counter).
    *
    * The classic two-phase parallel scan, so a single group spanning the
    * whole 100 TB input still computes on every core. Driver/broadcast
    * state is O(partitions × spanning groups) — partition-boundary
    * crossings, not group cardinality.
    *
    * The sorted input is PERSISTED inside the operator — not only to
    * avoid re-running the shuffle, but for CORRECTNESS: the offsets job
    * and the final pass are separate executions, and repartitionByRange
    * picks boundaries from a per-execution reservoir sample, so without
    * one materialized partitioning a boundary row could land in
    * partition p during the offsets job and p+1 during the final pass,
    * silently mismatching its broadcast offset. The cache is released
    * by the session-level cache clear (Bench/Verify do this per query);
    * callers managing their own lifecycle may clearCache() when done.
    * Output = input columns + `outCol` (running total INCLUDING the
    * current row). Nulls in `valCol` count as 0.
    */
  def prefixSum(df: DataFrame, grpCols: Seq[String], ordCols: Seq[String],
                valCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val keyCols = (grpCols ++ ordCols).map(col)
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df
      .repartitionByRange(n, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grpIdx = grpCols.indices
    // (pid, grpKey) -> partition-local group total. Only groups that SPAN
    // more than one partition can contribute a nonzero cross-partition
    // offset, and range partitioning bounds those to at most partitions-1
    // boundary-crossing groups — so the spanning filter (computed
    // distributedly, over the already-aggregated totals) caps the collect
    // at O(partitions × spanning groups), independent of group
    // cardinality. Non-spanning groups fall through to the map's
    // default offset of 0.
    val wg = Window.partitionBy(grpCols.map(col): _*)
    val totals = sorted
      .groupBy((col("__pid") +: grpCols.map(col)): _*)
      .agg(sum(coalesce(col(valCol).cast("long"), lit(0L))).as("__t"))
      .withColumn("__npid", count(lit(1)).over(wg))
      .filter(col("__npid") > 1)
      .select((col("__pid") +: grpCols.map(col)) :+ col("__t"): _*)
      .collect()
      .map(r => (r.getInt(0), grpIdx.map(i => r.get(i + 1)).toVector,
        r.getLong(grpIdx.size + 1)))
    // offset for (grp, pid) = sum of the group's totals in partitions < pid;
    // zero offsets (each group's first partition) are dropped — the
    // broadcast holds only the entries that change a row's prefix
    val offsets: Map[(Vector[Any], Int), Long] = totals
      .groupBy(_._2)
      .flatMap { case (g, parts) =>
        val byPid = parts.sortBy(_._1)
        var acc = 0L
        byPid.flatMap { case (pid, _, t) =>
          val r = if (acc != 0L) Some(((g, pid), acc)) else None
          acc += t; r
        }
      }
    val bc = spark.sparkContext.broadcast(offsets)
    val inSchema = sorted.schema
    val outSchema = inSchema.add(outCol, LongType, nullable = false)
    val pidPos = inSchema.fieldIndex("__pid")
    val valPos = inSchema.fieldIndex(valCol)
    val grpPos = grpCols.map(inSchema.fieldIndex)
    val res = sorted.mapPartitions { it =>
      // rows arrive sorted by (grp, ord): one running counter, reset on
      // group change — no map of per-group state
      var curGrp: Vector[Any] = null
      var running = 0L
      var offset = 0L
      it.map { row =>
        val g = grpPos.map(row.get).toVector
        if (g != curGrp) {
          curGrp = g
          running = 0L
          offset = bc.value.getOrElse((g, row.getInt(pidPos)), 0L)
        }
        val v = row.get(valPos) match {
          case null => 0L
          case x: Number => x.longValue()
        }
        running += v
        Row.fromSeq(row.toSeq :+ (offset + running))
      }
    }(Encoders.row(outSchema))
    res.drop("__pid")
  }

  /** Distributed EXCLUSIVE prefix-max — the same two-phase scan as
    * [[prefixSum]] (range repartition + per-partition pass + boundary
    * offsets; never a one-task window) for the MAX monoid, emitting
    * the running max over STRICTLY EARLIER rows (identity
    * Long.MinValue for each group's first row — callers test
    * `out < value` style dominance, where MinValue correctly means
    * "nothing before me"). Built for skyline/Pareto sweeps (q237):
    * a point dominates forward iff it exceeds everything strictly
    * cheaper, which is exactly this exclusive scan. Nulls in
    * `valCol` are treated as MinValue (they never raise the max). */
  def prefixMaxExclusive(df: DataFrame, grpCols: Seq[String],
                         ordCols: Seq[String], valCol: String,
                         outCol: String): DataFrame = {
    val spark = df.sparkSession
    val keyCols = (grpCols ++ ordCols).map(col)
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df
      .repartitionByRange(n, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grpIdx = grpCols.indices
    val wg = Window.partitionBy(grpCols.map(col): _*)
    val totals = sorted
      .groupBy((col("__pid") +: grpCols.map(col)): _*)
      .agg(max(col(valCol).cast("long")).as("__t"))
      .withColumn("__npid", count(lit(1)).over(wg))
      .filter(col("__npid") > 1)
      .select((col("__pid") +: grpCols.map(col)) :+ col("__t"): _*)
      .collect()
      .map(r => (r.getInt(0), grpIdx.map(i => r.get(i + 1)).toVector,
        if (r.isNullAt(grpIdx.size + 1)) Long.MinValue
        else r.getLong(grpIdx.size + 1)))
    val offsets: Map[(Vector[Any], Int), Long] = totals
      .groupBy(_._2)
      .flatMap { case (g, parts) =>
        val byPid = parts.sortBy(_._1)
        var acc = Long.MinValue
        byPid.flatMap { case (pid, _, t) =>
          val r = if (acc != Long.MinValue) Some(((g, pid), acc)) else None
          acc = math.max(acc, t); r
        }
      }
    val bc = spark.sparkContext.broadcast(offsets)
    val inSchema = sorted.schema
    val outSchema = inSchema.add(outCol, LongType, nullable = false)
    val pidPos = inSchema.fieldIndex("__pid")
    val valPos = inSchema.fieldIndex(valCol)
    val grpPos = grpCols.map(inSchema.fieldIndex)
    val res = sorted.mapPartitions { it =>
      var curGrp: Vector[Any] = null
      var running = Long.MinValue
      it.map { row =>
        val g = grpPos.map(row.get).toVector
        if (g != curGrp) {
          curGrp = g
          running = bc.value.getOrElse((g, row.getInt(pidPos)),
            Long.MinValue)
        }
        val before = running // EXCLUSIVE: emit before folding this row
        val v = row.get(valPos) match {
          case null => Long.MinValue
          case x: Number => x.longValue()
        }
        running = math.max(running, v)
        Row.fromSeq(row.toSeq :+ before)
      }
    }(Encoders.row(outSchema))
    res.drop("__pid")
  }

  /** Token-stream packing stats per context window: documents concatenate
    * in `ordCol` order within each `grpCol` stream and split at every
    * `budget`-token boundary (the GPT-style pretraining layout — documents
    * DO straddle windows). Returns one row per (grp, pack_id) with the
    * number of documents STARTING in the window, their token sum, and how
    * many straddle into the next window. `tokCol` must be a non-negative
    * per-document token count. */
  def tokenPacking(df: DataFrame, grpCol: String, ordCol: String,
                   tokCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    val cum = prefixSum(df, Seq(grpCol), Seq(ordCol), tokCol, "__cum")
    // coalesce to match prefixSum's null-as-0 contract: a NULL token
    // count would null __start and collapse the row into a spurious
    // pack_id=NULL group
    cum
      .withColumn("__start",
        col("__cum") - coalesce(col(tokCol).cast("long"), lit(0L)))
      .withColumn("pack_id", expr(s"__start div ${budget}L"))
      .withColumn("__splits",
        when(col(tokCol) > 0 &&
          expr(s"(__cum - 1L) div ${budget}L") > col("pack_id"), 1L)
          .otherwise(0L))
      .groupBy(col(grpCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokCol).cast("long")).as("sum_tokens"),
        sum(col("__splits")).as("n_split"))
  }
}
