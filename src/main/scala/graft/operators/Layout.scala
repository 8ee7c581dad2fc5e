package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) interleaving, the
  * lakehouse OPTIMIZE ZORDER technique. Sorting files by ONE column
  * gives min/max pruning on that column only; sorting by the
  * interleaved bit pattern of TWO columns gives bounded min/max ranges
  * on BOTH — so a predicate on either column (or both) skips most
  * files. The z-value is pure bit arithmetic (codegen-friendly, no UDF)
  * and the layout apply is repartitionByRange + sortWithinPartitions on
  * it — one range shuffle, the same cost as a single-column layout.
  *
  * Reference behavior: none (the reference has no storage layout
  * stage); this is SURVEY §2.4-class coverage for the warehouse side.
  */
object Layout {

  /** Morton z-value of two non-negative ints using the low `bits` bits
    * of each: bit i of x lands at position 2i, bit i of y at 2i+1. The
    * loop unrolls at plan-build time into a flat OR chain of masked
    * shifts — whole-stage codegen keeps it in registers. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1,31]")
    val xm = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val ym = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(xm.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(ym.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Hilbert-curve index of (x, y) over a 2^bits grid — the
    * locality-superior sibling of [[zValue]] (consecutive indices are
    * always spatially adjacent; Morton jumps diagonals at power-of-two
    * seams). Native expression: the per-level reflect+swap rotation is
    * conditional, so a composed when() column would duplicate the
    * operand tree 4× per level under projection collapse. */
  def hilbertValue(x: Column, y: Column, bits: Int): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(graft.functions.HilbertIndexExpr(
      B.toCatalyst(x.cast("long")), B.toCatalyst(y.cast("long")), bits))
  }

  /** Bucket rows by z-value prefix (bucket = z >> shift) and report each
    * bucket's row count and BOTH dimensions' min/max — the per-file
    * stats a z-ordered write would expose to pruning. The audit form of
    * the layout: bounded ranges in both columns per bucket are exactly
    * what makes two-sided pruning work. */
  def zOrderBuckets(df: DataFrame, xCol: String, yCol: String,
                    bits: Int, shift: Int): DataFrame = {
    require(shift >= 0 && shift < 2 * bits, "shift in [0, 2*bits)")
    df.select(col(xCol).as("__x"), col(yCol).as("__y"))
      .withColumn("__z", zValue(col("__x"), col("__y"), bits))
      .groupBy(shiftright(col("__z"), shift).as("bucket_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))
  }

  /** Apply the layout: range-partition and sort by z-value so each
    * output file covers one contiguous z-range — bounded min/max in
    * both dimensions per file. `files` controls output granularity the
    * way a compaction target would. The z column is dropped after the
    * sort; it exists only to order the write. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int,
                    files: Int, path: String): Unit = {
    require(files >= 1)
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** JOIN-SKEW diagnostics: the report that decides whether a key needs
    * salting (or AQE's skew split) BEFORE the 100 TB run discovers it
    * the hard way. Per-key counts collapse in one hash aggregate (the
    * shuffle carries distinct keys, not rows), then one bounded
    * aggregate computes the shape: the max/avg ratio is the straggler
    * factor — a partition holding the hottest key does `skew_ratio`×
    * the average reducer's work — and `suggested_salts` is the
    * replication factor that levels it (ceil of the hottest key's
    * share of an average reducer, the q20 salted-join parameter).
    * `top_key` names the culprit for the log line. */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("__c"))
    counts.agg(
        sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("__c")).as("max_count"),
        max_by(col("key").cast("string"), struct(col("__c"), col("key")))
          .as("top_key"))
      .select(col("n_rows"), col("n_keys"), col("max_count"),
        col("top_key"),
        graft.Fns.roundU(col("n_rows").cast("double") / col("n_keys"), 2)
          .as("avg_count"),
        graft.Fns.roundU(col("max_count").cast("double") *
          col("n_keys") / col("n_rows"), 2).as("skew_ratio"),
        ceil(col("max_count").cast("double") * col("n_keys") /
          col("n_rows")).cast("int").as("suggested_salts"))
  }

  /** One planned compaction bin. */
  case class CompactionBin(bin_id: Int, path: String, bytes: Long)

  /** Small-files compaction PLAN: first-fit-decreasing bin-packing of a
    * directory's parquet files into ~`targetBytes` bins. Planning runs
    * on the driver over file METADATA only — O(files) names and sizes,
    * the same listing every table scan performs; no data moves until
    * [[compact]] applies the plan. A file larger than `targetBytes`
    * gets its own bin (splitting is the scan's job, not the packer's).
    */
  def compactionPlan(spark: org.apache.spark.sql.SparkSession,
                     dir: String, targetBytes: Long): Seq[CompactionBin] = {
    require(targetBytes > 0)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.toString, f.getLen))
      .sortBy { case (path, len) => (-len, path) } // FFD, ties by name
    val bins = scala.collection.mutable.ArrayBuffer[(Long,
      scala.collection.mutable.ArrayBuffer[(String, Long)])]()
    files.foreach { case (path, len) =>
      // single pass: indexWhere yields the bin AND its index together
      val i = bins.indexWhere(_._1 + len <= targetBytes)
      if (i >= 0) {
        val b = bins(i)
        bins(i) = (b._1 + len, b._2 += ((path, len)))
      } else {
        bins += ((len,
          scala.collection.mutable.ArrayBuffer((path, len))))
      }
    }
    bins.zipWithIndex.flatMap { case ((_, fs0), i) =>
      fs0.map { case (path, len) => CompactionBin(i, path, len) }
    }.toSeq
  }

  /** Apply a compaction: rewrite the directory's files as one file per
    * planned bin. Each bin's files are read and coalesced by their own
    * job (bins are independent — at cluster scale submit them
    * concurrently), so memory is bounded by one bin and a failed bin
    * retries alone. Output goes to `outDir`; the input directory is
    * left untouched (swap/retire is the caller's transactional step,
    * matching Registry.snapshotUpserter's swap discipline). */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              outDir: String, targetBytes: Long): Seq[CompactionBin] = {
    val plan = compactionPlan(spark, dir, targetBytes)
    plan.groupBy(_.bin_id).foreach { case (bin, files) =>
      spark.read.parquet(files.map(_.path): _*)
        .coalesce(1)
        .write.mode("overwrite").parquet(f"$outDir/bin-$bin%05d")
    }
    plan
  }

  // ---- data skipping: file-stats table + pruning planner -------------
  //
  // The manifest side of min/max pruning (what Delta/Iceberg keep in
  // their metadata layer, and what writeZOrdered's layout exists to make
  // effective). fileStats builds the stats table with ONE hash aggregate
  // keyed by file name — map-side combine means each task contributes
  // one partial row per file it touched, so the shuffle is
  // O(files × tasks-per-file), never O(rows). The planner then answers
  // a range predicate from the stats table alone: at 100 TB that's the
  // difference between listing 100k files and scanning them.

  /** Per-file (n_rows, min_v, max_v) over `valCol`. `df` must be a raw
    * file scan — after a join/shuffle `input_file_name()` returns "",
    * and those rows would collapse into one phantom-file row; they are
    * excluded (an empty result = caller passed a non-scan, loudly wrong
    * rather than quietly misattributed). */
  def fileStats(df: DataFrame, valCol: String): DataFrame =
    df.select(input_file_name().as("file"), col(valCol).as("__v"))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__v")).as("min_v"), max(col("__v")).as("max_v"))
      .filter(length(col("file")) > 0)

  /** Files a closed-interval predicate `BETWEEN lo AND hi` must read:
    * keep a file iff its [min_v, max_v] intersects [lo, hi]. A file
    * whose stats are NULL (all values NULL) is KEPT — pruning must be
    * conservative: a false keep costs a read, a false skip loses rows. */
  def pruneForRange(stats: DataFrame, lo: Column, hi: Column): DataFrame =
    stats.filter(col("min_v").isNull ||
      !(col("max_v") < lo || col("min_v") > hi))

  /** One-row skipping report for a predicate: files/rows total vs read.
    * The number a layout change (writeZOrdered, compaction) is judged
    * by; both sides come from the stats table, no data scan. */
  def skippingReport(stats: DataFrame, lo: Column,
                     hi: Column): DataFrame = {
    val kept = pruneForRange(stats, lo, hi)
      .agg(count(lit(1)).as("files_read"),
        coalesce(sum(col("n_rows")), lit(0L)).as("rows_read"))
    stats.agg(count(lit(1)).as("files_total"),
        coalesce(sum(col("n_rows")), lit(0L)).as("rows_total"))
      .crossJoin(kept)
      .select(col("files_total"), col("files_read"),
        col("rows_total"), col("rows_read"),
        (lit(1.0) - col("files_read") / col("files_total"))
          .as("files_skipped_frac"))
  }
}
