package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output-layout sinks: how a 100 TB corpus actually lands on disk.
  * Partition pruning only works if the data was written partitioned;
  * run-length/dictionary compression only works if rows within a file
  * are sorted. This is the write-side half of the scan-side pushdown
  * story the readers rely on.
  */
object Sinks {

  /** Hive-partitioned, sorted-within-file parquet layout:
    * `path/col=value/part-*.parquet` with rows inside each file sorted by
    * `sortCols`.
    *
    * The repartition-on-partition-columns before the write is the
    * load-bearing step: without it every task holds files open for
    * every partition value it happens to see (small-file explosion —
    * tasks × partitions files); with it each partition value's rows
    * co-locate into one task, giving one large sorted file per value
    * per shuffle partition. `sortWithinPartitions` leads with the
    * partition columns so a task holding several values still writes
    * each file fully sorted.
    *
    * Readers get partition pruning (`WHERE lang = 'en'` never lists the
    * other directories) and tight parquet row-group stats on the sort
    * columns. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       sortCols: Seq[String],
                       mode: String = "overwrite"): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode(mode)
      .parquet(path)

  /** One micro-batch's IDEMPOTENT landing: rows go under an extra
    * trailing `__batch_id=<id>` partition level and the write is a
    * DYNAMIC partition overwrite, so replaying a batch (failure between
    * write and checkpoint commit) rewrites exactly its own
    * `partition/__batch_id=<id>/` directories instead of appending
    * duplicates. Top-level pruning directories are unchanged — readers
    * filtering on `partitionCols` prune as before and see `__batch_id`
    * as one extra column. */
  private[graft] def writeBatch(batch: DataFrame, batchId: Long,
                                path: String, partitionCols: Seq[String],
                                sortCols: Seq[String]): Unit =
    batch.withColumn("__batch_id", lit(batchId))
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy((partitionCols :+ "__batch_id"): _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)

  /** Streaming form: each micro-batch lands into the same
    * hive-partitioned sorted layout (foreachBatch → [[writeBatch]]) —
    * the continuous-ingest path into the lake directory the batch
    * readers prune against. EXACTLY-ONCE: the checkpoint dedupes batch
    * ids across restarts, and [[writeBatch]] keys the filesystem state
    * on the batch id (dynamic overwrite of `__batch_id=<id>`
    * partitions), so the one replay window foreachBatch leaves open — a
    * batch re-run after its write but before its checkpoint commit —
    * rewrites the same directories instead of duplicating rows. Files
    * accumulate one per partition value per batch (compact periodically
    * with a batch [[writePartitioned]] rewrite when batch cadence makes
    * them small). */
  def partitionedStreamSink(stream: DataFrame, path: String,
                            checkpoint: String,
                            partitionCols: Seq[String],
                            sortCols: Seq[String])
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        writeBatch(batch, batchId, path, partitionCols, sortCols)
      }
      .start()
}
