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

  /** Streaming form: each micro-batch lands APPEND-mode into the same
    * hive-partitioned sorted layout (foreachBatch → [[writePartitioned]])
    * — the continuous-ingest path into the lake directory the batch
    * readers prune against. Exactly-once comes from the checkpointed
    * batch id, same as any foreachBatch sink; files accumulate one per
    * partition value per batch (compact periodically with a batch
    * [[writePartitioned]] rewrite when batch cadence makes them small).
    */
  def partitionedStreamSink(stream: DataFrame, path: String,
                            checkpoint: String,
                            partitionCols: Seq[String],
                            sortCols: Seq[String])
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        writePartitioned(batch, path, partitionCols, sortCols,
          mode = "append")
      }
      .start()
}
