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
                       sortCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
}
