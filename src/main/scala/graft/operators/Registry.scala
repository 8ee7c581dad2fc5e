package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Registry/dimension maintenance operators: the reference keeps its
  * dimensions in Redis sets/hashes mutated live (SADD vault/mint sets,
  * HSET price maps) and re-reads them every chunk. Batch/stream analogs:
  * set-union upsert into a keyed snapshot, and schema-drift-tolerant
  * projection (the reference's servers defensively select only columns
  * that exist — SURVEY.md §1.3).
  */
object Registry {

  /** Tolerant projection (O31): select, in order, only the requested
    * columns that actually exist. Missing columns are skipped rather than
    * failing — schema-drift tolerance across producer versions. */
  def tolerantSelect(df: DataFrame, cols: Seq[String]): DataFrame = {
    val present = df.columns.toSet
    df.select(cols.filter(present.contains).map(col): _*)
  }

  /** Set-union upsert (O8/O36): union of current and updates with
    * LAST-writer-wins per key (updates beat current; within updates, the
    * greatest `ord` wins). Idempotent like SADD/HSET. */
  def upsert(current: DataFrame, updates: DataFrame, keys: Seq[String],
             ord: String): DataFrame = {
    val u = current.withColumn("__gen", lit(0))
      .unionByName(updates.withColumn("__gen", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__gen").desc, col(ord).desc)
    u.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__gen", "__rn")
  }

  /** Maintain a parquet dimension snapshot from a stream of updates —
    * the foreachBatch upsert pattern (O8/O10): read current snapshot,
    * merge the micro-batch with [[upsert]], atomically replace. Callers
    * pass this to `writeStream.foreachBatch`. */
  def snapshotUpserter(path: String, keys: Seq[String], ord: String)
      : (DataFrame, Long) => Unit = { (batch, _) =>
    val spark = batch.sparkSession
    // Only a MISSING snapshot means "first batch". Any other read
    // failure (corrupt files, transient FS errors) must propagate —
    // swallowing it would silently reset the registry to this batch,
    // losing every previously upserted key.
    val merged = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        upsert(spark.read.parquet(path), batch, keys, ord)
      else batch
    }
    // write-then-swap: parquet overwrite is not atomic mid-job, so stage
    // to a sibling dir and rename (single-FS rename is atomic enough for
    // the local/dev case; production would use a table format's commit)
    val staged = path + ".staged"
    merged.write.mode(SaveMode.Overwrite).parquet(staged)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val src = new org.apache.hadoop.fs.Path(staged)
    val dst = new org.apache.hadoop.fs.Path(path)
    // The staged dir is complete at this point, so a crash between delete
    // and rename can always be recovered from .staged; what must NOT
    // happen is a silently ignored failed rename — the next batch would
    // see no snapshot and reset the registry to itself.
    fs.delete(dst, true)
    if (!fs.rename(src, dst))
      throw new java.io.IOException(
        s"registry snapshot rename failed: $staged -> $path " +
          "(previous snapshot deleted; staged data intact)")
  }
}
