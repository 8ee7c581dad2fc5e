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
    * greatest `ord` wins). Idempotent like SADD/HSET. Schema drift is
    * tolerated (allowMissingColumns): a snapshot written by an older
    * producer gains NULLs for new payload columns instead of failing the
    * stream on its first post-upgrade batch — the O31 tolerance rule
    * applied to the registry itself. */
  def upsert(current: DataFrame, updates: DataFrame, keys: Seq[String],
             ord: String): DataFrame = {
    val u = current.withColumn("__gen", lit(0))
      .unionByName(updates.withColumn("__gen", lit(1)),
        allowMissingColumns = true)
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
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val staged = path + ".staged"
    val src = new org.apache.hadoop.fs.Path(staged)
    // Current state: the snapshot, or — after a crash between delete and
    // rename — the completed staged dir (it is always fully written
    // before the snapshot is touched, so reading it back recovers every
    // previously upserted key). Only when NEITHER exists is this truly
    // the first batch. Any other read failure (corrupt files, transient
    // FS errors) must propagate — swallowing it would silently reset the
    // registry to this batch.
    val merged =
      if (fs.exists(dst)) upsert(spark.read.parquet(path), batch, keys, ord)
      else if (fs.exists(src))
        upsert(spark.read.parquet(staged), batch, keys, ord)
      else batch
    // write-then-swap: parquet overwrite is not atomic mid-job, so stage
    // to a sibling dir and rename (single-FS rename is atomic enough for
    // the local/dev case; production would use a table format's commit).
    // Order of failure windows: staged write fails → snapshot untouched;
    // crash after delete → staged recovers (above); rename fails → throw
    // loudly, staged intact.
    val tmp = path + ".writing"
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    fs.delete(src, true)
    if (!fs.rename(tmpPath, src))
      throw new java.io.IOException(
        s"registry stage rename failed: $tmp -> $staged")
    fs.delete(dst, true)
    if (!fs.rename(src, dst))
      throw new java.io.IOException(
        s"registry snapshot rename failed: $staged -> $path " +
          "(previous snapshot deleted; staged data intact)")
  }
}
