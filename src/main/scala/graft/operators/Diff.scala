package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diffing for corpus versioning: which documents were added,
  * removed, or changed between two corpus snapshots — the audit step
  * before retraining on a refreshed crawl (and the input to incremental
  * dedup/contamination runs, which only need to process the delta).
  */
object Diff {

  /** Row-level diff of two keyed snapshots by content fingerprint.
    * Returns (keyCol, change ∈ added|removed|changed|unchanged).
    *
    * One full-outer hash join on the key; only (key, fingerprint) pairs
    * shuffle — never document content — so the diff of two 100 TB
    * snapshots moves ~32 bytes per document. Callers wanting only the
    * delta filter `change =!= "unchanged"`, which Catalyst pushes into
    * the join's output early. `fingerprint` is any deterministic Column
    * over the snapshot's columns (md5(text) for exact content identity;
    * a SimHash for semantic-drift tolerance).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                   fingerprint: DataFrame => Column): DataFrame = {
    // presence is tracked by explicit markers, NOT by fingerprint
    // nullability: a row whose fingerprint evaluates to NULL (e.g.
    // md5 of a NULL text) is still PRESENT, and must compare as
    // changed/unchanged via null-safe equality rather than read as a
    // missing row
    val o = oldDf.select(col(keyCol), fingerprint(oldDf).as("__fp_old"),
      lit(true).as("__in_old"))
    val n = newDf.select(col(keyCol), fingerprint(newDf).as("__fp_new"),
      lit(true).as("__in_new"))
    o.join(n, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("__fp_old") <=> col("__fp_new"), "unchanged")
          .otherwise("changed").as("change"))
  }
}
