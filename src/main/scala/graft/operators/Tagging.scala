package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar tagging / key-derivation operators.
  *
  * Re-expresses the reference's enrichment stage (membership tagging of
  * wallets/mints against watch-list sets, cf. reference
  * SERVER/flightWithRedisLatest.py:92-112, and key synthesis, cf. reference
  * RECEIVER/stage2_processing.cpp:159-167,392-396) as codegen-friendly
  * `Column` expressions — no UDFs, so everything stays inside
  * WholeStageCodegen.
  */
object Tagging {

  /** Membership tag: `col` if it is in `members`, else NULL.
    *
    * Use for small literal sets (the isin turns into an In/InSet expression,
    * evaluated locally per row — no shuffle, no join). For large sets use
    * [[isinTagJoin]] which broadcasts a dimension instead.
    */
  def isinTag(col: Column, members: Seq[String]): Column =
    if (members.isEmpty) lit(null).cast("string")
    else when(col.isin(members: _*), col)

  /** Membership tag against a (possibly large) single-column dimension via a
    * broadcast LEFT OUTER join — the scale path when the watch-list doesn't
    * fit in a literal InSet. Output column `outName` holds the key when it is
    * a member, NULL otherwise.
    */
  def isinTagJoin(df: DataFrame, keyCol: String, dim: DataFrame,
                  dimCol: String, outName: String): DataFrame = {
    val d = dim.select(col(dimCol).as("__tag_key")).distinct()
    df.join(broadcast(d), df(keyCol) === col("__tag_key"), "left_outer")
      .withColumn(outName, col("__tag_key"))
      .drop("__tag_key")
  }

  /** Empty/blank string → NULL coercion (the reference appends SQL NULL when
    * a balance string_view is empty; we preserve that semantic rule). */
  def emptyToNull(c: Column): Column =
    when(length(c) === 0 || c.isNull, lit(null).cast("string")).otherwise(c)

  /** Surrogate key: dash-joined parts (blockTime-txIdx-datacenter in the
    * reference). */
  def surrogateKey(parts: Column*): Column = concat_ws("-", parts: _*)

  /** Coalesced row key: positional hot-address override if present, else the
    * record's own owner; rows with neither are dropped by the caller. */
  def coalesceKey(preferred: Column, fallback: Column): Column =
    coalesce(emptyToNull(preferred), emptyToNull(fallback))
}
