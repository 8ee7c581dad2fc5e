package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy operators for training-data pipelines: stable pseudonymization
  * and k-anonymity suppression — the pass run over user-derived tables
  * before they may feed a corpus. Counterpart to the regex scrub in
  * [[TextAnalysis.redact]] (free text) for STRUCTURED identifiers.
  * Echoes the reference's hash-keyed identifier handling (watch-list
  * addresses resolve through an xxHash-keyed map rather than raw
  * strings, `RECEIVER/file_utils.cpp:18`, `RECEIVER/common.h:55-64`)
  * re-expressed as corpus-level pseudonymization with a portable hash.
  *
  * Scale design: suppression needs only the quasi-identifier group
  * counts, a table bounded by the quasi-identifier DOMAIN (not the data),
  * so it broadcasts and the fact table never shuffles — the whole pass is
  * a projection over one scan at any corpus size.
  */
object Anonymize {

  /** Stable pseudonym for an identifier: md5 hex of its string form.
    * Deterministic and engine-portable (any SQL engine reproduces it), so
    * joins BETWEEN pseudonymized tables still line up. This is
    * pseudonymization, not anonymization — re-identification is a
    * dictionary attack away for low-entropy identifiers; pair it with
    * [[suppressSmallGroups]] for the quasi-identifiers. */
  def pseudonym(c: Column): Column = md5(c.cast("string"))

  /** k-anonymity suppression over quasi-identifier columns: rows whose
    * quasi-identifier combination is shared by fewer than `k` rows get
    * every quasi column replaced by `sentinel` (cast to string, since the
    * sentinel must inhabit every column's domain); an appended `k_ok`
    * boolean records which rows survived untouched. Non-quasi columns
    * pass through unchanged — drop or pseudonymize direct identifiers
    * separately.
    *
    * One aggregation over the quasi columns (domain-bounded output,
    * broadcast back) — the data-sized side of the join is a broadcast
    * hash join, so no fact shuffle. */
  def suppressSmallGroups(df: DataFrame, quasiCols: Seq[String], k: Int,
                          sentinel: String = "*"): DataFrame = {
    val census = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__qn"))
    suppressWithCensus(df, census, quasiCols, k, sentinel)
  }

  /** [[suppressSmallGroups]] against a PRECOMPUTED quasi-group census —
    * the form a STREAM uses: group sizes can't be counted over an
    * unbounded stream (and a per-micro-batch count would make
    * suppression depend on batch slicing), so the census comes from a
    * reference snapshot and each arriving row probes it as a
    * stream-static broadcast join. Combinations ABSENT from the census
    * count as size 0 and suppress — the safe direction for data the
    * census has never vouched for. `census` must carry `quasiCols` plus
    * a `__qn` count column (what [[suppressSmallGroups]] computes
    * internally); the caller owns its refresh cadence, per the
    * no-operator-internal-state policy. */
  def suppressWithCensus(df: DataFrame, census: DataFrame,
                         quasiCols: Seq[String], k: Int,
                         sentinel: String = "*"): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, "need quasi columns and k >= 1")
    val ok = coalesce(col("__qn"), lit(0L)) >= k
    df.join(broadcast(census), quasiCols, "left_outer")
      .select(df.columns.map { c =>
        if (quasiCols.contains(c))
          when(ok, col(c).cast("string")).otherwise(lit(sentinel)).as(c)
        else col(c)
      } :+ ok.as("k_ok"): _*)
  }
}
