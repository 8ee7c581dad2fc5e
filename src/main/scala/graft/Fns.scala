package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic helpers.
  *
  * `roundU(x, k)` is round-half-up implemented as
  * `floor(x * 10^k + 0.5) / 10^k`: every step is a plain IEEE-754 double
  * operation, so Spark and DuckDB produce BIT-IDENTICAL results. Spark's
  * built-in `round` converts through the double's shortest decimal
  * representation (BigDecimal.valueOf) while DuckDB rounds the true binary
  * value — they disagree whenever the shortest repr lands exactly on a
  * midpoint (e.g. 0.78175 at 4 digits). Oracle SQL uses the same
  * `floor(x * p + 0.5) / p` spelling. Valid for the non-negative values we
  * round; |x|·10^k must stay below 2^53.
  */
object Fns {
  def roundU(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * p + 0.5) / p
  }

  /** Canonical high-precision amount type (SURVEY §1.2/§7.4d): crypto
    * balances carry up to 18 fractional digits at magnitudes where a
    * double has already lost the low digits (doubles hold ~15.95
    * significant digits; an 18-decimal token amount above 1.0 exceeds
    * that). The reference dodges the problem by keeping balances as
    * strings end-to-end; the analytical path here casts them losslessly
    * to DECIMAL(38,18) so sums/deltas are exact. */
  val AmountType = "decimal(38,18)"

  /** Lossless string→DECIMAL(38,18) amount cast; malformed input degrades
    * to NULL (try_cast) instead of failing the job under ANSI mode. */
  def toAmount(c: Column): Column = c.try_cast(AmountType)
}
