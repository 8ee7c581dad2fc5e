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
}
