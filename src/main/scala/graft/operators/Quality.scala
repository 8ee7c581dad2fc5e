package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * staple): a rule set over a table compiles to ONE report DataFrame of
  * (rule, metric, threshold, ok) rows — the contract a warehouse
  * asserts after each load, next to the q94 FK audit.
  *
  * Scale shape: every ROW-LEVEL rule (null fraction, range, regex,
  * arbitrary predicate) becomes one conditional aggregate in a single
  * shared scan — adding rules adds columns to one hash aggregate, not
  * passes. Uniqueness and foreign-key rules genuinely need their own
  * shuffle (distinct on the key / join against the parent) and get one
  * bounded branch each; parents ship only their distinct key column.
  */
object Quality {

  /** A single expectation; `metric` is always a violation fraction in
    * [0,1] and the rule passes when metric ≤ `maxFrac`. */
  sealed trait Rule { def name: String; def maxFrac: Double }

  /** Fraction of NULLs in `col` must be ≤ maxFrac. */
  case class NotNull(name: String, col: String, maxFrac: Double = 0.0)
      extends Rule

  /** Fraction of non-null values outside [lo, hi] must be ≤ maxFrac. */
  case class InRange(name: String, col: String, lo: Double, hi: Double,
                     maxFrac: Double = 0.0) extends Rule

  /** Fraction of non-null values NOT matching `regex` ≤ maxFrac. */
  case class Matches(name: String, col: String, regex: String,
                     maxFrac: Double = 0.0) extends Rule

  /** Fraction of rows satisfying an arbitrary SQL predicate-violation
    * expression (`violation` is TRUE for bad rows) ≤ maxFrac. */
  case class Predicate(name: String, violation: Column,
                       maxFrac: Double = 0.0) extends Rule

  /** Fraction of rows whose `cols` tuple occurs more than once ≤
    * maxFrac (0 = the tuple is a key). */
  case class Unique(name: String, cols: Seq[String],
                    maxFrac: Double = 0.0) extends Rule

  /** Fraction of child rows whose `col` has no match in
    * `parentCol` of `parent` ≤ maxFrac (the q94 edge as a rule). */
  case class ForeignKey(name: String, col: String, parent: DataFrame,
                        parentCol: String, maxFrac: Double = 0.0)
      extends Rule

  /** RAW (unrounded) violation fraction. The pass/fail decision is made
    * on this value — rounding is display-only, applied to the reported
    * `metric` afterwards. Deciding on the rounded value would let a
    * zero-tolerance rule (maxFrac = 0) pass a table whose violation
    * fraction is positive but below 5e-7 — one bad row in 3M rows
    * silently admitted. Empty input coalesces to 0/1 = 0.0 (vacuously
    * clean) so every rule kind reports (0.0, ok=true) rather than the
    * row-level branches going NULL while Unique reports 0.0. */
  private def violFracRaw(viol: Column): Column =
    coalesce(sum(when(viol, 1L).otherwise(0L)), lit(0L)).cast("double") /
      greatest(count(lit(1)), lit(1L)).cast("double")

  /** Evaluate all rules; returns (rule, metric, threshold, ok) ordered
    * by rule name. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    require(rules.map(_.name).distinct.length == rules.length,
      "duplicate rule names")
    val rowRules = rules.collect {
      case r: NotNull => (r: Rule, col(r.col).isNull)
      case r: InRange => (r: Rule, col(r.col).isNotNull &&
        (col(r.col) < r.lo || col(r.col) > r.hi))
      case r: Matches => (r: Rule, col(r.col).isNotNull &&
        !col(r.col).rlike(r.regex))
      case r: Predicate => (r: Rule, r.violation)
    }
    // all row-level rules ride ONE aggregate over one scan; each rule
    // carries its raw fraction (for the ok decision) alongside the
    // rounded display metric
    val rowReport: Option[DataFrame] =
      if (rowRules.isEmpty) None
      else Some {
        val aggs = rowRules.map { case (r, viol) =>
          violFracRaw(viol).as(r.name)
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        one.select(explode(array(rowRules.map { case (r, _) =>
          struct(lit(r.name).as("rule"),
            graft.Fns.roundU(col(r.name), 6).as("metric"),
            lit(r.maxFrac).as("threshold"), col(r.name).as("__raw"))
        }: _*)).as("__r")).select(col("__r.*"))
      }
    val uniqueReports = rules.collect { case r: Unique =>
      df.select(r.cols.map(col): _*)
        .groupBy(r.cols.map(col): _*)
        .agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(when(col("__c") > 1, col("__c"))
            .otherwise(0L)), lit(0L)).as("__dups"),
          coalesce(sum(col("__c")), lit(0L)).as("__n"))
        .select(lit(r.name).as("rule"),
          graft.Fns.roundU(col("__dups").cast("double") /
            greatest(col("__n"), lit(1L)).cast("double"), 6).as("metric"),
          lit(r.maxFrac).as("threshold"),
          (col("__dups").cast("double") /
            greatest(col("__n"), lit(1L)).cast("double")).as("__raw"))
    }
    val fkReports = rules.collect { case r: ForeignKey =>
      df.select(col(r.col))
        .join(r.parent.select(col(r.parentCol).as(r.col),
          lit(true).as("__hit")).distinct(), Seq(r.col), "left_outer")
        .agg(violFracRaw(col("__hit").isNull).as("__raw"))
        .select(lit(r.name).as("rule"),
          graft.Fns.roundU(col("__raw"), 6).as("metric"),
          lit(r.maxFrac).as("threshold"), col("__raw"))
    }
    (rowReport.toSeq ++ uniqueReports ++ fkReports)
      .reduce(_.unionByName(_))
      .withColumn("ok", col("__raw") <= col("threshold"))
      .drop("__raw")
      .orderBy(col("rule"))
  }
}
