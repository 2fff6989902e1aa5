package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the "assert the contract
  * before training on it" gate (not-null %, ranges, set membership,
  * key uniqueness) that runs over every snapshot a pipeline ingests.
  * The reference validates its synthetic output against the source
  * profile imperatively (`Latanova_v1.py:545-621`); this is the
  * general, declarative form.
  *
  * Scale shape: ALL row-level predicates evaluate in ONE fused
  * aggregation scan — k rules cost one pass, not k (the same fusion
  * the detection ladder uses). Uniqueness rules need distinct
  * counting, which is a different shape (groupBy the checked key, one
  * narrow exchange of distinct keys); each runs as its own small agg
  * and the report unions. Nothing is driver-side except the ≤|rules|
  * result rows.
  */
object Expectations {

  /** A row-level expectation: `pred` should hold on every row.
    * Violations are counted over rows where the predicate's inputs are
    * defined — pair with an explicit notNull rule to also bound
    * missingness (a range rule silently passing on NULL is the
    * standard sharp edge, so it is surfaced as its own rule, not
    * hidden in this one). */
  def rowRule(name: String, pred: Column): (String, Column) = name -> pred

  /** Per-rule report over row-level predicates, one fused scan.
    * NULL predicate results (NULL input) count as passes — see
    * [[rowRule]]. Output: (rule, n, n_violations, pass_rate). */
  def checkRows(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "duplicate rule names")
    val aggs = rules.flatMap { case (name, pred) =>
      Seq(coalesce(sum(when(!coalesce(pred, lit(true)), 1L)), lit(0L))
        .as(s"__v#$name"))
    } :+ count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // pivot the 1-row wide frame to one row per rule (driver-free:
    // stack() is a projection over the single aggregated row)
    val stackArgs = rules.map { case (name, _) =>
      s"'${name.replace("'", "''")}', `__v#$name`"
    }.mkString(", ")
    wide.select(col("__n"),
      expr(s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)"))
      .select(col("rule"), col("__n").as("n"), col("n_violations"),
        round(when(col("__n") > 0,
          (col("__n") - col("n_violations")).cast("double") / col("__n").cast("double"))
          .otherwise(lit(1.0)), 6).as("pass_rate"))
  }

  /** Uniqueness expectation on a (possibly composite) key: counts rows
    * carrying a key value that occurs more than once (so a fully
    * duplicated pair counts 2 violations — row-countable, like the
    * row rules). NULL keys are violations of a notNull rule, not this
    * one — they are excluded here. */
  def checkUnique(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val name = s"unique(${keyCols.mkString(",")})"
    val notNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    df.filter(notNull)
      .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum("__c"), lit(0L)).as("n"),
        coalesce(sum(when(col("__c") > 1, col("__c"))), lit(0L)).as("n_violations"))
      .select(lit(name).as("rule"), col("n"), col("n_violations"),
        round(when(col("n") > 0,
          (col("n") - col("n_violations")).cast("double") / col("n").cast("double"))
          .otherwise(lit(1.0)), 6).as("pass_rate"))
  }

  /** Full report: row rules (one scan) ∪ uniqueness rules (one narrow
    * distinct-count each). */
  def report(df: DataFrame, rules: Seq[(String, Column)],
             uniqueKeys: Seq[Seq[String]] = Seq.empty): DataFrame =
    uniqueKeys.foldLeft(checkRows(df, rules)) { (acc, keys) =>
      acc.unionByName(checkUnique(df, keys))
    }
}
