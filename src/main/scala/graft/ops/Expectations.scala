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

  /** Referential-integrity expectation: child rows whose foreign key
    * has no match in `parent` (orphans). Same report row shape as the
    * other rules. The parent side reduces to DISTINCT key values
    * before the join — the join input is |parent keys|, not |parent
    * rows| — and the left-anti probe broadcasts whenever the key set
    * is small (the dimension-table case); both-large falls back to a
    * key-partitioned join. NULL foreign keys are a notNull rule's
    * business and are excluded here. */
  def checkReferential(child: DataFrame, childKey: String,
                       parent: DataFrame, parentKey: String): DataFrame = {
    val name = s"ref($childKey -> $parentKey)"
    val keys = parent.select(col(parentKey).as(childKey))
      .filter(col(childKey).isNotNull).distinct()
    val c = child.filter(col(childKey).isNotNull)
      .select(col(childKey)).localCheckpoint() // feeds total AND orphan count
    val totals = c.agg(count(lit(1)).as("n"))
    val orphans = c.join(keys, Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    totals.crossJoin(orphans)
      .select(lit(name).as("rule"), col("n"), col("n_violations"),
        round(when(col("n") > 0,
          (col("n") - col("n_violations")).cast("double") / col("n").cast("double"))
          .otherwise(lit(1.0)), 6).as("pass_rate"))
  }

  /** Benford first-digit screen — the accounting/fraud heuristic:
    * distribution of leading digits 1–9 of a positive numeric column
    * against Benford's law p(d) = log10(1 + 1/d), with the total
    * variation distance as the headline score. ONE aggregation scan
    * (nine conditional counts); everything after is arithmetic on a
    * 9-row frame. Rows ≤ 0 or null are excluded (Benford applies to
    * positive magnitudes). Output: (digit, n, observed, expected),
    * 9 rows, plus the shared `tvd` column. */
  /** k-anonymity report over quasi-identifier columns — the
    * re-identification-risk gate a governance pipeline runs before a
    * dataset (or its synthetic twin) is released: every row must hide
    * in a group of ≥ k rows sharing its quasi-identifier tuple.
    * Output is one row: total rows, distinct quasi groups, the
    * smallest group, rows whose group is below k, and their share.
    * Rows with a NULL in any quasi column form their own groups (NULL
    * is a disclosing value too). One groupBy over the quasi tuple
    * (distinct-tuple-bounded shuffle) + one scalar roll-up. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("__gn"))
      .agg(
        sum(col("__gn")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("__gn")).as("min_group_size"),
        coalesce(sum(when(col("__gn") < k, col("__gn"))), lit(0L))
          .as("rows_below_k"))
      .select(col("n_rows"), col("n_groups"), col("min_group_size"),
        col("rows_below_k"),
        round(col("rows_below_k").cast("double") /
          col("n_rows").cast("double"), 6).as("share_below_k"))
  }

  /** l-diversity report — [[kAnonymity]]'s companion gate: a
    * k-anonymous group whose SENSITIVE attribute is constant still
    * discloses that attribute for everyone in it (the homogeneity
    * attack), so each quasi-identifier group must also carry ≥ l
    * distinct sensitive values. Reports both the distinct form
    * (min distinct sensitive values over groups, rows in groups below
    * `l`) and the entropy form (min over groups of exp(H) — the
    * "effective number of sensitive values", 1.0 for a degenerate
    * single-value group, which a distinct count of near-unique but
    * 99%-skewed values would overstate). NULL sensitive values are a
    * disclosing value too and count as a value of their own; NULL
    * quasi columns form their own groups (the [[kAnonymity]]
    * convention). Scale shape: two keyed aggregations — shuffles
    * bounded by distinct (quasi, sensitive) tuples then distinct quasi
    * tuples — plus one scalar roll-up; nothing driver-side. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    val qs = quasiCols.map(col)
    val cells = df.groupBy((qs :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("__cn"))
    // per-group entropy without a per-row pass: H = ln(gn) − Σcn·ln(cn)/gn
    val groups = cells.groupBy(qs: _*)
      .agg(sum(col("__cn")).as("__gn"),
        count(lit(1)).as("__nd"),
        sum(col("__cn").cast("double") * log(col("__cn").cast("double")))
          .as("__sl"))
      .withColumn("__ent",
        log(col("__gn").cast("double")) - col("__sl") / col("__gn").cast("double"))
    groups.agg(
      sum(col("__gn")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      min(col("__nd")).as("min_distinct_l"),
      coalesce(sum(when(col("__nd") < l, col("__gn"))), lit(0L))
        .as("rows_below_l"),
      min(exp(col("__ent"))).as("__mel"))
      .select(col("n_rows"), col("n_groups"), col("min_distinct_l"),
        col("rows_below_l"),
        round(col("rows_below_l").cast("double") /
          col("n_rows").cast("double"), 6).as("share_below_l"),
        round(col("__mel"), 6).as("min_entropy_l"))
  }

  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    // leading digit of the decimal rendering: first char of the value
    // scaled into [1, 10) — digit-extraction via math, not strings, so
    // both engines compute it identically: d = floor(v / 10^floor(log10 v)).
    // The least/greatest clamps guard the 10^k edges: a one-ulp-low
    // log10 would scale v to exactly 10.0 (digit 10), and a v one ulp
    // BELOW a power of ten scales to 0.999… (digit 0, which would fall
    // out of the 1..9 report while still counting in the total); the
    // oracle applies the identical clamps.
    val lead = least(greatest(floor(v / pow(lit(10.0), floor(log10(v)))),
      lit(1.0)), lit(9.0)).cast("int")
    val counted = df.filter(v.isNotNull && v > 0)
      .select(lead.as("__d"))
      .groupBy("__d").agg(count(lit(1)).as("n"))
    val total = counted.agg(coalesce(sum("n"), lit(0L)).as("__tot"))
    val digits = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val per = digits
      .join(counted, col("digit") === col("__d"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        when(col("__tot") > 0,
          coalesce(col("n"), lit(0L)).cast("double") / col("__tot"))
          .otherwise(lit(0.0)).as("__obs"),
        log10(lit(1.0) + lit(1.0) / col("digit")).as("__exp"))
    val tvd = per.agg((sum(abs(col("__obs") - col("__exp"))) / 2.0).as("__tvd"))
    per.crossJoin(broadcast(tvd))
      .select(col("digit"), col("n"),
        round(col("__obs"), 6).as("observed"),
        round(col("__exp"), 6).as("expected"),
        round(col("__tvd"), 6).as("tvd"))
  }
}
