package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the reference's single-table model never needed but a
  * query engine over event data does — most importantly the backward
  * as-of (point-in-time) join.
  *
  * Spark has no native as-of operator. Per the custom-op preference
  * order, tier (a) — composing existing operators — fully expresses the
  * semantics here, so no custom `SparkPlan` is warranted: tag both
  * inputs, union them, and take a running `last(..., ignoreNulls)` over
  * a (key, time)-sorted window. Physically that is ONE hash exchange on
  * the key and ONE within-partition sort — exactly the plan a dedicated
  * as-of physical operator would produce, with zero join-row explosion
  * (contrast the naive `l.join(r, key && rTime <= lTime)` + argmax,
  * which materializes |matches| rows per left row before pruning).
  *
  * Scale notes: cost is a sort-merge-join-shaped shuffle of |L| + |R|
  * rows. Per-key data must fit a task's sort spill budget (same
  * constraint as any windowed op); for a pathologically hot key, range
  * re-partitioning on (key, coarse time bucket) with per-bucket seed
  * carry-in is the standard fix — not needed at the fixture's
  * cardinalities and documented rather than speculatively built.
  */
object Temporal {

  /** Backward as-of join (pandas `merge_asof` direction="backward",
    * DuckDB `ASOF JOIN`): for every left row, attach `payloadCols` from
    * the right row with the greatest `rightTime <= leftTime` within the
    * same key. Left rows with no qualifying right row keep null payload
    * (left-outer semantics).
    *
    * Determinism: right rows tied on `rightTime` are resolved toward
    * the greatest `tieBreak` value, so results are stable across
    * partitionings and match an oracle's `ORDER BY time DESC, tieBreak
    * DESC LIMIT 1`.
    *
    * `tolerance`: optional maximum staleness. When set, a match older
    * than `leftTime - tolerance` is discarded (payload nulled) — e.g.
    * `expr("INTERVAL 7 DAYS")` for timestamp keys.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       payloadCols: Seq[String], tieBreak: String,
                       tolerance: Option[Column] = None): DataFrame = {
    val clash = payloadCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"payloadCols ${clash.mkString(", ")} already exist on the left side — " +
        "rename them on one side first (the output would be ambiguous)")
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    // __rt rides along for the tolerance check; payload fields keep
    // their own names (a payload column named like rightTime still
    // works — struct fields are positional within the struct)
    val payStruct = struct(
      (col(rightTime).as("__rt") +: col(tieBreak).as("__tb") +:
        payloadCols.map(col).toIndexedSeq): _*)
    val lu = left.select(col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__s"), leftStruct.as("__l"))
    val ru = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__s"), payStruct.as("__p"))
    val u = lu.withColumn("__p", lit(null).cast(ru.schema("__p").dataType))
      .unionByName(ru.withColumn("__l", lit(null).cast(lu.schema("__l").dataType)))
    // rows sorted (time, side, tieBreak): at equal time the right row
    // (side 0) precedes the left row it must be visible to (<= match);
    // among tied right rows the greatest tieBreak sorts last and wins
    // the running last().
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__s").asc, col("__p.__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__s") === 1)
    val fresh = tolerance match {
      case Some(tol) => col("__m").isNotNull && col("__m.__rt") >= col("__t") - tol
      case None      => col("__m").isNotNull
    }
    matched.select(
      (left.columns.map(c => col(s"__l.$c").as(c)) ++
        payloadCols.map(c => when(fresh, col(s"__m.$c")).as(c))).toIndexedSeq: _*)
  }
}
