package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot comparison — the "what changed between dataset version N
  * and N+1" primitive every periodically-refreshed corpus needs
  * (incremental re-training, cache invalidation, audit trails). The
  * reference regenerates its synthetic table wholesale each run
  * (`Latanova_v1.py:630-671`); at 100 TB a refresh must instead be
  * DIFFED so downstream stages reprocess only the delta.
  *
  * Scale shape: each side is first reduced to (key, fingerprint) —
  * one narrow projection, so the join shuffles key + 8 bytes per row
  * instead of the full row width — then a single full outer join on
  * the key classifies every row as added / removed / changed /
  * unchanged. No driver-side state; cost is two scans + one
  * key-partitioned shuffle regardless of column count.
  */
object Snapshot {

  /** Row-level delta between `oldDf` and `newDf`, keyed by `keyCols`.
    *
    * Output: the key columns plus `change` ∈
    * {'added','removed','changed'} (unchanged rows are dropped — at
    * scale they are the overwhelming majority and emitting them would
    * make the delta as large as the snapshot). Both inputs must have
    * the same non-key columns; rows with a null key are excluded (a
    * keyed diff is undefined without a key). Value comparison is
    * null-safe: a column going NULL→non-NULL (or back) counts as a
    * change, via a 64-bit fingerprint over all non-key columns
    * (internal to one Spark job, so engine-portability of the hash is
    * not required; the CLASSIFICATION is what an oracle replays).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val valueCols = oldDf.columns.filterNot(keyCols.contains).toSeq
    require(valueCols == newDf.columns.filterNot(keyCols.contains).toSeq,
      "snapshots must share the same non-key columns in the same order")
    val notNullKey = keyCols.map(col(_).isNotNull).reduce(_ && _)
    // xxhash64 hashes NULL to the seed, which would collide a NULL with
    // the absence of data; prefix each value with an is-null marker so
    // (NULL) and ('') fingerprint differently.
    def fp(df: DataFrame) = df.filter(notNullKey).select(
      keyCols.map(col) :+
        xxhash64(valueCols.flatMap(c =>
          Seq(col(c).isNull.cast("int"), col(c).cast("string"))): _*).as("__fp"): _*)
    val o = fp(oldDf).withColumnRenamed("__fp", "__fp_old")
    val n = fp(newDf).withColumnRenamed("__fp", "__fp_new")
    o.join(n, keyCols, "full_outer")
      .withColumn("change",
        when(col("__fp_old").isNull, lit("added"))
          .when(col("__fp_new").isNull, lit("removed"))
          .when(col("__fp_old") =!= col("__fp_new"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  /** One-row summary of a diff: counts per change class plus the
    * unchanged remainder (computable from the inputs without emitting
    * unchanged rows). */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame,
                  keyCols: Seq[String]): DataFrame = {
    val d = diff(oldDf, newDf, keyCols)
    d.agg(
      coalesce(sum(when(col("change") === "added", 1L)), lit(0L)).as("n_added"),
      coalesce(sum(when(col("change") === "removed", 1L)), lit(0L)).as("n_removed"),
      coalesce(sum(when(col("change") === "changed", 1L)), lit(0L)).as("n_changed"))
  }
}
