package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed —
  * the manual complement to AQE's skew-join splitting (which only
  * covers sort-merge joins after runtime stats): salt the skewed side,
  * explode the build side, join on (key, salt).
  *
  * At 100 TB a single hot key (the empty document, a default user id)
  * can put an entire shuffle partition on one task; salting fans that
  * key across `saltFactor` tasks deterministically. */
object Skew {

  /** Join `big` (skewed) with `small` on `key`: big rows get a random
    * salt in [0, saltFactor), small rows are replicated saltFactor
    * times — shuffle keys become (key, salt), splitting each hot key
    * across saltFactor reducers. Inner join semantics. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 8, seed: Long = 42L): DataFrame = {
    val salted = big.withColumn("__salt",
      (rand(seed) * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-k rows per group WITHOUT a per-group window funnel: a plain
    * `row_number().over(partitionBy(group))` puts every row of one
    * group in a single sort task — fatal when the group key is
    * low-cardinality (5 event types over 10¹⁰ rows = 5 tasks). Two
    * phases instead: rows first compete inside (group, salt) cells —
    * `saltBuckets` bounded tasks per group, each emitting its own
    * top-k — then only the ≤ k·saltBuckets survivors per group meet in
    * the final (tiny) per-group window. A group's global top-k rows
    * are top-k within their own salt cell, so the result is IDENTICAL
    * to the single-window form (parity spec; q14's oracle replays the
    * plain form unchanged).
    *
    * `orderCols` must totally order rows within a group (add a
    * tie-break column) for a deterministic result; `saltCol` is any
    * row-distinguishing column — salting hashes it, so results don't
    * depend on partitioning. Output = input columns + `rank` (1-based
    * within group). */
  def topKPerGroup(df: DataFrame, groupCol: String, saltCol: org.apache.spark.sql.Column,
                   k: Int, orderCols: Seq[org.apache.spark.sql.Column],
                   saltBuckets: Int = 32): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    require(saltBuckets > 0, s"saltBuckets must be > 0, got $saltBuckets")
    import org.apache.spark.sql.expressions.Window
    val salted = df.withColumn("__salt", pmod(xxhash64(saltCol), lit(saltBuckets)))
    val w1 = Window.partitionBy(col(groupCol), col("__salt")).orderBy(orderCols: _*)
    val cand = salted.withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k)
    val w2 = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
    cand.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .drop("__salt", "__r1")
  }

  /** Top-N heaviest keys with their share of rows — the diagnostic to
    * decide whether salting (or AQE skew handling) is worth it. */
  def keySkewReport(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    // total from a 1-row agg over the grouped counts (broadcast back in)
    // — a separate df.count() would scan the table twice
    val counts = df.groupBy(key).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", round(col("cnt") / col("__total"), 6))
      .drop("__total")
      // key tie-break: equal counts are common (uniform fixtures), and
      // an undetermined top-N cut would differ run-to-run and engine-
      // to-engine
      .orderBy(desc("cnt"), col(key))
      .limit(topN)
  }
}
