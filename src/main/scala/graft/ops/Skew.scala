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
