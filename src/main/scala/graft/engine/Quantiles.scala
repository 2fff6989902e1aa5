package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Exact distributed quantiles via range-partitioned sort + targeted
  * index lookup — O(n log n) shuffle but only the handful of rows at
  * the quantile positions ever reach the driver.
  *
  * Spark's built-in exact `percentile` aggregate buffers every value in
  * an in-memory map per aggregate (fine for grouped small states,
  * ~7 s for 600k ungrouped doubles); this sort path is the shape that
  * scales to 100 TB: sortBy is a distributed range sort, zipWithIndex
  * is metadata-only, and the filter ships ≤ 2·|ps| doubles.
  *
  * Interpolation is NumPy/DuckDB `quantile_cont` semantics:
  * h = (n−1)·p, v = v_lo + (v_hi − v_lo)·(h − ⌊h⌋). */
object Quantiles {

  def exact(df: DataFrame, colName: String, ps: Seq[Double], n: Long): Seq[Double] = {
    if (n == 0) return ps.map(_ => 0.0)
    val hs = ps.map(p => (n - 1) * p)
    val needed = hs.flatMap(h => Seq(math.floor(h).toLong, math.ceil(h).toLong)).toSet
    val vals: Map[Long, Double] = df
      .select(col(colName).cast("double")).na.drop
      .rdd.map(_.getDouble(0))
      .sortBy(identity)
      .zipWithIndex()
      .filter { case (_, i) => needed(i) }
      .map(_.swap)
      .collectAsMap().toMap
    hs.map { h =>
      val lo = math.floor(h).toLong
      val vlo = vals(lo); val vhi = vals(math.ceil(h).toLong)
      vlo + (vhi - vlo) * (h - lo)
    }
  }
}
