package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.InterleaveBits

/** Data-layout operators: how rows are arranged ON DISK decides how
  * much of 100 TB a query has to read. Sorting by a Z-order (Morton)
  * value clusters the table on two dimensions at once, so parquet
  * min/max footer statistics prune row groups for predicates on either
  * column — the complement to `Bucketing` (which optimizes joins) for
  * scan-heavy selective queries. */
object Layout {

  /** Z-value of two non-negative integral columns (low 32 bits each;
    * native codegen'd [[InterleaveBits]] kernel). Callers with skewed
    * or floating dimensions should bucketize/rank first — Z-order
    * clusters by BIT prefix, so dimensions should use comparable bit
    * ranges for balanced pruning. */
  def zvalue(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(InterleaveBits(
      org.apache.spark.sql.GraftColumnBridge.expression(a.cast("long")),
      org.apache.spark.sql.GraftColumnBridge.expression(b.cast("long"))))

  /** Re-layout a frame Z-ordered on two dimensions: range-partition by
    * Z-value (each output file owns a contiguous Z range ⇒ a tight
    * min/max box on BOTH dimensions), sort within partitions, and drop
    * the helper column. One shuffle at write time buys file-level
    * skipping on every subsequent scan. */
  def zorder(df: DataFrame, colA: String, colB: String,
             partitions: Int): DataFrame = {
    val z = df.withColumn("__z", zvalue(col(colA), col(colB)))
    z.repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
