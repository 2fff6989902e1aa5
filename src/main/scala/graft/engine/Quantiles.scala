package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  def exact(df: DataFrame, colName: String, ps: Seq[Double], n: Long): Seq[Double] =
    exactExpr(df, col(colName), ps, n)

  /** Exact quantiles for MANY value expressions in ONE pass: the
    * columns explode into a narrow (column-id, value) stream, one
    * shuffle sorts each column's group (window row_number), and only
    * the rows at needed ranks survive to the driver. k separate
    * exactExpr calls re-deserialize and re-shuffle the frame k×3 times
    * (sortBy = sample + shuffle + index passes — measured 80 s for 10
    * columns at 600k rows vs ~8 s fused). */
  def exactMulti(df: DataFrame, values: Seq[(String, Column)],
                 ps: Seq[Double], ns: Map[String, Long]): Map[String, Seq[Double]] = {
    if (values.isEmpty) return Map.empty
    val needed: Seq[(String, Long)] = values.flatMap { case (name, _) =>
      val n = ns.getOrElse(name, 0L)
      if (n == 0) Nil
      else ps.flatMap { p =>
        val h = (n - 1) * p
        Seq(name -> math.floor(h).toLong, name -> math.ceil(h).toLong)
      }.distinct
    }
    if (needed.isEmpty) return values.map(_._1 -> ps.map(_ => 0.0)).toMap
    val spark = df.sparkSession
    val pairs = values.map { case (name, v) =>
      struct(lit(name).as("c"), v.cast("double").as("v"))
    }
    val long = df.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.c").as("c"), col("p.v").as("v"))
      .filter(col("v").isNotNull)
    val w = Window.partitionBy("c").orderBy("v")
    val ranked = long.withColumn("rn", (row_number().over(w) - 1).cast("long"))
    val neededDf = spark.createDataFrame(
      spark.sparkContext.parallelize(needed.map(x => org.apache.spark.sql.Row(x._1, x._2)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("rn", org.apache.spark.sql.types.LongType))))
    val vals: Map[(String, Long), Double] = ranked
      .join(broadcast(neededDf), Seq("c", "rn"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    values.map { case (name, _) =>
      val n = ns.getOrElse(name, 0L)
      name -> (if (n == 0) ps.map(_ => 0.0)
      else ps.map { p =>
        val h = (n - 1) * p
        val lo = math.floor(h).toLong
        val vlo = vals((name, lo)); val vhi = vals((name, math.ceil(h).toLong))
        vlo + (vhi - vlo) * (h - lo)
      })
    }.toMap
  }

  /** Same, over an arbitrary value expression (e.g. epoch seconds of a
    * parsed datetime column). */
  def exactExpr(df: DataFrame, value: org.apache.spark.sql.Column,
                ps: Seq[Double], n: Long): Seq[Double] = {
    if (n == 0) return ps.map(_ => 0.0)
    val hs = ps.map(p => (n - 1) * p)
    val needed = hs.flatMap(h => Seq(math.floor(h).toLong, math.ceil(h).toLong)).toSet
    val vals: Map[Long, Double] = df
      .select(value.cast("double").as("__q")).na.drop
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
