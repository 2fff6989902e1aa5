package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class BoundedTopKSpec extends SparkSpec {
  import spark.implicits._

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val agg = GraftColumnBridge.column(
      BoundedTopK(GraftColumnBridge.expression(col("sim")),
        GraftColumnBridge.expression(col("id")), k).toAggregateExpression())
    df.groupBy("g").agg(agg.as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        col("e.id").as("id"), col("e.sim").as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
  }

  test("matches the rank-window ground truth on random data with heavy ties, across partitions") {
    val rnd = new scala.util.Random(23)
    // heavy ties: sims drawn from 7 distinct values over 3 groups —
    // the id-ascending tie-break carries most of the ordering
    val rows = (0 until 3000).map { i =>
      (i.toLong % 3, i.toLong, rnd.nextInt(7) / 7.0)
    }
    val df = rows.toDF("g", "id", "sim").repartition(13) // force merges
    val got = topk(df, 10)
    val w = Window.partitionBy("g").orderBy(desc("sim"), col("id"))
    val want = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("g"), col("rank").cast("long"), col("id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got === want)
    assert(got.size === 30)
  }

  test("groups smaller than k emit all rows in order; null and NaN sims are skipped") {
    val df = Seq(
      (0L, 1L, Some(0.5)), (0L, 2L, Some(0.9)), (0L, 3L, None),
      (0L, 4L, Some(Double.NaN)), (1L, 5L, Some(0.1)))
      .toDF("g", "id", "sim")
      .select(col("g"), col("id"), col("sim").cast("double").as("sim"))
    val got = topk(df, 10)
    assert(got === Set((0L, 1L, 2L, 0.9), (0L, 2L, 1L, 0.5), (1L, 1L, 5L, 0.1)))
  }
}
