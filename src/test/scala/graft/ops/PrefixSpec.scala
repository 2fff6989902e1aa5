package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixSpec extends SparkSpec {
  import spark.implicits._

  test("runningTotal matches the single-task window ground truth on shuffled multi-partition data") {
    val rnd = new scala.util.Random(13)
    val rows = rnd.shuffle((1L to 5000L).toList).map(i => (i, rnd.nextInt(100).toLong))
    val df = rows.toDF("k", "v").repartition(16)
    val got = Prefix.runningTotal(df, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = df.withColumn("cum",
      sum("v").over(org.apache.spark.sql.expressions.Window.orderBy("k")
        .rowsBetween(Long.MinValue, 0)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === want)
    // and the point: the distributed form plans NO Window operator
    val plan = Prefix.runningTotal(df, "k", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"prefix sum still windows:\n$plan")
  }

  test("runningTotal: null values count as 0, all columns survive") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("k", "v").withColumn("tag", concat(lit("row"), col("k")))
    val got = Prefix.runningTotal(df, "k", "v")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(got === Array((1L, "row1", 5L), (2L, "row2", 5L), (3L, "row3", 12L)))
  }

  test("packSequences: bins, offsets and boundary crossings from hand-computed layout") {
    // budget 10; docs of 4, 5, 3, 10, 0, 2 tokens at positions
    // [0,4) [4,9) [9,12) [12,22) [22,22) [22,24)
    val df = Seq((1L, 4L), (2L, 5L), (3L, 3L), (4L, 10L), (5L, 0L), (6L, 2L))
      .toDF("id", "n")
    val got = Prefix.packSequences(df, "id", "n", budget = 10)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("start_pos"), r.getAs[Long]("bin"),
        r.getAs[Long]("bin_offset"), r.getAs[Boolean]("crosses")))
    assert(got === Array(
      (1L, 0L, 0L, 0L, false),
      (2L, 4L, 0L, 4L, false),   // ends at 8 — fits
      (3L, 9L, 0L, 9L, true),    // 9..11 crosses into bin 1
      (4L, 12L, 1L, 2L, true),   // 12..21 crosses into bin 2
      (5L, 22L, 2L, 2L, false),  // empty doc never crosses
      (6L, 22L, 2L, 2L, false)))
  }
}
