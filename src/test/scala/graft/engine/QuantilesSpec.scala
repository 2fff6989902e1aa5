package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("sort-based exact quantiles match Spark's exact percentile bit-for-bit") {
    val df = spark.range(10007)
      .select((rand(3) * 1e5 - 5e4).as("x")).cache()
    try {
      val n = df.count()
      val ours = Quantiles.exact(df, "x", Seq(0.01, 0.25, 0.5, 0.75, 0.99), n)
      val builtin = df.agg(percentile(col("x"),
        array(lit(0.01), lit(0.25), lit(0.5), lit(0.75), lit(0.99))))
        .collect()(0).getSeq[Double](0)
      ours.zip(builtin).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToLongBits(a) ===
          java.lang.Double.doubleToLongBits(b), s"$a vs $b")
      }
    } finally df.unpersist()
  }

  test("edge cases: single row, exact-index quantiles, empty") {
    val one = Seq(42.0).toDF("x")
    assert(Quantiles.exact(one, "x", Seq(0.0, 0.5, 1.0), 1L) === Seq(42.0, 42.0, 42.0))
    // n=5, p=0.25 → h=1.0 exactly (no interpolation)
    val five = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("x")
    assert(Quantiles.exact(five, "x", Seq(0.25, 1.0), 5L) === Seq(2.0, 5.0))
    assert(Quantiles.exact(five.filter(col("x") > 99), "x", Seq(0.5), 0L) === Seq(0.0))
  }
}
