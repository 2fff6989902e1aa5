package graft.expressions

import graft.{GraftExtensions, SparkSpec}
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the HOF composition bit-for-bit") {
    val df = Seq(
      (Array(1.0f, 0.0f, 2.0f), Array(0.5f, -1.0f, 1.5f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
      (Array(-1.0f, 2.0f, -3.0f), Array(-1.0f, 2.0f, -3.0f))).toDF("a", "b")
    val both = df.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null propagation and known values") {
    val df = Seq((Array(1.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
    val v = df.select(Similarity.cosine(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(math.abs(v - math.sqrt(2) / 2) < 1e-12)
    val withNull = df.select(Similarity.cosine(lit(null).cast("array<double>"), col("b")))
      .collect()(0)
    assert(withNull.isNullAt(0))
  }

  test("whole-stage codegen path produces the same results as interpreted") {
    val df = spark.range(100).select(
      transform(sequence(lit(0), lit(15)), i => rand(7) + i.cast("double")).as("a"),
      transform(sequence(lit(0), lit(15)), i => rand(8) - i.cast("double")).as("b"))
      .select(col("a"), col("b")).cache()
    try {
      val on = df.select(Similarity.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val off = df.select(Similarity.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
      assert(on.toSeq === off.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("SQL function registration: graft_cosine usable from spark.sql") {
    GraftExtensions.registerInto(spark)
    val v = spark.sql(
      "SELECT graft_cosine(array(1.0d, 2.0d, 3.0d), array(1.0d, 2.0d, 3.0d)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }
}
