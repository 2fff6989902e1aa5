package graft.expressions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column => SqlColumn}

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def dotCol(a: SqlColumn, b: SqlColumn): SqlColumn =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  private def normCol(a: SqlColumn): SqlColumn =
    GraftColumnBridge.column(L2Norm(GraftColumnBridge.expression(a)))

  test("dot matches the aggregate() HOF composition bit-for-bit") {
    val df = Seq(
      (Array(1.0, 0.0, 2.0), Array(0.5, -1.0, 1.5)),
      (Array(0.1, 0.2, 0.3), Array(0.9, -0.8, 0.7)),
      (Array(-1.0, 2.0, -3.0), Array(-1.0, 2.0, -3.0))).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0d), (acc, v) => acc + v)
    df.select(dotCol(col("a"), col("b")).as("native"), hof.as("hof"))
      .collect().foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
  }

  test("norm matches sqrt-of-sum-of-squares bit-for-bit; known values") {
    val df = Seq(Tuple1(Array(3.0, 4.0)), Tuple1(Array(0.0, 0.0)),
      Tuple1(Array(0.1, -0.2, 0.3))).toDF("a")
    val hof = sqrt(aggregate(transform(col("a"), x => x * x),
      lit(0.0d), (acc, v) => acc + v))
    val rows = df.select(normCol(col("a")).as("native"), hof.as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(rows(0).getDouble(0) === 5.0)
    assert(rows(1).getDouble(0) === 0.0)
  }

  test("null propagation and length-mismatch prefix semantics") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(10.0, 20.0))).toDF("a", "b")
    // min-length prefix: 1*10 + 2*20 = 50, the 3.0 tail ignored
    assert(df.select(dotCol(col("a"), col("b"))).collect()(0).getDouble(0) === 50.0)
    assert(df.select(dotCol(lit(null).cast("array<double>"), col("b")))
      .collect()(0).isNullAt(0))
    assert(df.select(normCol(lit(null).cast("array<double>")))
      .collect()(0).isNullAt(0))
  }

  test("whole-stage codegen path equals interpreted path") {
    val df = spark.range(50).select(
      transform(sequence(lit(0), lit(15)), i => rand(17) + i.cast("double")).as("a"),
      transform(sequence(lit(0), lit(15)), i => rand(18) - i.cast("double")).as("b"))
      .cache()
    try {
      val on = df.select(dotCol(col("a"), col("b")), normCol(col("a")))
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val off = df.select(dotCol(col("a"), col("b")), normCol(col("a")))
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
      assert(on.toSeq === off.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("SQL registration: graft_dot / graft_l2norm usable from spark.sql") {
    GraftExtensions.registerInto(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       graft_l2norm(array(3.0d, 4.0d)) AS n""".stripMargin).collect()(0)
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 5.0)
  }
}
