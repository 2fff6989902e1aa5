package graft.expressions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column => SqlColumn}

class HammingDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def hdCol(a: SqlColumn, b: SqlColumn): SqlColumn =
    GraftColumnBridge.column(HammingDistance(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  test("matches the zip_with/aggregate HOF composition exactly") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 40).map(_ =>
      (Array.fill(3)(rnd.nextLong()), Array.fill(3)(rnd.nextLong())))
    val df = rows.toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    df.select(hdCol(col("a"), col("b")).as("native"), hof.as("hof"))
      .collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // known values: identical arrays -> 0; one flipped bit -> 1
    val k = Seq((Array(5L, -7L), Array(5L, -7L)),
      (Array(0L), Array(1L)),
      (Array(-1L), Array(0L))).toDF("a", "b")
    assert(k.select(hdCol(col("a"), col("b"))).collect().map(_.getLong(0)).toSeq
      === Seq(0L, 1L, 64L))
  }

  test("null propagation and length-mismatch prefix semantics") {
    val df = Seq((Array(1L, 2L, 4L), Array(0L, 2L))).toDF("a", "b")
    // min-length prefix: bitCount(1^0) + bitCount(2^2) = 1
    assert(df.select(hdCol(col("a"), col("b"))).collect()(0).getLong(0) === 1L)
    assert(df.select(hdCol(lit(null).cast("array<bigint>"), col("b")))
      .collect()(0).isNullAt(0))
  }

  test("whole-stage codegen path equals interpreted path") {
    val rnd = new scala.util.Random(29)
    val df = (0 until 50).map(_ =>
      (Array.fill(4)(rnd.nextLong()), Array.fill(4)(rnd.nextLong())))
      .toDF("a", "b").cache()
    try {
      val on = df.select(hdCol(col("a"), col("b"))).collect().map(_.getLong(0))
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val off = df.select(hdCol(col("a"), col("b"))).collect().map(_.getLong(0))
      assert(on.toSeq === off.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("SQL registration: graft_hamming usable from spark.sql") {
    GraftExtensions.registerInto(spark)
    val r = spark.sql(
      "SELECT graft_hamming(array(CAST(0 AS BIGINT)), array(CAST(7 AS BIGINT))) AS h")
      .collect()(0)
    assert(r.getLong(0) === 3L)
  }
}
