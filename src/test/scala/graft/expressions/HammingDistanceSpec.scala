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

  test("null ELEMENT in a compared slot -> null (HOF parity), both exec paths") {
    // graft_hamming is a registered SQL function: arbitrary arrays with
    // null slots can reach it (binarySign never emits them). Reading a
    // null slot via getLong would silently yield an arbitrary word; the
    // contract is the HOF form's: element null poisons the sum -> null.
    GraftExtensions.registerInto(spark)
    val cases = Seq(
      ("SELECT graft_hamming(array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT)), " +
        "array(CAST(0 AS BIGINT), CAST(0 AS BIGINT))) AS h", true),
      ("SELECT graft_hamming(array(CAST(1 AS BIGINT), CAST(0 AS BIGINT)), " +
        "array(CAST(0 AS BIGINT), CAST(NULL AS BIGINT))) AS h", true),
      // null element BEYOND the min-length compared prefix is ignored
      ("SELECT graft_hamming(array(CAST(1 AS BIGINT)), " +
        "array(CAST(0 AS BIGINT), CAST(NULL AS BIGINT))) AS h", false))
    // literal arrays constant-fold -> the INTERPRETED nullSafeEval runs
    cases.foreach { case (sql, expectNull) =>
      assert(spark.sql(sql).collect()(0).isNullAt(0) === expectNull, sql)
    }
    // non-literal data -> the GENERATED loop runs (both codegen modes)
    val df = Seq(
      (Seq[Option[Long]](Some(1L), None), Seq[Option[Long]](Some(0L), Some(0L)), true),
      (Seq[Option[Long]](Some(1L)), Seq[Option[Long]](Some(0L), None), false))
      .toDF("a", "b", "expect_null").cache()
    try for (wholeStage <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      df.select(hdCol(col("a"), col("b")).as("h"), col("expect_null"))
        .collect().foreach(r =>
          assert(r.isNullAt(0) === r.getBoolean(1), s"wholeStage=$wholeStage"))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      df.unpersist(); ()
    }
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
