package graft.expressions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

class DigitCountSpec extends SparkSpec {
  import spark.implicits._

  private def dc(c: org.apache.spark.sql.Column) =
    GraftColumnBridge.column(DigitCount(GraftColumnBridge.expression(c)))

  test("matches length(regexp_replace(s, \\D, '')) on ASCII, unicode, and empty strings") {
    val df = Seq("+7 (916) 123-45-67", "2022-02-21", "no digits here", "",
      "mixed ٣ unicode ١ digits 42", "émigré 123 café 45").toDF("s")
    val rows = df.select(
      dc(col("s")).as("native"),
      length(regexp_replace(col("s"), "\\D", "")).as("regex")).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1), r.toString))
  }

  test("null propagation and codegen on/off equality") {
    val df = Seq(Some("a1b2c3"), None).toDF("s")
    val on = df.select(dc(col("s"))).collect()
    assert(on(0).getInt(0) === 3)
    assert(on(1).isNullAt(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.select(dc(col("s"))).collect()
      assert(off(0).getInt(0) === 3 && off(1).isNullAt(0))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("SQL function graft_digit_count") {
    GraftExtensions.registerInto(spark)
    assert(spark.sql("SELECT graft_digit_count('tel: 555-0199')").collect()(0).getInt(0) === 7)
  }
}
