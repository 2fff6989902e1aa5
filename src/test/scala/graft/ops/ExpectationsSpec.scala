package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some(10.0), "ok"),
    (Some(2L), Some(-5.0), "ok"),   // violates positive
    (Some(2L), None, "bad"),        // null value passes positive; dup key
    (None, Some(3.0), "ok")         // null key
  ).toDF("k", "v", "s")

  test("checkRows: one fused scan, NULL predicate input passes") {
    val got = Expectations.checkRows(df, Seq(
      Expectations.rowRule("positive(v)", col("v") > 0),
      Expectations.rowRule("notnull(k)", col("k").isNotNull),
      Expectations.rowRule("ok(s)", col("s") === "ok")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("positive(v)") === ((4L, 1L, 0.75)))  // only -5.0; NULL passes
    assert(got("notnull(k)") === ((4L, 1L, 0.75)))
    assert(got("ok(s)") === ((4L, 1L, 0.75)))
  }

  test("checkUnique: duplicated keys count every carrying row; null keys excluded") {
    val r = Expectations.checkUnique(df, Seq("k")).collect()(0)
    // 3 non-null-key rows; key 2 occurs twice → 2 violating rows
    assert((r.getString(0), r.getLong(1), r.getLong(2)) ===
      (("unique(k)", 3L, 2L)))
  }

  test("report unions row rules and uniqueness rules") {
    val rules = Expectations.report(df,
      Seq(Expectations.rowRule("positive(v)", col("v") > 0)),
      uniqueKeys = Seq(Seq("k")))
      .collect().map(_.getString(0)).sorted
    assert(rules === Array("positive(v)", "unique(k)"))
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.checkRows(df, Seq(
        Expectations.rowRule("r", col("v") > 0),
        Expectations.rowRule("r", col("v") < 0)))
    }
  }
}
