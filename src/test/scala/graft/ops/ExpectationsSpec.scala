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

  test("checkReferential counts orphans; null FKs excluded; parent dups harmless") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 1L, 2L, 3L).toDF("pk") // dup parent key
    val got = Expectations.checkReferential(child, "fk", parent, "pk")
      .collect()(0)
    assert(got.getString(0) === "ref(fk -> pk)")
    assert(got.getLong(1) === 4L)          // null FK excluded from n
    assert(got.getLong(2) === 1L)          // only 9 is an orphan
    assert(math.abs(got.getDouble(3) - 0.75) < 1e-9)
  }

  test("benford: exact Benford sample scores tvd 0; skewed sample flagged") {
    import spark.implicits._
    // construct counts proportional to Benford within rounding: digit d
    // appears round(1000*log10(1+1/d)) times, value d*10^(i mod 3)
    val rows = for {
      d <- 1 to 9
      n = math.round(1000 * math.log10(1.0 + 1.0 / d)).toInt
      i <- 0 until n
    } yield d * math.pow(10.0, i % 3)
    val good = Expectations.benford(rows.toDF("v"), "v").collect()
    assert(good.length === 9)
    val tvd = good.head.getDouble(4)
    assert(tvd < 0.001, s"benford-like sample scored tvd=$tvd")
    // digit extraction: n for digit 1 equals its planted count
    val n1 = good.find(_.getInt(0) == 1).get.getLong(1)
    assert(n1 === math.round(1000 * math.log10(2.0)))
    // all-nines sample: tvd = 1 - p(9) share accounting → large
    val bad = Expectations.benford(
      Seq.fill(100)(9000.0).toDF("v"), "v").collect()
    assert(bad.head.getDouble(4) > 0.5)
    // zero/negative/null excluded
    val edge = Expectations.benford(
      Seq(Some(-5.0), Some(0.0), None, Some(100.0)).toDF("v"), "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(edge(1) === 1L && edge.values.sum === 1L)
  }

  test("kAnonymity: group accounting, below-k rows, null quasi values") {
    val rows = Seq(
      ("us", "a"), ("us", "a"), ("us", "a"),   // group of 3
      ("us", "b"), ("us", "b"),                // group of 2
      ("de", "a"),                             // singleton
      (null, "a")                              // NULL quasi: own group
    ).toDF("country", "seg")
    val r = Expectations.kAnonymity(rows, Seq("country", "seg"), k = 3)
      .collect()(0)
    assert(r.getLong(0) === 7L)          // n_rows
    assert(r.getLong(1) === 4L)          // n_groups
    assert(r.getLong(2) === 1L)          // min_group_size
    assert(r.getLong(3) === 4L)          // rows below k=3: 2 + 1 + 1
    assert(math.abs(r.getDouble(4) - 4.0 / 7.0) < 1e-6)
    // fully anonymous at k=2 when every group has >= 2 rows
    val ok = Expectations.kAnonymity(
      rows.filter(col("seg") === "a" && col("country") === "us"),
      Seq("country"), k = 2).collect()(0)
    assert(ok.getLong(3) === 0L && ok.getDouble(4) === 0.0)
    intercept[IllegalArgumentException] {
      Expectations.kAnonymity(rows, Seq.empty, 3)
    }
  }

  test("lDiversity: distinct and entropy forms, degenerate and null-sensitive groups") {
    val rows = Seq(
      // group (us): 4 rows, sensitive = x,x,y,z -> nd=3, H = ln4 - (2ln2)/4
      ("us", "x"), ("us", "x"), ("us", "y"), ("us", "z"),
      // group (de): DEGENERATE, all same sensitive value -> nd=1, exp(H)=1
      ("de", "x"), ("de", "x"), ("de", "x"),
      // group (fr): nd=2 with a NULL sensitive value counted as a value
      ("fr", "x"), ("fr", null)
    ).toDF("country", "sens")
    val r = Expectations.lDiversity(rows, Seq("country"), "sens", l = 3)
      .collect()(0)
    assert(r.getLong(0) === 9L)          // n_rows
    assert(r.getLong(1) === 3L)          // n_groups
    assert(r.getLong(2) === 1L)          // min_distinct_l (the degenerate group)
    assert(r.getLong(3) === 5L)          // rows below l=3: de(3) + fr(2)
    assert(math.abs(r.getDouble(4) - 5.0 / 9.0) < 1e-6)
    // min entropy-l comes from the degenerate group: exp(0) = 1 exactly
    assert(r.getDouble(5) === 1.0)

    // without the degenerate group the entropy min is the skew-aware
    // one: group (us) has exp(ln4 - 2*ln(2)/4) < 3 despite nd=3
    val r2 = Expectations.lDiversity(rows.filter(col("country") =!= "de"),
      Seq("country"), "sens", l = 2).collect()(0)
    assert(r2.getLong(2) === 2L)
    val hUs = math.log(4) - 2 * math.log(2) / 4
    val expected = math.min(math.exp(hUs), math.exp(math.log(2)))
    assert(math.abs(r2.getDouble(5) -
      BigDecimal(expected).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)

    intercept[IllegalArgumentException] {
      Expectations.lDiversity(rows, Seq("country"), "sens", l = 1)
    }
  }
}
