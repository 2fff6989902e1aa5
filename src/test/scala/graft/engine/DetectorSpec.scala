package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Golden detection tests against the reference's own fixture
  * (`/root/reference/customer_data_test.csv`) — expected types verified
  * by executing the reference ladder (SURVEY.md §1, FIXTURES.md §1). */
class DetectorSpec extends SparkSpec {

  lazy val fixture: DataFrame = spark.read
    .option("header", "true").option("inferSchema", "true")
    .csv("/root/reference/customer_data_test.csv")
    .na.drop("any")

  test("fixture loads 500 rows post-dropna (Latanova_v1.py:14)") {
    assert(fixture.count() === 500L)
  }

  test("referenceCompat ladder reproduces the verified type map incl. phone quirk") {
    val types = Detector.detect(fixture, DetectorConfig())
      .map { case (n, (t, _)) => n -> t.name }
    val expected = Map(
      "customer_id" -> "integer", "name" -> "text", "email" -> "email",
      "phone" -> "phone",
      "address" -> "phone",        // SURVEY.md §1 quirk
      "join_date" -> "phone",      // ISO dates strip to 8 digits
      "last_purchase" -> "phone",
      "total_spent" -> "float", "purchase_count" -> "integer",
      "is_vip" -> "boolean", "segment" -> "categorical",
      "satisfaction_score" -> "integer", "feedback" -> "text")
    expected.foreach { case (c, t) =>
      assert(types(c) === t, s"column $c")
    }
  }

  test("strictFormats mode classifies dates and addresses correctly") {
    val types = Detector.detect(fixture, DetectorConfig(strictFormats = true))
      .map { case (n, (t, _)) => n -> t.name }
    assert(types("join_date") === "datetime")
    assert(types("last_purchase") === "datetime")
    assert(types("address") === "text")
    assert(types("email") === "email")
    assert(types("phone") === "phone")
    assert(types("total_spent") === "float")
  }

  test("boolean rule: <=3 normalized uniques within token set") {
    import spark.implicits._
    val df = Seq("Yes", "No", "yes", "NO", "Yes").toDF("b")
    val m = Detector.detect(df)
    assert(m("b")._1 === SemanticType.Boolean)
    assert(m("b")._2.boolFormat === BoolFormat.YesNo)
  }

  test("numeric-string rule: >=90% coercible strings split integer/float") {
    import spark.implicits._
    val ints = Seq("1", "2", "3", "4", "5", "6", "7", "8", "9", "x").toDF("c")
    assert(Detector.detect(ints)("c")._1 === SemanticType.Integer)
    val floats = Seq("1.5", "2.5", "3.5", "4.5", "5.5", "6.5", "7.5", "8.5", "9.5", "x").toDF("c")
    assert(Detector.detect(floats)("c")._1 === SemanticType.Float)
  }

  test("categorical rule: low unique ratio, under 50 distinct") {
    import spark.implicits._
    val df = (1 to 100).map(i => if (i % 2 == 0) "A" else "B").toDF("c")
    assert(Detector.detect(df)("c")._1 === SemanticType.Categorical)
  }

  test("all-null column is unknown") {
    import spark.implicits._
    val df = Seq[Option[String]](None, None).toDF("c")
    assert(Detector.detect(df)("c")._1 === SemanticType.Unknown)
  }

  test("approxDistinct two-tier mode classifies identically to exact mode") {
    import spark.implicits._
    // near-threshold columns: exactly-3-token boolean, 49-category
    // categorical, high-cardinality text — the cases where an HLL error
    // WOULD flip classification if not exact-refined
    val df = (0 until 2000).map { i =>
      (Seq("yes", "no", "y")(i % 3),
        s"cat${i % 49}",
        s"unique free text value number $i")
    }.toDF("b", "cat", "txt")
    val exact = Detector.detect(df, DetectorConfig())
      .map { case (n, (t, _)) => n -> t.name }
    val approx = Detector.detect(df, DetectorConfig(approxDistinct = true))
      .map { case (n, (t, _)) => n -> t.name }
    assert(approx === exact)
    assert(exact("b") === "boolean")
    assert(exact("cat") === "categorical")
    // low-cardinality columns are exact even in approx mode
    val sig = Detector.signals(df, DetectorConfig(approxDistinct = true))
      .map(s => s.name -> s).toMap
    assert(sig("b").nDistinctNorm === 3L)
    assert(sig("cat").nDistinct === 49L)
  }

  test("lenient date formats: slashed ISO, dotted, English month names") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ok = Seq("2024/01/03", "03.01.2024", "Jan 3, 2024", "3 Jan 2024",
      "2024-01-03", "01/03/2024")
    val bad = Seq("Jan 33, 2024", "hello world", "{\"k\":3}", "13.45")
    val got = (ok ++ bad).toDF("c")
      .select(col("c"), Detector.tryParseDate(col("c")).isNotNull.as("p"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    ok.foreach(s => assert(got(s), s"should parse: $s"))
    bad.foreach(s => assert(!got(s), s"should NOT parse: $s"))
    // a column of month-name dates classifies datetime in strict mode
    val df = Seq("Jan 3, 2024", "Feb 14, 2023", "Mar 1, 2022", "Dec 31, 2021").toDF("d")
    assert(Detector.detect(df, DetectorConfig(strictFormats = true))("d")._1
      === SemanticType.Datetime)
  }

  test("boolean coercion expression matches reference token sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("true", "YES", "1", "t", "Y", "false", "no", "0", "f", "N", "maybe")
      .toDF("c").select(Detector.coerceBoolean(col("c")).as("b"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(got.toSeq === Seq(true, true, true, true, true,
      false, false, false, false, false, null))
  }
}
