package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sampler tests: the reference's validation metrics
  * (`Latanova_v1.py:425-494`) enforced as assertions — distributional
  * parity, never bitwise (SURVEY.md §2.6). */
class GeneratorsSpec extends SparkSpec {

  private val n = 20000L

  test("Gaussian numeric: moments within tolerance, clipped, 2-dp floats") {
    val stats = NumericStats(mean = 100.0, std = 15.0, median = 100, min = 50, max = 150,
      skewness = 0, kurtosis = 0, q1 = 90, q3 = 110, count = n)
    val df = spark.range(n).select(Generators.numeric(stats, isInteger = false, seed = 7).as("x"))
    val r = row1(df.agg(avg("x").as("m"), stddev_pop("x").as("s"),
      min("x").as("lo"), max("x").as("hi")))
    assert(math.abs(r("m").asInstanceOf[Double] - 100.0) < 0.5)
    assert(math.abs(r("s").asInstanceOf[Double] - 15.0) < 0.5)
    assert(r("lo").asInstanceOf[Double] >= 50.0)
    assert(r("hi").asInstanceOf[Double] <= 150.0)
    // all values rounded to 2 decimals
    val bad = df.filter(col("x") =!= bround(col("x"), 2)).count()
    assert(bad === 0L)
  }

  test("Gaussian integer: integral output, clipped") {
    val stats = NumericStats(26.09, 14.49, 27, 1, 49, 0, 0, 14, 38, n)
    val df = spark.range(n).select(Generators.numeric(stats, isInteger = true, seed = 8).as("x"))
    val r = row1(df.agg(min("x").as("lo"), max("x").as("hi")))
    assert(r("lo").asInstanceOf[Long] >= 1L)
    assert(r("hi").asInstanceOf[Long] <= 49L)
  }

  test("Bernoulli boolean: probability and format rendering") {
    val stats = BooleanStats(trueProb = 0.3, trueCount = 30, falseCount = 70,
      count = 100, format = BoolFormat.YesNo)
    val df = spark.range(n).select(
      Generators.boolean(Some(stats), Some(BoolFormat.YesNo), seed = 9).as("b"))
    val vals = df.distinct().collect().map(_.getString(0)).toSet
    assert(vals.subsetOf(Set("Yes", "No")))
    val p = df.filter(col("b") === "Yes").count().toDouble / n
    assert(math.abs(p - 0.3) < 0.02)
  }

  test("categorical inverse-CDF sampler matches profile distribution") {
    val stats = CategoricalStats(
      categories = Seq("A", "B", "C"), probabilities = Seq(0.5, 0.3, 0.2),
      counts = Seq(50, 30, 20), mostCommon = "A", mostCommonProb = 0.5, count = 100)
    val df = Generators.categoricalFrame(spark, stats, n, seed = 10, "c")
    val counts = df.groupBy("c").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("A").toDouble / n - 0.5) < 0.02)
    assert(math.abs(counts("B").toDouble / n - 0.3) < 0.02)
    assert(math.abs(counts("C").toDouble / n - 0.2) < 0.02)
  }

  test("datetime sampler renders detected format and respects bounds") {
    val epoch = NumericStats(1.6e9, 86400.0 * 100, 1.6e9, 1.55e9, 1.65e9, 0, 0, 0, 0, n)
    val stats = DatetimeStats(epoch, "2019-02-13", "2022-04-19", "MM/DD/YYYY")
    val df = spark.range(1000).select(
      Generators.datetime(stats, Some("MM/DD/YYYY"), seed = 11).as("d"))
    val bad = df.filter(!col("d").rlike("^\\d{2}/\\d{2}/\\d{4}$")).count()
    assert(bad === 0L)
  }

  test("datetime sampler sigma=0 falls back to 30 days (Latanova_v1.py:411)") {
    val epoch = NumericStats(1.6e9, 0.0, 1.6e9, 1.55e9, 1.65e9, 0, 0, 0, 0, n)
    val stats = DatetimeStats(epoch, "", "", null)
    val df = spark.range(2000).select(Generators.datetime(stats, None, seed = 12).as("d"))
    // with the 30-day fallback the draws are not all the same value
    assert(df.distinct().count() > 10)
  }

  test("bootstrap resample draws only profiled entries") {
    val entries = Seq("a@x.com", "b@y.org", "c@z.net")
    val base = spark.range(500).toDF()
    val df = Generators.bootstrap(spark, base, entries, "e", seed = 13)
    assert(df.count() === 500L)
    val vals = df.select("e").distinct().collect().map(_.getString(0)).toSet
    assert(vals.subsetOf(entries.toSet))
  }

  test("pattern fallbacks have the documented shapes (Latanova_v1.py:310-316)") {
    val df = spark.range(200).select(
      Generators.emailFallback(14).as("e"), Generators.phoneFallback(14).as("p"))
    assert(df.filter(!col("e").rlike("^user\\d{4}@example\\.com$")).count() === 0L)
    assert(df.filter(!col("p").rlike("^\\+7 \\d{3} \\d{3}-\\d{2}-\\d{2}$")).count() === 0L)
  }
}
