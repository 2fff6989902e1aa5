package graft.engine

import graft.SparkSpec

/** End-to-end reference-pipeline test on the reference's own fixture:
  * detect → profile → generate → validate, with the reference's
  * validation metrics enforced as tolerances (SURVEY.md §5). */
class SyntheticPipelineSpec extends SparkSpec {

  lazy val fixture = spark.read
    .option("header", "true").option("inferSchema", "true")
    .csv("/root/reference/customer_data_test.csv")

  lazy val result: SyntheticPipeline.Result = SyntheticPipeline.run(
    fixture,
    SyntheticPipeline.Config(
      detector = DetectorConfig(strictFormats = true),
      nSamples = 2000, seed = 42, maxTokens = 4, embedDim = 8))

  test("pipeline produces a synthetic frame with the source schema") {
    assert(result.synthetic.columns.sorted.toSeq === fixture.columns.sorted.toSeq)
    assert(result.synthetic.count() === 2000L)
  }

  test("numeric columns: generated moments within validation tolerance") {
    val v = result.validation("total_spent")
    val o = result.profiles("total_spent").numeric.get
    assert(v("mean_error") < o.std * 0.1, s"mean_error=${v("mean_error")}")
    assert(v("std_error") < o.std * 0.15, s"std_error=${v("std_error")}")
  }

  test("boolean column: true-probability preserved") {
    assert(result.validation("is_vip")("true_prob_error") < 0.05)
  }

  test("categorical column: distribution and top category preserved") {
    val v = result.validation("segment")
    assert(v("avg_prob_error") < 0.05)
    assert(v("top_category_match") === 1.0)
  }

  test("datetime columns generated in detected render format") {
    import org.apache.spark.sql.functions._
    val bad = result.synthetic
      .filter(!col("join_date").rlike("^\\d{4}-\\d{2}-\\d{2}$")).count()
    assert(bad === 0L)
    val v = result.validation("join_date")
    assert(v("mean_epoch_error") < result.profiles("join_date").datetime.get.epoch.std)
  }

  test("email/phone bootstrap: values drawn from source entries") {
    val emails = result.synthetic.select("email").distinct()
      .collect().map(_.getString(0)).toSet
    val source = result.profiles("email").rawSample.toSet
    assert(emails.subsetOf(source))
    assert(emails.size > 10)
  }

  test("text column synthesized via MVN decode from corpus vocabulary") {
    val sample = result.synthetic.select("feedback").limit(20)
      .collect().map(_.getString(0))
    assert(sample.forall(_ != null))
    assert(sample.exists(_.nonEmpty))
  }

  test("text/email/phone columns validate in embedding space") {
    // the reference validates these three types via vectorized moment
    // roll-ups (`Latanova_v1.py:430-454`) — metrics must exist and the
    // MVN text sampler must land near the profiled mean
    for (c <- Seq("feedback", "email", "phone")) {
      val v = result.validation.getOrElse(c, fail(s"no validation metrics for $c"))
      for (k <- Seq("mean_error", "std_error", "skew_error", "kurt_error"))
        assert(v.contains(k) && !v(k).isNaN, s"$c missing/NaN $k")
    }
    val feedback = result.validation("feedback")
    val o = result.profiles("feedback").text.get
    assert(feedback("mean_error") < math.max(0.05, math.abs(o.overallMean) * 0.5),
      s"mean_error=${feedback("mean_error")} overallMean=${o.overallMean}")
  }
}
