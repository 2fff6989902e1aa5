package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (0L until 2000L).map(i => (i, if (i % 4 == 0) "en" else "de"))
    .toDF("id", "lang")

  test("hashSample keeps ~fraction, deterministically, independent of partitioning") {
    val a = Sampling.hashSample(rows, "id", 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(rows.repartition(13), "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)                      // partition-independent
    assert(math.abs(a.size - 600) < 80)  // ~30% of 2000 (md5 is uniform-ish)
    // monotone: a smaller fraction is a subset of a larger one
    val small = Sampling.hashSample(rows, "id", 0.1).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a))
  }

  test("stratified sample applies per-stratum fractions and the default") {
    val out = Sampling.stratifiedHashSample(rows, "id", "lang",
      Map("en" -> 1.0), default = 0.0)
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs === Set("en"))
    assert(out.count() === 500) // fraction 1.0 keeps every en row
  }

  test("samplePerKey returns exactly n per key, stable across partitionings") {
    val a = Sampling.samplePerKey(rows, "lang", "id", 5)
    val counts = a.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts === Map("en" -> 5L, "de" -> 5L))
    val b = Sampling.samplePerKey(rows.repartition(7), "lang", "id", 5)
    assert(a.collect().map(_.getLong(0)).toSet === b.collect().map(_.getLong(0)).toSet)
  }

  test("hash bucket filter is a narrow plan (no shuffle)") {
    val plan = Sampling.hashSample(rows, "id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling should not shuffle:\n$plan")
  }
}
