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

  test("weighted sample: matches the A-ES ground truth, favors heavy weights, stable under repartitioning") {
    val df = (1L to 1000L)
      .map(i => (i, if (i <= 100) 50.0 else 1.0)) // 100 heavy rows, 900 light
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 100)
      .collect().map(_.getLong(0)).toSet
    // local ground truth: same hash → u → key formula, k smallest
    // full-precision key — selection must NOT order on the rounded form
    // (quantized Exp(w) keys collapse into id-ordered ties)
    def key(id: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#ws42".getBytes("UTF-8"))
      val v = ((md(0) & 0xff) << 20) | ((md(1) & 0xff) << 12) |
        ((md(2) & 0xff) << 4) | ((md(3) & 0xff) >>> 4)
      -math.log((v.toDouble + 0.5) / 268435456.0) / w
    }
    val want = (1L to 1000L).map(i => (i, if (i <= 100) 50.0 else 1.0))
      .sortBy { case (i, w) => (key(i, w), i) }.take(100).map(_._1).toSet
    assert(got === want)
    // heavy rows are 50x likelier per draw — they dominate the sample
    assert(got.count(_ <= 100) > 50, s"heavy rows: ${got.count(_ <= 100)}")
    // partition-independent
    val again = Sampling.weightedSample(df.repartition(13), "id", "w", k = 100)
      .collect().map(_.getLong(0)).toSet
    assert(again === got)
    // zero/negative weights never sampled
    val withZero = df.withColumn("w", when(col("id") <= 900, col("w")).otherwise(lit(0.0)))
    val z = Sampling.weightedSample(withZero, "id", "w", k = 100)
      .collect().map(_.getLong(0))
    assert(z.forall(_ <= 900))
    // huge weights must not collapse selection to id order (regression:
    // rounding keys to 6dp before the top-k quantized them all to 0)
    val big = (1L to 1000L).map(i => (i, 1e8)).toDF("id", "w")
    val bigSel = Sampling.weightedSample(big, "id", "w", k = 50)
      .collect().map(_.getLong(0)).toSet
    assert(bigSel !== (1L to 50L).toSet, "selection degenerated to id order")
  }

  test("assignSplits: exhaustive, disjoint, ~proportional, stable under growth and partitioning") {
    import spark.implicits._
    val df = (1L to 2000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.assignSplits(df, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every row labeled with a declared label
    assert(got.size === 2000)
    assert(got.values.toSet === Set("train", "val", "test"))
    // roughly proportional (28-bit hash, generous tolerance)
    val counts = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 1600) < 120)
    assert(math.abs(counts("val") - 200) < 80)
    // stable: the same id keeps its split when the corpus grows or
    // the partitioning changes
    val grown = Sampling.assignSplits((1L to 4000L).toDF("id").repartition(7),
      "id", splits).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.forall { case (id, s) => grown(id) == s })
    // fractions must sum to 1
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(df, "id", Seq("a" -> 0.5, "b" -> 0.3))
    }
  }

  test("assignSplitsLeakageFree: near-dup clusters never straddle splits") {
    import spark.implicits._
    // 200 long docs (so one appended token flips few SimHash bits);
    // the first 40 get a near-copy
    def body(i: Long): String =
      (0 until 50).map(j => s"word${(i * 3 + j * 11) % 17}").mkString(" ") +
        s" marker$i"
    val base = (0L until 200L).map(i => (i, body(i)))
    val dups = (0L until 40L).map(i => (i + 10000L, body(i) + " nearmarker"))
    val df = (base ++ dups).toDF("doc_id", "text").repartition(8)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.assignSplitsLeakageFree(df, "doc_id", "text", splits)
      .select("doc_id", "rep", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size === 240)
    // THE property: every DETECTED near-dup pair shares rep and split
    // (detection is SimHash's recall, not this operator's contract)
    val pairs = Dedup.simhashNearDup(df, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length >= 20, s"fixture too weak: ${pairs.length} pairs")
    pairs.foreach { case (a, b) =>
      assert(out(a)._1 === out(b)._1, s"rep differs for pair ($a, $b)")
      assert(out(a)._2 === out(b)._2, s"split differs for pair ($a, $b)")
    }
    // docs in no pair are their own rep
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    out.foreach { case (id, (rep, _)) =>
      if (!paired.contains(id)) assert(rep === id) }
    // and the assignment matches assignSplits keyed on the rep
    val byRep = Sampling.assignSplits(
      out.values.map(_._1).toSeq.distinct.toDF("rep"), "rep", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.values.foreach { case (rep, split) => assert(byRep(rep) === split) }
  }
}
