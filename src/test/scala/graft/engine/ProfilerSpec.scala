package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** Profile parity against pandas/NumPy ground truth recorded in
  * FIXTURES.md / BASELINE.md (full 500 post-dropna rows). */
class ProfilerSpec extends SparkSpec {

  lazy val fixture: DataFrame = spark.read
    .option("header", "true").option("inferSchema", "true")
    .csv("/root/reference/customer_data_test.csv")
    .na.drop("any")

  lazy val profiles: Map[String, ColumnProfile] = {
    val detected = Detector.detect(fixture)
    Profiler.profileScalars(fixture, detected)
  }

  test("total_spent numeric profile matches pandas ground truth") {
    val p = profiles("total_spent").numeric.get
    assert(math.abs(p.mean - 2542.98) < 0.01)
    assert(math.abs(p.std - 1489.071) < 0.01)     // population std (ddof=0)
    assert(math.abs(p.median - 2569.495) < 0.01)  // exact linear interp
    assert(math.abs(p.q1 - 1181.767) < 0.01)
    assert(math.abs(p.q3 - 3878.62) < 0.01)
    assert(math.abs(p.min - 22.15) < 0.001)
    assert(math.abs(p.max - 4995.35) < 0.001)
    assert(p.count === 500L)
  }

  test("purchase_count and satisfaction_score population std") {
    val pc = profiles("purchase_count").numeric.get
    assert(math.abs(pc.mean - 26.09) < 0.01)
    assert(math.abs(pc.std - 14.491) < 0.01)
    val ss = profiles("satisfaction_score").numeric.get
    assert(math.abs(ss.mean - 5.552) < 0.01)
    assert(math.abs(ss.std - 2.908) < 0.01)
  }

  test("boolean profile counts true/false and detects native format") {
    val b = profiles("is_vip").boolean.get
    assert(b.trueCount + b.falseCount === 500L)
    assert(math.abs(b.trueProb - b.trueCount.toDouble / 500) < 1e-9)
    assert(b.format === BoolFormat.Native)
  }

  test("categorical profile: normalized value_counts over segment") {
    val c = Profiler.profileCategorical(fixture, "segment")
    assert(c.categories.toSet === Set("A", "B", "C"))
    assert(math.abs(c.probabilities.sum - 1.0) < 1e-9)
    assert(c.counts.sum === 500L)
    assert(c.mostCommon === c.categories.head)
    // descending count order
    assert(c.counts === c.counts.sorted.reverse)
  }

  test("correlationMatrix matches df.stat.corr pairwise, one row per unordered pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(2000)((rnd.nextGaussian(), rnd.nextGaussian(), rnd.nextGaussian()))
      .map { case (a, b, c) => (a, 0.7 * a + 0.3 * b, c) }
      .toDF("x", "y", "z").repartition(8)
    val got = Profiler.correlationMatrix(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === Set(("x", "y"), ("x", "z"), ("y", "z")))
    for (((a, b), v) <- got)
      assert(math.abs(v - df.stat.corr(a, b)) < 1e-6, s"corr($a,$b)")
    assert(got(("x", "y")) > 0.8) // strongly correlated by construction
    intercept[IllegalArgumentException] {
      Profiler.correlationMatrix(df, Seq("x"))
    }
  }

  test("winsorizedProfile clamps tails: hand-checked on a stream with planted outliers") {
    import spark.implicits._
    // 98 benign values + 2 huge outliers; p05/p95 cuts tame them
    val base = (1 to 98).map(_.toDouble)
    val df = (base ++ Seq(1e9, -1e9)).toDF("v").repartition(4)
    val r = row1(Profiler.winsorizedProfile(df, "v", 0.05, 0.95))
    assert(r("n") === 100L)
    val lo = r("lo_cut").asInstanceOf[Double]
    val hi = r("hi_cut").asInstanceOf[Double]
    assert(lo > 0 && hi < 100) // cuts inside the benign range
    val clipped = (base ++ Seq(1e9, -1e9)).map(v => math.max(lo, math.min(hi, v)))
    val mean = clipped.sum / clipped.size
    val std = math.sqrt(clipped.map(v => (v - mean) * (v - mean)).sum / clipped.size)
    assert(math.abs(r("mean").asInstanceOf[Double] - mean) < 1e-4)
    assert(math.abs(r("std").asInstanceOf[Double] - std) < 1e-4)
  }

  test("columnSummary: completeness, cardinality and entropy vs hand computation") {
    import spark.implicits._
    val df = Seq(("a", Some("x")), ("a", Some("y")), ("b", None),
      ("a", Some("x")), ("c", Some("z"))).toDF("k", "m").repartition(4)
    val got = Profiler.columnSummary(df, Seq("k", "m"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // k: a,a,b,a,c → H = ln 5 − (3·ln 3)/5
    val hk = math.log(5) - 3 * math.log(3) / 5
    assert(got("k")._1 === 5L && got("k")._2 === 0L && got("k")._3 === 3L)
    assert(math.abs(got("k")._4 - hk) < 1e-6)
    // m: x,y,x,z + one null → H = ln 4 − (2·ln 2)/4
    val hm = math.log(4) - 2 * math.log(2) / 4
    assert(got("m") === ((4L, 1L, 3L, BigDecimal(hm).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("madProfile: median/MAD and outlier flags vs hand computation") {
    import spark.implicits._
    // 1..9 plus one gross outlier; median = 5.5, deviations from 5.5
    // are 4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5 → MAD = 2.5
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).toDF("x").repartition(4)
    val r = Profiler.madProfile(df, "x", k = 3.0).collect()(0)
    assert(r.getLong(0) === 10L)
    assert(r.getDouble(1) === 5.5)
    assert(r.getDouble(2) === 2.5)
    // threshold = 3 · 1.4826 · 2.5 ≈ 11.12 → only 1000.0 flagged
    assert(r.getLong(3) === 1L)
    assert(r.getDouble(4) === 0.1)
  }

  test("madProfile: constant column has MAD 0 and no outliers") {
    import spark.implicits._
    val df = Seq.fill(8)(7.0).toDF("x")
    val r = Profiler.madProfile(df, "x").collect()(0)
    assert(r.getDouble(2) === 0.0)
    assert(r.getLong(3) === 0L)
  }

  test("datetime profile under strictFormats: ISO render format detected") {
    val detected = Detector.detect(fixture, DetectorConfig(strictFormats = true))
    val p = Profiler.profileScalars(fixture, detected)
    val d = p("join_date").datetime.get
    assert(d.format === "YYYY-MM-DD")
    assert(d.epoch.count === 500L)
    assert(d.minDate.startsWith("20"))
    assert(d.epoch.min <= d.epoch.max)
  }

  test("grouped trend recovers an exact linear relation per group") {
    import spark.implicits._
    // group a: y = 2x + 1 exactly; group b: y = -0.5x + 3 exactly
    val rows = (0 until 50).flatMap { i =>
      Seq(("a", i.toDouble, 2.0 * i + 1.0), ("b", i.toDouble, -0.5 * i + 3.0))
    }
    val got = Profiler.groupedTrend(rows.toDF("g", "x", "y"), "g",
      col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("a") === ((50L, 2.0, 1.0, 1.0)))
    assert(got("b") === ((50L, -0.5, 3.0, -1.0)))
  }

  test("partial moments merge to the direct single-pass profile bit-for-bit") {
    import spark.implicits._
    // integral values → DECIMAL partials: merging must be EXACT, so
    // the merged stats equal a one-shard (direct) computation on every
    // field including the unrounded doubles
    val df = (1L to 997L).map(i => (i % 7, (i * i) % 1000))
      .toDF("shard", "v").repartition(8)
    val merged = Profiler.mergeMoments(
      Profiler.partialMoments(df, "shard", "v")).collect()(0)
    val direct = Profiler.mergeMoments(
      Profiler.partialMoments(df.withColumn("shard", lit(0L)), "shard", "v"))
      .collect()(0)
    assert(merged === direct)
    // sanity on the values themselves
    val xs = (1L to 997L).map(i => ((i * i) % 1000).toDouble)
    assert(merged.getLong(0) === 997L)
    assert(math.abs(merged.getDouble(1) - xs.sum / xs.size) < 1e-6)
    assert(merged.getDouble(5) === xs.min && merged.getDouble(6) === xs.max)
    // a subset of shards is a valid profile of the subset
    val sub = Profiler.mergeMoments(
      Profiler.partialMoments(df.filter(col("shard") < 3), "shard", "v"))
      .collect()(0)
    assert(sub.getLong(0) === df.filter(col("shard") < 3).count())
  }
}
