package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrequentSpec extends SparkSpec {
  import spark.implicits._

  /** Naive ground truth: full groupBy + threshold. */
  private def naive(items: Seq[String], support: Double): Map[String, Long] = {
    val n = items.size
    val minCount = math.ceil(support * n).toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minCount).toMap
  }

  test("frequentItems is exact vs the naive full groupBy on a skewed stream") {
    val rnd = new scala.util.Random(7)
    // Zipf-ish: a few heavy items + a long tail of near-singletons
    val items = Seq.fill(40000) {
      val r = rnd.nextInt(100)
      if (r < 30) s"heavy${rnd.nextInt(5)}"
      else if (r < 60) s"mid${rnd.nextInt(50)}"
      else s"tail${rnd.nextInt(20000)}"
    }
    val df = items.toDF("x").repartition(16)
    val got = Frequent.frequentItems(df, col("x"), support = 0.005)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === naive(items, 0.005))
  }

  test("frequentItems: recall holds when a frequent item is spread thin across partitions") {
    // "needle" is 2% of the stream but never locally dominant in any
    // partition: one occurrence per 50-row slice, the MG eviction
    // worst case. The union-of-summaries guarantee must still find it.
    val items = (0 until 20000).map { i =>
      if (i % 50 == 0) "needle" else s"noise${i}"
    }
    val df = items.toDF("x").repartition(32)
    val got = Frequent.frequentItems(df, col("x"), support = 0.01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("needle" -> 400L))
  }

  test("frequentItems: nulls dropped, empty input and bad support handled") {
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("x")
    val got = Frequent.frequentItems(df, col("x"), support = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n = 3 non-null, minCount = 2: only "a"
    assert(got === Map("a" -> 2L))
    assert(Frequent.frequentItems(df.filter(col("x").isNull), col("x"), 0.5)
      .collect().isEmpty)
    intercept[IllegalArgumentException] {
      Frequent.frequentItems(df, col("x"), 0.0)
    }
  }

  test("frequentTokens agrees with the expression tokenizer's full count") {
    val docs = Seq(
      (1L, "the cat and the hat"),
      (2L, "the dog and a log"),
      (3L, "a cat, a hat -- and THE dog!")).toDF("id", "text")
    val got = Frequent.frequentTokens(docs, "text", support = 0.15)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = docs.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = all.values.sum
    val want = all.filter(_._2 >= math.ceil(0.15 * n).toLong)
    assert(got === want)
    assert(got.contains("the") && got.contains("and"))
  }

  test("coOccurrence counts keys sharing both items, presence-not-frequency") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view"), (1L, "view"), (1L, "buy"),     // repeat view counts once
      (2L, "view"), (2L, "buy"), (2L, "share"),
      (3L, "view"),                                // single item — no pairs
      (4L, "buy"), (4L, "share")).toDF("u", "t")
    val got = Frequent.coOccurrence(ev, "u", "t")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("buy", "view") -> 2L,     // users 1, 2
      ("buy", "share") -> 2L,    // users 2, 4
      ("share", "view") -> 1L))  // user 2
  }

  test("audienceOverlap: jaccard of audiences with exact sizes") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view"), (1L, "buy"),
      (2L, "view"), (2L, "buy"), (2L, "share"),
      (3L, "view"),
      (4L, "buy"), (4L, "share")).toDF("u", "t")
    val got = Frequent.audienceOverlap(ev, "u", "t")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // view={1,2,3}, buy={1,2,4}, share={2,4}
    assert(got(("buy", "view")) === ((2L, 3L, 3L, 0.5)))      // 2/(3+3-2)
    assert(got(("buy", "share")) === ((2L, 3L, 2L, round6(2.0 / 3))))
    assert(got(("share", "view")) === ((1L, 2L, 3L, 0.25)))   // 1/(2+3-1)
  }

  test("coOccurrence: block route matches the plain self-join under 50% skew") {
    // one bot key holds 400 items (50%+ of presence rows); normal keys 2-3
    val rnd = new scala.util.Random(11)
    val hot = (0 until 400).map(i => (0L, f"item$i%04d"))
    val normal = (1L to 200L).flatMap { k =>
      Seq.fill(2 + rnd.nextInt(2))((k, f"item${rnd.nextInt(400)}%04d"))
    }
    val ev = (hot ++ normal).toDF("u", "t").repartition(8)
    val plain = Frequent.coOccurrence(ev, "u", "t", heavyKeyItemBound = None)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val blockRoute = Frequent.coOccurrence(ev, "u", "t",
        heavyKeyItemBound = Some(50L), blockSize = 32)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(blockRoute === plain)
    assert(plain.size === 400 * 399 / 2) // the hot key alone spans all pairs
  }

  test("audienceOverlap: block route parity under the same skew") {
    val hot = (0 until 120).map(i => (0L, s"i$i"))
    val normal = (1L to 60L).map(k => (k, s"i${k % 120}"))
    val ev = (hot ++ normal).toDF("u", "t")
    val plain = Frequent.audienceOverlap(ev, "u", "t", heavyKeyItemBound = None)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val blocked = Frequent.audienceOverlap(ev, "u", "t",
        heavyKeyItemBound = Some(20L), blockSize = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(blocked === plain)
  }

  test("block route: no single task materializes a hot key's pair space") {
    // hot key: 400 items → 79,800 pairs. blockSize=32 → 13 blocks, 91
    // (blockA, blockB) cells of ≤ 32² = 1,024 pairs each; the join
    // partitioner spreads cells, so no task may hold even half the
    // pairs (the plain route would put ALL of them in one task).
    val ev = (0 until 400).map(i => (0L, f"item$i%04d")).toDF("u", "t")
    val a = Frequent.presenceRows(ev, "u", "t")
    val pairs = Frequent.blockedPairs(a, blockSize = 32)
    val perPartition = pairs.rdd
      .mapPartitions(it => Iterator(it.size.toLong)).collect()
    val total = perPartition.sum
    assert(total === 400L * 399 / 2)
    assert(perPartition.max < total / 2,
      s"one task held ${perPartition.max} of $total pairs — hot key not spread")
  }

  test("maxItemsPerKey caps each key to its globally-most-frequent items") {
    // global freq: a=3 keys, b=2, c=1 — key 1 has all three, cap 2 keeps a,b
    val ev = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a")).toDF("u", "t")
    val got = Frequent.coOccurrence(ev, "u", "t", maxItemsPerKey = Some(2))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("a", "b") -> 2L)) // c capped away everywhere it mattered
  }

  private def round6(x: Double): Double = math.round(x * 1e6) / 1e6

  test("frequentItemsByGroup is exact vs the naive per-group groupBy on skewed groups") {
    val rnd = new scala.util.Random(11)
    // one big group with its own head+tail, one tiny group whose head
    // would be globally rare — per-group support must surface it
    val big = Seq.fill(30000) {
      val r = rnd.nextInt(100)
      if (r < 25) s"bh${rnd.nextInt(4)}" else s"bt${rnd.nextInt(15000)}"
    }.map(("big", _))
    val tiny = Seq.fill(200)(
      if (rnd.nextInt(100) < 50) "tinyhead" else s"tt${rnd.nextInt(500)}")
      .map(("tiny", _))
    val all = rnd.shuffle(big ++ tiny)
    val df = all.toDF("g", "x").repartition(16)
    val got = Frequent.frequentItemsByGroup(df, col("g"), col("x"), 0.01)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val expected = all.groupBy(_._1).flatMap { case (g, xs) =>
      val minCount = math.ceil(0.01 * xs.size).toLong
      xs.groupBy(_._2).view.mapValues(_.size.toLong)
        .filter(_._2 >= minCount).map { case (x, c) => (g, x) -> c }
    }.toMap
    assert(got === expected)
    assert(got.keys.exists { case (g, x) => g == "tiny" && x == "tinyhead" })
    // tinyhead is ~100/30200 globally (< 1%): only per-group support finds it
    assert(Frequent.frequentItems(df.select(col("x")), col("x"), 0.01)
      .collect().forall(_.getString(0) != "tinyhead"))
  }

  test("frequentItemsByGroup: each group's result equals the global op run on that group alone") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(8000) {
      val g = s"g${rnd.nextInt(3)}"
      val x = if (rnd.nextInt(100) < 20) s"$g-head${rnd.nextInt(3)}"
              else s"t${rnd.nextInt(4000)}"
      (g, x)
    }
    val df = rows.toDF("g", "x").repartition(16)
    val grouped = Frequent.frequentItemsByGroup(df, col("g"), col("x"), 0.02)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val perGroup = Seq("g0", "g1", "g2").flatMap { g =>
      Frequent.frequentItems(df.filter(col("g") === g).select("x"), col("x"), 0.02)
        .collect().map(r => (g, r.getString(0)) -> r.getLong(1))
    }.toMap
    assert(grouped === perGroup)
  }

  test("frequentItemsByGroup: spread-thin recall per group, nulls dropped, bad support") {
    // the MG eviction worst case of the global spec, run inside each of
    // two interleaved groups: the needle is never locally dominant
    val items = (0 until 20000).flatMap { i =>
      val g = if (i % 2 == 0) "g0" else "g1"
      Seq((g, if (i % 50 == 0) "needle" else s"noise$i"))
    }
    val df = items.toDF("g", "x").repartition(32)
    val got = Frequent.frequentItemsByGroup(df, col("g"), col("x"), 0.01)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("g0", "needle") -> 400L)) // i%50==0 is always even
    val withNulls = Seq((null, "a"), ("g", null), ("g", "a"), ("g", "a"))
      .toDF("g", "x")
    assert(Frequent.frequentItemsByGroup(withNulls, col("g"), col("x"), 0.5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq(("g", "a", 2L)))
    intercept[IllegalArgumentException] {
      Frequent.frequentItemsByGroup(df, col("g"), col("x"), 1.5)
    }
  }
}
