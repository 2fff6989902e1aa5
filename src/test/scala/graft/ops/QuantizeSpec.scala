package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
    (2L, Array(2.0f, 2.0f, -2.0f, 1.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)),      // zero vector: scale 0
    (4L, Array(1e-4f, -3e-5f, 5e-5f, -1e-4f)) // tiny magnitudes
  ).toDF("vec_id", "embedding")

  test("int8Symmetric: scale, clamp range, zero vector, and round-trip error") {
    val out = Quantize.int8Symmetric(vecs, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(out.length === 4)
    val byId = out.map(r => r.getLong(0) -> r).toMap

    // scale = max|v| / 127
    assert(math.abs(byId(1L).getDouble(1) - 1.0 / 127.0) < 1e-15)
    assert(math.abs(byId(2L).getDouble(1) - 2.0 / 127.0) < 1e-15)
    assert(byId(3L).getDouble(1) === 0.0)

    // extreme components hit exactly ±127; zero vector quantizes to 0s
    assert(byId(1L).getSeq[Byte](2) === Seq[Byte](64, -127, 32, 0))
    assert(byId(2L).getSeq[Byte](2) === Seq[Byte](127, 127, -127, 64))
    assert(byId(3L).getSeq[Byte](2) === Seq[Byte](0, 0, 0, 0))
    assert(byId(3L).getDouble(4) === 0.0) // err_l2
    out.foreach { r =>
      r.getSeq[Byte](2).foreach(q => assert(q >= -127 && q <= 127))
      assert(r.getInt(3) === 0) // n_clipped: clamp never truncates info here
    }

    // dequantized residual stays within the quantizer's error bound:
    // |v_i - q_i*scale| <= scale/2 per component (no clipping)
    val deq = Quantize.dequantize(
      Quantize.int8Symmetric(vecs, "vec_id", "embedding"), "qvec", "scale")
      .select(col("vec_id"), col("vec"), col("scale")).orderBy("vec_id").collect()
    val orig = vecs.orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    deq.foreach { r =>
      val vs = orig(r.getLong(0)); val scale = r.getDouble(2)
      r.getSeq[Double](1).zip(vs).foreach { case (d, v) =>
        assert(math.abs(d - v) <= scale / 2 + 1e-12)
      }
    }
  }

  test("int8Symmetric is a pure projection: no shuffle in the plan") {
    val plan = Quantize.int8Symmetric(vecs, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("int8TopK: exact parity with local quantized cosine; high float recall") {
    val rnd = new scala.util.Random(11)
    val data = (0L until 60L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val q = data.filter(col("vec_id") < 3)
    val c = data.filter(col("vec_id") >= 3)
    val out = Quantize.int8TopK(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 5).orderBy("query_id", "rank").collect()
    assert(out.length === 15)

    // local ground truth over the same quantizer
    val local = (0L until 60L).map { i =>
      val v = data.collect().find(_.getLong(0) == i).get.getSeq[Float](1)
        .map(_.toDouble)
      val amax = v.map(math.abs).max
      val scale = amax / 127.0
      i -> v.map(x =>
        math.min(math.max(math.floor(x / scale + 0.5), -127.0), 127.0)).toArray
    }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    (0L until 3L).foreach { qid =>
      val want = (3L until 60L).map(cid => (cid, cos(local(qid), local(cid))))
        .sortBy { case (cid, s) => (-s, cid) }.take(5)
      val got = out.filter(_.getLong(0) == qid)
        .map(r => (r.getLong(2), r.getDouble(3)))
      assert(got.map(_._1).toSeq === want.map(_._1).toSeq, s"query $qid ranks")
      got.zip(want).foreach { case ((_, gs), (_, ws)) =>
        assert(math.abs(gs - ws) < 1e-12) }
    }

    // quantized ranking stays close to the float ranking (recall@5 vs
    // float top-5: at 16 dims with int8 precision, expect most overlap)
    val floatData = data.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    (0L until 3L).foreach { qid =>
      val floatTop = (3L until 60L)
        .map(cid => (cid, cos(floatData(qid), floatData(cid))))
        .sortBy { case (cid, s) => (-s, cid) }.take(5).map(_._1).toSet
      val got = out.filter(_.getLong(0) == qid).map(_.getLong(2)).toSet
      assert((floatTop & got).size >= 3, s"query $qid recall too low")
    }
  }

  private def l2sq(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("pqTrain/pqEncode: codes are the true per-subspace argmin; " +
    "empty clusters keep their centroid") {
    val rnd = new scala.util.Random(7)
    val data = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val dim = 8; val m = 2; val sub = dim / m
    val cb = Quantize.pqTrain(data, "vec_id", "embedding",
      dim = dim, m = m, k = 4, iterations = 2)
    val cbL = cb.collect().map(r => (r.getInt(0), r.getLong(1)) ->
      r.getSeq[Double](2).toArray).toMap
    assert(cbL.size === m * 4)
    assert(cbL.keys.map(_._1).toSet === Set(0, 1))

    val codes = Quantize.pqEncode(data, "vec_id", "embedding", cb, dim, m)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(codes.size === 40 * m)
    val local = data.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    codes.foreach { case ((id, s), code) =>
      val sv = local(id).slice(s * sub, s * sub + sub)
      val want = cbL.collect { case ((ss, cid), cv) if ss == s =>
        (cid, l2sq(sv, cv)) }.toSeq.sortBy { case (cid, d) => (d, cid) }.head._1
      assert(code === want, s"vector $id subspace $s")
    }
  }

  test("pqTopKAdc: adist equals the sum of per-subspace code distances; " +
    "reasonable recall vs exact float top-k") {
    val rnd = new scala.util.Random(13)
    val data = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val q = data.filter(col("vec_id") < 3)
    val c = data.filter(col("vec_id") >= 3)
    val dim = 8; val m = 2; val sub = dim / m
    val out = Quantize.pqTopKAdc(q, c, "vec_id", "embedding",
      "vec_id", "embedding", dim, m, k = 4, iterations = 2, topK = 5)
      .orderBy("query_id", "rank").collect()
    assert(out.length === 15)

    // replay: codebook + codes from the same deterministic training
    val cb = Quantize.pqTrain(c, "vec_id", "embedding", dim, m, 4, 2)
    val cbL = cb.collect().map(r => (r.getInt(0), r.getLong(1)) ->
      r.getSeq[Double](2).toArray).toMap
    val codes = Quantize.pqEncode(c, "vec_id", "embedding", cb, dim, m)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val local = data.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    out.foreach { r =>
      val (qid, nid) = (r.getLong(0), r.getLong(2))
      val want = (0 until m).map { s =>
        val qsv = local(qid).slice(s * sub, s * sub + sub)
        l2sq(qsv, cbL((s, codes((nid, s)))))
      }.sum
      assert(math.abs(r.getDouble(3) - want) < 1e-9, s"adist $qid->$nid")
    }

    // ADC ranking approximates the exact L2 ranking. With 2 subspaces
    // x 4 centroids there are only 16 distinct code words for 57
    // vectors — uniform random data is PQ's worst case — so assert an
    // AGGREGATE overlap floor, not per-query recall.
    val totalOverlap = (0L until 3L).map { qid =>
      val exact = (3L until 60L).map(cid =>
        (cid, l2sq(local(qid), local(cid))))
        .sortBy { case (cid, d) => (d, cid) }.take(5).map(_._1).toSet
      val got = out.filter(_.getLong(0) == qid).map(_.getLong(2)).toSet
      (exact & got).size
    }.sum
    assert(totalOverlap >= 3, s"aggregate recall $totalOverlap/15 too low")
  }

  test("pqTopKAdc plan: codebook and distance tables broadcast, " +
    "no cartesian product") {
    val rnd = new scala.util.Random(5)
    val data = (0L until 30L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val plan = Quantize.pqTopKAdc(
      data.filter(col("vec_id") < 2), data.filter(col("vec_id") >= 2),
      "vec_id", "embedding", "vec_id", "embedding",
      dim = 8, m = 2, k = 4, iterations = 1, topK = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }

  test("pqRecallAudit: recall bounded in [0,1]; degenerate PQ " +
    "(every vector its own centroid) recalls exactly 1") {
    val rnd = new scala.util.Random(23)
    val data = (0L until 20L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val q = data.filter(col("vec_id") < 3)
    val c = data.filter(col("vec_id") >= 3)
    val coarse = Quantize.pqRecallAudit(q, c, "vec_id", "embedding",
      "vec_id", "embedding", dim = 8, m = 2, k = 4, iterations = 1, topK = 5)
      .collect()
    assert(coarse.length === 3)
    coarse.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 5L)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
    // m=1, k=|corpus|, 0 Lloyd rounds: every corpus vector seeds its
    // own centroid, codes identify vectors, ADC distance IS the exact
    // L2 distance -> recall must be exactly 1 for every query
    val exact = Quantize.pqRecallAudit(q, c, "vec_id", "embedding",
      "vec_id", "embedding", dim = 8, m = 1, k = 17, iterations = 0, topK = 5)
      .collect()
    exact.foreach { r =>
      assert(r.getLong(1) === 5L, s"query ${r.getLong(0)}")
      assert(r.getDouble(2) === 1.0)
    }
  }

  test("nCentroidsFor: constant cell size, floor clamp, sqrt growth past the soft cap") {
    // benchmark-scale corpora stay on the historical K = 16 floor
    assert(Quantize.nCentroidsFor(500L) === 16)
    assert(Quantize.nCentroidsFor(2000L) === 16)
    // past the floor the cell size pins at ~cellTarget (ceil division)
    assert(Quantize.nCentroidsFor(20000L) === 160)
    assert(Quantize.nCentroidsFor(20001L) === 161)
    // the soft cap is CONTINUOUS at the crossover: want = maxC gives
    // exactly maxC (n = maxC·cellTarget = 512000)
    assert(Quantize.nCentroidsFor(4096L * 125L) === 4096)
    // past the cap K grows as sqrt(want·maxC) — neither pinned (the
    // linear-cell-regrowth trap) nor linear (the broadcast blowup):
    // at 100× the crossover corpus, K ≈ 10·maxC and cells ≈
    // 10·cellTarget — each side carries sqrt(100) of the growth
    val kBig = Quantize.nCentroidsFor(100L * 4096L * 125L)
    assert(kBig === math.ceil(math.sqrt(409600.0 * 4096.0)).toInt) // 40960
    val cellBig = (100L * 4096L * 125L).toDouble / kBig
    assert(cellBig > 1100 && cellBig < 1300) // ~10·cellTarget
    // per-query candidate growth is sqrt(n/crossover), NOT n/crossover:
    // ×250 data (the r14 verdict's trap point) costs ~×16 candidates
    val n250 = 250L * 4096L * 125L
    val cand250 = n250.toDouble / Quantize.nCentroidsFor(n250)
    assert(cand250 / 125.0 > 10 && cand250 / 125.0 < 20)
    // monotone in n across the crossover
    val ks = Seq(400000L, 512000L, 600000L, 5120000L, 51200000L)
      .map(Quantize.nCentroidsFor(_).toLong)
    assert(ks === ks.sorted)
    intercept[IllegalArgumentException](Quantize.nCentroidsFor(10L, 0L))
  }

  test("int8TopKAuto route invariance: the IVF route probing every cell " +
    "returns the exact kernel's ranking") {
    val rnd = new scala.util.Random(31)
    val data = (0L until 50L).map(i =>
      (i, Array.fill(12)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val q = data.filter(col("vec_id") < 3)
    val c = data.filter(col("vec_id") >= 3)
    val exact = Quantize.int8TopK(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 5).orderBy("query_id", "rank").collect()
    // maxExactRows = 0 forces the scale route; nprobe = nCentroids
    // probes every cell, so the only difference left is the kernel
    val routed = Quantize.int8TopKAuto(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 5, maxExactRows = 0L,
      nCentroids = 8, nprobe = 8).orderBy("query_id", "rank").collect()
    assert(routed.length === exact.length)
    exact.zip(routed).foreach { case (e, r) =>
      assert((e.getLong(0), e.getInt(1), e.getLong(2)) ===
        (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(math.abs(e.getDouble(3) - r.getDouble(3)) < 1e-9)
    }
    // default threshold keeps the small corpus on the exact kernel
    val small = Quantize.int8TopKAuto(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 5).orderBy("query_id", "rank").collect()
    exact.zip(small).foreach { case (e, s) =>
      assert(e.getLong(2) === s.getLong(2) &&
        math.abs(e.getDouble(3) - s.getDouble(3)) < 1e-15)
    }
  }

  test("int8TopKAuto gate: size hint skips the probe; routed plan is the " +
    "IVF shape; null vectors don't inflate the routing count") {
    val rnd = new scala.util.Random(37)
    val data = (0L until 40L).map(i =>
      (i, if (i >= 30L && i % 2 == 0) null
          else Array.fill(12)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val q = data.filter(col("vec_id") < 3 && col("embedding").isNotNull)
    val c = data.filter(col("vec_id") >= 3)
    // a trusted size hint below the threshold keeps the exact kernel
    // regardless of the actual (larger) corpus
    val hinted = Quantize.int8TopKAuto(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 5, maxExactRows = 10L,
      corpusSizeHint = Some(5L))
    assert(!hinted.queryExecution.optimizedPlan.toString.contains("centroid_id"))
    // the probe counts NON-NULL vectors: 32 non-null corpus rows with
    // maxExactRows = 32 stays exact even though the corpus has 37 rows
    val cNonNull = c.filter(col("embedding").isNotNull).count()
    val atBound = Quantize.int8TopKAuto(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 5, maxExactRows = cNonNull)
    assert(!atBound.queryExecution.optimizedPlan.toString.contains("centroid_id"))
    // one below routes to IVF — the plan carries the centroid machinery
    // and the quadratic kernel is gone
    val routed = Quantize.int8TopKAuto(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 5, maxExactRows = cNonNull - 1,
      nCentroids = 8, nprobe = 8)
    assert(routed.queryExecution.optimizedPlan.toString.contains("centroid_id"))
  }

  test("pqRecallAudit refuses an unsampled oversized exact side") {
    val rnd = new scala.util.Random(41)
    val data = (0L until 30L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Quantize.pqRecallAudit(
        data.filter(col("vec_id") < 5), data.filter(col("vec_id") >= 5),
        "vec_id", "embedding", "vec_id", "embedding",
        dim = 8, m = 2, k = 4, iterations = 1, topK = 5,
        maxExactCompares = 10L)
    }
    assert(e.getMessage.contains("SAMPLED"))
  }

  test("ivfPqTopKAdc: probing every cell equals the full-scan ADC; " +
    "pruned probes return a subset ranking with bounded loss") {
    val rnd = new scala.util.Random(43)
    val data = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val q = data.filter(col("vec_id") < 3)
    val c = data.filter(col("vec_id") >= 3)
    val full = Quantize.pqTopKAdc(q, c, "vec_id", "embedding",
      "vec_id", "embedding", 8, 2, k = 4, iterations = 2, topK = 5)
      .orderBy("query_id", "rank").collect()
    val allCells = Quantize.ivfPqTopKAdc(q, c, "vec_id", "embedding",
      "vec_id", "embedding", 8, 2, k = 4, iterations = 2,
      nCells = 4, nProbe = 4, topK = 5).orderBy("query_id", "rank").collect()
    assert(allCells.length === full.length)
    full.zip(allCells).foreach { case (f, a) =>
      assert((f.getLong(0), f.getInt(1), f.getLong(2)) ===
        (a.getLong(0), a.getInt(1), a.getLong(2)))
      assert(math.abs(f.getDouble(3) - a.getDouble(3)) < 1e-9)
    }
    // pruned: every returned neighbor must carry the same adist the
    // full scan assigns it (pruning changes WHICH candidates are
    // scored, never their scores)
    val pruned = Quantize.ivfPqTopKAdc(q, c, "vec_id", "embedding",
      "vec_id", "embedding", 8, 2, k = 4, iterations = 2,
      nCells = 4, nProbe = 2, topK = 5).collect()
    val fullD = Quantize.pqTopKAdc(q, c, "vec_id", "embedding",
      "vec_id", "embedding", 8, 2, k = 4, iterations = 2, topK = 57)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    pruned.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(fullD.contains(key), s"pruned neighbor $key unknown to full scan")
      assert(math.abs(fullD(key) - r.getDouble(3)) < 1e-9)
    }
    pruned.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 5 && rs.nonEmpty)
    }
  }

  test("ivfPqTopKAdc rejects nProbe > nCells") {
    intercept[IllegalArgumentException] {
      Quantize.ivfPqTopKAdc(vecs, vecs, "vec_id", "embedding",
        "vec_id", "embedding", 4, 2, 2, 1, nCells = 2, nProbe = 3, topK = 1)
    }
  }

  test("pqTrain rejects dims not divisible by m") {
    intercept[IllegalArgumentException] {
      Quantize.pqTrain(vecs, "vec_id", "embedding",
        dim = 4, m = 3, k = 2, iterations = 1)
    }
  }

  test("err_l2 matches a local recomputation") {
    val out = Quantize.int8Symmetric(vecs, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    val orig = vecs.orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    out.foreach { r =>
      val vs = orig(r.getLong(0)).map(_.toDouble)
      val scale = r.getDouble(1)
      val qs = r.getSeq[Byte](2)
      val want =
        if (scale == 0.0) 0.0
        else math.sqrt(vs.zip(qs).map { case (v, q) =>
          val d = v - q * scale; d * d
        }.sum)
      assert(math.abs(r.getDouble(4) - BigDecimal(want)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  // --- binary (1-bit) sign quantization + Hamming ANN ---

  private def localWords(v: Array[Double]): Array[Long] = {
    val n = math.ceil(v.length / 32.0).toInt
    val words = new Array[Long](n)
    v.zipWithIndex.foreach { case (x, i) =>
      if (x > 0.0) words(i / 32) |= 1L << (i % 32)
    }
    words
  }

  test("binarySign: packed words match a local bit computation") {
    val rnd = new scala.util.Random(7)
    // 70 dims: exercises a full word, a partial word, and the 3-word
    // boundary arithmetic; include exact zeros (tie -> bit 0)
    val data = (0L until 20L).map(i =>
      (i, Array.fill(70)(if (rnd.nextInt(5) == 0) 0.0f
                         else rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val out = Quantize.binarySign(data, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    val orig = data.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out.length === 20)
    out.foreach { r =>
      val v = orig(r.getLong(0)).map(_.toDouble).toArray
      assert(r.getSeq[Long](1) === localWords(v).toSeq)
      assert(r.getInt(2) === v.count(_ > 0.0))
    }
  }

  test("binarySign is a pure projection: no shuffle; empty vector packs empty") {
    val df = Seq((1L, Array.empty[Float]), (2L, Array(1.0f))).toDF("vec_id", "embedding")
    val out = Quantize.binarySign(df, "vec_id", "embedding")
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = out.orderBy("vec_id").collect()
    assert(rows(0).getSeq[Long](1).isEmpty && rows(0).getInt(2) === 0)
    assert(rows(1).getSeq[Long](1) === Seq(1L) && rows(1).getInt(2) === 1)
  }

  test("hammingDist matches local popcount of differing sign bits") {
    val a = Array(0.3, -0.2, 0.0, 1.5, -4.0)
    val b = Array(-0.3, -0.2, 2.0, 1.5, 4.0)
    val df = Seq((localWords(a), localWords(b))).toDF("wa", "wb")
    val got = df.select(Quantize.hammingDist(col("wa"), col("wb"))).head().getLong(0)
    val want = a.zip(b).count { case (x, y) => (x > 0) != (y > 0) }
    assert(got === want.toLong)
  }

  test("hammingTopK with cand = |corpus| equals the exact cosine top-k") {
    val rnd = new scala.util.Random(23)
    val data = (0L until 50L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val q = data.filter(col("vec_id") < 4)
    val c = data.filter(col("vec_id") >= 4)
    // rerank over ALL candidates reduces stage 1 to a no-op filter, so
    // the two-stage contract must collapse to the exact brute force
    val got = Quantize.hammingTopK(q, c, "vec_id", "embedding",
        "vec_id", "embedding", k = 8, cand = 46)
      .select("query_id", "rank", "neighbor_id", "sim")
      .orderBy("query_id", "rank").collect()
    val want = Similarity.bruteForceTopK(q, c, "vec_id", "embedding",
        "vec_id", "embedding", k = 8)
      .orderBy("query_id", "rank").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) === w.getLong(0))
      assert(g.getInt(1) === w.getInt(1))
      assert(g.getLong(2) === w.getLong(2))
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-12)
    }
  }

  test("hammingTopK: narrow candidate sets keep high recall and bounded size") {
    val rnd = new scala.util.Random(31)
    val data = (0L until 120L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val q = data.filter(col("vec_id") < 5)
    val c = data.filter(col("vec_id") >= 5)
    val approx = Quantize.hammingTopK(q, c, "vec_id", "embedding",
        "vec_id", "embedding", k = 10, cand = 40).collect()
    val exact = Similarity.bruteForceTopK(q, c, "vec_id", "embedding",
        "vec_id", "embedding", k = 10).collect()
    assert(approx.groupBy(_.getLong(0)).forall(_._2.length == 10))
    val overlap = approx.map(r => (r.getLong(0), r.getLong(2))).toSet
      .intersect(exact.map(r => (r.getLong(0), r.getLong(2))).toSet).size
    // SRP on random 64-dim vectors: Hamming top-40 of 115 recovers most
    // of the cosine top-10 (deterministic given the fixed seed)
    assert(overlap >= 35, s"recall too low: $overlap / 50")
  }

  test("hammingTopK rejects cand < k") {
    intercept[IllegalArgumentException] {
      Quantize.hammingTopK(vecs, vecs, "vec_id", "embedding",
        "vec_id", "embedding", k = 5, cand = 4)
    }
  }

  test("hammingTopKIvf: probing every cell equals the flat scan; pruned probes stay k-bounded") {
    val rnd = new scala.util.Random(37)
    val data = (0L until 120L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val q = data.filter(col("vec_id") < 5)
    val c = data.filter(col("vec_id") >= 5)
    // nprobe = nCentroids scans every cell: identical contract to the
    // flat route (same candidate set, same rerank)
    val full = Quantize.hammingTopKIvf(q, c, "vec_id", "embedding",
        "vec_id", "embedding", k = 8, cand = 30, nCentroids = 8, nprobe = 8)
      .orderBy("query_id", "rank").collect()
    val flat = Quantize.hammingTopK(q, c, "vec_id", "embedding",
        "vec_id", "embedding", k = 8, cand = 30)
      .orderBy("query_id", "rank").collect()
    assert(full.length === flat.length)
    full.zip(flat).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0))
      assert(a.getInt(1) === b.getInt(1))
      assert(a.getLong(2) === b.getLong(2))
      assert(a.getLong(3) === b.getLong(3))
      assert(math.abs(a.getDouble(4) - b.getDouble(4)) < 1e-12)
    }
    // pruned: k rows per query, each from the probed subset
    val pruned = Quantize.hammingTopKIvf(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 8, cand = 30, nCentroids = 8, nprobe = 2)
      .collect()
    assert(pruned.groupBy(_.getLong(0)).forall(_._2.length == 8))
    intercept[IllegalArgumentException] {
      Quantize.hammingTopKIvf(q, c, "vec_id", "embedding",
        "vec_id", "embedding", k = 8, cand = 30, nCentroids = 4, nprobe = 5)
    }
  }

  test("hammingTopKAuto: gate routes by corpus size; routes agree at full probe") {
    val rnd = new scala.util.Random(41)
    val data = (0L until 120L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val q = data.filter(col("vec_id") < 5)
    val c = data.filter(col("vec_id") >= 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          math.rint(r.getDouble(4) * 1e9))).toSeq
    // small corpus (LIMIT-bounded probe counts 115 <= threshold) -> flat
    val small = rows(Quantize.hammingTopKAuto(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 8, cand = 30, maxFlatRows = 1000L,
      nCentroids = 8, nprobe = 8))
    val flat = rows(Quantize.hammingTopK(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 8, cand = 30))
    assert(small === flat)
    // over threshold -> IVF route; at nprobe = nCentroids every cell is
    // probed, so the gate flipping routes cannot change results
    val big = rows(Quantize.hammingTopKAuto(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 8, cand = 30, maxFlatRows = 10L,
      nCentroids = 8, nprobe = 8))
    assert(big === flat)
    // corpusSizeHint skips the probe and decides the route alone
    val hinted = rows(Quantize.hammingTopKAuto(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 8, cand = 30, maxFlatRows = 10L,
      nCentroids = 8, nprobe = 8, corpusSizeHint = Some(5L)))
    assert(hinted === flat)
  }

  test("binary ANN routes drop null-vector rows instead of failing") {
    val rnd = new scala.util.Random(71)
    val good = (0L until 40L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val data = (good :+ ((999L, null.asInstanceOf[Array[Float]])))
      .toDF("vec_id", "embedding")
    val q = data.filter(col("vec_id") < 3)
    val c = data.filter(col("vec_id") >= 3) // includes the null row
    val flat = Quantize.hammingTopK(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 5, cand = 10).collect()
    assert(flat.groupBy(_.getLong(0)).forall(_._2.length == 5))
    assert(!flat.exists(_.getLong(2) == 999L))
    val ivf = Quantize.hammingTopKIvf(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 5, cand = 10, nCentroids = 4, nprobe = 4)
      .collect()
    assert(ivf.groupBy(_.getLong(0)).forall(_._2.length == 5))
    assert(!ivf.exists(_.getLong(2) == 999L))
  }

  test("binary ANN plans: no CartesianProduct; candidate scan is the broadcast nested loop") {
    val rnd = new scala.util.Random(59)
    val data = (0L until 80L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val q = data.filter(col("vec_id") < 3)
    val c = data.filter(col("vec_id") >= 3)
    val flat = Quantize.hammingTopK(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 5, cand = 20)
      .queryExecution.executedPlan.toString
    assert(!flat.contains("CartesianProduct"), flat)
    assert(flat.contains("BroadcastNestedLoopJoin"), flat)
    val ivf = Quantize.hammingTopKIvf(q, c, "vec_id", "embedding",
      "vec_id", "embedding", k = 5, cand = 20, nCentroids = 4, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!ivf.contains("CartesianProduct"), ivf)
  }
}
