package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.TextStats

/** Text-column profiling in embedding space
  * (`calculate_text_statistics`, `Latanova_v1.py:194-226`).
  *
  * Distributed layout: one map stage vectorizes entries (no shuffle),
  * then a single treeAggregate accumulates (n, Σx, Σxxᵀ) — mean vector
  * and sample covariance (np.cov ddof=1) in ONE pass. Per-dimension
  * std/skew/kurt roll-ups come from the same moment accumulator
  * (Σx², Σx³, Σx⁴ per dim). Everything that reaches the driver is
  * O(d²) for d = maxTokens·dim — scale-independent.
  */
object TextProfiler {

  /** Moment + covariance accumulator. d is maxTokens*dim. */
  private final class Acc(val d: Int) extends Serializable {
    var n: Long = 0L
    val s1 = new Array[Double](d)  // Σx
    val s2 = new Array[Double](d)  // Σx²
    val s3 = new Array[Double](d)  // Σx³
    val s4 = new Array[Double](d)  // Σx⁴
    val xxt = new Array[Double](d * d) // Σ x xᵀ (row-major, symmetric)
    def add(x: Array[Double]): Acc = {
      n += 1
      var i = 0
      while (i < d) {
        val v = x(i); val v2 = v * v
        s1(i) += v; s2(i) += v2; s3(i) += v2 * v; s4(i) += v2 * v2
        var j = i
        val base = i * d
        while (j < d) { xxt(base + j) += v * x(j); j += 1 }
        i += 1
      }
      this
    }
    def merge(o: Acc): Acc = {
      n += o.n
      var i = 0
      while (i < d) { s1(i) += o.s1(i); s2(i) += o.s2(i); s3(i) += o.s3(i); s4(i) += o.s4(i); i += 1 }
      i = 0
      while (i < d * d) { xxt(i) += o.xxt(i); i += 1 }
      this
    }
  }

  /** In-place lower Cholesky of a symmetric positive-definite matrix
    * (row-major d×d). Returns None if not PD — callers then use the
    * reference's iid-Gaussian fallback (`Latanova_v1.py:321-332`). */
  def cholesky(a: Array[Double], d: Int): Option[Array[Array[Double]]] = {
    val l = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        var s = a(i * d + j)
        var k = 0
        while (k < j) { s -= l(i)(k) * l(j)(k); k += 1 }
        if (i == j) {
          if (s <= 0.0 || s.isNaN) return None
          l(i)(i) = math.sqrt(s)
        } else l(i)(j) = s / l(j)(j)
        j += 1
      }
      i += 1
    }
    Some(l)
  }

  def profile(df: DataFrame, textCol: String, model: Embedder,
              maxTokens: Int, rawSampleCap: Int = 10000): Option[TextStats] = {
    val spark = df.sparkSession
    val d = maxTokens * model.dim
    val bcModel = spark.sparkContext.broadcast(model)

    val entries = df.filter(col(textCol).isNotNull)
      .select(col(textCol).cast("string"))
    val acc = entries.rdd
      .map(r => Vectorize.vectorizeLocal(bcModel.value, maxTokens)(r.getString(0)))
      .treeAggregate(new Acc(d))((a, x) => a.add(x), (a, b) => a.merge(b))
    if (acc.n == 0) return None

    val n = acc.n.toDouble
    val mean = acc.s1.map(_ / n)
    // population central moments per dim (np.std ddof=0; scipy g1/g2)
    val m2 = new Array[Double](d); val m3 = new Array[Double](d); val m4 = new Array[Double](d)
    var i = 0
    while (i < d) {
      val mu = mean(i)
      m2(i) = acc.s2(i) / n - mu * mu
      m3(i) = acc.s3(i) / n - 3 * mu * acc.s2(i) / n + 2 * mu * mu * mu
      m4(i) = acc.s4(i) / n - 4 * mu * acc.s3(i) / n + 6 * mu * mu * acc.s2(i) / n - 3 * mu * mu * mu * mu
      i += 1
    }
    val std = m2.map(v => math.sqrt(math.max(v, 0.0)))
    val skew = (0 until d).map(j => if (m2(j) > 0) m3(j) / math.pow(m2(j), 1.5) else 0.0)
    val kurt = (0 until d).map(j => if (m2(j) > 0) m4(j) / (m2(j) * m2(j)) - 3.0 else 0.0)

    // sample covariance (np.cov default ddof=1, `Latanova_v1.py:206`)
    // + the reference's 1e-6·I jitter before factorization (`:221,320`)
    val cov = new Array[Double](d * d)
    val denom = if (acc.n > 1) (n - 1.0) else 1.0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (acc.xxt(i * d + j) - n * mean(i) * mean(j)) / denom
        cov(i * d + j) = c; cov(j * d + i) = c
        j += 1
      }
      i += 1
    }
    var trace = 0.0
    i = 0; while (i < d) { trace += cov(i * d + i); i += 1 }
    val jittered = cov.clone()
    i = 0; while (i < d) { jittered(i * d + i) += 1e-6; i += 1 }
    val chol = cholesky(jittered, d)
    // logdet from the Cholesky we already have — O(d) instead of a
    // second O(d³) LU like np.linalg.det (SURVEY.md §4.4)
    val logDet = chol.map(l => 2.0 * (0 until d).map(j => math.log(l(j)(j))).sum)
      .getOrElse(Double.NaN)

    val raw = entries.limit(rawSampleCap).collect().map(_.getString(0)).toSeq
    Some(TextStats(
      dim = d,
      mean = mean, std = std,
      overallMean = mean.sum / d,
      overallStd = std.sum / d,
      overallSkew = skew.sum / d,
      overallKurt = kurt.sum / d,
      covTrace = trace,
      covLogDet = logDet,
      chol = chol,
      count = acc.n,
      rawSample = raw))
  }
}

/** Multivariate-Gaussian text synthesis + nearest-word decode
  * (`generate_synthetic_text`, `Latanova_v1.py:300-344`).
  * x = μ + L·z with z iid standard normal, per-row seeded — a pure
  * function of (seed, row id): embarrassingly parallel, reproducible,
  * no shuffle. Falls back to iid N(overall_mean, overall_std) when the
  * covariance is not PD, exactly like the reference (`:321-332`). */
object TextSynth {
  def generate(spark: SparkSession, stats: TextStats, vocab: Vocab,
               maxTokens: Int, n: Long, seed: Long): DataFrame = {
    val bcStats = spark.sparkContext.broadcast(stats)
    val bcVocab = spark.sparkContext.broadcast(vocab)
    val gen = udf { (id: Long) =>
      val st = bcStats.value
      val d = st.dim
      val rng = new java.util.Random(seed * 0x9E3779B97F4A7C15L + id)
      val x = new Array[Double](d)
      st.chol match {
        case Some(l) =>
          val z = Array.fill(d)(rng.nextGaussian())
          var i = 0
          while (i < d) {
            var s = st.mean(i)
            var k = 0
            while (k <= i) { s += l(i)(k) * z(k); k += 1 }
            x(i) = s
            i += 1
          }
        case None =>
          var i = 0
          while (i < d) { x(i) = st.overallMean + st.overallStd * rng.nextGaussian(); i += 1 }
      }
      bcVocab.value.decode(x, maxTokens)
    }
    spark.range(n).select(col("id"), gen(col("id")).as("value"))
  }
}
