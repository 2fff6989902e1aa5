package graft.text

import graft.SparkSpec

/** Embedding pipeline units: tokenize/vectorize/cholesky/decode
  * (`Latanova_v1.py:23-62,194-226,300-344`). */
class TextPipelineSpec extends SparkSpec {

  private val model = EmbeddingModel(dim = 8, seed = 42L)

  test("tokenizer: gensim-simple_preprocess semantics (len 2-15, letters only)") {
    assert(Tokenize.tokensLocal("Hi, the quick-brown Fox! a 12 ok")
      === Seq("hi", "the", "quick", "brown", "fox", "ok"))
  }

  test("vectorize: first maxTokens token vectors, zero-padded concat") {
    val v = Vectorize.vectorizeLocal(model, maxTokens = 4)("hello world")
    assert(v.length === 32)
    assert(v.slice(0, 8).toSeq === model.lookup("hello").toSeq)
    assert(v.slice(8, 16).toSeq === model.lookup("world").toSeq)
    assert(v.slice(16, 32).forall(_ == 0.0)) // padding
    // deterministic across calls
    assert(v.toSeq === Vectorize.vectorizeLocal(model, 4)("hello world").toSeq)
  }

  test("cholesky: L*L^T reconstructs the input, rejects non-PD") {
    val a = Array(4.0, 2.0, 2.0, 3.0) // [[4,2],[2,3]]
    val l = TextProfiler.cholesky(a, 2).get
    val rec = Array(
      l(0)(0) * l(0)(0), l(0)(0) * l(1)(0),
      l(0)(0) * l(1)(0), l(1)(0) * l(1)(0) + l(1)(1) * l(1)(1))
    a.zip(rec).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
    assert(TextProfiler.cholesky(Array(1.0, 2.0, 2.0, 1.0), 2).isEmpty) // not PD
  }

  test("vocab top-k decode returns nearest words by cosine") {
    val words = Array("alpha", "beta", "gamma")
    val vecs = words.map(model.lookup)
    val vocab = new Vocab(words, vecs, model.dim)
    // querying with a word's own vector must return that word first
    assert(vocab.topK(model.lookup("beta"), 1).head === "beta")
    val decoded = vocab.decode(
      model.lookup("alpha") ++ model.lookup("gamma"), maxTokens = 2)
    assert(decoded === "alpha gamma")
  }

  test("batched decode ≡ per-slice topK(3).head (incl. zero slices and ties)") {
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon")
    val m = Md5Embedder(4)
    val vocab = new Vocab(words, words.map(m.lookup), m.dim)
    val rng = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val mt = 1 + rng.nextInt(4)
      val v = Array.fill(mt * m.dim)(rng.nextDouble() * 2 - 1)
      if (rng.nextBoolean()) // zero out a slice: decode must skip it
        java.util.Arrays.fill(v, 0, m.dim, 0.0)
      val slices = (0 until mt).map(s =>
        java.util.Arrays.copyOfRange(v, s * m.dim, (s + 1) * m.dim))
      val expect = slices.flatMap(s => vocab.topK(s, 3).headOption).mkString(" ")
      assert(vocab.decode(v, mt) === expect)
    }
    // vector built FROM vocab words round-trips exactly
    assert(vocab.decode(m.lookup("delta") ++ m.lookup("beta"), 2) === "delta beta")
  }

  test("full-width profile: 32 tokens x 100 dims = 3200-dim covariance path") {
    // the reference's real shape (fasttext D=100, maxTokens=32 →
    // (32·100)² covariance) — exercises the treeAggregate accumulator
    // and the driver Cholesky at the width production would use
    import spark.implicits._
    val wide = Md5Embedder(100)
    val docs = (1 to 60).map(i =>
      (0 until 40).map(j => s"w${(i * 7 + j * 3) % 23}").mkString(" "))
      .toDF("text")
    val t0 = System.nanoTime()
    val stats = TextProfiler.profile(docs, "text", wide, maxTokens = 32,
      rawSampleCap = 1).get
    val dt = (System.nanoTime() - t0) / 1e9
    info(f"3200-dim profile took $dt%.1f s")
    assert(stats.dim === 3200)
    assert(stats.count === 60L)
    // brute-force local ground truth for the mean and covariance trace
    val local = docs.collect().map(r =>
      Vectorize.vectorizeLocal(wide, 32)(r.getString(0)))
    val n = local.length.toDouble
    val meanLocal = Array.tabulate(3200)(j => local.map(_(j)).sum / n)
    (0 until 3200 by 157).foreach(j =>
      assert(math.abs(stats.mean(j) - meanLocal(j)) < 1e-9))
    val traceLocal = (0 until 3200).map { j =>
      val mu = meanLocal(j)
      local.map(x => (x(j) - mu) * (x(j) - mu)).sum / (n - 1)
    }.sum
    assert(math.abs(stats.covTrace - traceLocal) < 1e-6 * math.max(1.0, math.abs(traceLocal)))
    // jittered covariance must factor (diagonal has the 1e-6 ridge)
    assert(stats.chol.isDefined)
    assert(!stats.covLogDet.isNaN)
  }

  test("text profile + MVN synthesis round-trip: moments within tolerance") {
    import spark.implicits._
    val docs = (1 to 200).map(i =>
      s"word${i % 5} token${i % 3} fixed common tail").toDF("text")
    val stats = TextProfiler.profile(docs, "text", model, maxTokens = 4).get
    assert(stats.dim === 32)
    assert(stats.count === 200L)
    assert(stats.chol.isDefined)
    val vocab = Vocab.build(docs, "text", model)
    val synth = TextSynth.generate(spark, stats, vocab, maxTokens = 4, n = 50, seed = 3)
    assert(synth.count() === 50L)
    // decoded text draws from the corpus vocabulary
    val toks = synth.select("value").collect().flatMap(_.getString(0).split(" ")).toSet
    assert(toks.forall(t => t.isEmpty || vocab.words.contains(t)))
  }
}
