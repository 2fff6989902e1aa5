package graft.text

import graft.SparkSpec

class VecFormatSpec extends SparkSpec {

  private def writeVec(content: String): String = {
    val p = java.nio.file.Files.createTempFile("graft_vecspec", ".vec")
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    p.toFile.deleteOnExit()
    p.toString
  }

  test("parses the headered word2vec/fastText text format") {
    val path = writeVec(
      """3 4
        |alpha 1.0 0.5 -0.25 0.125
        |beta 0.0 -1.0 2.0 3.5
        |gamma -0.5 0.5 -0.5 0.5
        |""".stripMargin)
    val rows = VecFormat.read(spark, path).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
    assert(rows.keySet === Set("alpha", "beta", "gamma"))
    assert(rows("alpha").toSeq === Seq(1.0, 0.5, -0.25, 0.125))
    assert(rows("beta").toSeq === Seq(0.0, -1.0, 2.0, 3.5))
  }

  test("headerless (GloVe-style) files infer dim from the first row") {
    val path = writeVec(
      """alpha 1.0 2.0 3.0
        |beta 4.0 5.0 6.0
        |""".stripMargin)
    val rows = VecFormat.read(spark, path).collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getSeq[Double](1).length === 3))
  }

  test("corrupt / wrong-arity rows are dropped, not fatal") {
    val path = writeVec(
      """2 3
        |alpha 1.0 2.0 3.0
        |truncated 1.0 2.0
        |beta 4.0 5.0 6.0
        |""".stripMargin)
    val words = VecFormat.read(spark, path).collect().map(_.getString(0)).toSet
    assert(words === Set("alpha", "beta"))
  }

  test("dim=1 headered file: the header row never becomes a vocabulary word") {
    val path = writeVec(
      """2 1
        |alpha 0.5
        |beta -1.5
        |""".stripMargin)
    val rows = VecFormat.read(spark, path).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    assert(rows === Map("alpha" -> List(0.5), "beta" -> List(-1.5)))
  }

  test("load: file -> EmbeddingModel with table lookups and OOV fallback") {
    val path = writeVec(
      """2 3
        |alpha 1.0 2.0 3.0
        |beta 4.0 5.0 6.0
        |""".stripMargin)
    val model = VecFormat.load(spark, path, seed = 7L)
    assert(model.dim === 3)
    assert(model.lookup("alpha").toSeq === Seq(1.0, 2.0, 3.0))
    // OOV falls back to the deterministic hash vector at the model seed
    assert(model.lookup("missing").toSeq ===
      HashEmbeddings.vector("missing", 3, 7L).toSeq)
  }

  test("fromDataFrame maxWords: at-cap loads; over-cap fails fast with the join path named") {
    import spark.implicits._
    val vecs = (1 to 4).map(i => (s"w$i", Array(i.toDouble, 0.0))).toDF("word", "vector")
    // at the cap: loads normally
    val atCap = EmbeddingModel.fromDataFrame(vecs, "word", "vector",
      seed = 3L, maxWords = 4)
    assert(atCap.table.size === 4)
    assert(atCap.lookup("w2").toSeq === Seq(2.0, 0.0))
    // one past the cap: refuses — the driver Map is for BOUNDED
    // vocabularies, and the error names the distributed alternative
    val err = intercept[IllegalArgumentException] {
      EmbeddingModel.fromDataFrame(vecs, "word", "vector",
        seed = 3L, maxWords = 3)
    }
    assert(err.getMessage.contains("maxWords"))
    assert(err.getMessage.contains("vectorizeJoin"))
  }

  test("vectorizeJoin equals vectorizeUdf: in-vocab, OOV hash fallback, zero-pad, null text") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dim = 3; val maxTokens = 4; val seed = 7L
    val vecs = Seq(
      ("alpha", Array(1.0, 2.0, 3.0)),
      ("beta", Array(4.0, 5.0, 6.0))).toDF("word", "vector")
    val docs = Seq(
      (1L, "alpha beta missing alpha extra dropped"), // > maxTokens → truncate
      (2L, "beta"),                                   // < maxTokens → zero-pad
      (3L, ""),                                       // token-free → all zeros
      (4L, null.asInstanceOf[String]))                // null → all zeros
      .toDF("id", "text")
    val model = EmbeddingModel.fromDataFrame(vecs, "word", "vector", seed)
    val viaUdf = docs
      .withColumn("v", Vectorize.vectorizeUdf(spark, model, maxTokens)(col("text")))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    val viaJoin = Vectorize.vectorizeJoin(docs, "id", "text",
        vecs, "word", "vector", maxTokens, dim, seed, "v")
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    assert(viaJoin.keySet === Set(1L, 2L, 3L, 4L))
    assert(viaJoin === viaUdf)
    assert(viaJoin.values.forall(_.length === maxTokens * dim))
    assert(viaJoin(3L).forall(_ === 0.0))
    assert(viaJoin(4L).forall(_ === 0.0))
  }

  test("vectorizeJoin fails fast on a mis-sized vocabulary vector (never a " +
    "silently wrong-length output)") {
    import spark.implicits._
    val dim = 3; val maxTokens = 2; val seed = 7L
    val vecs = Seq(
      ("alpha", Array(1.0, 2.0, 3.0)),
      ("bad", Array(4.0, 5.0))).toDF("word", "vector") // length 2 ≠ dim 3
    val docs = Seq((1L, "alpha bad")).toDF("id", "text")
    val e = intercept[Exception] {
      Vectorize.vectorizeJoin(docs, "id", "text",
        vecs, "word", "vector", maxTokens, dim, seed, "v").collect()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("bad") && m.contains("expected dim=3")),
      s"wanted the raise_error message, got: ${msgs(e)}")
  }

  test("SubwordEmbedder: in-vocab unchanged; OOV = mean of char n-gram vectors") {
    val base = EmbeddingModel(dim = 3, seed = 11L,
      table = Map("word" -> Array(1.0, 1.0, 1.0)))
    val sub = SubwordEmbedder(base, minn = 3, maxn = 4)
    assert(sub.lookup("word").toSeq === Seq(1.0, 1.0, 1.0))
    // "<oov>" (len 5): 3-grams <oo, oov, ov>; 4-grams <oov, oov>
    val w = "<oov>"
    val grams = (3 to 4).flatMap(n => (0 to w.length - n).map(i => w.substring(i, i + n)))
    val expected = new Array[Double](3)
    grams.foreach { g =>
      val v = HashEmbeddings.vector(g, 3, 11L)
      (0 until 3).foreach(j => expected(j) += v(j))
    }
    (0 until 3).foreach(j => expected(j) /= grams.length)
    assert(sub.lookup("oov").toSeq === expected.toSeq)
    // deterministic: two calls identical
    assert(sub.lookup("oov").toSeq === sub.lookup("oov").toSeq)
  }
}
