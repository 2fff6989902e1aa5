package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "The Quick Brown FOX jumps over the lazy dog near the river bank today!"), // normalized dup of 1
    (4L, "a completely different document about spark shuffles and partition sizes"),
    (5L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 1
    (6L, "entirely unrelated text mentioning embeddings vectors and cosine distance"))
    .toDF("id", "text")

  test("exact dedup groups normalized duplicates under min id") {
    val g = Dedup.exact(docs, "id", "text").collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("dup_count")).toMap
    assert(g(1L) === 3L)   // 1,2,3 collapse
    assert(g(4L) === 1L); assert(g(5L) === 1L); assert(g(6L) === 1L)
    val kept = Dedup.exactDedup(docs, "id", "text").select("id")
      .collect().map(_.getLong(0)).sorted
    assert(kept === Seq(1L, 4L, 5L, 6L))
  }

  test("shingles: distinct word 3-grams; short docs fall back to whole text") {
    val sh = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
      .select(col("id"), Dedup.shingles(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L).toSet === Set("a b c", "b c d"))
    assert(sh(2L) === Seq("a b"))
  }

  test("minhash LSH surfaces exact and near duplicates as candidates") {
    val pairs = Dedup.minhashCandidates(docs, "id", "text", numHashes = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(pairs.contains((2L, 3L)))
    // near-dup differs in 1 word of 13 → most bands still collide
    assert(pairs.exists(p => p._1 == 1L && p._2 == 5L || p._1 == 5L))
    assert(!pairs.contains((4L, 6L)))
  }

  test("jaccard verification: dup=1.0, near-dup high, unrelated low") {
    val j = Dedup.jaccardPairs(docs, "id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(j((1L, 2L)) - 1.0) < 1e-9)
    assert(math.abs(j((1L, 3L)) - 1.0) < 1e-9)
    assert(j((1L, 5L)) > 0.6 && j((1L, 5L)) < 1.0)
    assert(!j.contains((4L, 6L))) // no shared shingles at all
  }

  test("embedding near-dup finds the duplicated vector") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)), (4L, Array(0.9f, 0.1f, 0.0f)))
      .toDF("id", "v")
    val pairs = Dedup.embeddingNearDup(vecs, "id", "v", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }
}
