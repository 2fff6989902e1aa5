package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around Spark's shuffle model:
  *
  *  - exact: hash-groupBy on a 128-bit content fingerprint — ONE shuffle
  *    keyed on the digest (never on raw text; at 100 TB the shuffle
  *    payload is 16 bytes + id per row).
  *  - MinHash + LSH banding: shingle → minhash signature (map-only) →
  *    explode bands → self-join on (band, bucket) — the join keys are
  *    tiny band digests, and candidate verification happens only within
  *    buckets, turning the O(n²) pair space into near-linear work.
  *  - SimHash: map-only 16-bit sketch (TextAnalysis.simHash16), bucket
  *    by sketch.
  *  - n-gram Jaccard: exact verification kernel for LSH candidates.
  *  - embedding cosine: near-dup by vector similarity (Similarity.scala
  *    kernel under a threshold).
  *
  * All hash primitives are md5-based so the DuckDB oracle can replay
  * them bit-for-bit.
  */
object Dedup {

  /** Word k-gram shingles of the token stream (distinct). Mirrors
    * DuckDB: list_distinct(list_transform(range(...), i -> ...)). */
  def shingles(c: Column, k: Int = 3): Column = {
    val toks = TextAnalysis.tokens(c)
    val n = size(toks)
    array_distinct(
      when(n < k, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(0), n - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
  }

  /** MinHash signature: for hash function i (of `numHashes`), the
    * lexicographic min of md5(i || '#' || shingle) — the classic
    * "min over a random permutation" with md5 as the permutation
    * family. Map-only; signature is numHashes 32-char strings. */
  def minhashSignature(c: Column, numHashes: Int = 16, k: Int = 3): Column = {
    val sh = shingles(c, k)
    val sig = (0 until numHashes).map { i =>
      array_min(transform(sh, s => md5(concat(lit(s"$i#"), s).cast("binary"))))
    }
    array(sig: _*)
  }

  /** LSH band digests: the signature split into `bands` rows of
    * numHashes/bands, each band hashed to one digest. Two documents
    * collide in a band iff that whole band matches → P[candidate]
    * follows the usual (1-(1-s^r)^b) S-curve. */
  def lshBands(sigCol: Column, numHashes: Int, bands: Int): Column = {
    val r = numHashes / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", slice(sigCol, b * r + 1, r)).cast("binary")).as("bucket"))
    }: _*)
  }

  /** Exact-duplicate groups on the normalized content fingerprint:
    * returns (keep_id, dup_count) per distinct content, keep_id = min id.
    * One shuffle, keyed on the 128-bit digest. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Rows surviving exact dedup (first id per content wins). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash-LSH candidate pairs (a < b): documents sharing at least one
    * band bucket. The self-join runs on exploded (band, bucket) keys —
    * shuffle payload is (16B digest, id); bucket sizes bound the pair
    * blow-up. Returns distinct (id_a, id_b).
    *
    * Physical shape: shingles are EXPLODED once and the signature is one
    * groupBy with numHashes min() aggregates — not the per-row nested
    * array expression of [[minhashSignature]], which Catalyst would
    * re-evaluate (tokens + shingles + distinct) once per hash function
    * (measured 16x slower). Map-side partial min() makes the shuffle
    * carry one signature row per document. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 16, bands: Int = 4, k: Int = 3): DataFrame = {
    val r = numHashes / bands
    val sh = df.select(col(idCol).as("id"),
      explode(shingles(col(textCol), k)).as("s"))
    val minExprs = (0 until numHashes).map { i =>
      min(md5(concat(lit(s"$i#"), col("s")).cast("binary"))).as(s"h$i")
    }
    val sig = sh.groupBy("id").agg(minExprs.head, minExprs.tail: _*)
    val bandStructs = array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until r).map(j => col(s"h${b * r + j}")): _*)
          .cast("binary")).as("bucket"))
    }: _*)
    val banded = sig.select(col("id"), explode(bandStructs).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for given pairs — the verification
    * kernel after LSH: |A∩B| / |A∪B| over k-shingle sets. Computed via
    * exploded shingle join + per-doc set sizes (no arrays shuffled). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, minJaccard: Double = 0.0): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        explode(shingles(col(textCol), k)).as("s"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("l").join(sh.as("r"),
        col("l.s") === col("r.s") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold. Delegates to
    * the Similarity kernel; see there for the scale strategy. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double): DataFrame =
    Similarity.cosinePairs(df, idCol, vecCol, threshold)
}
