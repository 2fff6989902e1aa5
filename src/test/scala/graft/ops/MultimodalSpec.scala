package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("ingest attaches typed metadata with byte-accurate n_bytes") {
    val df = Seq((1L, "hello")).toDF("id", "txt")
      .select(col("id"), encode(col("txt"), "UTF-8").as("payload"))
    val got = Multimodal.ingest(df, "payload", "image", "image/png")
    val r = got.select("meta.modality", "meta.mime", "meta.n_bytes").collect()(0)
    assert(r.getString(0) === "image")
    assert(r.getString(1) === "image/png")
    assert(r.getLong(2) === 5L)
  }

  test("embedStub: deterministic payload embeddings feed the near-dup family") {
    val df = ((1 to 40).map(i => (i.toLong, s"unique document number $i")) ++
      Seq((100L, "unique document number 7"), (101L, "unique document number 9")))
      .toDF("id", "txt")
      .select(col("id"), encode(col("txt"), "UTF-8").as("payload"))
      .withColumn("emb", Multimodal.embedStub(col("payload"), 8))
    // identical payloads → identical embeddings; all components in [-1, 1)
    val vals = df.select(explode(col("emb"))).collect().map(_.getDouble(0))
    assert(vals.forall(v => v >= -1.0 && v < 1.0))
    // composition: exact-duplicate payloads found by bucketed near-dup
    val pairs = Similarity.cosineNearDupBucketed(df, "id", "emb", 0.9999999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((7L, 100L), (9L, 101L)))
  }

  test("decode pass fills deterministic stub dimensions in valid ranges") {
    val df = Seq((1L, "abc"), (2L, "abc"), (3L, "other")).toDF("id", "txt")
      .select(col("id"), encode(col("txt"), "UTF-8").as("payload"))
    val got = Multimodal.decode(Multimodal.ingest(df, "payload", "image", "image/png"), "payload")
      .select(col("id"), col("decoded.width"), col("decoded.height"), col("decoded.duration_ms"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    assert(got(1L) === got(2L))        // same payload → same decode
    assert(got(1L) !== got(3L))
    got.values.foreach { case (w, h, d) =>
      assert(w >= 64 && w < 64 + 1985); assert(h >= 64 && h < 64 + 1985)
      assert(d >= 1000L && d < 601000L)
    }
  }

  test("stubDecode matches the JVM-side ground truth of the oracle formula") {
    val (w, h, d) = Multimodal.stubDecode("hello".getBytes("UTF-8"))
    val digest = java.security.MessageDigest.getInstance("MD5").digest("hello".getBytes("UTF-8"))
    def u(i: Int) = digest(i) & 0xff
    assert(w === 64 + (u(0) * 256 + u(1)) % 1985)
    assert(h === 64 + (u(2) * 256 + u(3)) % 1985)
    assert(d === 1000L + (u(4).toLong * 65536 + u(5) * 256 + u(6)) % 600000L)
  }

  test("bytes-aware repartition sizes partitions by payload bytes") {
    val df = Seq.fill(64)("x" * 100000).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "txt")
      .select(col("id"), encode(col("txt"), "UTF-8").as("payload"))
    val ingested = Multimodal.ingest(df, "payload", "image", "image/png")
    // 64 x 100 KB = 6.4 MB at 1 MB target → >1 partition, ≤ 64
    val parts = Multimodal
      .repartitionForPayloads(ingested, col("meta.n_bytes"), targetMB = 1)
      .rdd.getNumPartitions
    assert(parts >= 2 && parts <= 64, s"parts=$parts")
  }

  test("frame sampling offsets") {
    val df = Seq(5000L, 0L).toDF("dur")
      .select(Multimodal.frameSampleOffsets(col("dur"), 1000).as("o"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(0) === Seq(0L, 1000L, 2000L, 3000L, 4000L))
    assert(rows(1) === Seq.empty)
  }
}
