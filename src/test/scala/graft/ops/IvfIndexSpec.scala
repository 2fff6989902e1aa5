package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated direction clusters in 8-d, 10 members each, ids
  // interleaved so the LOW-id half (the build shard) still contains
  // members of every cluster AND the 4 lowest ids overall (the
  // centroid-seed dominance the append-parity contract requires)
  private def corpus = (0 until 40).map { i =>
    val v = Array.fill(8)(0.05f * ((i / 4) % 3))
    v((i % 4) * 2) = 1.0f
    (i.toLong, v)
  }.toDF("id", "v")

  private def queries = Seq(
    (100L, Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (101L, Array(0f, 0f, 1.0f, 0f, 0f, 0f, 0f, 0f))).toDF("id", "v")

  private def tmpPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ivfspec-$tag")
      .toString + "/idx"

  test("append-then-search equals rebuild-then-search (centroid-seed dominance)") {
    val path = tmpPath("parity")
    IvfIndex.build(corpus.filter(col("id") < 20), "id", "v", path, nCells = 4)
    IvfIndex.append(spark, path, corpus.filter(col("id") >= 20), "id", "v")
    val got = IvfIndex.search(spark, path, queries, "id", "v", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))).toSet
    val rebuilt = Similarity.ivfTopK(queries, corpus, "id", "v", "id", "v",
        k = 5, nCentroids = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))).toSet
    assert(got === rebuilt)
    assert(got.size === 10)
  }

  test("appends land as new generations; drift report splits base vs current") {
    val path = tmpPath("gen")
    IvfIndex.build(corpus.filter(col("id") < 20), "id", "v", path, nCells = 4)
    IvfIndex.append(spark, path, corpus.filter(col("id") >= 20 && col("id") < 30), "id", "v")
    IvfIndex.append(spark, path, corpus.filter(col("id") >= 30), "id", "v")
    val codes = spark.read.parquet(s"$path/codes")
    assert(codes.select("gen").distinct().as[Int].collect().sorted.toSeq === Seq(0, 1, 2))
    assert(codes.count() === 40)
    // the on-disk layout is cell-partitioned — the physical property
    // the search's probed-cells restriction prunes on
    val dirs = new java.io.File(s"$path/codes").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("centroid_id="))
    assert(dirs.length === 4)
    val rep = IvfIndex.driftReport(spark, path).collect()
    assert(rep.map(_.getAs[Long]("n_base")).sum === 20L)
    assert(rep.map(_.getAs[Long]("n_cur")).sum === 20L)
    // build and appends draw from the SAME cluster mix here — PSI must
    // read stable (well under the retrain threshold)
    assert(math.abs(rep.head.getAs[Double]("psi_total")) < 0.1)
    assert(!rep.head.getAs[Boolean]("retrain"))
  }

  test("PQ index: append-then-search equals rebuild ivfPqTopKAdc at zero training iterations") {
    val path = tmpPath("pq")
    IvfIndex.buildPq(corpus.filter(col("id") < 20), "id", "v", path,
      dim = 8, m = 2, k = 4, iterations = 0, nCells = 4)
    IvfIndex.appendPq(spark, path, corpus.filter(col("id") >= 20), "id", "v",
      dim = 8, m = 2)
    val got = IvfIndex.searchPq(spark, path, queries, "id", "v",
        dim = 8, m = 2, nProbe = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))).toSet
    val rebuilt = Quantize.ivfPqTopKAdc(queries, corpus, "id", "v", "id", "v",
        dim = 8, m = 2, k = 4, iterations = 0, nCells = 4, nProbe = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))).toSet
    assert(got === rebuilt)
    assert(got.nonEmpty)
    // the persisted code rows carry NO raw vectors — the m-int storage
    // shape is the point of the PQ variant
    val cols = spark.read.parquet(s"$path/codes").columns.toSet
    assert(cols === Set("id", "codes", "gen", "cell"))
    // drift report reads the PQ layout through the shared machinery
    val rep = IvfIndex.driftReport(spark, path, cellCol = "cell", cellsDir = "cells")
      .collect()
    assert(rep.map(_.getAs[Long]("n_base")).sum === 20L)
    assert(rep.map(_.getAs[Long]("n_cur")).sum === 20L)
  }

  test("drift report flags a genuinely shifted append") {
    val path = tmpPath("shift")
    IvfIndex.build(corpus.filter(col("id") < 20), "id", "v", path, nCells = 4)
    // append ONLY cluster-0 vectors: the admitted population collapses
    // into one cell — the quantizer-decay shape the trigger exists for
    IvfIndex.append(spark, path,
      corpus.filter(col("id") >= 20 && col("id") % 4 === 0), "id", "v")
    val rep = IvfIndex.driftReport(spark, path).collect()
    assert(rep.head.getAs[Double]("psi_total") > 0.2)
    assert(rep.head.getAs[Boolean]("retrain"))
  }
}
