package graft.ops

import graft.SparkSpec

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("PCA(2) of data lying in a 2-D plane preserves pairwise distances") {
    // 4-D points in the plane spanned by e1, e2 (+ fixed offset in e3)
    val pts = Seq(
      (1L, Array(0.0f, 0.0f, 5.0f, 0.0f)),
      (2L, Array(3.0f, 0.0f, 5.0f, 0.0f)),
      (3L, Array(0.0f, 4.0f, 5.0f, 0.0f)),
      (4L, Array(3.0f, 4.0f, 5.0f, 0.0f))).toDF("id", "v")
    val pc = Projection.pca(pts, "id", "v", k = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def d(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    assert(math.abs(d(pc(1L), pc(2L)) - 3.0) < 1e-6)
    assert(math.abs(d(pc(1L), pc(3L)) - 4.0) < 1e-6)
    assert(math.abs(d(pc(1L), pc(4L)) - 5.0) < 1e-6)
    assert(pc(1L).length === 2)
  }

  test("pcaCompare projects original and synthetic into one shared space") {
    val orig = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))).toDF("id", "v")
    val synth = Seq((10L, Array(1.0f, 1.0f))).toDF("id", "v")
    val out = Projection.pcaCompare(orig, synth, "id", "v", k = 2)
    val rows = out.collect()
    assert(rows.length === 3)
    assert(rows.map(_.getString(1)).toSet === Set("original", "synthetic"))
    assert(rows.forall(_.getSeq[Double](2).length == 2))
  }
}
