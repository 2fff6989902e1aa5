package graft.ops

import graft.SparkSpec

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val old = Seq(
    (1L, "a", 10.0),   // unchanged
    (2L, "b", 20.0),   // changed (value)
    (3L, "c", 30.0),   // removed
    (4L, null.asInstanceOf[String], 40.0), // null→non-null = changed
    (5L, "e", 50.0)    // unchanged
  ).toDF("k", "s", "v")

  private val neu = Seq(
    (1L, "a", 10.0),
    (2L, "b", 21.0),
    (4L, "d", 40.0),
    (5L, "e", 50.0),
    (6L, "f", 60.0)    // added
  ).toDF("k", "s", "v")

  test("diff classifies added / removed / changed and drops unchanged") {
    val got = Snapshot.diff(old, neu, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 3L -> "removed",
      4L -> "changed", 6L -> "added"))
  }

  test("diffSummary counts each class") {
    val r = Snapshot.diffSummary(old, neu, Seq("k")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 1L, 2L)))
  }

  test("null keys are excluded from both sides") {
    val o = Seq((Some(1L), "a"), (None, "x")).toDF("k", "s")
    val n = Seq((Some(1L), "a"), (None, "y")).toDF("k", "s")
    assert(Snapshot.diff(o, n, Seq("k")).count() === 0L)
  }

  test("composite keys and NULL vs empty-string values are distinguished") {
    val o = Seq((1L, 1L, Some("")), (1L, 2L, Some("z"))).toDF("k1", "k2", "s")
    val n = Seq((1L, 1L, None: Option[String]), (1L, 2L, Some("z"))).toDF("k1", "k2", "s")
    val got = Snapshot.diff(o, n, Seq("k1", "k2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(got === Map((1L, 1L) -> "changed"))
  }

  test("identical snapshots produce an empty diff") {
    assert(Snapshot.diff(old, old, Seq("k")).count() === 0L)
  }

  test("mismatched non-key columns are rejected") {
    val bad = Seq((1L, "a")).toDF("k", "other")
    intercept[IllegalArgumentException] {
      Snapshot.diff(old, bad, Seq("k"))
    }
  }
}
