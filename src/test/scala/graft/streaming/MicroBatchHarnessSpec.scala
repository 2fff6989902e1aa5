package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** End-to-end guards for the shared micro-batch oracle harness —
  * specifically the empty-sink path: a streaming query whose every
  * batch is filtered away writes NO parquet files, and the read-back
  * must return an empty, correctly-schema'd frame (not throw schema
  * inference's AnalysisException on the empty dir). */
class MicroBatchHarnessSpec extends SparkSpec {
  import spark.implicits._

  test("runMicroBatched: all-filtered stream yields empty frame with pinned schema") {
    val batches = Seq(
      Seq((1L, "a"), (2L, "b")),
      Seq((3L, "c")),
      Seq.empty[(Long, String)])
    val out = SparkEntry.runMicroBatched(spark, Seq("id", "s"), batches,
      "graft-test-empty", Seq("id", "s"), OutputMode.Append()) { stream =>
      stream.filter(col("id") < 0) // nothing ever survives
    }
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("id", "s"))
    assert(out.schema("id").dataType.typeName === "long")
    assert(out.schema("s").dataType.typeName === "string")
  }

  test("runMicroBatched: non-empty stream round-trips rows and column subset") {
    val batches = Seq(Seq((1L, "a"), (2L, "b")), Seq((3L, "c")))
    val out = SparkEntry.runMicroBatched(spark, Seq("id", "s"), batches,
      "graft-test-rows", Seq("id"), OutputMode.Append()) { stream =>
      stream.filter(col("id") =!= 2L)
    }
    assert(out.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    assert(out.columns.toSeq === Seq("id"))
  }

  test("runMicroBatched2: all-filtered two-source stream yields empty frame") {
    val a = Seq(Seq((1L, 10L)), Seq((2L, 20L)))
    val b = Seq(Seq((1L, 100L)), Seq.empty[(Long, Long)])
    val out = SparkEntry.runMicroBatched2(spark,
      Seq("id", "va"), a, Seq("id", "vb"), b,
      "graft-test-empty2", Seq("id", "va")) { (sa, _) =>
      sa.filter(col("va") < 0)
    }
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("id", "va"))
  }
}
