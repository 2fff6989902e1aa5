package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed prefix sums — the windowless form of
  * `SUM(x) OVER (ORDER BY k)`, which Spark plans as a SINGLE-task
  * window (every row of the table through one partition: the same
  * scale-killer the grouped-quantile and as-of hot paths avoid).
  *
  * Shape: ONE repartitionByRange on the order column + sorted
  * partitions; pass 1 ships one per-partition sum to the driver (O(P)
  * scalars, independent of data size), a scan turns them into
  * per-partition starting offsets; pass 2 re-runs the partitions with
  * seeded running totals. The shuffle files are reused between the
  * passes (the frame is pinned), so data moves once.
  */
object Prefix {

  /** All original columns plus `outCol` = the INCLUSIVE running total
    * of `valueCol` (cast to long) in ascending `orderCol` order.
    * Deterministic when `orderCol` is unique (ties sort arbitrarily
    * within the range sort otherwise — same caveat as any ORDER BY on
    * a non-unique key). Null values count as 0; null order keys sort
    * first (Spark ascending-null ordering). */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
                   outCol: String = "cum"): DataFrame =
    runningTotalMulti(df, Seq(orderCol), coalesce(col(valueCol).cast(LongType), lit(0L)), outCol)

  /** Global 0-based row number in ascending `orderCols` order — the
    * windowless `ROW_NUMBER() OVER (ORDER BY ...) - 1`. Deterministic
    * when `orderCols` is a unique key. Same two-pass shape: the rank of
    * a row is the running count of rows before it. */
  def rowNumber(df: DataFrame, orderCols: Seq[String],
                outCol: String = "rk"): DataFrame =
    runningTotalMulti(df, orderCols, lit(1L), outCol)
      .withColumn(outCol, col(outCol) - 1L)

  private def runningTotalMulti(df: DataFrame, orderCols: Seq[String],
                                value: org.apache.spark.sql.Column,
                                outCol: String): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(!df.columns.contains(outCol),
      s"input already has a column named '$outCol' — pass a different outCol")
    require(!df.columns.contains("__v"),
      "input already has a column named '__v' (internal scratch name)")
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val orderExprs = orderCols.map(col)
    val sorted = df
      .withColumn("__v", value)
      .repartitionByRange(nPart, orderExprs: _*)
      .sortWithinPartitions(orderExprs: _*)
      .localCheckpoint()
    val vIdx = sorted.schema.fieldIndex("__v")
    // pass 1: per-partition totals — O(P) longs to the driver
    val partSums = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _).init
    val offB = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(sorted.schema.fields.filterNot(_.name == "__v") :+
      StructField(outCol, LongType, nullable = false))
    val keep = sorted.schema.fields.zipWithIndex
      .filter(_._1.name != "__v").map(_._2)
    // pass 2: seeded running totals per partition (shuffle reused)
    val rdd = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = offB.value(i)
      it.map { r =>
        s += r.getLong(vIdx)
        Row.fromSeq(keep.map(r.get).toIndexedSeq :+ s)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Sequence packing for training-batch assembly (the "concatenate
    * the corpus, cut every `budget` tokens" layout LM pipelines use):
    * documents taken in `orderCol` order occupy token positions
    * `[cum − n_tokens, cum)` of one global stream; each doc reports
    * the training sequence (`bin`) its first token lands in, its
    * offset inside that sequence, and whether it crosses a sequence
    * boundary (`crosses` — the rows a loader must split). Pure
    * function of the prefix sum → fully distributed via
    * [[runningTotal]], and replayable by any engine's windowed SUM. */
  def packSequences(df: DataFrame, orderCol: String, tokenCol: String,
                    budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    runningTotal(df, orderCol, tokenCol, "cum")
      .withColumn("start_pos", col("cum") - coalesce(col(tokenCol).cast(LongType), lit(0L)))
      .withColumn("bin", floor(col("start_pos") / budget))
      .withColumn("bin_offset", col("start_pos") % budget)
      .withColumn("crosses",
        floor((col("cum") - 1) / budget) > col("bin") && col("cum") > col("start_pos"))
  }
}
