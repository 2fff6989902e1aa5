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
    runningTotals(df, Seq(orderCol),
      Seq(outCol -> coalesce(col(valueCol).cast(LongType), lit(0L))))

  /** Global 0-based row number in ascending `orderCols` order — the
    * windowless `ROW_NUMBER() OVER (ORDER BY ...) - 1`. Deterministic
    * when `orderCols` is a unique key. Same two-pass shape: the rank of
    * a row is the running count of rows before it. */
  def rowNumber(df: DataFrame, orderCols: Seq[String],
                outCol: String = "rk"): DataFrame =
    runningTotals(df, orderCols, Seq(outCol -> lit(1L)))
      .withColumn(outCol, col(outCol) - 1L)

  /** SEVERAL running totals over ONE shared range sort — k independent
    * `SUM(x_k) OVER (ORDER BY ...)` columns for the price of a single
    * shuffle (the KS-statistic path needs the per-group ECDF counters
    * side by side; two runningTotal calls would sort twice). */
  def runningTotals(df: DataFrame, orderCols: Seq[String],
                    values: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(values.nonEmpty, "need at least one value expression")
    values.foreach { case (outCol, _) =>
      require(!df.columns.contains(outCol),
        s"input already has a column named '$outCol' — pass a different outCol")
    }
    require(values.map(_._1).distinct.size == values.size,
      "duplicate output column names")
    val scratch = values.indices.map(i => s"__v$i")
    scratch.foreach { s =>
      require(!df.columns.contains(s),
        s"input already has a column named '$s' (internal scratch name)")
    }
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val orderExprs = orderCols.map(col)
    val k = values.size
    val sorted = values.zip(scratch).foldLeft(df) {
      case (acc, ((_, v), s)) => acc.withColumn(s, v.cast(LongType))
    }
      .repartitionByRange(nPart, orderExprs: _*)
      .sortWithinPartitions(orderExprs: _*)
      .localCheckpoint()
    val vIdx = scratch.map(sorted.schema.fieldIndex).toArray
    // pass 1: per-partition totals — O(P·k) longs to the driver
    val partSums: Array[Array[Long]] = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      val s = new Array[Long](k)
      it.foreach { r =>
        var j = 0
        while (j < k) { if (!r.isNullAt(vIdx(j))) s(j) += r.getLong(vIdx(j)); j += 1 }
      }
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets: Array[Array[Long]] = partSums
      .scanLeft(new Array[Long](k)) { (acc, m) =>
        Array.tabulate(k)(j => acc(j) + m(j))
      }.init
    val offB = spark.sparkContext.broadcast(offsets)
    val scratchSet = scratch.toSet
    val outSchema = StructType(
      sorted.schema.fields.filterNot(f => scratchSet(f.name)) ++
        values.map { case (outCol, _) => StructField(outCol, LongType, nullable = false) })
    val keep = sorted.schema.fields.zipWithIndex
      .filter { case (f, _) => !scratchSet(f.name) }.map(_._2)
    // pass 2: seeded running totals per partition (shuffle reused)
    val rdd = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      val s = offB.value(i).clone()
      it.map { r =>
        var j = 0
        while (j < k) { if (!r.isNullAt(vIdx(j))) s(j) += r.getLong(vIdx(j)); j += 1 }
        Row.fromSeq(keep.map(r.get).toIndexedSeq ++ s.toIndexedSeq)
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
