package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.chaining._

import graft.engine.{Detector, DetectorConfig, Histogram, Profiler}
import graft.ops.{Bucketing, Corpus, Curation, Dedup, Drift, Expectations, Frequent, Graph, IvfIndex, Layout, Multimodal, Prefix, Quantize, Sampling, Similarity, Sink, Sketch, Skew, Snapshot, Svg, Temporal, TextAnalysis}
import graft.streaming.StreamingProfile

/** Driver contract: every deterministic operator of the engine is
  * registered here as a (SparkSession, sfDir) => DataFrame query with a
  * DuckDB-equivalent SQL oracle.
  *
  * Cross-engine float parity strategy (SURVEY.md §4.5): all sums go
  * through exact DECIMAL(38,6) accumulation; derived statistics (mean,
  * std, skew, kurt) are computed from those exact sums with the SAME
  * scalar formula on both sides, so IEEE double evaluation is
  * bit-identical; outputs are rounded to 6 dp. Hash-based operators
  * (dedup, fingerprints) use md5 only — identical in both engines.
  */
object SparkEntry {

  /** Table loader. The events table's `ts` physical type has varied
    * across testdata generations: TIMESTAMP(NANOS) (Spark 4 reads it
    * as long under spark.sql.legacy.parquet.nanosAsLong, set in
    * Verify/Bench — floor(ns/1000) back to micros), and un-adjusted
    * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ under Spark 4's default
    * inferTimestampNTZ). Normalize both to TimestampType: the session
    * timezone is pinned to UTC, so the NTZ wall-clock cast preserves
    * the same instants DuckDB sees reading the file natively. */
  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    } else df
  }

  /** Flagship: full detect→profile pipeline over sf0.001 lineitem —
    * one scan for the detection ladder, one for the per-type profiles,
    * summarized one row per column. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val df = t(spark, "/root/testdata/sf0.001", "lineitem")
    val detected = Detector.detect(df, DetectorConfig(strictFormats = true))
    val profiles = Profiler.profileScalars(df, detected)
    import spark.implicits._
    detected.toSeq.sortBy(_._1).map { case (name, (st, sig)) =>
      val p = profiles.get(name).flatMap(_.numeric)
      (name, st.name, sig.n, sig.nDistinct,
        p.map(_.mean).getOrElse(Double.NaN), p.map(_.std).getOrElse(Double.NaN))
    }.toDF("column", "semantic_type", "n", "n_distinct", "mean", "std")
  }

  // ---------------------------------------------------------------
  // shared expression builders (Spark side)
  // ---------------------------------------------------------------

  private val dec = DecimalType(38, 6)

  /** Moment sums for a double column — ONE codegen'd scan. Plain double
    * sums: the downstream statistics are normalized (÷n, ÷σᵏ), so the
    * order-dependent last-ulp summation noise is ~1e-12 of the rounded
    * 6-dp output — decimal exactness is only needed where a RAW sum is
    * the output (revenue/sum_qty queries keep DECIMAL). Decimal here
    * costs ~10x (per-row Decimal allocation, measured). */
  private def momentAgg(df: DataFrame, x: Column): DataFrame =
    df.agg(
      count(x).as("n"),
      sum(x).as("s1"),
      sum(x * x).as("s2"),
      sum(x * x * x).as("s3"),
      sum(x * x * x * x).as("s4"),
      min(x).as("mn"), max(x).as("mx"))

  /** mean/std/skew/kurt from exact sums — identical formula in oracle. */
  private def momentSelect(withQuantiles: DataFrame): DataFrame = {
    val n = col("n").cast("double")
    val mean = col("s1").cast("double") / n
    val m2 = col("s2").cast("double") / n
    val m3 = col("s3").cast("double") / n
    val m4 = col("s4").cast("double") / n
    val variance = m2 - mean * mean
    val std = sqrt(variance)
    withQuantiles.select(
      col("n"),
      round(mean, 6).as("mean"),
      round(std, 6).as("std"),
      round((m3 - lit(3.0) * mean * m2 + lit(2.0) * mean * mean * mean) / (std * std * std), 6).as("skew"),
      round((m4 - lit(4.0) * mean * m3 + lit(6.0) * mean * mean * m2
        - lit(3.0) * mean * mean * mean * mean) / (variance * variance) - lit(3.0), 6).as("kurt"),
      col("mn"), col("mx"),
      round(element_at(col("qs"), 2), 6).as("median"),
      round(element_at(col("qs"), 1), 6).as("q1"),
      round(element_at(col("qs"), 3), 6).as("q3"))
  }

  /** Numeric profile: one scan for the exact moment sums, one
    * range-partitioned sort for the exact quantiles (Quantiles.exact —
    * Spark's in-memory percentile buffer doesn't scale past executor
    * memory; the sort does). Derived stats stay Spark expressions so
    * the scalar formula is shared with the oracle verbatim. */
  private def numericProfile(df: DataFrame, colName: String): DataFrame = {
    val m = momentAgg(df, col(colName)).collect()(0)
    val n = m.getLong(0)
    val qs = graft.engine.Quantiles.exact(df, colName, Seq(0.25, 0.5, 0.75), n)
    val base = df.sparkSession.range(1).select(
      lit(n).as("n"),
      lit(m.getDouble(1)).as("s1"), lit(m.getDouble(2)).as("s2"),
      lit(m.getDouble(3)).as("s3"), lit(m.getDouble(4)).as("s4"),
      lit(if (m.isNullAt(5)) null else m.get(5)).cast("double").as("mn"),
      lit(if (m.isNullAt(6)) null else m.get(6)).cast("double").as("mx"),
      array(lit(qs(0)), lit(qs(1)), lit(qs(2))).as("qs"))
    momentSelect(base)
  }

  /** The derived-stat SELECT columns shared by every moment-sums
    * oracle. `guarded=true` adds the degenerate-group zeroing of
    * Profiler.groupedNumericProfile (n-too-small / zero variance →
    * skew = kurt = 0). */
  private def momentStatsSql(guarded: Boolean = false,
                             withQuantiles: Boolean = true): String = {
    val skewBody =
      """(CAST(s3 AS DOUBLE)/n - 3.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n) + 2.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
        |    / (sqrt(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
        |       * sqrt(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
        |       * sqrt(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)))""".stripMargin
    val kurtBody =
      """(CAST(s4 AS DOUBLE)/n - 4.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s3 AS DOUBLE)/n)
        |         + 6.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n)
        |         - 3.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
        |    / ((CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
        |       * (CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))) - 3.0""".stripMargin
    val varPos = "(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)) > 0"
    val skew = if (guarded) s"CASE WHEN n > 2 AND $varPos THEN $skewBody ELSE CAST(0 AS DOUBLE) END"
               else skewBody
    val kurt = if (guarded) s"CASE WHEN n > 3 AND $varPos THEN $kurtBody ELSE CAST(0 AS DOUBLE) END"
               else kurtBody
    val qCols = if (withQuantiles)
      ",\n  round(qs[2], 6) AS median, round(qs[1], 6) AS q1, round(qs[3], 6) AS q3"
    else ""
    s"""n,
       |  round(CAST(s1 AS DOUBLE)/n, 6) AS mean,
       |  round(sqrt(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)), 6) AS std,
       |  round($skew, 6) AS skew,
       |  round($kurt, 6) AS kurt,
       |  mn, mx$qCols""".stripMargin
  }

  /** Oracle-side twin of [[numericProfile]]. */
  private def numericProfileSql(table: String, c: String): String =
    s"""WITH s AS (
       |  SELECT count($c) AS n,
       |         sum($c) AS s1,
       |         sum($c*$c) AS s2,
       |         sum($c*$c*$c) AS s3,
       |         sum($c*$c*$c*$c) AS s4,
       |         min($c) AS mn, max($c) AS mx,
       |         quantile_cont($c, [0.25, 0.5, 0.75]) AS qs
       |  FROM $table)
       |SELECT ${momentStatsSql()}
       |FROM s""".stripMargin

  /** value_counts(normalize=True): count + probability per value. The
    * total comes from a 1-row agg over the grouped counts joined back by
    * broadcast — NOT a partition-less window, which would funnel every
    * grouped row through one task (collapses on high-cardinality
    * columns; the q11 bounds pattern). */
  private def valueCounts(df: DataFrame, colName: String): DataFrame = {
    val counts = df.filter(col(colName).isNotNull)
      .groupBy(col(colName).cast(StringType).as("value"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("prob", round(col("cnt").cast("double") / col("total"), 6))
      .drop("total")
      .orderBy(desc("cnt"), asc("value"))
  }

  private def valueCountsSql(table: String, c: String): String =
    s"""SELECT CAST($c AS VARCHAR) AS value, count(*) AS cnt,
       |  round(CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (), 6) AS prob
       |FROM $table WHERE $c IS NOT NULL
       |GROUP BY 1 ORDER BY cnt DESC, value ASC""".stripMargin

  // ---- engine-portable token / hash SQL fragments (DuckDB side) ----

  /** DuckDB twin of TextAnalysis.tokens. */
  private def toksSql(c: String): String =
    s"list_filter(regexp_split_to_array(lower($c), '[^a-z0-9]+'), x -> x <> '')"

  /** Shared HLL-replay CTE chain (q172/q174): expects an upstream CTE
    * `src(g, h)` of keyed md5 digests; ends in `fin(g, m, n_buckets,
    * max_rank, est)` — the register/estimate ladder of
    * [[graft.ops.Sketch.hllDistinct]] keyed on g. */
  private def hllSqlTail: String =
    s"""reg AS (SELECT g, CAST(${graft.ops.Sketch.hexIntSql("h", 1, 2)} AS INT) AS bucket,
       |    ${graft.ops.Sketch.hexIntSql("h", 3, 12)} AS w FROM src),
       |mr AS (SELECT g, bucket, max(49 - length(ltrim(bin(w), '0'))) AS mrank
       |  FROM reg GROUP BY 1, 2),
       |sm AS (SELECT g, CAST(count(*) AS INT) AS n_buckets,
       |    CAST(max(mrank) AS INT) AS max_rank,
       |    sum(CAST(1 AS BIGINT) << CAST(49 - mrank AS INT)) AS s_present
       |  FROM mr GROUP BY 1),
       |est0 AS (SELECT *,
       |    (${graft.ops.Sketch.hllAlphaM2Literal} * CAST((CAST(1 AS BIGINT) << 49) AS DOUBLE)) /
       |      CAST(s_present + (256 - CAST(n_buckets AS BIGINT)) *
       |           (CAST(1 AS BIGINT) << 49) AS DOUBLE) AS raw
       |  FROM sm),
       |fin AS (SELECT g, CAST(256 AS INT) AS m, n_buckets, max_rank,
       |  round(CASE WHEN raw <= 640.0 AND (256 - n_buckets) > 0
       |    THEN 256.0 * ln(256.0 / CAST(256 - n_buckets AS DOUBLE))
       |    ELSE raw END, 6) AS est FROM est0)""".stripMargin

  /** DuckDB twin of TextAnalysis.tokenHash31 (7 hex digits of md5). */
  private def hash31Sql(tok: String): String =
    (0 until 7).map { i =>
      s"(instr('0123456789abcdef', substr(md5($tok), ${i + 1}, 1)) - 1) * ${1L << (4 * (6 - i))}"
    }.mkString("(", " + ", ")")

  /** [[simhashSql]] as an integer at width `nBits` (bit j of the
    * MSB-first string ↔ weight 2^(nBits−1−j), signed 64-bit word) — the
    * form the Hamming-band oracle shifts and masks. Bit j draws on bit
    * (j/32) of md5 hex digit (j%32), matching
    * `TextAnalysis.simHashAgg`; at nBits=64 the j=0 weight is
    * Long.MinValue, which DuckDB parses as a BIGINT literal, and being
    * the leftmost term of the sum no intermediate overflows. */
  private def simhashIntSql(toksExpr: String, nBits: Int): String =
    (0 until nBits).map { j =>
      s"(CASE WHEN list_sum(list_transform($toksExpr, t -> (((instr('0123456789abcdef', substr(md5(t), ${(j % 32) + 1}, 1)) - 1) >> ${j / 32}) & 1) * 2 - 1)) > 0 THEN ${1L << (nBits - 1 - j)} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Unrolled oracle twin of [[graft.ops.Graph.minLabelPropagation]]:
    * emits CTE stages `e2` (bidirected edges) and `v0`..`v<rounds>`;
    * expects an upstream CTE `e` with (src, dst). Deterministic at any
    * round cutoff — both engines run the SAME number of rounds, so
    * parity never depends on convergence. */
  private def ccRoundsSql(rounds: Int): String = {
    val stages = (1 to rounds).map { i =>
      s"""v$i AS (
         |  SELECT v.id, least(v.lbl, coalesce(m.ml, v.lbl)) AS lbl
         |  FROM v${i - 1} v LEFT JOIN (
         |    SELECT e.dst AS id, min(w.lbl) AS ml
         |    FROM e2 e JOIN v${i - 1} w ON w.id = e.src GROUP BY 1) m
         |    USING (id))""".stripMargin
    }
    (Seq(
      "e2 AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)",
      "v0 AS (SELECT DISTINCT src AS id, src AS lbl FROM e2)") ++ stages)
      .mkString(",\n")
  }

  /** DuckDB twin of TextAnalysis.simHash16. */
  private def simhashSql(toksExpr: String): String = {
    val bits = (0 until 16).map { j =>
      s"CASE WHEN list_sum(list_transform($toksExpr, t -> ((instr('0123456789abcdef', substr(md5(t), ${j + 1}, 1)) - 1) % 2) * 2 - 1)) > 0 THEN '1' ELSE '0' END"
    }
    bits.mkString("concat(", ", ", ")")
  }

  /** DuckDB twin of Dedup.shingles(k=3): distinct word 3-grams. */
  private def shinglesSql(c: String): String = {
    val w = toksSql(c)
    s"""list_distinct(CASE WHEN len($w) < 3
       |  THEN [array_to_string($w, ' ')]
       |  ELSE list_transform(range(len($w) - 2), i -> $w[i+1] || ' ' || $w[i+2] || ' ' || $w[i+3])
       |END)""".stripMargin
  }

  /** Union a table with duplicated copies of its first rows (dup
    * injection for dedup demos) — Spark side. */
  private def withDups(df: DataFrame, idCol: String, below: Long, shift: Long): DataFrame =
    df.unionByName(df.filter(col(idCol) < below)
      .withColumn(idCol, col(idCol) + shift))

  /** Shared micro-batch harness for the append-mode streaming oracle
    * rows (q123/q133/q148–q154): feed `batches` one micro-batch at a
    * time through a MemoryStream (a driver-side TEST source by design
    * — the operator under test is the same distributed plan a Kafka
    * source would run), run `build` on the streaming frame (columns
    * named `cols`), collect `outCols` of every emitted micro-batch
    * into a driver buffer via foreachBatch, and return the union.
    * The buffer replaced a temp-parquet sink + read-back (r10 verdict
    * #5): each parquet write is a full job with file-commit protocol,
    * so 15 streaming rows paid ~45 write/read/delete jobs of pure
    * harness cost per run. Collecting is safe HERE by construction —
    * the feeds are driver-sized fixture batches; a production stream
    * lands in a real sink (ops/Sink.scala), not this harness.
    * State-store partition count is pinned to 1 for the query's
    * lifetime — fixed at stream start from the global shuffle
    * setting; N state-store instances each writing delta + snapshot
    * files per micro-batch is pure fixed overhead at harness feed
    * rates (4 was measured at 1.07 s/run fixed cost; state updates
    * are per-key, so the partition count never changes emitted
    * values), and production picks this by expected horizon
    * cardinality — with the session's setting restored immediately
    * after start. */
  /** Checkpoint root for the harness's streaming queries: tmpfs
    * (/dev/shm) when present, else the JVM temp dir. The offset log,
    * commit log, and state-store delta files are written-and-synced
    * PER TRIGGER — on a disk-backed /tmp that fsync chain is the
    * dominant share of the ~1.1 s/query fixed harness cost; on tmpfs
    * it is memory traffic. Scratch only: deleted right after the
    * query stops, and a production stream points its checkpoint at
    * durable storage (this harness is the TEST sink). */
  private def tmpCheckpointDir(prefix: String): java.io.File = {
    val shm = new java.io.File("/dev/shm")
    val root = if (shm.isDirectory && shm.canWrite) shm.toPath
               else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createTempDirectory(root, prefix).toFile
  }

  private def rmTree(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(rmTree)
    f.delete(): Unit
  }

  /** r13 streaming fixed-cost cut: skip Spark's watermark-advance
    * NO-DATA micro-batches (a full offset-WAL + commit-WAL + planning
    * cycle after EVERY data batch of a watermarked query) and feed one
    * trailing EMPTY data batch instead — same per-batch watermark
    * values, same emitted-row union (all 15 streaming oracle rows
    * verified green both ways), ~half the trigger count.
    * GRAFT_STREAM_NODATA_SKIP=0 restores the stock behavior (A/B
    * lever; also the escape hatch if a future operator's emissions
    * ever depend on the no-data trigger itself). */
  private[graft] var skipNoDataBatches: Boolean =
    sys.env.get("GRAFT_STREAM_NODATA_SKIP").forall(_ != "0")

  /** Bench-only bounded sink for the micro-batch harnesses
    * (GRAFT_STREAM_SINK=noop, set by scripts/bench.sh): each emitted
    * batch lands in the `noop` batch sink — every projected column is
    * fully computed on the executors (same reason Bench's outer
    * timing uses noop over count: nothing prunes), but NO row is
    * serialized to the driver, so the benchmark measures the
    * streaming OPERATORS, not the O(emitted-rows) driver ArrayBuffer
    * the correctness harness needs for the oracle frame (r14 receipt:
    * the per-row-feed streaming rows' sf1 ratios were sink-dominated
    * at ×4.4–×5.4). Verify never sets it, so every oracle row still
    * rides the full driver sink. In noop mode the harness returns a
    * correctly-typed EMPTY frame — bench discards it. */
  private[graft] var streamNoopSink: Boolean =
    sys.env.get("GRAFT_STREAM_SINK").contains("noop")

  private[graft] def runMicroBatched[T <: Product : org.apache.spark.sql.Encoder](
      s: SparkSession, cols: Seq[String], batches: Seq[Seq[T]],
      tmpPrefix: String, outCols: Seq[String],
      mode: org.apache.spark.sql.streaming.OutputMode =
        org.apache.spark.sql.streaming.OutputMode.Append())(
      build: DataFrame => DataFrame): DataFrame = {
    // Source parallelism: the stateless scan-side work (cleaning
    // regexes, lang-id, quality ladders) runs on the SOURCE partitions
    // — before any exchange — so a 1-partition MemoryStream serializes
    // it onto one core no matter the shuffle setting (measured: q154's
    // 4.6k-row shard spent 4.4 s in one addBatch task). 8 input
    // partitions is the production shape (many source partitions, few
    // state partitions); every consumer is arrival-order-insensitive
    // by contract (sorted within key, or commutative state updates) —
    // the oracle gate holds under any input split. (An r12 experiment
    // dropped tiny feeds to 2 source partitions to save ~50 ms of task
    // launches per trigger; a same-host A/B showed q123 +1.9 s — the
    // per-ROW scan-side work of small feeds still wants the cores, so
    // 8 stays unconditionally.)
    val srcParts = math.min(8, s.sparkContext.defaultParallelism)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[T](s, srcParts)
    val stream = mem.toDF().toDF(cols: _*)
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val ckpt = tmpCheckpointDir(tmpPrefix)
    // EVERYTHING from here rides inside try/finally { rmTree(ckpt) }:
    // a build-time analysis error or a failed start() must not leak
    // the tmpfs checkpoint dir (/dev/shm pages the benchmarks would
    // then measure)
    try {
      // plan building happens BEFORE the conf pin: `build` only
      // constructs the DataFrame (state-store partition count binds at
      // query START), and a build-time analysis error must not escape
      // with the session conf still pinned to 1
      val built = build(stream)
      // Watermarked queries run a NO-DATA micro-batch after every data
      // batch (Spark's watermark-advance trigger): a second offset-WAL
      // write, commit-WAL write, and batch planning per feed — pure
      // fixed cost at harness feed rates. Emissions depend only on the
      // per-batch watermark VALUES, and those are identical with the
      // no-data batches skipped (the watermark updates at data-batch
      // end either way; late-row filtering and state eviction read the
      // same value in the following batch). So: disable no-data
      // batches for watermarked plans and feed ONE trailing empty
      // batch — a real data batch with zero rows — whose watermark
      // equals what the final no-data batch would have seen, emitting
      // any windows the last feed finalized. Union of emitted rows is
      // unchanged (oracle rows stay green); batches drop ~2N -> N+1.
      val hasWatermark = skipNoDataBatches && {
        built.queryExecution.logical.collectFirst {
          case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
        }.isDefined
      }
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
      val prevNoData = s.conf.get(noDataKey)
      s.conf.set("spark.sql.shuffle.partitions", "1")
      if (hasWatermark) s.conf.set(noDataKey, "false")
      val q = try {
        built.writeStream
          .option("checkpointLocation", ckpt.getAbsolutePath)
          .foreachBatch { (bdf: DataFrame, _: Long) =>
            if (streamNoopSink)
              bdf.select(outCols.map(col): _*)
                .write.format("noop").mode("overwrite").save()
            else {
              val rows = bdf.select(outCols.map(col): _*).collect()
              buf.synchronized { buf ++= rows; () }
            }
          }
          .outputMode(mode).start()
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", prevParts)
        s.conf.set(noDataKey, prevNoData)
      }
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        if (hasWatermark) { mem.addData(Seq.empty[T]); q.processAllAvailable() }
      } finally q.stop()
      // schema pinned from the built plan so the zero-emission case
      // returns a correctly-typed empty frame
      val outSchema = org.apache.spark.sql.types.StructType(
        outCols.map(c => built.schema(c)))
      s.createDataFrame(
        buf.synchronized(new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(buf).asJava)),
        outSchema)
    } finally rmTree(ckpt)
  }

  /** Two-source sibling of [[runMicroBatched]] for STREAM–STREAM
    * operators (watermarked joins): both MemoryStreams receive their
    * i-th micro-batch before each processAllAvailable, so rows that
    * must match across sides-and-batches exercise the join state (a
    * row from batch 0 held in the state store until its partner lands
    * in batch 2). Same conf pin / driver-buffer sink / empty-schema
    * handling as [[runMicroBatched]]. */
  private[graft] def runMicroBatched2[A <: Product : org.apache.spark.sql.Encoder,
                               B <: Product : org.apache.spark.sql.Encoder](
      s: SparkSession, colsA: Seq[String], batchesA: Seq[Seq[A]],
      colsB: Seq[String], batchesB: Seq[Seq[B]],
      tmpPrefix: String, outCols: Seq[String])(
      build: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    // same source-parallelism rationale as runMicroBatched
    val srcParts = math.min(8, s.sparkContext.defaultParallelism)
    val memA = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[A](s, srcParts)
    val memB = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[B](s, srcParts)
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val ckpt = tmpCheckpointDir(tmpPrefix)
    // same leak guard as runMicroBatched: rmTree covers failed
    // build/start, not just the feed loop
    try {
      val built = build(memA.toDF().toDF(colsA: _*), memB.toDF().toDF(colsB: _*))
      // same no-data-batch rationale as runMicroBatched (both join
      // sides are watermarked; the trailing empty batch feeds BOTH
      // sources so the final watermark computation sees fresh offsets
      // on each)
      val hasWatermark = skipNoDataBatches && {
        built.queryExecution.logical.collectFirst {
          case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
        }.isDefined
      }
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
      val prevNoData = s.conf.get(noDataKey)
      s.conf.set("spark.sql.shuffle.partitions", "1")
      if (hasWatermark) s.conf.set(noDataKey, "false")
      val q = try {
        built.writeStream
          .option("checkpointLocation", ckpt.getAbsolutePath)
          .foreachBatch { (bdf: DataFrame, _: Long) =>
            if (streamNoopSink)
              bdf.select(outCols.map(col): _*)
                .write.format("noop").mode("overwrite").save()
            else {
              val rows = bdf.select(outCols.map(col): _*).collect()
              buf.synchronized { buf ++= rows; () }
            }
          }
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", prevParts)
        s.conf.set(noDataKey, prevNoData)
      }
      try {
        batchesA.zipAll(batchesB, Seq.empty[A], Seq.empty[B]).foreach {
          case (ba, bb) =>
            if (ba.nonEmpty) { memA.addData(ba); () }
            if (bb.nonEmpty) { memB.addData(bb); () }
            q.processAllAvailable()
        }
        if (hasWatermark) {
          memA.addData(Seq.empty[A]); memB.addData(Seq.empty[B])
          q.processAllAvailable()
        }
      } finally q.stop()
      val outSchema = org.apache.spark.sql.types.StructType(
        outCols.map(c => built.schema(c)))
      s.createDataFrame(
        buf.synchronized(new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(buf).asJava)),
        outSchema)
    } finally rmTree(ckpt)
  }

  /** Shared shard prep for the streaming dedup-family harnesses
    * (q148/q152/q154): bucket docs into three time-ordered shards by
    * id range, pre-dedup each shard on `key` (min doc_id wins, so
    * which-row-survives INSIDE a micro-batch is deterministic — the
    * CROSS-shard suppression stays the streaming query's own state),
    * and collect the timestamped feed. */
  private def dedupShards(s: SparkSession, dup: DataFrame, key: Column)
      : Seq[Seq[(Long, String, Int, java.sql.Timestamp)]] = {
    import s.implicits._
    val wmin = Window.partitionBy("__b", "__k")
    val rows = dup
      .withColumn("__b", when(col("doc_id") < 200, 0)
        .when(col("doc_id") < 400, 1).otherwise(2))
      .withColumn("__k", key)
      .withColumn("__mn", min("doc_id").over(wmin))
      .filter(col("doc_id") === col("__mn"))
      .select(col("doc_id"), col("text"), col("__b"))
      .as[(Long, String, Int)].collect()
    (0 to 2).map(b => rows.toSeq.collect { case (id, tx, `b`) =>
      (id, tx, b, java.sql.Timestamp.valueOf(s"2024-01-01 00:0$b:00")) })
  }

  private def withDupsSql(table: String, idCol: String, below: Long, shift: Long): String =
    s"(SELECT * FROM $table UNION ALL SELECT ${"*"} REPLACE ($idCol + $shift AS $idCol) FROM $table WHERE $idCol < $below)"

  // stopword IN-list fragments
  private def inList(words: Seq[String]): String = words.map(w => s"'$w'").mkString("(", ", ", ")")

  // ---------------------------------------------------------------
  // the queries
  // ---------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- snapshot diff: two deterministic derivations of orders stand
    // in for version N / N+1; the delta classifies each key ---
    "q74_snapshot_diff" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val old = orders.filter(col("o_orderkey") % 97 =!= 0)
      val neu = orders.filter(col("o_orderkey") % 89 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 13 === 0, col("o_totalprice") * 1.1)
            .otherwise(col("o_totalprice")))
      Snapshot.diff(old, neu, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),

    // --- robust outlier summary (median/MAD, two sort-kernel passes) ---
    "q75_mad_outliers" -> ((s, d) =>
      Profiler.madProfile(t(s, d, "orders"), "o_totalprice", k = 3.0)),

    // --- domain-mixture sampling rates (uniform target over sources) ---
    "q76_mixture_weights" -> ((s, d) =>
      Corpus.mixtureWeights(t(s, d, "documents"), "source", "n_chars")
        .orderBy("domain")),

    // --- multi-level rollup totals (region → nation → grand total) in
    // ONE scan: ROLLUP plans a single Expand over the joined fact, so
    // the three aggregation levels share one shuffle instead of three
    // scans. Expressed via spark.sql: the DataFrame rollup API trips
    // Spark 4's ambiguous-self-join detector whenever the grouping
    // columns flow through a join (the Expand re-projects each
    // grouping attribute once per grouping set); the SQL path carries
    // no per-Dataset id tags and plans identically. ---
    "q77_rollup_revenue" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("q77_orders")
      t(s, d, "customer").createOrReplaceTempView("q77_customer")
      t(s, d, "nation").createOrReplaceTempView("q77_nation")
      t(s, d, "region").createOrReplaceTempView("q77_region")
      s.sql(
        """SELECT r_name, n_name, count(1) AS n_orders,
          |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
          |FROM q77_orders
          |  JOIN q77_customer ON o_custkey = c_custkey
          |  JOIN q77_nation ON c_nationkey = n_nationkey
          |  JOIN q77_region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP(r_name, n_name)
          |ORDER BY r_name, n_name""".stripMargin)
    }),

    // --- cross-tab pivot: events per type per day-of-week, one shuffle
    // (explicit pivot values — no extra distinct-collect pass) ---
    "q78_pivot_events" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("dow", dayofweek(col("ts")).cast(LongType))
        .groupBy("dow")
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("dow")),

    // --- first-order event-type transition matrix (keyed window —
    // parallel across users, never a global sort) ---
    "q79_transitions" -> ((s, d) =>
      Temporal.transitionMatrix(t(s, d, "events"), "user_id", "event_type",
        "ts", "event_id")
        .orderBy("from_type", "to_type")),

    // --- gap-filled hourly resample (complete calendar spine) ---
    "q80_resample_hourly" -> ((s, d) =>
      Temporal.resample(t(s, d, "events"), "ts", "value", unit = "hour")
        .orderBy("bucket")),

    // --- cumulative-adoption curve (windowless running distinct-user
    // total via the two-pass prefix sum) ---
    "q81_cumulative_users" -> ((s, d) =>
      Temporal.cumulativeFirstSeen(t(s, d, "events"), "user_id", "ts",
        unit = "day")
        .withColumnRenamed("cum_keys", "cum_users")
        .orderBy("bucket")),

    // --- audience overlap: Jaccard of item audiences over the same
    // bounded presence/pair shapes as the co-occurrence matrix ---
    "q107_audience_overlap" -> ((s, d) =>
      Frequent.audienceOverlap(t(s, d, "events"), "user_id", "event_type")
        .orderBy("item_a", "item_b")),

    // --- real audio-codec check, oracle-replayable like q31: md5-text
    // metadata serialized into ACTUAL RIFF/WAVE headers, parsed back by
    // the real byte-level reader; the oracle computes the same
    // channels/rate/duration arithmetic without seeing the bytes.
    // Rates are multiples of 8 kHz so byteRate·durMs/1000 is exact and
    // the declared duration round-trips to the millisecond ---
    "q106_multimodal_audio" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val fix = udf { (text: String) =>
        val dg = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        def u(i: Int) = dg(i) & 0xff
        val rate = Array(8000, 16000, 32000, 48000)(u(0) % 4)
        val channels = 1 + (u(1) % 2)
        val durMs = 500L + (u(2) * 256L + u(3)) % 60000L
        val byteRate = rate.toLong * channels * 2
        Multimodal.wavFixture(channels, rate, byteRate * durMs / 1000L)
      }
      val withP = docs.select(col("doc_id"), fix(col("text")).as("payload"))
      Multimodal.decode(withP, "payload")
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          col("decoded.channels").as("channels"),
          col("decoded.sample_rate").as("sample_rate"),
          col("decoded.duration_ms").as("duration_ms"))
        .orderBy("doc_id")
    }),

    // --- real video-codec check, the MP4 twin of q106: md5-derived
    // metadata serialized into ACTUAL ISO-BMFF boxes (ftyp + moov with
    // mvhd/tkhd), parsed back by the real box-walk reader; timescale
    // 1000 makes the declared duration round-trip exactly ---
    "q108_multimodal_video" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val fix = udf { (text: String) =>
        val dg = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        def u(i: Int) = dg(i) & 0xff
        val w = 160 + (u(0) * 256 + u(1)) % 3681          // 160..3840
        val h = 90 + (u(2) * 256 + u(3)) % 2071           // 90..2160
        val durMs = 1000L + (u(4).toLong * 65536 + u(5) * 256 + u(6)) % 600000L
        Multimodal.mp4Fixture(w, h, durMs)
      }
      val withP = docs.select(col("doc_id"), fix(col("text")).as("payload"))
      Multimodal.decode(withP, "payload")
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          col("decoded.width").as("width"),
          col("decoded.height").as("height"),
          col("decoded.duration_ms").as("duration_ms"))
        .orderBy("doc_id")
    }),

    // --- content-real image embedding check: md5-seeded pixel rasters
    // serialized into ACTUAL PNGs (deflate + scanline filters), decoded
    // back pixel-exactly by the real inflater path, and reduced to a
    // 16-bucket luminance histogram; the oracle re-derives the pixel
    // stream from (w, h, seeds) without ever seeing the payload ---
    "q109_image_histogram" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val fix = udf { (text: String) =>
        val dg = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        def u(i: Int) = dg(i) & 0xff
        val w = 8 + u(0) % 16
        val h = 8 + u(1) % 16
        // encoder filter varies by digest too: the decoded histogram
        // must be invariant to how the bytes were filtered
        Multimodal.pngPixelFixture(w, h, u(2), 1 + u(3) % 255, filterType = u(4) % 3)
      }
      val withP = docs.select(col("doc_id"), fix(col("text")).as("payload"))
      withP.select(col("doc_id"),
          posexplode(Multimodal.embedImage(col("payload"), 16)))
        .select(col("doc_id"), col("pos").cast("int").as("bucket"),
          round(col("col"), 6).as("frac"))
        .orderBy("doc_id", "bucket")
    }),

    // --- Bloom decontamination, oracle-graduated: with a 20x-oversized
    // filter at fpp 1e-9 the false-positive over-removal on this corpus
    // is deterministically zero (verified at both scales), so the
    // survivor set must EQUAL the exact anti-join's (the
    // no-false-negative half of the contract is what the filter
    // guarantees by construction) ---
    "q110_decontaminate_bloom" -> ((s, d) => {
      val train = t(s, d, "documents")
      val test = train.filter(col("doc_id") % 10 === 0).select(col("text"))
      Dedup.decontaminateBloom(train, test, "text",
          expectedItems = math.max(100L, 20L * test.count()), fpp = 1e-9)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // --- bucketed join, oracle-graduated: both sides written bucketed
    // on the join key (16 buckets) so the join plans with no Exchange
    // (asserted in BucketingSpec); the oracle's plain join proves
    // result parity — bucketing is a layout choice, not a semantics
    // change ---
    "q111_bucketed_join" -> ((s, d) => {
      val orders = t(s, d, "orders").select(col("o_custkey"), col("o_totalprice"))
      val cust = t(s, d, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      Bucketing.writeBucketed(orders, "graft_q111_orders", "o_custkey", 16)
      Bucketing.writeBucketed(cust, "graft_q111_cust", "o_custkey", 16)
      Bucketing.bucketedJoin(s, "graft_q111_orders", "graft_q111_cust", "o_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast(dec)).cast("double"), 6).as("total"))
        .orderBy("c_mktsegment")
    }),

    // --- hyperplane-LSH bucket populations, oracle-graduated: the
    // oracle receives the md5/FNV-seeded hyperplane components as SQL
    // literals (computed at SQL-build time from the same public
    // formula) and replays the sign-bit string with left-associated
    // double arithmetic — bit strings and their populations must match
    // exactly ---
    "q112_hyperplane_buckets" -> ((s, d) => {
      val e = t(s, d, "embeddings").filter(col("embedding").isNotNull)
      e.select(Similarity.hyperplaneBucket(col("embedding"),
          dim = 64, nBits = 6, seed = 42L).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }),

    // --- batch twin of the streaming interval join (same code path:
    // StreamingProfile.intervalJoin on batch frames — watermarks are
    // no-ops in batch, the join condition is identical), so the one
    // streaming op without an oracle-checked twin now has one ---
    "q113_interval_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val l = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
      val r = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("pts"))
      graft.streaming.StreamingProfile.intervalJoin(l, r, "user_id", "ts", "pts",
          maxDelay = "1 hour")
        .select(col("click_id"), col("purchase_id"))
        .orderBy("click_id", "purchase_id")
    }),

    // --- PCA, oracle-graduated via an eigenbasis-invariant check: the
    // input is an EXACTLY rank-2 6-D embedding built from two customer
    // columns in a rotated orthonormal basis (u = 1/√6·(1,…,1),
    // v = 1/√6·(1,−1,…)); the top-2 PCA projection of such data is an
    // isometry on row differences, so every pairwise projected distance
    // must equal sqrt(Δa² + Δb²) — which the oracle computes from the
    // coefficients without eigendecomposing anything. Rounded to 4 dp
    // (the eigensolver's ~1e-12 noise is far below that) ---
    "q114_pca_isometry" -> ((s, d) => {
      val su = 1.0 / math.sqrt(6.0)
      val base = t(s, d, "customer").filter(col("c_custkey") <= 50)
        .select(col("c_custkey").as("id"),
          (col("c_acctbal").cast("double") / 1000.0).as("a"),
          (col("c_custkey").cast("double") / 10.0).as("b"))
      val vec = array((0 until 6).map { j =>
        col("a") * lit(su) + col("b") * lit(if (j % 2 == 0) su else -su)
      }: _*)
      val projected = graft.ops.Projection.pca(
        base.select(col("id"), vec.as("emb")), "id", "emb", k = 2)
      projected.as("l").join(projected.as("r"), col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
          round(sqrt(
            pow(element_at(col("l.pc"), 1) - element_at(col("r.pc"), 1), 2) +
            pow(element_at(col("l.pc"), 2) - element_at(col("r.pc"), 2), 2)), 4)
            .as("dist"))
        .orderBy("id_a", "id_b")
    }),

    // --- BM25 retrieval scores over the shared tokenizer: the corpus
    // vocabulary dies at the scan (map-side term filter); per-doc
    // totals summed in fixed term order for cross-engine determinism ---
    "q115_bm25_scores" -> ((s, d) =>
      Corpus.bm25(t(s, d, "documents"), "doc_id", "text",
          Seq("spark", "shuffle", "hash", "merge", "window"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // --- hard-negative mining: top-k nearest neighbors with a
    // DIFFERENT language label, the contrastive-training pair miner;
    // label filter applied at the scan, per-partition heap top-k ---
    "q116_hard_negatives" -> ((s, d) => {
      val lang = t(s, d, "documents").select(col("doc_id").as("vec_id"), col("lang"))
      val e = t(s, d, "embeddings").join(lang, "vec_id")
      Similarity.hardNegatives(
          e.filter(col("vec_id") < 10), e,
          "vec_id", "embedding", "lang", "vec_id", "embedding", "lang", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // --- token-budget selection per source: greedy fill of each
    // source's budget in the content-permuted order; per-source
    // cumulative sums from the shared prefix pass, no per-source
    // window; output size is budget-bounded, scale-invariant ---
    "q117_token_budget" -> ((s, d) =>
      Corpus.tokenBudgetSample(t(s, d, "documents"), "doc_id", "text",
          "source", budgetPerSource = 2000L)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // --- FLAC twin of q106: md5-derived metadata serialized into real
    // STREAMINFO headers, parsed back by the byte-level reader; rates
    // are multiples of 8 kHz so samples = rate·durMs/1000 is exact and
    // the duration round-trips to the millisecond ---
    "q119_multimodal_flac" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val fix = udf { (text: String) =>
        val dg = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        def u(i: Int) = dg(i) & 0xff
        val rate = Array(8000, 16000, 32000, 48000)(u(0) % 4)
        val channels = 1 + (u(1) % 2)
        val durMs = 500L + (u(2) * 256L + u(3)) % 60000L
        Multimodal.flacFixture(channels, rate, rate.toLong * durMs / 1000L)
      }
      val withP = docs.select(col("doc_id"), fix(col("text")).as("payload"))
      Multimodal.decode(withP, "payload")
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          col("decoded.channels").as("channels"),
          col("decoded.sample_rate").as("sample_rate"),
          col("decoded.duration_ms").as("duration_ms"))
        .orderBy("doc_id")
    }),

    // --- URL decomposition round-trip: md5-derived URLs assembled by
    // concat, decomposed by Spark's REAL parse_url grammar; the oracle
    // re-assembles the expected components from the same hex digits
    // without ever parsing — a genuine parser check ---
    "q121_url_parse" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val h = md5(col("text").cast("binary"))
      val tld = element_at(array(lit("com"), lit("org"), lit("net"), lit("io")),
        (conv(substring(h, 13, 1), 16, 10).cast("int") % 4) + 1)
      val deep = conv(substring(h, 14, 1), 16, 10).cast("int") % 2 === 0
      val path = when(deep,
          concat(lit("/p"), substring(h, 7, 2), lit("/q"), substring(h, 9, 2)))
        .otherwise(concat(lit("/p"), substring(h, 7, 2)))
      val url = concat(lit("https://h"), substring(h, 1, 6), lit("."), tld,
        path, lit("?x="), substring(h, 11, 2))
      docs.select(col("doc_id"), TextAnalysis.urlParts(url).as("u"))
        .select(col("doc_id"), col("u.host").as("host"), col("u.tld").as("tld"),
          col("u.path").as("path"), col("u.depth").as("depth"),
          col("u.query").as("query"))
        .orderBy("doc_id")
    }),

    // --- time travel: per-key state AS OF a timestamp from the event
    // changelog — one max_by aggregation, |keys|-row shuffle however
    // deep the history (never a per-key window over all changes) ---
    "q122_asof_snapshot" -> ((s, d) =>
      Snapshot.asOf(t(s, d, "events"), "user_id", "ts", "event_id",
          Seq("event_type", "value"), lit("2024-01-15 00:00:00").cast("timestamp"))
        .orderBy("user_id")),

    // --- streaming incremental admission under a REAL micro-batch
    // trigger: three daily shards fed through a MemoryStream into
    // StreamingProfile.streamingAdmit (band anti-joins vs the persisted
    // prior sketch table + watermark-bounded intra-stream sketch dedup),
    // each shard one micro-batch, admitted rows landed by a
    // foreachBatch parquet sink and read back. Shards are pre-deduped
    // on exact sketch (min doc_id wins) so which-row-survives inside a
    // micro-batch is deterministic — cross-shard suppression is the
    // streaming query's own state, exercised end-to-end. The MemoryStream
    // feed is a test-harness source (driver-side by design); the
    // admission operator itself is the same distributed plan the batch
    // twin (q120) runs. ---
    "q123_streaming_admit" -> ((s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      // Persist the prior sketches to parquet and stream against the
      // FILE table — the production shape ("persisted sketch table"),
      // and necessary for performance: Structured Streaming re-plans
      // the static join side every micro-batch, so an unmaterialized
      // sketch expression would recompute the digest of the whole
      // prior corpus once per band per batch (bands × batches times).
      // tmpfs scratch (same backing as the harness checkpoints): the
      // static join side is re-read once per band per micro-batch.
      // Deleted after the harness returns — the result is driver-
      // buffered by then, and leaked tmpfs pages would shrink the
      // memory the benchmarks measure.
      val priorRoot = tmpCheckpointDir("graft-prior-sketch")
      val priorDir = priorRoot.toString + "/sketches"
      try {
      Dedup.sketchTable(docs.filter(col("doc_id") < 400), "doc_id", "text")
        .write.mode("overwrite").parquet(priorDir)
      val prior = s.read.parquet(priorDir)
      // One pass prepares all three shards: shard id from the doc_id
      // range, per-(shard, sketch) exact dedup (min doc_id wins) so
      // which-row-survives inside a micro-batch is deterministic, one
      // collect feeding the test-harness source.
      val wmin = Window.partitionBy("__b", "__h")
      val shardRows = docs.filter(col("doc_id") >= 400)
        .withColumn("__b", when(col("doc_id") < 600, 0)
          .when(col("doc_id") < 800, 1).otherwise(2))
        .withColumn("__h", Dedup.sketchWord(col("text"), 64))
        .withColumn("__mn", min("doc_id").over(wmin))
        .filter(col("doc_id") === col("__mn"))
        .select(col("doc_id"), col("text"), col("__b"))
        .as[(Long, String, Int)].collect()
      val shards: Seq[Seq[(Long, String, Int, java.sql.Timestamp)]] =
        (0 to 2).map(b => shardRows.toSeq.collect { case (id, tx, `b`) =>
          (id, tx, b, java.sql.Timestamp.valueOf(s"2024-01-01 00:0$b:00")) })
      runMicroBatched(s, Seq("doc_id", "text", "batch", "ts"), shards,
        "graft-stream-admit", Seq("doc_id", "batch")) { stream =>
        StreamingProfile.streamingAdmit(stream, "ts", "text", prior)
      }.orderBy("doc_id")
      } finally rmTree(priorRoot) // covers the sketch write too
    }),

    // --- streaming drift monitor under a REAL micro-batch trigger:
    // baseline deciles + smoothed bin probabilities computed offline
    // from the pre-split events (the reference snapshot), then the
    // live weeks fed through a MemoryStream into
    // StreamingProfile.windowedPsi (per-day tumbling windows, append
    // mode), landed by a foreachBatch parquet sink and read back. A
    // sentinel event past the horizon advances the watermark so every
    // real window closes; the sentinel's own window stays open and is
    // never emitted. The MemoryStream feed is a test-harness source
    // (driver-side by design); the windowed aggregation is the same
    // distributed plan a Kafka source would run. ---
    "q133_streaming_psi" -> ((s, d) => {
      import s.implicits._
      val bins = 10
      val ev = t(s, d, "events").filter(col("value").isNotNull)
      val split = lit("2024-01-08 00:00:00").cast("timestamp")
      val base = ev.filter(col("ts") < split)
        .select(col("value").cast("double").as("v"))
      val nBase = base.count()
      val cuts = graft.engine.Quantiles.exactExpr(base, col("v"),
        (1 until bins).map(_.toDouble / bins), nBase)
      val binE = cuts.foldLeft(lit(0)) { (acc, c) =>
        acc + when(col("v") >= lit(c), 1).otherwise(0) }
      val baseCounts = base.groupBy(binE.as("bin"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val probs = (0 until bins).map(i =>
        (baseCounts.getOrElse(i, 0L) + 0.5) / (nBase + 0.5 * bins))
      val live = ev.filter(col("ts") >= split)
        .withColumn("__b",
          when(col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"), 0)
          .when(col("ts") < lit("2024-01-22 00:00:00").cast("timestamp"), 1)
          .otherwise(2))
        .select(col("event_id"), col("ts"),
          col("value").cast("double").as("value"), col("__b"))
        .as[(Long, java.sql.Timestamp, Double, Int)].collect()
      // the sentinel rides IN the last data batch (not a 4th batch):
      // the watermark updates after the batch either way, and the
      // automatic no-data batch then closes every real window — same
      // append-mode emission set, two fewer triggers (~0.5 s of
      // per-trigger machinery, R12-STREAMIO)
      val batches: Seq[Seq[(Long, java.sql.Timestamp, Double, Int)]] =
        (0 to 2).map { b =>
          val rows = live.toSeq.filter(_._4 == b)
          if (b == 2) rows :+
            ((-1L, java.sql.Timestamp.valueOf("2024-02-05 00:00:00"), 0.0, 3))
          else rows
        }
      runMicroBatched(s, Seq("event_id", "ts", "value", "batch"), batches,
        "graft-stream-psi", Seq("window_start", "n", "psi")) { stream =>
        StreamingProfile.windowedPsi(stream, "ts", "value", cuts, probs,
          windowDur = "24 hours", watermark = "24 hours")
      }.select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"), col("n"), col("psi"))
        .orderBy("window_start")
    }),

    // --- small-files maintenance end-to-end: 12 shard appends leave a
    // fragmented parquet directory (≥12 part files), compactParquet
    // rewrites it to the size-derived file count, and the query returns
    // aggregates over the COMPACTED directory — content parity with the
    // source table is the oracle check, and the file-count contract
    // (before > after == returned partition count) is enforced by a
    // require() that reds the row if compaction ever stops working. ---
    "q124_compact_sink" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("source").isNotNull)
        .select("doc_id", "source", "n_chars")
      val dir = java.nio.file.Files
        .createTempDirectory("graft-compact").toString + "/docs"
      // fixture: the small-file debris of 12 appends x 4 part files.
      // r17: materialized in ONE write job (48-way round-robin = the
      // same 48-small-file directory state) instead of 12 sequential
      // jobs — the operator under test is compactParquet, whose input
      // (file count, total bytes, rows) and output (files_after, the
      // aggregated rows) are identical either way; the 12-job loop
      // charged ~1.3 s of pure job-scheduling overhead to a query
      // that measures compaction.
      docs.repartition(48).write.mode("append").parquet(dir)
      val hPath = new org.apache.hadoop.fs.Path(dir)
      val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      def partFiles(): Int = fs.listStatus(hPath)
        .count(_.getPath.getName.startsWith("part-"))
      val before = partFiles()
      val parts = Sink.compactParquet(s, dir, targetMB = 256)
      val after = partFiles()
      require(before >= 12 && after == parts && after < before,
        s"compaction contract violated: before=$before after=$after parts=$parts")
      s.read.parquet(dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .withColumn("files_after", lit(after))
        .orderBy("source")
    }),

    // --- full-width text profile probe: the reference's production
    // shape (fasttext D=100 × maxTokens=32 → 3200-dim mean/cov — 10.2M
    // covariance cells) through the lazy-alloc treeAggregate and the
    // driver Cholesky. No SQL oracle (a 3200-dim covariance replay is
    // not sanely SQL-expressible — rows-only per the driver contract,
    // like the samplers); correctness at this width is pinned by the
    // brute-force-parity spec in TextPipelineSpec, and this entry puts
    // the width's runtime in BENCH_LOG every round. ---
    "q125_text_profile_wide" -> ((s, d) => {
      import graft.text.{Md5Embedder, TextProfiler}
      val stats = TextProfiler.profile(t(s, d, "documents"), "text",
        Md5Embedder(100), maxTokens = 32, rawSampleCap = 1).get
      import s.implicits._
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (0 until 8).map(i => (i, r6(stats.mean(i)), r6(stats.std(i)),
          r6(stats.covTrace), stats.chol.isDefined, stats.count))
        .toDF("dim_idx", "mean", "std", "cov_trace", "chol_ok", "n_docs")
    }),

    // --- symmetric int8 embedding quantization: the 4x storage cut in
    // front of the ANN kernels. Pure projection (array HOFs, zero
    // shuffle); the oracle replays scale/clamp/residual with the same
    // double-precision operation order. qvec is serialized to a
    // comma-joined string (both engines render TINYINT identically) so
    // the comparison harness can sort/hash the column — array-typed
    // result columns are unhashable on the oracle side ---
    "q126_quantize_int8" -> ((s, d) =>
      Quantize.int8Symmetric(t(s, d, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          concat_ws(",", transform(col("qvec"), _.cast("string"))).as("qvec"),
          col("n_clipped"), col("err_l2"))
        .orderBy("vec_id")),

    // --- token-distribution JS divergence per source vs the corpus:
    // which slice reads least like the blend it feeds ---
    "q127_token_js_divergence" -> ((s, d) =>
      Drift.tokenJsDivergence(t(s, d, "documents"), "source", "text")
        .orderBy("source")),

    // --- ANN directly on the quantized column: integer dot products,
    // scales cancel from the cosine — exact arithmetic end to end ---
    "q128_ann_int8" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Quantize.int8TopK(
        e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // --- leakage-free splits: near-dup clusters (q48's fixture) never
    // straddle train/val/test — the split key is the CC representative ---
    "q129_leakage_free_split" -> ((s, d) => {
      val base = t(s, d, "documents")
      val dup = base.unionByName(base.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 10000)
        .withColumn("text", concat(col("text"), lit(" nearmarker"))))
      Sampling.assignSplitsLeakageFree(dup, "doc_id", "text",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "rep", "split")
        .orderBy("doc_id")
    }),

    // --- product quantization: all m per-subspace Lloyd trainings
    // share the same jobs (subspace = grouping key); each vector
    // becomes m codes — the stored index, raw vectors droppable ---
    "q130_pq_codes" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val cb = Quantize.pqTrain(e, "vec_id", "embedding",
        dim = 64, m = 4, k = 8, iterations = 2)
      Quantize.pqEncode(e, "vec_id", "embedding", cb, dim = 64, m = 4)
        .select(col("id").as("vec_id"), col("subspace"), col("code"))
        .orderBy("vec_id", "subspace")
    }),

    // --- PQ-ADC ANN: per-query distance tables (m·k entries,
    // broadcast) summed over each corpus vector's codes — the scoring
    // join never touches a raw corpus vector ---
    "q131_pq_ann" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Quantize.pqTopKAdc(
        e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", "vec_id", "embedding",
        dim = 64, m = 4, k = 8, iterations = 2, topK = 10)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("adist"), 6).as("adist"))
        .orderBy("query_id", "rank")
    }),

    // --- k-anonymity: re-identification risk over quasi-identifier
    // tuples — the governance gate before a dataset (or its synthetic
    // twin) is released ---
    "q138_k_anonymity" -> ((s, d) =>
      Expectations.kAnonymity(t(s, d, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 10)),

    // --- l-diversity: q138's companion release gate — every QI group
    // must also carry >= l distinct sensitive values (homogeneity
    // attack), with the entropy form exp(H) catching skewed groups a
    // distinct count overstates; sensitive attr = account-balance band ---
    "q143_l_diversity" -> ((s, d) =>
      Expectations.lDiversity(
        t(s, d, "customer").withColumn("bal_band",
          floor(col("c_acctbal") / 2000).cast("int")),
        Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 3)),

    // --- content-real audio embedding (the audio twin of q109):
    // md5-seeded 16-bit PCM bodies inside REAL RIFF/WAVE containers,
    // fully decoded back sample-by-sample and reduced to a 16-bucket
    // amplitude histogram — the oracle re-derives every sample
    // arithmetically from the seeds without seeing a payload byte ---
    "q144_audio_histogram" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val fix = udf { (text: String) =>
        val dg = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        def u(i: Int) = dg(i) & 0xff
        val channels = 1 + (u(0) % 2)
        val rate = Array(8000, 16000, 32000, 48000)(u(1) % 4)
        val n = 64 + (u(2) * 256 + u(3)) % 960
        Multimodal.wavPcmFixture(channels, rate, n,
          u(4) * 256 + u(5), 1 + u(6) % 255)
      }
      // n recomputed expression-side (same md5 digits as the fixture)
      // so the published fraction rounds through INTEGER arithmetic:
      // the count c is recovered exactly from frac·n, and
      // round-half-up(c/n, 6) = (2·c·10⁶ + n) div (2n), an identical
      // integer on both engines — a plain double round(c/n, 6) splits
      // ties like 41/640 = 0.0640625 differently across engines
      // (caught by the r13 sf1 verify: 43 rows off at the 7th digit;
      // sf0.01/sf0.1 never landed on a tie). Non-tie values are
      // unchanged, so the sf0.01 oracle row is identical.
      val nSamp = (lit(64) +
        conv(substring(md5(col("text")), 5, 4), 16, 10).cast("long") % 960)
        .cast("int")
      val withP = docs.select(col("doc_id"), fix(col("text")).as("payload"),
        nSamp.as("__n"))
      withP.select(col("doc_id"), col("__n"),
          posexplode(Multimodal.embedAudio(col("payload"), 16)))
        .withColumn("__c", round(col("col") * col("__n"), 0).cast("long"))
        .select(col("doc_id"), col("pos").cast("int").as("bucket"),
          (expr("(__c * 2000000 + __n) div (2 * __n)").cast("double") / 1e6)
            .as("frac"))
        .orderBy("doc_id", "bucket")
    }),

    // --- content-real VIDEO embedding (closes the multimodal family:
    // q109 image / q144 audio / this): md5-seeded monochrome frame
    // rasters serialized into REAL YUV4MPEG2 streams (the standard
    // uncompressed video container), every frame's luma plane decoded
    // back pixel-exactly and reduced to a 16-bucket luminance
    // histogram. The frame RATE varies by digest while the pixels
    // don't depend on it — the embedding must be container-invariant,
    // and the oracle re-derives all pixels arithmetically from the
    // seeds without seeing a payload byte. Compressed codecs (MP4)
    // still fall back to the md5 embedding by contract. ---
    "q146_video_histogram" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val fix = udf { (text: String) =>
        val dg = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        def u(i: Int) = dg(i) & 0xff
        val w = 8 + u(0) % 8
        val h = 8 + u(1) % 8
        val nf = 2 + u(2) % 4
        Multimodal.y4mFixture(w, h, nf,
          u(3) * 256 + u(4), 1 + u(5) % 255, fpsNum = 25 + (u(6) % 2) * 5)
      }
      val withP = docs.select(col("doc_id"), fix(col("text")).as("payload"))
      withP.select(col("doc_id"),
          posexplode(Multimodal.embedVideo(col("payload"), 16)))
        .select(col("doc_id"), col("pos").cast("int").as("bucket"),
          round(col("col"), 6).as("frac"))
        .orderBy("doc_id", "bucket")
    }),

    // --- the PRODUCTION route of the int8 ANN gate under the oracle:
    // maxExactRows forced below the corpus size, so int8TopKAuto routes
    // to IVF over the quantized components — seeded centroids (16
    // lowest-id quantized corpus vectors), cosine cell assignment,
    // nprobe=4 probed cells per query. q128 oracles the exact kernel;
    // this row proves the scale route's full algebra (quantize →
    // centroid seed → assign → probe → rank) against a SQL replay —
    // the quadratic kernel never runs here. ---
    "q147_ann_int8_ivf" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Quantize.int8TopKAuto(
        e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", "vec_id", "embedding", k = 10,
        maxExactRows = 100L, nCentroids = 16, nprobe = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // --- streaming NEAR-dup suppression under a REAL micro-batch
    // trigger (q123's harness shape, minus the prior-corpus stage):
    // near-dup copies of early documents are injected with shifted ids,
    // the corpus is fed in three time-ordered shards, and sketch-equal
    // rows arriving after their first occurrence are dropped by the
    // watermark-bounded streaming state. Shards are pre-deduped on the
    // 64-bit SimHash word (min doc_id wins) so which-row-survives
    // inside a micro-batch is deterministic; CROSS-shard suppression is
    // the streaming query's own state, exercised end-to-end. ---
    "q148_streaming_neardup" -> ((s, d) => {
      import s.implicits._
      // null texts out up front: a null sketch is one key VALUE to the
      // streaming dedup state but never equal to anything in the SQL
      // replay's NOT EXISTS — the corpus has none, pinned here so that
      // stays true by construction
      val dup = withDups(t(s, d, "documents"), "doc_id", 50, 10000)
        .filter(col("text").isNotNull)
      val shards = dedupShards(s, dup, Dedup.sketchWord(col("text"), 64))
      runMicroBatched(s, Seq("doc_id", "text", "batch", "ts"), shards,
        "graft-stream-neardup", Seq("doc_id", "batch")) { stream =>
        StreamingProfile.streamingNearDup(stream, "ts", "text")
      }.orderBy("doc_id")
    }),

    // --- the MVN→decode text generator under the oracle (deterministic
    // mode): the production sampler draws z ~ N(0, I) per row with
    // seeded randn and decodes y = mean + L·z to nearest vocab words —
    // replayable everywhere EXCEPT the randn draw, which no other
    // engine reproduces. Here z comes from md5 Irwin-Hall(12) pseudo-
    // normals (transcendental-free, bit-identical cross-engine) and (mean, L) is a fixed FNV-derived "trained" profile,
    // so the full sampling algebra (pseudo-normal → affine MVN map →
    // per-slot nearest-word decode over the REAL capped vocab and the
    // REAL batched decode kernel) runs under the hard signal; only the
    // entropy source is swapped. q32 keeps the rows-only contract for
    // the genuinely seeded path. ---
    "q150_mvn_text_decode" -> ((s, d) => {
      import graft.text.{Md5Embedder, Vocab}
      val docs = t(s, d, "documents")
      val vocab = Vocab.build(docs, "text", Md5Embedder(Q34Dim), cap = Q35VocabCap)
      val bcV = s.sparkContext.broadcast(vocab)
      val mt = 2
      val width = mt * Q34Dim
      def u(k: Int, j: Int): Column =
        (conv(substring(md5(concat(lit("q150z#"), col("id").cast("string"),
          lit(s"#$k#$j")).cast("binary")), 1, 7), 16, 10).cast("double")
          + lit(0.5)) / lit(268435456.0)
      // Irwin–Hall(12) pseudo-normal: Σ of 12 md5-derived uniforms − 6
      // (mean 0, variance 1 — the classic transcendental-free normal
      // approximation). Each uniform is (2v+1)/2^29 — exactly
      // representable — and the 12-term sum needs 33 mantissa bits, so
      // z, y, and the decode argmax are BIT-identical across engines:
      // no ln/cos whose last ulp could differ between JVM Math and
      // another engine's libm and flip a near-tied nearest-word pick.
      val z = (0 until width).map(k =>
        (0 until 12).map(j => u(k, j)).reduce(_ + _) - lit(6.0))
      val y = (0 until width).map(j =>
        (0 to j).foldLeft(lit(q150Mean(j)): Column) { (acc, k) =>
          acc + lit(q150L(j, k)) * z(k) })
      val dec = udf { (v: Seq[Double]) => bcV.value.decode(v.toArray, mt) }
      s.range(Q150N)
        .select(col("id").as("gen_id"), dec(array(y: _*)).as("decoded"))
        .orderBy("gen_id")
    }),

    // --- streaming value_counts (the categorical profile) under a REAL
    // micro-batch trigger (q133's harness shape): per-day tumbling
    // windows of event_type counts, the events table fed in three
    // weekly batches; a sentinel past the horizon advances the
    // watermark so every real window closes, and the sentinel's own
    // window stays open and is never emitted. ---
    "q149_streaming_value_counts" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
        .filter(col("ts").isNotNull && col("event_type").isNotNull)
        .withColumn("__b",
          when(col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"), 0)
          .when(col("ts") < lit("2024-01-22 00:00:00").cast("timestamp"), 1)
          .otherwise(2))
        .select(col("event_id"), col("ts"), col("event_type"), col("__b"))
        .as[(Long, java.sql.Timestamp, String, Int)].collect()
      // sentinel rides IN the last data batch (q133's rationale): same
      // append-mode emission set, two fewer triggers
      val batches: Seq[Seq[(Long, java.sql.Timestamp, String, Int)]] =
        (0 to 2).map { b =>
          val rows = ev.toSeq.filter(_._4 == b)
          if (b == 2) rows :+
            ((-1L, java.sql.Timestamp.valueOf("2024-02-05 00:00:00"),
              "sentinel", 3))
          else rows
        }
      runMicroBatched(s, Seq("event_id", "ts", "event_type", "batch"), batches,
        "graft-stream-vc", Seq("window_start", "event_type", "cnt")) { stream =>
        StreamingProfile.windowedValueCounts(stream, "ts", "event_type",
          window = "24 hours", watermark = "24 hours")
      }.select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"), col("event_type"), col("cnt"))
        .orderBy("window_start", "event_type")
    }),

    // --- streaming numeric profile under a REAL micro-batch trigger
    // (q149's harness): per-day tumbling windows of value moments per
    // event_type — count / mean / pop-std / min / max incrementally
    // maintained, every real window closed by the sentinel-advanced
    // watermark. Null values ride through: the aggregates skip them,
    // and an all-null group profiles as (0, null, ...) both sides. ---
    "q151_streaming_numeric_profile" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
        .filter(col("ts").isNotNull && col("event_type").isNotNull)
        .withColumn("__b",
          when(col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"), 0)
          .when(col("ts") < lit("2024-01-22 00:00:00").cast("timestamp"), 1)
          .otherwise(2))
        .select(col("event_id"), col("ts"), col("event_type"),
          col("value").cast("double"), col("__b"))
        .as[(Long, java.sql.Timestamp, String, Option[Double], Int)].collect()
      val batches: Seq[Seq[(Long, java.sql.Timestamp, String, Option[Double], Int)]] =
        // sentinel in the last data batch (q133's rationale)
        (0 to 2).map { b =>
          val rows = ev.toSeq.filter(_._5 == b)
          if (b == 2) rows :+
            ((-1L, java.sql.Timestamp.valueOf("2024-02-05 00:00:00"),
              "sentinel", Option(0.0), 3))
          else rows
        }
      runMicroBatched(s, Seq("event_id", "ts", "event_type", "value", "batch"),
        batches, "graft-stream-np",
        Seq("window_start", "event_type", "n", "mean", "std", "min", "max")) { stream =>
        StreamingProfile.windowedNumericProfile(stream, "ts", "event_type",
          "value", window = "24 hours", watermark = "24 hours")
      }.select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"), col("event_type"), col("n"),
          round(col("mean"), 6).as("mean"), round(col("std"), 6).as("std"),
          round(col("min"), 6).as("min"), round(col("max"), 6).as("max"))
        .orderBy("window_start", "event_type")
    }),

    // --- streaming EXACT dedup under a REAL micro-batch trigger
    // (q148's harness keyed on the content fingerprint instead of the
    // SimHash sketch): injected exact copies arriving in later shards
    // are dropped by dropDuplicatesWithinWatermark state. ---
    "q152_streaming_dedup" -> ((s, d) => {
      import s.implicits._
      // same null-text pin as q148
      val dup = withDups(t(s, d, "documents"), "doc_id", 50, 10000)
        .filter(col("text").isNotNull)
      val shards = dedupShards(s, dup, TextAnalysis.fingerprint(col("text")))
      runMicroBatched(s, Seq("doc_id", "text", "batch", "ts"), shards,
        "graft-stream-dedup", Seq("doc_id", "batch")) { stream =>
        StreamingProfile.streamingDedup(stream, "ts", "text")
      }.orderBy("doc_id")
    }),

    // --- stream-static enrichment under a REAL micro-batch trigger:
    // orders stream in three batches, the customer dimension joins by
    // BROADCAST per micro-batch (stateless — no watermark, no state
    // store); the emitted union must equal the batch left join. ---
    "q153_streaming_enrich" -> ((s, d) => {
      import s.implicits._
      val dim = t(s, d, "customer").select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment"), col("c_nationkey"))
      val ords = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_orderkey") % 3).cast("int").as("__b"))
        .as[(Long, Long, Int)].collect()
      val batches: Seq[Seq[(Long, Long, Int)]] =
        (0 to 2).map(b => ords.toSeq.filter(_._3 == b))
      runMicroBatched(s, Seq("o_orderkey", "o_custkey", "batch"), batches,
        "graft-stream-enrich",
        Seq("o_orderkey", "o_custkey", "c_mktsegment", "c_nationkey")) { stream =>
        StreamingProfile.enrich(stream, dim, "o_custkey")
      }.orderBy("o_orderkey")
    }),

    // --- the FULL streaming curation pipeline under a REAL micro-batch
    // trigger: q52's cleaning/filter algebra verbatim (stateless stages
    // run unchanged on the stream), the exact-dedup stage swapped for
    // watermark-bounded fingerprint state, the id-hash sample last.
    // Shards pre-deduped on the CLEANED-content fingerprint (min doc_id
    // wins) for deterministic within-batch survivorship; cross-shard
    // suppression is the streaming state. ---
    "q154_streaming_curate" -> ((s, d) => {
      import s.implicits._
      // same null-text pin as q148
      val dup = withDups(t(s, d, "documents"), "doc_id", 50, 10000)
        .filter(col("text").isNotNull)
        .withColumn("text",
          when(col("doc_id") % 4 === 0,
            concat(lit("<html><p class=\"x\">"), col("text"),
              lit("</p> see https://example.com/a?b=1 now</html>")))
            .otherwise(col("text")))
        .withColumn("text",
          when(col("doc_id") % 3 === 0,
            concat(col("text"),
              lit(" contact alice.smith@example.org or +1 (415) 555-0100")))
            .otherwise(col("text")))
      val shards = dedupShards(s, dup, TextAnalysis.fingerprint(
        TextAnalysis.redactPii(TextAnalysis.stripMarkup(col("text")))))
      runMicroBatched(s, Seq("doc_id", "text", "batch", "ts"), shards,
        "graft-stream-curate",
        Seq("id", "text_clean", "lang", "quality", "n_tokens")) { stream =>
        StreamingProfile.streamingCurate(stream, "ts", "doc_id", "text",
          Curation.CurationConfig(lang = Some("en"), minQuality = 0.5,
            minTokens = 5, sampleFraction = 0.5))
      }.select(col("id").as("doc_id"), col("text_clean"), col("lang"),
          round(col("quality"), 6).as("quality"), col("n_tokens"))
        .orderBy("doc_id")
    }),

    // --- stateful streaming sessionize under a REAL micro-batch
    // trigger (q123's harness shape): the events table is fed in three
    // time-ordered shards through mapGroupsWithState — per-user
    // (last_ts, counts) state carries across micro-batches, so the
    // final per-user totals must equal the batch lag-window sessionize
    // (q18's oracle algebra). Output = each user's LAST update row
    // (max batch id), i.e. the state after the stream drains ---
    "q145_streaming_sessionize" -> ((s, d) => {
      import s.implicits._
      val tagged = t(s, d, "events")
        .withColumn("__b",
          when(col("ts") < lit("2024-01-11 00:00:00").cast("timestamp"), 0)
          .when(col("ts") < lit("2024-01-21 00:00:00").cast("timestamp"), 1)
          .otherwise(2))
        .select(col("user_id").cast("long"), unix_millis(col("ts")),
          col("__b"))
        .as[(Long, Long, Int)].collect()
      val batches: Seq[Seq[(Long, Long)]] =
        (0 to 2).map(b => tagged.toSeq.collect { case (u, ts, `b`) => (u, ts) })
      // same harness shape as runMicroBatched (8 source partitions,
      // 1 state partition, tmpfs checkpoint, driver-buffer sink) —
      // inline only because the read-off needs each emission's
      // batch_id, which the shared harness does not expose
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long)](s,
          math.min(8, s.sparkContext.defaultParallelism))
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      val ckpt = tmpCheckpointDir("graft-stream-sessionize")
      // rmTree covers a failed start() too, not just the feed loop
      // (same leak guard as runMicroBatched)
      try {
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "1")
        val q = try {
          StreamingProfile.sessionize(mem.toDS(), gapMs = 1800000L)
            .toDF()
            .writeStream
            .option("checkpointLocation", ckpt.getAbsolutePath)
            .foreachBatch { (bdf: DataFrame, bid: Long) =>
              if (streamNoopSink)
                bdf.write.format("noop").mode("overwrite").save()
              else {
                val rows = bdf.collect().map(r =>
                  (r.getLong(0), r.getLong(1), r.getLong(2), bid))
                buf.synchronized { buf ++= rows; () }
              }
            }
            // mapGroupsWithState emits updated groups per batch
            .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
        try {
          batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        } finally q.stop()
      } finally rmTree(ckpt)
      buf.synchronized(buf.toSeq)
        .toDF("userId", "nSessions", "nEvents", "batch_id")
        .groupBy(col("userId").as("user_id"))
        .agg(max_by(col("nSessions"), col("batch_id")).as("n_sessions"),
          max_by(col("nEvents"), col("batch_id")).as("n_events"))
        .orderBy("user_id")
    }),

    // --- char-window exact-substring dedup coverage: the sliding-
    // window form of suffix-based dedup — catches copies that cross
    // token/passage boundaries (q55 chunks would miss them) ---
    "q139_window_dedup" -> ((s, d) =>
      Corpus.windowDupStats(withDups(t(s, d, "documents"), "doc_id", 50, 10000),
        "doc_id", "text", width = 40, stride = 20)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // --- exact dedup, keep-best canonical selection: the copy with the
    // highest synthetic crawl stamp survives, not the min id — the
    // production cluster-collapse rule; stamp = first two md5 hex
    // digits of the id so the oracle can replay it ---
    "q140_keep_best" -> ((s, d) => {
      val dup = withDups(t(s, d, "documents"), "doc_id", 50, 10000)
        .withColumn("crawl_ts",
          (expr("instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1") * 16 +
            expr("instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 2, 1)) - 1"))
            .cast(LongType))
      Dedup.exactKeepBest(dup, "doc_id", "text", "crawl_ts")
        .orderBy("fp")
    }),

    // --- exact-substring span REMOVAL (Lee et al. 2022): duplicated
    // windows are cut out of every doc but the globally first
    // occurrence, and the text is rebuilt — the rewrite form of
    // dedup, not just the q139 coverage report ---
    "q141_span_removal" -> ((s, d) =>
      Corpus.spanRemoval(withDups(t(s, d, "documents"), "doc_id", 50, 10000),
        "doc_id", "text", width = 40, stride = 20)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // --- MAXIMAL duplicated substrings (Lee et al. 2022 ExactSubstr,
    // the suffix-array-grade report): every span of length >= 40 that
    // occurs more than once in the corpus, per occurrence, at its
    // full maximal extent — stride-1 duplicated-L-gram runs ARE the
    // SA/LCP answer (equivalence proven brute-force in CorpusSpec),
    // with no suffix array built and text never entering a shuffle ---
    "q197_max_dup_spans" -> ((s, d) =>
      Corpus.maxDupSpans(withDups(t(s, d, "documents"), "doc_id", 50, 10000),
        "doc_id", "text", minLen = 40)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "span_start")),

    // --- the REWRITE at the same full precision: q141's span-removal
    // operator at stride 1, so no duplicate can hide off the stride
    // grid — every repeat >= the window length is cut at its maximal
    // extent from all but the globally first occurrence. q197 reports
    // what a suffix array would; this row cuts it ---
    "q198_exact_substr_rewrite" -> ((s, d) =>
      Corpus.spanRemoval(withDups(t(s, d, "documents"), "doc_id", 50, 10000),
        "doc_id", "text", width = 40, stride = 1)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // --- 1-bit sign binarization: the compression endpoint of the
    // quantization family (float32 → int8 → PQ → 1 bit/dim); 32 dims
    // per BIGINT word, a pure codegen'd projection ---
    "q199_binary_sign" -> ((s, d) =>
      Quantize.binarySign(t(s, d, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"),
          concat_ws(",", transform(col("words"), _.cast("string"))).as("words"),
          col("n_pos"))
        .orderBy("vec_id")),

    // --- binary ANN: Hamming candidate scan over the packed sign bits
    // (16 bytes/vector at d=64), exact cosine rerank of the candidate
    // set only — hash proposes, float arithmetic decides ---
    "q200_hamming_ann" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Quantize.hammingTopK(
        e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", "vec_id", "embedding", k = 10, cand = 40)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("hd"), round(col("sim"), 6).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // --- simplified silhouette over q38's kmeans clusters: the
    // linear-time (one broadcast-centroid pass, no pairwise distances)
    // cluster-quality certification — per-cluster mean of
    // (b − a)/max(a,b) with a/b = cosine distance to own / nearest
    // other centroid ---
    "q201_silhouette" -> ((s, d) =>
      Similarity.simplifiedSilhouette(t(s, d, "embeddings"),
        "vec_id", "embedding", k = Q38K, iterations = Q38Iters)
        .orderBy("centroid_id")),

    // --- conjunctive (AND) retrieval: docs containing EVERY query
    // term, BM25-ranked top-20 — the posting intersection realized as
    // term counting, global top-k via TakeOrderedAndProject ---
    "q202_conjunctive_search" -> ((s, d) =>
      Corpus.conjunctiveTopK(t(s, d, "documents"), "doc_id", "text",
        Q202Terms, k = 20)
        .withColumnRenamed("id", "doc_id")
        .orderBy("rank")),

    // --- exact-phrase search: positional phrase queries collapsed to
    // one fused conjunctive predicate per window start — one corpus
    // scan for all phrases, no postings table, no shuffle before the
    // hit filter ---
    "q203_phrase_search" -> ((s, d) =>
      TextAnalysis.phraseSearch(t(s, d, "documents"), "doc_id", "text",
        Q203Phrases)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "phrase")),

    // --- calibration audit of the langid router: confidence = winning
    // language's share of stopword hits, reliability bins + per-bin
    // ECE contributions — the check a threshold-gated classifier
    // filter needs before "drop below 0.9" means anything ---
    "q204_calibration_ece" -> ((s, d) =>
      Drift.calibrationReport(calibScored(s, d), "conf", "correct",
          nBins = 10)
        .orderBy("bin")),

    // --- STREAMING calibration twin: the per-bin (count, DECIMAL
    // conf sum, correct sum) state is a bounded-group streaming
    // aggregation (≤ nBins keys); per-trigger cumulative emissions
    // max-merge to the batch sums, and the SHARED readoff must equal
    // the batch report of the same rows — proven by reusing q204's
    // oracle verbatim ---
    "q206_streaming_calibration" -> ((s, d) => {
      import s.implicits._
      val rows = calibScored(s, d)
        .filter(col("conf").isNotNull && col("conf") >= 0.0 &&
          col("conf") <= 1.0 && col("correct").isNotNull)
        .select(col("doc_id"), col("conf"), col("correct"))
        .as[(Long, Double, Int)].collect()
      val batches = (0 to 2).map(b =>
        rows.toSeq.filter(_._1 % 3 == b).map { case (_, p, c) => (p, c) })
      val perTrigger = runMicroBatched(s, Seq("p", "c"), batches,
          "graft-stream-calib", Seq("bin", "n", "sp", "sc"),
          org.apache.spark.sql.streaming.OutputMode.Update()) { stream =>
        // the SHARED bin/aggregate definitions — the streaming state
        // is byte-for-byte the batch report's per-bin sums
        val (n, sp, sc) = Drift.calibrationAggs(col("p"), col("c"))
        stream.groupBy(Drift.calibrationBin(col("p"), 10).as("bin"))
          .agg(n.as("n"), sp.as("sp"), sc.as("sc"))
      }
      val fin = perTrigger.groupBy("bin")
        .agg(max_by(struct(col("n"), col("sp"), col("sc")), col("n")).as("f"))
        .select(col("bin"), col("f.n").as("n"),
          col("f.sp").cast("decimal(38,12)").as("__sp"),
          col("f.sc").as("__sc"))
      Drift.calibrationReadoff(fin).orderBy("bin")
    }),

    // --- IVF-pruned binary ANN: the corpus-scale route of q200 —
    // each query Hamming-scans only its nprobe nearest cells' packed
    // words, candidates rerank through the shared exact-cosine tail
    // (the q30/q147 gate discipline applied to sign bits) ---
    "q207_hamming_ann_ivf" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Quantize.hammingTopKIvf(
        e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", "vec_id", "embedding", k = 10, cand = 40,
        nCentroids = 16, nprobe = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("hd"), round(col("sim"), 6).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // --- JL random projection (Achlioptas ±1 signs): 64 → 16 dims as
    // one map-only literal-matrix projection — the sketching step in
    // front of LSH/clustering when d is large ---
    "q208_jl_projection" -> ((s, d) =>
      graft.ops.Projection.jlTransform(t(s, d, "embeddings"), "vec_id", "embedding",
        inDim = 64, outDim = 16)
        .select(col("vec_id"), col("j"), round(col("out"), 6).as("out"))
        .orderBy("vec_id", "j")),

    // --- corpus datasheet: the one-call (metric, value) summary a
    // dataset card wants — counts, token spread, short/dup fractions,
    // mean quality, lang/source cardinalities; one scan + one agg ---
    "q205_corpus_report" -> ((s, d) =>
      Curation.corpusReport(t(s, d, "documents"), "doc_id", "text",
        "lang", "source")
        .orderBy("metric")),

    // --- cross-corpus exact-substring DECONTAMINATION rewrite: every
    // train span whose 40-grams all occur in the test slice is cut at
    // maximal extent from EVERY train doc (no election — benchmark
    // text must survive nowhere); the action form of q57's report ---
    "q210_decontaminate_rewrite" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Corpus.decontaminateSubstrings(docs,
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        minLen = 40)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // --- size-gated binary ANN: the auto-route of the sign-bit
    // family (the int8 q128 gate discipline applied to packed words).
    // maxFlatRows = 100 < the 495-vector corpus, so the gate's
    // LIMIT-bounded probe routes THIS registration to the IVF-pruned
    // scan — the production path; flat-route parity is q200's row and
    // the route-invariance spec ---
    "q211_hamming_ann_auto" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Quantize.hammingTopKAuto(
        e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", "vec_id", "embedding", k = 10, cand = 40,
        maxFlatRows = 100L, nCentroids = 16, nprobe = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("hd"), round(col("sim"), 6).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // --- cross-document LINE-level boilerplate removal (CCNet /
    // RefinedWeb): lines whose trimmed text recurs in >= 30 distinct
    // docs are dropped from every doc. The corpus has no newlines, so
    // the fixture derives multi-line docs in-query (the ' table '
    // token becomes '\n'; every doc_id % 3 == 0 doc gains a shared
    // footer line) — the oracle replays the same derivation ---
    "q212_line_boilerplate" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("text",
          when(col("doc_id") % 3 === 0,
            concat(regexp_replace(col("text"), " table ", "\n"),
              lit("\nsubscribe to our newsletter")))
            .otherwise(regexp_replace(col("text"), " table ", "\n")))
      Corpus.lineDedup(docs, "doc_id", "text", minDocs = 30)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // --- PII detection + redaction: emails / IPv4s / US-style phones
    // counted on the original text and rewritten <EMAIL>/<IP>/<PHONE>
    // in one codegen'd projection. The synthetic corpus carries no
    // PII, so the fixture injects a deterministic contact tail per
    // doc (email always; IP on even ids; phone on ids % 5 == 0) —
    // replayed verbatim by the oracle ---
    "q213_pii_redact" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("text", concat(
          col("text"),
          lit(" reach user"), col("doc_id").cast("string"),
          lit("@mail.example.org"),
          when(col("doc_id") % 2 === 0,
            concat(lit(" from 10.1."), (col("doc_id") % 200).cast("string"),
              lit(".9"))).otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit(" call 555-123-4567"))
            .otherwise(lit(""))))
      TextAnalysis.piiRedact(docs, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // --- bootstrap percentile CI for an eval accuracy: 200 md5-seeded
    // resample replicas over a deterministic probe metric (label
    // parity vs sign of dim 1), exact interpolated percentiles — the
    // error bar a benchmark delta needs before it means anything ---
    "q214_bootstrap_ci" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .filter(col("embedding").isNotNull && col("label").isNotNull)
        .withColumn("correct",
          (col("label") % 2 ===
            when(element_at(col("embedding"), 1) > 0f, 1).otherwise(0))
            .cast("int"))
      Drift.bootstrapAccuracyCI(e, "vec_id", "correct",
        nBoot = 200, seed = "bs0", alpha = 0.05)
    }),

    // --- Cohen's kappa: chance-corrected agreement between two label
    // columns — the acceptance gate for crowdsourced/model-assisted
    // training labels. Rater B = rater A nudged on every 7th row, so
    // the statistic is non-trivial; confusion cells are the only
    // data-sized shuffle ---
    "q218_cohen_kappa" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .filter(col("label").isNotNull && col("vec_id").isNotNull)
        .select((col("label") % 3).cast("int").as("a"),
          ((col("label") + when(col("vec_id") % 7 === 0, 1).otherwise(0)) % 3)
            .cast("int").as("b"))
      Drift.cohenKappa(e, "a", "b")
    }),

    // --- Krippendorff's alpha (nominal): the multi-rater,
    // missing-data agreement gate — three simulated raters over the
    // embeddings labels, raters 1/2 skipping units (vec_id%4==0 /
    // %3==1 respectively), so units can carry 1..3 ratings and the
    // single-rating exclusion path is exercised ---
    "q222_krippendorff_alpha" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .filter(col("label").isNotNull && col("vec_id").isNotNull)
      val r0 = e.select(col("vec_id").as("unit"),
        (col("label") % 3).cast("string").as("v"))
      val r1 = e.filter(col("vec_id") % 4 =!= 0)
        .select(col("vec_id").as("unit"),
          ((col("label") + when(col("vec_id") % 7 === 0, 1).otherwise(0)) % 3)
            .cast("string").as("v"))
      val r2 = e.filter(col("vec_id") % 3 =!= 1)
        .select(col("vec_id").as("unit"),
          ((col("label") + when(col("vec_id") % 11 === 0, 2).otherwise(0)) % 3)
            .cast("string").as("v"))
      Drift.krippendorffAlpha(r0.union(r1).union(r2), "unit", "v")
    }),

    // --- Krippendorff's alpha, INTERVAL metric: the Likert-scale
    // agreement gate where disagreeing 1-vs-5 must cost more than
    // 1-vs-2. Same 3-rater simulation as q222 on a 1..5 scale; the
    // closed per-unit-moment form needs no value-pair table at all ---
    "q228_krippendorff_interval" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .filter(col("label").isNotNull && col("vec_id").isNotNull)
      val r0 = e.select(col("vec_id").as("unit"),
        (col("label") % 5 + 1).cast("long").as("v"))
      val r1 = e.filter(col("vec_id") % 4 =!= 0)
        .select(col("vec_id").as("unit"),
          ((col("label") + when(col("vec_id") % 7 === 0, 1).otherwise(0)) % 5 + 1)
            .cast("long").as("v"))
      val r2 = e.filter(col("vec_id") % 3 =!= 1)
        .select(col("vec_id").as("unit"),
          ((col("label") + when(col("vec_id") % 11 === 0, 3).otherwise(0)) % 5 + 1)
            .cast("long").as("v"))
      Drift.krippendorffAlphaMetric(r0.union(r1).union(r2), "unit", "v",
        "interval")
    }),

    // --- Krippendorff's alpha, ORDINAL metric: rank distances
    // weighted by how often intermediate scale points were used
    // (Krippendorff's own recommendation for Likert data) — the V×V
    // Q table rides the coincidence marginals, so the same ratings
    // give a DIFFERENT alpha than q228 when the scale is used
    // unevenly ---
    "q229_krippendorff_ordinal" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .filter(col("label").isNotNull && col("vec_id").isNotNull)
      val r0 = e.select(col("vec_id").as("unit"),
        (col("label") % 5 + 1).cast("long").as("v"))
      val r1 = e.filter(col("vec_id") % 4 =!= 0)
        .select(col("vec_id").as("unit"),
          ((col("label") + when(col("vec_id") % 7 === 0, 1).otherwise(0)) % 5 + 1)
            .cast("long").as("v"))
      val r2 = e.filter(col("vec_id") % 3 =!= 1)
        .select(col("vec_id").as("unit"),
          ((col("label") + when(col("vec_id") % 11 === 0, 3).otherwise(0)) % 5 + 1)
            .cast("long").as("v"))
      Drift.krippendorffAlphaMetric(r0.union(r1).union(r2), "unit", "v",
        "ordinal")
    }),

    // --- fenced-code-block extraction: per-(doc, language) block and
    // char counts — the code-data prep pass of a mixed-corpus
    // pipeline. The corpus has no fences, so the fixture injects
    // deterministic python/untagged/sql blocks (oracle replays) ---
    "q219_code_fences" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("text", concat(
          col("text"),
          when(col("doc_id") % 4 === 0,
            concat(lit("\n```python\nprint("),
              (col("doc_id") % 100).cast("string"),
              lit(")\nx = 1\n```\nand\n```\nplain block\n```")))
            .otherwise(lit("")),
          when(col("doc_id") % 6 === 0,
            concat(lit("\n```sql\nSELECT "),
              (col("doc_id") % 10).cast("string"), lit(";\n```")))
            .otherwise(lit(""))))
      TextAnalysis.codeFences(docs, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "lang")
    }),

    // --- exact ROC-AUC (rank-sum / Mann-Whitney, average-rank ties):
    // the classifier-eval headline number without a global fact sort —
    // the rank table is distinct-score-bounded, the statistic is one
    // tiny agg over it. Score = first embedding dim nudged by the
    // label so the curve is non-trivial; deterministic, oracle-replayed ---
    "q217_auc_roc" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .filter(col("embedding").isNotNull && col("label").isNotNull)
        .select((col("label") % 2).cast("int").as("y"),
          (element_at(col("embedding"), 1).cast("double") +
            (col("label") % 2).cast("double") * 0.3).as("score"))
      Drift.aucRoc(e, "score", "y")
    }),

    // --- matryoshka (prefix-dim) recall curve: exact cosine top-10
    // over the first 8/16/32/64 dims vs the full-width top-10 as
    // ground truth — the MRL truncation audit ("how many dims can
    // storage drop"), all widths scored in ONE corpus scan ---
    "q215_matryoshka_recall" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.matryoshkaRecall(
        e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", "vec_id", "embedding",
        dims = Seq(8, 16, 32, 64), topK = 10)
        .orderBy("query_id", "m")
    }),

    // --- per-source frequent tokens: each source's own token head at
    // its own support (q62's global two-phase Misra-Gries discipline,
    // keyed per group — a small domain's head is not drowned by a
    // large one) ---
    "q216_frequent_tokens_by" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Frequent.frequentItemsByGroup(
        docs.select(col("source"),
          explode(TextAnalysis.tokens(col("text").cast("string"))).as("tok")),
        col("source"), col("tok"), support = 0.005)
        .withColumnRenamed("grp", "source")
        .orderBy("source", "item")
    }),

    // --- PQ recall audit: ADC top-10 vs the exact L2 top-10 — the
    // index-quality eval a deployment runs before trusting ANN ---
    "q137_pq_recall" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Quantize.pqRecallAudit(
        e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", "vec_id", "embedding",
        dim = 64, m = 4, k = 8, iterations = 2, topK = 10)
        .orderBy("query_id")
    }),

    // --- IVF-PQ ANN: q131's ADC scoring pruned by an inverted-file
    // coarse index — each query scores codes only in its nProbe
    // nearest cells, the composition that makes per-query cost
    // sub-linear in the corpus at scale. The cell count is SIZED TO
    // THE CORPUS (nCentroidsFor — the q195 lesson: a pinned cell
    // count means cells grow with the data and the probe stage decays
    // to a corpus scan) ABOVE an explicit 2048-row gate (the q194
    // pattern): minC=8 alone would NOT hold the historical 8 cells at
    // sf0.1 (1995 vectors / 125 per cell = 16), so the gate — not the
    // floor — is what keeps every benchmark corpus (sf0.01 ≈ 500,
    // sf0.1 ≈ 1995) on the fixed-8-cell plan the DuckDB oracle
    // replays; past the gate cells track corpus size (~125/cell) ---
    "q142_ivfpq_ann" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val corpus = e.filter(col("vec_id") >= 5)
      val n = corpus.filter(col("embedding").isNotNull).count()
      Quantize.ivfPqTopKAdc(
        e.filter(col("vec_id") < 5), corpus,
        "vec_id", "embedding", "vec_id", "embedding",
        dim = 64, m = 4, k = 8, iterations = 2,
        nCells = if (n <= 2048L) IvfCells
                 else Quantize.nCentroidsFor(n, minC = IvfCells),
        nProbe = IvfProbe, topK = 10)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("adist"), 6).as("adist"))
        .orderBy("query_id", "rank")
    }),

    // --- DSIR importance weights: avg per-token log-likelihood ratio
    // of a target-domain unigram LM vs the raw-corpus LM — the
    // data-selection score for "reads like the target domain" ---
    "q132_importance_weights" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Corpus.importanceWeights(
        docs.filter(col("source").isin("src0", "src1", "src2", "src3")),
        docs, docs, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // --- curriculum phases: blend of length percentile and inverted
    // quality percentile, cut into 3 training stages — both ranks via
    // the windowless distributed percent-rank kernel ---
    "q135_curriculum" -> ((s, d) =>
      Curation.curriculumPhases(t(s, d, "documents"), "doc_id", "text",
          phases = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // --- BPE merge candidates: adjacent char pairs inside words,
    // weighted by word frequency — tokenizer training's first
    // iteration, run over the distinct vocabulary only ---
    "q136_bpe_pairs" -> ((s, d) =>
      Corpus.bpePairCounts(t(s, d, "documents"), "text", k = 50)
        .orderBy(desc("cnt"), col("pair"))),

    // --- FULL BPE tokenizer training (q136 is round one of this):
    // iteratively merge the globally most frequent adjacent symbol
    // pair and rewrite the vocabulary, ten rounds — the merge table is
    // the trained tokenizer, and the oracle replays every round with
    // the identical marker-string replace algebra ---
    "q155_bpe_train" -> ((s, d) =>
      Corpus.bpeTrain(t(s, d, "documents"), "text", nMerges = 10)
        .orderBy("merge_rank")),

    // --- BPE training, production form: one distributed vocab scan +
    // driver-local delta-recount merge loop (zero Spark jobs per merge
    // round vs q155's one-job-per-round) — same merge table by
    // contract, same oracle replay as q155 ---
    "q158_bpe_train_fast" -> ((s, d) =>
      Corpus.bpeTrainLocal(t(s, d, "documents"), "text", nMerges = 10)
        .orderBy("merge_rank")),

    // --- BPE encode with the trained table: merges applied in rank
    // order over the corpus vocabulary (the reference sequential
    // segmenter), one replace-chain projection ---
    "q156_bpe_encode" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val merges = Corpus.bpeTrain(docs, "text", nMerges = 10)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2)))
      Corpus.bpeEncode(docs, "text", merges.toSeq).orderBy("w")
    }),

    // --- BYTE-level BPE training (GPT-2/tiktoken base alphabet, r12
    // verdict #4): whitespace words, UTF-8 bytes as hex symbols, so
    // nothing is ever OOV and merges cross multibyte boundaries. The
    // fixture text is ASCII, so e→é is injected identically in both
    // engines to make the multibyte path real: é's two bytes (c3 a9)
    // appear in every affected word and must coalesce via merges ---
    "q224_bpe_bytes_train" -> ((s, d) =>
      Corpus.bpeTrainBytesLocal(
        t(s, d, "documents").withColumn("text",
          regexp_replace(col("text"), "e", "\u00e9")),
        "text", nMerges = 10).orderBy("merge_rank")),

    // --- byte-level encode with the trained table: the corpus
    // vocabulary segmented to hex-byte pieces in merge-rank order ---
    "q225_bpe_bytes_encode" -> ((s, d) => {
      val docs = t(s, d, "documents").withColumn("text",
        regexp_replace(col("text"), "e", "\u00e9"))
      val merges = Corpus.bpeTrainBytesLocal(docs, "text", nMerges = 10)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2)))
      Corpus.bpeEncodeBytes(docs, "text", merges.toSeq)
    }),

    // --- HTML main-content extraction (r12 verdict #7): documents
    // wrapped in a nav-header / share-bar / copyright-footer page
    // shell — identical construction in both engines — then block-
    // split and scored with jusText's signals as integer gates. The
    // article block survives; every boilerplate block fails length,
    // link-density, or the stopword gate ---
    "q227_html_main_content" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
      val html = docs.select(col("doc_id"), concat(
        lit("<header><ul><li><a href=\"/\">Home</a></li>" +
          "<li><a href=\"/about\">About Us</a></li>" +
          "<li><a href=\"/contact\">Contact</a></li></ul></header>" +
          "<article><p>"),
        coalesce(col("text"), lit("")),
        lit("</p></article><div>Share this page: <a href=\"#\">Tweet</a>" +
          " <a href=\"#\">Like</a></div>" +
          "<footer>Copyright 2024 Example Corp - All rights reserved" +
          "</footer>")).as("html"))
      TextAnalysis.htmlMainContent(html, "doc_id", "html")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // --- Bradley-Terry preference aggregation (r12 verdict #6): a
    // 7-item round-robin derived from orders — matchup (key%7 vs
    // (key DIV 7)%7), higher index wins except every 4th order
    // (upsets) — 20 integer-exact MM rounds recover the monotone
    // strength ladder. Complements kappa/alpha: agreement vs WHICH
    // item wins and by how much ---
    "q226_bradley_terry" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderkey").isNotNull)
        .select((col("o_orderkey") % 7).as("a"),
          (expr("o_orderkey DIV 7") % 7).as("b"),
          (col("o_orderkey") % 4 === 0).as("up"))
        .filter(col("a") =!= col("b"))
        .select(
          when(col("up"), least(col("a"), col("b")))
            .otherwise(greatest(col("a"), col("b"))).as("winner"),
          when(col("up"), greatest(col("a"), col("b")))
            .otherwise(least(col("a"), col("b"))).as("loser"))
      Drift.bradleyTerry(o, "winner", "loser", iterations = 20)
        .orderBy("item")
    }),

    // --- unigram-LM tokenizer trainer (Kudo 2018 — the OTHER trainer
    // modern LLM pipelines use beside BPE): Viterbi hard-EM over a
    // seeded fixed vocabulary with the exact-integer log table, so
    // the oracle replays both EM rounds bit-for-bit via staged CTEs ---
    "q220_unigram_train" -> ((s, d) =>
      Corpus.unigramTrainLocal(t(s, d, "documents"), "text")),

    // --- unigram encode: every trained word segmented under the
    // final post-EM scores (the third Viterbi pass) ---
    "q221_unigram_encode" -> ((s, d) =>
      Corpus.unigramEncode(t(s, d, "documents"), "text")),

    // --- interpolated modified-Kneser-Ney 3-gram perplexity scoring
    // (the KenLM slot of the CCNet quality stack, r12 verdict #2):
    // model fit on the even-id half with counts-of-counts discounts +
    // continuation-count lower orders, every doc scored by avg
    // trigram log-prob. Same train/score split as q167 so unseen
    // trigrams, contexts, and words all exercise the backoff chain ---
    "q223_kn_trigram_logprob" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
      Corpus.knTrigramLogProb(docs.filter(col("doc_id") % 2 === 0), docs,
          "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // --- `.vec` model-artifact load (the file-format level of
    // `Latanova_v1.py:19`'s FastText load): a word2vec/fastText TEXT
    // file is materialized from nation (words + exactly-representable
    // components, so text round-trip is bit-exact), then read back
    // through the DISTRIBUTED VecFormat.read parse; oracle recomputes
    // the vectors straight from the table ---
    "q157_vec_load" -> ((s, d) => {
      val rows = t(s, d, "nation")
        .select(
          regexp_replace(lower(col("n_name")), "[^a-z]", "_").as("word"),
          array(
            col("n_nationkey") * lit(0.25d),
            col("n_regionkey") * lit(1.5d) - lit(3.0d),
            (col("n_nationkey") % 7) * lit(0.5d) - lit(1.5d),
            length(col("n_name")) * lit(0.125d)).as("vec"))
        .collect()  // 25-row dimension-table fixture write, bounded
      val path = java.nio.file.Files.createTempFile("graft_vec", ".vec")
      val sb = new StringBuilder
      sb.append(rows.length).append(' ').append(4).append('\n')
      rows.foreach { r =>
        sb.append(r.getString(0))
        r.getSeq[Double](1).foreach(v => sb.append(' ').append(v))
        sb.append('\n')
      }
      java.nio.file.Files.write(path, sb.result().getBytes("UTF-8"))
      // localCheckpoint materializes eagerly so the temp file can go
      val out = graft.text.VecFormat.read(s, path.toString)
        .select(col("word"), posexplode(col("vector")))
        .select(col("word"), col("pos").as("j"), col("col").as("v"))
        .orderBy("word", "j")
        .localCheckpoint()
      java.nio.file.Files.deleteIfExists(path)
      out
    }),

    // --- end-to-end synthetic pipeline in DETERMINISTIC mode (the
    // q150 technique composed across ALL scalar generator families —
    // VERDICT r8 #7): profile orders (exact decimal-sum moments,
    // quantized at the q01/q07-proven precisions), then generate 500
    // rows of integer/float clipped Gaussians, Bernoulli, inverse-CDF
    // categorical, and day-rendered datetime from md5 Irwin–Hall
    // draws. Every draw and every profile parameter is bit-identical
    // cross-engine, so the whole pipeline hash-matches — the
    // value-level twin q32 (genuinely seeded, rows-only by contract)
    // cannot have. Epoch moments are computed CENTERED on min(epoch)
    // so the decimal squares stay exact and the variance subtraction
    // keeps ~8 significant digits instead of cancelling at 1e18. ---
    "q159_synthetic_deterministic" -> ((s, d) => {
      import graft.engine.{BoolFormat, DatetimeStats, Generators, NumericStats, Profiler}
      val o = t(s, d, "orders")
      val dec6 = DecimalType(38, 6)
      val e = unix_timestamp(col("o_orderdate"))
      val mnE = o.agg(min(e)).collect()(0).getLong(0)
      val ec = e - lit(mnE)
      val r = o.agg(
        count(lit(1)).as("n"),
        sum(col("o_custkey").cast(dec6)).as("s_ck"),
        sum((col("o_custkey") * col("o_custkey")).cast(dec6)).as("ss_ck"),
        min(col("o_custkey")).cast("double").as("mn_ck"),
        max(col("o_custkey")).cast("double").as("mx_ck"),
        sum(col("o_totalprice").cast(dec6)).as("s_tp"),
        sum((col("o_totalprice") * col("o_totalprice")).cast(dec6)).as("ss_tp"),
        min(col("o_totalprice")).as("mn_tp"),
        max(col("o_totalprice")).as("mx_tp"),
        sum(ec.cast(dec6)).as("s_e"),
        sum((ec * ec).cast(DecimalType(38, 0))).as("ss_e"),
        max(e).cast("double").as("mx_e"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("bt")
      ).collect()(0)
      val n = r.getLong(0).toDouble
      // Spark SQL round semantics exactly: BigDecimal.valueOf (the
      // shortest-repr path) + HALF_UP — what the oracle's round() must
      // agree with, as every round(...,6) row already proves it does
      def rnd(x: Double, dp: Int): Double =
        java.math.BigDecimal.valueOf(x)
          .setScale(dp, java.math.RoundingMode.HALF_UP).doubleValue
      def dd(i: Int): Double = r.getDecimal(i).doubleValue
      def stats(sIdx: Int, ssIdx: Int, mn: Double, mx: Double, dp: Int,
                off: Double = 0.0): NumericStats = {
        val m = dd(sIdx) / n
        NumericStats(mean = off + rnd(m, dp),
          std = rnd(math.sqrt(dd(ssIdx) / n - m * m), dp),
          median = 0, min = mn, max = mx, skewness = 0, kurtosis = 0,
          q1 = 0, q3 = 0, count = n.toLong)
      }
      val ckStats = stats(1, 2, r.getDouble(3), r.getDouble(4), 6)
      val tpStats = stats(5, 6, r.getDouble(7), r.getDouble(8), 6)
      val eStats = stats(9, 10, mnE.toDouble, r.getDouble(11), 2, off = mnE.toDouble)
      val dtStats = DatetimeStats(eStats, "", "", "YYYY-MM-DD")
      val pBool = r.getLong(12).toDouble / n
      val catStats = Profiler.profileCategorical(o, "o_orderstatus")
      val id = col("id")
      val D = Generators.Deterministic
      s.range(Q159N).select(
        id.as("gen_id"),
        D.numericInt(ckStats, "q159ck", id).as("num_int"),
        D.numericFloat(tpStats, "q159tp", id).as("num_float"),
        D.boolean(pBool, BoolFormat.TrueFalse, "q159b", id).as("bool_val"),
        D.categoricalDet(catStats, "q159c", id).as("cat_val"),
        D.datetimeDay(dtStats, "yyyy-MM-dd", "q159d", id).as("dt_val")
      ).orderBy("gen_id")
    }),

    // --- SVG plot sink: the RENDERED-figure analogue of the
    // reference's matplotlib screens (`Latanova_v1.py:496-628`) — the
    // q11 histogram buckets and the o_orderstatus value counts render
    // to complete SVG documents with all-integer geometry, so the
    // bytes themselves sit behind the hash oracle. Closes VERDICT r8
    // "missing #2" at the artifact level. ---
    "q160_plot_svg" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val bounds = li.agg(min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      val bucket = least(greatest(
        floor((col("l_extendedprice") - col("lo")) / (col("hi") - col("lo")) * 50),
        lit(0)), lit(49))
      val hist = li.crossJoin(broadcast(bounds))
        .groupBy(bucket.cast(IntegerType).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val vc = t(s, d, "orders")
        .filter(col("o_orderstatus").isNotNull)
        .groupBy(col("o_orderstatus").cast(StringType).as("value"))
        .agg(count(lit(1)).as("cnt"))
      Svg.histogram(hist, "bucket", "cnt", 50, "l_extendedprice histogram")
        .select(lit("histogram_extendedprice").as("plot"), col("svg"))
        .unionByName(
          Svg.barChart(vc, "value", "cnt", 10, "o_orderstatus counts")
            .select(lit("bar_orderstatus").as("plot"), col("svg")))
        .orderBy("plot")
    }),

    // --- fastText supervised classifier inference at corpus scale
    // (the engine behind CCNet-style language-ID / quality filters):
    // a deterministic 2-label model (md5-derived float32-exact
    // weights over the top-20 corpus vocabulary) round-trips through
    // the PUBLIC .bin binary format (write → load), then classifies
    // every document in one broadcast projection — getLine feature
    // hashing (word ids + wrapping-uint64 word-ngram buckets), hidden
    // mean, argmax logit. The oracle replays the FNV-1a fold, the
    // sign-extended wrapping ngram hash, and the exact-dyadic linear
    // algebra in SQL. ---
    "q161_fasttext_classify" -> ((s, d) => {
      import graft.text.{FastTextBin, FastTextClassify, Tokenize}
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val vocab = docs
        .select(explode(Tokenize.tokens(col("text"))).as("tok"))
        .groupBy("tok").count()
        .orderBy(desc("count"), asc("tok")).limit(Q161Vocab)
        .collect().map(_.getString(0))
      require(vocab.length == Q161Vocab,
        s"q161 expects >= $Q161Vocab distinct tokens, got ${vocab.length}")
      val inMat = Array.tabulate((Q161Vocab + Q161Bucket) * 4) { i =>
        q161Weight("q161w", i / 4, i % 4)
      }
      val outMat = Array.tabulate(2 * 4)(i => q161Weight("q161o", i / 4, i % 4))
      val model = FastTextBin.Model(dim = 4, minn = 0, maxn = 0,
        bucket = Q161Bucket, wordNgrams = 2,
        words = vocab, labels = Array("__label__keep", "__label__drop"),
        matrix = inMat, rows = (Q161Vocab + Q161Bucket).toLong,
        output = outMat, outputRows = 2L)
      // round-trip through the public binary format — the artifact path
      val p = java.nio.file.Files.createTempFile("graft_q161", ".bin")
      FastTextBin.write(model, p.toString)
      val loaded = FastTextBin.load(p.toString)
      val out = FastTextClassify.classify(
          docs.select("doc_id", "text"), "text", loaded)
        .select(col("doc_id"), col("label"),
          round(col("score"), 6).as("score"))
        .orderBy("doc_id")
        .localCheckpoint()
      java.nio.file.Files.deleteIfExists(p)
      out
    }),

    // --- KMV bottom-k distinct sketches: four lineitem columns in ONE
    // scan. The value stream never shuffles — per-task capped TreeSets
    // emit their bottom-k, the global merge sees ≤ P·k digests per
    // column — so the count_distinct replacement carries O(k) state
    // per column at ANY corpus size; md5-keyed, so the kth hash and
    // the estimate itself replay exactly in the oracle ---
    "q162_kmv_distinct" -> ((s, d) =>
      Sketch.kmvDistinct(t(s, d, "lineitem"),
          Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag"), k = 256)
        .orderBy("col_name")),

    // --- count–min frequency sketch over the corpus token stream: one
    // map-side-combining agg whose group space is depth·width rows
    // REGARDLESS of corpus size — the fixed-memory frequency summary
    // that replaces a vocab-sized count table at 100 TB ---
    "q163_countmin_sketch" -> ((s, d) =>
      Sketch.countMin(
          t(s, d, "documents").filter(col("text").isNotNull)
            .select(explode(TextAnalysis.tokens(col("text"))).as("item")),
          "item", depth = 4, width = 64, salt = "cm")
        .orderBy("r", "b")),

    // --- count–min point estimates vs ground truth for the top-20
    // tokens: est = min over rows of the hashed counters, joined to
    // the exact counts — overcount ≥ 0 EVERYWHERE is the CM guarantee,
    // exhibited per item, not just asserted. The sketch broadcasts
    // (≤ depth·width rows); candidates never shuffle ---
    "q164_countmin_estimate" -> ((s, d) => {
      val toks = t(s, d, "documents").filter(col("text").isNotNull)
        .select(explode(TextAnalysis.tokens(col("text"))).as("item"))
      val sketch = Sketch.countMin(toks, "item", depth = 4, width = 64, salt = "cm")
      val truth = toks.groupBy("item").agg(count(lit(1)).as("true_cnt"))
        .orderBy(desc("true_cnt"), asc("item")).limit(20)
        .localCheckpoint() // feeds the probe AND the compare join
      Sketch.countMinEstimate(sketch, truth, "item", depth = 4, width = 64,
          salt = "cm")
        .join(truth, Seq("item"))
        .select(col("item"), col("true_cnt"), col("est"),
          (col("est") - col("true_cnt")).as("overcount"))
        .orderBy("item")
    }),

    // --- hybrid retrieval via reciprocal-rank fusion: the BM25 sparse
    // ranker (q115's scorer, top-50) fused with the dense cosine
    // ranker (q28's heap-form top-k, query = vec 0) — rank-only
    // combination, no score calibration, the standard hybrid-search
    // recipe. Both candidate tables are k-bounded before the fuse ---
    "q165_rrf_hybrid" -> ((s, d) => {
      val sparse = Corpus.bm25(t(s, d, "documents"), "doc_id", "text",
          Seq("spark", "shuffle", "hash", "merge", "window"))
        .orderBy(desc("bm25"), asc("id")).limit(50)
        .select(col("id"), col("bm25").as("score"))
      val emb = t(s, d, "embeddings")
      val dense = Similarity.bruteForceTopKLarge(
          emb.filter(col("vec_id") === 0), emb,
          "vec_id", "embedding", "vec_id", "embedding", k = 50)
        .select(col("neighbor_id").as("id"), col("sim").as("score"))
      Similarity.rrfFuse(Seq(sparse, dense), "id", "score", k0 = 60)
        .withColumnRenamed("id", "doc_id")
        .orderBy(desc("rrf"), asc("doc_id"))
    }),

    // --- chunk-level dedup REWRITE: first-(doc,pos)-occurrence wins
    // over non-overlapping 12-token chunks; duplicated spans are
    // DELETED and each doc's survivors re-joined — the span-removal
    // transform of exact-substring training-data dedup (q55 only
    // reports the rate). Chunk text never shuffles for the election:
    // md5 fingerprints carry it ---
    "q166_chunk_dedup" -> ((s, d) =>
      Dedup.chunkDedupRewrite(
          withDups(t(s, d, "documents"), "doc_id", 50, 10000),
          "doc_id", "text", chunkTokens = 12)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // --- bigram-LM scoring: add-one-smoothed transition model fit on
    // the even-id half, every doc scored by avg bigram log-prob — one
    // Markov order above q56's unigram scorer, the word-salad detector
    // unigram stats can't see. Same train/score split so unseen
    // transitions are genuinely exercised ---
    "q167_bigram_logprob" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
      Corpus.bigramLogProb(docs.filter(col("doc_id") % 2 === 0), docs,
          "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // --- HyperLogLog distinct sketches, md5-registered so the
    // registers AND the estimate replay in the oracle (unlike
    // approx_count_distinct's implementation-defined sketch). One
    // (column, bucket)-keyed agg with a |cols|·256-row group space at
    // any corpus size; Z accumulates as an exact integer so the
    // estimate rounds once from identical values cross-engine. The
    // four columns span both estimator regimes: l_returnflag/l_suppkey
    // hit linear counting, the keys hit the raw α·m²/Z path ---
    "q169_hll_distinct" -> ((s, d) =>
      Sketch.hllDistinct(t(s, d, "lineitem"),
          Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag"))
        .orderBy("col_name")),

    // --- character-level Shannon entropy, the quality signal q20's
    // token heuristics can't see (base64/minified payloads score
    // near-uniform, spam runs score near-zero); order-deterministic
    // left fold over sorted distinct chars, one codegen'd projection,
    // no shuffle at all ---
    "q170_char_entropy" -> ((s, d) =>
      t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          length(coalesce(col("text"), lit(""))).cast("long").as("n_chars"),
          round(TextAnalysis.charEntropy(col("text")), 6).as("entropy"))
        .orderBy("doc_id")),

    // --- per-GROUP HLL: distinct users per event type from one
    // (group, bucket)-keyed register agg — each group's sketch merges
    // independently; group space |groups|·256 at any size ---
    "q172_hll_by_group" -> ((s, d) =>
      Sketch.hllDistinctBy(t(s, d, "events"), "event_type", "user_id")
        .withColumnRenamed("g", "event_type")
        .orderBy("event_type")),

    // --- KMV set operations: union cardinality, Jaccard resemblance,
    // and intersection estimate between the even-doc and odd-doc
    // token VOCABULARIES, computed from the two bottom-k sketches
    // alone — "how much do these corpora overlap" without joining
    // the corpora ---
    "q173_kmv_jaccard" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .filter(col("text").isNotNull && col("doc_id").isNotNull)
      def toks(p: Int) = docs.filter(col("doc_id") % 2 === p)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      Sketch.kmvJaccard(toks(0), toks(1), "tok", k = 256)
    }),

    // --- STREAMING HLL: the register table maintained as REAL
    // streaming aggregation state (update-mode groupBy on the
    // stream), per-trigger register updates landed by the harness,
    // final estimate from the max-merge of all emissions — HLL union
    // mergeability demonstrated under a live micro-batch trigger; the
    // estimate must equal the batch sketch of the same stream ---
    "q174_streaming_hll" -> ((s, d) => {
      import s.implicits._
      val rows = t(s, d, "events").filter(col("user_id").isNotNull)
        .select(col("event_id"), col("user_id"),
          (col("event_id") % 3).cast("int").as("__b"))
        .as[(Long, Long, Int)].collect()
      val batches = (0 to 2).map(b => rows.toSeq.filter(_._3 == b))
      val perTrigger = runMicroBatched(s,
          Seq("event_id", "user_id", "batch"), batches,
          "graft-stream-hll", Seq("bucket", "mrank"),
          org.apache.spark.sql.streaming.OutputMode.Update()) { stream =>
        Sketch.hllRegisters(
          stream.select(md5(col("user_id").cast("string").cast("binary")).as("h")),
          Seq.empty)
      }
      Sketch.hllEstimate(
          perTrigger.groupBy("bucket").agg(max(col("mrank")).as("mrank")),
          Seq.empty)
        .withColumnRenamed("__m", "m")
    }),

    // --- robust outlier census: per-event-type median/MAD fences
    // (Hampel identifier, k=3) — exact element picks, no interpolated
    // floats, the breakdown-resistant twin of z-score screens ---
    "q177_mad_outliers" -> ((s, d) =>
      Drift.madOutliers(t(s, d, "events"), "event_type", "value", k = 3.0)
        .withColumnRenamed("g", "event_type")
        .orderBy("event_type")),

    // --- per-domain document cap (RefinedWeb-style): md5-derived
    // hosts with subdomains + multi-part public suffixes, capped at 4
    // docs per REGISTRABLE domain preferring longest text — the
    // WindowGroupLimit plan pre-limits per map task before the
    // exchange, so the shuffle is cap-bounded, not corpus-bounded ---
    "q178_domain_cap" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val h = md5(col("text").cast("binary"))
      val suffix = element_at(
        array(lit("com"), lit("org"), lit("co.uk"), lit("com.au")),
        (conv(substring(h, 2, 1), 16, 10).cast("int") % 4) + 1)
      val sub = element_at(array(lit(""), lit("www."), lit("cdn.")),
        (conv(substring(h, 3, 1), 16, 10).cast("int") % 3) + 1)
      val host = concat(sub, lit("d"), substring(h, 1, 1), lit("."), suffix)
      Curation.domainCap(docs.withColumn("host", host),
          "doc_id", "host", "n_chars", maxPerDomain = 4)
        .orderBy("domain", "rnk")
    }),

    // --- Unicode NFC cleanup through the native codegen expression:
    // md5-picked decomposed letter+combining-mark pairs, control
    // chars and whitespace runs injected, then cleaned — composition
    // must shrink the codepoint count exactly as DuckDB's
    // utf8proc nfc_normalize says ---
    "q179_nfc_clean" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val h = md5(col("text").cast("binary"))
      val letter = element_at(array(lit("a"), lit("e"), lit("o")),
        (conv(substring(h, 4, 1), 16, 10).cast("int") % 3) + 1)
      val mark = element_at(
        array(lit("\u0301"), lit("\u0300"), lit("\u0308")),
        (conv(substring(h, 5, 1), 16, 10).cast("int") % 3) + 1)
      val raw = concat(substring(col("text"), 1, 12), lit("\u0007 "),
        letter, mark, lit("\t x\r"), lit("  tail "))
      docs.select(col("doc_id"), length(raw).as("n_raw"),
          TextAnalysis.cleanText(raw).as("cleaned"),
          length(TextAnalysis.cleanText(raw)).as("n_clean"))
        .orderBy("doc_id")
    }),

    // --- soft deduplication: every doc keeps a 1/dup_count training
    // weight over its exact-content cluster (clustered on the first-8
    // -char truncation so clusters actually form) — one digest-keyed
    // window, no join-back, text never shuffles ---
    "q180_soft_dedup" -> ((s, d) =>
      Dedup.softDedupWeights(
          t(s, d, "documents").filter(col("text").isNotNull)
            .select(col("doc_id"), substring(col("text"), 1, 8).as("content")),
          "doc_id", "content", alpha = 1.0)
        .orderBy("id")),

    // --- fill-in-the-middle training transform: deterministic 50%
    // gate on (seed, id), content-derived cut points, PSM re-emit —
    // pure projection, zero shuffles, character arithmetic replayed
    // exactly by the oracle ---
    "q181_fim_split" -> ((s, d) =>
      Corpus.fimSplit(t(s, d, "documents").filter(col("text").isNotNull),
          "doc_id", "text", fimRate = 0.5, seed = "fim0")
        .orderBy("id")),

    // --- mergeable histogram quantile sketch: 256 fixed bins over
    // the (min,max) frame, partials merge by adding counts, quantile
    // read-off interpolates in the first bin reaching ceil(q·n) —
    // the constant-state percentile path for a 100 TB profile ---
    "q182_hist_quantiles" -> ((s, d) =>
      Sketch.histQuantiles(t(s, d, "lineitem"), "l_extendedprice",
        nBins = 256, qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99))),

    // --- per-group histogram quantiles: the grouped profile pass
    // (p25/p50/p90/p99 per return flag) — every stage keyed, sketch
    // state |groups|·nBins, raw values scanned exactly twice ---
    "q209_hist_quantiles_by" -> ((s, d) =>
      Sketch.histQuantilesBy(t(s, d, "lineitem"), "l_returnflag",
          "l_extendedprice", nBins = 64, qs = Seq(0.25, 0.5, 0.9, 0.99))
        .withColumnRenamed("g", "l_returnflag")
        .orderBy("l_returnflag", "q")),

    // --- retrieval-quality certification: IVF (nprobe=4/16) scored
    // against the exact brute-force truth — per-query recall@10,
    // MRR@10, binary nDCG@10; DCG folds left-associated over sorted
    // hit ranks so no float sum rides on partition order ---
    "q183_retrieval_metrics" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 5)
      val c = e.filter(col("vec_id") >= 5)
      val truth = Similarity.bruteForceTopKLarge(q, c,
        "vec_id", "embedding", "vec_id", "embedding", k = 10)
      val retr = Similarity.ivfTopK(q, c,
        "vec_id", "embedding", "vec_id", "embedding",
        k = 10, nCentroids = 16, nprobe = 4)
      Similarity.retrievalMetrics(truth, retr, k = 10)
        .select(col("query_id"), col("n_truth"), col("n_hits"),
          round(col("recall"), 6).as("recall"),
          round(col("mrr"), 6).as("mrr"),
          round(col("dcg"), 6).as("dcg"),
          round(col("ndcg"), 6).as("ndcg"))
        .orderBy("query_id")
    }),

    // --- tokenizer fertility by language: the trained 10-merge BPE
    // vocab scored per lang — pieces-per-word / chars-per-piece from
    // integer sums over the vocabulary-bounded (lang, word) join ---
    "q184_bpe_fertility" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val merges = Corpus.bpeTrainLocal(docs, "text", nMerges = 10)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2)))
      Corpus.bpeFertility(docs, "text", "lang", merges.toSeq)
        .withColumnRenamed("g", "lang")
        .orderBy("lang")
    }),

    // --- ZCA whitening of the first 4 embedding dims: exact
    // DECIMAL(38,12) moment sums → driver-side Cholesky (pinned
    // association order) → map-only forward substitution with μ/L as
    // literals; the oracle recomputes the whole chain in SQL ---
    "q185_whiten_embeddings" -> ((s, d) =>
      graft.ops.Projection.whiten(t(s, d, "embeddings"), "vec_id", "embedding",
          d = 4)
        .orderBy("vec_id")),

    // --- epochs-per-domain under a 300k-token budget (τ=0.5
    // temperature shares, ≤4 epochs): the data-constrained repeat
    // plan, all arithmetic on the |domains|-row mixture frame ---
    "q186_token_epochs" -> ((s, d) =>
      Corpus.epochsPerDomain(t(s, d, "documents"), "lang", "n_chars",
          budgetTokens = 300000L, alpha = 0.5, maxEpochs = 4.0)
        .withColumnRenamed("domain", "lang")
        .orderBy("lang")),

    // --- STREAMING histogram-quantile sketch: the 64-bin count table
    // lives as update-mode streaming aggregation state under a live
    // trigger (known (lo,hi) frame — the production one-pass mode);
    // per-trigger emissions max-merge to the batch bin table, and the
    // shared read-off must equal the batch sketch of the same rows ---
    "q187_streaming_histq" -> ((s, d) => {
      import s.implicits._
      val sub = t(s, d, "lineitem")
        .filter(col("l_extendedprice").isNotNull &&
          col("l_orderkey") % 20 === 0)
        .select(col("l_extendedprice").cast("double").as("value"),
          (col("l_orderkey") % 3).cast("int").as("__b"))
      val fr = sub.agg(min("value").as("lo"), max("value").as("hi"),
        count(lit(1)).as("n")).collect()(0)
      if (fr.isNullAt(0)) // empty subset: no frame, empty sketch
        Sketch.histQuantileReadoff(
          Seq.empty[(Double, Double, Long)].toDF("lo", "hi", "n"),
          Seq.empty[(Long, Long)].toDF("bin", "cnt"), 64,
          qs = Seq(0.25, 0.5, 0.9, 0.99)) // same list as the live path
      else {
        val (lo, hi, n) = (fr.getDouble(0), fr.getDouble(1), fr.getLong(2))
        val rows = sub.as[(Double, Int)].collect()
        val batches = (0 to 2).map(b => rows.toSeq.filter(_._2 == b))
        val perTrigger = runMicroBatched(s, Seq("value", "batch"), batches,
            "graft-stream-histq", Seq("bin", "cnt"),
            org.apache.spark.sql.streaming.OutputMode.Update()) { stream =>
          stream.groupBy(Sketch.histBin(col("value"), lit(lo), lit(hi), 64)
              .as("bin"))
            .agg(count(lit(1)).as("cnt"))
        }
        val bins = perTrigger.groupBy("bin").agg(max("cnt").as("cnt"))
        val frame = Seq((lo, hi, n)).toDF("lo", "hi", "n")
        Sketch.histQuantileReadoff(frame, bins, 64,
          qs = Seq(0.25, 0.5, 0.9, 0.99))
      }
    }),

    // --- STREAMING count–min: the SAME Sketch.countMin operator code
    // runs as update-mode aggregation state under a live trigger
    // (depth×width group space is stream-safe by construction);
    // per-trigger counter emissions max-merge to exactly the batch
    // sketch — the third mergeable sketch proven under a trigger ---
    "q188_streaming_countmin" -> ((s, d) => {
      import s.implicits._
      // Feed DOCUMENTS, tokenize INSIDE the stream: the tokenize +
      // explode runs on the 8 source partitions per trigger (the
      // production shape — a Kafka source carries documents, not
      // pre-exploded tokens), and the driver feed carries one row per
      // doc instead of one per token. The r14 sf1 run measured the
      // token-collect form at ×9.9 wall at data ×10 — ~5M token
      // strings boxed through the driver; per-doc it is ~20k rows.
      // Emissions are identical: same token→batch mapping (batch =
      // doc_id % 3 either way), and the update-mode (r, b) counters
      // depend only on which batch each token arrives in.
      val rows = t(s, d, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"),
          (col("doc_id") % 3).cast("int").as("__b"))
        .as[(Long, String, Int)].collect()
      val batches = (0 to 2).map(b => rows.toSeq.filter(_._3 == b))
      val perTrigger = runMicroBatched(s, Seq("doc_id", "text", "batch"),
          batches, "graft-stream-cm", Seq("r", "b", "cnt"),
          org.apache.spark.sql.streaming.OutputMode.Update()) { stream =>
        Sketch.countMin(
          stream.select(explode(TextAnalysis.tokens(col("text"))).as("item")),
          "item", depth = 4, width = 64, salt = "cm9")
      }
      perTrigger.groupBy("r", "b").agg(max("cnt").as("cnt"))
        .orderBy("r", "b")
    }),

    // --- LSH banding calibration: the (bands, rows)·similarity
    // detection-probability table every near-dup run is tuned from —
    // 1−(1−s^r)^b over all divisor splits of 16 hashes plus the s50
    // threshold, pure arithmetic, nothing scans ---
    "q189_lsh_calibration" -> ((s, d) =>
      Dedup.lshCalibration(s, numHashes = 16,
        sGrid = Seq(0.1, 0.3, 0.5, 0.7, 0.8, 0.9))),

    // --- KNN-density scores over the embedding corpus (D4-style
    // pruning signal): self-retrieval top-11, self-match dropped,
    // avg cosine of the 10 nearest folded in rank order — outliers
    // score high, clump members low. This row is the EXACT ground
    // truth twin of q195's gated IVF route; above maxExactQueries the
    // query side drops to a deterministic id-stride CERTIFICATION
    // SAMPLE (pqRecallAudit's contract: ground truth at scale is
    // sampled — each sampled id still scores exactly against the FULL
    // corpus, so cost is S·n, linear in the corpus, never n²; the r13
    // full-suite sf1 run caught the ungated kernel at wall ×56 at
    // data ×10). Bench corpora (sf0.01 = 500, sf0.1 = 2000) sit under
    // the gate, so the oracle row and bench history are unchanged ---
    "q194_knn_density" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val maxExactQueries = 2048L
      val n = e.filter(col("embedding").isNotNull).count()
      val q = if (n <= maxExactQueries) e
        else e.filter(
          pmod(col("vec_id"), lit((n + maxExactQueries - 1) / maxExactQueries))
            === 0)
      Similarity.knnDensity(
          Similarity.bruteForceTopKLarge(q, e,
            "vec_id", "embedding", "vec_id", "embedding", k = 11),
          k = 10)
        .orderBy("id")
    }),

    // --- the PRODUCTION route of the density score: the same
    // knnDensity read-off fed by the GATED int8→IVF self-retrieval
    // (q147's plan shape) — maxExactRows forced below the corpus size
    // so the quadratic kernel never runs; the plan is centroid-seeded
    // cell assignment + nprobe-bounded probing. The centroid count is
    // SIZED TO THE CORPUS (nCentroidsFor: constant ~125-vector cells,
    // so per-query candidates stay ~nprobe·125 at any width — the r12
    // SF1-SCALELAW run caught the previous pinned K=16 going wall
    // ×29 at data ×10) ABOVE an explicit 2048-row gate: the minC=16
    // floor covers the benchmark corpora only up to n=2000 (sf0.1 is
    // 1995 — one more batch of vectors would have flipped the oracle's
    // pinned LIMIT 16 plan), so like q142/q194 the GATE, not the
    // floor, is what freezes the oracle-replayed cell count. q194
    // keeps the exact kernel as ground truth; THIS row certifies the
    // composition a 100 TB corpus actually executes ---
    "q195_knn_density_ivf" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val n = e.filter(col("embedding").isNotNull).count()
      Similarity.knnDensity(
          Quantize.int8TopKAuto(e, e,
            "vec_id", "embedding", "vec_id", "embedding", k = 11,
            maxExactRows = 100L,
            nCentroids = if (n <= 2048L) 16
                         else Quantize.nCentroidsFor(n),
            nprobe = 4,
            corpusSizeHint = Some(n)),
          k = 10)
        .orderBy("id")
    }),

    // --- the PCA scatter FIGURE under a byte-level oracle (the last
    // artifact of Latanova_v1.py:496-628 without one): q114's
    // isometric 6-dim embedding → spark.ml PCA → canonical planar
    // realization (centroid + min-id rotation + reflection, which
    // erases every eigensolver artifact) → fixed-point scatter
    // render. The oracle re-derives the canonical coords from the
    // generating (a,b) plane directly — no eigensolver in SQL — and
    // replays the identical micro-unit quantization + integer pixel
    // grid, so the SVG documents match byte-for-byte ---
    "q196_pca_scatter_svg" -> ((s, d) => {
      val su = 1.0 / math.sqrt(6.0)
      val base = t(s, d, "customer").filter(col("c_custkey") <= 50)
        .select(col("c_custkey").as("id"),
          (col("c_acctbal").cast("double") / 1000.0).as("a"),
          (col("c_custkey").cast("double") / 10.0).as("b"))
      val vec = array((0 until 6).map { j =>
        col("a") * lit(su) + col("b") * lit(if (j % 2 == 0) su else -su)
      }: _*)
      val scores = graft.ops.Projection.pca(
          base.select(col("id"), vec.as("emb")), "id", "emb", k = 2)
        .select(col("id"), element_at(col("pc"), 1).as("px"),
          element_at(col("pc"), 2).as("py"))
      val canon = graft.ops.Projection.canonical2d(scores, "id", "px", "py")
      Svg.scatter(canon, "x", "y", "id", "pca projection")
        .select(lit("scatter_pca").as("plot"), col("svg"))
    }),

    // --- STREAMING KMV via flatMapGroupsWithState — the CUSTOM-state
    // streaming sketch (bottom-k needs an ordered capped set no
    // built-in agg expresses); per-trigger sketch emissions min-merge
    // to the batch bottom-k, read off by the shared estimator ---
    "q193_streaming_kmv" -> ((s, d) => {
      import s.implicits._
      val rows = t(s, d, "events").filter(col("user_id").isNotNull)
        .select(md5(col("user_id").cast("string").cast("binary")).as("h"),
          (col("event_id") % 3).cast("int").as("__b"))
        .as[(String, Int)].collect()
      val batches = (0 to 2).map(b => rows.toSeq.filter(_._2 == b))
      val perTrigger = runMicroBatched(s, Seq("h", "batch"), batches,
          "graft-stream-kmv", Seq("key", "h_out"),
          org.apache.spark.sql.streaming.OutputMode.Update()) { stream =>
        graft.streaming.StreamingProfile.streamingKmv(
          stream.select(lit("user_id").as("k"), col("h"))
            .as[(String, String)], k = 64)
          .toDF("key", "h_out")
      }
      Sketch.kmvFinish(perTrigger, "h_out", k = 64)
    }),

    // --- Aho–Corasick blocklist scan: per-term overlapping substring
    // counts for a 6-term list in ONE automaton pass per doc (native
    // expression carrying the automaton as a codegen reference) —
    // the shape that holds when the blocklist has 10k terms ---
    "q191_blocklist_scan" -> ((s, d) => {
      val terms = Seq("spark", "shuffle", "window", "merge", "the", "a big")
      val counts = TextAnalysis.termCounts(col("text"), terms)
      t(s, d, "documents").filter(col("text").isNotNull)
        .select(col("doc_id") +: counts.as("c") +: Nil: _*)
        .select(col("doc_id") +:
          terms.zipWithIndex.map { case (tm, i) =>
            element_at(col("c"), i + 1).as("n_" + tm.replace(" ", "_"))
          } :+
          aggregate(col("c"), lit(0), (a, x) => a + x).as("total") :+
          (aggregate(col("c"), lit(0), (a, x) => a + x) > 0).cast("int")
            .as("flagged"): _*)
        .orderBy("doc_id")
    }),

    // --- composed safety/keep decision: encoding health + quality
    // floor + token-count band + zero blocklist hits, every signal an
    // already-oracled operator — the end-to-end corpus admission
    // verdict in one codegen projection ---
    "q192_safety_filter" -> ((s, d) => {
      val bad = Seq("merge", "window")
      val text = col("text")
      val q = TextAnalysis.qualityFromStats(col("__st"))
      val nt = col("__st").getField("n_tokens").cast("long")
      val enc = TextAnalysis.encodingAudit(text).getField("encoding_ok")
      val hits = TextAnalysis.blocklistHits(text, bad)
      t(s, d, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), TextAnalysis.tokenStatsEn(text).as("__st"),
          enc.as("__enc"), hits.as("__hits"))
        .select(col("doc_id"), round(q, 6).as("quality"), nt.as("n_tokens"),
          col("__enc").as("encoding_ok"), col("__hits").as("blocklist_hits"),
          (col("__enc") === 1 && q >= 0.5 && nt >= 10 && nt <= 10000 &&
            (col("__hits") === 0)).cast("int").as("keep"))
        .orderBy("doc_id")
    }),

    // --- encoding-health audit: U+FFFD, double-decoded "Ã?"
    // mojibake pairs, and control chars counted per doc over
    // md5-gated synthetic corruption — the re-decode triage signal,
    // one codegen projection ---
    "q190_encoding_audit" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val g = (conv(substring(md5(col("text").cast("binary")), 6, 1), 16, 10)
        .cast("int") % 8)
      val injected = when(g <= 2, concat(col("text"), lit(" x\u00C3\u00A9y")))
        .when(g === 3, concat(col("text"), lit("\uFFFD\uFFFD")))
        .when(g === 4, concat(lit("\u0007"), col("text")))
        .otherwise(col("text"))
      docs.select(col("doc_id"),
          TextAnalysis.encodingAudit(injected).as("a"))
        .select(col("doc_id"), col("a.n_replacement"), col("a.n_mojibake"),
          col("a.n_ctrl"), col("a.encoding_ok"))
        .orderBy("doc_id")
    }),

    // --- pairwise SOURCE-OVERLAP matrix from per-source KMV
    // sketches: which sources share vocabulary, estimated for all
    // 190 source pairs from ONE corpus scan reduced to ≤ 20·64
    // digests — the sketch-powered answer to "which crawls duplicate
    // each other" that never joins the corpora ---
    "q176_source_overlap" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .filter(col("source").isNotNull && col("text").isNotNull)
        .select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
      Sketch.kmvJaccardByGroup(toks, "source", "tok", k = 64)
        .withColumnRenamed("ga", "source_a")
        .withColumnRenamed("gb", "source_b")
        .orderBy("source_a", "source_b")
    }),

    // --- Gopher-style quality rules (Rae et al. 2021 Table A1
    // subset): five per-doc flags + the composite pass, each ratio a
    // single exact-integer division — the published-recipe filter
    // beside q20's ad-hoc score ---
    "q175_gopher_rules" -> ((s, d) =>
      t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          TextAnalysis.gopherFlags(col("text")).as("g"))
        .select(col("doc_id"), col("g.n_words"), col("g.mean_word_len"),
          col("g.wc_ok"), col("g.mwl_ok"), col("g.sym_ok"),
          col("g.alpha_ok"), col("g.stop_ok"), col("g.pass"))
        .orderBy("doc_id")),

    // --- gap-based sessionization of the event stream (30-min gap):
    // one per-user window pass + keyed agg, all time arithmetic in
    // integer epoch-millis so sessions replay exactly ---
    "q171_sessionize" -> ((s, d) =>
      Temporal.sessionize(t(s, d, "events"), "user_id", "event_id", "ts",
          gapMs = 30L * 60 * 1000)
        .withColumnRenamed("k", "user_id")
        .orderBy("user_id", "session_idx")),

    // --- STREAM–STREAM watermarked interval join under a real
    // micro-batch trigger: clicks and views as two independent
    // streams, inner-joined per user on "view within the hour before
    // the click". Cross-batch matches exercise the join STATE (a
    // batch-0 click pairs with a batch-2 view); the long watermark
    // keeps eviction out of the oracle window while the plumbing —
    // two watermarks + interval condition, the production state-bound
    // — is the real plan. Must equal the batch interval join. ---
    "q168_streaming_join" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
      def side(tpe: String) = ev.filter(col("event_type") === tpe)
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("event_id") % 3).cast("int").as("__b"))
        .as[(Long, Long, java.sql.Timestamp, Int)].collect()
      val clicks = side("click"); val views = side("view")
      def batches(rows: Array[(Long, Long, java.sql.Timestamp, Int)]) =
        (0 to 2).map(b => rows.toSeq.filter(_._4 == b))
      runMicroBatched2(s,
          Seq("click_id", "user_id", "c_ts", "cb"), batches(clicks),
          Seq("view_id", "v_user_id", "v_ts", "vb"), batches(views),
          "graft-stream-join",
          Seq("user_id", "click_id", "view_id")) { (a, b) =>
        a.withWatermark("c_ts", "365 days")
          .join(b.withWatermark("v_ts", "365 days"),
            expr("user_id = v_user_id AND " +
              "v_ts >= c_ts - interval 1 hour AND v_ts <= c_ts"))
          .select(col("user_id"), col("click_id"), col("view_id"))
      }.orderBy("user_id", "click_id", "view_id")
    }),

    // --- collocation mining: top-k adjacent-token pairs by PMI —
    // the phrase-induction pass of tokenizer/vocab pipelines ---
    "q134_collocations" -> ((s, d) =>
      Corpus.collocations(t(s, d, "documents"), "doc_id", "text",
          minCount = 5L, k = 30)
        .orderBy(desc("pmi"), col("w1"), col("w2"))),

    // --- salted skew join: result-invariant vs the plain join (the
    // oracle computes the plain join — identical output proves it) ---
    "q104_salted_join" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(
        col("l_suppkey").as("suppkey"),
        col("l_extendedprice"), col("l_discount"))
      val sup = t(s, d, "supplier").select(
        col("s_suppkey").as("suppkey"), col("s_nationkey"))
      Skew.saltedJoin(li, sup, "suppkey", saltFactor = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"),
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(org.apache.spark.sql.types.DecimalType(38, 6)))
            .cast("double"), 6).as("revenue"))
        .orderBy("s_nationkey")
    }),

    // --- hot-key diagnostic: top-N key shares, deterministic cut ---
    "q105_skew_report" -> ((s, d) =>
      Skew.keySkewReport(
        t(s, d, "events").filter(col("user_id").isNotNull), "user_id", 10)),

    // --- 2-d equi-width histogram (heatmap prep): one extent agg +
    // one (bx,by) count; frames bounded by the cell grid ---
    "q101_hist2d" -> ((s, d) =>
      graft.engine.Histogram.equiWidth2d(
        t(s, d, "lineitem"), "l_quantity", "l_extendedprice", 10, 8)
        .orderBy("bx", "by")),

    // --- mutual information between categoricals: contingency from
    // one narrow agg, MI assembled on the distinct-pair frame ---
    "q102_mutual_info" -> ((s, d) =>
      Drift.mutualInformation(t(s, d, "orders"),
        col("o_orderstatus"), col("o_orderpriority"))),

    // --- per-group linear trend: algebraic regr aggregates, one
    // map-side-combined scan ---
    "q103_trend" -> ((s, d) =>
      graft.engine.Profiler.groupedTrend(
        t(s, d, "events").filter(col("ts").isNotNull), "event_type",
        (unix_timestamp(col("ts")) -
          unix_timestamp(to_timestamp(lit("2024-01-01 00:00:00"))))
          .cast("double") / 86400.0,
        col("value"))
        .orderBy("key")),

    // --- language confusion matrix: declared metadata vs detected
    // langId — the metadata-QA op; ≤|langs|² frame after one scan ---
    "q100_lang_confusion" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("lang").isNotNull)
        .select(col("lang").as("declared"),
          TextAnalysis.tokenStatsLangs(col("text")).as("__st"))
        .select(col("declared"),
          TextAnalysis.langIdFromStats(col("__st")).as("detected"))
        .groupBy("declared", "detected").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val tot = docs.groupBy("declared").agg(sum("n").as("__t"))
      docs.join(broadcast(tot), "declared")
        .select(col("declared"), col("detected"), col("n"),
          round(col("n").cast("double") / col("__t"), 6).as("frac"))
        .orderBy("declared", "detected")
    }),

    // --- incremental profile: per-shard exact moment partials merged
    // into the direct single-pass profile bit-for-bit ---
    "q99_incremental_profile" -> ((s, d) =>
      graft.engine.Profiler.mergeMoments(
        graft.engine.Profiler.partialMoments(
          t(s, d, "documents"), "lang", "n_chars"))),

    // --- funnel conversion-lag quantiles: one fused keyed agg for
    // both firsts, PERCENTILE_DISC over the ≤|keys| lag frame ---
    "q98_conversion_lag" -> ((s, d) =>
      Temporal.conversionLag(t(s, d, "events"), "user_id", "ts",
        "event_type", fromStep = "view", toStep = "purchase",
        qs = Seq(0.5, 0.9, 0.99))
        .withColumn("lag_s", col("value").cast("long")).drop("value")
        .orderBy("quantile")),

    // --- exact weighted quantiles: distinct-value collapse + shared
    // prefix pass; PERCENTILE_DISC convention, fixed-point weights ---
    "q97_weighted_quantiles" -> ((s, d) =>
      graft.engine.Quantiles.weightedExact(
        t(s, d, "lineitem"), "l_extendedprice", "l_quantity",
        Seq(0.25, 0.5, 0.75, 0.9))
        .orderBy("quantile")),

    // --- referential-integrity expectation: parent reduces to distinct
    // keys, orphan probe is a broadcastable left-anti join ---
    "q95_referential" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val cust = t(s, d, "customer")
      Expectations.checkReferential(orders, "o_custkey", cust, "c_custkey")
        .unionByName(
          Expectations.checkReferential(orders, "o_custkey",
            cust.filter(col("c_custkey") < 700), "c_custkey")
            .withColumn("rule", concat(col("rule"), lit("@lt700"))))
        .orderBy("rule")
    }),

    // --- Benford first-digit screen: one scan, arithmetic on 9 rows ---
    "q96_benford" -> ((s, d) =>
      Expectations.benford(t(s, d, "orders"), "o_totalprice")
        .orderBy("digit")),

    // --- per-group percent rank, windowless: rank table from one
    // shared range sort + per-group offsets; survives group skew ---
    "q93_percent_rank_by" -> ((s, d) =>
      Drift.percentRankBy(
        t(s, d, "events").select("event_id", "event_type", "value")
          .filter(col("event_type").isNotNull && col("value").isNotNull),
        "event_type", "value")
        .select(col("event_id"), col("event_type"),
          round(col("pct_rank"), 6).as("pct_rank"))
        .orderBy("event_id")),

    // --- item co-occurrence matrix: distinct presence rows, per-key
    // pair join bounded by the item vocabulary ---
    "q94_cooccurrence" -> ((s, d) =>
      Frequent.coOccurrence(t(s, d, "events"), "user_id", "event_type")
        .orderBy("item_a", "item_b")),

    // --- CDC merge: changelog compacts to latest-per-key in ONE
    // max_by shuffle, then anti-join + union against the base ---
    "q91_cdc_merge" -> ((s, d) => {
      val base = t(s, d, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      val changes = t(s, d, "orders").select(
        col("o_custkey").as("c_custkey"),
        col("o_orderpriority").as("c_mktsegment"),
        col("o_totalprice").as("c_acctbal"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 10 < 2, lit("delete"))
          .otherwise(lit("upsert")).as("op"))
      Snapshot.applyChangeLog(base, changes, "c_custkey", "seq", "op")
        .orderBy("c_custkey")
    }),

    // --- SCD-2 version history: per-key lead chains valid_from/to ---
    "q92_scd2" -> ((s, d) =>
      Snapshot.scd2(
        t(s, d, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        "o_custkey", "o_orderkey")
        .select(col("o_custkey"), col("valid_from"), col("valid_to"),
          col("is_current"), col("o_totalprice"))
        .orderBy("o_custkey", "valid_from")),

    // --- trailing moving average, windowless: each bucket explodes
    // into the ≤window buckets it feeds; calendar-bounded frames ---
    "q89_moving_average" -> ((s, d) =>
      Temporal.movingAverage(t(s, d, "events"), "ts", "value",
        unit = "day", window = 7)
        .orderBy("bucket")),

    // --- DAU/WAU engagement report: distinct (key, day) at the scan,
    // rolling distinct via the contribution explode ---
    "q90_active_users" -> ((s, d) =>
      Temporal.activeUsers(t(s, d, "events"), "user_id", "ts",
        unit = "day", window = 7)
        .orderBy("bucket")),

    // --- declarative data-expectations report (k row rules fused into
    // ONE scan + a distinct-count uniqueness rule) ---
    "q82_expectations" -> ((s, d) => {
      val df = t(s, d, "orders")
      Expectations.report(df,
        rules = Seq(
          Expectations.rowRule("notnull(o_custkey)", col("o_custkey").isNotNull),
          Expectations.rowRule("positive(o_totalprice)", col("o_totalprice") > 0),
          Expectations.rowRule("cap(o_totalprice)", col("o_totalprice") <= 400000),
          Expectations.rowRule("set(o_orderstatus)",
            col("o_orderstatus").isin("O", "F", "P")),
          Expectations.rowRule("pattern(o_orderpriority)",
            col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$")),
          Expectations.rowRule("recent(o_orderdate)",
            col("o_orderdate") < lit("2000-01-01").cast("timestamp"))),
        uniqueKeys = Seq(Seq("o_orderkey")))
        .orderBy("rule")
    }),

    // --- fixed-iteration PageRank over the part↔supplier co-purchase
    // graph (symmetrized; exact fixed-point sums — see Graph.pageRank) ---
    "q83_pagerank" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      // LONG keys end-to-end (r14): the whole iteration runs on packed
      // long vertex ids — part k ↦ 2k, supplier k ↦ 2k+1 (a bijection:
      // the p/s namespaces are disjoint by parity) — decoded to the
      // published "p…"/"s…" strings only in the final projection.
      // Ranks are a pure function of graph structure, so values are
      // bit-identical under the bijection, but every internal shuffle
      // (degree agg, contribution agg, rank joins ×3 rounds) moves
      // 8-byte keys instead of ~10-char strings. The distinct runs on
      // the raw (pk, sk) pairs BEFORE symmetrization (|lineitem| rows,
      // narrowest form), and pageRank is told assumeDistinct — the
      // union of a distinct directed set with its parity-disjoint
      // reverse is provably duplicate-free, so the internal re-dedup
      // of 11.8M sym edges is skipped outright.
      val pairs = li.select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = pairs.select(
        (col("pk") * 2).as("a"), (col("sk") * 2 + 1).as("b"))
      val sym = edges.unionByName(
        edges.select(col("b").as("a"), col("a").as("b")))
      Graph.pageRank(sym, "a", "b", iterations = 3, assumeDistinct = true)
        .select(
          concat(when(pmod(col("id"), lit(2)) === 0, lit("p")).otherwise(lit("s")),
            expr("CAST(id DIV 2 AS STRING)")).as("id"),
          round(col("pr"), 6).as("pr"))
        .orderBy("id")
    }),

    // --- exact Jaccard similarity join via prefix filtering: same
    // result set as brute force (no LSH false negatives) while the
    // O(n²) pair space never materializes — the oracle verifies with
    // an all-pairs plan, this side with the prefix-filtered join.
    // Size-routed (r14): the bench corpora (≤5050 docs) sit under the
    // 8192-doc gate, so the oracle row and bench history are
    // unchanged; above it the router flips to MinHash-LSH candidates
    // + the same exact verification (q24's machinery) — the r13 sf1
    // run measured the exact route at ×7.7 for data ×10 (linear-work
    // saturation on a rotation-disjoint corpus), the cliff the gate
    // makes unreachable for production callers ---
    "q84_jaccard_join_prefix" -> ((s, d) => {
      val dup = withDups(t(s, d, "documents"), "doc_id", 50, 10000)
      Dedup.jaccardJoinAuto(dup, "doc_id", "text", minJaccard = 0.8, k = 3)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // --- containment join: ordered pairs where ≥90% of a's shingles
    // appear in b — the quote/boilerplate-inclusion relation Jaccard
    // misses; snippets (first 12 tokens) of the first 100 docs are
    // injected so true containments exist, and the oracle brute-forces
    // all pairs while this side joins prefixes only ---
    "q118_containment_join" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 100)
        .select("doc_id", "text")
      val snip = docs.select((col("doc_id") + 20000).as("doc_id"),
        array_join(slice(TextAnalysis.tokens(col("text")), 1, 12), " ").as("text"))
      Dedup.containmentJoinPrefix(docs.unionByName(snip), "doc_id", "text",
          minContainment = 0.9)
        .select(col("id_a"), col("id_b"), round(col("containment"), 6).as("containment"))
        .orderBy("id_a", "id_b")
    }),

    // --- incremental near-dup admission: the daily-append shape —
    // incoming shard tested against the PRIOR corpus's persisted
    // sketch table (one long per historical doc; history text never
    // re-read), then intra-shard near-dups collapse via CC ---
    "q120_incremental_admit" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val prior = docs.filter(col("doc_id") < 400)
      val incoming = docs.filter(col("doc_id") >= 400)
        .select("doc_id", "text", "n_chars")
        .unionByName(docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 30000).as("doc_id"),
            concat(col("text"), lit(" nearmarker")).as("text"), col("n_chars")))
      Dedup.admitIncremental(incoming, "doc_id", "text",
          Dedup.sketchTable(prior, "doc_id", "text"))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // --- SemDeDup semantic dedup: k-means clusters bound the pair
    // space (Σ|cluster|² ≈ n²/k, cluster id = the one join key), CC
    // chains within-cluster near-dup pairs, lowest id survives ---
    "q85_semantic_dedup" -> ((s, d) => {
      val dup = withDups(t(s, d, "embeddings"), "vec_id", 50, 10000)
      Similarity.semanticDedup(dup, "vec_id", "embedding", nClusters = 16,
        threshold = 0.99, kmeansIterations = 0, ccRounds = 3)
        .select("vec_id")
        .orderBy("vec_id")
    }),

    // --- cohort retention matrix: cohort sizes ride the age-0 row
    // (every key is active in its first bucket), so the only frames
    // after the (key, bucket) distinct are calendar-bounded ---
    "q86_retention" -> ((s, d) =>
      Temporal.retention(t(s, d, "events"), "user_id", "ts", unit = "day")
        .withColumn("cohort", date_format(col("cohort"), "yyyy-MM-dd"))
        .orderBy("cohort", "age")),

    // --- temperature-scaled mixture rates: target share ∝ tokens^α,
    // the multilingual upsample-low-resource rule, no hand target map ---
    "q87_temperature_mixture" -> ((s, d) =>
      Corpus.temperatureWeights(t(s, d, "documents"), "lang", "n_chars",
        alpha = 0.5)
        .orderBy("domain")),

    // --- exact frequent tokens (two-phase Misra-Gries: the tail never
    // shuffles; result identical to the naive full groupBy) ---
    "q62_frequent_tokens" -> ((s, d) =>
      Frequent.frequentTokens(t(s, d, "documents"), "text", support = 0.001)
        .orderBy("item")),

    // --- equi-depth histogram (windowless NTILE via the two-pass
    // distributed rank; id tie-break pins bucket edges cross-engine) ---
    "q63_equidepth_histogram" -> ((s, d) =>
      Histogram.equiDepth(t(s, d, "events"), "value", "event_id",
        buckets = 8)
        .select(col("bucket"), col("cnt"),
          round(col("lo"), 6).as("lo"), round(col("hi"), 6).as("hi"))
        .orderBy("bucket")),

    // --- pairwise correlation matrix in one scan ---
    "q64_correlation_matrix" -> ((s, d) =>
      Profiler.correlationMatrix(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_x", "col_y")),

    // --- winsorized robust profile (quantile-clipped moments) ---
    "q65_winsorized_profile" -> ((s, d) =>
      Profiler.winsorizedProfile(t(s, d, "lineitem"),
        "l_extendedprice", pLo = 0.01, pHi = 0.99)),

    // --- two-sample KS drift (windowless ECDF via grouped prefix sums;
    // even/odd event split should show near-zero drift) ---
    "q66_ks_drift" -> ((s, d) =>
      Drift.ksTwoSample(t(s, d, "events"), col("value"),
        col("event_id") % 2 === 0)),

    // --- PSI drift over equi-depth deciles of the baseline sample ---
    "q67_psi_drift" -> ((s, d) =>
      Drift.psi(t(s, d, "events"), col("value"), col("event_id") % 2 === 0,
        bins = 10)
        .select(col("bin").cast(LongType).as("bin"), col("n_base"),
          col("n_cur"), col("psi_contrib"))
        .orderBy("bin")),

    // --- chi-square independence over a contingency of distinct levels ---
    "q68_chi_square" -> ((s, d) =>
      Drift.chiSquare(t(s, d, "lineitem"), col("l_returnflag"),
        col("l_linestatus"))),

    // --- functional-dependency / candidate-key profile ---
    "q69_functional_deps" -> ((s, d) =>
      Drift.functionalDependencies(t(s, d, "orders"),
        Seq("o_orderkey" -> "o_custkey", "o_custkey" -> "o_orderpriority",
          "o_orderpriority" -> "o_orderstatus"))
        .orderBy("det", "dep")),

    // --- completeness/cardinality/entropy summary, k columns one shuffle ---
    "q70_column_summary" -> ((s, d) =>
      Profiler.columnSummary(t(s, d, "orders"),
        Seq("o_orderstatus", "o_orderpriority", "o_custkey"))
        .orderBy("col_name")),

    // --- deterministic corpus shuffle + shard layout (epoch permutation) ---
    "q71_shuffle_shards" -> ((s, d) =>
      Corpus.shuffleShards(t(s, d, "documents"), "doc_id", shardSize = 64)
        .select("doc_id", "shuffle_pos", "shard", "shard_offset")
        .orderBy("doc_id")),

    // --- ordered funnel (view → click → purchase, first-touch) ---
    "q72_funnel" -> ((s, d) =>
      Temporal.funnel(t(s, d, "events"), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
        .orderBy("step")),

    // --- windowless PERCENT_RANK normalization (rank via grouped
    // prefix sums; fact rows re-join the distinct-bounded rank table) ---
    "q73_percent_rank" -> ((s, d) =>
      Drift.percentRank(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity")), "l_quantity")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("pct_rank"), 6).as("pct_rank"))
        .orderBy("l_orderkey", "l_linenumber")),

    // --- per-column statistical profiling (engine core) ---
    "q01_profile_extendedprice" -> ((s, d) => numericProfile(t(s, d, "lineitem"), "l_extendedprice")),
    "q02_profile_totalprice" -> ((s, d) => numericProfile(t(s, d, "orders"), "o_totalprice")),
    "q03_profile_quantity" -> ((s, d) => numericProfile(t(s, d, "lineitem"), "l_quantity")),

    "q04_value_counts_priority" -> ((s, d) => valueCounts(t(s, d, "orders"), "o_orderpriority")),
    "q05_value_counts_mktsegment" -> ((s, d) => valueCounts(t(s, d, "customer"), "c_mktsegment")),
    "q06_value_counts_returnflag" -> ((s, d) => valueCounts(t(s, d, "lineitem"), "l_returnflag")),

    "q07_profile_datetime_orders" -> ((s, d) => {
      val df = t(s, d, "orders")
      val e = unix_timestamp(col("o_orderdate"))
      val moments = df.agg(
        count(col("o_orderdate")).as("n"),
        sum(e.cast(dec)).as("s1"),
        sum((e * e).cast(DecimalType(38, 0))).as("s2"),
        min(e).as("mn_epoch"), max(e).as("mx_epoch"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("min_date"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("max_date"),
        percentile(e, lit(0.5)).as("med"))
      val n = col("n").cast("double")
      val mean = col("s1").cast("double") / n
      // 2-dp rounding: epoch stats are ~1e8-1e9; 6-dp would demand more
      // significant digits than cross-engine double math guarantees
      // (variance cancellation leaves ~1e-6 noise on std)
      moments.select(col("n"),
        round(mean, 2).as("mean_epoch"),
        round(sqrt(col("s2").cast("double") / n - mean * mean), 2).as("std_epoch"),
        col("mn_epoch"), col("mx_epoch"), col("min_date"), col("max_date"),
        round(col("med"), 2).as("median_epoch"))
    }),

    "q08_boolean_profile_events" -> ((s, d) => {
      val df = t(s, d, "events")
      val b = (col("event_type") === "click")
      df.agg(
        sum(when(b, 1L).otherwise(0L)).as("true_count"),
        sum(when(!b, 1L).otherwise(0L)).as("false_count"),
        count(lit(1)).as("n"))
        .withColumn("true_prob",
          round(col("true_count").cast("double") / col("n"), 6))
    }),

    // --- detection-ladder signals (engine core) ---
    "q09_detect_signals_orders" -> ((s, d) => {
      val df = t(s, d, "orders")
      val dateStr = date_format(col("o_orderdate"), "yyyy-MM-dd")
      val keyStr = col("o_orderkey").cast(StringType)
      df.agg(
        count(lit(1)).as("n"),
        // the documented phone-precedence quirk: ISO dates strip to 8 digits
        round(avg(when(length(regexp_replace(dateStr, "\\D", "")).between(7, 15), 1.0).otherwise(0.0)), 6).as("date_phone_ratio"),
        round(avg(when(keyStr.rlike("@[^@]*\\."), 1.0).otherwise(0.0)), 6).as("key_email_ratio"),
        round(avg(when(keyStr.try_cast(DoubleType).isNotNull, 1.0).otherwise(0.0)), 6).as("key_numeric_ratio"),
        count_distinct(col("o_orderpriority")).as("priority_distinct"),
        round(count_distinct(col("o_orderpriority")).cast("double") / count(lit(1)), 6).as("priority_unique_ratio"))
    }),

    "q10_bool_votes_lineitem" -> ((s, d) => {
      val df = t(s, d, "lineitem")
      val rf = lower(trim(col("l_returnflag")))
      val ls = lower(trim(col("l_linestatus")))
      df.agg(
        count(lit(1)).as("n"),
        sum(when(rf.isin("y", "n"), 1L).otherwise(0L)).as("rf_vote_yn"),
        sum(when(rf.isin("t", "f"), 1L).otherwise(0L)).as("rf_vote_tf"),
        sum(when(rf.isin("true", "false"), 1L).otherwise(0L)).as("rf_vote_truefalse"),
        sum(when(ls.isin("t", "f"), 1L).otherwise(0L)).as("ls_vote_tf"),
        count_distinct(rf).as("rf_distinct_norm"),
        max(when(rf.isin(Detector.boolTokens: _*), 0).otherwise(1)).as("rf_nonbool"))
    }),

    // --- histogram prep / binning ---
    "q11_histogram_extendedprice" -> ((s, d) => {
      val df = t(s, d, "lineitem")
      val bounds = df.agg(min(col("l_extendedprice")).as("lo"), max(col("l_extendedprice")).as("hi"))
      val x = col("l_extendedprice")
      val bucket = least(greatest(
        floor((x - col("lo")) / (col("hi") - col("lo")) * 50), lit(0)), lit(49))
      df.crossJoin(broadcast(bounds))
        .groupBy(bucket.cast(IntegerType).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")
    }),

    // --- scalar string/regex expression surface ---
    "q12_string_ops_customer" -> ((s, d) => {
      t(s, d, "customer").select(
        col("c_custkey"),
        lower(col("c_name")).as("name_lower"),
        length(col("c_name")).as("name_len"),
        regexp_replace(col("c_name"), "\\D", "").as("digits"),
        substring(col("c_name"), 1, 8).as("prefix"),
        when(col("c_name").rlike("^Customer#\\d+$"), 1).otherwise(0).as("shape_ok"))
        .orderBy("c_custkey")
    }),

    // --- semi-structured: JSON props ---
    "q13_json_events" -> ((s, d) => {
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          round(sum(col("k")).cast("double") / count(col("k")), 6).as("avg_k"))
        .orderBy("event_type")
    }),

    // --- window functions / top-k ---
    "q14_topk_users_by_type" -> ((s, d) => {
      val per = t(s, d, "events")
        .groupBy("event_type", "user_id")
        .agg(sum(col("value").cast(dec)).as("total_dec"), count(lit(1)).as("n_events"))
      // event_type is 5-valued: a plain per-type window would sort every
      // user of a type in ONE task at scale — the salted two-phase
      // top-k is result-identical with bounded tasks
      Skew.topKPerGroup(per, "event_type", col("user_id"), k = 3,
          orderCols = Seq(desc("total_dec"), asc("user_id")))
        .select(col("event_type"), col("rank"), col("user_id"),
          round(col("total_dec").cast("double"), 6).as("total"), col("n_events"))
        .orderBy("event_type", "rank")
    }),

    // --- joins + aggregation ---
    "q15_revenue_by_segment" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val customer = t(s, d, "customer")
      orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast(dec)).cast("double"), 6).as("revenue"))
        .orderBy("c_mktsegment")
    }),

    "q16_q1_lineitem" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity").cast(dec)).cast("double"), 6).as("sum_qty"),
          round(sum(col("l_extendedprice").cast(dec)).cast("double"), 6).as("sum_base_price"),
          round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec)).cast("double"), 6).as("sum_disc_price"),
          round(sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1)), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // --- time windows (batch form of the streaming aggregation) ---
    "q17_hourly_events" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("value").cast(dec)).cast("double"), 6).as("sum_value"))
        .orderBy("hour", "event_type")
    }),

    "q18_sessionize_events" -> ((s, d) => {
      val df = t(s, d, "events")
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gap = (unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(w))
      df.withColumn("new_session",
          when(gap.isNull || gap > 1800000L, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // --- text analysis (north star) ---
    "q19_token_stats" -> ((s, d) => {
      // one fused byte pass per doc (TokenStats), projected once — the
      // HOF chain tokenized each doc 3x (count, subwords, mean length)
      val st = col("__st")
      t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.tokenStats(col("text")).as("__st"))
        .select(
          col("doc_id"),
          st.getField("n_tokens").as("n_tokens"),
          st.getField("sum_subwords").as("n_subwords"),
          round(TextAnalysis.meanTokenLenFromStats(st), 6).as("mean_token_len"))
        .orderBy("doc_id")
    }),

    "q20_quality_scores" -> ((s, d) => {
      val st = col("__st")
      t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.tokenStatsEn(col("text")).as("__st"))
        .select(
          col("doc_id"),
          round(TextAnalysis.punctRatioFromStats(st), 6).as("punct_ratio"),
          round(TextAnalysis.stopwordRatioFromStats(st), 6).as("stopword_ratio"),
          round(TextAnalysis.qualityFromStats(st), 6).as("quality"))
        .orderBy("doc_id")
    }),

    "q21_langid" -> ((s, d) => {
      val st = col("__st")
      t(s, d, "documents")
        .select(col("doc_id"), col("lang").as("lang_actual"),
          TextAnalysis.tokenStatsLangs(col("text")).as("__st"))
        .select(col("doc_id"), col("lang_actual"),
          st.getField("stops").getItem(0).as("sw_en"),
          st.getField("stops").getItem(1).as("sw_de"),
          st.getField("stops").getItem(2).as("sw_es"),
          st.getField("stops").getItem(3).as("sw_fr"),
          TextAnalysis.langIdFromStats(st).as("lang_pred"))
        .orderBy("doc_id")
    }),

    "q22_fingerprints" -> ((s, d) => {
      val c = col("text")
      val docs = t(s, d, "documents")
      val rowWise = docs.select(
        col("doc_id"),
        TextAnalysis.fingerprint(c).as("fp"),
        TextAnalysis.rollingHash(c).as("rolling"))
      // simhash via the exploded aggregation (one md5 per token, not 16)
      val sketch = TextAnalysis.simHash16Agg(docs, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
      rowWise.join(sketch, "doc_id").orderBy("doc_id")
    }),

    // --- deduplication (north star) ---
    "q23_dedup_exact" -> ((s, d) => {
      val dup = withDups(t(s, d, "documents"), "doc_id", 50, 10000)
      Dedup.exact(dup, "doc_id", "text")
        .select("fp", "keep_id", "dup_count")
        .orderBy("keep_id")
    }),

    "q24_dedup_minhash" -> ((s, d) => {
      val dup = withDups(t(s, d, "documents"), "doc_id", 50, 10000)
      Dedup.minhashCandidates(dup, "doc_id", "text", numHashes = 16, bands = 4)
        .orderBy("id_a", "id_b")
    }),

    // LSH candidates verified by exact Jaccard — the composition that
    // avoids all-pairs work (Dedup.lshJaccardDedup)
    "q25_dedup_jaccard" -> ((s, d) => {
      val dup = withDups(t(s, d, "documents"), "doc_id", 50, 10000)
      Dedup.lshJaccardDedup(dup, "doc_id", "text", numHashes = 16, bands = 4,
        k = 3, minJaccard = 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    "q26_dedup_simhash" -> ((s, d) => {
      val dup = withDups(t(s, d, "documents"), "doc_id", 50, 10000)
      TextAnalysis.simHash16Agg(dup, "doc_id", "text")
        .groupBy("simhash")
        .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > 1)
        .orderBy("keep_id")
    }),

    // size-routed (r13): the exact blocked kernel is O(n²) compares by
    // construction — fine at bench corpora (≤ 2050 vectors, under the
    // gate, so oracle row and bench history are unchanged), but the
    // full-suite sf1 run measured it ×7.8 at data ×10 and the curve
    // only steepens; above the gate the hyperplane-LSH bucketed kernel
    // (q37's path) takes over
    "q27_dedup_embedding" -> ((s, d) => {
      val dup = withDups(t(s, d, "embeddings"), "vec_id", 50, 10000)
      Similarity.cosinePairsAuto(dup, "vec_id", "embedding", 0.99,
        maxExactRows = 4096)
        .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
        .orderBy("id_a", "id_b")
    }),

    // --- similarity search (north star) ---
    "q28_ann_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy("query_id", "rank")
    }),

    "q29_ann_topk_scalable" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.bruteForceTopKLarge(
        e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // IVF two-stage ANN — oracle-checked end to end (centroid seed =
    // lowest ids, nprobe=4 of 16 clusters)
    "q30_ann_ivf" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.ivfTopK(
        e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", "vec_id", "embedding",
        k = 10, nCentroids = 16, nprobe = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // --- the detection ladder end-to-end: classify every events column
    // with the reference precedence (SURVEY.md §1), oracle replays the
    // same ladder in SQL ---
    "q33_detect_types_events" -> ((s, d) => {
      import s.implicits._
      val detected = graft.engine.Detector.detect(t(s, d, "events"))
      detected.toSeq.sortBy(_._1)
        .map { case (n, (st, sig)) => (n, st.name, sig.n, sig.nDistinct) }
        .toDF("col_name", "semantic_type", "n", "n_distinct")
    }),

    // --- full reference pipeline: profile → synthesize → validate.
    // The samplers are non-SQL-expressible, so the row can never be
    // value-replayed (the deterministic twin q159 is); since r12 the
    // row still carries a CHECKED signal beyond its row count: it
    // returns the reference's own validation readout
    // (`validate_synthetic_data`, Latanova_v1.py:425-494) as a verdict
    // frame — per generated column, the exact sample count and a
    // within-tolerance flag at the spec-enforced bands
    // (SyntheticPipelineSpec §5 tolerances) — and the oracle asserts
    // every flag TRUE and n = nSamples. The run is seeded, so the
    // verdict is deterministic; a sampler regression (bias, wrong
    // moments, dropped rows) flips a flag or the count and reds the
    // row. ---
    "q32_synthetic_pipeline" -> ((s, d) => {
      import graft.engine.{SyntheticPipeline, DetectorConfig, SemanticType}
      val orders = t(s, d, "orders")
      val cfg = SyntheticPipeline.Config(
        detector = DetectorConfig(strictFormats = true),
        nSamples = 1000, seed = 42, textColumns = false)
      val result = SyntheticPipeline.run(orders, cfg)
      val nRows = result.synthetic.count()
      import s.implicits._
      result.validation.toSeq.map { case (name, m) =>
        val p = result.profiles(name)
        val ok = p.semanticType match {
          case SemanticType.Integer | SemanticType.Float =>
            // constant columns (std = 0) generate constants: non-strict
            // bound keeps 0 <= 0 true
            val std = p.numeric.get.std
            m("mean_error") <= 0.1 * std && m("std_error") <= 0.15 * std
          case SemanticType.Boolean => m("true_prob_error") < 0.05
          case SemanticType.Categorical =>
            // probability-error band only: top-category IDENTITY is not
            // a stable statistic when the source is near-uniform
            // (o_orderpriority is ~0.2 x 5 — any draw can flip the
            // argmax while every probability is within band)
            m("avg_prob_error") < 0.05
          case SemanticType.Datetime =>
            m("mean_epoch_error") <= p.datetime.get.epoch.std
          case _ => // text/email/phone: embedding-space moment bands
            val o = p.text.get
            m("mean_error") < math.max(0.05, math.abs(o.overallMean) * 0.5) &&
              m("std_error") < math.max(0.05, o.overallStd * 0.5)
        }
        (name, p.semanticType.name, nRows, ok)
      }.sortBy(_._1)
        .toDF("col_name", "semantic_type", "n_rows", "within_band")
    }),

    // --- text vector-space profile (TextProfiler math, oracle-checked):
    // per-dimension mean/std + covariance trace over the maxTokens×dim
    // concat vectorization of documents.text. The embedding is the
    // pure-function md5 embedder (engine-portable), so executors derive
    // every token's vector on demand — the treeAggregate path runs with
    // zero OOV and ZERO driver-side vocabulary (no collect of any
    // size); the oracle recomputes every moment from scratch in SQL. ---
    "q34_text_vector_profile" -> ((s, d) => {
      import graft.text.{Md5Embedder, TextProfiler}
      val docs = t(s, d, "documents")
      val stats = TextProfiler.profile(docs, "text", Md5Embedder(Q34Dim),
        Q34MaxTokens, rawSampleCap = 1).get
      import s.implicits._
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (0 until Q34MaxTokens * Q34Dim).map(i =>
        (i, r6(stats.mean(i)), r6(stats.std(i)), r6(stats.covTrace)))
        .toDF("dim_idx", "mean", "std", "cov_trace")
    }),

    // --- nearest-word decode, oracle-checked as a round-trip over the
    // CAPPED production vocab: Vocab.build takes the top-`Q35VocabCap`
    // tokens by (frequency desc, token asc) — a distributed TakeOrdered,
    // never an uncapped collect — and the round-trip assertion runs on
    // the docs whose first maxTokens tokens are all in-vocab (argmax
    // cosine over the md5 embedder returns the original token there).
    // The oracle rebuilds the same frequency-capped vocab in SQL and
    // emits "the first maxTokens tokens" for the same doc subset. This
    // exercises the real Vocab.build/decode kernel (broadcast vocab,
    // one-pass batched argmax scan) end to end. ---
    "q35_decode_roundtrip" -> ((s, d) => {
      import graft.text.{Md5Embedder, Tokenize, Vectorize, Vocab}
      val docs = t(s, d, "documents")
      val model = Md5Embedder(Q34Dim)
      val vocab = Vocab.build(docs, "text", model, cap = Q35VocabCap)
      val bcV = s.sparkContext.broadcast(vocab)
      val bcW = s.sparkContext.broadcast(vocab.words.toSet)
      val mt = 2
      val inVocab = udf { (text: String) =>
        text != null &&
          Tokenize.tokensLocal(text).take(mt).forall(bcW.value.contains)
      }
      val dec = udf { (text: String) =>
        if (text == null) null
        else bcV.value.decode(Vectorize.vectorizeLocal(model, mt)(text), mt)
      }
      docs.filter(inVocab(col("text")))
        .select(col("doc_id"), dec(col("text")).as("decoded"))
        .orderBy("doc_id")
    }),

    // --- multimodal feature extraction: payload → stub embedding
    // (md5-derived, oracle-replayable) — the bridge from binary
    // payloads into the similarity/dedup family ---
    "q36_multimodal_embed" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      docs.select(col("doc_id"),
          posexplode(Multimodal.embedStub(col("payload"), 4)))
        // + 0.0: IEEE -0.0 → 0.0 (mirrored in the oracle; one sf1 row
        // rounded to zero from below and the engines disagreed on the
        // sign of zero)
        .select(col("doc_id"), col("pos").as("j"),
          (round(col("col"), 6) + lit(0.0)).as("v"))
        .orderBy("doc_id", "j")
    }),

    // --- embedding near-dup at scale: multi-table random-hyperplane
    // LSH + exact verify of bucket-mates (the near-linear path that
    // replaces q27's O(n²) pair join) — oracle replays the same
    // deterministic hyperplanes from inlined literals ---
    "q37_neardup_bucketed" -> ((s, d) => {
      val dup = withDups(t(s, d, "embeddings"), "vec_id", 50, 10000)
      Similarity.cosineNearDupBucketed(dup, "vec_id", "embedding", 0.99,
        nBits = Q37Bits, nTables = Q37Tables, seed = Q37Seed)
        .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
        .orderBy("id_a", "id_b")
    }),

    // --- Lloyd k-means over the vector column (the IVF centroid
    // refinement path), oracle-checked per (centroid, dimension) ---
    "q38_kmeans_centroids" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.kmeansCentroids(e, "vec_id", "embedding",
        k = Q38K, iterations = Q38Iters)
        .select(col("centroid_id"), posexplode(col("cv")))
        .select(col("centroid_id"), col("pos").cast(LongType).as("pos"),
          round(col("col"), 6).as("v"))
        .orderBy("centroid_id", "pos")
    }),

    // --- SimHash near-dup with Hamming tolerance (banded candidate
    // join + exact popcount verify; fixture = near copies that differ
    // by one appended token) ---
    "q39_simhash_hamming" -> ((s, d) => {
      val base = t(s, d, "documents")
      val dup = base.unionByName(base.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 10000)
        .withColumn("text", concat(col("text"), lit(" nearmarker"))))
      Dedup.simhashNearDup(dup, "doc_id", "text", maxDist = 3)
        .select(col("id_a"), col("id_b"), col("dist").cast(LongType).as("dist"))
        .orderBy("id_a", "id_b")
    }),

    // --- line-level boilerplate strip (C4-style corpus cleaning;
    // fixture = docs line-ified on ' table ' with injected header and
    // footer lines) ---
    "q40_line_dedup" -> ((s, d) => {
      val lined = t(s, d, "documents").select(col("doc_id"),
        concat(lit("follow us on example dot com\n"),
          expr("replace(text, ' table ', '\n')"),
          lit("\nsubscribe to the newsletter")).as("text"))
      Dedup.stripBoilerplate(lined, "doc_id", "text", minDocs = 10)
        .select(col("id").as("doc_id"), col("text_clean"), col("n_removed"))
        .orderBy("doc_id")
    }),

    // --- backward as-of join: each event picks up the user's latest
    // order at event time (point-in-time enrichment; single exchange +
    // sort, no join explosion — see Temporal.asofJoinBackward) ---
    "q41_asof_join" -> ((s, d) => {
      val events = t(s, d, "events").select("event_id", "user_id", "ts")
      Temporal.asofJoinBackward(events, t(s, d, "orders"),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        payloadCols = Seq("o_orderkey", "o_totalprice"),
        tieBreak = "o_orderkey")
        .select("event_id", "user_id", "o_orderkey", "o_totalprice")
        .orderBy("event_id")
    }),

    // --- TF-IDF keyword extraction: corpus document frequency +
    // per-doc top-5 terms (keyed aggs only, no collect) ---
    "q42_tfidf" -> ((s, d) =>
      Corpus.tfidfTopTerms(t(s, d, "documents"), "doc_id", "text", k = 5)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "rank")),

    // --- Gopher-style repetition signals: dup-token ratio (pure
    // expression) + top-bigram share (keyed agg) per document ---
    "q43_repetition" -> ((s, d) =>
      Corpus.repetitionStats(t(s, d, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // --- PII redaction (corpus scrubbing): counts + redacted text;
    // fixture injects a known email/phone into every third doc ---
    "q44_pii_redact" -> ((s, d) => {
      val docs = t(s, d, "documents").withColumn("text",
        when(col("doc_id") % 3 === 0,
          concat(col("text"),
            lit(" contact alice.smith@example.org or +1 (415) 555-0100")))
          .otherwise(col("text")))
      docs.select(col("doc_id"),
        TextAnalysis.emailCount(col("text")).cast(LongType).as("n_emails"),
        TextAnalysis.phoneCount(col("text")).cast(LongType).as("n_phones"),
        TextAnalysis.redactPii(col("text")).as("text_redacted"))
        .orderBy("doc_id")
    }),

    // --- stratified content-keyed sampling: per-language downsampling
    // as a pure narrow filter (reproducible across engines/runs) ---
    "q45_stratified_sample" -> ((s, d) =>
      Sampling.stratifiedHashSample(
        t(s, d, "documents").select("doc_id", "lang"), "doc_id", "lang",
        fractions = Map("en" -> 0.3, "de" -> 0.8, "zh" -> 1.0),
        default = 0.5)
        .orderBy("doc_id")),

    // --- exact-n-per-key deterministic sample (content-defined
    // priority reservoir) ---
    "q46_sample_per_key" -> ((s, d) =>
      Sampling.samplePerKey(
        t(s, d, "documents").select("doc_id", "lang"), "lang", "doc_id", 3)
        .orderBy("doc_id")),

    // --- deterministic train/val/test split: content-keyed labels,
    // pure narrow projection, stable under corpus growth ---
    "q88_split_assignment" -> ((s, d) =>
      Sampling.assignSplits(
        t(s, d, "documents").select("doc_id", "lang"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("doc_id")),

    // --- connected components (bounded min-label propagation) over a
    // two-hop chain fixture: i — i+10000 — i+20000 ---
    "q47_cc_labels" -> ((s, d) => {
      val ids = t(s, d, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 50)
      val edges = ids
        .select(col("doc_id").as("src"), (col("doc_id") + 10000).as("dst"))
        .unionByName(ids.select((col("doc_id") + 10000).as("src"),
          (col("doc_id") + 20000).as("dst")))
      Graph.minLabelPropagation(edges, "src", "dst", rounds = 3)
        .orderBy("id")
    }),

    // --- end-to-end corpus dedup: near-dup pairs → components → keep
    // the minimum-id representative per cluster ---
    "q48_dedup_corpus" -> ((s, d) => {
      val base = t(s, d, "documents")
      val dup = base.unionByName(base.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 10000)
        .withColumn("text", concat(col("text"), lit(" nearmarker"))))
      Dedup.dedupCorpus(dup, "doc_id", "text", maxDist = 3, rounds = 3)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // --- grouped numeric profile: the full reference profile per
    // language (segment-wise curation form) ---
    "q49_grouped_profile" -> ((s, d) =>
      graft.engine.Profiler.groupedNumericProfile(
        t(s, d, "documents"), "lang", "n_chars")
        .orderBy("lang")),

    // --- Z-order (Morton) value: the data-layout kernel, oracle-checked
    // bit-for-bit (native codegen expression vs arithmetic replay) ---
    "q50_zorder" -> ((s, d) => {
      val e = t(s, d, "events")
      e.select(col("event_id"),
        Layout.zvalue(col("user_id"), floor(col("value")).cast(LongType)).as("z"))
        .orderBy("event_id")
    }),

    // --- markup strip (web-scrape cleaning): tag/URL counts + cleaned
    // text; fixture wraps every fourth doc in tags + a trailing URL ---
    "q51_markup_strip" -> ((s, d) => {
      val docs = t(s, d, "documents").withColumn("text",
        when(col("doc_id") % 4 === 0,
          concat(lit("<html><p class=\"x\">"), col("text"),
            lit("</p> see https://example.com/a?b=1 now</html>")))
          .otherwise(col("text")))
      docs.select(col("doc_id"),
        TextAnalysis.tagCount(col("text")).cast(LongType).as("n_tags"),
        TextAnalysis.urlCount(col("text")).cast(LongType).as("n_urls"),
        TextAnalysis.stripMarkup(col("text")).as("text_clean"))
        .orderBy("doc_id")
    }),

    // --- the composed curation pipeline: clean → filter → dedup →
    // sample, one flow (fixture injects markup AND PII so every
    // cleaning stage has work to do) ---
    "q52_curation_pipeline" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("text",
          when(col("doc_id") % 4 === 0,
            concat(lit("<html><p class=\"x\">"), col("text"),
              lit("</p> see https://example.com/a?b=1 now</html>")))
            .otherwise(col("text")))
        .withColumn("text",
          when(col("doc_id") % 3 === 0,
            concat(col("text"),
              lit(" contact alice.smith@example.org or +1 (415) 555-0100")))
            .otherwise(col("text")))
      Curation.curate(docs, "doc_id", "text",
        Curation.CurationConfig(lang = Some("en"), minQuality = 0.5,
          minTokens = 5, sampleFraction = 0.5))
        .select(col("id").as("doc_id"), col("text_clean"), col("lang"),
          round(col("quality"), 6).as("quality"), col("n_tokens"))
        .orderBy("doc_id")
    }),

    // --- train/test decontamination: drop training docs whose content
    // fingerprint appears in the (10%-overlapping) eval set ---
    "q53_decontaminate" -> ((s, d) => {
      val train = t(s, d, "documents")
      val test = train.filter(col("doc_id") % 10 === 0)
        .select(col("text"))
      Dedup.decontaminate(train, "doc_id", test, "text")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // --- corpus n-gram table (LM features / n-gram contamination) ---
    "q54_ngram_counts" -> ((s, d) =>
      Corpus.ngramCounts(t(s, d, "documents"), "doc_id", "text",
        n = 3, minCount = 5)
        .orderBy("ngram")),

    // --- binned point-in-interval range join (equijoin on grid cells +
    // exact containment — never a nested-loop): every event value
    // against ~100 events as [value, value+5] intervals. The interval
    // side is SIZE-BOUNDED: a fixed interval-id stride would make both
    // sides grow with the data and the MATCH OUTPUT grow n² (the r13
    // full-suite sf1 run measured 446k → 44.5M matches at data ×10 —
    // no plan fixes a quadratic result set). Production range joins
    // have a bounded dimension side (calibration bands, time buckets,
    // blocklists), so above 100k events the stride scales to hold
    // ~100 intervals and the output grows linearly with the points.
    // Bench corpora (sf0.01 = 10k, sf0.1 = 100k events) keep stride
    // 1000 — the oracle row and bench history are unchanged ---
    "q61_range_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val points = ev.select(col("event_id"), col("value"))
      val nEv = ev.count()
      val stride = math.max(1000L, nEv / 100L)
      val intervals = ev.filter(col("event_id") % stride === 0)
        .select(col("event_id").as("interval_id"), col("value").as("lo"),
          (col("value") + 5.0).as("hi"))
      Temporal.rangeJoinPointInterval(points, "event_id", "value",
        intervals, "interval_id", "lo", "hi", binWidth = 5.0)
        .select(col("event_id"), col("interval_id"),
          round(col("value"), 6).as("value"), round(col("lo"), 6).as("lo"))
        .orderBy("event_id", "interval_id")
    }),

    // --- overlapping context-window chunking (RAG/LM layout: 12-token
    // windows, 4-token overlap) ---
    "q60_chunk_documents" -> ((s, d) =>
      Corpus.chunkDocuments(t(s, d, "documents"), "doc_id", "text",
        chunkSize = 12, overlap = 4)
        .orderBy("id", "chunk_idx")),

    // --- weighted sample without replacement (Efraimidis–Spirakis,
    // content-derived priorities): sample docs ∝ n_chars, k=100 ---
    "q59_weighted_sample" -> ((s, d) =>
      Sampling.weightedSample(t(s, d, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", k = 100)
        .orderBy("skey", "doc_id")),

    // --- sequence packing (concatenate-and-cut training layout): doc →
    // (bin, offset, crosses) via the distributed prefix sum — no
    // single-task window; oracle replays with SUM OVER (ORDER BY) ---
    "q58_sequence_pack" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"),
        coalesce(TextAnalysis.tokenCount(col("text")).cast(LongType), lit(0L))
          .as("n_tokens"))
      Prefix.packSequences(docs, "doc_id", "n_tokens", budget = 512)
        .select(col("doc_id"), col("n_tokens"), col("cum"), col("start_pos"),
          col("bin"), col("bin_offset"), col("crosses"))
        .orderBy("doc_id")
    }),

    // --- n-gram contamination report: fixture = 50 verbatim leaks
    // (contamination 1.0) + 50 alphabet-rotated twins (disjoint token
    // space → ~0) against the full corpus as training data ---
    "q57_ngram_contamination" -> ((s, d) => {
      val train = t(s, d, "documents")
      val leaked = train.filter(col("doc_id") < 50)
      val test = leaked.unionByName(leaked
        .withColumn("doc_id", col("doc_id") + 20000)
        .withColumn("text", translate(lower(col("text")),
          "abcdefghijklmnopqrstuvwxyz0123456789",
          "bcdefghijklmnopqrstuvwxyza1234567890")))
      Corpus.ngramContamination(train, test, "doc_id", "text", n = 5)
        .orderBy("id")
    }),

    // --- passage-level exact dedup stats (chunked substring dedup) ---
    "q55_passage_dup" -> ((s, d) =>
      Corpus.passageDupStats(
        withDups(t(s, d, "documents"), "doc_id", 50, 10000),
        "doc_id", "text", passageTokens = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // --- unigram-LM quality score (CCNet-style corpus-relative) ---
    "q56_unigram_lm" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Corpus.unigramLogProb(docs.filter(col("doc_id") % 2 === 0), docs,
        "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // --- multimodal plumbing (stub codec, real schema/batching) ---
    "q31_multimodal_meta" -> ((s, d) => {
      // real-codec check, oracle-replayable: serialize md5(text)-derived
      // dimensions into an ACTUAL PNG header (even ids) or JPEG SOF0
      // (odd ids), then parse them back with the real byte-level header
      // reader — any mis-read byte breaks the oracle compare, whose
      // width/height formulas never see the image bytes at all
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val fix = udf { (text: String, id: Long) =>
        if (text == null) null
        else {
          val dg = java.security.MessageDigest.getInstance("MD5")
            .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          def u(i: Int) = dg(i) & 0xff
          val w = 64 + (u(0) * 256 + u(1)) % 1985
          val h = 64 + (u(2) * 256 + u(3)) % 1985
          if (id % 2 == 0) Multimodal.pngFixture(w, h)
          else Multimodal.jpegFixture(w, h)
        }
      }
      val payloads = docs.select(col("doc_id"), col("text"),
        fix(col("text"), col("doc_id")).as("payload"))
      val ingested = Multimodal.ingest(payloads, "payload", "image", "image/*")
      Multimodal.decode(ingested, "payload")
        .select(col("doc_id"),
          col("meta.n_bytes").as("n_bytes"),
          md5(encode(col("text"), "UTF-8")).as("digest"),
          col("decoded.width").as("width"),
          col("decoded.height").as("height"),
          col("decoded.duration_ms").as("duration_ms"))
        .orderBy("doc_id")
    }),

    // --- persistable/appendable IVF index: build on the LOW-id half,
    // admit the high-id half by assignment-only append (no retraining
    // — the daily-shard shape), search the persisted tables. The low
    // half contains the union's 16 lowest ids, so the frozen centroids
    // EQUAL a full rebuild's — the oracle replays rebuild-then-search
    // over the union (q30's plan) and the row proves append-then-search
    // ≡ rebuild-then-search value-for-value ---
    "q230_ivf_index_append" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val corpus = e.filter(col("vec_id") >= 5)
      val cut = corpus.agg(expr("(max(vec_id) + 1) DIV 2")).collect()(0).getLong(0)
      // index scratch rides the streaming-checkpoint discipline (r11):
      // tmpfs-backed temp dir, eager materialization of the (tiny)
      // result, rmTree in finally — no graft_ivf* residue survives
      val scratch = tmpCheckpointDir("graft_ivf_")
      try {
        val path = s"$scratch/idx"
        IvfIndex.build(corpus.filter(col("vec_id") < cut),
          "vec_id", "embedding", path, nCells = 16)
        IvfIndex.append(s, path, corpus.filter(col("vec_id") >= cut),
          "vec_id", "embedding")
        IvfIndex.search(s, path, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10, nprobe = 4)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            round(col("sim"), 6).as("sim"))
          .orderBy("query_id", "rank")
          .localCheckpoint(true)
      } finally rmTree(scratch)
    }),

    // --- the index's CDC shape: a change batch DELETES some admitted
    // ids and UPSERTS others (assignment against the frozen centroids,
    // tombstone-superseding their old rows), compaction folds the
    // tombstones into the code files, and search over the compacted
    // index must equal a REBUILD over the edited corpus — the oracle
    // replays exactly that (delete-then-search ≡
    // rebuild-without-deleted, upsert-then-search ≡
    // rebuild-with-the-new-vectors). Edits touch only ids above the
    // centroid seed range, so the frozen quantizer equals the
    // rebuild's and parity is value-for-value ---
    "q233_ivf_index_cdc" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val corpus = e.filter(col("vec_id") >= 5)
      val cut = corpus.agg(expr("(max(vec_id) + 1) DIV 2")).collect()(0).getLong(0)
      val scratch = tmpCheckpointDir("graft_ivfc_")
      try {
        val path = s"$scratch/idx"
        IvfIndex.build(corpus.filter(col("vec_id") < cut),
          "vec_id", "embedding", path, nCells = 16)
        IvfIndex.append(s, path, corpus.filter(col("vec_id") >= cut),
          "vec_id", "embedding")
        // one CDC batch over the appended half: vec_id ≡ 0 (mod 7)
        // deletes, vec_id ≡ 3 (mod 7) upserts its REVERSED embedding
        // (SQL-replayable via list_reverse)
        val changes = corpus
          .filter(col("vec_id") >= cut &&
            (col("vec_id") % 7 === 0 || col("vec_id") % 7 === 3))
          .select(col("vec_id"), reverse(col("embedding")).as("embedding"),
            lit(1L).as("seq"),
            when(col("vec_id") % 7 === 0, lit("delete"))
              .otherwise(lit("upsert")).as("op"))
        IvfIndex.applyChanges(s, path, changes,
          "vec_id", "embedding", "seq", "op")
        IvfIndex.compact(s, path)
        IvfIndex.search(s, path, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10, nprobe = 4)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            round(col("sim"), 6).as("sim"))
          .orderBy("query_id", "rank")
          .localCheckpoint(true)
      } finally rmTree(scratch)
    }),

    // --- the REFINED persisted build: Lloyd-trained coarse quantizer
    // (kmeansIterations > 0) frozen into the index, searched
    // end-to-end — the oracle replays the full Lloyd recursion (q38's
    // seeded-centroid machinery) and then the IVF probe/score/top-k
    // over the refined centroids, value-checking the production build
    // mode the lifecycle spec drives ---
    "q234_ivf_index_refined" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val corpus = e.filter(col("vec_id") >= 5)
      val scratch = tmpCheckpointDir("graft_ivfr_")
      try {
        val path = s"$scratch/idx"
        IvfIndex.build(corpus, "vec_id", "embedding", path,
          nCells = 16, kmeansIterations = 2)
        IvfIndex.search(s, path, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10, nprobe = 4)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            round(col("sim"), 6).as("sim"))
          .orderBy("query_id", "rank")
          .localCheckpoint(true)
      } finally rmTree(scratch)
    }),

    // --- the index's retrain trigger: per-cell PSI of the appended
    // generations against the build-time cell population (categorical
    // Laplace-smoothed PSI over the K trained cells) — the drift
    // instrument that says when assignment-only admission has decayed
    // the quantizer enough to rebuild ---
    "q231_ivf_index_drift" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val corpus = e.filter(col("vec_id") >= 5)
      val cut = corpus.agg(expr("(max(vec_id) + 1) DIV 2")).collect()(0).getLong(0)
      val scratch = tmpCheckpointDir("graft_ivfd_")
      try {
        val path = s"$scratch/idx"
        IvfIndex.build(corpus.filter(col("vec_id") < cut),
          "vec_id", "embedding", path, nCells = 16)
        IvfIndex.append(s, path, corpus.filter(col("vec_id") >= cut),
          "vec_id", "embedding")
        IvfIndex.driftReport(s, path, threshold = 0.2)
          .orderBy("centroid_id")
          .localCheckpoint(true)
      } finally rmTree(scratch)
    }),

    // --- the PQ-CODED persisted index (the 100 TB storage shape: m
    // small ints per vector instead of dim doubles): build trains the
    // coarse cells + PQ codebook on the low half, append admits the
    // high half by encode-and-assign only, search is ADC over the
    // persisted (cell, codes) tables. iterations = 0 keeps the
    // codebook at the deterministic lowest-id seed, so the frozen
    // index EQUALS a rebuild's (Lloyd refinement would differ by
    // construction — the documented approximation driftReport governs)
    // and the oracle replays REBUILD-then-search over the union ---
    "q232_ivfpq_index_append" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val corpus = e.filter(col("vec_id") >= 5)
      val cut = corpus.agg(expr("(max(vec_id) + 1) DIV 2")).collect()(0).getLong(0)
      val n = corpus.filter(col("embedding").isNotNull).count()
      val scratch = tmpCheckpointDir("graft_ivfpq_")
      try {
        val path = s"$scratch/idx"
        IvfIndex.buildPq(corpus.filter(col("vec_id") < cut), "vec_id", "embedding",
          path, dim = 64, m = 4, k = 8, iterations = 0,
          nCells = if (n <= 2048L) IvfCells
                   else Quantize.nCentroidsFor(n, minC = IvfCells))
        IvfIndex.appendPq(s, path, corpus.filter(col("vec_id") >= cut),
          "vec_id", "embedding", dim = 64, m = 4)
        IvfIndex.searchPq(s, path, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", dim = 64, m = 4, nProbe = IvfProbe, topK = 10)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            round(col("adist"), 6).as("adist"))
          .orderBy("query_id", "rank")
          .localCheckpoint(true)
      } finally rmTree(scratch)
    }),

    // --- the full maintenance lifecycle: build → append → driftReport
    // (the instrument MATERIALIZED, not just constructed) → REBUILD
    // (Lloyd-refined retrain from the index's own live code rows —
    // no access to the original corpus — under the crash-recoverable
    // staged swap) → search. The rebuild trains on the union corpus,
    // so the oracle is exactly q234's kmeans-replay (K = 16, 2 Lloyd
    // rounds over the non-query rows) followed by the IVF
    // probe/score/top-k: the lifecycle's end state must equal a
    // refined build from scratch, value for value ---
    "q235_ivf_index_rebuild" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val corpus = e.filter(col("vec_id") >= 5)
      val cut = corpus.agg(expr("(max(vec_id) + 1) DIV 2")).collect()(0).getLong(0)
      val scratch = tmpCheckpointDir("graft_ivfrb_")
      try {
        val path = s"$scratch/idx"
        IvfIndex.build(corpus.filter(col("vec_id") < cut),
          "vec_id", "embedding", path, nCells = 16)
        IvfIndex.append(s, path, corpus.filter(col("vec_id") >= cut),
          "vec_id", "embedding")
        // the retrain instrument runs end-to-end regardless of its
        // verdict — the lifecycle under test is drift → rebuild
        IvfIndex.driftReport(s, path, threshold = 0.2)
          .write.format("noop").mode("overwrite").save()
        IvfIndex.rebuild(s, path, nCells = 16, kmeansIterations = 2)
        IvfIndex.search(s, path, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10, nprobe = 4)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            round(col("sim"), 6).as("sim"))
          .orderBy("query_id", "rank")
          .localCheckpoint(true)
      } finally rmTree(scratch)
    }))

  // ---------------------------------------------------------------
  // oracle SQL (DuckDB dialect), one per query above
  // ---------------------------------------------------------------

  def oracleSql: Map[String, String] = {
    val toks = toksSql("text")
    // stub decode twin: hex digit i (1-based) of md5 as integer
    def hd(i: Int) = s"(instr('0123456789abcdef', substr(md5(text), $i, 1)) - 1)"

    Map(
      "q82_expectations" -> {
        val preds = Seq(
          "notnull(o_custkey)" -> "o_custkey IS NOT NULL",
          "positive(o_totalprice)" -> "o_totalprice > 0",
          "cap(o_totalprice)" -> "o_totalprice <= 400000",
          "set(o_orderstatus)" -> "o_orderstatus IN ('O','F','P')",
          "pattern(o_orderpriority)" ->
            "regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')",
          "recent(o_orderdate)" -> "o_orderdate < TIMESTAMP '2000-01-01'")
        val vcols = preds.zipWithIndex.map { case ((_, p), i) =>
          s"CAST(coalesce(sum(CASE WHEN NOT coalesce($p, TRUE) THEN 1 END), 0) AS BIGINT) AS v$i"
        }.mkString(",\n  ")
        val rows = preds.zipWithIndex.map { case ((name, _), i) =>
          s"""SELECT '$name' AS rule, n, v$i AS n_violations,
             |  round(CAST(n - v$i AS DOUBLE) / n, 6) AS pass_rate FROM base""".stripMargin
        }
        val uniq =
          """SELECT 'unique(o_orderkey)' AS rule,
            |  CAST(coalesce(sum(c), 0) AS BIGINT) AS n,
            |  CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS n_violations,
            |  round(CAST(coalesce(sum(c), 0) - coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS DOUBLE)
            |    / coalesce(sum(c), 0), 6) AS pass_rate
            |FROM (SELECT count(*) AS c FROM orders
            |      WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey)""".stripMargin
        s"""WITH base AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |  $vcols
           |FROM orders)
           |${(rows :+ uniq).mkString("\nUNION ALL\n")}
           |ORDER BY rule""".stripMargin
      },

      "q83_pagerank" -> {
        def iter(k: Int) =
          s"""c$k AS (SELECT e.dst AS id,
             |  sum(CAST(floor(r${k - 1}.pr / d.deg * 1e15) AS DECIMAL(38,0))) AS acc
             |  FROM e JOIN d ON e.src = d.src JOIN r${k - 1} ON e.src = r${k - 1}.id
             |  GROUP BY 1),
             |r$k AS (SELECT nodes.id,
             |  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
             |    + CAST(0.85 AS DOUBLE) * (CAST(coalesce(c$k.acc, 0) AS DOUBLE) / 1e15) AS pr
             |  FROM nodes CROSS JOIN nn LEFT JOIN c$k ON nodes.id = c$k.id)""".stripMargin
        s"""WITH e0 AS (SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
           |    's' || CAST(l_suppkey AS VARCHAR) AS dst
           |  FROM lineitem WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL),
           |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
           |d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
           |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
           |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS pr FROM nodes CROSS JOIN nn),
           |${iter(1)},
           |${iter(2)},
           |${iter(3)}
           |SELECT id, round(pr, 6) AS pr FROM r3 ORDER BY id""".stripMargin
      },

      // Brute-force all-pairs form: complete because J ≥ τ > 0 implies
      // the pair shares ≥ 1 shingle, so the shingle equi-join finds it.
      // The Spark side prunes candidates with the prefix filter instead;
      // both filters are lossless, so the outputs are identical.
      "q84_jaccard_join_prefix" -> {
        val sh = shinglesSql("text")
        s"""WITH dup AS (SELECT * FROM ${withDupsSql("documents", "doc_id", 50, 10000)}),
           |sh AS (SELECT doc_id, unnest($sh) AS s FROM dup),
           |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
           |  FROM sh a JOIN sh b ON b.s = a.s AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT id_a, id_b,
           |  round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
           |FROM inter
           |JOIN sizes sa ON sa.doc_id = id_a
           |JOIN sizes sb ON sb.doc_id = id_b
           |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
           |ORDER BY id_a, id_b""".stripMargin
      },

      "q118_containment_join" -> {
        val sh = shinglesSql("text")
        val toks = toksSql("text")
        s"""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
           |snip AS (SELECT doc_id + 20000 AS doc_id,
           |    array_to_string(list_slice($toks, 1, 12), ' ') AS text FROM base),
           |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM snip),
           |sh AS (SELECT doc_id, unnest($sh) AS s FROM corpus),
           |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
           |  FROM sh a JOIN sh b ON b.s = a.s AND a.doc_id <> b.doc_id
           |  GROUP BY 1, 2)
           |SELECT id_a, id_b,
           |  round(CAST(i AS DOUBLE) / sa.sz, 6) AS containment
           |FROM inter JOIN sizes sa ON sa.doc_id = id_a
           |WHERE CAST(i AS DOUBLE) / sa.sz >= 0.9
           |ORDER BY id_a, id_b""".stripMargin
      },

      "q120_incremental_admit" ->
        s"""WITH inc AS (
           |  SELECT doc_id, text, n_chars FROM documents WHERE doc_id >= 400
           |  UNION ALL
           |  SELECT doc_id + 30000, text || ' nearmarker', n_chars
           |  FROM documents WHERE doc_id < 20),
           |skp AS (SELECT doc_id AS id, CAST(${simhashIntSql(toks, 64)} AS BIGINT) AS h
           |  FROM documents WHERE doc_id < 400),
           |ski AS (SELECT doc_id AS id, CAST(${simhashIntSql(toks, 64)} AS BIGINT) AS h FROM inc),
           |bp AS (SELECT id, h, b AS band, (h >> (b * 16)) & 65535 AS key
           |  FROM skp CROSS JOIN range(4) t(b)),
           |bi AS (SELECT id, h, b AS band, (h >> (b * 16)) & 65535 AS key
           |  FROM ski CROSS JOIN range(4) t(b)),
           |hit AS (SELECT DISTINCT l.id FROM bi l JOIN bp r
           |  ON l.band = r.band AND l.key = r.key
           |  WHERE bit_count(xor(l.h, r.h)) <= 3),
           |fresh AS (SELECT id FROM ski WHERE id NOT IN (SELECT id FROM hit)),
           |cand AS (SELECT DISTINCT l.id AS id_a, l.h AS h_a, r.id AS id_b, r.h AS h_b
           |  FROM bi l JOIN bi r ON l.band = r.band AND l.key = r.key AND l.id < r.id
           |  WHERE l.id IN (SELECT id FROM fresh) AND r.id IN (SELECT id FROM fresh)),
           |e AS (SELECT id_a AS src, id_b AS dst FROM cand
           |      WHERE bit_count(xor(h_a, h_b)) <= 3),
           |${ccRoundsSql(3)},
           |todrop AS (SELECT id FROM v3 WHERE lbl <> id)
           |SELECT i.doc_id, i.n_chars FROM inc i
           |WHERE i.doc_id IN (SELECT id FROM fresh)
           |  AND i.doc_id NOT IN (SELECT id FROM todrop)
           |ORDER BY doc_id""".stripMargin,

      "q85_semantic_dedup" ->
        s"""WITH dup AS (SELECT * FROM ${withDupsSql("embeddings", "vec_id", 50, 10000)}),
           |corpus AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           |           FROM dup WHERE embedding IS NOT NULL),
           |cent AS (SELECT id AS centroid_id, v AS cv FROM corpus ORDER BY id LIMIT 16),
           |asg AS (SELECT id, centroid_id, v FROM (
           |  SELECT c.id, ct.centroid_id, c.v,
           |    row_number() OVER (PARTITION BY c.id
           |      ORDER BY list_cosine_similarity(c.v, ct.cv) DESC, ct.centroid_id ASC) AS rn
           |  FROM corpus c CROSS JOIN cent ct) WHERE rn = 1),
           |e AS (SELECT l.id AS src, r.id AS dst
           |  FROM asg l JOIN asg r ON l.centroid_id = r.centroid_id AND l.id < r.id
           |  WHERE list_cosine_similarity(l.v, r.v) >= 0.99),
           |${ccRoundsSql(3)},
           |todrop AS (SELECT id FROM v3 WHERE lbl <> id)
           |SELECT vec_id FROM dup WHERE vec_id NOT IN (SELECT id FROM todrop)
           |ORDER BY vec_id""".stripMargin,

      "q86_retention" ->
        """WITH a AS (SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS b
          |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          |c AS (SELECT u, b, min(b) OVER (PARTITION BY u) AS cohort FROM a),
          |g AS (SELECT cohort, CAST(date_diff('day', cohort, b) AS INT) AS age,
          |        CAST(count(*) AS BIGINT) AS n_active
          |      FROM c GROUP BY 1, 2),
          |s AS (SELECT cohort, n_active AS n_cohort FROM g WHERE age = 0)
          |SELECT strftime(g.cohort, '%Y-%m-%d') AS cohort, g.age, g.n_active,
          |  s.n_cohort,
          |  round(CAST(g.n_active AS DOUBLE) / s.n_cohort, 6) AS retention
          |FROM g JOIN s USING (cohort) ORDER BY cohort, age""".stripMargin,

      "q79_transitions" ->
        """WITH s AS (SELECT event_type AS ft,
          |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS tt
          |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          |p AS (SELECT ft, tt, CAST(count(*) AS BIGINT) AS n FROM s
          |      WHERE tt IS NOT NULL GROUP BY 1, 2),
          |f AS (SELECT ft, CAST(sum(n) AS BIGINT) AS tot FROM p GROUP BY 1)
          |SELECT p.ft AS from_type, p.tt AS to_type, p.n,
          |  round(CAST(p.n AS DOUBLE) / CAST(f.tot AS DOUBLE), 6) AS prob
          |FROM p JOIN f ON p.ft = f.ft ORDER BY from_type, to_type""".stripMargin,

      "q80_resample_hourly" ->
        """WITH b AS (SELECT date_trunc('hour', ts) AS h,
          |    CAST(count(*) AS BIGINT) AS n,
          |    round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_value
          |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
          |r AS (SELECT min(h) AS lo, max(h) AS hi FROM b),
          |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS s FROM r)
          |SELECT strftime(spine.s, '%Y-%m-%d %H:%M:%S') AS bucket,
          |  coalesce(b.n, 0) AS n,
          |  coalesce(b.sum_value, CAST(0.0 AS DOUBLE)) AS sum_value
          |FROM spine LEFT JOIN b ON spine.s = b.h ORDER BY bucket""".stripMargin,

      "q107_audience_overlap" ->
        """WITH a AS (SELECT DISTINCT user_id AS k, event_type AS i FROM events
          |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
          |sz AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM a GROUP BY 1),
          |p AS (SELECT l.i AS item_a, r.i AS item_b, CAST(count(*) AS BIGINT) AS n_keys
          |      FROM a l JOIN a r ON l.k = r.k AND l.i < r.i GROUP BY 1, 2)
          |SELECT p.item_a, p.item_b, p.n_keys, sa.n AS n_a, sb.n AS n_b,
          |  round(CAST(p.n_keys AS DOUBLE) / (sa.n + sb.n - p.n_keys), 6) AS jaccard
          |FROM p JOIN sz sa ON sa.i = p.item_a JOIN sz sb ON sb.i = p.item_b
          |ORDER BY item_a, item_b""".stripMargin,

      "q106_multimodal_audio" ->
        s"""SELECT doc_id, CAST(44 AS BIGINT) AS n_bytes,
           |  CAST(1 + ((${hd(3)} * 16 + ${hd(4)}) % 2) AS INT) AS channels,
           |  CAST(CASE ((${hd(1)} * 16 + ${hd(2)}) % 4)
           |    WHEN 0 THEN 8000 WHEN 1 THEN 16000
           |    WHEN 2 THEN 32000 ELSE 48000 END AS INT) AS sample_rate,
           |  CAST(500 + ((${hd(5)} * 16 + ${hd(6)}) * 256 + (${hd(7)} * 16 + ${hd(8)})) % 60000 AS BIGINT) AS duration_ms
           |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,

      "q108_multimodal_video" ->
        s"""SELECT doc_id, CAST(232 AS BIGINT) AS n_bytes,
           |  CAST(160 + ((${hd(1)} * 16 + ${hd(2)}) * 256 + (${hd(3)} * 16 + ${hd(4)})) % 3681 AS INT) AS width,
           |  CAST(90 + ((${hd(5)} * 16 + ${hd(6)}) * 256 + (${hd(7)} * 16 + ${hd(8)})) % 2071 AS INT) AS height,
           |  CAST(1000 + ((${hd(9)} * 16 + ${hd(10)}) * 65536 + (${hd(11)} * 16 + ${hd(12)}) * 256 + (${hd(13)} * 16 + ${hd(14)})) % 600000 AS BIGINT) AS duration_ms
           |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,

      "q109_image_histogram" ->
        s"""WITH d AS (SELECT doc_id,
           |    CAST(8 + (${hd(1)} * 16 + ${hd(2)}) % 16 AS INT) AS w,
           |    CAST(8 + (${hd(3)} * 16 + ${hd(4)}) % 16 AS INT) AS h,
           |    CAST(${hd(5)} * 16 + ${hd(6)} AS INT) AS s0,
           |    CAST(1 + (${hd(7)} * 16 + ${hd(8)}) % 255 AS INT) AS s1
           |  FROM documents WHERE text IS NOT NULL),
           |px AS (SELECT doc_id, w * h AS npx, s0, s1,
           |    unnest(generate_series(0, w * h - 1)) AS i FROM d),
           |pc AS (SELECT doc_id, ((s0 + i * s1) % 256) // 16 AS bucket,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM px GROUP BY 1, 2),
           |b AS (SELECT doc_id, w * h AS npx,
           |    unnest(generate_series(0, 15)) AS bucket FROM d)
           |SELECT b.doc_id, CAST(b.bucket AS INT) AS bucket,
           |  round(CAST(coalesce(pc.c, 0) AS DOUBLE) / b.npx, 6) AS frac
           |FROM b LEFT JOIN pc ON pc.doc_id = b.doc_id AND pc.bucket = b.bucket
           |ORDER BY 1, 2""".stripMargin,

      "q110_decontaminate_bloom" ->
        s"""WITH tfp AS (
           |  SELECT DISTINCT md5(array_to_string($toks, ' ')) AS fp
           |  FROM documents WHERE doc_id % 10 = 0 AND text IS NOT NULL)
           |SELECT doc_id, n_chars FROM documents
           |WHERE md5(array_to_string($toks, ' ')) IS NULL
           |   OR md5(array_to_string($toks, ' ')) NOT IN (SELECT fp FROM tfp)
           |ORDER BY doc_id""".stripMargin,

      "q111_bucketed_join" ->
        """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
          |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS total
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

      "q112_hyperplane_buckets" -> {
        // the same deterministic hyperplanes the Spark expression uses,
        // baked into the SQL as double literals; addition stays
        // left-associated in both engines, so the sign bits agree
        // bit-for-bit
        val bits = (0 until 6).map { b =>
          val terms = (0 until 64).map { j =>
            val h = graft.text.HashEmbeddings.component(s"$b#$j", 0, 42L)
            s"CAST(embedding[${j + 1}] AS DOUBLE) * (${h})"
          }.mkString(" + ")
          s"(CASE WHEN $terms >= 0 THEN '1' ELSE '0' END)"
        }.mkString(" || ")
        s"""SELECT ($bits) AS bucket, CAST(count(*) AS BIGINT) AS n
           |FROM embeddings WHERE embedding IS NOT NULL
           |GROUP BY 1 ORDER BY bucket""".stripMargin
      },

      "q113_interval_join" ->
        """SELECT l.event_id AS click_id, r.event_id AS purchase_id
          |FROM events l JOIN events r ON l.user_id = r.user_id
          |  AND l.event_type = 'click' AND r.event_type = 'purchase'
          |  AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
          |ORDER BY 1, 2""".stripMargin,

      "q114_pca_isometry" ->
        """WITH c AS (SELECT c_custkey AS id,
          |    CAST(c_acctbal AS DOUBLE) / 1000.0 AS a,
          |    CAST(c_custkey AS DOUBLE) / 10.0 AS b
          |  FROM customer WHERE c_custkey <= 50)
          |SELECT l.id AS id_a, r.id AS id_b,
          |  round(sqrt((l.a - r.a) * (l.a - r.a) + (l.b - r.b) * (l.b - r.b)), 4) AS dist
          |FROM c l JOIN c r ON l.id < r.id
          |ORDER BY 1, 2""".stripMargin,

      "q115_bm25_scores" -> {
        val terms = Seq("spark", "shuffle", "hash", "merge", "window")
        s"""WITH ${bm25CtesSql(terms)}
           |SELECT doc_id, round(${bm25TotalSql(terms)}, 6) AS bm25,
           |  CAST(count(*) AS BIGINT) AS n_terms
           |FROM contrib GROUP BY 1 ORDER BY doc_id""".stripMargin
      },

      // Conjunctive retrieval replay: the same BM25 contrib chain,
      // AND realized as n_terms = |terms|, global top-20 on the
      // rounded score with the id tie-break.
      "q202_conjunctive_search" -> {
        val terms = Q202Terms
        s"""WITH ${bm25CtesSql(terms)},
           |agg AS (SELECT doc_id AS id, round(${bm25TotalSql(terms)}, 6) AS bm25,
           |    count(*) AS n_terms FROM contrib GROUP BY 1),
           |conj AS (SELECT id, bm25 FROM agg WHERE n_terms = ${terms.size})
           |SELECT CAST(row_number() OVER (ORDER BY bm25 DESC, id ASC) AS INT)
           |    AS rank, id AS doc_id, bm25
           |FROM conj ORDER BY bm25 DESC, id ASC LIMIT 20""".stripMargin
      },

      // Phrase-search replay: per phrase, count window starts whose
      // fused token conjunction matches (overlaps count), hits only.
      "q203_phrase_search" -> {
        val branches = Q203Phrases.map { p =>
          val m = p.length
          val cond = p.zipWithIndex.map { case (w, i) =>
            s"t[j + $i] = '$w'" }.mkString(" AND ")
          s"""SELECT doc_id, '${p.mkString(" ")}' AS phrase,
             |  CAST(coalesce(list_sum(list_transform(
             |    range(1, CAST(len(t) AS INT) - $m + 2), j ->
             |      CASE WHEN $cond THEN 1 ELSE 0 END)), 0) AS BIGINT)
             |    AS n_occur FROM d""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH d AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents
           |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
           |pc AS ($branches)
           |SELECT doc_id, phrase, n_occur FROM pc WHERE n_occur > 0
           |ORDER BY doc_id, phrase""".stripMargin
      },

      "q116_hard_negatives" ->
        """WITH lab AS (SELECT e.vec_id, e.embedding, d.lang
          |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id)
          |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim FROM (
          |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS sim,
          |    row_number() OVER (PARTITION BY q.vec_id
          |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id ASC) AS rank
          |  FROM (SELECT * FROM lab WHERE vec_id < 10) q
          |  JOIN lab c ON q.lang IS DISTINCT FROM c.lang)
          |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      "q117_token_budget" ->
        s"""WITH b AS (SELECT doc_id, source,
           |    CAST(len(${toksSql("text")}) AS BIGINT) AS n_tokens,
           |    md5('budget0' || CAST(doc_id AS VARCHAR)) AS sk
           |  FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL),
           |c AS (SELECT doc_id, source, n_tokens,
           |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY sk, doc_id
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM b)
           |SELECT doc_id, source, n_tokens, cum_tokens FROM c
           |WHERE cum_tokens - n_tokens < 2000 ORDER BY doc_id""".stripMargin,

      "q119_multimodal_flac" ->
        s"""SELECT doc_id, CAST(42 AS BIGINT) AS n_bytes,
           |  CAST(1 + ((${hd(3)} * 16 + ${hd(4)}) % 2) AS INT) AS channels,
           |  CAST(CASE ((${hd(1)} * 16 + ${hd(2)}) % 4)
           |    WHEN 0 THEN 8000 WHEN 1 THEN 16000
           |    WHEN 2 THEN 32000 ELSE 48000 END AS INT) AS sample_rate,
           |  CAST(500 + ((${hd(5)} * 16 + ${hd(6)}) * 256 + (${hd(7)} * 16 + ${hd(8)})) % 60000 AS BIGINT) AS duration_ms
           |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,

      "q121_url_parse" ->
        """WITH b AS (SELECT doc_id, md5(text) AS h,
          |    CASE (instr('0123456789abcdef', substr(md5(text), 13, 1)) - 1) % 4
          |      WHEN 0 THEN 'com' WHEN 1 THEN 'org' WHEN 2 THEN 'net'
          |      ELSE 'io' END AS tld,
          |    (instr('0123456789abcdef', substr(md5(text), 14, 1)) - 1) % 2 = 0 AS deep
          |  FROM documents WHERE text IS NOT NULL)
          |SELECT doc_id,
          |  'h' || substr(h, 1, 6) || '.' || tld AS host,
          |  tld,
          |  CASE WHEN deep THEN '/p' || substr(h, 7, 2) || '/q' || substr(h, 9, 2)
          |       ELSE '/p' || substr(h, 7, 2) END AS path,
          |  CAST(CASE WHEN deep THEN 2 ELSE 1 END AS INT) AS depth,
          |  'x=' || substr(h, 11, 2) AS query
          |FROM b ORDER BY doc_id""".stripMargin,

      "q122_asof_snapshot" ->
        """SELECT user_id, ts, event_id, event_type, value FROM (
          |  SELECT user_id, ts, event_id, event_type, value,
          |    row_number() OVER (PARTITION BY user_id
          |      ORDER BY ts DESC, event_id DESC) AS rn
          |  FROM events
          |  WHERE ts <= TIMESTAMP '2024-01-15 00:00:00' AND user_id IS NOT NULL)
          |WHERE rn = 1 ORDER BY user_id""".stripMargin,

      // Streaming admission replay: per-shard exact-sketch dedup (min
      // doc_id), band near-dup rejection vs the prior corpus, then
      // first-shard-wins sketch-equality suppression across shards —
      // the SQL twin of what the micro-batch run admits.
      "q123_streaming_admit" ->
        s"""WITH s AS (SELECT doc_id,
           |    CASE WHEN doc_id < 600 THEN 0 WHEN doc_id < 800 THEN 1
           |         ELSE 2 END AS batch,
           |    CAST(${simhashIntSql(toks, 64)} AS BIGINT) AS h
           |  FROM documents WHERE doc_id >= 400),
           |pd AS (SELECT batch, h, min(doc_id) AS doc_id
           |  FROM s GROUP BY 1, 2),
           |skp AS (SELECT doc_id AS id, CAST(${simhashIntSql(toks, 64)} AS BIGINT) AS h
           |  FROM documents WHERE doc_id < 400),
           |bp AS (SELECT id, h, b AS band, (h >> (b * 16)) & 65535 AS key
           |  FROM skp CROSS JOIN range(4) t(b)),
           |bi AS (SELECT doc_id, h, batch, b AS band, (h >> (b * 16)) & 65535 AS key
           |  FROM pd CROSS JOIN range(4) t(b)),
           |hit AS (SELECT DISTINCT l.doc_id FROM bi l JOIN bp r
           |  ON l.band = r.band AND l.key = r.key
           |  WHERE bit_count(xor(l.h, r.h)) <= 3),
           |surv AS (SELECT * FROM pd
           |  WHERE doc_id NOT IN (SELECT doc_id FROM hit)),
           |adm AS (SELECT t.* FROM surv t WHERE NOT EXISTS (
           |  SELECT 1 FROM surv e WHERE e.h = t.h AND e.batch < t.batch))
           |SELECT doc_id, CAST(batch AS INT) AS batch FROM adm
           |ORDER BY doc_id""".stripMargin,

      // Streaming PSI replay: baseline deciles + smoothed bin probs
      // from the pre-split week (q67's quantile_cont convention), then
      // per-day windows of the live weeks scored with the engine's
      // exact smoothing and Σ (p−q)·ln(p/q) formula over ALL 10 bins.
      // The sentinel that flushes the engine's watermark lives past
      // the horizon — its window never closes, so it has no twin here.
      "q133_streaming_psi" -> {
        val binExpr = (1 to 9).map(i =>
          s"CASE WHEN r.v >= c.q$i THEN 1 ELSE 0 END").mkString(" + ")
        s"""WITH r AS (SELECT ts, value AS v FROM events
           |           WHERE value IS NOT NULL),
           |base AS (SELECT ts, v FROM r
           |         WHERE ts < TIMESTAMP '2024-01-08 00:00:00'),
           |c AS (SELECT ${(1 to 9).map(i =>
                   s"quantile_cont(v, 0.$i) AS q$i").mkString(", ")}
           |      FROM base),
           |nb AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM base),
           |bc AS (SELECT $binExpr AS bin,
           |         CAST(count(*) AS DOUBLE) AS cnt
           |       FROM base r, c GROUP BY 1),
           |p AS (SELECT t.i AS bin,
           |        (coalesce(bc.cnt, 0) + 0.5) / (nb.n + 5.0) AS p
           |      FROM range(10) t(i)
           |      LEFT JOIN bc ON bc.bin = t.i CROSS JOIN nb),
           |live AS (SELECT date_trunc('day', r.ts) AS ws,
           |           $binExpr AS bin
           |         FROM r, c
           |         WHERE r.ts >= TIMESTAMP '2024-01-08 00:00:00'),
           |lc AS (SELECT ws, bin, CAST(count(*) AS DOUBLE) AS cnt
           |       FROM live GROUP BY 1, 2),
           |wn AS (SELECT ws, sum(cnt) AS n FROM lc GROUP BY ws),
           |sc AS (SELECT wn.ws, wn.n, p.p,
           |         (coalesce(lc.cnt, 0) + 0.5) / (wn.n + 5.0) AS q
           |       FROM wn CROSS JOIN p
           |       LEFT JOIN lc ON lc.ws = wn.ws AND lc.bin = p.bin)
           |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           |  CAST(n AS BIGINT) AS n,
           |  round(sum((p - q) * ln(p / q)), 6) AS psi
           |FROM sc GROUP BY ws, n ORDER BY window_start""".stripMargin
      },

      // Streaming near-dup replay (q123's tail without the prior-corpus
      // band stage): per-shard exact-sketch dedup (min doc_id wins),
      // then first-shard-wins sketch-equality suppression across shards.
      "q148_streaming_neardup" ->
        s"""WITH dup AS (SELECT * FROM ${withDupsSql("documents", "doc_id", 50, 10000)}
           |            WHERE text IS NOT NULL),
           |s AS (SELECT doc_id,
           |    CASE WHEN doc_id < 200 THEN 0 WHEN doc_id < 400 THEN 1
           |         ELSE 2 END AS batch,
           |    CAST(${simhashIntSql(toks, 64)} AS BIGINT) AS h
           |  FROM dup),
           |pd AS (SELECT batch, h, min(doc_id) AS doc_id
           |  FROM s GROUP BY 1, 2),
           |adm AS (SELECT t.* FROM pd t WHERE NOT EXISTS (
           |  SELECT 1 FROM pd e WHERE e.h = t.h AND e.batch < t.batch))
           |SELECT doc_id, CAST(batch AS INT) AS batch FROM adm
           |ORDER BY doc_id""".stripMargin,

      // Streaming value_counts replay: every real per-day window closes
      // under the sentinel-advanced watermark, so the emitted stream
      // must equal the batch GROUP BY day × event_type — the sentinel's
      // own window never closes and has no twin here.
      "q149_streaming_value_counts" ->
        """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
          |  event_type, CAST(count(*) AS BIGINT) AS cnt
          |FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      // MVN text-generator replay (deterministic mode): md5 Irwin-Hall
      // pseudo-normals, the inlined (mean, L) literals, then q35's
      // capped-vocab decode — per slot the best (cosine desc, word asc)
      // vocab word, md5 component embeddings replayed via hash31.
      "q150_mvn_text_decode" -> q150Sql,
      "q159_synthetic_deterministic" -> q159Sql,

      // q32 distributional verdict (r11 verdict #6): the seeded
      // production pipeline's validation readout must say every
      // generated orders column is within the spec-enforced moment
      // bands at exactly nSamples rows. The expected column/type set
      // is the strict-format detection of the orders table (pinned:
      // a detection change is a signal, not noise). The samplers
      // themselves stay non-SQL-expressible — the deterministic twin
      // q159 carries the value-level hash.
      "q32_synthetic_pipeline" ->
        """SELECT col_name, semantic_type,
          |  CAST(1000 AS BIGINT) AS n_rows, true AS within_band
          |FROM (VALUES
          |  ('o_custkey', 'integer'), ('o_orderdate', 'datetime'),
          |  ('o_orderkey', 'integer'), ('o_orderpriority', 'categorical'),
          |  ('o_orderstatus', 'categorical'), ('o_totalprice', 'float'))
          |  AS t(col_name, semantic_type)
          |ORDER BY col_name""".stripMargin,
      "q160_plot_svg" -> q160Sql,
      "q161_fasttext_classify" -> q161Sql,

      // KMV bottom-k replay: the global bottom-k of each column's
      // distinct md5 digests IS the merged sketch (the KMV merge
      // property), so rank-and-keep-k over the distinct digest set
      // reproduces n_kept, the kth hash, and the (k−1)/frac estimate
      // digit-for-digit.
      "q162_kmv_distinct" -> {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
        val src = cols.map(c =>
          s"SELECT '$c' AS col_name, md5(CAST($c AS VARCHAR)) AS h FROM lineitem WHERE $c IS NOT NULL")
          .mkString("\n  UNION ALL ")
        s"""WITH src AS ($src),
           |d AS (SELECT DISTINCT col_name, h FROM src),
           |r AS (SELECT col_name, h,
           |        row_number() OVER (PARTITION BY col_name ORDER BY h) AS rk FROM d),
           |kk AS (SELECT col_name, CAST(count(*) AS INT) AS n_kept, max(h) AS kth_hash
           |       FROM r WHERE rk <= 256 GROUP BY 1)
           |SELECT col_name, CAST(256 AS INT) AS k, n_kept, kth_hash,
           |  round(CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
           |             ELSE 255.0 / ${Sketch.kmvFracSql("kth_hash")} END, 6) AS est
           |FROM kk ORDER BY col_name""".stripMargin
      },

      // Count–min replay: each depth row's bucket is the 28-bit md5
      // prefix of the salted item mod width, decoded positionally.
      "q163_countmin_sketch" -> {
        val rows = (0 until 4).map(r =>
          s"SELECT $r AS r, ${Sketch.cmBucketSql("item", r, 64, "cm")} AS b FROM toks")
          .mkString("\n  UNION ALL ")
        s"""WITH toks AS (SELECT unnest(${toksSql("text")}) AS item
           |  FROM documents WHERE text IS NOT NULL),
           |e AS ($rows)
           |SELECT CAST(r AS INT) AS r, b, CAST(count(*) AS BIGINT) AS cnt
           |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      },

      // CM point-estimate replay: min over depth rows of the bucket
      // counters for the exact top-20 tokens; overcount = est − truth.
      "q164_countmin_estimate" -> {
        val rows = (0 until 4).map(r =>
          s"SELECT $r AS r, ${Sketch.cmBucketSql("item", r, 64, "cm")} AS b FROM toks")
          .mkString("\n  UNION ALL ")
        val probe = (0 until 4).map(r =>
          s"SELECT item, true_cnt, $r AS r, ${Sketch.cmBucketSql("item", r, 64, "cm")} AS b FROM truth")
          .mkString("\n  UNION ALL ")
        s"""WITH toks AS (SELECT unnest(${toksSql("text")}) AS item
           |  FROM documents WHERE text IS NOT NULL),
           |sk AS (SELECT r, b, CAST(count(*) AS BIGINT) AS cnt
           |       FROM ($rows) GROUP BY 1, 2),
           |truth AS (SELECT item, CAST(count(*) AS BIGINT) AS true_cnt FROM toks
           |          GROUP BY 1 ORDER BY true_cnt DESC, item ASC LIMIT 20),
           |pr AS ($probe),
           |est AS (SELECT item, min(coalesce(cnt, 0)) AS est
           |        FROM pr LEFT JOIN sk USING (r, b) GROUP BY 1)
           |SELECT t.item, t.true_cnt, e.est, e.est - t.true_cnt AS overcount
           |FROM truth t JOIN est e USING (item) ORDER BY item""".stripMargin
      },

      // RRF replay: the two rankers' global ranks (row_number by score
      // desc, id asc — the same tie-break as the engine), top-50 each,
      // fused as coalesce(1/(60+r_bm25),0) + coalesce(1/(60+r_cos),0)
      // in that fixed order.
      "q165_rrf_hybrid" -> {
        val terms = Seq("spark", "shuffle", "hash", "merge", "window")
        val k1 = 1.2; val b = 0.75
        val inL = terms.map(t => s"'$t'").mkString(", ")
        val total = terms.map(t =>
          s"coalesce(max(CASE WHEN term = '$t' THEN c END), 0.0)").mkString(" + ")
        s"""WITH base AS (SELECT doc_id, ${toksSql("text")} AS w FROM documents),
           |lens AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM base),
           |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |    avg(CAST(dl AS DOUBLE)) AS avgdl FROM lens),
           |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           |  FROM (SELECT doc_id, unnest(w) AS term FROM base)
           |  WHERE term IN ($inL) GROUP BY 1, 2),
           |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
           |contrib AS (SELECT doc_id, term,
           |    ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) *
           |      (tf * ${k1 + 1.0}) /
           |      (tf + $k1 * (${1.0 - b} + $b * CAST(dl AS DOUBLE) / avgdl)) AS c
           |  FROM tf JOIN dfq USING (term) JOIN lens USING (doc_id)
           |  CROSS JOIN stats),
           |bm AS (SELECT doc_id AS id, round($total, 6) AS score
           |       FROM contrib GROUP BY 1),
           |bmr AS (SELECT id, row_number() OVER (ORDER BY score DESC, id ASC) AS r FROM bm),
           |bmc AS (SELECT id, 1.0 / (60.0 + CAST(r AS DOUBLE)) AS c0 FROM bmr WHERE r <= 50),
           |dn AS (SELECT e.vec_id AS id,
           |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) AS s
           |  FROM embeddings e
           |  CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q),
           |dnr AS (SELECT id, row_number() OVER (ORDER BY s DESC, id ASC) AS r FROM dn),
           |dnc AS (SELECT id, 1.0 / (60.0 + CAST(r AS DOUBLE)) AS c1 FROM dnr WHERE r <= 50)
           |SELECT coalesce(b.id, d.id) AS doc_id,
           |  round(coalesce(b.c0, 0.0) + coalesce(d.c1, 0.0), 6) AS rrf,
           |  CAST((CASE WHEN b.c0 IS NOT NULL THEN 1 ELSE 0 END) +
           |       (CASE WHEN d.c1 IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS n_rankers
           |FROM bmc b FULL OUTER JOIN dnc d ON b.id = d.id
           |ORDER BY rrf DESC, doc_id ASC""".stripMargin
      },

      // Chunk-dedup-rewrite replay: same ⌈len/12⌉ non-overlapping
      // chunking as q55's passage form, first (doc, idx) occurrence
      // per fingerprint wins, survivors re-joined in position order.
      "q166_chunk_dedup" ->
        s"""WITH dup AS (SELECT * FROM ${withDupsSql("documents", "doc_id", 50, 10000)}),
           |base AS (SELECT doc_id, ${toksSql("text")} AS w FROM dup WHERE doc_id IS NOT NULL),
           |ch AS (SELECT doc_id, i AS idx,
           |    array_to_string(w[i*12+1 : i*12+12], ' ') AS chunk
           |  FROM (SELECT doc_id, w,
           |          unnest(range(((len(w) - 1) // 12) + 1)) AS i
           |        FROM base WHERE len(w) > 0)),
           |k AS (SELECT doc_id, idx, chunk,
           |    row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, idx) AS rn
           |  FROM ch),
           |per AS (SELECT doc_id,
           |    CAST(count(*) AS BIGINT) AS n_chunks,
           |    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |    string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY idx) AS text_clean
           |  FROM k GROUP BY 1)
           |SELECT d.doc_id,
           |  CAST(coalesce(p.n_chunks, 0) AS BIGINT) AS n_chunks,
           |  CAST(coalesce(p.n_kept, 0) AS BIGINT) AS n_kept,
           |  coalesce(p.text_clean, '') AS text_clean
           |FROM (SELECT DISTINCT doc_id FROM dup WHERE doc_id IS NOT NULL) d
           |LEFT JOIN per p USING (doc_id)
           |ORDER BY doc_id""".stripMargin,

      // Bigram-LM replay: q56's ladder one Markov order up — bigram
      // counts from the even-id half, context counts derived from
      // them, V = train unigram vocab, add-one smoothing.
      "q167_bigram_logprob" -> {
        val toks = toksSql("text")
        val bgs = s"unnest(list_transform(range(len(w) - 1), i -> w[i+1] || ' ' || w[i+2]))"
        s"""WITH base AS (SELECT doc_id, $toks AS w FROM documents WHERE doc_id IS NOT NULL),
           |bc AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12 FROM (
           |    SELECT $bgs AS bg FROM base WHERE doc_id % 2 = 0 AND len(w) >= 2)
           |  GROUP BY 1),
           |cx AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(c12) AS BIGINT) AS c1
           |       FROM bc GROUP BY 1),
           |vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
           |       FROM (SELECT unnest(w) AS tok FROM base WHERE doc_id % 2 = 0)),
           |tf AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS tf FROM (
           |    SELECT doc_id, $bgs AS bg FROM base WHERE len(w) >= 2)
           |  GROUP BY 1, 2),
           |sc AS (SELECT t.doc_id,
           |    CAST(sum(t.tf) AS BIGINT) AS n_bigrams,
           |    sum(CAST(t.tf AS DOUBLE) *
           |        ln(CAST(coalesce(b.c12, 0) + 1 AS DOUBLE) /
           |           CAST(coalesce(x.c1, 0) + v.v AS DOUBLE)))
           |      / CAST(sum(t.tf) AS DOUBLE) AS avg_logp
           |  FROM tf t LEFT JOIN bc b USING (bg)
           |  LEFT JOIN cx x ON x.w1 = split_part(t.bg, ' ', 1)
           |  CROSS JOIN vv v GROUP BY 1)
           |SELECT d.doc_id,
           |  CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           |  round(coalesce(sc.avg_logp, 0.0), 6) AS avg_logp
           |FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id IS NOT NULL) d
           |LEFT JOIN sc USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      },

      // HLL replay: bucket/rank from positional md5 decode, register
      // maxes, the exact-integer Z accumulator, and both estimator
      // regimes (raw α·m²/Z and linear counting) re-derived in SQL.
      "q169_hll_distinct" -> {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
        val src = cols.map(c =>
          s"SELECT '$c' AS col_name, md5(CAST($c AS VARCHAR)) AS h FROM lineitem WHERE $c IS NOT NULL")
          .mkString("\n  UNION ALL ")
        val twoTo49 = s"(CAST(1 AS BIGINT) << 49)"
        s"""WITH src AS ($src),
           |reg AS (SELECT col_name,
           |    CAST(${Sketch.hexIntSql("h", 1, 2)} AS INT) AS bucket,
           |    ${Sketch.hexIntSql("h", 3, 12)} AS w
           |  FROM src),
           |mr AS (SELECT col_name, bucket,
           |    max(49 - length(ltrim(bin(w), '0'))) AS mrank
           |  FROM reg GROUP BY 1, 2),
           |sm AS (SELECT col_name, CAST(count(*) AS INT) AS n_buckets,
           |    CAST(max(mrank) AS INT) AS max_rank,
           |    sum(CAST(1 AS BIGINT) << CAST(49 - mrank AS INT)) AS s_present
           |  FROM mr GROUP BY 1),
           |est AS (SELECT *,
           |    (${Sketch.hllAlphaM2Literal} * CAST($twoTo49 AS DOUBLE)) /
           |      CAST(s_present + (256 - CAST(n_buckets AS BIGINT)) * $twoTo49 AS DOUBLE) AS raw
           |  FROM sm)
           |SELECT col_name, CAST(256 AS INT) AS m, n_buckets, max_rank,
           |  round(CASE WHEN raw <= 640.0 AND (256 - n_buckets) > 0
           |    THEN 256.0 * ln(256.0 / CAST(256 - n_buckets AS DOUBLE))
           |    ELSE raw END, 6) AS est
           |FROM est ORDER BY col_name""".stripMargin
      },

      // Char-entropy replay: same sorted-distinct left fold — the
      // engine's (0+t1)+t2+… and the oracle's first-element fold agree
      // bit-for-bit because 0.0 + x = x exactly.
      "q170_char_entropy" ->
        """WITH base AS (SELECT doc_id, coalesce(text, '') AS t
          |  FROM documents WHERE doc_id IS NOT NULL),
          |c AS (SELECT doc_id, len(t) AS n,
          |    list_transform(range(1, len(t) + 1), i -> substr(t, i, 1)) AS chars
          |  FROM base)
          |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
          |  round(CASE WHEN n > 0 THEN 0.0 - list_reduce(
          |      list_transform(list_sort(list_distinct(chars)),
          |        d -> (CAST(len(list_filter(chars, x -> x = d)) AS DOUBLE) / CAST(n AS DOUBLE)) *
          |             ln(CAST(len(list_filter(chars, x -> x = d)) AS DOUBLE) / CAST(n AS DOUBLE))),
          |      (a, b) -> a + b)
          |    ELSE 0.0 END, 6) AS entropy
          |FROM c ORDER BY doc_id""".stripMargin,

      // Grouped-HLL replay: q169's ladder keyed on the group column.
      "q172_hll_by_group" ->
        s"""WITH src AS (SELECT event_type AS g, md5(CAST(user_id AS VARCHAR)) AS h
           |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
           |$hllSqlTail
           |SELECT g AS event_type, m, n_buckets, max_rank, est
           |FROM fin ORDER BY 1""".stripMargin,

      // KMV set-operation replay: per-set distinct-digest bottom-k,
      // merged bottom-k, membership flags, and the three estimators
      // from the identical unrounded expressions.
      "q173_kmv_jaccard" -> {
        val frac = Sketch.kmvFracSql("kth_hash")
        s"""WITH base AS (SELECT doc_id, unnest(${toksSql("text")}) AS tok
           |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
           |ha AS (SELECT h FROM (SELECT DISTINCT md5(tok) AS h FROM base WHERE doc_id % 2 = 0)
           |       ORDER BY h LIMIT 256),
           |hb AS (SELECT h FROM (SELECT DISTINCT md5(tok) AS h FROM base WHERE doc_id % 2 = 1)
           |       ORDER BY h LIMIT 256),
           |u AS (SELECT h FROM (SELECT DISTINCT h FROM
           |        (SELECT h FROM ha UNION ALL SELECT h FROM hb))
           |      ORDER BY h LIMIT 256),
           |ag AS (SELECT CAST(count(*) AS INT) AS n_kept, max(u.h) AS kth_hash,
           |    CAST(sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
           |             THEN 1 ELSE 0 END) AS BIGINT) AS n_common
           |  FROM u LEFT JOIN ha a ON u.h = a.h LEFT JOIN hb b ON u.h = b.h)
           |SELECT CAST(256 AS INT) AS k, n_kept, kth_hash,
           |  round(CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
           |        ELSE 255.0 / $frac END, 6) AS d_union_est,
           |  n_common,
           |  round(CAST(n_common AS DOUBLE) / CAST(n_kept AS DOUBLE), 6) AS jaccard_est,
           |  round((CAST(n_common AS DOUBLE) / CAST(n_kept AS DOUBLE)) *
           |        (CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
           |         ELSE 255.0 / $frac END), 6) AS d_intersect_est
           |FROM ag""".stripMargin
      },

      // Streaming-HLL replay: the max-merge of per-trigger register
      // updates IS the batch register table (HLL union), so the batch
      // sketch of the whole stream is the oracle.
      "q174_streaming_hll" ->
        s"""WITH src AS (SELECT 0 AS g, md5(CAST(user_id AS VARCHAR)) AS h
           |  FROM events WHERE user_id IS NOT NULL),
           |$hllSqlTail
           |SELECT m, n_buckets, max_rank, est FROM fin""".stripMargin,

      // MAD replay: identical rank-picked lower medians (integer floor
      // division both sides), |x−med| deviations, k·MAD fence.
      "q177_mad_outliers" ->
        """WITH b AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
          |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
          |c AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rk,
          |    count(*) OVER (PARTITION BY g) AS n FROM b),
          |med AS (SELECT g, v AS med FROM c WHERE rk = (n + 1) // 2),
          |dev AS (SELECT b.g, b.v, abs(b.v - med.med) AS d, med.med
          |  FROM b JOIN med ON b.g = med.g),
          |dc AS (SELECT g, d, row_number() OVER (PARTITION BY g ORDER BY d) AS rk,
          |    count(*) OVER (PARTITION BY g) AS n FROM dev),
          |mad AS (SELECT g, d AS mad FROM dc WHERE rk = (n + 1) // 2)
          |SELECT dev.g AS event_type, CAST(count(*) AS BIGINT) AS n,
          |  round(max(dev.med), 6) AS median, round(max(mad.mad), 6) AS mad,
          |  CAST(sum(CASE WHEN dev.d > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_outliers,
          |  round(CAST(sum(CASE WHEN dev.d > 3.0 * mad.mad THEN 1 ELSE 0 END) AS DOUBLE)
          |    / CAST(count(*) AS DOUBLE), 6) AS outlier_frac
          |FROM dev JOIN mad ON dev.g = mad.g
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      // Domain-cap replay: same md5-derived host pieces; the
      // registrable domain is dlabel.suffix by construction (the
      // subdomain never survives extraction), so the oracle ranks
      // directly on it.
      "q178_domain_cap" ->
        s"""WITH b AS (SELECT doc_id, n_chars,
           |    'd' || substr(md5(text), 1, 1) ||  '.' ||
           |    CASE ${hd(2)} % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
           |      WHEN 2 THEN 'co.uk' ELSE 'com.au' END AS domain
           |  FROM documents WHERE text IS NOT NULL),
           |r AS (SELECT doc_id AS id, domain, n_chars AS score,
           |    CAST(row_number() OVER (PARTITION BY domain
           |      ORDER BY n_chars DESC, doc_id) AS INT) AS rnk
           |  FROM b)
           |SELECT id, domain, score, rnk FROM r WHERE rnk <= 4
           |ORDER BY domain, rnk""".stripMargin,

      // NFC-clean replay: identical raw construction (chr() for the
      // control char and combining marks), then utf8proc
      // nfc_normalize + the same strip/collapse/trim regex ladder.
      "q179_nfc_clean" -> {
        val clean = "trim(regexp_replace(regexp_replace(nfc_normalize(raw), " +
          "'[\\x00-\\x08\\x0B-\\x1F\\x7F]', '', 'g'), '[ \\t]+', ' ', 'g'))"
        s"""WITH r AS (SELECT doc_id,
           |    substr(text, 1, 12) || chr(7) || ' ' ||
           |    CASE ${hd(4)} % 3 WHEN 0 THEN 'a' WHEN 1 THEN 'e'
           |      ELSE 'o' END ||
           |    CASE ${hd(5)} % 3 WHEN 0 THEN chr(769) WHEN 1 THEN chr(768)
           |      ELSE chr(776) END ||
           |    chr(9) || ' x' || chr(13) || '  tail ' AS raw
           |  FROM documents WHERE text IS NOT NULL)
           |SELECT doc_id, CAST(length(raw) AS INT) AS n_raw,
           |  $clean AS cleaned, CAST(length($clean) AS INT) AS n_clean
           |FROM r ORDER BY doc_id""".stripMargin
      },

      // Soft-dedup replay: cluster key is the token-normalized
      // 8-char truncation (the fingerprint preimage); weight is the
      // exact 1/count division.
      "q180_soft_dedup" ->
        s"""WITH b AS (SELECT doc_id AS id,
           |    array_to_string(${toksSql("substr(text, 1, 8)")}, ' ') AS k
           |  FROM documents WHERE text IS NOT NULL)
           |SELECT id, count(*) OVER (PARTITION BY k) AS dup_count,
           |  CAST(1.0 AS DOUBLE) / count(*) OVER (PARTITION BY k) AS weight
           |FROM b ORDER BY id""".stripMargin,

      // FIM replay: 16-bit md5 gate on (seed,id), 48-bit cut draws
      // from the text digest mod (len+1), identical substr arithmetic
      // and PSM sentinel layout.
      "q181_fim_split" -> {
        val gate = graft.ops.Sketch.hexIntSql(
          "md5('fim0' || CAST(doc_id AS VARCHAR))", 1, 4)
        val a = graft.ops.Sketch.hexIntSql("md5(text)", 1, 12)
        val b = graft.ops.Sketch.hexIntSql("md5(text)", 13, 12)
        s"""WITH r AS (SELECT doc_id, text, length(text) AS len,
           |    $gate < 32768 AS is_fim,
           |    least($a % (length(text) + 1), $b % (length(text) + 1)) AS i,
           |    greatest($a % (length(text) + 1), $b % (length(text) + 1)) AS j
           |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL)
           |SELECT doc_id AS id, is_fim,
           |  CASE WHEN is_fim THEN i END AS cut_i,
           |  CASE WHEN is_fim THEN j END AS cut_j,
           |  CASE WHEN is_fim THEN
           |    '<PRE>' || substr(text, 1, i) || '<SUF>' ||
           |    substr(text, j + 1, len - j) || '<MID>' ||
           |    substr(text, i + 1, j - i)
           |  ELSE text END AS out
           |FROM r ORDER BY id""".stripMargin
      },

      // Histogram-sketch replay: same two-pass frame, the identical
      // divide-then-scale bin expression, RANGE cumulative sum over
      // unique bins, and the pinned interpolation order.
      "q182_hist_quantiles" ->
        """WITH x AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
          |    FROM lineitem WHERE l_extendedprice IS NOT NULL
          |      AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
          |f AS (SELECT min(x) AS lo, max(x) AS hi, count(*) AS n FROM x),
          |b AS (SELECT CASE WHEN hi = lo THEN 0
          |      ELSE least(greatest(CAST(floor((x - lo) / (hi - lo) * 256)
          |        AS BIGINT), 0), 255) END AS bin
          |    FROM x, f),
          |c AS (SELECT bin, count(*) AS cnt FROM b GROUP BY bin),
          |cc AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum FROM c),
          |qs AS (SELECT unnest([CAST(0.01 AS DOUBLE), CAST(0.25 AS DOUBLE),
          |    CAST(0.5 AS DOUBLE), CAST(0.75 AS DOUBLE),
          |    CAST(0.99 AS DOUBLE)]) AS q),
          |t AS (SELECT q, n, lo, hi,
          |    greatest(CAST(ceil(q * n) AS BIGINT), 1) AS target_rank
          |  FROM qs, f),
          |pick AS (SELECT t.q, t.n, t.lo, t.hi, t.target_rank,
          |    min(cc.bin) AS bin
          |  FROM t JOIN cc ON cc.cum >= t.target_rank
          |  GROUP BY 1, 2, 3, 4, 5)
          |SELECT p.q, p.n, p.target_rank, p.bin,
          |  p.lo + (p.bin + CAST(p.target_rank - (cc.cum - cc.cnt) AS DOUBLE)
          |    / cc.cnt) * ((p.hi - p.lo) / 256) AS est
          |FROM pick p JOIN cc ON cc.bin = p.bin
          |ORDER BY p.q""".stripMargin,

      // Per-group histogram-quantile replay: q182's ladder with the
      // group key threaded through frame, bins, cumulative window,
      // and pick — same bin formula, same interpolation.
      "q209_hist_quantiles_by" ->
        """WITH x AS (SELECT l_returnflag AS g,
          |    CAST(l_extendedprice AS DOUBLE) AS x
          |    FROM lineitem WHERE l_returnflag IS NOT NULL
          |      AND l_extendedprice IS NOT NULL
          |      AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
          |f AS (SELECT g, min(x) AS lo, max(x) AS hi, count(*) AS n
          |    FROM x GROUP BY g),
          |b AS (SELECT x.g, CASE WHEN f.hi = f.lo THEN 0
          |      ELSE least(greatest(CAST(floor((x.x - f.lo) / (f.hi - f.lo) * 64)
          |        AS BIGINT), 0), 63) END AS bin
          |    FROM x JOIN f ON x.g = f.g),
          |c AS (SELECT g, bin, count(*) AS cnt FROM b GROUP BY g, bin),
          |cc AS (SELECT g, bin, cnt,
          |    sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum FROM c),
          |qs AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
          |    CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q),
          |t AS (SELECT f.g, q, n, lo, hi,
          |    greatest(CAST(ceil(q * n) AS BIGINT), 1) AS target_rank
          |  FROM qs, f),
          |pick AS (SELECT t.g, t.q, t.n, t.lo, t.hi, t.target_rank,
          |    min(cc.bin) AS bin
          |  FROM t JOIN cc ON cc.g = t.g AND cc.cum >= t.target_rank
          |  GROUP BY 1, 2, 3, 4, 5, 6)
          |SELECT p.g AS l_returnflag, p.q, p.n, p.target_rank, p.bin,
          |  p.lo + (p.bin + CAST(p.target_rank - (cc.cum - cc.cnt) AS DOUBLE)
          |    / cc.cnt) * ((p.hi - p.lo) / 64) AS est
          |FROM pick p JOIN cc ON cc.g = p.g AND cc.bin = p.bin
          |ORDER BY l_returnflag, p.q""".stripMargin,

      // Retrieval-metrics replay: exact truth (brute-force CTE) +
      // the q30 IVF chain, then the same left join, sorted-hit-list
      // DCG fold (list_reduce starts at the first gain — equal to
      // the 0.0-seeded left fold because 0.0 + x = x), and exact
      // recall/MRR divisions.
      "q183_retrieval_metrics" -> {
        val gainFold = (l: String) =>
          s"CASE WHEN coalesce(len($l), 0) = 0 THEN 0.0 ELSE list_reduce(" +
            s"list_transform($l, r -> ln(2) / ln(r + 1.0)), (a, x) -> a + x) END"
        s"""WITH corpus AS (SELECT * FROM embeddings WHERE vec_id >= 5),
           |q AS (SELECT * FROM embeddings WHERE vec_id < 5),
           |tr AS (SELECT query_id, neighbor_id, rank AS t_rank FROM (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    row_number() OVER (PARTITION BY q.vec_id
           |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
           |        CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id ASC) AS rank
           |  FROM q CROSS JOIN corpus c) WHERE rank <= 10),
           |cent AS (SELECT vec_id AS centroid_id, embedding AS cv
           |  FROM corpus ORDER BY vec_id LIMIT 16),
           |assigned AS (
           |  SELECT vec_id AS id, centroid_id, embedding AS vec FROM (
           |    SELECT c.vec_id, ct.centroid_id, c.embedding,
           |      row_number() OVER (PARTITION BY c.vec_id
           |        ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
           |          CAST(ct.cv AS DOUBLE[])) DESC, ct.centroid_id ASC) AS rn
           |    FROM corpus c CROSS JOIN cent ct)
           |  WHERE rn = 1),
           |probes AS (
           |  SELECT vec_id AS query_id, embedding AS qv, centroid_id FROM (
           |    SELECT q.vec_id, q.embedding, ct.centroid_id,
           |      row_number() OVER (PARTITION BY q.vec_id
           |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
           |          CAST(ct.cv AS DOUBLE[])) DESC, ct.centroid_id ASC) AS rn
           |    FROM q CROSS JOIN cent ct)
           |  WHERE rn <= 4),
           |re AS (SELECT query_id, neighbor_id, rank AS r_rank FROM (
           |  SELECT p.query_id, a.id AS neighbor_id,
           |    row_number() OVER (PARTITION BY p.query_id
           |      ORDER BY list_cosine_similarity(CAST(p.qv AS DOUBLE[]),
           |        CAST(a.vec AS DOUBLE[])) DESC, a.id ASC) AS rank
           |  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id)
           |  WHERE rank <= 10),
           |nt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth
           |  FROM tr GROUP BY 1),
           |j AS (SELECT re.query_id, re.r_rank, tr.t_rank
           |  FROM re LEFT JOIN tr ON re.query_id = tr.query_id
           |    AND re.neighbor_id = tr.neighbor_id),
           |pq AS (SELECT query_id,
           |    CAST(sum(CASE WHEN t_rank IS NOT NULL THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_hits,
           |    min(CASE WHEN t_rank IS NOT NULL THEN r_rank END) AS first_hit,
           |    list_sort(list(r_rank) FILTER (WHERE t_rank IS NOT NULL))
           |      AS hit_ranks
           |  FROM j GROUP BY 1)
           |SELECT p.query_id, nt.n_truth, p.n_hits,
           |  round(CAST(p.n_hits AS DOUBLE) / nt.n_truth, 6) AS recall,
           |  round(coalesce(CAST(1.0 AS DOUBLE) / p.first_hit, 0.0), 6) AS mrr,
           |  round(${gainFold("p.hit_ranks")}, 6) AS dcg,
           |  round(${gainFold("p.hit_ranks")} /
           |    ${gainFold("range(1, least(nt.n_truth, 10) + 1)")}, 6) AS ndcg
           |FROM pq p JOIN nt ON p.query_id = nt.query_id
           |ORDER BY p.query_id""".stripMargin
      },

      // Fertility replay: the 10-stage BPE CTE chain (shared with
      // q155/q156/q158), piece counts from the final segmentation,
      // integer sums, two exact final divisions.
      "q184_bpe_fertility" ->
        s"""WITH ${bpeStagesSql(10)},
           |enc AS (SELECT w,
           |    CAST(len(string_split(trim(st, '><'), '><')) AS BIGINT)
           |      AS n_pieces
           |  FROM v10),
           |gw AS (SELECT lang AS g, tok AS w, CAST(count(*) AS BIGINT) AS cnt
           |  FROM (SELECT lang, unnest(${toksSql("text")}) AS tok
           |        FROM documents WHERE lang IS NOT NULL)
           |  GROUP BY 1, 2),
           |ag AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_words,
           |    CAST(sum(cnt * n_pieces) AS BIGINT) AS n_pieces,
           |    CAST(sum(cnt * length(w)) AS BIGINT) AS n_chars
           |  FROM gw JOIN enc USING (w) GROUP BY 1)
           |SELECT g AS lang, n_words, n_pieces,
           |  round(CAST(n_pieces AS DOUBLE) / n_words, 6) AS pieces_per_word,
           |  round(CAST(n_chars AS DOUBLE) / n_pieces, 6) AS chars_per_piece
           |FROM ag ORDER BY lang""".stripMargin,

      // Whitening replay: exact decimal moment sums, the pinned
      // covariance/Cholesky/substitution association order, lateral
      // aliases carrying each L entry and y component.
      "q185_whiten_embeddings" -> {
        val d = 4
        val xs = (0 until d).map(i =>
          s"CAST(embedding[${i + 1}] AS DOUBLE) AS x$i").mkString(", ")
        val s1 = (0 until d).map(i =>
          s"sum(CAST(x$i AS DECIMAL(38,12))) AS s1_$i").mkString(", ")
        val s2 = (for { i <- 0 until d; j <- i until d } yield
          s"sum(CAST(x$i * x$j AS DECIMAL(38,12))) AS s2_${i}_$j")
          .mkString(", ")
        val ms = (0 until d).map(i =>
          s"CAST(s1_$i AS DOUBLE) / n AS m$i").mkString(", ")
        def cN(i: Int, j: Int) = if (i <= j) s"c_${i}_$j" else s"c_${j}_$i"
        val cs = (for { i <- 0 until d; j <- i until d } yield
          s"(CAST(s2_${i}_$j AS DOUBLE) - CAST(s1_$i AS DOUBLE) * " +
            s"CAST(s1_$j AS DOUBLE) / n) / (n - 1) AS c_${i}_$j")
          .mkString(", ")
        val ls = (for { i <- 0 until d; j <- 0 to i } yield {
          val acc = new StringBuilder(cN(i, j))
          for (k <- 0 until j) acc.insert(0, "(").append(
            s" - l_${i}_$k * l_${j}_$k)")
          val e = if (i == j) s"sqrt($acc)" else s"$acc / l_${j}_$j"
          s"$e AS l_${i}_$j"
        }).mkString(", ")
        val ys = (0 until d).map { i =>
          val acc = new StringBuilder(s"(x$i - m$i)")
          for (k <- 0 until i) acc.insert(0, "(").append(
            s" - l_${i}_$k * yy$k)")
          s"$acc / l_${i}_$i AS yy$i"
        }.mkString(", ")
        s"""WITH x AS (SELECT vec_id AS id, $xs
           |  FROM embeddings
           |  WHERE embedding IS NOT NULL AND len(embedding) >= $d),
           |s AS (SELECT CAST(count(*) AS BIGINT) AS n, $s1, $s2 FROM x),
           |c AS (SELECT n, $ms, $cs FROM s),
           |l AS (SELECT *, $ls FROM c),
           |y AS (SELECT id, $ys FROM x, l)
           |SELECT id AS vec_id,
           |  ${(0 until d).map(i => s"round(yy$i, 6) AS y${i + 1}")
                .mkString(", ")}
           |FROM y ORDER BY vec_id""".stripMargin
      },

      // Epochs replay: the q87 temperature-share chain, shares
      // entering the budget arithmetic ROUNDED exactly as the engine
      // emits them.
      "q186_token_epochs" ->
        """WITH g AS (SELECT lang AS domain, CAST(count(*) AS BIGINT) AS n_docs,
          |             CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS tokens
          |           FROM documents WHERE lang IS NOT NULL GROUP BY 1),
          |t AS (SELECT coalesce(sum(pow(CAST(tokens AS DOUBLE), 0.5)), 0.0) AS z
          |      FROM g),
          |r AS (SELECT g.domain, g.tokens,
          |        round(CASE WHEN z > 0
          |          THEN pow(CAST(tokens AS DOUBLE), 0.5) / z
          |          ELSE CAST(0.0 AS DOUBLE) END, 6) AS ts
          |      FROM g, t)
          |SELECT domain AS lang, tokens, ts AS target_share,
          |  round(ts * CAST(300000 AS DOUBLE), 6) AS budget_tokens,
          |  round(least(ts * CAST(300000 AS DOUBLE) / CAST(tokens AS DOUBLE),
          |    CAST(4 AS DOUBLE)), 6) AS epochs,
          |  round(least(ts * CAST(300000 AS DOUBLE),
          |    CAST(tokens AS DOUBLE) * CAST(4 AS DOUBLE)), 6)
          |    AS effective_tokens,
          |  ts * CAST(300000 AS DOUBLE) >
          |    CAST(tokens AS DOUBLE) * CAST(4 AS DOUBLE) AS truncated
          |FROM r ORDER BY lang""".stripMargin,

      // Streaming-histq replay: the update-mode state max-merges to
      // the plain batch bin table, so the batch sketch of the same
      // subset (64 bins, known frame) is the oracle.
      "q187_streaming_histq" ->
        """WITH x AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
          |    FROM lineitem WHERE l_extendedprice IS NOT NULL
          |      AND l_orderkey % 20 = 0),
          |f AS (SELECT min(x) AS lo, max(x) AS hi, count(*) AS n FROM x),
          |b AS (SELECT CASE WHEN hi = lo THEN 0
          |      ELSE least(greatest(CAST(floor((x - lo) / (hi - lo) * 64)
          |        AS BIGINT), 0), 63) END AS bin
          |    FROM x, f),
          |c AS (SELECT bin, count(*) AS cnt FROM b GROUP BY bin),
          |cc AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum FROM c),
          |qs AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
          |    CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q),
          |t AS (SELECT q, n, lo, hi,
          |    greatest(CAST(ceil(q * n) AS BIGINT), 1) AS target_rank
          |  FROM qs, f),
          |pick AS (SELECT t.q, t.n, t.lo, t.hi, t.target_rank,
          |    min(cc.bin) AS bin
          |  FROM t JOIN cc ON cc.cum >= t.target_rank
          |  GROUP BY 1, 2, 3, 4, 5)
          |SELECT p.q, p.n, p.target_rank, p.bin,
          |  p.lo + (p.bin + CAST(p.target_rank - (cc.cum - cc.cnt) AS DOUBLE)
          |    / cc.cnt) * ((p.hi - p.lo) / 64) AS est
          |FROM pick p JOIN cc ON cc.bin = p.bin
          |ORDER BY p.q""".stripMargin,

      // Streaming count–min replay: update-mode counters max-merge to
      // the plain batch sketch, so the batch CM of the same token
      // stream (salt cm9) is the oracle.
      "q188_streaming_countmin" -> {
        val rows = (0 until 4).map(r =>
          s"SELECT $r AS r, ${Sketch.cmBucketSql("item", r, 64, "cm9")} AS b FROM toks")
          .mkString("\n  UNION ALL ")
        s"""WITH toks AS (SELECT unnest(${toksSql("text")}) AS item
           |  FROM documents WHERE text IS NOT NULL)
           |SELECT r, CAST(b AS INT) AS b, CAST(count(*) AS BIGINT) AS cnt
           |FROM ($rows) GROUP BY 1, 2 ORDER BY r, b""".stripMargin
      },

      // LSH calibration replay: same divisor grid, same two pow()
      // forms, rounded at 6 both sides.
      "q189_lsh_calibration" ->
        """WITH cfg AS (SELECT * FROM (VALUES (1, 16), (2, 8), (4, 4),
          |    (8, 2), (16, 1)) AS t(bands, rows_per_band)),
          |sv AS (SELECT unnest([CAST(0.1 AS DOUBLE), CAST(0.3 AS DOUBLE),
          |    CAST(0.5 AS DOUBLE), CAST(0.7 AS DOUBLE), CAST(0.8 AS DOUBLE),
          |    CAST(0.9 AS DOUBLE)]) AS s)
          |SELECT CAST(16 AS INT) AS n_hashes, CAST(bands AS INT) AS bands,
          |  CAST(rows_per_band AS INT) AS rows_per_band, s,
          |  round(CAST(1.0 AS DOUBLE) -
          |    pow(CAST(1.0 AS DOUBLE) - pow(s, rows_per_band), bands), 6)
          |    AS p_detect,
          |  round(pow(CAST(1.0 AS DOUBLE) / bands,
          |    CAST(1.0 AS DOUBLE) / rows_per_band), 6) AS s50
          |FROM cfg, sv ORDER BY bands, s""".stripMargin,

      // KNN-density replay: rank over ALL neighbors (self included,
      // exactly the engine's rank space), drop self, rank-sorted
      // 10-slice, 0-seeded left fold, one division. The QUERY side
      // replays the engine's certification-sample contract dynamically
      // (r14): stride 1 under the 2048-query gate (bench corpora —
      // identical to the unsampled replay), ceil(n/2048) id-stride
      // above, so the sf1 sweep value-checks the sampled ground truth
      // instead of timing out on the full n² window.
      "q194_knn_density" ->
        """WITH qs AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL
          |  AND vec_id % (SELECT CASE WHEN count(*) <= 2048 THEN 1
          |                            ELSE (count(*) + 2047) // 2048 END
          |                FROM embeddings WHERE embedding IS NOT NULL) = 0),
          |r0 AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
          |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
          |      CAST(c.embedding AS DOUBLE[])) AS sim,
          |    row_number() OVER (PARTITION BY q.vec_id
          |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
          |        CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id ASC) AS rank
          |  FROM qs q CROSS JOIN embeddings c),
          |nb AS (SELECT qid, rank, sim FROM r0
          |  WHERE rank <= 11 AND nid <> qid),
          |ag AS (SELECT qid AS id,
          |    CAST(least(count(*), 10) AS BIGINT) AS n_neighbors,
          |    list_sort(list({'r': rank, 's': sim})) AS l
          |  FROM nb GROUP BY qid),
          |f AS (SELECT id, n_neighbors,
          |    list_reduce(list_transform(l[1:10], x -> x.s),
          |      (a, b) -> a + b) AS fs
          |  FROM ag)
          |SELECT id, n_neighbors,
          |  round(fs / CAST(n_neighbors AS DOUBLE), 6) AS avg_sim,
          |  round(CAST(1.0 AS DOUBLE) - fs / CAST(n_neighbors AS DOUBLE), 6)
          |    AS density_score
          |FROM f ORDER BY id""".stripMargin,

      // Production-route density replay: q147's int8→IVF CTEs with
      // queries = corpus = the whole table (self-retrieval, k=11),
      // then q194's density read-off (drop self, rank-sorted 10-slice,
      // 0-seeded left fold). Certifies the gated composition the
      // corpus-scale pass runs — no quadratic kernel anywhere.
      "q195_knn_density_ivf" ->
        """WITH v AS (SELECT vec_id,
          |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
          |  FROM embeddings WHERE embedding IS NOT NULL),
          |amx AS (SELECT vec_id, vv,
          |    list_max(list_transform(vv, x -> abs(x))) AS amax FROM v),
          |sc AS (SELECT vec_id, vv, amax, amax / 127.0 AS scale FROM amx),
          |qz AS (SELECT vec_id,
          |    CASE WHEN amax = 0 THEN list_transform(vv, x -> CAST(0 AS DOUBLE))
          |         ELSE list_transform(vv, x ->
          |           least(greatest(floor(x / scale + 0.5), -127.0), 127.0)) END AS qv
          |  FROM sc),
          |n AS (SELECT vec_id, qv, sqrt(list_dot_product(qv, qv)) AS nrm FROM qz),
          |cent AS (SELECT vec_id AS centroid_id, qv AS cv, nrm AS cn
          |         FROM n ORDER BY vec_id
          |         LIMIT (SELECT CASE WHEN count(*) <= 2048 THEN 16
          |                            WHEN (count(*) + 124) // 125 <= 4096
          |                            THEN greatest(16, (count(*) + 124) // 125)
          |                            ELSE CAST(ceil(sqrt(
          |                              ((count(*) + 124) // 125) * 4096.0))
          |                              AS BIGINT) END
          |                FROM n)),
          |assigned AS (
          |  SELECT vec_id AS id, qv AS vec, nrm AS vn, centroid_id FROM (
          |    SELECT c.vec_id, c.qv, c.nrm, ct.centroid_id,
          |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
          |        (CASE WHEN c.nrm = 0 OR ct.cn = 0 THEN 0.0
          |              ELSE list_dot_product(c.qv, ct.cv) / (c.nrm * ct.cn) END) DESC,
          |        ct.centroid_id ASC) AS rn
          |    FROM n c CROSS JOIN cent ct)
          |  WHERE rn = 1),
          |probes AS (
          |  SELECT vec_id AS query_id, qv, nrm AS qn, centroid_id FROM (
          |    SELECT q.vec_id, q.qv, q.nrm, ct.centroid_id,
          |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
          |        (CASE WHEN q.nrm = 0 OR ct.cn = 0 THEN 0.0
          |              ELSE list_dot_product(q.qv, ct.cv) / (q.nrm * ct.cn) END) DESC,
          |        ct.centroid_id ASC) AS rn
          |    FROM n q CROSS JOIN cent ct)
          |  WHERE rn <= 4),
          |scored AS (
          |  SELECT p.query_id, a.id AS neighbor_id,
          |    CASE WHEN p.qn = 0 OR a.vn = 0 THEN 0.0
          |         ELSE list_dot_product(p.qv, a.vec) / (p.qn * a.vn) END AS sim
          |  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id),
          |r0 AS (SELECT query_id AS qid, neighbor_id AS nid, sim,
          |    row_number() OVER (PARTITION BY query_id
          |      ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored),
          |nb AS (SELECT qid, rank, sim FROM r0 WHERE rank <= 11 AND nid <> qid),
          |ag AS (SELECT qid AS id,
          |    CAST(least(count(*), 10) AS BIGINT) AS n_neighbors,
          |    list_sort(list({'r': rank, 's': sim})) AS l
          |  FROM nb GROUP BY qid),
          |f AS (SELECT id, n_neighbors,
          |    list_reduce(list_transform(l[1:10], x -> x.s),
          |      (a, b) -> a + b) AS fs
          |  FROM ag)
          |SELECT id, n_neighbors,
          |  round(fs / CAST(n_neighbors AS DOUBLE), 6) AS avg_sim,
          |  round(CAST(1.0 AS DOUBLE) - fs / CAST(n_neighbors AS DOUBLE), 6)
          |    AS density_score
          |FROM f ORDER BY id""".stripMargin,

      // PCA-scatter replay: the canonical planar realization is a
      // pure function of the point geometry, so the oracle derives it
      // from the generating (a,b) plane (the 6-dim embedding is an
      // isometric image of it — q114's contract) and never runs an
      // eigensolver; quantization + pixel grid are the engine's exact
      // integer arithmetic. Eigensolver float noise (~1e-12) is far
      // below the 1e-6 quantization step.
      "q196_pca_scatter_svg" -> {
        val hdr = """<svg xmlns="http://www.w3.org/2000/svg" width="1000" height="600">""" +
          "<title>pca projection</title>"
        s"""WITH c AS (SELECT c_custkey AS id,
           |    CAST(c_acctbal AS DOUBLE) / 1000.0 AS a,
           |    CAST(c_custkey AS DOUBLE) / 10.0 AS b
           |  FROM customer WHERE c_custkey <= 50),
           |cen AS (SELECT avg(a) AS ca, avg(b) AS cb FROM c),
           |ctr AS (SELECT id, a - ca AS u, b - cb AS v FROM c, cen),
           |r1 AS (SELECT u AS u1, v AS v1 FROM ctr ORDER BY id LIMIT 1),
           |r2 AS (SELECT u AS u2, v AS v2 FROM ctr ORDER BY id LIMIT 1 OFFSET 1),
           |rot AS (SELECT u1 / sqrt(u1 * u1 + v1 * v1) AS cth,
           |               v1 / sqrt(u1 * u1 + v1 * v1) AS sth FROM r1),
           |fl AS (SELECT CASE WHEN -u2 * sth + v2 * cth
           |           < ${-graft.ops.Projection.CanonReflectEps}
           |         THEN -1.0 ELSE 1.0 END AS f FROM r2, rot),
           |xy AS (SELECT id, u * cth + v * sth AS x,
           |    (u * (-sth) + v * cth) * f AS y FROM ctr, rot, fl),
           |q AS (SELECT id, CAST(floor(x * 1000000.0) AS BIGINT) AS qx,
           |    CAST(floor(y * 1000000.0) AS BIGINT) AS qy FROM xy),
           |ext AS (SELECT min(qx) AS x0, max(qx) AS x1,
           |    min(qy) AS y0, max(qy) AS y1 FROM q),
           |pxl AS (SELECT id,
           |    CASE WHEN x1 = x0 THEN 500
           |      ELSE 50 + CAST(((qx - x0) * 899) // (x1 - x0) AS INTEGER) END AS cx,
           |    550 - (CASE WHEN y1 = y0 THEN 250
           |      ELSE CAST(((qy - y0) * 499) // (y1 - y0) AS INTEGER) END) AS cy
           |  FROM q, ext)
           |SELECT 'scatter_pca' AS plot,
           |  '$hdr' || string_agg(printf('<circle cx="%d" cy="%d" r="3"/>', cx, cy),
           |    '' ORDER BY id) || '</svg>' AS svg
           |FROM pxl""".stripMargin
      },

      // Streaming-KMV replay: per-trigger bottom-k emissions min-merge
      // to the batch bottom-k (any digest in the true bottom-k enters
      // the state on arrival and survives), so the batch KMV of the
      // same digest stream is the oracle.
      "q193_streaming_kmv" -> {
        val frac = Sketch.kmvFracSql("kth_hash")
        s"""WITH d AS (SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h
           |  FROM events WHERE user_id IS NOT NULL),
           |hk AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h)
           |    AS rk FROM d) WHERE rk <= 64),
           |ag AS (SELECT CAST(count(*) AS INT) AS n_kept, max(h) AS kth_hash
           |  FROM hk)
           |SELECT CAST(64 AS INT) AS k, n_kept, kth_hash,
           |  round(CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
           |    ELSE 63.0 / $frac END, 6) AS est
           |FROM ag""".stripMargin
      },

      // Blocklist replay: overlapping substring counts per term via a
      // position scan (substr at every start offset) over the same
      // lowercased text — exactly the automaton's match semantics.
      "q191_blocklist_scan" -> {
        val terms = Seq("spark", "shuffle", "window", "merge", "the", "a big")
        def cnt(tm: String) =
          s"CAST(len(list_filter(range(length(t) - ${tm.length} + 1), " +
            s"i -> substr(t, CAST(i + 1 AS INT), ${tm.length}) = '$tm')) AS INT)"
        val cols = terms.map(tm =>
          s"${cnt(tm)} AS n_${tm.replace(" ", "_")}").mkString(",\n  ")
        val total = terms.map(cnt).mkString("(", " + ", ")")
        s"""WITH b AS (SELECT doc_id, lower(text) AS t
           |  FROM documents WHERE text IS NOT NULL)
           |SELECT doc_id,
           |  $cols,
           |  CAST($total AS INT) AS total,
           |  CAST(CASE WHEN $total > 0 THEN 1 ELSE 0 END AS INT) AS flagged
           |FROM b ORDER BY doc_id""".stripMargin
      },

      // Safety-filter replay: q20's quality chain, token band, the
      // q190 encoding regex ladder on the RAW text, and the q191
      // position-scan blocklist counts — conjoined exactly as the
      // engine's keep predicate.
      "q192_safety_filter" -> {
        // zero-guarded like the engine's punctRatio when(n === 0, 0.0)
        // branch: an empty-string doc must not diverge on 0/0
        val punct = s"""CASE WHEN length(text) = 0 THEN CAST(0 AS DOUBLE) ELSE CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE) / length(text) END"""
        val swRatio = s"CAST(len(list_filter($toks, x -> list_contains(${dlist(stop("en"))}, x))) AS DOUBLE) / len($toks)"
        val mtl = s"CAST(list_sum(list_transform($toks, x -> CAST(length(x) AS BIGINT))) AS DOUBLE) / len($toks)"
        val quality = s"""CAST((CASE WHEN len($toks) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END) * 0.3
           |      + (CASE WHEN $mtl >= 2.0 AND $mtl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.3
           |      + (CASE WHEN $punct <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.2
           |      + (CASE WHEN $swRatio >= 0.01 THEN 1.0 ELSE 0.0 END) * 0.2 AS DOUBLE)""".stripMargin
        val encOk = "CASE WHEN length(text) = length(regexp_replace(text, " +
          "'\\x{FFFD}|\\x{C3}[\\x{80}-\\x{BF}]|[\\x00-\\x08\\x0B-\\x1F\\x7F]', '', 'g')) " +
          "THEN 1 ELSE 0 END"
        def cnt(tm: String) =
          s"len(list_filter(range(length(lower(text)) - ${tm.length} + 1), " +
            s"i -> substr(lower(text), CAST(i + 1 AS INT), ${tm.length}) = '$tm'))"
        val hits = s"(${cnt("merge")} + ${cnt("window")})"
        s"""SELECT doc_id,
           |  round($quality, 6) AS quality,
           |  CAST(len($toks) AS BIGINT) AS n_tokens,
           |  CAST($encOk AS INT) AS encoding_ok,
           |  CAST($hits AS INT) AS blocklist_hits,
           |  CAST(CASE WHEN ($encOk) = 1 AND $quality >= 0.5
           |      AND len($toks) BETWEEN 10 AND 10000 AND $hits = 0
           |    THEN 1 ELSE 0 END AS INT) AS keep
           |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin
      },

      // Encoding-audit replay: identical md5 gate and injected
      // corruption (chr-built), the same three strip-count regexes
      // (RE2 hex classes ≡ the Java classes), same //2 fold.
      "q190_encoding_audit" ->
        s"""WITH r AS (SELECT doc_id,
           |    CASE WHEN ${hd(6)} % 8 <= 2
           |        THEN text || ' x' || chr(195) || chr(169) || 'y'
           |      WHEN ${hd(6)} % 8 = 3 THEN text || chr(65533) || chr(65533)
           |      WHEN ${hd(6)} % 8 = 4 THEN chr(7) || text
           |      ELSE text END AS t
           |  FROM documents WHERE text IS NOT NULL)
           |SELECT doc_id,
           |  CAST(length(t) - length(regexp_replace(t, '\\x{FFFD}', '', 'g'))
           |    AS INT) AS n_replacement,
           |  CAST((length(t) - length(regexp_replace(t,
           |    '\\x{C3}[\\x{80}-\\x{BF}]', '', 'g'))) // 2 AS INT)
           |    AS n_mojibake,
           |  CAST(length(t) - length(regexp_replace(t,
           |    '[\\x00-\\x08\\x0B-\\x1F\\x7F]', '', 'g')) AS INT) AS n_ctrl,
           |  CAST(CASE WHEN length(t) = length(regexp_replace(t,
           |      '\\x{FFFD}|\\x{C3}[\\x{80}-\\x{BF}]|[\\x00-\\x08\\x0B-\\x1F\\x7F]',
           |      '', 'g')) THEN 1 ELSE 0 END AS INT) AS encoding_ok
           |FROM r ORDER BY doc_id""".stripMargin,

      // Source-overlap replay: per-group bottom-k, the pair-expanded
      // unions, membership flags, and the shared estimator ladder.
      "q176_source_overlap" -> {
        val frac = Sketch.kmvFracSql("kth_hash")
        val dU = s"CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE) ELSE 63.0 / $frac END"
        s"""WITH base AS (SELECT source AS g, unnest(${toksSql("text")}) AS tok
           |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
           |d AS (SELECT DISTINCT g, md5(tok) AS h FROM base),
           |hk AS (SELECT g, h FROM (SELECT g, h,
           |    row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM d)
           |  WHERE rk <= 64),
           |gs AS (SELECT DISTINCT g FROM hk),
           |pr AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
           |u0 AS (SELECT DISTINCT ga, gb, h FROM (
           |    SELECT pr.ga, pr.gb, hk.h FROM pr JOIN hk ON hk.g = pr.ga
           |    UNION ALL SELECT pr.ga, pr.gb, hk.h FROM pr JOIN hk ON hk.g = pr.gb)),
           |u AS (SELECT ga, gb, h FROM (SELECT ga, gb, h,
           |    row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rk FROM u0)
           |  WHERE rk <= 64),
           |m AS (SELECT u.ga, u.gb, CAST(count(*) AS INT) AS n_kept,
           |    max(u.h) AS kth_hash,
           |    CAST(sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
           |             THEN 1 ELSE 0 END) AS BIGINT) AS n_common
           |  FROM u LEFT JOIN hk a ON a.g = u.ga AND a.h = u.h
           |         LEFT JOIN hk b ON b.g = u.gb AND b.h = u.h
           |  GROUP BY 1, 2)
           |SELECT ga AS source_a, gb AS source_b, CAST(64 AS INT) AS k,
           |  n_kept, kth_hash,
           |  round($dU, 6) AS d_union_est, n_common,
           |  round(CAST(n_common AS DOUBLE) / CAST(n_kept AS DOUBLE), 6) AS jaccard_est,
           |  round((CAST(n_common AS DOUBLE) / CAST(n_kept AS DOUBLE)) * ($dU), 6) AS d_intersect_est
           |FROM m ORDER BY 1, 2""".stripMargin
      },

      // Gopher-rules replay: whitespace words, the same five guarded
      // integer-ratio rules, stopword probes on the alnum tokenizer.
      "q175_gopher_rules" -> {
        val stopSum = TextAnalysis.GopherStopwords.map(sw =>
          s"(CASE WHEN list_contains(toks, '$sw') THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH base AS (SELECT doc_id, coalesce(text, '') AS t
           |  FROM documents WHERE doc_id IS NOT NULL),
           |w AS (SELECT doc_id,
           |    list_filter(regexp_split_to_array(t, '\\s+'), x -> len(x) > 0) AS ws,
           |    ${toksSql("t")} AS toks
           |  FROM base),
           |m AS (SELECT doc_id, len(ws) AS nw,
           |    CASE WHEN len(ws) > 0
           |         THEN CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE) /
           |              CAST(len(ws) AS DOUBLE)
           |         ELSE 0.0 END AS mwl,
           |    len(list_filter(ws, x -> contains(x, '#') OR contains(x, '...')
           |      OR contains(x, chr(8230)))) AS nsym,
           |    len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS nalpha,
           |    $stopSum AS nstop
           |  FROM w),
           |f AS (SELECT doc_id, nw, mwl,
           |    CASE WHEN nw >= 50 AND nw <= 100000 THEN 1 ELSE 0 END AS wc_ok,
           |    CASE WHEN nw > 0 AND mwl >= 3.0 AND mwl <= 10.0 THEN 1 ELSE 0 END AS mwl_ok,
           |    CASE WHEN nw > 0 AND CAST(nsym AS DOUBLE) / CAST(nw AS DOUBLE) <= 0.1
           |         THEN 1 ELSE 0 END AS sym_ok,
           |    CASE WHEN nw > 0 AND CAST(nalpha AS DOUBLE) / CAST(nw AS DOUBLE) >= 0.8
           |         THEN 1 ELSE 0 END AS alpha_ok,
           |    CASE WHEN nstop >= 2 THEN 1 ELSE 0 END AS stop_ok
           |  FROM m)
           |SELECT doc_id, CAST(nw AS BIGINT) AS n_words, round(mwl, 6) AS mean_word_len,
           |  CAST(wc_ok AS INT) AS wc_ok, CAST(mwl_ok AS INT) AS mwl_ok,
           |  CAST(sym_ok AS INT) AS sym_ok, CAST(alpha_ok AS INT) AS alpha_ok,
           |  CAST(stop_ok AS INT) AS stop_ok,
           |  CAST(CASE WHEN wc_ok + mwl_ok + sym_ok + alpha_ok + stop_ok = 5
           |       THEN 1 ELSE 0 END AS INT) AS pass
           |FROM f ORDER BY doc_id""".stripMargin
      },

      // Sessionization replay: identical lag/running-sum window over
      // (ts, event_id) order, epoch-millis integers end to end.
      "q171_sessionize" ->
        """WITH b AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
          |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          |f AS (SELECT user_id, event_id, ms,
          |    CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000
          |         THEN 1 ELSE 0 END AS new_s
          |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
          |s AS (SELECT user_id, ms,
          |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
          |                     ROWS UNBOUNDED PRECEDING) AS session_idx
          |  FROM f)
          |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
          |  CAST(count(*) AS BIGINT) AS n_events,
          |  CAST(min(ms) AS BIGINT) AS start_ms, CAST(max(ms) AS BIGINT) AS end_ms,
          |  CAST(max(ms) - min(ms) AS BIGINT) AS duration_ms
          |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      // Stream–stream join replay: every match eventually forms (the
      // 365-day watermark evicts nothing inside the data's range), so
      // the emitted stream must equal the batch interval self-join.
      "q168_streaming_join" ->
        """SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id
          |FROM events c JOIN events v
          |  ON c.user_id = v.user_id
          | AND v.ts >= c.ts - INTERVAL 1 HOUR AND v.ts <= c.ts
          |WHERE c.event_type = 'click' AND v.event_type = 'view'
          |  AND c.ts IS NOT NULL AND v.ts IS NOT NULL
          |  AND c.user_id IS NOT NULL
          |ORDER BY 1, 2, 3""".stripMargin,

      // Streaming numeric-profile replay: every real per-day window
      // closes under the sentinel watermark, so the emitted stream must
      // equal the batch day × type moment aggregation (q65's round-6
      // double-aggregate convention).
      "q151_streaming_numeric_profile" ->
        """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
          |  event_type, CAST(count(value) AS BIGINT) AS n,
          |  round(avg(value), 6) AS mean,
          |  round(stddev_pop(value), 6) AS std,
          |  round(min(value), 6) AS min, round(max(value), 6) AS max
          |FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      // Streaming exact-dedup replay: q148's first-shard-wins algebra
      // keyed on the content fingerprint instead of the SimHash word.
      "q152_streaming_dedup" ->
        s"""WITH dup AS (SELECT * FROM ${withDupsSql("documents", "doc_id", 50, 10000)}
           |            WHERE text IS NOT NULL),
           |s AS (SELECT doc_id,
           |    CASE WHEN doc_id < 200 THEN 0 WHEN doc_id < 400 THEN 1
           |         ELSE 2 END AS batch,
           |    md5(array_to_string($toks, ' ')) AS fp
           |  FROM dup),
           |pd AS (SELECT batch, fp, min(doc_id) AS doc_id
           |  FROM s GROUP BY 1, 2),
           |adm AS (SELECT t.* FROM pd t WHERE NOT EXISTS (
           |  SELECT 1 FROM pd e WHERE e.fp = t.fp AND e.batch < t.batch))
           |SELECT doc_id, CAST(batch AS INT) AS batch FROM adm
           |ORDER BY doc_id""".stripMargin,

      // Stream-static enrichment replay: the per-micro-batch broadcast
      // join's union must equal the batch left join.
      "q153_streaming_enrich" ->
        """SELECT o_orderkey, o_custkey, c_mktsegment, c_nationkey
          |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
          |ORDER BY o_orderkey""".stripMargin,

      // BPE training replay: ten unrolled merge rounds over the
      // marker-string vocabulary state; each round's winner re-derives
      // lhs/rhs/merged from its pair string.
      "q155_bpe_train" -> {
        val rows = (1 to 10).map { r =>
          s"""SELECT $r AS merge_rank,
             |  string_split(trim(pair, '><'), '><')[1] AS lhs,
             |  string_split(trim(pair, '><'), '><')[2] AS rhs,
             |  replace(trim(pair, '><'), '><', '') AS merged, cnt
             |FROM b$r""".stripMargin
        }
        s"""WITH ${bpeStagesSql(10)}
           |SELECT CAST(merge_rank AS INT) AS merge_rank, lhs, rhs, merged, cnt
           |FROM (${rows.mkString("\n", "\nUNION ALL\n", "\n")})
           |ORDER BY merge_rank""".stripMargin
      },

      // BPE encode replay: the round-10 vocabulary state IS the
      // encoded segmentation — pieces and piece counts read off it.
      "q156_bpe_encode" ->
        s"""WITH ${bpeStagesSql(10)}
           |SELECT w, freq,
           |  replace(trim(st, '><'), '><', ' ') AS pieces,
           |  CAST(len(string_split(trim(st, '><'), '><')) AS BIGINT) AS n_pieces
           |FROM v10 ORDER BY w""".stripMargin,

      // Byte-level BPE train replay: identical merge-stage algebra on
      // hex-byte symbols over the e→é-injected whitespace vocabulary.
      "q224_bpe_bytes_train" -> {
        val rows = (1 to 10).map { r =>
          s"""SELECT $r AS merge_rank,
             |  string_split(trim(pair, '><'), '><')[1] AS lhs,
             |  string_split(trim(pair, '><'), '><')[2] AS rhs,
             |  replace(trim(pair, '><'), '><', '') AS merged, cnt
             |FROM b$r""".stripMargin
        }
        s"""WITH ${bpeBytesStagesSql(10)}
           |SELECT CAST(merge_rank AS INT) AS merge_rank, lhs, rhs, merged, cnt
           |FROM (${rows.mkString("\n", "\nUNION ALL\n", "\n")})
           |ORDER BY merge_rank""".stripMargin
      },

      // Byte-level encode replay: round-10 state read off as hex
      // pieces.
      "q225_bpe_bytes_encode" ->
        s"""WITH ${bpeBytesStagesSql(10)}
           |SELECT w, freq,
           |  replace(trim(st, '><'), '><', ' ') AS pieces,
           |  CAST(len(string_split(trim(st, '><'), '><')) AS BIGINT) AS n_pieces
           |FROM v10 ORDER BY w""".stripMargin,

      // Krippendorff replay: same three-rater simulation, coincidence
      // identities in exact integers (lcm-cleared D_o numerator,
      // integer D_e), alpha from the two unrounded double ratios.
      "q222_krippendorff_alpha" ->
        """WITH rows0 AS (
          |  SELECT vec_id AS u, CAST(label % 3 AS VARCHAR) AS v
          |    FROM embeddings WHERE label IS NOT NULL AND vec_id IS NOT NULL
          |  UNION ALL
          |  SELECT vec_id,
          |    CAST((label + CASE WHEN vec_id % 7 = 0 THEN 1 ELSE 0 END) % 3
          |      AS VARCHAR)
          |    FROM embeddings WHERE label IS NOT NULL AND vec_id IS NOT NULL
          |      AND vec_id % 4 <> 0
          |  UNION ALL
          |  SELECT vec_id,
          |    CAST((label + CASE WHEN vec_id % 11 = 0 THEN 2 ELSE 0 END) % 3
          |      AS VARCHAR)
          |    FROM embeddings WHERE label IS NOT NULL AND vec_id IS NOT NULL
          |      AND vec_id % 3 <> 1),
          |cells AS (SELECT u, v, count(*) AS c FROM rows0 GROUP BY 1, 2),
          |units AS (SELECT u, sum(c) AS m, sum(c * c) AS ss
          |  FROM cells GROUP BY u HAVING sum(c) >= 2),
          |byM AS (SELECT m, sum(m * m - ss) AS a FROM units GROUP BY m),
          |don AS (SELECT CAST(coalesce(sum(
          |    CAST(27720 // (m - 1) AS DECIMAL(38,0)) *
          |    CAST(a AS DECIMAL(38,0))), 0) AS DECIMAL(38,0)) AS do_num
          |  FROM byM),
          |marg AS (SELECT v, sum(c) AS nc FROM cells
          |  WHERE u IN (SELECT u FROM units) GROUP BY v),
          |tot AS (SELECT CAST(coalesce(sum(nc), 0) AS BIGINT) AS n,
          |    CAST(coalesce(sum(CAST(nc AS DECIMAL(38,0)) *
          |      CAST(nc AS DECIMAL(38,0))), 0) AS DECIMAL(38,0)) AS ncsq
          |  FROM marg),
          |nu AS (SELECT CAST(count(*) AS BIGINT) AS n_units FROM units)
          |SELECT n_units, n, round(do0, 6) AS "do", round(de0, 6) AS de,
          |  round(CASE WHEN de0 > 0.0 THEN 1.0 - do0 / de0 END, 6) AS alpha
          |FROM (SELECT n_units, n,
          |    CAST(do_num AS DOUBLE) /
          |      CAST(CAST(n AS DECIMAL(38,0)) * 27720 AS DOUBLE) AS do0,
          |    CAST(CAST(n AS DECIMAL(38,0)) * n - ncsq AS DOUBLE) /
          |      CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) AS DOUBLE) AS de0
          |  FROM tot, don, nu)""".stripMargin,

      // Interval-metric alpha replay: same per-m lcm clearing as q222;
      // the D_o numerator is the closed unit-moment form
      // A_u = 2(m·Σv² − (Σv)²), D_e the global-moment twin.
      "q228_krippendorff_interval" ->
        """WITH rows0 AS (
          |  SELECT vec_id AS u, CAST(label % 5 + 1 AS BIGINT) AS v
          |    FROM embeddings WHERE label IS NOT NULL AND vec_id IS NOT NULL
          |  UNION ALL
          |  SELECT vec_id,
          |    CAST((label + CASE WHEN vec_id % 7 = 0 THEN 1 ELSE 0 END) % 5 + 1
          |      AS BIGINT)
          |    FROM embeddings WHERE label IS NOT NULL AND vec_id IS NOT NULL
          |      AND vec_id % 4 <> 0
          |  UNION ALL
          |  SELECT vec_id,
          |    CAST((label + CASE WHEN vec_id % 11 = 0 THEN 3 ELSE 0 END) % 5 + 1
          |      AS BIGINT)
          |    FROM embeddings WHERE label IS NOT NULL AND vec_id IS NOT NULL
          |      AND vec_id % 3 <> 1),
          |cells AS (SELECT u, v, count(*) AS c FROM rows0 GROUP BY 1, 2),
          |units AS (SELECT u, sum(c) AS m, sum(c * v) AS sv,
          |    sum(c * v * v) AS svv
          |  FROM cells GROUP BY u HAVING sum(c) >= 2),
          |byM AS (SELECT m,
          |    sum(CAST(2 AS DECIMAL(38,0)) *
          |      (CAST(m AS DECIMAL(38,0)) * CAST(svv AS DECIMAL(38,0)) -
          |       CAST(sv AS DECIMAL(38,0)) * CAST(sv AS DECIMAL(38,0)))) AS a
          |  FROM units GROUP BY m),
          |don AS (SELECT CAST(coalesce(sum(
          |    CAST(27720 // (m - 1) AS DECIMAL(38,0)) *
          |    CAST(a AS DECIMAL(38,0))), 0) AS DECIMAL(38,6)) AS do_num
          |  FROM byM),
          |tot AS (SELECT CAST(coalesce(sum(m), 0) AS BIGINT) AS n,
          |    CAST(coalesce(sum(CAST(sv AS DECIMAL(38,0))), 0)
          |      AS DECIMAL(38,0)) AS gsv,
          |    CAST(coalesce(sum(CAST(svv AS DECIMAL(38,0))), 0)
          |      AS DECIMAL(38,0)) AS gsvv
          |  FROM units),
          |nu AS (SELECT CAST(count(*) AS BIGINT) AS n_units FROM units)
          |SELECT n_units, n, round(do0, 6) AS "do", round(de0, 6) AS de,
          |  round(CASE WHEN de0 > 0.0 THEN 1.0 - do0 / de0 END, 6) AS alpha
          |FROM (SELECT n_units, n,
          |    CASE WHEN n > 0 THEN CAST(do_num AS DOUBLE) /
          |      (CAST(n AS DOUBLE) * 27720) END AS do0,
          |    CASE WHEN n > 0 THEN
          |      CAST(CAST(2 AS DECIMAL(38,0)) *
          |        (CAST(n AS DECIMAL(38,0)) * gsvv - gsv * gsv) AS DOUBLE) /
          |      CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) AS DOUBLE) END AS de0
          |  FROM tot, don, nu)""".stripMargin,

      // Ordinal-metric alpha replay: Q_ck = (2·(cum_k − cum_c) + n_c −
      // n_k)² = 4·δ²_ord over the coincidence marginals; the 4 and the
      // ordered-pair doubling cancel to the published /2 scales.
      "q229_krippendorff_ordinal" ->
        """WITH rows0 AS (
          |  SELECT vec_id AS u, CAST(label % 5 + 1 AS BIGINT) AS v
          |    FROM embeddings WHERE label IS NOT NULL AND vec_id IS NOT NULL
          |  UNION ALL
          |  SELECT vec_id,
          |    CAST((label + CASE WHEN vec_id % 7 = 0 THEN 1 ELSE 0 END) % 5 + 1
          |      AS BIGINT)
          |    FROM embeddings WHERE label IS NOT NULL AND vec_id IS NOT NULL
          |      AND vec_id % 4 <> 0
          |  UNION ALL
          |  SELECT vec_id,
          |    CAST((label + CASE WHEN vec_id % 11 = 0 THEN 3 ELSE 0 END) % 5 + 1
          |      AS BIGINT)
          |    FROM embeddings WHERE label IS NOT NULL AND vec_id IS NOT NULL
          |      AND vec_id % 3 <> 1),
          |cells AS (SELECT u, v, count(*) AS c FROM rows0 GROUP BY 1, 2),
          |units AS (SELECT u, sum(c) AS m FROM cells GROUP BY u
          |  HAVING sum(c) >= 2),
          |qcells AS (SELECT * FROM cells WHERE u IN (SELECT u FROM units)),
          |marg AS (SELECT v, sum(c) AS nc FROM qcells GROUP BY v),
          |cum AS (SELECT a.v AS v, max(a.nc) AS nc, sum(b.nc) AS cum
          |  FROM marg a JOIN marg b ON b.v <= a.v GROUP BY a.v),
          |qs AS (SELECT a.v AS vc, b.v AS vk, a.nc AS ncc, b.nc AS nck,
          |    CAST((2 * (b.cum - a.cum) + a.nc - b.nc) *
          |         (2 * (b.cum - a.cum) + a.nc - b.nc)
          |      AS DECIMAL(38,0)) AS q
          |  FROM cum a JOIN cum b ON a.v < b.v),
          |en AS (SELECT CAST(coalesce(sum(
          |    CAST(ncc AS DECIMAL(38,0)) * CAST(nck AS DECIMAL(38,0)) * q),
          |    0) AS DECIMAL(38,0)) AS e FROM qs),
          |pairs AS (SELECT x.u AS u, x.v AS vc, y.v AS vk,
          |    CAST(x.c AS DECIMAL(38,0)) * CAST(y.c AS DECIMAL(38,0)) AS cc
          |  FROM qcells x JOIN qcells y ON x.u = y.u AND x.v < y.v),
          |perB AS (SELECT u, CAST(coalesce(sum(cc * q), 0)
          |    AS DECIMAL(38,0)) AS b
          |  FROM pairs JOIN qs USING (vc, vk) GROUP BY u),
          |byM AS (SELECT m, coalesce(sum(b), CAST(0 AS DECIMAL(38,0))) AS a
          |  FROM units LEFT JOIN perB USING (u) GROUP BY m),
          |don AS (SELECT CAST(coalesce(sum(
          |    CAST(27720 // (m - 1) AS DECIMAL(38,0)) *
          |    CAST(a AS DECIMAL(38,0))), 0) AS DECIMAL(38,6)) AS do_num
          |  FROM byM),
          |tot AS (SELECT CAST(coalesce(sum(m), 0) AS BIGINT) AS n FROM units),
          |nu AS (SELECT CAST(count(*) AS BIGINT) AS n_units FROM units)
          |SELECT n_units, n, round(do0, 6) AS "do", round(de0, 6) AS de,
          |  round(CASE WHEN de0 > 0.0 THEN 1.0 - do0 / de0 END, 6) AS alpha
          |FROM (SELECT n_units, n,
          |    CASE WHEN n > 0 THEN CAST(do_num AS DOUBLE) /
          |      (CAST(n AS DOUBLE) * 27720 * 2.0) END AS do0,
          |    CASE WHEN n > 0 THEN CAST(e AS DOUBLE) /
          |      CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) AS DOUBLE) / 2.0
          |      END AS de0
          |  FROM tot, don, en, nu)""".stripMargin,

      // HTML main-content replay: same page shell, same block split,
      // same per-block integer gates (length / 3x link density / >= 1
      // stopword over TextAnalysis.tokens' alnum token stream).
      "q227_html_main_content" -> {
        val shellPre = "<header><ul><li><a href=\"/\">Home</a></li>" +
          "<li><a href=\"/about\">About Us</a></li>" +
          "<li><a href=\"/contact\">Contact</a></li></ul></header>" +
          "<article><p>"
        val shellPost = "</p></article><div>Share this page: " +
          "<a href=\"#\">Tweet</a> <a href=\"#\">Like</a></div>" +
          "<footer>Copyright 2024 Example Corp - All rights reserved" +
          "</footer>"
        val blockTag = "(?i)</?(?:div|p|ul|ol|li|nav|footer|header|" +
          "aside|section|article|table|thead|tbody|tr|td|th|h[1-6]|" +
          "blockquote|form|main|br)[^>]*>"
        val clean = (x: String) =>
          s"trim(regexp_replace(regexp_replace($x, '<[^>]*>', ' ', 'g'), " +
            "'\\s+', ' ', 'g'))"
        val toks = (x: String) =>
          s"list_filter(regexp_split_to_array(lower($x), '[^a-z0-9]+'), " +
            "t -> t <> '')"
        val stopList =
          "['the','a','and','of','to','in','is','it','you','that']"
        s"""WITH src AS (
           |  SELECT doc_id, '$shellPre' || coalesce(text, '') ||
           |    '$shellPost' AS html
           |  FROM documents WHERE doc_id IS NOT NULL),
           |blk AS (SELECT doc_id,
           |    list_filter(list_transform(
           |      regexp_split_to_array(html, '$blockTag'),
           |      x -> struct_pack(
           |        txt := ${clean("x")},
           |        n := length(${clean("x")}),
           |        ln := coalesce(length(${clean(
          "array_to_string(regexp_extract_all(x, '(?is)<a[^>]*>(.*?)</a>', 1), ' ')")}), 0),
           |        sw := len(list_filter(${toks(clean("x"))},
           |          t -> list_contains($stopList, t))))),
           |      s -> s.n > 0) AS b
           |  FROM src)
           |SELECT doc_id,
           |  coalesce(array_to_string(list_transform(
           |    list_filter(b, s -> s.n >= 25 AND s.ln * 3 <= s.n
           |      AND s.sw >= 1), s -> s.txt), chr(10)), '') AS main_text,
           |  CAST(len(b) AS BIGINT) AS n_blocks,
           |  CAST(len(list_filter(b, s -> s.n >= 25 AND s.ln * 3 <= s.n
           |    AND s.sw >= 1)) AS BIGINT) AS n_kept
           |FROM blk ORDER BY doc_id""".stripMargin
      },

      // Bradley-Terry replay: the same 20 integer-exact MM rounds
      // unrolled as CTE stages — HUGEINT carries the multiplies, //
      // is the same positive floor division, so every P_i replays
      // bit-for-bit and the one double op (final normalize) rounds
      // from identical integers.
      "q226_bradley_terry" -> {
        val rounds = (1 to 20).map { r =>
          s"""s$r AS MATERIALIZED (SELECT e.id,
             |    sum(CAST(nij AS HUGEINT) * 1000000000000000 //
             |        (pi.p + pj.p)) AS s
             |  FROM edges e
             |  JOIN p${r - 1} pi ON pi.id = e.id
             |  JOIN p${r - 1} pj ON pj.id = e.opp
             |  GROUP BY 1),
             |u$r AS MATERIALIZED (SELECT i.id,
             |    coalesce(CAST(wi AS HUGEINT) * 1000000000000000 // s.s,
             |      CAST(0 AS HUGEINT)) AS p1
             |  FROM items i LEFT JOIN s$r s USING (id)),
             |p$r AS MATERIALIZED (SELECT id,
             |    greatest(CAST(p1 AS HUGEINT) * (SELECT n FROM nn) *
             |        1000000 // (SELECT sum(p1) FROM u$r),
             |      CAST(1000 AS HUGEINT)) AS p
             |  FROM u$r)""".stripMargin
        }
        s"""WITH mt AS MATERIALIZED (
           |  SELECT CAST(CASE WHEN up THEN least(a, b)
           |              ELSE greatest(a, b) END AS VARCHAR) AS w,
           |         CAST(CASE WHEN up THEN greatest(a, b)
           |              ELSE least(a, b) END AS VARCHAR) AS l
           |  FROM (SELECT o_orderkey % 7 AS a, (o_orderkey // 7) % 7 AS b,
           |          o_orderkey % 4 = 0 AS up
           |        FROM orders WHERE o_orderkey IS NOT NULL)
           |  WHERE a <> b),
           |pairs AS MATERIALIZED (
           |  SELECT least(w, l) AS i, greatest(w, l) AS j,
           |    CAST(count(*) AS BIGINT) AS nij
           |  FROM mt GROUP BY 1, 2),
           |edges AS MATERIALIZED (
           |  SELECT i AS id, j AS opp, nij FROM pairs
           |  UNION ALL SELECT j, i, nij FROM pairs),
           |wins AS (SELECT w AS id, CAST(count(*) AS BIGINT) AS wi
           |  FROM mt GROUP BY 1),
           |itm0 AS (SELECT id, CAST(sum(nij) AS BIGINT) AS ni
           |  FROM edges GROUP BY 1),
           |items AS MATERIALIZED (
           |  SELECT itm0.id, CAST(coalesce(wi, 0) AS BIGINT) AS wi, ni
           |  FROM itm0 LEFT JOIN wins USING (id)),
           |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM items),
           |p0 AS (SELECT id, CAST(1000000 AS HUGEINT) AS p FROM items),
           |${rounds.mkString(",\n")}
           |SELECT i.id AS item, wi AS wins, ni AS n_matches,
           |  round(CAST(p AS DOUBLE) /
           |    (SELECT CAST(sum(p) AS DOUBLE) FROM p20), 6) AS strength
           |FROM items i JOIN p20 USING (id)
           |ORDER BY item""".stripMargin
      },

      // Unigram-LM trainer replay: two full Viterbi-EM passes as
      // staged CTEs; the published vocabulary carries the final counts
      // and the integer log scores the encoder uses.
      "q220_unigram_train" ->
        s"""WITH ${unigramStagesSql(2)}
           |SELECT piece, CAST(cnt AS BIGINT) AS cnt,
           |  ${ilogSql("cnt + 1")} -
           |    (SELECT ${ilogSql("t")} FROM
           |      (SELECT sum(cnt) + (SELECT v FROM nv) AS t FROM c2))
           |    AS score
           |FROM c2 ORDER BY piece""".stripMargin,

      // Unigram encode replay: the third Viterbi pass (scores from the
      // final M-step counts) IS the segmentation — read it off seg3.
      "q221_unigram_encode" ->
        s"""WITH ${unigramStagesSql(3)}
           |SELECT w, freq,
           |  replace(substr(path, 2), chr(31), ' ') AS pieces,
           |  CAST(len(string_split(substr(path, 2), chr(31))) AS BIGINT)
           |    AS n_pieces
           |FROM seg3 ORDER BY w""".stripMargin,

      // Modified-KN trigram replay: the whole estimator re-derived in
      // SQL — trigram counts, continuation tables, Chen-Goodman
      // discounts from count-of-count bands, per-context gamma
      // numerators, and the three-level interpolated probability with
      // pure backoff (gamma = 1) on unseen contexts. Reused stages
      // are MATERIALIZED (the r12 DP-unroll lesson).
      "q223_kn_trigram_logprob" -> {
        val toks = toksSql("text")
        val tgs = "unnest(list_transform(range(len(w) - 2), " +
          "i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))"
        // Chen-Goodman discount triple from a band row (n1..n4):
        // Y = n1/(n1+2n2); the modified triple applies only when all
        // bands are nonzero AND every D_k > 0; else flat absolute
        // discounting D = Y (or 0.5 when n1 = 0) — mirrors
        // Corpus.knTrigramLogProb's bands()
        def dsql(p: String) =
          s"""SELECT
             |  CASE WHEN valid THEN d1m ELSE fb END AS ${p}1,
             |  CASE WHEN valid THEN d2m ELSE fb END AS ${p}2,
             |  CASE WHEN valid THEN d3m ELSE fb END AS ${p}3
             |FROM (SELECT *,
             |    (n1 > 0 AND n2 > 0 AND n3 > 0 AND n4 > 0 AND
             |     d1m > 0 AND d2m > 0 AND d3m > 0) AS valid,
             |    CASE WHEN n1 > 0 THEN y ELSE CAST(0.5 AS DOUBLE) END AS fb
             |  FROM (SELECT *,
             |      CASE WHEN n1 > 0 THEN 1.0 - 2.0 * y *
             |        CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) END AS d1m,
             |      CASE WHEN n2 > 0 THEN 2.0 - 3.0 * y *
             |        CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE) END AS d2m,
             |      CASE WHEN n3 > 0 THEN 3.0 - 4.0 * y *
             |        CAST(n4 AS DOUBLE) / CAST(n3 AS DOUBLE) END AS d3m
             |    FROM (SELECT *,
             |        CASE WHEN n1 + 2*n2 > 0 THEN CAST(n1 AS DOUBLE) /
             |          CAST(n1 + 2*n2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE)
             |        END AS y
             |      FROM __BANDS__)))""".stripMargin
        def bsql(src: String, c: String) =
          s"""SELECT
             |  CAST(sum(CASE WHEN $c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |  CAST(sum(CASE WHEN $c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |  CAST(sum(CASE WHEN $c = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             |  CAST(sum(CASE WHEN $c = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
             |FROM $src""".stripMargin
        s"""WITH base AS MATERIALIZED (
           |  SELECT doc_id, $toks AS w FROM documents WHERE doc_id IS NOT NULL),
           |tg AS MATERIALIZED (
           |  SELECT tg, CAST(count(*) AS BIGINT) AS c3,
           |    split_part(tg, ' ', 1) AS w1, split_part(tg, ' ', 2) AS w2,
           |    split_part(tg, ' ', 3) AS w3
           |  FROM (SELECT $tgs AS tg
           |        FROM base WHERE doc_id % 2 = 0 AND len(w) >= 3)
           |  GROUP BY 1),
           |cc2 AS MATERIALIZED (
           |  SELECT w2, w3, CAST(count(*) AS BIGINT) AS cc FROM tg GROUP BY 1, 2),
           |cu AS MATERIALIZED (
           |  SELECT w3, CAST(count(*) AS BIGINT) AS cu FROM cc2 GROUP BY 1),
           |d3 AS (${dsql("d3").replace("__BANDS__", s"(${bsql("tg", "c3")})")}),
           |d2 AS (${dsql("d2").replace("__BANDS__", s"(${bsql("cc2", "cc")})")}),
           |d1 AS (${dsql("d1").replace("__BANDS__", s"(${bsql("cu", "cu")})")}),
           |vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
           |       FROM (SELECT unnest(w) AS tok FROM base WHERE doc_id % 2 = 0)),
           |lvl1 AS (SELECT CAST(sum(cu) AS BIGINT) AS cut,
           |    CAST(sum(CASE WHEN cu = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
           |    CAST(sum(CASE WHEN cu = 2 THEN 1 ELSE 0 END) AS BIGINT) AS m2,
           |    CAST(sum(CASE WHEN cu >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS m3
           |  FROM cu),
           |scal AS (SELECT d3.*, d2.*, d1.*, vv.v, lvl1.cut,
           |    (d11 * m1 + d12 * m2 + d13 * m3) / CAST(cut AS DOUBLE) AS g1
           |  FROM d3, d2, d1, vv, lvl1),
           |ctx3 AS (SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS t3,
           |    CAST(sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
           |    CAST(sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
           |    CAST(sum(CASE WHEN c3 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS b3
           |  FROM tg GROUP BY 1, 2),
           |ctx2 AS (SELECT w2, CAST(sum(cc) AS BIGINT) AS t2,
           |    CAST(sum(CASE WHEN cc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS e1,
           |    CAST(sum(CASE WHEN cc = 2 THEN 1 ELSE 0 END) AS BIGINT) AS e2,
           |    CAST(sum(CASE WHEN cc >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS e3
           |  FROM cc2 GROUP BY 1),
           |tf AS (SELECT doc_id, tg, CAST(count(*) AS BIGINT) AS tf,
           |    split_part(tg, ' ', 1) AS w1, split_part(tg, ' ', 2) AS w2,
           |    split_part(tg, ' ', 3) AS w3
           |  FROM (SELECT doc_id, $tgs AS tg FROM base WHERE len(w) >= 3)
           |  GROUP BY 1, 2),
           |pp AS (SELECT t.doc_id, t.tf,
           |    (CASE WHEN x3.t3 IS NOT NULL THEN
           |        greatest(CAST(coalesce(g.c3, 0) AS DOUBLE) -
           |          (CASE WHEN coalesce(g.c3, 0) >= 3 THEN s.d33
           |                WHEN coalesce(g.c3, 0) = 2 THEN s.d32
           |                WHEN coalesce(g.c3, 0) = 1 THEN s.d31
           |                ELSE CAST(0.0 AS DOUBLE) END),
           |          CAST(0.0 AS DOUBLE)) / CAST(x3.t3 AS DOUBLE)
           |      ELSE CAST(0.0 AS DOUBLE) END) +
           |    coalesce((s.d31 * x3.b1 + s.d32 * x3.b2 + s.d33 * x3.b3) /
           |        CAST(x3.t3 AS DOUBLE), CAST(1.0 AS DOUBLE)) *
           |    ((CASE WHEN x2.t2 IS NOT NULL THEN
           |        greatest(CAST(coalesce(c.cc, 0) AS DOUBLE) -
           |          (CASE WHEN coalesce(c.cc, 0) >= 3 THEN s.d23
           |                WHEN coalesce(c.cc, 0) = 2 THEN s.d22
           |                WHEN coalesce(c.cc, 0) = 1 THEN s.d21
           |                ELSE CAST(0.0 AS DOUBLE) END),
           |          CAST(0.0 AS DOUBLE)) / CAST(x2.t2 AS DOUBLE)
           |      ELSE CAST(0.0 AS DOUBLE) END) +
           |     coalesce((s.d21 * x2.e1 + s.d22 * x2.e2 + s.d23 * x2.e3) /
           |         CAST(x2.t2 AS DOUBLE), CAST(1.0 AS DOUBLE)) *
           |     (greatest(CAST(coalesce(u.cu, 0) AS DOUBLE) -
           |          (CASE WHEN coalesce(u.cu, 0) >= 3 THEN s.d13
           |                WHEN coalesce(u.cu, 0) = 2 THEN s.d12
           |                WHEN coalesce(u.cu, 0) = 1 THEN s.d11
           |                ELSE CAST(0.0 AS DOUBLE) END),
           |          CAST(0.0 AS DOUBLE)) / CAST(s.cut AS DOUBLE) +
           |      s.g1 / CAST(s.v AS DOUBLE))) AS p
           |  FROM tf t
           |  LEFT JOIN tg g USING (tg)
           |  LEFT JOIN ctx3 x3 ON x3.w1 = t.w1 AND x3.w2 = t.w2
           |  LEFT JOIN cc2 c ON c.w2 = t.w2 AND c.w3 = t.w3
           |  LEFT JOIN ctx2 x2 ON x2.w2 = t.w2
           |  LEFT JOIN cu u ON u.w3 = t.w3
           |  CROSS JOIN scal s),
           |sc AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_trigrams,
           |    sum(CAST(tf AS DOUBLE) * ln(p)) / CAST(sum(tf) AS DOUBLE)
           |      AS avg_logp
           |  FROM pp GROUP BY 1)
           |SELECT d.doc_id,
           |  CAST(coalesce(sc.n_trigrams, 0) AS BIGINT) AS n_trigrams,
           |  round(coalesce(sc.avg_logp, 0.0), 6) AS avg_logp
           |FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id IS NOT NULL) d
           |LEFT JOIN sc USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      },

      // .vec round-trip: the oracle recomputes the vectors from nation
      // directly — every component is exactly representable in binary
      // (quarters/eighths), so the text-format round-trip the engine
      // performs is bit-lossless and hashes must match.
      "q157_vec_load" ->
        """SELECT regexp_replace(lower(n_name), '[^a-z]', '_', 'g') AS word, j, v
          |FROM (
          |  SELECT n_name, 0 AS j, n_nationkey * 0.25e0 AS v FROM nation
          |  UNION ALL SELECT n_name, 1, n_regionkey * 1.5e0 - 3.0e0 FROM nation
          |  UNION ALL SELECT n_name, 2, (n_nationkey % 7) * 0.5e0 - 1.5e0 FROM nation
          |  UNION ALL SELECT n_name, 3, length(n_name) * 0.125e0 FROM nation)
          |ORDER BY word, j""".stripMargin,

      // Streaming curation replay: q52's cleaning/feature/filter stages
      // verbatim (shared CTE builders), per-shard pre-thinning on the
      // cleaned-content fingerprint, first-shard-wins suppression among
      // FILTERED rows (the engine dedups after its filters), id-hash
      // sampling last — the batch window-dedup swapped for exactly the
      // state the streaming query keeps.
      "q154_streaming_curate" -> {
        val ctc = toksSql("text_clean")
        s"""WITH dup AS (SELECT * FROM ${withDupsSql("documents", "doc_id", 50, 10000)}
           |            WHERE text IS NOT NULL),
           |injected AS (
           |  SELECT doc_id AS id,
           |    CASE WHEN doc_id % 3 = 0
           |      THEN t2 || ' contact alice.smith@example.org or +1 (415) 555-0100'
           |      ELSE t2 END AS text,
           |    CASE WHEN doc_id < 200 THEN 0 WHEN doc_id < 400 THEN 1
           |         ELSE 2 END AS batch
           |  FROM (SELECT doc_id, CASE WHEN doc_id % 4 = 0
           |          THEN '<html><p class="x">' || text || '</p> see https://example.com/a?b=1 now</html>'
           |          ELSE text END AS t2
           |        FROM dup)),
           |${curateCleanedSql(Seq("batch"))},
           |thin AS (SELECT id, batch, text_clean FROM (
           |    SELECT c.*, row_number() OVER (PARTITION BY batch,
           |      md5(array_to_string($ctc, ' ')) ORDER BY id) AS rn
           |    FROM cleaned c) WHERE rn = 1),
           |${curateFeatFiltSql("thin", Seq("batch"))},
           |adm AS (SELECT f.* FROM filt f WHERE NOT EXISTS (
           |  SELECT 1 FROM filt e WHERE e.fp = f.fp AND e.batch < f.batch))
           |SELECT id AS doc_id, text_clean, lang,
           |  round(quality, 6) AS quality, n_tokens
           |FROM adm WHERE (${hash31Sql("CAST(id AS VARCHAR)")}) % 10000 < 5000
           |ORDER BY doc_id""".stripMargin
      },

      // Full-width (32 tokens × 100 dims) profile replay — q34's
      // md5-embedder reconstruction made position-GENERIC (one md5 per
      // (doc, position) row instead of one UNION branch per dimension,
      // which at 3200 dims would be 3200 table scans): per-dim moments
      // for the reported dims, covariance trace over ALL dims. chol_ok
      // is the oracle's assertion that the engine's 3200² Cholesky
      // factorization succeeded.
      "q125_text_profile_wide" -> {
        val d = 100; val n = d * 32
        val hashFromM = (0 until 7).map { k =>
          s"(instr('0123456789abcdef', substr(m, ${k + 1}, 1)) - 1) * ${1L << (4 * (6 - k))}"
        }.mkString("(", " + ", ")")
        s"""WITH t AS (
           |  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
           |    x -> length(x) BETWEEN 2 AND 15) AS toks
           |  FROM documents WHERE text IS NOT NULL),
           |v0 AS (
           |  SELECT i, CASE WHEN len(toks) > i // $d
           |    THEN md5(toks[i // $d + 1] || '#' || CAST(i % $d AS VARCHAR))
           |    END AS m
           |  FROM t CROSS JOIN range($n) r(i)),
           |vals AS (
           |  SELECT i AS dim_idx,
           |    CASE WHEN m IS NULL THEN 0.0
           |      ELSE CAST($hashFromM AS DOUBLE) / 268435456.0 * 2.0 - 1.0
           |    END AS v
           |  FROM v0),
           |agg AS (SELECT dim_idx, count(*) AS n, sum(v) AS s1, sum(v*v) AS s2
           |        FROM vals GROUP BY dim_idx),
           |tr AS (SELECT sum((s2 - n*(s1/n)*(s1/n))/(n-1)) AS trace FROM agg)
           |SELECT CAST(dim_idx AS INT) AS dim_idx,
           |  round(s1/n, 6) AS mean,
           |  round(sqrt(greatest(s2/n - (s1/n)*(s1/n), 0)), 6) AS std,
           |  round(tr.trace, 6) AS cov_trace,
           |  TRUE AS chol_ok,
           |  CAST(n AS BIGINT) AS n_docs
           |FROM agg CROSS JOIN tr WHERE dim_idx < 8 ORDER BY dim_idx""".stripMargin
      },

      // Content parity of the compacted directory with the source table;
      // files_after = 1 is the deterministic size-derived count at test
      // scale (the directory is far under one 256 MB target file).
      "q124_compact_sink" ->
        """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          |  CAST(1 AS INT) AS files_after
          |FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL
          |GROUP BY 1 ORDER BY source""".stripMargin,

      // int8 quantization replay: same double-precision op order as the
      // engine (cast-to-double, amax/127 scale, round-half-up clamp,
      // left-fold residual sum) so every column hashes bit-equal. The
      // residual lambda recomputes the quantized value instead of
      // indexing qvec — no index-lambda dependence, same arithmetic.
      "q126_quantize_int8" ->
        """WITH v AS (SELECT vec_id,
          |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
          |  FROM embeddings WHERE embedding IS NOT NULL),
          |a AS (SELECT vec_id, vv,
          |    list_max(list_transform(vv, x -> abs(x))) AS amax FROM v),
          |s AS (SELECT vec_id, vv, amax, amax / 127.0 AS scale FROM a)
          |SELECT vec_id, scale,
          |  CASE WHEN amax = 0 THEN array_to_string(
          |         list_transform(vv, x -> '0'), ',')
          |       ELSE array_to_string(list_transform(vv, x ->
          |         CAST(CAST(least(greatest(floor(x / scale + 0.5), -127.0), 127.0)
          |           AS TINYINT) AS VARCHAR)), ',') END AS qvec,
          |  CASE WHEN amax = 0 THEN 0
          |       ELSE CAST(list_sum(list_transform(vv, x ->
          |         CASE WHEN abs(floor(x / scale + 0.5)) > 127.0
          |              THEN 1 ELSE 0 END)) AS INT) END AS n_clipped,
          |  CASE WHEN amax = 0 THEN 0.0
          |       ELSE round(sqrt(list_sum(list_transform(vv, x ->
          |         (x - least(greatest(floor(x / scale + 0.5), -127.0), 127.0) * scale)
          |         * (x - least(greatest(floor(x / scale + 0.5), -127.0), 127.0) * scale)
          |       ))), 6) END AS err_l2
          |FROM s ORDER BY vec_id""".stripMargin,

      // JS divergence replay: present-(group, token)-pair sums plus the
      // closed-form ln2 tail for group-absent tokens, matching the
      // engine's formulation term for term.
      "q127_token_js_divergence" ->
        s"""WITH tk AS (SELECT source AS grp, u.t AS tok
           |  FROM documents, UNNEST(${toksSql("text")}) AS u(t)
           |  WHERE source IS NOT NULL AND text IS NOT NULL),
           |pairs AS (SELECT grp, tok, count(*) AS c_gt FROM tk GROUP BY 1, 2),
           |g AS (SELECT grp, CAST(sum(c_gt) AS BIGINT) AS n_tokens
           |      FROM pairs GROUP BY 1),
           |t AS (SELECT tok, CAST(sum(c_gt) AS BIGINT) AS c_t
           |      FROM pairs GROUP BY 1),
           |n AS (SELECT CAST(sum(c_gt) AS BIGINT) AS n FROM pairs),
           |terms AS (SELECT p.grp,
           |    CAST(p.c_gt AS DOUBLE) / CAST(g.n_tokens AS DOUBLE) AS pp,
           |    CAST(t.c_t AS DOUBLE) / CAST(n.n AS DOUBLE) AS qq
           |  FROM pairs p JOIN g USING (grp) JOIN t USING (tok) CROSS JOIN n),
           |acc AS (SELECT grp,
           |    sum(0.5 * (pp * ln(pp / ((pp + qq) / 2.0))
           |             + qq * ln(qq / ((pp + qq) / 2.0)))) AS js_p,
           |    sum(qq) AS q_p
           |  FROM terms GROUP BY grp),
           |d AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_docs
           |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
           |  GROUP BY 1)
           |SELECT acc.grp AS source, d.n_docs, g.n_tokens,
           |  round(js_p + 0.5 * ln(2.0) * (1.0 - q_p), 6) AS js_nats
           |FROM acc JOIN g USING (grp) JOIN d USING (grp)
           |ORDER BY source""".stripMargin,

      // int8 ANN replay: the same quantizer as q126, then pure integer
      // dot products (exact in doubles — far below 2^53), so sim is
      // bit-identical with no float-sum-order caveat anywhere.
      "q128_ann_int8" ->
        """WITH v AS (SELECT vec_id,
          |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
          |  FROM embeddings WHERE embedding IS NOT NULL),
          |a AS (SELECT vec_id, vv,
          |    list_max(list_transform(vv, x -> abs(x))) AS amax FROM v),
          |s AS (SELECT vec_id, vv, amax, amax / 127.0 AS scale FROM a),
          |qz AS (SELECT vec_id,
          |    CASE WHEN amax = 0 THEN list_transform(vv, x -> CAST(0 AS DOUBLE))
          |         ELSE list_transform(vv, x ->
          |           least(greatest(floor(x / scale + 0.5), -127.0), 127.0)) END AS qv
          |  FROM s),
          |n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS nn FROM qz),
          |q AS (SELECT * FROM n WHERE vec_id < 5 AND nn > 0),
          |c AS (SELECT * FROM n WHERE vec_id >= 5 AND nn > 0),
          |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |    list_dot_product(q.qv, c.qv) / (sqrt(q.nn) * sqrt(c.nn)) AS sim
          |  FROM q CROSS JOIN c)
          |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim FROM (
          |  SELECT query_id, neighbor_id, sim,
          |    row_number() OVER (PARTITION BY query_id
          |      ORDER BY sim DESC, neighbor_id ASC) AS rank FROM p)
          |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

      // int8 auto-gate IVF-route replay: q128's quantizer CTEs feed
      // q30's IVF algebra — centroids = 16 lowest-id QUANTIZED corpus
      // vectors, cosine assignment/probing with the zero-norm → 0.0
      // convention of the engine's pairSim, integer dot products exact
      // in doubles so sims are bit-identical cross-engine.
      "q147_ann_int8_ivf" ->
        """WITH v AS (SELECT vec_id,
          |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
          |  FROM embeddings WHERE embedding IS NOT NULL),
          |a AS (SELECT vec_id, vv,
          |    list_max(list_transform(vv, x -> abs(x))) AS amax FROM v),
          |s AS (SELECT vec_id, vv, amax, amax / 127.0 AS scale FROM a),
          |qz AS (SELECT vec_id,
          |    CASE WHEN amax = 0 THEN list_transform(vv, x -> CAST(0 AS DOUBLE))
          |         ELSE list_transform(vv, x ->
          |           least(greatest(floor(x / scale + 0.5), -127.0), 127.0)) END AS qv
          |  FROM s),
          |n AS (SELECT vec_id, qv, sqrt(list_dot_product(qv, qv)) AS nrm FROM qz),
          |q AS (SELECT * FROM n WHERE vec_id < 5),
          |c AS (SELECT * FROM n WHERE vec_id >= 5),
          |cent AS (SELECT vec_id AS centroid_id, qv AS cv, nrm AS cn
          |         FROM c ORDER BY vec_id LIMIT 16),
          |assigned AS (
          |  SELECT vec_id AS id, qv AS vec, nrm AS vn, centroid_id FROM (
          |    SELECT c.vec_id, c.qv, c.nrm, ct.centroid_id,
          |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
          |        (CASE WHEN c.nrm = 0 OR ct.cn = 0 THEN 0.0
          |              ELSE list_dot_product(c.qv, ct.cv) / (c.nrm * ct.cn) END) DESC,
          |        ct.centroid_id ASC) AS rn
          |    FROM c CROSS JOIN cent ct)
          |  WHERE rn = 1),
          |probes AS (
          |  SELECT vec_id AS query_id, qv, nrm AS qn, centroid_id FROM (
          |    SELECT q.vec_id, q.qv, q.nrm, ct.centroid_id,
          |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
          |        (CASE WHEN q.nrm = 0 OR ct.cn = 0 THEN 0.0
          |              ELSE list_dot_product(q.qv, ct.cv) / (q.nrm * ct.cn) END) DESC,
          |        ct.centroid_id ASC) AS rn
          |    FROM q CROSS JOIN cent ct)
          |  WHERE rn <= 4),
          |scored AS (
          |  SELECT p.query_id, a.id AS neighbor_id,
          |    CASE WHEN p.qn = 0 OR a.vn = 0 THEN 0.0
          |         ELSE list_dot_product(p.qv, a.vec) / (p.qn * a.vn) END AS sim
          |  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id)
          |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim FROM (
          |  SELECT query_id, neighbor_id, sim,
          |    row_number() OVER (PARTITION BY query_id
          |      ORDER BY sim DESC, neighbor_id ASC) AS rank
          |  FROM scored)
          |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

      // PQ replay: grouped Lloyd per subspace (L2 assignment, ties →
      // lowest centroid id — list_distance is monotone with the
      // engine's squared form), then the code table.
      "q130_pq_codes" ->
        s"""WITH ${pqSql("")}
           |SELECT id AS vec_id, CAST(subspace AS INT) AS subspace, code
           |FROM pcodes ORDER BY vec_id, subspace""".stripMargin,

      // ADC replay: per-query subspace distance tables joined to the
      // code table; adist = sum of the m table entries.
      "q131_pq_ann" ->
        s"""WITH $pqAdcSql
           |SELECT query_id, rank, neighbor_id, round(adist, 6) AS adist
           |FROM pqtop ORDER BY query_id, rank""".stripMargin,

      "q138_k_anonymity" ->
        """WITH g AS (SELECT c_nationkey, c_mktsegment,
          |    CAST(count(*) AS BIGINT) AS gn
          |  FROM customer GROUP BY 1, 2)
          |SELECT CAST(sum(gn) AS BIGINT) AS n_rows,
          |  CAST(count(*) AS BIGINT) AS n_groups,
          |  CAST(min(gn) AS BIGINT) AS min_group_size,
          |  CAST(coalesce(sum(CASE WHEN gn < 10 THEN gn END), 0) AS BIGINT) AS rows_below_k,
          |  round(CAST(coalesce(sum(CASE WHEN gn < 10 THEN gn END), 0) AS DOUBLE)
          |    / CAST(sum(gn) AS DOUBLE), 6) AS share_below_k
          |FROM g""".stripMargin,

      // l-diversity replay: (QI, sensitive) cell counts, per-group
      // entropy via the same ln(gn) − Σcn·ln(cn)/gn algebra, scalar
      // roll-up; rounds to 6 after the group-min so the float-sum
      // ordering difference between engines stays below the compare.
      "q143_l_diversity" ->
        """WITH cell AS (SELECT c_nationkey, c_mktsegment,
          |    CAST(floor(c_acctbal / 2000) AS INT) AS bal_band,
          |    CAST(count(*) AS BIGINT) AS cn
          |  FROM customer GROUP BY 1, 2, 3),
          |g AS (SELECT c_nationkey, c_mktsegment,
          |    CAST(sum(cn) AS BIGINT) AS gn,
          |    CAST(count(*) AS BIGINT) AS nd,
          |    sum(CAST(cn AS DOUBLE) * ln(CAST(cn AS DOUBLE))) AS sl
          |  FROM cell GROUP BY 1, 2)
          |SELECT CAST(sum(gn) AS BIGINT) AS n_rows,
          |  CAST(count(*) AS BIGINT) AS n_groups,
          |  CAST(min(nd) AS BIGINT) AS min_distinct_l,
          |  CAST(coalesce(sum(CASE WHEN nd < 3 THEN gn END), 0) AS BIGINT) AS rows_below_l,
          |  round(CAST(coalesce(sum(CASE WHEN nd < 3 THEN gn END), 0) AS DOUBLE)
          |    / CAST(sum(gn) AS DOUBLE), 6) AS share_below_l,
          |  round(min(exp(ln(CAST(gn AS DOUBLE)) - sl / CAST(gn AS DOUBLE))), 6)
          |    AS min_entropy_l
          |FROM g""".stripMargin,

      // audio-histogram replay (q109's shape for PCM): sample i of doc
      // d is ((s0 + i*s1) mod 65536) - 32768, so its 16-bucket index is
      // ((s0 + i*s1) mod 65536) * 16 // 65536 — generate_series replays
      // the stream, the histogram is pure counting.
      "q144_audio_histogram" ->
        s"""WITH d AS (SELECT doc_id,
           |    CAST(64 + ((${hd(5)} * 16 + ${hd(6)}) * 256 + (${hd(7)} * 16 + ${hd(8)})) % 960 AS INT) AS n,
           |    CAST((${hd(9)} * 16 + ${hd(10)}) * 256 + (${hd(11)} * 16 + ${hd(12)}) AS INT) AS s0,
           |    CAST(1 + (${hd(13)} * 16 + ${hd(14)}) % 255 AS INT) AS s1
           |  FROM documents WHERE text IS NOT NULL),
           |px AS (SELECT doc_id, n, s0, s1,
           |    unnest(generate_series(0, n - 1)) AS i FROM d),
           |pc AS (SELECT doc_id,
           |    ((s0 + i * s1) % 65536) * 16 // 65536 AS bucket,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM px GROUP BY 1, 2),
           |b AS (SELECT doc_id, n,
           |    unnest(generate_series(0, 15)) AS bucket FROM d)
           |SELECT b.doc_id, CAST(b.bucket AS INT) AS bucket,
           |  CAST((coalesce(pc.c, 0) * 2000000 + b.n) // (2 * b.n)
           |    AS DOUBLE) / 1000000.0 AS frac
           |FROM b LEFT JOIN pc ON pc.doc_id = b.doc_id AND pc.bucket = b.bucket
           |ORDER BY 1, 2""".stripMargin,

      // video-histogram replay (q109's shape over frames): pixel j of
      // doc d — j flat over width·height·nFrames — is
      // (s0 + j*s1) mod 256, so its 16-bucket index is
      // ((s0 + j*s1) mod 256) * 16 // 256. The container's frame rate
      // never appears: the embedding is content-only by construction.
      "q146_video_histogram" ->
        s"""WITH d AS (SELECT doc_id,
           |    CAST((8 + (${hd(1)} * 16 + ${hd(2)}) % 8)
           |       * (8 + (${hd(3)} * 16 + ${hd(4)}) % 8)
           |       * (2 + (${hd(5)} * 16 + ${hd(6)}) % 4) AS BIGINT) AS n,
           |    CAST((${hd(7)} * 16 + ${hd(8)}) * 256 + (${hd(9)} * 16 + ${hd(10)}) AS INT) AS s0,
           |    CAST(1 + (${hd(11)} * 16 + ${hd(12)}) % 255 AS INT) AS s1
           |  FROM documents WHERE text IS NOT NULL),
           |px AS (SELECT doc_id, n, s0, s1,
           |    unnest(generate_series(0, n - 1)) AS j FROM d),
           |pc AS (SELECT doc_id,
           |    ((s0 + j * s1) % 256) * 16 // 256 AS bucket,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM px GROUP BY 1, 2),
           |b AS (SELECT doc_id, n,
           |    unnest(generate_series(0, 15)) AS bucket FROM d)
           |SELECT b.doc_id, CAST(b.bucket AS INT) AS bucket,
           |  round(CAST(coalesce(pc.c, 0) AS DOUBLE) / b.n, 6) AS frac
           |FROM b LEFT JOIN pc ON pc.doc_id = b.doc_id AND pc.bucket = b.bucket
           |ORDER BY 1, 2""".stripMargin,

      // streaming sessionize replay: the stream's final per-user state
      // must equal the batch lag-window sessionize over the full table
      // (q18's algebra) — the session-increment rule depends only on
      // consecutive timestamp gaps, which micro-batch boundaries in a
      // time-ordered feed never change.
      "q145_streaming_sessionize" ->
        """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
          |  count(*) AS n_events
          |FROM (
          |  SELECT user_id,
          |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
          |         THEN 1 ELSE 0 END AS new_session
          |  FROM events)
          |GROUP BY user_id ORDER BY user_id""".stripMargin,

      // char-window dedup coverage: generate_series replays the
      // stride-20 window starts; everything after the substr is the
      // same fingerprint-count algebra as q55's.
      "q139_window_dedup" ->
        s"""WITH dup AS (SELECT * FROM ${withDupsSql("documents", "doc_id", 50, 10000)}),
           |w AS (SELECT doc_id, md5(substr(text, CAST(i AS INT) + 1, 40)) AS fp
           |      FROM (SELECT doc_id, text,
           |              unnest(generate_series(0, CAST(length(text) - 40 AS BIGINT), 20)) AS i
           |            FROM dup WHERE text IS NOT NULL AND length(text) >= 40)),
           |pairs AS (SELECT doc_id, fp, count(*) AS c FROM w GROUP BY 1, 2),
           |dfreq AS (SELECT fp, count(*) AS n_docs FROM pairs GROUP BY 1),
           |perdoc AS (SELECT doc_id,
           |  CAST(sum(c) AS BIGINT) AS n_windows,
           |  CAST(sum(CASE WHEN n_docs > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_windows
           |  FROM pairs JOIN dfreq USING (fp) GROUP BY 1)
           |SELECT d.doc_id,
           |  CAST(coalesce(p.n_windows, 0) AS BIGINT) AS n_windows,
           |  CAST(coalesce(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           |  round(coalesce(CAST(p.n_dup_windows AS DOUBLE) / p.n_windows, 0.0), 6) AS dup_window_frac
           |FROM dup d LEFT JOIN perdoc p USING (doc_id)
           |ORDER BY doc_id""".stripMargin,

      // keep-best dedup: row_number replays the (score DESC, id ASC)
      // arg-max the engine carries as a struct max.
      "q140_keep_best" ->
        s"""WITH dup AS (SELECT * FROM ${withDupsSql("documents", "doc_id", 50, 10000)}),
           |sc AS (SELECT doc_id, text,
           |  (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
           |  (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS score
           |  FROM dup),
           |r AS (SELECT md5(text) AS fp, doc_id, score,
           |  row_number() OVER (PARTITION BY md5(text) ORDER BY score DESC, doc_id ASC) AS rn,
           |  count(*) OVER (PARTITION BY md5(text)) AS dup_count
           |  FROM sc)
           |SELECT fp, CAST(doc_id AS BIGINT) AS keep_id,
           |  CAST(score AS BIGINT) AS keep_score,
           |  CAST(dup_count AS BIGINT) AS dup_count
           |FROM r WHERE rn = 1 ORDER BY fp""".stripMargin,

      // span removal: row_number elects the global first occurrence per
      // fingerprint; islands-and-gaps merges removal intervals; the
      // ordered string_agg of inter-span gaps plus the tail suffix
      // replays the engine's fold rebuild.
      "q141_span_removal" ->
        s"""WITH dup AS (SELECT * FROM ${withDupsSql("documents", "doc_id", 50, 10000)}),
           |b AS (SELECT doc_id, text FROM dup),
           |w AS (SELECT doc_id, CAST(i AS INT) AS off,
           |        md5(substr(text, CAST(i AS INT) + 1, 40)) AS fp
           |      FROM (SELECT doc_id, text,
           |              unnest(generate_series(0, CAST(length(text) - 40 AS BIGINT), 20)) AS i
           |            FROM b WHERE text IS NOT NULL AND length(text) >= 40)),
           |f AS (SELECT doc_id, off,
           |        row_number() OVER (PARTITION BY fp ORDER BY doc_id, off) AS rn,
           |        count(*) OVER (PARTITION BY fp) AS occ FROM w),
           |rem AS (SELECT doc_id, off FROM f WHERE occ > 1 AND rn > 1),
           |isl AS (SELECT doc_id, off,
           |         CASE WHEN off <= coalesce(max(off + 40) OVER (PARTITION BY doc_id
           |              ORDER BY off ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |              -1) THEN 0 ELSE 1 END AS brk
           |        FROM rem),
           |g AS (SELECT doc_id, off,
           |        sum(brk) OVER (PARTITION BY doc_id ORDER BY off) AS grp FROM isl),
           |m AS (SELECT doc_id, grp, min(off) AS s, max(off) + 40 AS e
           |      FROM g GROUP BY 1, 2),
           |seg AS (SELECT doc_id, s, e,
           |          coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS p
           |        FROM m),
           |c1 AS (SELECT seg.doc_id,
           |         string_agg(substr(t2.text, seg.p + 1, seg.s - seg.p), '' ORDER BY seg.s) AS gaps,
           |         max(seg.e) AS laste,
           |         CAST(count(*) AS BIGINT) AS n_spans
           |       FROM seg JOIN b t2 ON seg.doc_id = t2.doc_id GROUP BY seg.doc_id)
           |SELECT d.doc_id,
           |  CASE WHEN c1.doc_id IS NULL THEN d.text
           |       ELSE c1.gaps || substr(d.text, c1.laste + 1) END AS clean_text,
           |  coalesce(c1.n_spans, 0) AS n_spans_removed,
           |  CAST(coalesce(length(d.text), 0)
           |    - coalesce(length(CASE WHEN c1.doc_id IS NULL THEN d.text
           |        ELSE c1.gaps || substr(d.text, c1.laste + 1) END), 0) AS BIGINT)
           |    AS n_chars_removed
           |FROM b d LEFT JOIN c1 ON d.doc_id = c1.doc_id
           |ORDER BY d.doc_id""".stripMargin,

      // Maximal-dup-span replay: stride-1 L-gram marking (ALL
      // occurrences of a duplicated gram), islands-and-gaps union of
      // the marked windows — the SQL image of the engine's
      // constant-width merge.
      "q197_max_dup_spans" ->
        s"""WITH dup AS (SELECT * FROM ${withDupsSql("documents", "doc_id", 50, 10000)}),
           |w AS (SELECT doc_id, CAST(i AS INT) AS off,
           |        md5(substr(text, CAST(i AS INT) + 1, 40)) AS fp
           |      FROM (SELECT doc_id, text,
           |              unnest(generate_series(0, CAST(length(text) - 40 AS BIGINT), 1)) AS i
           |            FROM dup WHERE doc_id IS NOT NULL
           |              AND text IS NOT NULL AND length(text) >= 40)),
           |dfp AS (SELECT fp FROM w GROUP BY fp HAVING count(*) > 1),
           |m AS (SELECT doc_id, off FROM w JOIN dfp USING (fp)),
           |isl AS (SELECT doc_id, off,
           |         CASE WHEN off <= coalesce(max(off + 40) OVER (PARTITION BY doc_id
           |              ORDER BY off ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |              -1) THEN 0 ELSE 1 END AS brk
           |        FROM m),
           |g AS (SELECT doc_id, off,
           |        sum(brk) OVER (PARTITION BY doc_id ORDER BY off) AS grp FROM isl)
           |SELECT doc_id, CAST(min(off) AS BIGINT) AS span_start,
           |  CAST(max(off) + 40 AS BIGINT) AS span_end,
           |  CAST(max(off) + 40 - min(off) AS BIGINT) AS span_len
           |FROM g GROUP BY doc_id, grp
           |ORDER BY doc_id, span_start""".stripMargin,

      // Stride-1 span-removal replay: q141's SQL with step 1 — the
      // full-precision rewrite (first occurrence elected per
      // fingerprint, islands-and-gaps merge, gap string_agg rebuild).
      "q198_exact_substr_rewrite" ->
        s"""WITH dup AS (SELECT * FROM ${withDupsSql("documents", "doc_id", 50, 10000)}),
           |b AS (SELECT doc_id, text FROM dup),
           |w AS (SELECT doc_id, CAST(i AS INT) AS off,
           |        md5(substr(text, CAST(i AS INT) + 1, 40)) AS fp
           |      FROM (SELECT doc_id, text,
           |              unnest(generate_series(0, CAST(length(text) - 40 AS BIGINT), 1)) AS i
           |            FROM b WHERE text IS NOT NULL AND length(text) >= 40)),
           |f AS (SELECT doc_id, off,
           |        row_number() OVER (PARTITION BY fp ORDER BY doc_id, off) AS rn,
           |        count(*) OVER (PARTITION BY fp) AS occ FROM w),
           |rem AS (SELECT doc_id, off FROM f WHERE occ > 1 AND rn > 1),
           |isl AS (SELECT doc_id, off,
           |         CASE WHEN off <= coalesce(max(off + 40) OVER (PARTITION BY doc_id
           |              ORDER BY off ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |              -1) THEN 0 ELSE 1 END AS brk
           |        FROM rem),
           |g AS (SELECT doc_id, off,
           |        sum(brk) OVER (PARTITION BY doc_id ORDER BY off) AS grp FROM isl),
           |m AS (SELECT doc_id, grp, min(off) AS s, max(off) + 40 AS e
           |      FROM g GROUP BY 1, 2),
           |seg AS (SELECT doc_id, s, e,
           |          coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS p
           |        FROM m),
           |c1 AS (SELECT seg.doc_id,
           |         string_agg(substr(t2.text, seg.p + 1, seg.s - seg.p), '' ORDER BY seg.s) AS gaps,
           |         max(seg.e) AS laste,
           |         CAST(count(*) AS BIGINT) AS n_spans
           |       FROM seg JOIN b t2 ON seg.doc_id = t2.doc_id GROUP BY seg.doc_id)
           |SELECT d.doc_id,
           |  CASE WHEN c1.doc_id IS NULL THEN d.text
           |       ELSE c1.gaps || substr(d.text, c1.laste + 1) END AS clean_text,
           |  coalesce(c1.n_spans, 0) AS n_spans_removed,
           |  CAST(coalesce(length(d.text), 0)
           |    - coalesce(length(CASE WHEN c1.doc_id IS NULL THEN d.text
           |        ELSE c1.gaps || substr(d.text, c1.laste + 1) END), 0) AS BIGINT)
           |    AS n_chars_removed
           |FROM b d LEFT JOIN c1 ON d.doc_id = c1.doc_id
           |ORDER BY d.doc_id""".stripMargin,

      // 1-bit sign packing replay: the same 32-dim BIGINT words, same
      // shifts, same tie-at-zero → 0 convention, word list rendered
      // through the same comma join.
      "q199_binary_sign" ->
        """WITH v AS (SELECT vec_id,
          |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
          |  FROM embeddings WHERE embedding IS NOT NULL)
          |SELECT vec_id,
          |  array_to_string(list_transform(
          |    range(0, CAST(ceil(len(vv) / 32.0) AS INT)), w ->
          |      CAST(CAST(coalesce(list_sum(list_transform(
          |        range(w * 32, CAST(least(w * 32 + 32, len(vv)) AS INT)), i ->
          |          CASE WHEN vv[i + 1] > 0 THEN (CAST(1 AS BIGINT) << (i - w * 32))
          |               ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS VARCHAR)),
          |    ',') AS words,
          |  CAST(coalesce(list_sum(list_transform(vv, x ->
          |    CASE WHEN x > 0 THEN 1 ELSE 0 END)), 0) AS INT) AS n_pos
          |FROM v ORDER BY vec_id""".stripMargin,

      // Binary ANN replay: the identical two-stage contract — Hamming
      // top-40 on the packed words (integer xor/popcount, id
      // tie-break), exact double-cosine rerank over the candidates.
      "q200_hamming_ann" ->
        """WITH v AS (SELECT vec_id,
          |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
          |  FROM embeddings WHERE embedding IS NOT NULL),
          |b AS (SELECT vec_id, vv,
          |    list_transform(range(0, CAST(ceil(len(vv) / 32.0) AS INT)), w ->
          |      CAST(coalesce(list_sum(list_transform(
          |        range(w * 32, CAST(least(w * 32 + 32, len(vv)) AS INT)), i ->
          |          CASE WHEN vv[i + 1] > 0 THEN (CAST(1 AS BIGINT) << (i - w * 32))
          |               ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT)) AS words
          |  FROM v),
          |q AS (SELECT * FROM b WHERE vec_id < 5),
          |c AS (SELECT * FROM b WHERE vec_id >= 5),
          |hd AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |    q.vv AS qv, c.vv AS cv,
          |    CAST(coalesce(list_sum(list_transform(
          |      range(0, CAST(len(q.words) AS INT)), i ->
          |        CAST(bit_count(xor(q.words[i + 1], c.words[i + 1])) AS BIGINT))),
          |      0) AS BIGINT) AS hd
          |  FROM q CROSS JOIN c),
          |cand AS (SELECT *, row_number() OVER (PARTITION BY query_id
          |    ORDER BY hd ASC, neighbor_id ASC) AS crank FROM hd),
          |rr AS (SELECT query_id, neighbor_id, hd,
          |    list_cosine_similarity(qv, cv) AS sim FROM cand WHERE crank <= 40)
          |SELECT query_id, rank, neighbor_id, hd, round(sim, 6) AS sim FROM (
          |  SELECT *, row_number() OVER (PARTITION BY query_id
          |    ORDER BY sim DESC, neighbor_id ASC) AS rank FROM rr)
          |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

      // Simplified-silhouette replay (shared kmeans CTE chain with q38).
      "q201_silhouette" -> q201Sql,

      // IVF-pruned binary ANN replay: q30's coarse-index CTEs (seed
      // centroids, cell assignment, nprobe probes) + the packed-word
      // Hamming rank restricted to probed cells + the shared
      // exact-cosine rerank.
      "q207_hamming_ann_ivf" -> q207HammingIvfSql,

      // The auto-gate registration routes to the SAME IVF plan
      // (maxFlatRows 100 < 495 corpus vectors), so the oracle IS
      // q207's replay — the gate may pick a route, never change it.
      "q211_hamming_ann_auto" -> q207HammingIvfSql,

      // Line-boilerplate replay: same in-query multi-line derivation,
      // split on chr(10) keeping empties, trimmed-line distinct-doc
      // threshold, anti-join rebuild with ordered string_agg.
      "q212_line_boilerplate" ->
        """WITH d AS (SELECT doc_id,
          |    CASE WHEN doc_id % 3 = 0
          |      THEN regexp_replace(text, ' table ', chr(10), 'g')
          |           || chr(10) || 'subscribe to our newsletter'
          |      ELSE regexp_replace(text, ' table ', chr(10), 'g') END AS text
          |  FROM documents),
          |parts AS (SELECT doc_id,
          |    unnest(range(len(ls))) AS i, unnest(ls) AS line FROM (
          |    SELECT doc_id, string_split(text, chr(10)) AS ls FROM d
          |    WHERE text IS NOT NULL)),
          |bad AS (SELECT trim(line) AS k FROM parts
          |  WHERE len(trim(line)) > 0
          |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 30),
          |badpos AS (SELECT doc_id, i FROM parts
          |  JOIN bad ON trim(parts.line) = bad.k),
          |nrem AS (SELECT doc_id, count(*) AS n FROM badpos GROUP BY 1),
          |kept AS (SELECT p.doc_id, p.i, p.line FROM parts p
          |  ANTI JOIN badpos b ON p.doc_id = b.doc_id AND p.i = b.i),
          |clean AS (SELECT doc_id,
          |    coalesce(string_agg(line, chr(10) ORDER BY i), '') AS ct
          |  FROM kept GROUP BY 1)
          |SELECT d.doc_id,
          |  CASE WHEN nrem.n IS NULL THEN d.text
          |       ELSE coalesce(clean.ct, '') END AS clean_text,
          |  coalesce(nrem.n, 0) AS n_lines_removed
          |FROM d LEFT JOIN nrem USING (doc_id) LEFT JOIN clean USING (doc_id)
          |ORDER BY doc_id""".stripMargin,

      // PII replay: identical RE2/Java-compatible patterns, same
      // injected contact tail, counts on the original text, chained
      // global replaces email -> IP -> phone.
      "q213_pii_redact" ->
        """WITH d AS (SELECT doc_id, text
          |    || ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.org'
          |    || CASE WHEN doc_id % 2 = 0
          |         THEN ' from 10.1.' || CAST(doc_id % 200 AS VARCHAR) || '.9'
          |         ELSE '' END
          |    || CASE WHEN doc_id % 5 = 0 THEN ' call 555-123-4567' ELSE '' END
          |    AS text FROM documents)
          |SELECT doc_id,
          |  regexp_replace(regexp_replace(regexp_replace(text,
          |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
          |    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS clean_text,
          |  CAST(len(regexp_extract_all(text,
          |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
          |  CAST(len(regexp_extract_all(text,
          |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
          |  CAST(len(regexp_extract_all(text,
          |    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS BIGINT) AS n_phones
          |FROM d ORDER BY doc_id""".stripMargin,

      // Bootstrap-CI replay: same md5 6-hex-digit resample indices,
      // same replica means, quantile_cont ≡ Spark's exact percentile.
      "q214_bootstrap_ci" ->
        """WITH base AS (SELECT vec_id,
          |    CASE WHEN (label % 2) =
          |      (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
          |      THEN 1 ELSE 0 END AS c
          |  FROM embeddings
          |  WHERE embedding IS NOT NULL AND label IS NOT NULL
          |    AND vec_id IS NOT NULL),
          |idx AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i2, c
          |  FROM base),
          |n AS (SELECT count(*) AS n FROM base),
          |draws AS (SELECT tb.range AS b,
          |    ((instr('0123456789abcdef', substr(md5('bs0:' || CAST(tb.range AS VARCHAR) || ':' || CAST(ti.i2 AS VARCHAR)), 1, 1)) - 1) * 1048576
          |   + (instr('0123456789abcdef', substr(md5('bs0:' || CAST(tb.range AS VARCHAR) || ':' || CAST(ti.i2 AS VARCHAR)), 2, 1)) - 1) * 65536
          |   + (instr('0123456789abcdef', substr(md5('bs0:' || CAST(tb.range AS VARCHAR) || ':' || CAST(ti.i2 AS VARCHAR)), 3, 1)) - 1) * 4096
          |   + (instr('0123456789abcdef', substr(md5('bs0:' || CAST(tb.range AS VARCHAR) || ':' || CAST(ti.i2 AS VARCHAR)), 4, 1)) - 1) * 256
          |   + (instr('0123456789abcdef', substr(md5('bs0:' || CAST(tb.range AS VARCHAR) || ':' || CAST(ti.i2 AS VARCHAR)), 5, 1)) - 1) * 16
          |   + (instr('0123456789abcdef', substr(md5('bs0:' || CAST(tb.range AS VARCHAR) || ':' || CAST(ti.i2 AS VARCHAR)), 6, 1)) - 1))
          |    % (SELECT n FROM n) AS i2
          |  FROM range(200) tb CROSS JOIN (SELECT i2 FROM idx) ti),
          |reps AS (SELECT d.b, avg(x.c) AS racc
          |  FROM draws d JOIN idx x USING (i2) GROUP BY d.b)
          |SELECT (SELECT n FROM n) AS n, 200 AS n_boot,
          |  round((SELECT avg(c) FROM base), 6) AS acc,
          |  round(quantile_cont(racc, 0.025), 6) AS ci_lo,
          |  round(quantile_cont(racc, 0.975), 6) AS ci_hi
          |FROM reps""".stripMargin,

      // Cohen's kappa replay: confusion cells, full-outer marginal
      // join, DECIMAL(38,0) products; kappa derived from the
      // UNROUNDED po/pe (the engine's order — rounding only the
      // published columns), identical double ops on exact sums.
      "q218_cohen_kappa" ->
        """WITH base AS (SELECT CAST(label % 3 AS INT) AS a,
          |    CAST((label + CASE WHEN vec_id % 7 = 0 THEN 1 ELSE 0 END) % 3
          |      AS INT) AS bb
          |  FROM embeddings
          |  WHERE label IS NOT NULL AND vec_id IS NOT NULL),
          |cells AS (SELECT a, bb, count(*) AS c FROM base GROUP BY 1, 2),
          |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
          |    CAST(coalesce(sum(CASE WHEN a = bb THEN c END), 0) AS BIGINT)
          |      AS agree FROM cells),
          |ma AS (SELECT a AS k, sum(c) AS na FROM cells GROUP BY 1),
          |mb AS (SELECT bb AS k, sum(c) AS nb FROM cells GROUP BY 1),
          |pe AS (SELECT sum(CAST(coalesce(na, 0) AS DECIMAL(38,0)) *
          |    CAST(coalesce(nb, 0) AS DECIMAL(38,0))) AS pen
          |  FROM ma FULL OUTER JOIN mb USING (k))
          |SELECT n, agree AS n_agree, round(po0, 6) AS po,
          |  round(pe0, 6) AS pe,
          |  round(CASE WHEN pe0 < 1.0 THEN (po0 - pe0) / (1.0 - pe0) END, 6)
          |    AS kappa
          |FROM (SELECT n, agree,
          |    CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS po0,
          |    CAST(pen AS DOUBLE) /
          |      CAST(CAST(n AS DECIMAL(38,0)) * n AS DOUBLE) AS pe0
          |  FROM tot, pe)""".stripMargin,

      // Code-fence replay: same RE2-safe pattern, parallel unnest of
      // the two capture groups zips positionally like arrays_zip.
      "q219_code_fences" ->
        """WITH d AS (SELECT doc_id, text ||
          |    CASE WHEN doc_id % 4 = 0 THEN chr(10) || '```python' ||
          |      chr(10) || 'print(' || CAST(doc_id % 100 AS VARCHAR) ||
          |      ')' || chr(10) || 'x = 1' || chr(10) || '```' || chr(10) ||
          |      'and' || chr(10) || '```' || chr(10) || 'plain block' ||
          |      chr(10) || '```' ELSE '' END ||
          |    CASE WHEN doc_id % 6 = 0 THEN chr(10) || '```sql' ||
          |      chr(10) || 'SELECT ' || CAST(doc_id % 10 AS VARCHAR) ||
          |      ';' || chr(10) || '```' ELSE '' END AS text
          |  FROM documents WHERE text IS NOT NULL),
          |m AS (SELECT doc_id,
          |    unnest(regexp_extract_all(text,
          |      '(?s)```([a-zA-Z0-9+_-]*)\n(.*?)```', 1)) AS lang,
          |    unnest(regexp_extract_all(text,
          |      '(?s)```([a-zA-Z0-9+_-]*)\n(.*?)```', 2)) AS body
          |  FROM d)
          |SELECT doc_id, lang, count(*) AS n_blocks,
          |  CAST(coalesce(sum(length(body)), 0) AS BIGINT) AS n_code_chars
          |FROM m GROUP BY 1, 2 ORDER BY doc_id, lang""".stripMargin,

      // ROC-AUC replay: same rank-sum identity over the grouped score
      // table, window cumsum standing in for the prefix pass; exact
      // DECIMAL(38,0) accumulation, one double division, round 6.
      "q217_auc_roc" ->
        """WITH b AS (SELECT CAST(label % 2 AS INT) AS y,
          |    CAST(embedding[1] AS DOUBLE)
          |      + CAST(label % 2 AS DOUBLE) * 0.3 AS s
          |  FROM embeddings
          |  WHERE embedding IS NOT NULL AND label IS NOT NULL),
          |c AS (SELECT s, count(*) AS cnt, sum(y) AS pos FROM b GROUP BY s),
          |r AS (SELECT cnt, pos, sum(cnt) OVER (ORDER BY s) AS cum FROM c),
          |a AS (SELECT CAST(sum(pos) AS BIGINT) AS np,
          |    CAST(sum(cnt) AS BIGINT) AS n,
          |    sum(CAST(pos AS DECIMAL(38,0)) *
          |        (CAST(cum AS DECIMAL(38,0)) * 2 - cnt + 1)) AS twoR
          |  FROM r)
          |SELECT n_pos, n_neg, auc, round(auc * 2 - 1, 6) AS gini FROM (
          |  SELECT np AS n_pos, n - np AS n_neg,
          |    round(CASE WHEN np > 0 AND n > np THEN
          |      CAST(twoR - CAST(np AS DECIMAL(38,0)) * (np + 1) AS DOUBLE)
          |      / CAST(CAST(np AS DECIMAL(38,0)) * 2 * (n - np) AS DOUBLE)
          |      END, 6) AS auc
          |  FROM a)""".stripMargin,

      // Matryoshka replay: exact cosine ranking per prefix width (same
      // split and tie-break as q28's oracle), overlap vs the m = 64
      // rows as ground truth.
      "q215_matryoshka_recall" -> {
        val ranked = Seq(8, 16, 32, 64).map { m =>
          s"""SELECT $m AS m, q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |    row_number() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_cosine_similarity(list_slice(q.v, 1, $m),
             |        list_slice(c.v, 1, $m)) DESC, c.vec_id ASC) AS rank
             |  FROM qv q CROSS JOIN cv c""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH qv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           |  FROM embeddings
           |  WHERE vec_id < 5 AND embedding IS NOT NULL AND len(embedding) >= 64),
           |cv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           |  FROM embeddings
           |  WHERE vec_id >= 5 AND embedding IS NOT NULL AND len(embedding) >= 64),
           |ranked AS ($ranked),
           |top AS (SELECT * FROM ranked WHERE rank <= 10),
           |truth AS (SELECT query_id, neighbor_id FROM top WHERE m = 64)
           |SELECT t.query_id, CAST(t.m AS INT) AS m,
           |  CAST(count(x.neighbor_id) AS BIGINT) AS n_overlap,
           |  round(CAST(count(x.neighbor_id) AS DOUBLE) / 10.0, 6) AS recall
           |FROM top t LEFT JOIN truth x
           |  ON t.query_id = x.query_id AND t.neighbor_id = x.neighbor_id
           |GROUP BY t.query_id, t.m ORDER BY t.query_id, t.m""".stripMargin
      },

      // Per-source frequent tokens replay: exact per-group counts with
      // each group's own ceil(support * n_g) floor.
      "q216_frequent_tokens_by" -> {
        val toks = toksSql("text")
        s"""WITH tk AS (SELECT source AS grp, u.t AS item
           |    FROM documents, UNNEST($toks) AS u(t)
           |    WHERE source IS NOT NULL),
           |  tot AS (SELECT grp, count(*) AS n FROM tk GROUP BY grp)
           |SELECT tk.grp AS source, tk.item, count(*) AS cnt
           |FROM tk JOIN tot USING (grp)
           |GROUP BY tk.grp, tk.item, tot.n
           |HAVING count(*) >=
           |  CAST(ceil(CAST(0.005 AS DOUBLE) * tot.n) AS BIGINT)
           |ORDER BY source, item""".stripMargin
      },

      // JL projection replay: the same md5-parity sign matrix
      // (±1/√16 = ±0.25, exact dyadic) rebuilt in SQL, left-fold sum.
      "q208_jl_projection" ->
        """WITH v AS (SELECT vec_id,
          |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
          |  FROM embeddings
          |  WHERE embedding IS NOT NULL AND len(embedding) = 64),
          |S AS (SELECT j, list(sgn ORDER BY i) AS sv FROM (
          |    SELECT j, i,
          |      CASE WHEN substr(md5('jl0:' || i || ':' || j), 1, 1)
          |             IN ('0','1','2','3','4','5','6','7')
          |           THEN CAST(0.25 AS DOUBLE)
          |           ELSE CAST(-0.25 AS DOUBLE) END AS sgn
          |    FROM range(16) t(j) CROSS JOIN range(64) u(i)) GROUP BY j),
          |p AS (SELECT vec_id, j,
          |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
          |      list_transform(range(64), i -> vv[i + 1] * sv[i + 1])),
          |      (acc, x) -> acc + x) AS pj
          |  FROM v CROSS JOIN S)
          |SELECT vec_id, CAST(j AS INT) AS j, round(pj, 6) AS out
          |FROM p ORDER BY vec_id, j""".stripMargin,

      // Corpus datasheet replay: the same per-doc kernels (token
      // count, quality ladder, token fingerprint), one aggregate,
      // UNION ALL unpivot to (metric, value).
      "q205_corpus_report" -> {
        // zero-guarded like the engine's punctRatio when(n === 0, 0.0)
        // branch: an empty-string doc must not diverge on 0/0
        val punct = s"""CASE WHEN length(text) = 0 THEN CAST(0 AS DOUBLE) ELSE CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE) / length(text) END"""
        val swRatio = s"CAST(len(list_filter(${toksSql("text")}, x -> list_contains(${dlist(stop("en"))}, x))) AS DOUBLE) / len(${toksSql("text")})"
        val mtl = s"CAST(list_sum(list_transform(${toksSql("text")}, x -> CAST(length(x) AS BIGINT))) AS DOUBLE) / len(${toksSql("text")})"
        val quality =
          s"""CAST((CASE WHEN len(${toksSql("text")}) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END) * 0.3
             |  + (CASE WHEN $mtl >= 2.0 AND $mtl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.3
             |  + (CASE WHEN $punct <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.2
             |  + (CASE WHEN $swRatio >= 0.01 THEN 1.0 ELSE 0.0 END) * 0.2 AS DOUBLE)""".stripMargin
        s"""WITH b AS (SELECT text, lang, source,
           |    CASE WHEN text IS NOT NULL
           |         THEN CAST(len(${toksSql("text")}) AS BIGINT) END AS nt,
           |    CASE WHEN text IS NOT NULL THEN $quality END AS q,
           |    CASE WHEN text IS NOT NULL
           |         THEN md5(array_to_string(${toksSql("text")}, ' ')) END AS fp
           |  FROM documents WHERE doc_id IS NOT NULL),
           |a AS (SELECT count(*) AS nd,
           |    sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS nn,
           |    count(nt) AS ntx, sum(nt) AS tt, min(nt) AS mn, max(nt) AS mx,
           |    sum(CASE WHEN nt < 50 THEN 1 ELSE 0 END) AS ns,
           |    sum(CAST(q AS DECIMAL(38,12))) AS sq,
           |    count(DISTINCT fp) AS nfp, count(DISTINCT lang) AS nl,
           |    count(DISTINCT source) AS nsr FROM b)
           |SELECT metric, value FROM (
           |  SELECT 'n_docs' AS metric, CAST(nd AS DOUBLE) AS value FROM a
           |  UNION ALL SELECT 'n_null_text', CAST(nn AS DOUBLE) FROM a
           |  UNION ALL SELECT 'total_tokens', CAST(tt AS DOUBLE) FROM a
           |  UNION ALL SELECT 'mean_tokens',
           |    round(CAST(tt AS DOUBLE) / nullif(ntx, 0), 6) FROM a
           |  UNION ALL SELECT 'min_tokens', CAST(mn AS DOUBLE) FROM a
           |  UNION ALL SELECT 'max_tokens', CAST(mx AS DOUBLE) FROM a
           |  UNION ALL SELECT 'short_frac',
           |    round(CAST(ns AS DOUBLE) / nullif(ntx, 0), 6) FROM a
           |  UNION ALL SELECT 'mean_quality',
           |    round(CAST(sq AS DOUBLE) / nullif(ntx, 0), 6) FROM a
           |  UNION ALL SELECT 'dup_frac',
           |    round(1.0 - CAST(nfp AS DOUBLE) / nullif(ntx, 0), 6) FROM a
           |  UNION ALL SELECT 'n_langs', CAST(nl AS DOUBLE) FROM a
           |  UNION ALL SELECT 'n_sources', CAST(nsr AS DOUBLE) FROM a)
           |ORDER BY metric""".stripMargin
      },

      // Calibration replay: q21's langid chain, confidence = winning
      // share of stopword hits, equal-width bins, DECIMAL confidence
      // sums, wgap = |Σcorrect − Σconf| / N per bin.
      "q204_calibration_ece" -> q204Sql,

      // The streaming twin's per-trigger emissions max-merge to the
      // SAME per-bin sums, so the identical oracle certifies
      // stream == batch == DuckDB in one row.
      "q206_streaming_calibration" -> q204Sql,

      // Decontamination-rewrite replay: q198's islands-and-gaps chain
      // with the marking swapped to "fp occurs in the test slice's
      // distinct window fingerprints" and NO first-occurrence
      // election.
      "q210_decontaminate_rewrite" ->
        """WITH b AS (SELECT doc_id, text FROM documents),
          |tw AS (SELECT DISTINCT md5(substr(text, CAST(i AS INT) + 1, 40)) AS fp
          |       FROM (SELECT text,
          |               unnest(generate_series(0, CAST(length(text) - 40 AS BIGINT), 1)) AS i
          |             FROM documents WHERE doc_id % 10 = 0
          |               AND text IS NOT NULL AND length(text) >= 40)),
          |w AS (SELECT doc_id, CAST(i AS INT) AS off,
          |        md5(substr(text, CAST(i AS INT) + 1, 40)) AS fp
          |      FROM (SELECT doc_id, text,
          |              unnest(generate_series(0, CAST(length(text) - 40 AS BIGINT), 1)) AS i
          |            FROM b WHERE text IS NOT NULL AND length(text) >= 40)),
          |rem AS (SELECT doc_id, off FROM w WHERE fp IN (SELECT fp FROM tw)),
          |isl AS (SELECT doc_id, off,
          |         CASE WHEN off <= coalesce(max(off + 40) OVER (PARTITION BY doc_id
          |              ORDER BY off ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          |              -1) THEN 0 ELSE 1 END AS brk
          |        FROM rem),
          |g AS (SELECT doc_id, off,
          |        sum(brk) OVER (PARTITION BY doc_id ORDER BY off) AS grp FROM isl),
          |m AS (SELECT doc_id, grp, min(off) AS s, max(off) + 40 AS e
          |      FROM g GROUP BY 1, 2),
          |seg AS (SELECT doc_id, s, e,
          |          coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS p
          |        FROM m),
          |c1 AS (SELECT seg.doc_id,
          |         string_agg(substr(t2.text, seg.p + 1, seg.s - seg.p), '' ORDER BY seg.s) AS gaps,
          |         max(seg.e) AS laste,
          |         CAST(count(*) AS BIGINT) AS n_spans
          |       FROM seg JOIN b t2 ON seg.doc_id = t2.doc_id GROUP BY seg.doc_id)
          |SELECT d.doc_id,
          |  CASE WHEN c1.doc_id IS NULL THEN d.text
          |       ELSE c1.gaps || substr(d.text, c1.laste + 1) END AS clean_text,
          |  coalesce(c1.n_spans, 0) AS n_spans_removed,
          |  CAST(coalesce(length(d.text), 0)
          |    - coalesce(length(CASE WHEN c1.doc_id IS NULL THEN d.text
          |        ELSE c1.gaps || substr(d.text, c1.laste + 1) END), 0) AS BIGINT)
          |    AS n_chars_removed
          |FROM b d LEFT JOIN c1 ON d.doc_id = c1.doc_id
          |ORDER BY d.doc_id""".stripMargin,

      // IVF-PQ replay: the same ADC algebra as q131, restricted to the
      // codes of corpus vectors in each query's probed cells.
      "q142_ivfpq_ann" ->
        s"""WITH ${ivfPqAdcSql()}
           |SELECT query_id, rank, neighbor_id, round(adist, 6) AS adist
           |FROM ivftop ORDER BY query_id, rank""".stripMargin,

      // PQ recall audit: the ADC top-10 intersected with the exact L2
      // top-10 the same corpus would return — the eval every ANN
      // deployment runs before trusting its index.
      "q137_pq_recall" ->
        s"""WITH $pqAdcSql,
           |ex AS (SELECT query_id, neighbor_id FROM (
           |    SELECT q.id AS query_id, c.id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.id
           |        ORDER BY list_distance(q.v, c.v) ASC, c.id ASC) AS rank
           |    FROM pqq q CROSS JOIN pcorpus c)
           |  WHERE rank <= 10)
           |SELECT p.query_id,
           |  CAST(count(e.neighbor_id) AS BIGINT) AS n_overlap,
           |  round(CAST(count(e.neighbor_id) AS DOUBLE) / 10.0, 6) AS recall
           |FROM pqtop p LEFT JOIN ex e
           |  ON p.query_id = e.query_id AND p.neighbor_id = e.neighbor_id
           |GROUP BY p.query_id ORDER BY p.query_id""".stripMargin,

      // DSIR replay: two smoothed unigram LMs (q56's convention, each
      // over its own corpus), per-doc tf-weighted log-RATIO average.
      "q132_importance_weights" -> {
        val toks = toksSql("text")
        s"""WITH ftgt AS (
           |  SELECT tok, count(*) AS c
           |  FROM (SELECT unnest($toks) AS tok FROM documents
           |        WHERE source IN ('src0', 'src1', 'src2', 'src3'))
           |  GROUP BY tok),
           |fraw AS (
           |  SELECT tok, count(*) AS c
           |  FROM (SELECT unnest($toks) AS tok FROM documents)
           |  GROUP BY tok),
           |mt AS (SELECT CAST(sum(c) AS BIGINT) AS nt, CAST(count(*) AS BIGINT) AS vt FROM ftgt),
           |mr AS (SELECT CAST(sum(c) AS BIGINT) AS nr, CAST(count(*) AS BIGINT) AS vr FROM fraw),
           |tf AS (SELECT doc_id, tok, count(*) AS tf
           |       FROM (SELECT doc_id, unnest($toks) AS tok FROM documents)
           |       GROUP BY 1, 2),
           |sc AS (SELECT t.doc_id,
           |  CAST(sum(t.tf) AS BIGINT) AS n_tokens,
           |  sum(CAST(t.tf AS DOUBLE) *
           |      ln((coalesce(ft.c, 0) + 1) / CAST(mt.nt + mt.vt AS DOUBLE)))
           |    / CAST(sum(t.tf) AS DOUBLE) AS at,
           |  sum(CAST(t.tf AS DOUBLE) *
           |      ln((coalesce(fr.c, 0) + 1) / CAST(mr.nr + mr.vr AS DOUBLE)))
           |    / CAST(sum(t.tf) AS DOUBLE) AS ar
           |  FROM tf t
           |  LEFT JOIN ftgt ft USING (tok)
           |  LEFT JOIN fraw fr USING (tok)
           |  CROSS JOIN mt CROSS JOIN mr
           |  GROUP BY t.doc_id)
           |SELECT d.doc_id,
           |  CAST(coalesce(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
           |  round(coalesce(sc.at, 0.0), 6) AS avg_logp_tgt,
           |  round(coalesce(sc.ar, 0.0), 6) AS avg_logp_raw,
           |  round(round(coalesce(sc.at, 0.0), 6)
           |      - round(coalesce(sc.ar, 0.0), 6), 6) AS avg_logratio
           |FROM documents d LEFT JOIN sc USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      },

      // Curriculum replay: q20's quality formula, SQL percent_rank for
      // both ranks (ties share first-row rank = the kernel's rule),
      // the engine's blend/round order, floor cut into 3 phases.
      "q135_curriculum" -> {
        val toks = toksSql("text")
        // zero-guarded like the engine's punctRatio when(n === 0, 0.0)
        // branch: an empty-string doc must not diverge on 0/0
        val punct = s"""CASE WHEN length(text) = 0 THEN CAST(0 AS DOUBLE) ELSE CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE) / length(text) END"""
        val swRatio = s"CAST(len(list_filter($toks, x -> list_contains(${dlist(stop("en"))}, x))) AS DOUBLE) / len($toks)"
        val mtl = s"CAST(list_sum(list_transform($toks, x -> CAST(length(x) AS BIGINT))) AS DOUBLE) / len($toks)"
        val quality =
          s"""CAST((CASE WHEN len($toks) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END) * 0.3
             |      + (CASE WHEN $mtl >= 2.0 AND $mtl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.3
             |      + (CASE WHEN $punct <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.2
             |      + (CASE WHEN $swRatio >= 0.01 THEN 1.0 ELSE 0.0 END) * 0.2 AS DOUBLE)""".stripMargin
        s"""WITH b AS (SELECT doc_id,
           |    CAST(len($toks) AS BIGINT) AS n_tokens,
           |    round($quality, 6) AS quality
           |  FROM documents),
           |r AS (SELECT doc_id, n_tokens, quality,
           |    percent_rank() OVER (ORDER BY n_tokens) AS prl,
           |    percent_rank() OVER (ORDER BY quality) AS prq
           |  FROM b),
           |d AS (SELECT doc_id, n_tokens, quality,
           |    round(prl, 6) AS pr_len, round(prq, 6) AS pr_quality,
           |    round(0.5 * prl + 0.5 * (1.0 - prq), 6) AS difficulty
           |  FROM r)
           |SELECT doc_id, n_tokens, quality, pr_len, pr_quality, difficulty,
           |  CAST(least(floor(difficulty * 3), 2) AS INT) AS phase
           |FROM d ORDER BY doc_id""".stripMargin
      },

      // BPE pair replay: vocabulary with frequencies, char bigrams per
      // distinct word, frequency-weighted counts. Integer-exact.
      "q136_bpe_pairs" ->
        s"""WITH v AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq
           |  FROM (SELECT unnest(${toksSql("text")}) AS tok FROM documents)
           |  GROUP BY tok),
           |p AS (SELECT unnest(list_transform(range(length(tok) - 1),
           |    i -> substr(tok, CAST(i + 1 AS INT), 2))) AS pair, freq
           |  FROM v WHERE length(tok) >= 2)
           |SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
           |FROM p GROUP BY pair
           |ORDER BY cnt DESC, pair LIMIT 50""".stripMargin,

      // PMI collocations replay: unigram + bigram streams from the
      // shared tokenizer, the engine's exact division order inside ln.
      "q134_collocations" ->
        s"""WITH base AS (SELECT ${toksSql("text")} AS w FROM documents),
           |uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS cw
           |       FROM (SELECT unnest(w) AS tok FROM base) GROUP BY tok),
           |nu AS (SELECT CAST(sum(cw) AS BIGINT) AS nu FROM uc),
           |bc AS (SELECT bg, CAST(count(*) AS BIGINT) AS cxy FROM (
           |    SELECT unnest(list_transform(range(len(w) - 1),
           |      i -> w[i+1] || ' ' || w[i+2])) AS bg
           |    FROM base WHERE len(w) >= 2) GROUP BY bg),
           |nb AS (SELECT CAST(sum(cxy) AS BIGINT) AS nb FROM bc),
           |sc AS (SELECT split_part(bg, ' ', 1) AS w1,
           |         split_part(bg, ' ', 2) AS w2, bg, cxy
           |       FROM bc WHERE cxy >= 5),
           |j AS (SELECT sc.w1, sc.w2, sc.bg, sc.cxy,
           |        ln((CAST(sc.cxy AS DOUBLE) / CAST(nb.nb AS DOUBLE)) /
           |           ((CAST(u1.cw AS DOUBLE) / CAST(nu.nu AS DOUBLE))
           |          * (CAST(u2.cw AS DOUBLE) / CAST(nu.nu AS DOUBLE)))) AS pmi
           |      FROM sc JOIN uc u1 ON u1.tok = sc.w1
           |      JOIN uc u2 ON u2.tok = sc.w2
           |      CROSS JOIN nb CROSS JOIN nu)
           |SELECT w1, w2, cxy, round(pmi, 6) AS pmi
           |FROM j ORDER BY pmi DESC, bg ASC LIMIT 30""".stripMargin,

      "q104_salted_join" ->
        """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n,
          |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
          |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          |GROUP BY 1 ORDER BY s_nationkey""".stripMargin,

      "q105_skew_report" ->
        """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
          |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
          |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM c)
          |SELECT user_id, cnt, round(CAST(cnt AS DOUBLE) / tot, 6) AS share
          |FROM c CROSS JOIN t
          |ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin,

      "q101_hist2d" ->
        """WITH r AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
          |    CAST(l_extendedprice AS DOUBLE) AS y
          |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
          |e AS (SELECT min(x) AS xlo, max(x) AS xhi, min(y) AS ylo, max(y) AS yhi FROM r)
          |SELECT CAST(CASE WHEN xhi = xlo THEN 0
          |    ELSE least(floor((x - xlo) / ((xhi - xlo) / 10)), 9) END AS INT) AS bx,
          |  CAST(CASE WHEN yhi = ylo THEN 0
          |    ELSE least(floor((y - ylo) / ((yhi - ylo) / 8)), 7) END AS INT) AS by,
          |  CAST(count(*) AS BIGINT) AS cnt
          |FROM r CROSS JOIN e GROUP BY 1, 2 ORDER BY bx, by""".stripMargin,

      "q102_mutual_info" ->
        """WITH cells AS (SELECT o_orderstatus AS a, o_orderpriority AS b,
          |    CAST(count(*) AS BIGINT) AS o
          |  FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
          |  GROUP BY 1, 2),
          |ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY 1),
          |cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY 1),
          |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
          |SELECT t.n,
          |  round(sum((CAST(o AS DOUBLE) / t.n) *
          |    ln((CAST(o AS DOUBLE) * t.n) / (CAST(ra.ra AS DOUBLE) * CAST(cb.cb AS DOUBLE)))), 6) AS mi
          |FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN t
          |GROUP BY t.n""".stripMargin,

      "q103_trend" ->
        """SELECT event_type AS key, CAST(count(*) AS BIGINT) AS n,
          |  round(regr_slope(value, date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts) / 86400.0), 6) AS slope,
          |  round(regr_intercept(value, date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts) / 86400.0), 6) AS intercept,
          |  round(corr(value, date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts) / 86400.0), 6) AS r
          |FROM events
          |WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
          |GROUP BY 1 ORDER BY key""".stripMargin,

      "q100_lang_confusion" -> {
        def sw(lang: String) = s"len(list_filter($toks, x -> list_contains(${dlist(stop(lang))}, x)))"
        s"""WITH pred AS (SELECT lang AS declared,
           |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
           |       WHEN ${sw("en")} = 0 AND ${sw("de")} = 0 AND ${sw("es")} = 0 AND ${sw("fr")} = 0 THEN 'und'
           |       WHEN ${sw("en")} >= ${sw("de")} AND ${sw("en")} >= ${sw("es")} AND ${sw("en")} >= ${sw("fr")} THEN 'en'
           |       WHEN ${sw("de")} >= ${sw("es")} AND ${sw("de")} >= ${sw("fr")} THEN 'de'
           |       WHEN ${sw("es")} >= ${sw("fr")} THEN 'es'
           |       ELSE 'fr' END AS detected
           |  FROM documents WHERE lang IS NOT NULL),
           |m AS (SELECT declared, detected, CAST(count(*) AS BIGINT) AS n
           |      FROM pred GROUP BY 1, 2),
           |t AS (SELECT declared, CAST(sum(n) AS BIGINT) AS tt FROM m GROUP BY 1)
           |SELECT m.declared, m.detected, m.n,
           |  round(CAST(m.n AS DOUBLE) / t.tt, 6) AS frac
           |FROM m JOIN t USING (declared)
           |ORDER BY declared, detected""".stripMargin
      },

      "q99_incremental_profile" ->
        s"""WITH s AS (
           |  SELECT count(n_chars) AS n,
           |         sum(n_chars) AS s1,
           |         sum(n_chars*n_chars) AS s2,
           |         sum(n_chars*n_chars*n_chars) AS s3,
           |         sum(n_chars*n_chars*n_chars*n_chars) AS s4,
           |         min(CAST(n_chars AS DOUBLE)) AS mn,
           |         max(CAST(n_chars AS DOUBLE)) AS mx
           |  FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL)
           |SELECT ${momentStatsSql(guarded = true, withQuantiles = false)}
           |FROM s""".stripMargin,

      "q98_conversion_lag" ->
        """WITH f AS (SELECT user_id,
          |    min(CASE WHEN event_type = 'view' THEN ts END) AS ff,
          |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS ft
          |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
          |  GROUP BY 1),
          |lag AS (SELECT CAST(date_diff('second', ff, ft) AS DOUBLE) AS v
          |  FROM f WHERE ff IS NOT NULL AND ft IS NOT NULL AND ft >= ff),
          |g AS (SELECT v, CAST(count(*) AS BIGINT) * 1000000 AS w FROM lag GROUP BY 1),
          |t AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM g),
          |c AS (SELECT v, sum(w) OVER (ORDER BY v) AS cum FROM g)
          |SELECT CAST(q AS DOUBLE) AS quantile,
          |  CAST((SELECT min(v) FROM c, t
          |    WHERE cum >= ceil(CAST(q AS DOUBLE) * wt - CAST(q AS DOUBLE) * wt * 1e-12)) AS BIGINT) AS lag_s
          |FROM (VALUES (0.5), (0.9), (0.99)) AS qs(q)
          |ORDER BY quantile""".stripMargin,

      "q97_weighted_quantiles" ->
        """WITH g AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
          |    CAST(sum(CAST(round(CAST(l_quantity AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS w
          |  FROM lineitem
          |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
          |    AND round(CAST(l_quantity AS DOUBLE) * 1000000) > 0
          |  GROUP BY 1),
          |t AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM g),
          |c AS (SELECT v, sum(w) OVER (ORDER BY v) AS cum FROM g)
          |SELECT CAST(q AS DOUBLE) AS quantile,
          |  (SELECT min(v) FROM c, t
          |   WHERE cum >= ceil(CAST(q AS DOUBLE) * wt - CAST(q AS DOUBLE) * wt * 1e-12)) AS value
          |FROM (VALUES (0.25), (0.5), (0.75), (0.9)) AS qs(q)
          |ORDER BY quantile""".stripMargin,

      "q95_referential" ->
        """WITH c AS (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL),
          |k1 AS (SELECT DISTINCT c_custkey FROM customer WHERE c_custkey IS NOT NULL),
          |k2 AS (SELECT DISTINCT c_custkey FROM customer
          |       WHERE c_custkey IS NOT NULL AND c_custkey < 700),
          |r1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |         CAST(count(*) FILTER (WHERE o_custkey NOT IN (SELECT c_custkey FROM k1)) AS BIGINT) AS v
          |       FROM c),
          |r2 AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |         CAST(count(*) FILTER (WHERE o_custkey NOT IN (SELECT c_custkey FROM k2)) AS BIGINT) AS v
          |       FROM c)
          |SELECT 'ref(o_custkey -> c_custkey)' AS rule, n, v AS n_violations,
          |  round(CASE WHEN n > 0 THEN CAST(n - v AS DOUBLE) / n ELSE 1.0 END, 6) AS pass_rate
          |FROM r1
          |UNION ALL
          |SELECT 'ref(o_custkey -> c_custkey)@lt700', n, v,
          |  round(CASE WHEN n > 0 THEN CAST(n - v AS DOUBLE) / n ELSE 1.0 END, 6)
          |FROM r2
          |ORDER BY rule""".stripMargin,

      "q96_benford" ->
        """WITH src AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
          |  WHERE o_totalprice IS NOT NULL AND o_totalprice > 0),
          |d AS (SELECT CAST(least(greatest(floor(v / pow(10.0, floor(log10(v)))), 1.0), 9.0) AS INT) AS dg FROM src),
          |counted AS (SELECT dg, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
          |tot AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS t FROM counted),
          |digits AS (SELECT unnest(range(1, 10)) AS digit),
          |per AS (SELECT digits.digit, CAST(coalesce(counted.n, 0) AS BIGINT) AS n,
          |          CASE WHEN tot.t > 0 THEN CAST(coalesce(counted.n, 0) AS DOUBLE) / tot.t
          |               ELSE CAST(0.0 AS DOUBLE) END AS obs,
          |          log10(1.0 + 1.0 / digits.digit) AS exp
          |        FROM digits LEFT JOIN counted ON digits.digit = counted.dg
          |        CROSS JOIN tot),
          |t2 AS (SELECT sum(abs(obs - exp)) / 2.0 AS tvd FROM per)
          |SELECT CAST(per.digit AS INT) AS digit, per.n,
          |  round(per.obs, 6) AS observed, round(per.exp, 6) AS expected,
          |  round(t2.tvd, 6) AS tvd
          |FROM per CROSS JOIN t2 ORDER BY digit""".stripMargin,

      "q93_percent_rank_by" ->
        """SELECT event_id, event_type,
          |  round(percent_rank() OVER (PARTITION BY event_type ORDER BY value), 6) AS pct_rank
          |FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
          |ORDER BY event_id""".stripMargin,

      "q94_cooccurrence" ->
        """WITH a AS (SELECT DISTINCT user_id AS k, event_type AS i FROM events
          |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL)
          |SELECT l.i AS item_a, r.i AS item_b, CAST(count(*) AS BIGINT) AS n_keys
          |FROM a l JOIN a r ON l.k = r.k AND l.i < r.i
          |GROUP BY 1, 2 ORDER BY item_a, item_b""".stripMargin,

      "q91_cdc_merge" ->
        """WITH ch AS (SELECT o_custkey AS k, o_orderpriority AS seg,
          |    o_totalprice AS bal, o_orderkey AS seq,
          |    CASE WHEN o_orderkey % 10 < 2 THEN 'delete' ELSE 'upsert' END AS op
          |  FROM orders WHERE o_custkey IS NOT NULL),
          |latest AS (SELECT k, seg, bal, op FROM (
          |    SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
          |    FROM ch) WHERE rn = 1)
          |SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
          |WHERE c_custkey NOT IN (SELECT k FROM latest)
          |UNION ALL
          |SELECT k, seg, bal FROM latest WHERE op <> 'delete'
          |ORDER BY c_custkey""".stripMargin,

      "q92_scd2" ->
        """SELECT o_custkey, o_orderkey AS valid_from,
          |  lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS valid_to,
          |  lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) IS NULL AS is_current,
          |  o_totalprice
          |FROM orders WHERE o_custkey IS NOT NULL
          |ORDER BY o_custkey, valid_from""".stripMargin,

      "q89_moving_average" ->
        """WITH b AS (SELECT date_trunc('day', ts) AS h,
          |    CAST(count(*) AS BIGINT) AS n,
          |    sum(CAST(value AS DECIMAL(38,6))) AS s
          |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
          |r AS (SELECT min(h) AS lo, max(h) AS hi FROM b),
          |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM r),
          |f AS (SELECT spine.d, CAST(coalesce(b.n, 0) AS BIGINT) AS n,
          |        coalesce(b.s, CAST(0 AS DECIMAL(38,6))) AS s
          |      FROM spine LEFT JOIN b ON spine.d = b.h),
          |w AS (SELECT d, n, s,
          |        sum(s) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ms,
          |        count(*) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS cnt
          |      FROM f)
          |SELECT strftime(d, '%Y-%m-%d %H:%M:%S') AS bucket, n,
          |  round(CAST(s AS DOUBLE), 6) AS bucket_sum,
          |  round(CAST(ms AS DOUBLE) / cnt, 6) AS moving_avg
          |FROM w ORDER BY bucket""".stripMargin,

      "q90_active_users" ->
        """WITH a AS (SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS d
          |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          |r AS (SELECT min(d) AS lo, max(d) AS hi FROM a),
          |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS s FROM r),
          |cur AS (SELECT d, CAST(count(*) AS BIGINT) AS cur FROM a GROUP BY 1),
          |roll AS (SELECT sp.s, CAST(count(DISTINCT a.u) AS BIGINT) AS roll
          |         FROM spine sp JOIN a
          |           ON a.d BETWEEN sp.s - INTERVAL 6 DAY AND sp.s
          |         GROUP BY 1)
          |SELECT strftime(sp.s, '%Y-%m-%d %H:%M:%S') AS bucket,
          |  CAST(coalesce(cur.cur, 0) AS BIGINT) AS active,
          |  CAST(coalesce(roll.roll, 0) AS BIGINT) AS active_window,
          |  round(CASE WHEN coalesce(roll.roll, 0) > 0
          |    THEN CAST(coalesce(cur.cur, 0) AS DOUBLE) / roll.roll
          |    ELSE CAST(0.0 AS DOUBLE) END, 6) AS stickiness
          |FROM spine sp LEFT JOIN cur ON sp.s = cur.d
          |  LEFT JOIN roll ON sp.s = roll.s
          |ORDER BY bucket""".stripMargin,

      "q81_cumulative_users" ->
        """WITH fs AS (SELECT user_id, min(ts) AS first_ts FROM events
          |            WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
          |d AS (SELECT date_trunc('day', first_ts) AS day,
          |        CAST(count(*) AS BIGINT) AS n_new FROM fs GROUP BY 1)
          |SELECT strftime(day, '%Y-%m-%d %H:%M:%S') AS bucket, n_new,
          |  CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users
          |FROM d ORDER BY bucket""".stripMargin,

      "q74_snapshot_diff" ->
        """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 97 <> 0),
          |n AS (SELECT o_orderkey, o_custkey, o_orderstatus,
          |        CASE WHEN o_orderkey % 13 = 0
          |             THEN o_totalprice * CAST(1.1 AS DOUBLE)
          |             ELSE o_totalprice END AS o_totalprice,
          |        o_orderdate, o_orderpriority
          |      FROM orders WHERE o_orderkey % 89 <> 0)
          |SELECT o_orderkey, change FROM (
          |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
          |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
          |         WHEN n.o_orderkey IS NULL THEN 'removed'
          |         WHEN (o.o_custkey IS DISTINCT FROM n.o_custkey)
          |           OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
          |           OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
          |           OR (o.o_orderdate IS DISTINCT FROM n.o_orderdate)
          |           OR (o.o_orderpriority IS DISTINCT FROM n.o_orderpriority)
          |         THEN 'changed' END AS change
          |  FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey)
          |WHERE change IS NOT NULL ORDER BY o_orderkey""".stripMargin,

      "q75_mad_outliers" ->
        """WITH c AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
          |           WHERE o_totalprice IS NOT NULL),
          |m AS (SELECT median(x) AS med FROM c),
          |d AS (SELECT median(abs(x - med)) AS mad FROM c, m)
          |SELECT CAST(count(*) AS BIGINT) AS n,
          |  round(med, 6) AS median, round(mad, 6) AS mad,
          |  CAST(coalesce(sum(CASE WHEN abs(x - med) >
          |    CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * mad
          |    THEN 1 END), 0) AS BIGINT) AS n_outliers,
          |  round(CAST(coalesce(sum(CASE WHEN abs(x - med) >
          |    CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * mad
          |    THEN 1 END), 0) AS DOUBLE) / count(*), 6) AS outlier_frac
          |FROM c, m, d GROUP BY med, mad""".stripMargin,

      "q76_mixture_weights" ->
        """WITH g AS (SELECT source AS domain, CAST(count(*) AS BIGINT) AS n_docs,
          |             CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS tokens
          |           FROM documents WHERE source IS NOT NULL GROUP BY 1),
          |t AS (SELECT CAST(coalesce(sum(tokens), 0) AS BIGINT) AS tot,
          |             count(*) AS dcnt FROM g),
          |r AS (SELECT g.domain, g.n_docs, g.tokens,
          |        CAST(1.0 AS DOUBLE) / dcnt AS target_share,
          |        CAST(tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS cur_share
          |      FROM g, t),
          |r2 AS (SELECT *, CASE WHEN cur_share > 0 THEN target_share / cur_share
          |                      ELSE CAST(0.0 AS DOUBLE) END AS ratio FROM r),
          |m AS (SELECT max(ratio) AS mx FROM r2)
          |SELECT domain, n_docs, tokens, round(cur_share, 6) AS cur_share,
          |  round(target_share, 6) AS target_share,
          |  round(CASE WHEN mx > 0 THEN ratio / mx
          |             ELSE CAST(0.0 AS DOUBLE) END, 6) AS sample_rate
          |FROM r2, m ORDER BY domain""".stripMargin,

      "q87_temperature_mixture" ->
        """WITH g AS (SELECT lang AS domain, CAST(count(*) AS BIGINT) AS n_docs,
          |             CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS tokens
          |           FROM documents WHERE lang IS NOT NULL GROUP BY 1),
          |t AS (SELECT coalesce(sum(pow(CAST(tokens AS DOUBLE), 0.5)), 0.0) AS z,
          |             CAST(coalesce(sum(tokens), 0) AS BIGINT) AS tot FROM g),
          |r AS (SELECT g.domain, g.n_docs, g.tokens,
          |        CASE WHEN z > 0 THEN pow(CAST(tokens AS DOUBLE), 0.5) / z
          |             ELSE CAST(0.0 AS DOUBLE) END AS target_share,
          |        CASE WHEN tot > 0 THEN CAST(tokens AS DOUBLE) / CAST(tot AS DOUBLE)
          |             ELSE CAST(0.0 AS DOUBLE) END AS cur_share
          |      FROM g, t),
          |r2 AS (SELECT *, CASE WHEN cur_share > 0 THEN target_share / cur_share
          |                      ELSE CAST(0.0 AS DOUBLE) END AS ratio FROM r),
          |m AS (SELECT max(ratio) AS mx FROM r2)
          |SELECT domain, n_docs, tokens, round(cur_share, 6) AS cur_share,
          |  round(target_share, 6) AS target_share,
          |  round(CASE WHEN mx > 0 THEN ratio / mx
          |             ELSE CAST(0.0 AS DOUBLE) END, 6) AS sample_rate
          |FROM r2, m ORDER BY domain""".stripMargin,

      "q77_rollup_revenue" ->
        """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_orders,
          |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |  JOIN nation ON c_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP(r_name, n_name)
          |ORDER BY r_name, n_name""".stripMargin,

      "q78_pivot_events" ->
        """SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
          |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS "view",
          |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
          |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
          |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
          |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
          |FROM events GROUP BY 1 ORDER BY dow""".stripMargin,

      "q72_funnel" ->
        """WITH s0 AS (SELECT user_id, min(ts) AS pt FROM events
          |            WHERE event_type = 'view' AND user_id IS NOT NULL AND ts IS NOT NULL
          |            GROUP BY 1),
          |s1 AS (SELECT e.user_id, min(e.ts) AS pt FROM events e
          |       JOIN s0 ON e.user_id = s0.user_id
          |       WHERE e.event_type = 'click' AND e.ts >= s0.pt GROUP BY 1),
          |s2 AS (SELECT e.user_id, min(e.ts) AS pt FROM events e
          |       JOIN s1 ON e.user_id = s1.user_id
          |       WHERE e.event_type = 'purchase' AND e.ts >= s1.pt GROUP BY 1),
          |c AS (SELECT (SELECT count(*) FROM s0) AS n0,
          |             (SELECT count(*) FROM s1) AS n1,
          |             (SELECT count(*) FROM s2) AS n2)
          |SELECT CAST(0 AS BIGINT) AS step, 'view' AS step_name,
          |  CAST(n0 AS BIGINT) AS n_users, round(CAST(1.0 AS DOUBLE), 6) AS conversion FROM c
          |UNION ALL
          |SELECT CAST(1 AS BIGINT), 'click', CAST(n1 AS BIGINT),
          |  round(CASE WHEN n0 = 0 THEN CAST(0 AS DOUBLE)
          |        ELSE CAST(n1 AS DOUBLE) / n0 END, 6) FROM c
          |UNION ALL
          |SELECT CAST(2 AS BIGINT), 'purchase', CAST(n2 AS BIGINT),
          |  round(CASE WHEN n1 = 0 THEN CAST(0 AS DOUBLE)
          |        ELSE CAST(n2 AS DOUBLE) / n1 END, 6) FROM c
          |ORDER BY step""".stripMargin,

      "q73_percent_rank" ->
        """SELECT l_orderkey, l_linenumber, l_quantity,
          |  round(percent_rank() OVER (ORDER BY l_quantity), 6) AS pct_rank
          |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

      "q70_column_summary" -> {
        def one(c: String) =
          s"""SELECT '$c' AS col_name, n, n_null, n_distinct,
             |  round(CASE WHEN n > 0 THEN ln(CAST(n AS DOUBLE)) - slog / CAST(n AS DOUBLE)
             |        ELSE CAST(0 AS DOUBLE) END, 6) AS entropy
             |FROM (
             |  SELECT CAST(coalesce(sum(CASE WHEN v IS NOT NULL THEN cnt END), 0) AS BIGINT) AS n,
             |         CAST(coalesce(sum(CASE WHEN v IS NULL THEN cnt END), 0) AS BIGINT) AS n_null,
             |         CAST(count(CASE WHEN v IS NOT NULL THEN 1 END) AS BIGINT) AS n_distinct,
             |         coalesce(sum(CASE WHEN v IS NOT NULL THEN CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE)) END), 0.0) AS slog
             |  FROM (SELECT CAST($c AS VARCHAR) AS v, count(*) AS cnt FROM orders GROUP BY 1))"""
            .stripMargin
        Seq("o_orderstatus", "o_orderpriority", "o_custkey").map(one)
          .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      },

      "q71_shuffle_shards" ->
        """WITH r AS (
          |  SELECT doc_id,
          |    row_number() OVER (ORDER BY md5('epoch0' || CAST(doc_id AS VARCHAR)), doc_id) - 1
          |      AS shuffle_pos
          |  FROM documents WHERE doc_id IS NOT NULL)
          |SELECT doc_id, shuffle_pos, shuffle_pos // 64 AS shard,
          |  shuffle_pos % 64 AS shard_offset
          |FROM r ORDER BY doc_id""".stripMargin,

      // KS: ECDF difference evaluated at complete distinct values only
      // (ties collapse in the GROUP BY); cum/n divisions are exact-int
      // over double — bit-identical across engines
      "q66_ks_drift" ->
        """WITH g AS (
          |  SELECT value AS v,
          |    sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
          |    sum(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END) AS cb
          |  FROM events WHERE value IS NOT NULL GROUP BY value),
          |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM g),
          |c AS (SELECT sum(ca) OVER (ORDER BY v) AS cum_a,
          |             sum(cb) OVER (ORDER BY v) AS cum_b FROM g)
          |SELECT t.na AS n_a, t.nb AS n_b,
          |  round(max(abs(CAST(cum_a AS DOUBLE)/t.na - CAST(cum_b AS DOUBLE)/t.nb)), 6) AS ks
          |FROM c, t GROUP BY t.na, t.nb""".stripMargin,

      "q67_psi_drift" -> {
        val bin = (1 to 9).map(i => s"CASE WHEN r.v >= c.q$i THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""WITH r AS (SELECT value AS v, (event_id % 2 = 0) AS g
           |           FROM events WHERE value IS NOT NULL),
           |c AS (SELECT ${(1 to 9).map(i => s"quantile_cont(v, 0.$i) AS q$i").mkString(", ")}
           |      FROM r WHERE g),
           |b AS (SELECT CAST($bin AS BIGINT) AS bin, r.g FROM r, c),
           |g2 AS (SELECT bin,
           |         CAST(sum(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
           |         CAST(sum(CASE WHEN g THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
           |       FROM b GROUP BY bin),
           |t AS (SELECT CAST(sum(n_base) AS DOUBLE) AS na,
           |             CAST(sum(n_cur) AS DOUBLE) AS nc FROM g2)
           |SELECT bin, n_base, n_cur,
           |  round(((CAST(n_base AS DOUBLE)+0.5)/(t.na+5.0)
           |         - (CAST(n_cur AS DOUBLE)+0.5)/(t.nc+5.0))
           |    * ln(((CAST(n_base AS DOUBLE)+0.5)/(t.na+5.0))
           |         / ((CAST(n_cur AS DOUBLE)+0.5)/(t.nc+5.0))), 6) AS psi_contrib
           |FROM g2, t ORDER BY bin""".stripMargin
      },

      "q68_chi_square" ->
        """WITH cells AS (SELECT l_returnflag AS a, l_linestatus AS b, count(*) AS o
          |               FROM lineitem GROUP BY 1, 2),
          |rt AS (SELECT a, sum(o) AS ra FROM cells GROUP BY a),
          |ct AS (SELECT b, sum(o) AS cb FROM cells GROUP BY b),
          |t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
          |        CAST((SELECT count(*) FROM rt) - 1 AS BIGINT)
          |          * CAST((SELECT count(*) FROM ct) - 1 AS BIGINT) AS dof
          |      FROM cells)
          |SELECT t.n AS n, t.dof AS dof,
          |  round(sum((CAST(o AS DOUBLE) - CAST(ra AS DOUBLE)*CAST(cb AS DOUBLE)/CAST(t.n AS DOUBLE))
          |          * (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE)*CAST(cb AS DOUBLE)/CAST(t.n AS DOUBLE))
          |          / (CAST(ra AS DOUBLE)*CAST(cb AS DOUBLE)/CAST(t.n AS DOUBLE))), 6) AS chi2
          |FROM cells JOIN rt USING (a) JOIN ct USING (b), t
          |GROUP BY t.n, t.dof""".stripMargin,

      "q69_functional_deps" -> {
        def fd(det: String, dep: String) =
          s"""SELECT '$det' AS det, '$dep' AS dep,
             |  CAST(count(*) AS BIGINT) AS n_det,
             |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
             |  (sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0) AS holds
             |FROM (SELECT $det, count(DISTINCT $dep) AS nd FROM orders
             |      WHERE $det IS NOT NULL AND $dep IS NOT NULL GROUP BY $det)""".stripMargin
        Seq(fd("o_orderkey", "o_custkey"), fd("o_custkey", "o_orderpriority"),
          fd("o_orderpriority", "o_orderstatus"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY det, dep")
      },

      // exact frequent tokens: the oracle replays the NAIVE plan (full
      // token groupBy + HAVING over the same ceil(s*n) threshold) —
      // the two-phase MG result is exact, so the rows agree
      "q62_frequent_tokens" ->
        s"""WITH tk AS (SELECT u.t AS item FROM documents,
           |       UNNEST($toks) AS u(t)),
           |  tot AS (SELECT count(*) AS n FROM tk)
           |SELECT item, count(*) AS cnt FROM tk, tot
           |GROUP BY item, tot.n
           |HAVING count(*) >= CAST(ceil(0.001 * tot.n) AS BIGINT)
           |ORDER BY item""".stripMargin,

      // equi-depth histogram: NTILE-equivalent bucket from the global
      // (value, event_id) rank; integer division matches Spark's long/long
      "q63_equidepth_histogram" ->
        """WITH r AS (
          |  SELECT value,
          |    row_number() OVER (ORDER BY value, event_id) - 1 AS rk,
          |    count(*) OVER () AS n
          |  FROM events WHERE value IS NOT NULL)
          |SELECT (rk * 8) // n AS bucket, count(*) AS cnt,
          |  round(min(value), 6) AS lo, round(max(value), 6) AS hi
          |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin,

      "q64_correlation_matrix" -> {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        (for { i <- cols.indices; j <- cols.indices if i < j } yield
          s"""SELECT '${cols(i)}' AS col_x, '${cols(j)}' AS col_y,
             |  round(corr(${cols(i)}, ${cols(j)}), 6) AS r FROM lineitem"""
            .stripMargin)
          .mkString("", "\nUNION ALL\n", "\nORDER BY col_x, col_y")
      },

      "q65_winsorized_profile" ->
        """WITH q AS (SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
          |                  quantile_cont(l_extendedprice, 0.99) AS hi
          |           FROM lineitem WHERE l_extendedprice IS NOT NULL)
          |SELECT count(*) AS n,
          |  round(avg(greatest(q.lo, least(q.hi, l_extendedprice))), 6) AS mean,
          |  round(stddev_pop(greatest(q.lo, least(q.hi, l_extendedprice))), 6) AS std,
          |  round(min(q.lo), 6) AS lo_cut, round(max(q.hi), 6) AS hi_cut
          |FROM lineitem, q WHERE l_extendedprice IS NOT NULL""".stripMargin,

      "q01_profile_extendedprice" -> numericProfileSql("lineitem", "l_extendedprice"),
      "q02_profile_totalprice" -> numericProfileSql("orders", "o_totalprice"),
      "q03_profile_quantity" -> numericProfileSql("lineitem", "l_quantity"),

      "q04_value_counts_priority" -> valueCountsSql("orders", "o_orderpriority"),
      "q05_value_counts_mktsegment" -> valueCountsSql("customer", "c_mktsegment"),
      "q06_value_counts_returnflag" -> valueCountsSql("lineitem", "l_returnflag"),

      "q07_profile_datetime_orders" ->
        """WITH s AS (
          |  SELECT count(o_orderdate) AS n,
          |         sum(CAST(CAST(epoch(o_orderdate) AS BIGINT) AS DECIMAL(38,6))) AS s1,
          |         sum(CAST(CAST(epoch(o_orderdate) AS BIGINT) * CAST(epoch(o_orderdate) AS BIGINT) AS DECIMAL(38,0))) AS s2,
          |         min(CAST(epoch(o_orderdate) AS BIGINT)) AS mn_epoch,
          |         max(CAST(epoch(o_orderdate) AS BIGINT)) AS mx_epoch,
          |         strftime(min(o_orderdate), '%Y-%m-%d') AS min_date,
          |         strftime(max(o_orderdate), '%Y-%m-%d') AS max_date,
          |         quantile_cont(CAST(epoch(o_orderdate) AS BIGINT), 0.5) AS med
          |  FROM orders)
          |SELECT n,
          |  round(CAST(s1 AS DOUBLE)/n, 2) AS mean_epoch,
          |  round(sqrt(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)), 2) AS std_epoch,
          |  mn_epoch, mx_epoch, min_date, max_date,
          |  round(med, 2) AS median_epoch
          |FROM s""".stripMargin,

      // CAST(sum(..) AS BIGINT): DuckDB sums of integers are HUGEINT,
      // Spark's are BIGINT — values equal, type-sensitive hash differs
      "q08_boolean_profile_events" ->
        """SELECT CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS true_count,
          |       CAST(sum(CASE WHEN event_type = 'click' THEN 0 ELSE 1 END) AS BIGINT) AS false_count,
          |       count(*) AS n,
          |       round(CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS true_prob
          |FROM events""".stripMargin,

      "q09_detect_signals_orders" ->
        """SELECT count(*) AS n,
          |  round(avg(CASE WHEN length(regexp_replace(strftime(o_orderdate, '%Y-%m-%d'), '\D', '', 'g')) BETWEEN 7 AND 15 THEN 1.0 ELSE 0.0 END), 6) AS date_phone_ratio,
          |  round(avg(CASE WHEN regexp_matches(CAST(o_orderkey AS VARCHAR), '@[^@]*\.') THEN 1.0 ELSE 0.0 END), 6) AS key_email_ratio,
          |  round(avg(CASE WHEN TRY_CAST(CAST(o_orderkey AS VARCHAR) AS DOUBLE) IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS key_numeric_ratio,
          |  count(DISTINCT o_orderpriority) AS priority_distinct,
          |  round(CAST(count(DISTINCT o_orderpriority) AS DOUBLE) / count(*), 6) AS priority_unique_ratio
          |FROM orders""".stripMargin,

      "q10_bool_votes_lineitem" ->
        """SELECT count(*) AS n,
          |  CAST(sum(CASE WHEN lower(trim(l_returnflag)) IN ('y','n') THEN 1 ELSE 0 END) AS BIGINT) AS rf_vote_yn,
          |  CAST(sum(CASE WHEN lower(trim(l_returnflag)) IN ('t','f') THEN 1 ELSE 0 END) AS BIGINT) AS rf_vote_tf,
          |  CAST(sum(CASE WHEN lower(trim(l_returnflag)) IN ('true','false') THEN 1 ELSE 0 END) AS BIGINT) AS rf_vote_truefalse,
          |  CAST(sum(CASE WHEN lower(trim(l_linestatus)) IN ('t','f') THEN 1 ELSE 0 END) AS BIGINT) AS ls_vote_tf,
          |  count(DISTINCT lower(trim(l_returnflag))) AS rf_distinct_norm,
          |  max(CASE WHEN lower(trim(l_returnflag)) IN ('true','false','1','0','yes','no','y','n','t','f') THEN 0 ELSE 1 END) AS rf_nonbool
          |FROM lineitem""".stripMargin,

      "q11_histogram_extendedprice" ->
        """WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem)
          |SELECT CAST(least(greatest(floor((l_extendedprice - lo) / (hi - lo) * 50), 0), 49) AS INTEGER) AS bucket,
          |       count(*) AS cnt
          |FROM lineitem, b GROUP BY 1 ORDER BY bucket""".stripMargin,

      "q12_string_ops_customer" ->
        """SELECT c_custkey,
          |  lower(c_name) AS name_lower,
          |  length(c_name) AS name_len,
          |  regexp_replace(c_name, '\D', '', 'g') AS digits,
          |  substr(c_name, 1, 8) AS prefix,
          |  CASE WHEN regexp_matches(c_name, '^Customer#\d+$') THEN 1 ELSE 0 END AS shape_ok
          |FROM customer ORDER BY c_custkey""".stripMargin,

      "q13_json_events" ->
        """SELECT event_type, count(*) AS n,
          |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          |  round(CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
          |        / count(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

      "q14_topk_users_by_type" ->
        """SELECT event_type, rank, user_id, round(CAST(total_dec AS DOUBLE), 6) AS total, n_events
          |FROM (
          |  SELECT event_type, user_id,
          |         sum(CAST(value AS DECIMAL(38,6))) AS total_dec,
          |         count(*) AS n_events,
          |         row_number() OVER (PARTITION BY event_type ORDER BY sum(CAST(value AS DECIMAL(38,6))) DESC, user_id ASC) AS rank
          |  FROM events GROUP BY event_type, user_id)
          |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,

      "q15_revenue_by_segment" ->
        """SELECT c_mktsegment, count(*) AS n_orders,
          |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

      "q16_q1_lineitem" ->
        """SELECT l_returnflag, l_linestatus,
          |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_qty,
          |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_base_price,
          |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_disc_price,
          |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS avg_qty,
          |  count(*) AS count_order
          |FROM lineitem GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin,

      "q17_hourly_events" ->
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
          |  count(*) AS cnt,
          |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

      "q18_sessionize_events" ->
        """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
          |FROM (
          |  SELECT user_id,
          |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
          |         THEN 1 ELSE 0 END AS new_session
          |  FROM events)
          |GROUP BY user_id ORDER BY user_id""".stripMargin,

      "q19_token_stats" ->
        // coalesce/nullif: Spark's aggregate() over an empty token array
        // yields 0 (and meanTokenLen guards nt=0 → 0.0); DuckDB list_sum([])
        // is NULL and x/0 diverges — align both, and pin HUGEINT → BIGINT
        s"""SELECT doc_id,
           |  len($toks) AS n_tokens,
           |  CAST(coalesce(list_sum(list_transform($toks, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))), 0) AS BIGINT) AS n_subwords,
           |  round(coalesce(CAST(list_sum(list_transform($toks, x -> CAST(length(x) AS BIGINT))) AS DOUBLE) / nullif(len($toks), 0), 0.0), 6) AS mean_token_len
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q20_quality_scores" -> {
        // zero-guarded like the engine's punctRatio when(n === 0, 0.0)
        // branch: an empty-string doc must not diverge on 0/0
        val punct = s"""CASE WHEN length(text) = 0 THEN CAST(0 AS DOUBLE) ELSE CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE) / length(text) END"""
        val swRatio = s"CAST(len(list_filter($toks, x -> list_contains(${dlist(stop("en"))}, x))) AS DOUBLE) / len($toks)"
        val mtl = s"CAST(list_sum(list_transform($toks, x -> CAST(length(x) AS BIGINT))) AS DOUBLE) / len($toks)"
        s"""SELECT doc_id,
           |  round($punct, 6) AS punct_ratio,
           |  round($swRatio, 6) AS stopword_ratio,
           |  round(CAST((CASE WHEN len($toks) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END) * 0.3
           |      + (CASE WHEN $mtl >= 2.0 AND $mtl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.3
           |      + (CASE WHEN $punct <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.2
           |      + (CASE WHEN $swRatio >= 0.01 THEN 1.0 ELSE 0.0 END) * 0.2 AS DOUBLE), 6) AS quality
           |FROM documents ORDER BY doc_id""".stripMargin
      },

      "q21_langid" -> {
        def sw(lang: String) = s"len(list_filter($toks, x -> list_contains(${dlist(stop(lang))}, x)))"
        s"""SELECT doc_id, lang AS lang_actual,
           |  ${sw("en")} AS sw_en, ${sw("de")} AS sw_de, ${sw("es")} AS sw_es, ${sw("fr")} AS sw_fr,
           |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
           |       WHEN ${sw("en")} = 0 AND ${sw("de")} = 0 AND ${sw("es")} = 0 AND ${sw("fr")} = 0 THEN 'und'
           |       WHEN ${sw("en")} >= ${sw("de")} AND ${sw("en")} >= ${sw("es")} AND ${sw("en")} >= ${sw("fr")} THEN 'en'
           |       WHEN ${sw("de")} >= ${sw("es")} AND ${sw("de")} >= ${sw("fr")} THEN 'de'
           |       WHEN ${sw("es")} >= ${sw("fr")} THEN 'es'
           |       ELSE 'fr' END AS lang_pred
           |FROM documents ORDER BY doc_id""".stripMargin
      },

      "q22_fingerprints" ->
        s"""SELECT doc_id,
           |  md5(array_to_string($toks, ' ')) AS fp,
           |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($toks, t -> ${hash31Sql("t")})),
           |              (acc, h) -> (acc * 257 + h) % 2147483647) AS rolling,
           |  ${simhashSql(toks)} AS simhash
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q23_dedup_exact" ->
        s"""SELECT md5(array_to_string($toks, ' ')) AS fp,
           |  min(doc_id) AS keep_id, count(*) AS dup_count
           |FROM ${withDupsSql("documents", "doc_id", 50, 10000)}
           |GROUP BY 1 ORDER BY keep_id""".stripMargin,

      "q24_dedup_minhash" -> {
        val sh = shinglesSql("text")
        val mins = minhashMinsSql
        val bandExprs = minhashBandsSql
        s"""WITH dup AS (SELECT * FROM ${withDupsSql("documents", "doc_id", 50, 10000)}),
           |sh0 AS (SELECT doc_id, unnest($sh) AS s FROM dup),
           |sh AS (SELECT doc_id, s, ${hash31Sql("s")} AS v FROM sh0),
           |sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
           |banded AS ($bandExprs)
           |SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
           |FROM banded l JOIN banded r
           |  ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
           |ORDER BY id_a, id_b""".stripMargin
      },

      "q25_dedup_jaccard" -> {
        val sh = shinglesSql("text")
        val mins = minhashMinsSql
        val bandExprs = minhashBandsSql
        s"""WITH dup AS (SELECT * FROM ${withDupsSql("documents", "doc_id", 50, 10000)}),
           |sh0 AS (SELECT doc_id, unnest($sh) AS s FROM dup),
           |sh AS (SELECT doc_id, s, ${hash31Sql("s")} AS v FROM sh0),
           |sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
           |banded AS ($bandExprs),
           |cand AS (
           |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
           |  FROM banded l JOIN banded r
           |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
           |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
           |inter AS (
           |  SELECT c.id_a, c.id_b, count(*) AS i
           |  FROM cand c
           |  JOIN sh a ON a.doc_id = c.id_a
           |  JOIN sh b ON b.doc_id = c.id_b AND b.s = a.s
           |  GROUP BY 1, 2)
           |SELECT id_a, id_b,
           |  round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
           |FROM inter
           |JOIN sizes sa ON sa.doc_id = id_a
           |JOIN sizes sb ON sb.doc_id = id_b
           |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
           |ORDER BY id_a, id_b""".stripMargin
      },

      "q26_dedup_simhash" ->
        s"""SELECT ${simhashSql(toks)} AS simhash,
           |  min(doc_id) AS keep_id, count(*) AS n_docs
           |FROM ${withDupsSql("documents", "doc_id", 50, 10000)}
           |GROUP BY 1 HAVING count(*) > 1 ORDER BY keep_id""".stripMargin,

      "q27_dedup_embedding" ->
        s"""WITH dup AS (SELECT * FROM ${withDupsSql("embeddings", "vec_id", 50, 10000)})
           |SELECT l.vec_id AS id_a, r.vec_id AS id_b,
           |  round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]), CAST(r.embedding AS DOUBLE[])), 6) AS sim
           |FROM dup l JOIN dup r ON l.vec_id < r.vec_id
           |WHERE list_cosine_similarity(CAST(l.embedding AS DOUBLE[]), CAST(r.embedding AS DOUBLE[])) >= 0.99
           |ORDER BY id_a, id_b""".stripMargin,

      "q28_ann_topk" -> annTopkSql,
      "q29_ann_topk_scalable" -> annTopkSql,

      "q37_neardup_bucketed" -> q37Sql,
      "q38_kmeans_centroids" -> q38Sql,

      "q39_simhash_hamming" ->
        s"""WITH dup AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 10000, text || ' nearmarker' FROM documents WHERE doc_id < 50),
           |sk AS (SELECT doc_id AS id, CAST(${simhashIntSql(toks, 64)} AS BIGINT) AS h FROM dup),
           |banded AS (
           |  SELECT id, h, b AS band, (h >> (b * 16)) & 65535 AS key
           |  FROM sk CROSS JOIN range(4) t(b)),
           |cand AS (
           |  SELECT DISTINCT l.id AS id_a, l.h AS h_a, r.id AS id_b, r.h AS h_b
           |  FROM banded l JOIN banded r
           |    ON l.band = r.band AND l.key = r.key AND l.id < r.id)
           |SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS BIGINT) AS dist
           |FROM cand WHERE bit_count(xor(h_a, h_b)) <= 3
           |ORDER BY id_a, id_b""".stripMargin,

      "q40_line_dedup" ->
        """WITH d AS (
          |  SELECT doc_id,
          |    'follow us on example dot com' || chr(10) || replace(text, ' table ', chr(10))
          |      || chr(10) || 'subscribe to the newsletter' AS text
          |  FROM documents),
          |lines AS (
          |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
          |         unnest(range(len(string_split(text, chr(10))))) AS pos
          |  FROM d),
          |bp AS (SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) >= 10),
          |kept AS (SELECT * FROM lines WHERE line NOT IN (SELECT line FROM bp)),
          |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean,
          |               count(*) AS n_kept
          |        FROM kept GROUP BY doc_id),
          |tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
          |SELECT t.doc_id, coalesce(a.text_clean, '') AS text_clean,
          |       t.n_lines - coalesce(a.n_kept, 0) AS n_removed
          |FROM tot t LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,

      "q41_asof_join" ->
        """WITH j AS (
          |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
          |         row_number() OVER (PARTITION BY e.event_id
          |           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
          |  FROM events e LEFT JOIN orders o
          |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
          |SELECT event_id, user_id, o_orderkey, o_totalprice
          |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

      "q42_tfidf" -> {
        val idf = "(ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) + 1.0)"
        s"""WITH tok AS (SELECT doc_id, unnest(${toksSql("text")}) AS term FROM documents),
           |pairs AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
           |dfreq AS (SELECT term, count(*) AS df FROM pairs GROUP BY 1),
           |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
           |scored AS (
           |  SELECT doc_id, term, tf, df, tf * $idf AS tfidf,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY tf * $idf DESC, term ASC) AS rn
           |  FROM pairs JOIN dfreq USING (term) CROSS JOIN n)
           |SELECT doc_id, CAST(rn AS BIGINT) AS "rank", term,
           |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           |  round(tfidf, 6) AS tfidf
           |FROM scored WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin
      },

      "q43_repetition" -> {
        val w = toksSql("text")
        s"""WITH base AS (SELECT doc_id, $w AS w FROM documents),
           |b AS (SELECT doc_id, len(w) AS n_tokens,
           |             len(list_distinct(w)) AS n_distinct FROM base),
           |bg AS (SELECT doc_id,
           |  unnest(list_transform(range(len(w) - 1), i -> w[i+1] || ' ' || w[i+2])) AS bg
           |  FROM base WHERE len(w) >= 2),
           |cnt AS (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2),
           |top AS (SELECT doc_id,
           |  max(lpad(CAST(cnt AS VARCHAR), 10, '0') || ' ' || bg) AS packed,
           |  sum(cnt) AS n_bigrams FROM cnt GROUP BY 1)
           |SELECT b.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           |  CAST(n_distinct AS BIGINT) AS n_distinct,
           |  round(CASE WHEN n_tokens > 0
           |    THEN CAST(1 AS DOUBLE) - CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
           |    ELSE CAST(0 AS DOUBLE) END, 6) AS dup_token_ratio,
           |  coalesce(substr(packed, 12), '') AS top_bigram,
           |  coalesce(CAST(substr(packed, 1, 10) AS BIGINT), 0) AS top_bigram_count,
           |  round(coalesce(CAST(substr(packed, 1, 10) AS DOUBLE) / CAST(n_bigrams AS DOUBLE),
           |    CAST(0 AS DOUBLE)), 6) AS top_bigram_frac
           |FROM b LEFT JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin
      },

      "q44_pii_redact" -> {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phone = "[+(][0-9 ()-]{6,}[0-9]"
        s"""WITH d AS (
           |  SELECT doc_id, CASE WHEN doc_id % 3 = 0
           |    THEN text || ' contact alice.smith@example.org or +1 (415) 555-0100'
           |    ELSE text END AS text
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
           |  CAST(len(regexp_extract_all(
           |    regexp_replace(text, '$email', '<EMAIL>', 'g'), '$phone')) AS BIGINT) AS n_phones,
           |  regexp_replace(regexp_replace(text, '$email', '<EMAIL>', 'g'),
           |    '$phone', '<PHONE>', 'g') AS text_redacted
           |FROM d ORDER BY doc_id""".stripMargin
      },

      "q45_stratified_sample" -> {
        val bucket = s"(${hash31Sql("CAST(doc_id AS VARCHAR)")}) % 10000"
        s"""SELECT doc_id, lang FROM documents
           |WHERE $bucket < CASE lang WHEN 'en' THEN 3000 WHEN 'de' THEN 8000
           |  WHEN 'zh' THEN 10000 ELSE 5000 END
           |ORDER BY doc_id""".stripMargin
      },

      "q88_split_assignment" -> {
        val bucket = s"(${hash31Sql("CAST(doc_id AS VARCHAR)")}) % 10000"
        s"""SELECT doc_id, lang,
           |  CASE WHEN $bucket < 8000 THEN 'train'
           |       WHEN $bucket < 9000 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM documents WHERE doc_id IS NOT NULL
           |ORDER BY doc_id""".stripMargin
      },

      "q46_sample_per_key" ->
        """SELECT doc_id, lang FROM (
          |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
          |    ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
          |  FROM documents) WHERE rn <= 3 ORDER BY doc_id""".stripMargin,

      "q50_zorder" -> {
        // 30-bit-per-dimension arithmetic replay of InterleaveBits
        // (bit j of a lands at 2j ≤ 58, of b at 2j+1 ≤ 59 — BIGINT-safe
        // on both engines; was 16 bits, which silently truncated the
        // 10x tree's 1e8-shifted user ids — caught by the r13 sf1
        // verify, 900k differing rows; dims here stay < 2^30)
        val z = (0 until 30).map { j =>
          s"(((a >> $j) & 1) * ${1L << (2 * j)} + ((b >> $j) & 1) * ${1L << (2 * j + 1)})"
        }.mkString("(", " + ", ")")
        s"""SELECT event_id, CAST($z AS BIGINT) AS z FROM (
           |  SELECT event_id, user_id AS a, CAST(floor(value) AS BIGINT) AS b
           |  FROM events)
           |ORDER BY event_id""".stripMargin
      },

      "q51_markup_strip" -> {
        val tag = "<[^>]*>"
        val url = "https?://[A-Za-z0-9./_%?&=#+-]+"
        s"""WITH d AS (
           |  SELECT doc_id, CASE WHEN doc_id % 4 = 0
           |    THEN '<html><p class="x">' || text || '</p> see https://example.com/a?b=1 now</html>'
           |    ELSE text END AS text
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(text, '$tag')) AS BIGINT) AS n_tags,
           |  CAST(len(regexp_extract_all(text, '$url')) AS BIGINT) AS n_urls,
           |  trim(regexp_replace(
           |    regexp_replace(regexp_replace(text, '$tag', ' ', 'g'), '$url', ' ', 'g'),
           |    '\\s+', ' ', 'g')) AS text_clean
           |FROM d ORDER BY doc_id""".stripMargin
      },

      "q52_curation_pipeline" ->
        s"""WITH injected AS (
           |  SELECT doc_id AS id,
           |    CASE WHEN doc_id % 3 = 0
           |      THEN t2 || ' contact alice.smith@example.org or +1 (415) 555-0100'
           |      ELSE t2 END AS text
           |  FROM (SELECT doc_id, CASE WHEN doc_id % 4 = 0
           |          THEN '<html><p class="x">' || text || '</p> see https://example.com/a?b=1 now</html>'
           |          ELSE text END AS t2
           |        FROM documents)),
           |${curateCleanedSql(Nil)},
           |${curateFeatFiltSql("cleaned", Nil)},
           |dd AS (
           |  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY id) AS rn
           |  FROM filt)
           |SELECT id AS doc_id, text_clean, lang, round(quality, 6) AS quality, n_tokens
           |FROM dd
           |WHERE rn = 1 AND (${hash31Sql("CAST(id AS VARCHAR)")}) % 10000 < 5000
           |ORDER BY doc_id""".stripMargin,

      "q53_decontaminate" ->
        s"""WITH tfp AS (
           |  SELECT DISTINCT md5(array_to_string($toks, ' ')) AS fp
           |  FROM documents WHERE doc_id % 10 = 0)
           |SELECT doc_id, n_chars FROM documents
           |WHERE md5(array_to_string($toks, ' ')) NOT IN (SELECT fp FROM tfp)
           |ORDER BY doc_id""".stripMargin,

      "q54_ngram_counts" ->
        s"""WITH base AS (SELECT doc_id, ${toksSql("text")} AS w FROM documents),
           |g AS (SELECT doc_id,
           |  unnest(list_transform(range(len(w) - 2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS ngram
           |  FROM base WHERE len(w) >= 3)
           |SELECT ngram, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs
           |FROM g GROUP BY ngram HAVING count(*) >= 5
           |ORDER BY ngram""".stripMargin,

      // interval stride is DYNAMIC (r14): greatest(1000, n/100) — the
      // exact engine formula — so this ONE replay is value-valid at
      // every scale (1000 at the bench corpora, 10000 at the 10x tree;
      // the r13 sf1 sweep had to book this row as a designed
      // divergence against the pinned 1000)
      "q61_range_join" ->
        """SELECT p.event_id, i.interval_id,
          |  round(p.value, 6) AS value, round(i.lo, 6) AS lo
          |FROM events p
          |JOIN (SELECT event_id AS interval_id, value AS lo, value + 5.0 AS hi
          |      FROM events
          |      WHERE event_id % (SELECT greatest(1000, count(*) // 100)
          |                        FROM events) = 0) i
          |  ON p.value >= i.lo AND p.value <= i.hi
          |ORDER BY event_id, interval_id""".stripMargin,

      "q60_chunk_documents" ->
        s"""WITH base AS (SELECT doc_id AS id, ${toksSql("text")} AS w FROM documents),
           |ch AS (
           |  SELECT id,
           |    unnest(range(1 + greatest(0, CAST(ceil((len(w) - 12) / 8.0) AS BIGINT)))) AS chunk_idx,
           |    unnest(list_transform(range(1 + greatest(0, CAST(ceil((len(w) - 12) / 8.0) AS BIGINT))),
           |      i -> array_to_string(w[i*8+1 : i*8+12], ' '))) AS chunk
           |  FROM base WHERE len(w) > 0)
           |SELECT id, chunk_idx, chunk,
           |  CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tokens
           |FROM ch ORDER BY id, chunk_idx""".stripMargin,

      "q59_weighted_sample" ->
        s"""SELECT doc_id, n_chars, round(wskey, 6) AS skey FROM (
           |  SELECT doc_id, n_chars,
           |    -ln((CAST(${hash31Sql("doc_id::VARCHAR || '#ws42'")} AS DOUBLE) + 0.5)
           |      / 268435456.0) / n_chars AS wskey
           |  FROM documents WHERE n_chars > 0)
           |ORDER BY wskey, doc_id LIMIT 100""".stripMargin,

      "q58_sequence_pack" ->
        s"""WITH d AS (
           |  SELECT doc_id,
           |    CAST(coalesce(len(${toksSql("text")}), 0) AS BIGINT) AS n_tokens
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, n_tokens,
           |    SUM(n_tokens) OVER (ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM d)
           |SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum,
           |  CAST(cum - n_tokens AS BIGINT) AS start_pos,
           |  CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS bin,
           |  CAST((cum - n_tokens) % 512 AS BIGINT) AS bin_offset,
           |  (floor((cum - 1) / 512.0) > floor((cum - n_tokens) / 512.0)
           |    AND n_tokens > 0) AS crosses
           |FROM c ORDER BY doc_id""".stripMargin,

      "q57_ngram_contamination" ->
        s"""WITH ts AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id < 50
           |  UNION ALL
           |  SELECT doc_id + 20000,
           |    translate(lower(text), 'abcdefghijklmnopqrstuvwxyz0123456789',
           |              'bcdefghijklmnopqrstuvwxyza1234567890')
           |  FROM documents WHERE doc_id < 50),
           |trg AS (SELECT DISTINCT md5(g) AS fp FROM (
           |  SELECT unnest(list_transform(range(len(w) - 4),
           |    i -> array_to_string(w[i+1:i+5], ' '))) AS g
           |  FROM (SELECT ${toksSql("text")} AS w FROM documents)
           |  WHERE len(w) >= 5)),
           |teg AS (SELECT DISTINCT doc_id, md5(g) AS fp FROM (
           |  SELECT doc_id, unnest(list_transform(range(len(w) - 4),
           |    i -> array_to_string(w[i+1:i+5], ' '))) AS g
           |  FROM (SELECT doc_id, ${toksSql("text")} AS w FROM ts)
           |  WHERE len(w) >= 5)),
           |hits AS (
           |  SELECT doc_id, count(*) AS n_grams,
           |    CAST(sum(CASE WHEN fp IN (SELECT fp FROM trg) THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
           |  FROM teg GROUP BY doc_id)
           |SELECT t.doc_id AS id,
           |  CAST(coalesce(h.n_grams, 0) AS BIGINT) AS n_grams,
           |  coalesce(h.n_overlap, 0) AS n_overlap,
           |  round(coalesce(CAST(h.n_overlap AS DOUBLE) / h.n_grams, 0.0), 6) AS contamination
           |FROM (SELECT DISTINCT doc_id FROM ts) t LEFT JOIN hits h USING (doc_id)
           |ORDER BY id""".stripMargin,

      "q55_passage_dup" ->
        s"""WITH dup AS (SELECT * FROM ${withDupsSql("documents", "doc_id", 50, 10000)}),
           |base AS (SELECT doc_id, ${toksSql("text")} AS w FROM dup),
           |ch AS (SELECT doc_id,
           |  unnest(list_transform(range(((len(w) - 1) // 10) + 1),
           |    i -> array_to_string(w[i*10+1 : i*10+10], ' '))) AS passage
           |  FROM base WHERE len(w) > 0),
           |pairs AS (SELECT doc_id, md5(passage) AS fp, count(*) AS c
           |          FROM ch GROUP BY 1, 2),
           |dfreq AS (SELECT fp, count(*) AS n_docs FROM pairs GROUP BY 1),
           |perdoc AS (SELECT doc_id,
           |  CAST(sum(c) AS BIGINT) AS n_passages,
           |  CAST(sum(CASE WHEN n_docs > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_passages
           |  FROM pairs JOIN dfreq USING (fp) GROUP BY 1)
           |SELECT d.doc_id,
           |  CAST(coalesce(p.n_passages, 0) AS BIGINT) AS n_passages,
           |  CAST(coalesce(p.n_dup_passages, 0) AS BIGINT) AS n_dup_passages,
           |  round(coalesce(CAST(p.n_dup_passages AS DOUBLE) / p.n_passages, 0.0), 6) AS dup_passage_frac
           |FROM dup d LEFT JOIN perdoc p USING (doc_id)
           |ORDER BY doc_id""".stripMargin,

      "q56_unigram_lm" -> {
        val toks = toksSql("text")
        s"""WITH freq AS (
           |  SELECT tok, count(*) AS c
           |  FROM (SELECT unnest($toks) AS tok FROM documents WHERE doc_id % 2 = 0)
           |  GROUP BY tok),
           |model AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM freq),
           |tf AS (SELECT doc_id, tok, count(*) AS tf
           |       FROM (SELECT doc_id, unnest($toks) AS tok FROM documents)
           |       GROUP BY 1, 2),
           |sc AS (SELECT t.doc_id,
           |  CAST(sum(t.tf) AS BIGINT) AS n_tokens,
           |  sum(CAST(t.tf AS DOUBLE) * ln((coalesce(f.c, 0) + 1) / CAST(m.n + m.v AS DOUBLE)))
           |    / CAST(sum(t.tf) AS DOUBLE) AS avg_logp
           |  FROM tf t LEFT JOIN freq f USING (tok) CROSS JOIN model m
           |  GROUP BY t.doc_id)
           |SELECT d.doc_id,
           |  CAST(coalesce(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
           |  round(coalesce(sc.avg_logp, 0.0), 6) AS avg_logp
           |FROM documents d LEFT JOIN sc USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      },

      "q47_cc_labels" ->
        s"""WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 50),
           |e AS (SELECT doc_id AS src, doc_id + 10000 AS dst FROM ids
           |      UNION ALL
           |      SELECT doc_id + 10000 AS src, doc_id + 20000 AS dst FROM ids),
           |${ccRoundsSql(3)}
           |SELECT id, lbl FROM v3 ORDER BY id""".stripMargin,

      "q48_dedup_corpus" ->
        s"""WITH dup AS (
           |  SELECT doc_id, text, n_chars FROM documents
           |  UNION ALL
           |  SELECT doc_id + 10000, text || ' nearmarker', n_chars
           |  FROM documents WHERE doc_id < 50),
           |sk AS (SELECT doc_id AS id, CAST(${simhashIntSql(toks, 64)} AS BIGINT) AS h FROM dup),
           |banded AS (
           |  SELECT id, h, b AS band, (h >> (b * 16)) & 65535 AS key
           |  FROM sk CROSS JOIN range(4) t(b)),
           |cand AS (
           |  SELECT DISTINCT l.id AS id_a, l.h AS h_a, r.id AS id_b, r.h AS h_b
           |  FROM banded l JOIN banded r
           |    ON l.band = r.band AND l.key = r.key AND l.id < r.id),
           |e AS (SELECT id_a AS src, id_b AS dst FROM cand
           |      WHERE bit_count(xor(h_a, h_b)) <= 3),
           |${ccRoundsSql(3)},
           |todrop AS (SELECT id FROM v3 WHERE lbl <> id)
           |SELECT d.doc_id, d.n_chars FROM dup d
           |WHERE d.doc_id NOT IN (SELECT id FROM todrop)
           |ORDER BY doc_id""".stripMargin,

      // Leakage-free splits: q48's near-dup CC chain, then the q88
      // hash-bucket split keyed on the cluster representative.
      "q129_leakage_free_split" -> {
        val bucket = s"(${hash31Sql("CAST(rep AS VARCHAR)")}) % 10000"
        s"""WITH dup AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 10000, text || ' nearmarker'
           |  FROM documents WHERE doc_id < 50),
           |sk AS (SELECT doc_id AS id, CAST(${simhashIntSql(toks, 64)} AS BIGINT) AS h FROM dup),
           |banded AS (
           |  SELECT id, h, b AS band, (h >> (b * 16)) & 65535 AS key
           |  FROM sk CROSS JOIN range(4) t(b)),
           |cand AS (
           |  SELECT DISTINCT l.id AS id_a, l.h AS h_a, r.id AS id_b, r.h AS h_b
           |  FROM banded l JOIN banded r
           |    ON l.band = r.band AND l.key = r.key AND l.id < r.id),
           |e AS (SELECT id_a AS src, id_b AS dst FROM cand
           |      WHERE bit_count(xor(h_a, h_b)) <= 3),
           |${ccRoundsSql(3)},
           |r AS (SELECT d.doc_id, CAST(coalesce(v.lbl, d.doc_id) AS BIGINT) AS rep
           |      FROM dup d LEFT JOIN v3 v ON v.id = d.doc_id)
           |SELECT doc_id, rep,
           |  CASE WHEN $bucket < 8000 THEN 'train'
           |       WHEN $bucket < 9000 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM r ORDER BY doc_id""".stripMargin
      },

      "q49_grouped_profile" ->
        s"""WITH s AS (
           |  SELECT lang, count(n_chars) AS n,
           |         sum(n_chars) AS s1,
           |         sum(n_chars*n_chars) AS s2,
           |         sum(n_chars*n_chars*n_chars) AS s3,
           |         sum(n_chars*n_chars*n_chars*n_chars) AS s4,
           |         min(CAST(n_chars AS DOUBLE)) AS mn,
           |         max(CAST(n_chars AS DOUBLE)) AS mx,
           |         quantile_cont(CAST(n_chars AS DOUBLE), [0.25, 0.5, 0.75]) AS qs
           |  FROM documents WHERE n_chars IS NOT NULL GROUP BY lang)
           |SELECT lang, ${momentStatsSql(guarded = true)}
           |FROM s ORDER BY lang""".stripMargin,

      "q30_ann_ivf" ->
        """WITH corpus AS (SELECT * FROM embeddings WHERE vec_id >= 5),
          |q AS (SELECT * FROM embeddings WHERE vec_id < 5),
          |cent AS (SELECT vec_id AS centroid_id, embedding AS cv FROM corpus ORDER BY vec_id LIMIT 16),
          |assigned AS (
          |  SELECT vec_id AS id, centroid_id, embedding AS vec FROM (
          |    SELECT c.vec_id, ct.centroid_id, c.embedding,
          |      row_number() OVER (PARTITION BY c.vec_id
          |        ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(ct.cv AS DOUBLE[])) DESC, ct.centroid_id ASC) AS rn
          |    FROM corpus c CROSS JOIN cent ct)
          |  WHERE rn = 1),
          |probes AS (
          |  SELECT vec_id AS query_id, embedding AS qv, centroid_id FROM (
          |    SELECT q.vec_id, q.embedding, ct.centroid_id,
          |      row_number() OVER (PARTITION BY q.vec_id
          |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(ct.cv AS DOUBLE[])) DESC, ct.centroid_id ASC) AS rn
          |    FROM q CROSS JOIN cent ct)
          |  WHERE rn <= 4),
          |scored AS (
          |  SELECT p.query_id, a.id AS neighbor_id,
          |    list_cosine_similarity(CAST(p.qv AS DOUBLE[]), CAST(a.vec AS DOUBLE[])) AS sim
          |  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id)
          |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim FROM (
          |  SELECT query_id, neighbor_id, sim,
          |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
          |  FROM scored)
          |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

      // Append-parity replay: REBUILD-then-search over the union —
      // q30's IVF plan verbatim. The engine side built on the low half
      // and appended the high half; the low half holds the union's 16
      // lowest ids, so the frozen centroids equal the rebuild's and
      // this replay must match value-for-value.
      "q230_ivf_index_append" ->
        """WITH corpus AS (SELECT * FROM embeddings WHERE vec_id >= 5),
          |q AS (SELECT * FROM embeddings WHERE vec_id < 5),
          |cent AS (SELECT vec_id AS centroid_id, embedding AS cv FROM corpus ORDER BY vec_id LIMIT 16),
          |assigned AS (
          |  SELECT vec_id AS id, centroid_id, embedding AS vec FROM (
          |    SELECT c.vec_id, ct.centroid_id, c.embedding,
          |      row_number() OVER (PARTITION BY c.vec_id
          |        ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(ct.cv AS DOUBLE[])) DESC, ct.centroid_id ASC) AS rn
          |    FROM corpus c CROSS JOIN cent ct)
          |  WHERE rn = 1),
          |probes AS (
          |  SELECT vec_id AS query_id, embedding AS qv, centroid_id FROM (
          |    SELECT q.vec_id, q.embedding, ct.centroid_id,
          |      row_number() OVER (PARTITION BY q.vec_id
          |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(ct.cv AS DOUBLE[])) DESC, ct.centroid_id ASC) AS rn
          |    FROM q CROSS JOIN cent ct)
          |  WHERE rn <= 4),
          |scored AS (
          |  SELECT p.query_id, a.id AS neighbor_id,
          |    list_cosine_similarity(CAST(p.qv AS DOUBLE[]), CAST(a.vec AS DOUBLE[])) AS sim
          |  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id)
          |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim FROM (
          |  SELECT query_id, neighbor_id, sim,
          |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
          |  FROM scored)
          |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

      // CDC-parity replay: REBUILD-then-search over the EDITED corpus
      // (mod-7 ≡ 0 high-half ids deleted, mod-7 ≡ 3 upserted with the
      // reversed embedding) — q230's IVF plan over the post-change
      // rows. The engine side went build → append → applyChanges
      // (tombstones) → compact → search; edits stay above the
      // 16-lowest-id seed range, so the frozen centroids equal this
      // rebuild's and delete/upsert-then-search must match
      // value-for-value.
      "q233_ivf_index_cdc" ->
        """WITH corpus0 AS (SELECT * FROM embeddings WHERE vec_id >= 5),
          |cutv AS (SELECT (max(vec_id) + 1) // 2 AS cut FROM corpus0),
          |corpus AS (
          |  SELECT vec_id,
          |    CASE WHEN vec_id >= (SELECT cut FROM cutv) AND vec_id % 7 = 3
          |         THEN list_reverse(embedding) ELSE embedding END AS embedding
          |  FROM corpus0
          |  WHERE NOT (vec_id >= (SELECT cut FROM cutv) AND vec_id % 7 = 0)),
          |q AS (SELECT * FROM embeddings WHERE vec_id < 5),
          |cent AS (SELECT vec_id AS centroid_id, embedding AS cv FROM corpus ORDER BY vec_id LIMIT 16),
          |assigned AS (
          |  SELECT vec_id AS id, centroid_id, embedding AS vec FROM (
          |    SELECT c.vec_id, ct.centroid_id, c.embedding,
          |      row_number() OVER (PARTITION BY c.vec_id
          |        ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(ct.cv AS DOUBLE[])) DESC, ct.centroid_id ASC) AS rn
          |    FROM corpus c CROSS JOIN cent ct)
          |  WHERE rn = 1),
          |probes AS (
          |  SELECT vec_id AS query_id, embedding AS qv, centroid_id FROM (
          |    SELECT q.vec_id, q.embedding, ct.centroid_id,
          |      row_number() OVER (PARTITION BY q.vec_id
          |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(ct.cv AS DOUBLE[])) DESC, ct.centroid_id ASC) AS rn
          |    FROM q CROSS JOIN cent ct)
          |  WHERE rn <= 4),
          |scored AS (
          |  SELECT p.query_id, a.id AS neighbor_id,
          |    list_cosine_similarity(CAST(p.qv AS DOUBLE[]), CAST(a.vec AS DOUBLE[])) AS sim
          |  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id)
          |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim FROM (
          |  SELECT query_id, neighbor_id, sim,
          |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
          |  FROM scored)
          |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

      // Refined-build replay: the full Lloyd recursion (q38's seeded
      // machinery, K = 16, 2 rounds, corpus = the non-query rows) and
      // then the IVF probe/score/top-k over the REFINED centroids —
      // value-checking the production (kmeansIterations > 0) persisted
      // build end-to-end.
      "q234_ivf_index_refined" ->
        s"""WITH ${kmeansCtesSql(16, 2, "WHERE vec_id >= 5")},
           |q AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           |      FROM embeddings WHERE vec_id < 5),
           |probes AS (
           |  SELECT id AS query_id, v AS qv, centroid_id FROM (
           |    SELECT q.id, q.v, ct.centroid_id,
           |      row_number() OVER (PARTITION BY q.id
           |        ORDER BY list_cosine_similarity(q.v, ct.cv) DESC, ct.centroid_id ASC) AS rn
           |    FROM q CROSS JOIN cent2 ct)
           |  WHERE rn <= 4),
           |fasg AS (
           |  SELECT id, centroid_id, v FROM (
           |    SELECT c.id, ct.centroid_id, c.v,
           |      row_number() OVER (PARTITION BY c.id
           |        ORDER BY list_cosine_similarity(c.v, ct.cv) DESC, ct.centroid_id ASC) AS rn
           |    FROM corpus c CROSS JOIN cent2 ct)
           |  WHERE rn = 1),
           |scored AS (
           |  SELECT p.query_id, a.id AS neighbor_id,
           |    list_cosine_similarity(p.qv, a.v) AS sim
           |  FROM probes p JOIN fasg a USING (centroid_id))
           |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim FROM (
           |  SELECT query_id, neighbor_id, sim,
           |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
           |  FROM scored)
           |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

      // Lifecycle replay: the engine went build(low) → append(high) →
      // drift → REBUILD (Lloyd retrain from the index's own live rows)
      // → search; the rebuild trains on the full union, so the oracle
      // is q234's refined-build replay verbatim — the lifecycle's end
      // state must equal a refined build from scratch.
      "q235_ivf_index_rebuild" ->
        s"""WITH ${kmeansCtesSql(16, 2, "WHERE vec_id >= 5")},
           |q AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           |      FROM embeddings WHERE vec_id < 5),
           |probes AS (
           |  SELECT id AS query_id, v AS qv, centroid_id FROM (
           |    SELECT q.id, q.v, ct.centroid_id,
           |      row_number() OVER (PARTITION BY q.id
           |        ORDER BY list_cosine_similarity(q.v, ct.cv) DESC, ct.centroid_id ASC) AS rn
           |    FROM q CROSS JOIN cent2 ct)
           |  WHERE rn <= 4),
           |fasg AS (
           |  SELECT id, centroid_id, v FROM (
           |    SELECT c.id, ct.centroid_id, c.v,
           |      row_number() OVER (PARTITION BY c.id
           |        ORDER BY list_cosine_similarity(c.v, ct.cv) DESC, ct.centroid_id ASC) AS rn
           |    FROM corpus c CROSS JOIN cent2 ct)
           |  WHERE rn = 1),
           |scored AS (
           |  SELECT p.query_id, a.id AS neighbor_id,
           |    list_cosine_similarity(p.qv, a.v) AS sim
           |  FROM probes p JOIN fasg a USING (centroid_id))
           |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim FROM (
           |  SELECT query_id, neighbor_id, sim,
           |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
           |  FROM scored)
           |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

      // PQ-index append-parity replay: REBUILD-then-search over the
      // union — q142's IVF-PQ plan at ZERO training iterations (the
      // codebook is the lowest-id seed, which the low-half build shard
      // contains, so the engine's frozen codebook/cells equal the
      // rebuild's and the values must match exactly).
      "q232_ivfpq_index_append" ->
        s"""WITH ${ivfPqAdcSql(0)}
           |SELECT query_id, rank, neighbor_id, round(adist, 6) AS adist
           |FROM ivftop ORDER BY query_id, rank""".stripMargin,

      // Drift-trigger replay: assign the WHOLE corpus to the low-half
      // centroids, split the per-cell counts at the build/append cut,
      // and replay the categorical Laplace-smoothed PSI (+0.5 over the
      // 16 trained cells) with the same double formula.
      "q231_ivf_index_drift" ->
        """WITH corpus AS (SELECT * FROM embeddings WHERE vec_id >= 5),
          |cutv AS (SELECT (max(vec_id) + 1) // 2 AS cut FROM corpus),
          |cent AS (SELECT vec_id AS centroid_id, embedding AS cv FROM corpus
          |         WHERE vec_id < (SELECT cut FROM cutv)
          |         ORDER BY vec_id LIMIT 16),
          |asg AS (SELECT id, centroid_id FROM (
          |    SELECT c.vec_id AS id, ct.centroid_id,
          |      row_number() OVER (PARTITION BY c.vec_id
          |        ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(ct.cv AS DOUBLE[])) DESC, ct.centroid_id ASC) AS rn
          |    FROM corpus c CROSS JOIN cent ct)
          |  WHERE rn = 1),
          |counted AS (SELECT centroid_id,
          |    CAST(sum(CASE WHEN id < (SELECT cut FROM cutv) THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
          |    CAST(sum(CASE WHEN id >= (SELECT cut FROM cutv) THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
          |  FROM asg GROUP BY 1),
          |tot AS (SELECT CAST(sum(n_base) AS DOUBLE) AS na,
          |               CAST(sum(n_cur) AS DOUBLE) AS nc FROM counted),
          |c2 AS (SELECT centroid_id, n_base, n_cur,
          |    ((CAST(n_base AS DOUBLE) + 0.5) / (na + 8.0)
          |      - (CAST(n_cur AS DOUBLE) + 0.5) / (nc + 8.0))
          |    * ln(((CAST(n_base AS DOUBLE) + 0.5) / (na + 8.0))
          |         / ((CAST(n_cur AS DOUBLE) + 0.5) / (nc + 8.0))) AS contrib
          |  FROM counted CROSS JOIN tot)
          |SELECT centroid_id, n_base, n_cur,
          |  round(contrib, 6) AS psi_contrib,
          |  round(sum(contrib) OVER (), 6) AS psi_total,
          |  sum(contrib) OVER () > 0.2 AS retrain
          |FROM c2 ORDER BY centroid_id""".stripMargin,

      "q33_detect_types_events" -> {
        // one-row ladder replay per column; dtype-static branches inlined
        def ladder(c: String, isNum: Boolean, isTs: Boolean): String = {
          val s = s"trim(CAST($c AS VARCHAR))"
          val ns = s"lower($s)"
          val boolToks = "('true','false','1','0','yes','no','y','n','t','f')"
          val dateParse =
            if (isTs) "1.0"
            else s"avg(CASE WHEN $c IS NOT NULL THEN CASE WHEN try_strptime($s, ['%Y-%m-%d','%m/%d/%Y','%d-%m-%Y','%Y-%m-%d %H:%M:%S','%Y-%m-%dT%H:%M:%S','%Y/%m/%d','%d.%m.%Y','%b %d, %Y','%-d %b %Y']) IS NOT NULL THEN 1.0 ELSE 0.0 END END)"
          s"""SELECT '$c' AS col_name, CASE
             |  WHEN count($c) = 0 THEN 'unknown'
             |  WHEN count(DISTINCT $ns) <= 3
             |    AND coalesce(max(CASE WHEN $c IS NOT NULL THEN CASE WHEN $ns IN $boolToks THEN 0 ELSE 1 END END), 1) = 0
             |    THEN 'boolean'
             |  WHEN avg(CASE WHEN $c IS NOT NULL THEN CASE WHEN regexp_matches($s, '@[^@]*\\.[^@]*$$') THEN 1.0 ELSE 0.0 END END) > 0.7 THEN 'email'
             |  WHEN avg(CASE WHEN $c IS NOT NULL THEN CASE WHEN length(regexp_replace($s, '\\D', '', 'g')) BETWEEN 7 AND 15 THEN 1.0 ELSE 0.0 END END) > 0.7 THEN 'phone'
             |  WHEN ${if (isNum) "TRUE" else "FALSE"}
             |    OR avg(CASE WHEN $c IS NOT NULL THEN CASE WHEN TRY_CAST($s AS DOUBLE) IS NOT NULL THEN 1.0 ELSE 0.0 END END) >= 0.9
             |    THEN CASE WHEN CAST(sum(CASE WHEN TRY_CAST($s AS DOUBLE) = floor(TRY_CAST($s AS DOUBLE)) THEN 1 ELSE 0 END) AS DOUBLE)
             |                 / nullif(count(TRY_CAST($s AS DOUBLE)), 0) >= 0.95
             |         THEN 'integer' ELSE 'float' END
             |  WHEN ${if (isTs) "TRUE" else "FALSE"} OR $dateParse >= 0.8 THEN 'datetime'
             |  WHEN CAST(count(DISTINCT $s) AS DOUBLE) / count($c) <= 0.3
             |    AND count(DISTINCT $s) < 50 THEN 'categorical'
             |  ELSE 'text' END AS semantic_type,
             |  count($c) AS n, count(DISTINCT $s) AS n_distinct
             |FROM events""".stripMargin
        }
        Seq(
          ladder("event_id", isNum = true, isTs = false),
          ladder("event_type", isNum = false, isTs = false),
          ladder("props", isNum = false, isTs = false),
          ladder("ts", isNum = false, isTs = true),
          ladder("user_id", isNum = true, isTs = false),
          ladder("value", isNum = true, isTs = false))
          .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      },

      "q34_text_vector_profile" -> q34Sql,

      // + 0.0 normalizes IEEE negative zero: a stub component rounding
      // to zero from below published -0.0 on one engine and 0.0 on the
      // other (one row in the r13 sf1 verify); identity for every
      // other value, mirrored on the Spark side
      "q36_multimodal_embed" ->
        (0 until 4).map { j =>
          s"SELECT doc_id, $j AS j, round(CAST(${hash31Sql(s"md5(text) || '#$j'")} AS DOUBLE) / 268435456.0 * 2.0 - 1.0, 6) + 0.0 AS v FROM documents"
        }.mkString("", " UNION ALL ", " ORDER BY doc_id, j"),

      "q35_decode_roundtrip" ->
        s"""WITH tk AS (
           |  SELECT doc_id,
           |    list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
           |                x -> length(x) BETWEEN 2 AND 15) AS toks
           |  FROM documents WHERE text IS NOT NULL),
           |vocab AS (
           |  SELECT tok FROM (SELECT unnest(toks) AS tok FROM tk)
           |  GROUP BY tok ORDER BY count(*) DESC, tok ASC LIMIT $Q35VocabCap),
           |vl AS (SELECT list(tok) AS vlist FROM vocab)
           |SELECT doc_id, array_to_string(toks[1:2], ' ') AS decoded
           |FROM tk, vl
           |WHERE list_has_all(vl.vlist, toks[1:2])
           |ORDER BY doc_id""".stripMargin,

      "q31_multimodal_meta" ->
        s"""SELECT doc_id,
           |  CAST(CASE WHEN doc_id % 2 = 0 THEN 45 ELSE 17 END AS BIGINT) AS n_bytes,
           |  md5(text) AS digest,
           |  64 + ((${hd(1)} * 16 + ${hd(2)}) * 256 + (${hd(3)} * 16 + ${hd(4)})) % 1985 AS width,
           |  64 + ((${hd(5)} * 16 + ${hd(6)}) * 256 + (${hd(7)} * 16 + ${hd(8)})) % 1985 AS height,
           |  CAST(NULL AS BIGINT) AS duration_ms
           |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin)
      // q158 is bpeTrainLocal — bit-identical-by-contract to q155's
      // bpeTrain (spec-enforced), so it shares q155's oracle replay
      .pipe(m => m + ("q158_bpe_train_fast" -> m("q155_bpe_train")))
  }

  // q34 parameters (the md5 embedding component both engines share
  // lives in graft.text.Md5Embedder: first 7 hex digits of
  // md5("token#j") → 28-bit int → uniform [-1, 1)); Q35VocabCap is
  // deliberately below the test corpus's ~30 distinct tokens so the
  // capped-vocab path and the in-vocab filter are genuinely exercised
  private val Q34MaxTokens = 4
  private val Q34Dim = 4
  private val Q35VocabCap = 16

  // q150 parameters: a fixed "trained" MVN text profile — mean vector
  // and lower-triangular Cholesky factor L (positive diagonal in
  // (0.25, 0.75), off-diagonals in (-0.3, 0.3)) — derived from the
  // deterministic FNV hash, so the Spark query and the SQL-build-time
  // oracle inline bit-identical double literals. The PROFILED
  // (mean, L) of the production path can't feed an oracle (a Cholesky
  // factorization is not SQL-expressible); the sampler algebra is
  // what this row pins.
  private val Q150N = 200L
  private val Q159N = 500L
  private val Q161Vocab = 20
  private val Q161Bucket = 8

  /** 28-bit md5 hash (Md5Embedder's layout — `hash31Sql` twin). */
  private def q161Hash(s: String): Int = {
    val d = graft.Digests.md5(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xff) << 20) | ((d(1) & 0xff) << 12) |
      ((d(2) & 0xff) << 4) | ((d(3) & 0xff) >>> 4)
  }

  /** Fixture weight (r, j) of matrix `tag`: low 8 hash bits scaled to
    * [-0.5, 0.496] — dyadic /256, exact in float32, so the value
    * survives the .bin round-trip bit-for-bit and per-dim feature sums
    * stay EXACT (order-independent) on both engines. */
  private def q161Weight(tag: String, r: Int, j: Int): Float =
    (((q161Hash(s"$tag#$r#$j") % 256) / 256.0) - 0.5).toFloat
  private def q150Mean(j: Int): Double =
    graft.text.HashEmbeddings.component("q150mean", j, 150L)
  private def q150L(j: Int, k: Int): Double =
    if (k > j) 0.0
    else if (k == j)
      0.5 + 0.25 * graft.text.HashEmbeddings.component("q150diag", j, 150L)
    else 0.3 * graft.text.HashEmbeddings.component(s"q150L#$j", k, 150L)

  private def q34Sql: String = {
    def comp(tokExpr: String, j: Int): String =
      s"CAST(${hash31Sql(s"$tokExpr || '#$j'")} AS DOUBLE) / 268435456.0 * 2.0 - 1.0"
    val cases = (0 until Q34MaxTokens * Q34Dim).map { i =>
      val ti = i / Q34Dim; val j = i % Q34Dim
      s"SELECT $i AS dim_idx, CASE WHEN len(toks) > $ti THEN ${comp(s"toks[${ti + 1}]", j)} ELSE 0.0 END AS v FROM t"
    }
    s"""WITH t AS (
       |  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> length(x) BETWEEN 2 AND 15) AS toks
       |  FROM documents WHERE text IS NOT NULL),
       |vals AS (${cases.mkString(" UNION ALL ")}),
       |agg AS (SELECT dim_idx, count(*) AS n, sum(v) AS s1, sum(v*v) AS s2 FROM vals GROUP BY dim_idx)
       |SELECT dim_idx, round(s1/n, 6) AS mean,
       |  round(sqrt(greatest(s2/n - (s1/n)*(s1/n), 0)), 6) AS std,
       |  round((SELECT sum((s2 - n*(s1/n)*(s1/n))/(n-1)) FROM agg), 6) AS cov_trace
       |FROM agg ORDER BY dim_idx""".stripMargin
  }

  /** Unrolled oracle twin of [[graft.ops.Corpus.bpeTrain]]'s merge
    * loop (the [[ccRoundsSql]] convention: both engines run the SAME
    * number of rounds, so parity never depends on convergence): CTE
    * stages `v0`..`v<n>` carry the marker-string vocabulary state,
    * `b1`..`b<n>` each round's winning pair — integer counts, ties by
    * pair string, merge application is the identical `replace`. A
    * round with no pairs left (vocab exhausted before round n) leaves
    * `b<r>` empty: the LEFT JOIN carries the state through unchanged
    * and the round contributes no merge row — exactly the engine
    * loop's early stop, so q155/q156 both stay in parity on corpora
    * that fully merge early. */
  /** DuckDB twin of [[graft.ops.Corpus.ilog]]: 256·⌊log2 x⌋ +
    * ⌊x·256/2^⌊log2 x⌋⌋ − 256, all exact-integer (`length(bin(x))` is
    * ⌊log2 x⌋+1 for x ≥ 1; ·256 and the power-of-two division are
    * exact in doubles far past any corpus count). */
  private def ilogSql(x: String): String =
    s"(256 * (length(bin(CAST($x AS BIGINT))) - 1) + " +
      s"CAST(floor(CAST($x AS BIGINT) * 256.0 / " +
      s"power(2.0, length(bin(CAST($x AS BIGINT))) - 1)) AS BIGINT) - 256)"

  /** Staged-CTE replay of [[graft.ops.Corpus.unigramCore]] (q220/q221):
    * word counts → substring seeding → fixed vocab (top-150 ∪ single
    * chars) → `passes` Viterbi passes, each pass's DP unrolled over
    * word positions 1..16 as sequential CTEs (d{r}_{p} = the best
    * (score desc, k asc, path asc) segmentation of the first p chars
    * under pass r's scores), with an M-step recount (c{r}) after each.
    * Pass r scores come from c{r-1} via [[ilogSql]] add-one smoothing —
    * the same exact-integer table the engine uses, so the DP picks
    * identical paths. */
  private def unigramStagesSql(passes: Int): String = {
    val W = 16; val P = 4
    val toks = toksSql("text")
    val head =
      s"""wf AS MATERIALIZED (SELECT u.t AS w, count(*) AS freq
         |    FROM documents, UNNEST($toks) AS u(t)
         |    WHERE length(u.t) <= $W GROUP BY u.t),
         |wsel AS MATERIALIZED (SELECT w, freq FROM wf ORDER BY freq DESC, w LIMIT 1000),
         |sp AS MATERIALIZED (SELECT substr(w, ss.s, ll.l) AS piece, sum(freq) AS cnt
         |    FROM wsel,
         |      LATERAL UNNEST(generate_series(1, length(w))) AS ss(s),
         |      LATERAL UNNEST(generate_series(1, $P)) AS ll(l)
         |    WHERE ss.s + ll.l - 1 <= length(w)
         |    GROUP BY 1),
         |vocab AS MATERIALIZED (SELECT piece FROM
         |      (SELECT piece FROM sp ORDER BY cnt DESC, piece LIMIT 150)
         |    UNION
         |    SELECT DISTINCT substr(w, ss.s, 1)
         |    FROM wsel, LATERAL UNNEST(generate_series(1, length(w))) AS ss(s)),
         |c0 AS MATERIALIZED (SELECT v.piece, coalesce(sp.cnt, 0) AS cnt
         |    FROM vocab v LEFT JOIN sp USING (piece)),
         |nv AS MATERIALIZED (SELECT count(*) AS v FROM vocab)""".stripMargin
    val passSql = (1 to passes).map { r =>
      val score =
        s"""s$r AS MATERIALIZED (SELECT piece, ${ilogSql("cnt + 1")} -
           |    (SELECT ${ilogSql("t")} FROM
           |      (SELECT sum(cnt) + (SELECT v FROM nv) AS t FROM c${r - 1}))
           |    AS s
           |  FROM c${r - 1})""".stripMargin
      val dp0 = s"d${r}_0 AS MATERIALIZED (SELECT w, freq, CAST(0 AS BIGINT) AS st, " +
        "0 AS k, '' AS path FROM wsel)"
      val dps = (1 to W).map { p =>
        val branches = (1 to math.min(P, p)).map { l =>
          s"""SELECT d.w, d.freq, d.st + s.s AS st, d.k + 1 AS k,
             |      d.path || chr(31) || s.piece AS path
             |    FROM d${r}_${p - l} d JOIN s$r s
             |      ON s.piece = substr(d.w, ${p - l + 1}, $l)
             |    WHERE length(d.w) >= $p""".stripMargin
        }.mkString("\n    UNION ALL\n    ")
        s"""d${r}_$p AS MATERIALIZED (SELECT w, freq, st, k, path FROM (
           |  SELECT *, row_number() OVER (PARTITION BY w
           |      ORDER BY st DESC, k ASC, path ASC) AS rn FROM (
           |    $branches)) WHERE rn = 1)""".stripMargin
      }
      val seg = s"seg$r AS MATERIALIZED (" + (1 to W).map(p =>
        s"SELECT w, freq, path FROM d${r}_$p WHERE length(w) = $p")
        .mkString("\n  UNION ALL ") + ")"
      val cnt =
        s"""c$r AS MATERIALIZED (SELECT v.piece, coalesce(x.cnt, 0) AS cnt FROM vocab v
           |  LEFT JOIN (SELECT u.p AS piece, sum(freq) AS cnt
           |    FROM seg$r,
           |      UNNEST(string_split(substr(path, 2), chr(31))) AS u(p)
           |    GROUP BY 1) x USING (piece))""".stripMargin
      (Seq(score, dp0) ++ dps ++ Seq(seg, cnt)).mkString(",\n")
    }.mkString(",\n")
    head + ",\n" + passSql
  }

  private def bpeStagesSql(n: Int): String = {
    val toks = toksSql("text")
    val init =
      s"""v0 AS (
         |  SELECT w, freq,
         |    '<' || array_to_string(list_transform(range(length(w)),
         |      i -> substr(w, CAST(i + 1 AS INT), 1)), '><') || '>' AS st
         |  FROM (SELECT tok AS w, CAST(count(*) AS BIGINT) AS freq
         |        FROM (SELECT unnest($toks) AS tok FROM documents)
         |        GROUP BY 1))""".stripMargin
    bpeStageChain(init, n)
  }

  /** Byte-level variant of [[bpeStagesSql]]: whitespace words of the
    * e→é-injected documents text, symbols = lowercase hex byte pairs
    * (graft.ops.Corpus.bpeTrainBytesLocal's published form). The merge
    * stages are IDENTICAL — the pair/replace algebra never looks
    * inside a symbol. */
  private def bpeBytesStagesSql(n: Int): String = {
    val words = "list_filter(regexp_split_to_array(" +
      "regexp_replace(text, 'e', chr(233), 'g'), '\\s+'), x -> x <> '')"
    val init =
      s"""v0 AS (
         |  SELECT w, freq,
         |    regexp_replace(lower(hex(w)), '([0-9a-f]{2})', '<\\1>', 'g') AS st
         |  FROM (SELECT tok AS w, CAST(count(*) AS BIGINT) AS freq
         |        FROM (SELECT unnest($words) AS tok
         |              FROM documents WHERE text IS NOT NULL)
         |        GROUP BY 1))""".stripMargin
    bpeStageChain(init, n)
  }

  private def bpeStageChain(init: String, n: Int): String = {
    val stages = (1 to n).map { r =>
      s"""px$r AS (SELECT freq, s, unnest(range(len(s) - 1)) AS i
         |  FROM (SELECT freq, string_split(trim(st, '><'), '><') AS s
         |        FROM v${r - 1})),
         |b$r AS (SELECT pair, cnt FROM (
         |    SELECT '<' || s[CAST(i + 1 AS INT)] || '><' || s[CAST(i + 2 AS INT)] || '>' AS pair,
         |      CAST(sum(freq) AS BIGINT) AS cnt
         |    FROM px$r GROUP BY 1)
         |  ORDER BY cnt DESC, pair ASC LIMIT 1),
         |v$r AS (SELECT w, freq,
         |    CASE WHEN b.pair IS NULL THEN st
         |         ELSE replace(st, b.pair,
         |           '<' || replace(trim(b.pair, '><'), '><', '') || '>')
         |    END AS st
         |  FROM v${r - 1} LEFT JOIN b$r b ON TRUE)""".stripMargin
    }
    (init +: stages).mkString(",\n")
  }

  /** Shared SQL stages of the curation replay (q52 batch, q154
    * streaming): `cleaned` (markup strip + URL drop + PII redaction)
    * over an upstream CTE `injected`(id, text[, carry...]), then
    * [[curateFeatFiltSql]]'s `feat`/`filt` (langid, quality, token
    * count, the q52 config's filters) over any stage that carries
    * (id, text_clean[, carry...]). `feat` also emits `fp`, the
    * cleaned-content fingerprint both engines' dedup stages key on. */
  private def curateCleanedSql(carry: Seq[String]): String = {
    val cy = carry.map(c => s", $c").mkString
    val tag = "<[^>]*>"
    val url = "https?://[A-Za-z0-9./_%?&=#+-]+"
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "[+(][0-9 ()-]{6,}[0-9]"
    s"""cleaned AS (
       |  SELECT id$cy,
       |    regexp_replace(regexp_replace(
       |      trim(regexp_replace(
       |        regexp_replace(regexp_replace(text, '$tag', ' ', 'g'), '$url', ' ', 'g'),
       |        '\\s+', ' ', 'g')),
       |      '$email', '<EMAIL>', 'g'), '$phone', '<PHONE>', 'g') AS text_clean
       |  FROM injected)""".stripMargin
  }

  private def curateFeatFiltSql(from: String, carry: Seq[String]): String = {
    val cy = carry.map(c => s", $c").mkString
    val ct = toksSql("text_clean")
    def sw(lang: String) =
      s"len(list_filter($ct, x -> list_contains(${dlist(stop(lang))}, x)))"
    val punct = s"""CAST(length(text_clean) - length(regexp_replace(text_clean, '[\\.,;:!\\?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE) / length(text_clean)"""
    val swRatio = s"CAST(${sw("en")} AS DOUBLE) / len($ct)"
    val mtl = s"CAST(list_sum(list_transform($ct, x -> CAST(length(x) AS BIGINT))) AS DOUBLE) / len($ct)"
    s"""feat AS (
       |  SELECT id$cy, text_clean,
       |    CASE WHEN regexp_matches(text_clean, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |         WHEN ${sw("en")} = 0 AND ${sw("de")} = 0 AND ${sw("es")} = 0 AND ${sw("fr")} = 0 THEN 'und'
       |         WHEN ${sw("en")} >= ${sw("de")} AND ${sw("en")} >= ${sw("es")} AND ${sw("en")} >= ${sw("fr")} THEN 'en'
       |         WHEN ${sw("de")} >= ${sw("es")} AND ${sw("de")} >= ${sw("fr")} THEN 'de'
       |         WHEN ${sw("es")} >= ${sw("fr")} THEN 'es'
       |         ELSE 'fr' END AS lang,
       |    CAST((CASE WHEN len($ct) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END) * 0.3
       |      + (CASE WHEN $mtl >= 2.0 AND $mtl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.3
       |      + (CASE WHEN $punct <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.2
       |      + (CASE WHEN $swRatio >= 0.01 THEN 1.0 ELSE 0.0 END) * 0.2 AS DOUBLE) AS quality,
       |    CAST(len($ct) AS BIGINT) AS n_tokens,
       |    md5(array_to_string($ct, ' ')) AS fp
       |  FROM $from),
       |filt AS (
       |  SELECT * FROM feat
       |  WHERE lang = 'en' AND quality >= 0.5 AND n_tokens >= 5)""".stripMargin
  }

  /** Oracle twin of q161's fastText classifier: gensim tokens in
    * order, FNV-1a-32 unrolled to 15 per-char steps (token length is
    * tokenizer-bounded), word-ngram buckets via sign-extended WRAPPING
    * uint64 arithmetic in HUGEINT mod 2^64, md5-derived exact-dyadic
    * weight matrices regenerated in SQL, per-dim feature sums (exact,
    * order-free), then the same left-associated logit algebra. */
  private def q161Sql: String = {
    val toks = "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), " +
      "x -> length(x) BETWEEN 2 AND 15)"
    val fnvNested = (1 to 15).map { k =>
      s"SELECT tok, CASE WHEN length(tok) >= $k THEN (xor(h, ascii(substr(tok, $k, 1))) * 16777619) % 4294967296 ELSE h END AS h FROM"
    }.foldLeft("(SELECT DISTINCT tok, CAST(2166136261 AS BIGINT) AS h FROM tok_ord)") {
      (inner, sel) => s"($sel $inner)"
    }
    def hu(x: String): String =
      s"(CASE WHEN $x < 2147483648 THEN CAST($x AS HUGEINT) " +
        s"ELSE CAST($x AS HUGEINT) - 4294967296 + 18446744073709551616 END)"
    def wSql(tag: String, rv: String, jv: String): String =
      s"CAST(${hash31Sql(s"'$tag#' || CAST($rv AS VARCHAR) || '#' || CAST($jv AS VARCHAR)")} % 256 AS DOUBLE) / 256.0 - 0.5"
    def pivot8: String = (0 until 2).flatMap(l => (0 until 4).map(j =>
      s"max(CASE WHEN l = $l AND j = $j THEN v END) AS o$l$j")).mkString(", ")
    val nRows = Q161Vocab + Q161Bucket
    s"""WITH tk AS (
       |  SELECT doc_id, $toks AS toks FROM documents WHERE text IS NOT NULL),
       |tok_ord AS (
       |  SELECT doc_id, ord, toks[ord] AS tok FROM (
       |    SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS ord FROM tk)),
       |fnv AS (SELECT tok, h FROM $fnvNested),
       |vocab AS (SELECT tok, rid FROM (
       |    SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok ASC) - 1 AS rid
       |    FROM (SELECT tok, count(*) AS cnt FROM tok_ord GROUP BY tok))
       |  WHERE rid < $Q161Vocab),
       |mat AS (SELECT r, j, ${wSql("q161w", "r", "j")} AS v
       |  FROM range($nRows) t1(r), range(4) t2(j)),
       |ow AS (SELECT $pivot8 FROM (
       |  SELECT l, j, ${wSql("q161o", "l", "j")} AS v
       |  FROM range(2) t1(l), range(4) t2(j))),
       |feats AS (
       |  SELECT t.doc_id, v.rid AS fid FROM tok_ord t JOIN vocab v USING (tok)
       |  UNION ALL
       |  SELECT a.doc_id, $Q161Vocab + CAST(
       |      ((${hu("fa.h")} * 116049371 + ${hu("fb.h")}) % 18446744073709551616)
       |      % $Q161Bucket AS INTEGER) AS fid
       |  FROM tok_ord a
       |  JOIN tok_ord b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
       |  JOIN fnv fa ON fa.tok = a.tok
       |  JOIN fnv fb ON fb.tok = b.tok),
       |hs AS (SELECT f.doc_id, m.j, sum(m.v) AS s
       |  FROM feats f JOIN mat m ON m.r = f.fid GROUP BY 1, 2),
       |hn AS (SELECT doc_id, count(*) AS n FROM feats GROUP BY 1),
       |hw AS (SELECT doc_id,
       |    max(CASE WHEN j = 0 THEN s END) AS s0,
       |    max(CASE WHEN j = 1 THEN s END) AS s1,
       |    max(CASE WHEN j = 2 THEN s END) AS s2,
       |    max(CASE WHEN j = 3 THEN s END) AS s3
       |  FROM hs GROUP BY 1),
       |lg AS (SELECT hw.doc_id,
       |    o00 * (s0 / n) + o01 * (s1 / n) + o02 * (s2 / n) + o03 * (s3 / n) AS l0,
       |    o10 * (s0 / n) + o11 * (s1 / n) + o12 * (s2 / n) + o13 * (s3 / n) AS l1
       |  FROM hw JOIN hn USING (doc_id), ow)
       |SELECT d.doc_id,
       |  CASE WHEN lg.doc_id IS NULL THEN NULL
       |       WHEN l1 > l0 THEN '__label__drop' ELSE '__label__keep' END AS label,
       |  CASE WHEN lg.doc_id IS NULL THEN NULL
       |       ELSE round(CASE WHEN l1 > l0 THEN l1 ELSE l0 END, 6) END AS score
       |FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
       |LEFT JOIN lg ON lg.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Oracle twin of q160's SVG plot sink: the same integer pixel
    * geometry (heights via BIGINT floor-division `//`, positions on
    * the fixed grid) and the same ordered string assembly, so the
    * rendered documents are byte-identical. */
  private def q160Sql: String = {
    val histHeader = """<svg xmlns="http://www.w3.org/2000/svg" width="1000" height="600">""" +
      "<title>l_extendedprice histogram</title>"
    val barHeader = """<svg xmlns="http://www.w3.org/2000/svg" width="1000" height="600">""" +
      "<title>o_orderstatus counts</title>"
    s"""WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem),
       |hist AS (
       |  SELECT CAST(least(greatest(floor((l_extendedprice - lo) / (hi - lo) * 50), 0), 49) AS INTEGER) AS bucket,
       |         count(*) AS cnt
       |  FROM lineitem, b GROUP BY 1),
       |hm AS (SELECT max(cnt) AS mx FROM hist),
       |hr AS (SELECT bucket,
       |    printf('<rect x="%d" y="%d" width="18" height="%d"/>',
       |      bucket * 20, 550 - (cnt * 500) // mx, (cnt * 500) // mx) AS frag
       |  FROM hist, hm),
       |vc AS (SELECT CAST(o_orderstatus AS VARCHAR) AS value, count(*) AS cnt
       |  FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1),
       |vi AS (SELECT value, cnt,
       |    row_number() OVER (ORDER BY cnt DESC, value ASC) - 1 AS idx
       |  FROM vc ORDER BY cnt DESC, value ASC LIMIT 10),
       |vk AS (SELECT count(*) AS k, max(cnt) AS mx FROM vi),
       |vr AS (SELECT idx,
       |    printf('<rect x="%d" y="%d" width="%d" height="%d"/>',
       |      idx * (1000 // k), 550 - (cnt * 500) // mx,
       |      greatest(1000 // k - 10, 1), (cnt * 500) // mx)
       |    || printf('<text x="%d" y="580">%s</text>', idx * (1000 // k),
       |      replace(replace(replace(value, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')) AS frag
       |  FROM vi, vk)
       |SELECT 'histogram_extendedprice' AS plot,
       |  '$histHeader' || string_agg(frag, '' ORDER BY bucket) || '</svg>' AS svg
       |FROM hr
       |UNION ALL
       |SELECT 'bar_orderstatus' AS plot,
       |  '$barHeader' || string_agg(frag, '' ORDER BY idx) || '</svg>' AS svg
       |FROM vr
       |ORDER BY plot""".stripMargin
  }

  /** Oracle twin of q159's deterministic synthetic pipeline: the SAME
    * exact-decimal profile moments (epoch CENTERED on min), the SAME
    * quantization (round 6 for the small-scale numerics, round 2 for
    * epochs — the q01/q07-proven cross-engine precisions), and the
    * SAME md5 Irwin–Hall draws, composed per generator family. Every
    * arithmetic step is written in the same association order as the
    * Spark expressions so doubles stay bit-identical. */
  private def q159Sql: String = {
    def uSql(tag: String, j: Int): String =
      s"((CAST(${hash31Sql(s"'$tag#' || CAST(gen_id AS VARCHAR) || '#0#$j'")} AS DOUBLE) + 0.5) / 268435456.0)"
    def zSql(tag: String): String =
      (0 until 12).map(j => uSql(tag, j)).mkString("(", " + ", " - 6.0)")
    s"""WITH st AS (
       |  SELECT count(*) AS n,
       |    CAST(sum(CAST(o_custkey AS DECIMAL(38,6))) AS DOUBLE) AS s_ck,
       |    CAST(sum(CAST(o_custkey * o_custkey AS DECIMAL(38,6))) AS DOUBLE) AS ss_ck,
       |    CAST(min(o_custkey) AS DOUBLE) AS mn_ck,
       |    CAST(max(o_custkey) AS DOUBLE) AS mx_ck,
       |    CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS s_tp,
       |    CAST(sum(CAST(o_totalprice * o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS ss_tp,
       |    min(o_totalprice) AS mn_tp, max(o_totalprice) AS mx_tp,
       |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS DOUBLE) AS bt
       |  FROM orders),
       |emn AS (SELECT min(CAST(epoch(o_orderdate) AS BIGINT)) AS mn_e FROM orders),
       |est AS (SELECT
       |    CAST(sum(CAST(CAST(epoch(o_orderdate) AS BIGINT) - mn_e AS DECIMAL(38,6))) AS DOUBLE) AS s_e,
       |    CAST(sum(CAST((CAST(epoch(o_orderdate) AS BIGINT) - mn_e) * (CAST(epoch(o_orderdate) AS BIGINT) - mn_e) AS DECIMAL(38,0))) AS DOUBLE) AS ss_e,
       |    CAST(max(CAST(epoch(o_orderdate) AS BIGINT)) AS DOUBLE) AS mx_e
       |  FROM orders, emn),
       |p AS (SELECT
       |    round(s_ck / n, 6) AS mean_ck,
       |    round(sqrt(ss_ck / n - (s_ck / n) * (s_ck / n)), 6) AS std_ck,
       |    mn_ck, mx_ck,
       |    round(s_tp / n, 6) AS mean_tp,
       |    round(sqrt(ss_tp / n - (s_tp / n) * (s_tp / n)), 6) AS std_tp,
       |    mn_tp, mx_tp,
       |    CAST(mn_e AS DOUBLE) + round(s_e / n, 2) AS mean_e,
       |    -- datetimeDay's sigma=0 fallback (Latanova_v1.py:411): a
       |    -- degenerate date column generates with a 30-day spread
       |    CASE WHEN round(sqrt(ss_e / n - (s_e / n) * (s_e / n)), 2) > 0
       |         THEN round(sqrt(ss_e / n - (s_e / n) * (s_e / n)), 2)
       |         ELSE 86400.0 * 30 END AS std_e,
       |    CAST(mn_e AS DOUBLE) AS mnd_e, mx_e,
       |    bt / n AS p_bool
       |  FROM st, emn, est),
       |cat AS (SELECT CAST(o_orderstatus AS VARCHAR) AS val, count(*) AS cnt
       |  FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1),
       |cum AS (SELECT val,
       |    CAST(cnt AS DOUBLE) / (SELECT sum(cnt) FROM cat) AS pr,
       |    row_number() OVER (ORDER BY cnt DESC, val ASC) AS rn FROM cat),
       |cum2 AS (SELECT val, rn,
       |    sum(pr) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS cp FROM cum),
       |r AS (SELECT CAST(i AS BIGINT) AS gen_id FROM range($Q159N) t(i)),
       |g AS (SELECT gen_id,
       |    ${zSql("q159ck")} AS z_ck, ${zSql("q159tp")} AS z_tp,
       |    ${zSql("q159d")} AS z_d,
       |    ${uSql("q159b", 0)} AS u_b, ${uSql("q159c", 0)} AS u_c
       |  FROM r)
       |SELECT gen_id,
       |  CAST(floor(least(greatest(z_ck * std_ck + mean_ck, mn_ck), mx_ck) + 0.5) AS BIGINT) AS num_int,
       |  floor(least(greatest(z_tp * std_tp + mean_tp, mn_tp), mx_tp) * 100.0 + 0.5) / 100.0 AS num_float,
       |  CASE WHEN u_b < p_bool THEN 'True' ELSE 'False' END AS bool_val,
       |  coalesce(
       |    (SELECT val FROM cum2 WHERE g.u_c < cum2.cp ORDER BY rn LIMIT 1),
       |    (SELECT val FROM cum2 ORDER BY rn DESC LIMIT 1)) AS cat_val,
       |  strftime(DATE '1970-01-01' + CAST(floor(least(greatest(z_d * std_e + mean_e, mnd_e), mx_e) / 86400.0) AS INTEGER), '%Y-%m-%d') AS dt_val
       |FROM g, p ORDER BY gen_id""".stripMargin
  }

  /** Oracle twin of the q150 deterministic-mode MVN text generator:
    * z from md5 Irwin–Hall(12) pseudo-normals (12 exact 28-bit
    * uniforms summed, minus 6 — transcendental-free, so every
    * intermediate is bit-identical cross-engine), y = mean + L·z with
    * the same left-associated literal arithmetic as the Spark fold,
    * decode = per-slot argmax cosine over q35's frequency-capped
    * vocab. */
  private def q150Sql: String = {
    val width = 2 * Q34Dim
    def dl(x: Double): String = x.toString
    def uSql(k: Int, j: Int): String =
      s"((CAST(${hash31Sql(s"'q150z#' || CAST(gen_id AS VARCHAR) || '#$k#$j'")} AS DOUBLE) + 0.5) / 268435456.0)"
    def zSql(k: Int): String =
      (0 until 12).map(j => uSql(k, j)).mkString("(", " + ", " - 6.0)")
    val ys = (0 until width).map { j =>
      val e = (0 to j).foldLeft(dl(q150Mean(j))) { (acc, k) =>
        s"$acc + ${dl(q150L(j, k))} * ${zSql(k)}" }
      s"($e) AS y$j"
    }
    val comps = (0 until Q34Dim).map(j =>
      s"CAST(${hash31Sql(s"tok || '#$j'")} AS DOUBLE) / 268435456.0 * 2.0 - 1.0")
    s"""WITH tk AS (
       |  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
       |                     x -> length(x) BETWEEN 2 AND 15) AS toks
       |  FROM documents WHERE text IS NOT NULL),
       |vocab AS (
       |  SELECT tok FROM (SELECT unnest(toks) AS tok FROM tk)
       |  GROUP BY tok ORDER BY count(*) DESC, tok ASC LIMIT $Q35VocabCap),
       |vn AS (SELECT tok, v, sqrt(list_dot_product(v, v)) AS nn FROM (
       |  SELECT tok, ${comps.mkString("[", ", ", "]")} AS v FROM vocab)),
       |r AS (SELECT CAST(i AS BIGINT) AS gen_id FROM range(${Q150N}) t(i)),
       |y AS (SELECT gen_id, ${ys.mkString(", ")} FROM r),
       |slots AS (
       |  SELECT gen_id, 0 AS s, [y0, y1, y2, y3] AS q FROM y
       |  UNION ALL
       |  SELECT gen_id, 1 AS s, [y4, y5, y6, y7] AS q FROM y),
       |sq AS (SELECT gen_id, s, q, sqrt(list_dot_product(q, q)) AS qn FROM slots),
       |sc AS (SELECT gen_id, s, tok,
       |    CASE WHEN nn = 0 OR qn = 0 THEN -1.0
       |         ELSE list_dot_product(q, v) / (nn * qn) END AS sim
       |  FROM sq CROSS JOIN vn),
       |best AS (SELECT gen_id, s, tok FROM (
       |    SELECT gen_id, s, tok, row_number() OVER (PARTITION BY gen_id, s
       |      ORDER BY sim DESC, tok ASC) AS rn FROM sc)
       |  WHERE rn = 1)
       |SELECT gen_id, string_agg(tok, ' ' ORDER BY s) AS decoded
       |FROM best GROUP BY gen_id ORDER BY gen_id""".stripMargin
  }

  // q37 parameters: small enough that the inlined-literal oracle SQL
  // stays readable, large enough that buckets genuinely split the corpus
  private val Q37Bits = 8
  private val Q37Tables = 2
  private val Q37Seed = 42L
  private val Q37Dim = 64 // embeddings.parquet element count (TESTDATA.md)

  /** Oracle twin of [[graft.ops.Similarity.cosineNearDupBucketed]]: the
    * deterministic FNV-seeded hyperplanes are evaluated here and inlined
    * as literal DOUBLE[] constants (same trick as [[minhashMinsSql]]),
    * so DuckDB replays bucket assignment + exact verification. */
  private def q37Sql: String = {
    def bucket(t: Int): String = {
      val bits = (0 until Q37Bits).map { b =>
        val plane = (0 until Q37Dim)
          .map(j => graft.text.HashEmbeddings.component(s"$b#$j", 0, Q37Seed + t))
          .mkString("[", ", ", "]")
        s"CASE WHEN list_dot_product(v, $plane) >= 0 THEN '1' ELSE '0' END"
      }
      bits.mkString("concat(", ", ", ")")
    }
    val tables = (0 until Q37Tables)
      .map(t => s"SELECT id, $t AS tbl, ${bucket(t)} AS bucket FROM v")
      .mkString(" UNION ALL ")
    s"""WITH dup AS (SELECT * FROM ${withDupsSql("embeddings", "vec_id", 50, 10000)}),
       |v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM dup WHERE embedding IS NOT NULL),
       |tab AS ($tables),
       |cand AS (
       |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
       |  FROM tab l JOIN tab r
       |    ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.id < r.id)
       |SELECT id_a, id_b,
       |  round(list_cosine_similarity(a.v, b.v), 6) AS sim
       |FROM cand JOIN v a ON a.id = id_a JOIN v b ON b.id = id_b
       |WHERE list_cosine_similarity(a.v, b.v) >= 0.99
       |ORDER BY id_a, id_b""".stripMargin
  }

  private val Q38K = 8
  private val Q38Iters = 2

  /** Oracle twin of [[graft.ops.Similarity.kmeansCentroids]]: seed
    * centroids = k lowest ids, then `Q38Iters` Lloyd rounds — each an
    * argmax-cosine assignment plus per-(cluster, dim) mean; clusters
    * that lose every member keep the previous centroid (left join +
    * coalesce on both engines). */
  private val PqM = 4
  private val PqK = 8
  private val PqIters = 2
  private val PqSubDim = Q37Dim / PqM // 16
  // q142 IVF-PQ coarse index: few enough cells that the oracle's
  // centroid CTE stays readable, probes < cells so pruning is real
  private val IvfCells = 8
  private val IvfProbe = 2

  /** Shared CTE chain replaying [[graft.ops.Quantize.pqTrain]] +
    * [[graft.ops.Quantize.pqEncode]]: slice into PqM subspaces, seed
    * each with the PqK lowest-id subvectors, PqIters Lloyd rounds with
    * ALL subspaces in one round-CTE (mirror of the engine's grouped
    * training), then the final code assignment. `corpusFilter`
    * selects the training corpus (q131 trains on vec_id >= 5 only). */
  private def pqSql(corpusFilter: String, iters: Int = PqIters): String = {
    def round(i: Int): String =
      s"""pasg$i AS (
         |  SELECT id, subspace, centroid_id, sv FROM (
         |    SELECT b.id, b.subspace, ct.centroid_id, b.sv,
         |      row_number() OVER (PARTITION BY b.id, b.subspace
         |        ORDER BY list_distance(b.sv, ct.cv) ASC, ct.centroid_id ASC) AS rn
         |    FROM psub b JOIN pcent${i - 1} ct USING (subspace))
         |  WHERE rn = 1),
         |pm$i AS (
         |  SELECT subspace, centroid_id, i AS pos, avg(sv[i + 1]) AS m
         |  FROM pasg$i CROSS JOIN range($PqSubDim) t(i)
         |  GROUP BY 1, 2, 3),
         |pcent$i AS (
         |  SELECT ct.subspace, ct.centroid_id, coalesce(nm.ncv, ct.cv) AS cv
         |  FROM pcent${i - 1} ct LEFT JOIN
         |    (SELECT subspace, centroid_id, list(m ORDER BY pos) AS ncv
         |     FROM pm$i GROUP BY 1, 2) nm
         |    USING (subspace, centroid_id))""".stripMargin
    s"""pcorpus AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings $corpusFilter),
       |psub AS (SELECT id, s AS subspace,
       |    v[s * $PqSubDim + 1 : s * $PqSubDim + $PqSubDim] AS sv
       |  FROM pcorpus CROSS JOIN range($PqM) t(s)),
       |pcent0 AS (SELECT subspace, id AS centroid_id, sv AS cv FROM psub
       |  WHERE id IN (SELECT id FROM pcorpus ORDER BY id LIMIT $PqK)),
       |${if (iters > 0) (1 to iters).map(round).mkString(",\n") + ",\n" else ""}pcodes AS (
       |  SELECT id, subspace, centroid_id AS code FROM (
       |    SELECT b.id, b.subspace, ct.centroid_id,
       |      row_number() OVER (PARTITION BY b.id, b.subspace
       |        ORDER BY list_distance(b.sv, ct.cv) ASC, ct.centroid_id ASC) AS rn
       |    FROM psub b JOIN pcent$iters ct USING (subspace))
       |  WHERE rn = 1)""".stripMargin
  }

  /** The full PQ-ADC replay chain (training via [[pqSql]] on the
    * vec_id >= 5 corpus, queries = vec_id < 5, top-10 by ascending
    * ADC distance) ending in CTE `pqtop` (query_id, rank, neighbor_id,
    * adist); also exposes `pqq` (query vectors) and `pcorpus` for
    * downstream audits (q137). */
  private def pqAdcPrefixSql(iters: Int = PqIters): String =
    s"""${pqSql("WHERE vec_id >= 5", iters)},
       |pqq AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id < 5),
       |pqsub AS (SELECT id, s AS subspace,
       |    v[s * $PqSubDim + 1 : s * $PqSubDim + $PqSubDim] AS sv
       |  FROM pqq CROSS JOIN range($PqM) t(s)),
       |pdtab AS (SELECT q.id AS query_id, q.subspace,
       |    ct.centroid_id AS code, list_distance(q.sv, ct.cv) ** 2 AS d2
       |  FROM pqsub q JOIN pcent$iters ct USING (subspace))""".stripMargin

  private def pqAdcSql: String =
    s"""${pqAdcPrefixSql()},
       |pscore AS (SELECT d.query_id, c.id AS neighbor_id,
       |    sum(d.d2) AS adist
       |  FROM pcodes c JOIN pdtab d
       |    ON c.subspace = d.subspace AND c.code = d.code
       |  GROUP BY 1, 2),
       |pqtop AS (SELECT query_id, rank, neighbor_id, adist
       |  FROM (SELECT query_id, neighbor_id, adist,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adist ASC, neighbor_id ASC) AS rank FROM pscore)
       |  WHERE rank <= 10)""".stripMargin

  /** IVF-PQ replay: [[pqAdcPrefixSql]]'s training/table CTEs plus the
    * coarse inverted-file index (cells = the lowest-id corpus vectors,
    * L2 cell assignment with ties → lowest cell, $IvfProbe probed
    * cells per query) restricting the ADC scoring join — ends in CTE
    * `ivftop` (query_id, rank, neighbor_id, adist). The cell COUNT is
    * the engine's exact sizing formula, evaluated dynamically:
    * $IvfCells under the 2048-row gate, corpus-sized (~125/cell,
    * floor $IvfCells, sqrt-scaled past the 4096 soft cap) above — so
    * this one replay is
    * value-valid at every scale (r14; the r13 sf1 sweep had to book
    * q142 as a designed divergence against the pinned LIMIT). */
  private def ivfPqAdcSql(iters: Int = PqIters): String =
    s"""${pqAdcPrefixSql(iters)},
       |icells AS (SELECT id AS cell_id, v AS ccv
       |  FROM pcorpus ORDER BY id
       |  LIMIT (SELECT CASE WHEN count(*) <= 2048 THEN $IvfCells
       |                     WHEN (count(*) + 124) // 125 <= 4096
       |                     THEN greatest($IvfCells, (count(*) + 124) // 125)
       |                     ELSE CAST(ceil(sqrt(
       |                       ((count(*) + 124) // 125) * 4096.0)) AS BIGINT) END
       |         FROM pcorpus)),
       |icasg AS (SELECT id, cell_id AS cell FROM (
       |    SELECT c.id, ce.cell_id,
       |      row_number() OVER (PARTITION BY c.id
       |        ORDER BY list_distance(c.v, ce.ccv) ASC, ce.cell_id ASC) AS rn
       |    FROM pcorpus c CROSS JOIN icells ce) WHERE rn = 1),
       |iprobe AS (SELECT query_id, cell_id FROM (
       |    SELECT q.id AS query_id, ce.cell_id,
       |      row_number() OVER (PARTITION BY q.id
       |        ORDER BY list_distance(q.v, ce.ccv) ASC, ce.cell_id ASC) AS rn
       |    FROM pqq q CROSS JOIN icells ce) WHERE rn <= $IvfProbe),
       |iscore AS (SELECT d.query_id, c.id AS neighbor_id, sum(d.d2) AS adist
       |  FROM pcodes c JOIN icasg a USING (id)
       |  JOIN iprobe pr ON a.cell = pr.cell_id
       |  JOIN pdtab d ON d.query_id = pr.query_id
       |    AND d.subspace = c.subspace AND d.code = c.code
       |  GROUP BY 1, 2),
       |ivftop AS (SELECT query_id, rank, neighbor_id, adist
       |  FROM (SELECT query_id, neighbor_id, adist,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adist ASC, neighbor_id ASC) AS rank FROM iscore)
       |  WHERE rank <= 10)""".stripMargin

  private val Q202Terms = Seq("spark", "vector", "window")
  private val Q203Phrases =
    Seq(Seq("table", "table"), Seq("value", "table", "part"),
      Seq("fast", "spark"))

  /** BM25 replay CTE chain over `documents` for a fixed term set
    * (shared by q115 and q202): `base`/`lens`/`stats`/`tf`/`dfq`,
    * ending at `contrib(doc_id, term, c)`. */
  private def bm25CtesSql(terms: Seq[String],
                          k1: Double = 1.2, b: Double = 0.75): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""base AS (SELECT doc_id, ${toksSql("text")} AS w FROM documents),
       |lens AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM base),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    avg(CAST(dl AS DOUBLE)) AS avgdl FROM lens),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(w) AS term FROM base)
       |  WHERE term IN ($inList) GROUP BY 1, 2),
       |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |contrib AS (SELECT doc_id, term,
       |    ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) *
       |      (tf * ${k1 + 1.0}) /
       |      (tf + $k1 * (${1.0 - b} + $b * CAST(dl AS DOUBLE) / avgdl)) AS c
       |  FROM tf JOIN dfq USING (term) JOIN lens USING (doc_id)
       |  CROSS JOIN stats)""".stripMargin
  }

  /** Fixed term order, left-associated additions — same evaluation
    * order as the Spark expression, so doubles agree bit-for-bit. */
  private def bm25TotalSql(terms: Seq[String]): String =
    terms.map(t =>
      s"coalesce(max(CASE WHEN term = '$t' THEN c END), 0.0)").mkString(" + ")

  /** Calibration replay shared by q204 (batch) and q206 (streaming
    * twin — same merged sums, same readoff): q21's langid chain,
    * Laplace-smoothed winning share, equal-width bins, DECIMAL
    * confidence sums, wgap = |Σcorrect − Σconf| / N per bin. */
  private def q204Sql: String = {
    def sw(lang: String) =
      s"len(list_filter(${toksSql("text")}, x -> list_contains(${dlist(stop(lang))}, x)))"
    s"""WITH sw AS (SELECT doc_id, lang AS lang_actual, text,
       |    ${sw("en")} AS se, ${sw("de")} AS sd,
       |    ${sw("es")} AS ss, ${sw("fr")} AS sf FROM documents),
       |pred AS (SELECT *,
       |    CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |         WHEN se = 0 AND sd = 0 AND ss = 0 AND sf = 0 THEN 'und'
       |         WHEN se >= sd AND se >= ss AND se >= sf THEN 'en'
       |         WHEN sd >= ss AND sd >= sf THEN 'de'
       |         WHEN ss >= sf THEN 'es'
       |         ELSE 'fr' END AS lang_pred
       |  FROM sw),
       |sel AS (SELECT
       |    CAST(greatest(se, sd, ss, sf) + 1 AS DOUBLE) /
       |      CAST(se + sd + ss + sf + 4 AS DOUBLE) AS p,
       |    CASE WHEN lang_pred = lang_actual THEN 1 ELSE 0 END AS c
       |  FROM pred WHERE lang_pred IN ('en', 'de', 'es', 'fr')),
       |b AS (SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin, p, c
       |  FROM sel WHERE p IS NOT NULL AND p >= 0 AND p <= 1),
       |tot AS (SELECT count(*) AS nt FROM b)
       |SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |  round(CAST(sum(CAST(p AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6)
       |    AS avg_conf,
       |  round(CAST(sum(c) AS DOUBLE) / count(*), 6) AS acc,
       |  round(CAST(abs(CAST(sum(c) AS DECIMAL(38,12))
       |      - sum(CAST(p AS DECIMAL(38,12)))) AS DOUBLE) / nt, 6) AS wgap
       |FROM b CROSS JOIN tot GROUP BY bin, nt ORDER BY bin""".stripMargin
  }

  /** Shared calibration-row derivation (q204 batch report, q206
    * streaming twin): langid over the four stopword counts,
    * confidence = Laplace-smoothed posterior share of the winning
    * language, (win + 1)/(total + 4) — the Dirichlet(1,1,1,1)
    * posterior mean over the candidates: evidence-aware (one stopword
    * hit is a weak win, twenty are near-certain), never divides by
    * zero, and spreads across bins where the raw share degenerates to
    * 1.0 on single-language text. Returns (doc_id, conf, correct). */
  private def calibScored(s: SparkSession, d: String): DataFrame = {
    val c = col("text")
    t(s, d, "documents").select(
        col("doc_id"), col("lang").as("lang_actual"), c,
        TextAnalysis.stopwordCount(c, "en").as("sw_en"),
        TextAnalysis.stopwordCount(c, "de").as("sw_de"),
        TextAnalysis.stopwordCount(c, "es").as("sw_es"),
        TextAnalysis.stopwordCount(c, "fr").as("sw_fr"))
      .withColumn("lang_pred", TextAnalysis.langIdFromCounts(c,
        col("sw_en"), col("sw_de"), col("sw_es"), col("sw_fr")))
      .filter(col("lang_pred").isin("en", "de", "es", "fr"))
      .select(col("doc_id"),
        ((greatest(col("sw_en"), col("sw_de"), col("sw_es"), col("sw_fr"))
          + lit(1)).cast("double") /
          (col("sw_en") + col("sw_de") + col("sw_es") + col("sw_fr")
            + lit(4)).cast("double")).as("conf"),
        (col("lang_pred") === col("lang_actual")).cast("int").as("correct"))
  }

  /** The kmeans replay CTE chain shared by q38 (centroid dump), q201
    * (silhouette), and q234 (refined persisted IVF index): `corpus`,
    * `cent0`, Lloyd rounds, ending with `cent$iters` available for
    * the caller's SELECT. `where` filters the corpus (and the seed)
    * — empty replays the full table (q38/q201's historical shape). */
  private def kmeansCtesSql(k: Int = Q38K, iters: Int = Q38Iters,
                            where: String = ""): String = {
    def round(i: Int): String =
      s"""asg$i AS (
         |  SELECT id, centroid_id, v FROM (
         |    SELECT c.id, ct.centroid_id, c.v,
         |      row_number() OVER (PARTITION BY c.id
         |        ORDER BY list_cosine_similarity(c.v, ct.cv) DESC, ct.centroid_id ASC) AS rn
         |    FROM corpus c CROSS JOIN cent${i - 1} ct)
         |  WHERE rn = 1),
         |m$i AS (
         |  SELECT centroid_id, i AS pos, avg(v[i + 1]) AS m
         |  FROM asg$i CROSS JOIN range($Q37Dim) t(i)
         |  GROUP BY 1, 2),
         |cent$i AS (
         |  SELECT ct.centroid_id, coalesce(nm.ncv, ct.cv) AS cv
         |  FROM cent${i - 1} ct LEFT JOIN
         |    (SELECT centroid_id, list(m ORDER BY pos) AS ncv FROM m$i GROUP BY 1) nm
         |    USING (centroid_id))""".stripMargin
    s"""corpus AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings $where),
       |cent0 AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
       |          FROM embeddings $where ORDER BY vec_id LIMIT $k),
       |${(1 to iters).map(round).mkString(",\n")}""".stripMargin
  }

  private def q38Sql: String =
    s"""WITH ${kmeansCtesSql()}
       |SELECT centroid_id, i AS pos, round(cv[i + 1], 6) AS v
       |FROM cent$Q38Iters CROSS JOIN range($Q37Dim) t(i)
       |ORDER BY centroid_id, pos""".stripMargin

  /** DuckDB replay of the IVF-pruned binary ANN (q207) — also the
    * oracle of the auto-gate registration q211, which routes to the
    * identical IVF plan. */
  private def q207HammingIvfSql: String =
    """WITH corpus AS (SELECT * FROM embeddings WHERE vec_id >= 5),
          |q AS (SELECT * FROM embeddings WHERE vec_id < 5),
          |cent AS (SELECT vec_id AS centroid_id, embedding AS cv FROM corpus ORDER BY vec_id LIMIT 16),
          |assigned AS (
          |  SELECT vec_id AS id, centroid_id FROM (
          |    SELECT c.vec_id, ct.centroid_id,
          |      row_number() OVER (PARTITION BY c.vec_id
          |        ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(ct.cv AS DOUBLE[])) DESC, ct.centroid_id ASC) AS rn
          |    FROM corpus c CROSS JOIN cent ct)
          |  WHERE rn = 1),
          |probes AS (
          |  SELECT vec_id AS query_id, centroid_id FROM (
          |    SELECT q.vec_id, ct.centroid_id,
          |      row_number() OVER (PARTITION BY q.vec_id
          |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(ct.cv AS DOUBLE[])) DESC, ct.centroid_id ASC) AS rn
          |    FROM q CROSS JOIN cent ct)
          |  WHERE rn <= 4),
          |v AS (SELECT vec_id,
          |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
          |  FROM embeddings WHERE embedding IS NOT NULL),
          |b AS (SELECT vec_id, vv,
          |    list_transform(range(0, CAST(ceil(len(vv) / 32.0) AS INT)), w ->
          |      CAST(coalesce(list_sum(list_transform(
          |        range(w * 32, CAST(least(w * 32 + 32, len(vv)) AS INT)), i ->
          |          CASE WHEN vv[i + 1] > 0 THEN (CAST(1 AS BIGINT) << (i - w * 32))
          |               ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT)) AS words
          |  FROM v),
          |hd AS (SELECT p.query_id, a.id AS neighbor_id,
          |    CAST(coalesce(list_sum(list_transform(
          |      range(0, CAST(len(bq.words) AS INT)), i ->
          |        CAST(bit_count(xor(bq.words[i + 1], bc.words[i + 1])) AS BIGINT))),
          |      0) AS BIGINT) AS hd
          |  FROM probes p
          |  JOIN assigned a ON p.centroid_id = a.centroid_id
          |  JOIN b bq ON bq.vec_id = p.query_id
          |  JOIN b bc ON bc.vec_id = a.id),
          |cand AS (SELECT *, row_number() OVER (PARTITION BY query_id
          |    ORDER BY hd ASC, neighbor_id ASC) AS crank FROM hd),
          |rr AS (SELECT c.query_id, c.neighbor_id, c.hd,
          |    list_cosine_similarity(vq.vv, vc.vv) AS sim
          |  FROM cand c
          |  JOIN v vq ON vq.vec_id = c.query_id
          |  JOIN v vc ON vc.vec_id = c.neighbor_id
          |  WHERE c.crank <= 40)
          |SELECT query_id, rank, neighbor_id, hd, round(sim, 6) AS sim FROM (
          |  SELECT *, row_number() OVER (PARTITION BY query_id
          |    ORDER BY sim DESC, neighbor_id ASC) AS rank FROM rr)
          |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Simplified-silhouette replay over the same kmeans chain: per
    * point the best and runner-up centroid cosine (same tie-break as
    * the engine's sorted-slice), a/b cosine distances, s in pure
    * double arithmetic, DECIMAL(38,12) sum for the per-cluster mean. */
  private def q201Sql: String =
    s"""WITH ${kmeansCtesSql()},
       |ssims AS (SELECT c.id, ct.centroid_id,
       |    list_cosine_similarity(c.v, ct.cv) AS sim
       |  FROM corpus c CROSS JOIN cent$Q38Iters ct),
       |ranked AS (SELECT id, centroid_id, sim,
       |    row_number() OVER (PARTITION BY id
       |      ORDER BY sim DESC, centroid_id ASC) AS rn FROM ssims),
       |pt AS (SELECT a.id, a.centroid_id,
       |    1 - a.sim AS da, 1 - b.sim AS db
       |  FROM ranked a JOIN ranked b ON a.id = b.id
       |  WHERE a.rn = 1 AND b.rn = 2),
       |sil AS (SELECT id, centroid_id,
       |    CASE WHEN greatest(da, db) = 0 THEN CAST(0 AS DOUBLE)
       |         ELSE (db - da) / greatest(da, db) END AS s FROM pt)
       |SELECT centroid_id, CAST(count(*) AS BIGINT) AS n,
       |  round(CAST(sum(CAST(s AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6)
       |    AS mean_sil
       |FROM sil GROUP BY 1 ORDER BY 1""".stripMargin

  private val annTopkSql: String =
    """SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS sim,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id ASC) AS rank
      |  FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
      |  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id >= 5) c)
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** DuckDB twin of Dedup.minhashCandidates' signature aggregation:
    * one hash31 per shingle, 16 universal-hash mins. */
  private def minhashMinsSql: String =
    Dedup.minhashParams(16).zipWithIndex.map { case ((a, b), i) =>
      s"min((v * $a + $b) % ${Dedup.MinhashP}) AS h$i"
    }.mkString(", ")

  private def minhashBandsSql: String =
    (0 until 4).map { b =>
      val hs = (0 until 4).map(r => s"CAST(h${b * 4 + r} AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($hs) AS bucket FROM sig"
    }.mkString(" UNION ALL ")

  private def stop(lang: String): Seq[String] = TextAnalysis.stopwords(lang)
  private def dlist(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")
}
