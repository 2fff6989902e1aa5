package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Exact frequent-item mining at corpus scale — "which tokens/values
  * appear in at least `support` fraction of the stream" without ever
  * shuffling the long tail.
  *
  * The naive plan (`groupBy(item).count().filter(cnt >= s·n)`) shuffles
  * one row per DISTINCT item: on a 100 TB corpus the token vocabulary
  * is billions of strings, nearly all of which are about to be thrown
  * away by the support filter. This operator never materializes the
  * tail:
  *
  *  - '''Phase 1''' runs a Misra–Gries summary (capacity ⌈1/s⌉) inside
  *    each partition — O(1/s) state, one pass, no shuffle — and ships
  *    only the surviving candidate keys plus the partition's item count
  *    to the driver: O(P/s) strings, independent of data size. The MG
  *    eviction bound (≤ n_p/(cap+1) undercount per partition) sums
  *    across partitions, so any item with global count > n/(cap+1) ≥
  *    s·n survives in at least one partition summary — the union is a
  *    guaranteed superset of the true frequent set (false positives
  *    possible, false negatives not).
  *  - '''Phase 2''' re-scans with a broadcast hash semi-join against
  *    the candidate set (map-side filter — the tail dies at the scan)
  *    and exact-counts only the candidates: the shuffle carries at most
  *    P·⌈1/s⌉ groups.
  *
  * The result is EXACT (same rows as the naive plan), so it is
  * DuckDB-oracle-replayable, unlike sketch-only heavy hitters.
  */
object Frequent {

  /** All distinct values of `item` (cast to string, nulls dropped)
    * whose exact count is ≥ ⌈support · n⌉, with that count, where n is
    * the total non-null item count. `support` must satisfy
    * 0 < support ≤ 1. Output: (item, cnt). */
  def frequentItems(df: DataFrame, item: Column, support: Double): DataFrame = {
    require(support > 0 && support <= 1,
      s"support must be in (0, 1], got $support")
    val spark = df.sparkSession
    val cap = math.ceil(1.0 / support).toInt
    val items = df.select(item.cast("string").as("item"))
      .filter(col("item").isNotNull)
      // pin: phase 1 and phase 2 must see the SAME stream, and the
      // upstream expression (often an explode of a tokenizer) is the
      // expensive part — never evaluate it twice
      .localCheckpoint()

    // phase 1: per-partition Misra-Gries + partition counts.
    // O(P·(1/s)) strings to the driver — scale-independent.
    val summaries: Array[(Long, Array[String])] = items.rdd
      .mapPartitions { it =>
        val counts = new java.util.HashMap[String, Long](cap * 2)
        var nP = 0L
        it.foreach { r =>
          val k = r.getString(0)
          nP += 1L
          val c = counts.get(k)
          if (c > 0L) counts.put(k, c + 1L)
          else if (counts.size < cap) counts.put(k, 1L)
          else {
            // decrement-all step: drop every counter by 1, evict zeros
            val eit = counts.entrySet().iterator()
            while (eit.hasNext) {
              val e = eit.next()
              if (e.getValue == 1L) eit.remove() else e.setValue(e.getValue - 1L)
            }
          }
        }
        import scala.jdk.CollectionConverters._
        Iterator((nP, counts.keySet().asScala.toArray))
      }.collect()

    val n = summaries.map(_._1).sum
    val minCount = math.ceil(support * n).toLong
    val candidates = summaries.flatMap(_._2).distinct
    val candDf = spark.createDataFrame(
      spark.sparkContext.parallelize(candidates.toIndexedSeq.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType, nullable = false))))

    // phase 2: broadcast semi-join kills the tail at the scan, then an
    // exact count over ≤ P·cap groups
    items.join(broadcast(candDf), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Frequent TOKENS of a text column: the corpus-scale "build the
    * stopword/vocab head" op. Tokenization is the shared kernel
    * ([[TextAnalysis.tokens]]), so the result replays in the oracle. */
  def frequentTokens(df: DataFrame, textCol: String, support: Double): DataFrame =
    frequentItems(
      df.select(explode(TextAnalysis.tokens(col(textCol).cast("string"))).as("tok")),
      col("tok"), support)

  /** PER-GROUP frequent items — "each domain/language/source's own
    * head", the grouped completion of [[frequentItems]] (the same
    * relationship per-group histogram quantiles bear to the global
    * sketch). Support is evaluated against EACH group's item count:
    * an item qualifies in group g iff count(g, item) ≥
    * ⌈support · n_g⌉, so a small domain's head is not drowned by a
    * large one.
    *
    * Same two-phase discipline as the global op, with the Misra–Gries
    * summary keyed per group inside each partition: phase-1 state is
    * O(groups-seen-per-partition · ⌈1/s⌉) and the driver collects
    * O(P · G · ⌈1/s⌉) candidate strings — G must be a metadata-sized
    * dimension (sources, languages, domains), NOT a high-cardinality
    * key; the item vocabulary per group stays unbounded and its tail
    * still never shuffles. The per-group eviction bound is the
    * per-group restriction of the global argument (each group's
    * stream within a partition runs its own MG), so the candidate
    * union is again a guaranteed superset — phase 2's broadcast
    * semi-join + exact count keeps the result EXACT and
    * oracle-replayable. Output: (grp, item, cnt). */
  def frequentItemsByGroup(df: DataFrame, group: Column, item: Column,
                           support: Double): DataFrame = {
    require(support > 0 && support <= 1,
      s"support must be in (0, 1], got $support")
    val spark = df.sparkSession
    val cap = math.ceil(1.0 / support).toInt
    val rows = df
      .select(group.cast("string").as("grp"), item.cast("string").as("item"))
      .filter(col("grp").isNotNull && col("item").isNotNull)
      .localCheckpoint() // both phases must see the SAME stream

    // phase 1: per-partition, per-group Misra-Gries + per-group counts
    val summaries: Array[(String, Long, Array[String])] = rows.rdd
      .mapPartitions { it =>
        val state = new java.util.HashMap[String, (java.util.HashMap[String, Long], Array[Long])]()
        it.foreach { r =>
          val g = r.getString(0); val k = r.getString(1)
          var s = state.get(g)
          if (s == null) {
            s = (new java.util.HashMap[String, Long](cap * 2), Array(0L))
            state.put(g, s)
          }
          val (counts, nP) = s
          nP(0) += 1L
          val c = counts.get(k)
          if (c > 0L) counts.put(k, c + 1L)
          else if (counts.size < cap) counts.put(k, 1L)
          else {
            val eit = counts.entrySet().iterator()
            while (eit.hasNext) {
              val e = eit.next()
              if (e.getValue == 1L) eit.remove() else e.setValue(e.getValue - 1L)
            }
          }
        }
        import scala.jdk.CollectionConverters._
        state.entrySet().iterator().asScala.map { e =>
          (e.getKey, e.getValue._2(0), e.getValue._1.keySet().asScala.toArray)
        }
      }.collect()

    val totals: Map[String, Long] =
      summaries.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sum }
    val candidates = summaries
      .flatMap { case (g, _, ks) => ks.map(k => (g, k)) }.distinct
    import org.apache.spark.sql.types.{StructType, StructField, StringType, LongType}
    val candDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        candidates.toIndexedSeq.map { case (g, k) =>
          org.apache.spark.sql.Row(g, k) }, 1),
      StructType(Seq(StructField("grp", StringType, nullable = false),
        StructField("item", StringType, nullable = false))))
    val minDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        totals.toIndexedSeq.map { case (g, n) =>
          org.apache.spark.sql.Row(g, math.ceil(support * n).toLong) }, 1),
      StructType(Seq(StructField("grp", StringType, nullable = false),
        StructField("__min", LongType, nullable = false))))

    // phase 2: the tail dies at the scan; exact counts only for
    // candidates, per-group support applied via the broadcast minima
    rows.join(broadcast(candDf), Seq("grp", "item"), "left_semi")
      .groupBy("grp", "item").agg(count(lit(1)).as("cnt"))
      .join(broadcast(minDf), Seq("grp"))
      .filter(col("cnt") >= col("__min"))
      .select("grp", "item", "cnt")
  }

  /** Item co-occurrence matrix — for each unordered item pair, how
    * many keys exhibit BOTH (market-basket / event-affinity lite).
    * Raw event volume collapses to distinct (key, item) presence rows
    * at the scan; the pair space is generated per key by a self-join
    * keyed ONLY on the key, so its fan-out is |items-per-key|² —
    * bounded by the item vocabulary, not the event count — and the
    * result frame is at most |items|²/2 rows. Keys with one item
    * produce nothing; null keys/items are excluded.
    *
    * Heavy-key safety: when any key's item set exceeds
    * `heavyKeyItemBound`, pair generation switches to the
    * block-split route ([[pairCountsBlocked]]) — identical results,
    * but no task ever materializes more than `blockSize²` pairs.
    * `maxItemsPerKey`, when set, FIRST caps each key's item set to its
    * M globally-most-frequent items (documented semantics change, the
    * [[graft.text.Vocab]]-cap pattern) — for corpora whose per-key
    * vocabularies are unboundedly fat even for legitimate keys. */
  def coOccurrence(df: DataFrame, keyCol: String, itemCol: String,
                   heavyKeyItemBound: Option[Long] = Some(4096L),
                   blockSize: Int = 1024,
                   maxItemsPerKey: Option[Int] = None): DataFrame = {
    val a = presence(df, keyCol, itemCol, maxItemsPerKey)
    pairCounts(a, heavyKeyItemBound, blockSize)
  }

  /** Audience overlap matrix: for each unordered item pair, the
    * JACCARD of their key audiences — |keys(a)∩keys(b)| /
    * |keys(a)∪keys(b)| — plus the raw counts ("what fraction of either
    * event's users do both"). Same bounded shapes as [[coOccurrence]]
    * (whose intersection counts it reuses, including the heavy-key
    * block route) with two broadcast joins against the |items|-row
    * audience sizes. */
  def audienceOverlap(df: DataFrame, keyCol: String, itemCol: String,
                      heavyKeyItemBound: Option[Long] = Some(4096L),
                      blockSize: Int = 1024,
                      maxItemsPerKey: Option[Int] = None): DataFrame = {
    val a = presence(df, keyCol, itemCol, maxItemsPerKey)
    val sizes = a.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    pairCounts(a, heavyKeyItemBound, blockSize)
      .join(broadcast(sizes.select(col("__i").as("item_a"), col("__n").as("n_a"))), "item_a")
      .join(broadcast(sizes.select(col("__i").as("item_b"), col("__n").as("n_b"))), "item_b")
      .select(col("item_a"), col("item_b"), col("n_keys"), col("n_a"), col("n_b"),
        round(col("n_keys").cast("double") /
          (col("n_a") + col("n_b") - col("n_keys")), 6).as("jaccard"))
  }

  /** Distinct (key, item) presence rows — raw event volume collapses at
    * the scan; localCheckpointed because every caller reads it ≥ 2×.
    * `maxItemsPerKey` keeps, per key, only the M items with the highest
    * GLOBAL presence count (ties toward the smaller item value, so the
    * cap is deterministic and oracle-replayable). */
  private def presence(df: DataFrame, keyCol: String, itemCol: String,
                       maxItemsPerKey: Option[Int] = None): DataFrame = {
    val a = df.filter(col(keyCol).isNotNull && col(itemCol).isNotNull)
      .select(col(keyCol).as("__k"), col(itemCol).as("__i"))
      .distinct()
    val capped = maxItemsPerKey match {
      case None => a
      case Some(m) =>
        require(m > 0, s"maxItemsPerKey must be > 0, got $m")
        // global item frequencies are |items|-bounded; ranking within a
        // key sorts |items-per-key| ROWS per task (linear, safe) — it is
        // the PAIR space, not the row count, that the block route bounds
        val freq = a.groupBy("__i").agg(count(lit(1)).as("__f"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("__k").orderBy(col("__f").desc, col("__i").asc)
        a.join(freq, "__i")
          .withColumn("__r", row_number().over(w))
          .filter(col("__r") <= m)
          .select(col("__k"), col("__i"))
    }
    capped.localCheckpoint()
  }

  /** Per-key pair join over presence rows: fan-out bounded by the
    * per-key item vocabulary, result ≤ |items|²/2 rows.
    *
    * The plain self-join puts ALL of one key's pairs in the task that
    * owns that key's join partition — Σ|items(k)|²/2 intermediate rows,
    * a straggler/OOM when one bot/service key touches 10⁵ items. When
    * `heavyKeyItemBound` is set and any key exceeds it (one cheap keyed
    * count over the checkpointed presence rows decides), the
    * block-split route runs instead; results are identical either way,
    * so the oracle replays both. */
  private def pairCounts(a: DataFrame,
                         heavyKeyItemBound: Option[Long] = None,
                         blockSize: Int = 1024): DataFrame = {
    val useBlocks = heavyKeyItemBound.exists { bound =>
      val m = a.groupBy("__k").count().agg(max("count")).head()
      !m.isNullAt(0) && m.getLong(0) > bound
    }
    if (useBlocks) pairCountsBlocked(a, blockSize)
    else
      a.as("l").join(a.as("r"),
          col("l.__k") === col("r.__k") && col("l.__i") < col("r.__i"))
        .groupBy(col("l.__i").as("item_a"), col("r.__i").as("item_b"))
        .agg(count(lit(1)).as("n_keys"))
  }

  /** Heavy-key pair generation: within each key, items are ranked (one
    * |items-per-key|-row sort task per key — LINEAR in the key's
    * vocabulary, unlike the quadratic pair space) and cut into blocks
    * of `blockSize`; each side replicates to the (blockA, blockB) cells
    * it participates in and the join key becomes (key, blockA, blockB),
    * so a key with m items spreads its m²/2 pairs over ~(m/B)²/2
    * independently-partitioned cells of ≤ B² pairs each. Blocks follow
    * item order, so cross-block cells satisfy itemA < itemB by
    * construction; the strict filter only bites inside diagonal cells.
    * Replicated row volume is m²/B per key — the price of never
    * funneling a hot key through one task. */
  private def pairCountsBlocked(a: DataFrame, blockSize: Int): DataFrame =
    blockedPairs(a, blockSize)
      .groupBy(col("__ia").as("item_a"), col("__ib").as("item_b"))
      .agg(count(lit(1)).as("n_keys"))

  /** The pre-aggregation pair stream of the block route — exposed
    * within graft so the skew spec can measure per-partition pair
    * materialization directly. */
  private[graft] def blockedPairs(a: DataFrame, blockSize: Int): DataFrame = {
    require(blockSize > 0, s"blockSize must be > 0, got $blockSize")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__k").orderBy("__i")
    val blocked = a
      .withColumn("__b", ((row_number().over(w) - 1) / blockSize).cast("int"))
      .withColumn("__nb",
        max(col("__b")).over(org.apache.spark.sql.expressions.Window.partitionBy("__k")))
      .localCheckpoint() // both sides re-read this; never rank twice
    // Hash-partition BOTH sides by the cell key with an explicit count:
    // the spreading must survive the planner's join choice (a broadcast
    // join materializes each cell's pairs in whatever task streams it)
    // and AQE's small-input coalescing — an implicit repartition could
    // be folded back to one task on a skewed test corpus.
    val nParts = blocked.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val lhs = blocked
      .withColumn("__bb", explode(sequence(col("__b"), col("__nb"))))
      .select(col("__k"), col("__i").as("__ia"), col("__b").as("__ba"), col("__bb"))
      .repartition(nParts, col("__k"), col("__ba"), col("__bb"))
    val rhs = blocked
      .withColumn("__ba", explode(sequence(lit(0), col("__b"))))
      .select(col("__k"), col("__i").as("__ib"), col("__ba"), col("__b").as("__bb"))
      .repartition(nParts, col("__k"), col("__ba"), col("__bb"))
    lhs.join(rhs, Seq("__k", "__ba", "__bb"))
      .filter(col("__ia") < col("__ib"))
  }

  /** Presence rows for spec/probe use (same shape pairCounts consumes). */
  private[graft] def presenceRows(df: DataFrame, keyCol: String, itemCol: String,
                                  maxItemsPerKey: Option[Int] = None): DataFrame =
    presence(df, keyCol, itemCol, maxItemsPerKey)
}
