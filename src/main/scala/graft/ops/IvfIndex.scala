package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable, appendable IVF index — the capability gap between
  * "run ANN search as a query" ([[Similarity.ivfTopK]], which re-trains
  * centroids and re-assigns the corpus on every call) and what a
  * production corpus actually needs: build the index ONCE, admit each
  * daily shard by ASSIGNMENT ONLY (no retraining — the append cost is
  * one broadcast-centroid pass over the shard, independent of the
  * historical corpus size), search against the persisted tables, and
  * retrain only when a drift trigger fires.
  *
  * On-disk layout under `path` (plain parquet, readable by any engine):
  *  - `centroids/` — (centroid_id, cv: double[]) — the trained coarse
  *    quantizer, frozen at build time;
  *  - `codes/` — (id, vec: double[], vecnorm, gen, centroid_id),
  *    PARTITIONED BY centroid_id: a search that probes `nprobe` cells
  *    reads exactly those partitions' files (partition pruning — the
  *    scan cost is nprobe/K of the corpus, on disk as in memory), and
  *    an append writes only new files (parquet append, no rewrite).
  *    `gen` stamps the build (0) vs each append (1, 2, …) — the drift
  *    report reads it to compare the build-time cell distribution
  *    against everything admitted since.
  *
  * Search parity contract: [[search]] over build(A) + append(B) is
  * bit-identical to [[Similarity.ivfTopK]] over A∪B whenever A
  * contains the union's `nCells` lowest ids (the deterministic seed
  * rule — Lloyd-refined builds carry the same guarantee only if the
  * refinement is also run on A alone), because the frozen centroids
  * then equal what a full rebuild would train. The q230 oracle row
  * value-checks exactly this equivalence; when A does NOT dominate
  * the seed set, append-then-search is the documented approximation
  * (assign-only admission), and [[driftReport]] is the instrument
  * that says when the approximation has decayed enough to retrain.
  *
  * Retrain trigger: PSI between the build-generation cell population
  * and the appended population (categorical form over cells, Laplace
  * +0.5 per cell — [[Drift.psi]]'s smoothing over index cells instead
  * of value bins). PSI > ~0.2 means the admitted data lands in
  * systematically different cells than the quantizer was trained for
  * — cell sizes skew, probe recall decays, rebuild. */
object IvfIndex {

  /** Train the coarse quantizer on `corpus` and persist the index.
    * Overwrites any index at `path`. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            path: String, nCells: Int, kmeansIterations: Int = 0): Unit = {
    val centroids = Similarity.centroidsFor(
      corpus.filter(col(vecCol).isNotNull), idCol, vecCol,
      nCells, kmeansIterations)
      .select(col("centroid_id"), transform(col("cv"), _.cast("double")).as("cv"))
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    assignGen(corpus, idCol, vecCol, centroids, gen = 0)
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$path/codes")
  }

  /** Admit a shard: assign against the PERSISTED centroids (one
    * broadcast pass over the shard — cost independent of the
    * historical corpus) and append its code rows as the next
    * generation. No existing file is touched. */
  def append(spark: SparkSession, path: String, shard: DataFrame,
             idCol: String, vecCol: String): Unit = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val nextGen = spark.read.parquet(s"$path/codes")
      .agg(coalesce(max("gen"), lit(0)).cast("int")).collect()(0).getInt(0) + 1
    assignGen(shard, idCol, vecCol, centroids, nextGen)
      .write.mode("append").partitionBy("centroid_id")
      .parquet(s"$path/codes")
  }

  /** (id, vec, vecnorm, gen, centroid_id) for one generation —
    * [[Similarity.assignToCentroid]]'s deterministic nearest-centroid
    * rule (ties → lowest cell id), the same rule ivfTopK applies. */
  private def assignGen(df: DataFrame, idCol: String, vecCol: String,
                        centroids: DataFrame, gen: Int): DataFrame =
    Similarity.assignToCentroid(df.filter(col(vecCol).isNotNull),
        idCol, vecCol, centroids, "centroid_id", "cv")
      .select(col("id"), col("vec"), col("vecnorm"),
        lit(gen).as("gen"), col("centroid_id"))

  /** Top-k search against the persisted index: queries probe their
    * `nprobe` nearest centroids, and the codes scan is restricted to
    * those cells — with the partitionBy layout that restriction is
    * PARTITION PRUNING on disk, not a post-scan filter. Same probe
    * rule, scoring expression, and tie-breaks as
    * [[Similarity.ivfTopK]], and since r15 the same KERNELS: probe
    * selection is a map-side group-top (bounded struct slice per
    * query — never a |Q|·K rank-window sort carrying query vectors),
    * and the final top-k rides the mergeable bounded-heap aggregate
    * ([[graft.expressions.BoundedTopK]] via
    * [[Similarity.topKFromScored]]) — k primitives of state per query
    * at all times, no Window anywhere in the plan.
    *
    * Probe-side broadcast is GATED on the query-batch size: the probe
    * frame carries nprobe copies of every query vector, so a large
    * batch (≳100k × dim 100 ≈ GBs) would blow the broadcast ceiling —
    * above `maxBroadcastQueries` the probes join the codes by shuffle
    * instead ([[Quantize.int8TopKAuto]]'s LIMIT-probe discipline: the
    * routing count scans at most maxBroadcastQueries + 1 query rows;
    * `querySizeHint` skips the probe). Both routes are value-identical
    * — the join key and every downstream expression are the same.
    *
    * Rows superseded or deleted by [[applyChanges]] are dropped via
    * the tombstone table AFTER cell pruning (a broadcast anti-filter
    * over the bounded candidate set — see [[applyChanges]] for the
    * tombstone-size contract; [[compact]] folds them away). */
  def search(spark: SparkSession, path: String, queries: DataFrame,
             qId: String, qVec: String, k: Int, nprobe: Int,
             maxBroadcastQueries: Long = 100000L,
             querySizeHint: Option[Long] = None): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val codes = spark.read.parquet(s"$path/codes")
    // map-side group-top probe pick (ivfTopK's form): struct sort by
    // (-sim, centroid_id) == ORDER BY sim DESC, centroid_id ASC
    val qProbes = Similarity.withNorm(queries, qId, qVec, "query_id", "__qv", "__qn")
      .crossJoin(broadcast(
        Similarity.withNorm(centroids, "centroid_id", "cv",
          "centroid_id", "__cv", "__cn")))
      .withColumn("sim",
        Similarity.pairSim(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .groupBy("query_id")
      .agg(first(col("__qv")).as("__qv"), first(col("__qn")).as("__qn"),
        slice(array_sort(collect_list(struct(
          (-col("sim")).as("negSim"), col("centroid_id")))), 1, nprobe).as("__top"))
      .select(col("query_id"), col("__qv"), col("__qn"),
        explode(col("__top")).as("__t"))
      .select(col("query_id"), col("__qv"), col("__qn"),
        col("__t.centroid_id").as("centroid_id"))
    val probesJoined =
      if (smallBatch(queries, qVec, maxBroadcastQueries, querySizeHint))
        qProbes.hint("broadcast").join(codes, "centroid_id")
      else qProbes.join(codes, "centroid_id")
    val scored = dropTombstoned(spark, path, probesJoined)
      .withColumn("sim",
        Similarity.pairSim(col("__qv"), col("vec"), col("__qn"), col("vecnorm")))
      .select(col("query_id"), col("id").as("neighbor_id"), col("sim"))
    Similarity.topKFromScored(scored, k)
  }

  /** LIMIT-bounded query-batch routing probe (the
    * [[Quantize.int8TopKAuto]] discipline): scans at most
    * `maxBroadcast + 1` query rows to decide, never the full batch —
    * unless the threshold exceeds Int range, where a LIMIT can't
    * decide and the full count is the only safe answer. */
  private def smallBatch(queries: DataFrame, qVec: String,
                         maxBroadcast: Long, hint: Option[Long]): Boolean =
    hint.getOrElse {
      if (maxBroadcast < Int.MaxValue - 1L)
        queries.filter(col(qVec).isNotNull)
          .limit(maxBroadcast.toInt + 1).count()
      else queries.filter(col(qVec).isNotNull).count()
    } <= maxBroadcast

  // ------------------------------------------------------------------
  // PQ-coded variant: the index stores (centroid, code) tables ONLY —
  // m small ints per vector instead of dim doubles (64-dim float ≈
  // 256 B → 4 B at m=4). This is the storage shape a 100 TB corpus
  // actually persists; the IVF-flat tables above are the exact-scoring
  // sibling for corpora whose vectors fit the budget.
  // ------------------------------------------------------------------

  /** Train (coarse cells + PQ codebook) on `corpus` and persist:
    * `cells/` (cell_id, ccv), `codebook/` (subspace, centroid_id, cv),
    * `codes/` (id, codes: int[m] subspace-ordered, gen) partitioned by
    * `cell`. With `iterations = 0` the codebook is the deterministic
    * lowest-id seed (training-free): append-then-search is then
    * BIT-IDENTICAL to rebuild-then-search whenever the build shard
    * holds the union's seed ids — the q232 oracle contract. Lloyd
    * refinement (> 0) trains a better codebook but makes the frozen
    * index an approximation of a rebuild by construction (refinement
    * means depend on the training corpus); [[driftReport]] on the
    * cell populations is the signal for when to pay the rebuild. */
  def buildPq(corpus: DataFrame, idCol: String, vecCol: String,
              path: String, dim: Int, m: Int, k: Int, iterations: Int,
              nCells: Int): Unit = {
    val cv = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), transform(col(vecCol), _.cast("double")).as("__v"))
    val cells = cv.orderBy(col("id")).limit(nCells)
      .select(col("id").as("cell_id"), col("__v").as("ccv"))
    cells.coalesce(1).write.mode("overwrite").parquet(s"$path/cells")
    val codebook = Quantize.pqTrain(corpus, idCol, vecCol, dim, m, k, iterations)
    codebook.coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    encodeGen(corpus, idCol, vecCol, cells, codebook, dim, m, gen = 0)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
  }

  /** Admit a shard against the FROZEN cells + codebook (assignment and
    * encoding only — no retraining; cost ∝ shard). */
  def appendPq(spark: SparkSession, path: String, shard: DataFrame,
               idCol: String, vecCol: String, dim: Int, m: Int): Unit = {
    val cells = spark.read.parquet(s"$path/cells")
    val codebook = spark.read.parquet(s"$path/codebook")
    val nextGen = spark.read.parquet(s"$path/codes")
      .agg(coalesce(max("gen"), lit(0)).cast("int")).collect()(0).getInt(0) + 1
    encodeGen(shard, idCol, vecCol, cells, codebook, dim, m, nextGen)
      .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
  }

  /** (id, codes int[m], gen, cell) for one generation: PQ-encode with
    * the given codebook (nearest sub-centroid per subspace, ties →
    * lowest code — [[Quantize.pqEncode]]'s rule) and assign the coarse
    * cell by L2 argmin (ties → lowest cell — ivfPqTopKAdc's rule). */
  private def encodeGen(df: DataFrame, idCol: String, vecCol: String,
                        cells: DataFrame, codebook: DataFrame,
                        dim: Int, m: Int, gen: Int): DataFrame = {
    val cv = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), transform(col(vecCol), _.cast("double")).as("__v"))
    val assigned = cv.crossJoin(broadcast(cells))
      .withColumn("__d2", Quantize.l2sq(col("__v"), col("ccv")))
      .groupBy("id")
      .agg(min_by(col("cell_id"), struct(col("__d2"), col("cell_id"))).as("cell"))
    val codeArr = Quantize.pqEncode(df, idCol, vecCol, codebook, dim, m)
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("subspace"), col("code")))),
        s => s.getField("code")).as("codes"))
    codeArr.join(assigned, "id")
      .select(col("id"), col("codes"), lit(gen).as("gen"), col("cell"))
  }

  /** ADC top-k against the persisted PQ index: queries probe their
    * nProbe nearest cells (L2 to the frozen coarse centroids), the
    * codes scan is restricted to those cells (partition pruning on
    * the `cell` layout), and scoring is the standard asymmetric
    * distance sum over the per-query (subspace, code) → d2 table —
    * no raw corpus vector is ever read. Same probe/score/tie rules
    * as [[Quantize.ivfPqTopKAdc]]. */
  def searchPq(spark: SparkSession, path: String, queries: DataFrame,
               qId: String, qVec: String, dim: Int, m: Int,
               nProbe: Int, topK: Int,
               maxBroadcastQueries: Long = 100000L,
               querySizeHint: Option[Long] = None): DataFrame = {
    val cells = spark.read.parquet(s"$path/cells")
    val codebook = spark.read.parquet(s"$path/codebook")
    val codes = spark.read.parquet(s"$path/codes")
    val dtab = Quantize.adcTables(queries, qId, qVec, codebook, m, dim / m)
    // map-side group-top probe pick: struct sort by (d2, cell_id) ==
    // ORDER BY d2 ASC, cell_id ASC — no per-query rank window
    val probes = queries.filter(col(qVec).isNotNull)
      .select(col(qId).as("query_id"), transform(col(qVec), _.cast("double")).as("__qv"))
      .crossJoin(broadcast(cells))
      .withColumn("__d2", Quantize.l2sq(col("__qv"), col("ccv")))
      .groupBy("query_id")
      .agg(slice(array_sort(collect_list(struct(
        col("__d2"), col("cell_id")))), 1, nProbe).as("__top"))
      .select(col("query_id"), explode(col("__top")).as("__t"))
      .select(col("query_id"), col("__t.cell_id").as("cell_id"))
    // the probe/dtab frames hold only scalars (no query vectors), but
    // they still scale with |Q| — gate their broadcast on batch size
    // like [[search]]; the shuffled route is value-identical
    val small = smallBatch(queries, qVec, maxBroadcastQueries, querySizeHint)
    val cand = dropTombstoned(spark, path,
      if (small) codes.join(broadcast(probes), col("cell") === col("cell_id"))
      else codes.join(probes, col("cell") === col("cell_id")))
    val expl = cand
      .select(col("query_id"), col("id"), posexplode(col("codes")).as(Seq("subspace", "code")))
    val scored = (if (small) expl.join(broadcast(dtab), Seq("query_id", "subspace", "code"))
                  else expl.join(dtab, Seq("query_id", "subspace", "code")))
      .groupBy(col("query_id"), col("id").as("neighbor_id"))
      .agg(sum(col("d2")).as("adist"))
      // heap kernel orders (sim DESC, id ASC); adist ASC == -adist
      // DESC, and double negation round-trips bit-exactly
      .select(col("query_id"), col("neighbor_id"), (-col("adist")).as("sim"))
    Similarity.topKFromScored(scored, topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (-col("sim")).as("adist"))
  }

  // ------------------------------------------------------------------
  // CDC: deletes + upserts over the persisted code tables. A parquet
  // layout can't rewrite rows in place, so changes land as TOMBSTONES
  // (`tombstones/` — (id, tomb_gen)): batch g tombstones every changed
  // key at gen g (killing that id's rows with gen < g) and appends the
  // upserted vectors at gen g — so a delete drops the id, an upsert
  // atomically supersedes every older generation of it, and a
  // re-insert after a delete works because the new row's gen is never
  // below its tombstone's. Search applies the tombstone filter AFTER
  // cell pruning as a broadcast anti-filter — O(|tombstones|) extra
  // state, the steady-state CDC regime ([[Snapshot.applyChangeLog]]'s
  // contract); when deletes accumulate, [[compact]] folds them into
  // the code files and clears the table.
  // ------------------------------------------------------------------

  /** Apply one CDC batch to the IVF-flat index at `path`. `changes`
    * carries (idCol, vecCol, seqCol, opCol): rows compact to their
    * latest per key by `seqCol` (max_by — no window), `opCol` ==
    * `deleteOp` deletes the key, anything else upserts it (assignment
    * against the FROZEN centroids — no retraining, cost ∝ batch).
    * Note [[driftReport]] counts tombstoned rows until [[compact]]
    * runs — drift is about what the quantizer ADMITTED, and a
    * delete-heavy workload should compact before reading drift. */
  def applyChanges(spark: SparkSession, path: String, changes: DataFrame,
                   idCol: String, vecCol: String, seqCol: String,
                   opCol: String, deleteOp: String = "delete"): Unit = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val g = nextGenAfter(spark, path)
    val latest = latestPerKey(changes, idCol, vecCol, seqCol, opCol)
    latest.select(col("id"), lit(g).as("tomb_gen"))
      .write.mode("append").parquet(s"$path/tombstones")
    assignGen(latest.filter(col("__op") =!= lit(deleteOp)), "id", "__vec",
        centroids, g)
      .write.mode("append").partitionBy("centroid_id")
      .parquet(s"$path/codes")
  }

  /** [[applyChanges]] for the PQ index: upserts encode against the
    * FROZEN cells + codebook (cost ∝ batch). */
  def applyChangesPq(spark: SparkSession, path: String, changes: DataFrame,
                     idCol: String, vecCol: String, seqCol: String,
                     opCol: String, dim: Int, m: Int,
                     deleteOp: String = "delete"): Unit = {
    val cells = spark.read.parquet(s"$path/cells")
    val codebook = spark.read.parquet(s"$path/codebook")
    val g = nextGenAfter(spark, path)
    val latest = latestPerKey(changes, idCol, vecCol, seqCol, opCol)
    latest.select(col("id"), lit(g).as("tomb_gen"))
      .write.mode("append").parquet(s"$path/tombstones")
    encodeGen(latest.filter(col("__op") =!= lit(deleteOp)), "id", "__vec",
        cells, codebook, dim, m, g)
      .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
  }

  /** Latest change row per key ([[Snapshot.applyChangeLog]]'s max_by
    * compaction): (id, __vec, __op). Null keys are dropped. */
  private def latestPerKey(changes: DataFrame, idCol: String, vecCol: String,
                           seqCol: String, opCol: String): DataFrame =
    changes.filter(col(idCol).isNotNull)
      .groupBy(col(idCol).as("id"))
      .agg(max_by(struct(col(vecCol).as("v"), col(opCol).as("o")),
        col(seqCol)).as("__w"))
      .select(col("id"), col("__w.v").as("__vec"), col("__w.o").as("__op"))

  /** Next generation number: one past the max across code rows AND
    * tombstones (a delete-only batch advances the clock too — two
    * batches must never share a gen, or the second's upserts would be
    * killed by the first's tombstones). */
  private def nextGenAfter(spark: SparkSession, path: String): Int = {
    val codeMax = spark.read.parquet(s"$path/codes")
      .agg(coalesce(max("gen"), lit(0)).cast("int")).collect()(0).getInt(0)
    val tombMax = tombstonesOpt(spark, path) match {
      case Some(t) =>
        t.agg(coalesce(max("tomb_gen"), lit(0)).cast("int")).collect()(0).getInt(0)
      case None => 0
    }
    math.max(codeMax, tombMax) + 1
  }

  private def tombstonesOpt(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Drop candidate rows superseded/deleted by tombstones: a row dies
    * iff some tombstone for its id has tomb_gen > gen. Applied after
    * cell pruning, so the join input is the bounded candidate set; the
    * tombstone side collapses to one row per deleted id and
    * broadcasts. No tombstone table ⇒ pass-through (zero cost for the
    * append-only lifecycle). */
  private def dropTombstoned(spark: SparkSession, path: String,
                             cand: DataFrame): DataFrame =
    tombstonesOpt(spark, path) match {
      case None => cand
      case Some(t) =>
        val latest = t.groupBy("id").agg(max("tomb_gen").as("__tg"))
        cand.join(broadcast(latest), Seq("id"), "left")
          .filter(col("__tg").isNull || col("gen") >= col("__tg"))
          .drop("__tg")
    }

  /** Retrain the IVF-flat index IN PLACE from its own live rows — the
    * lifecycle step [[driftReport]]'s `retrain` flag asks for: the
    * flat code rows carry the raw vectors, so build → append → drift
    * → rebuild → search needs no access to the original corpus. The
    * new index trains on the live set (tombstones applied), writes to
    * a sibling dir while the old tables are still being read, then
    * swaps and clears tombstones — generation resets to 0 (the
    * rebuild IS the new base population the next drift reads
    * against). The PQ index has no in-place twin by construction (its
    * code rows hold m ints, not vectors — re-run [[buildPq]] on the
    * corpus). */
  def rebuild(spark: SparkSession, path: String, nCells: Int,
              kmeansIterations: Int = 0): Unit = {
    val live = dropTombstoned(spark, path, spark.read.parquet(s"$path/codes"))
      .select(col("id"), col("vec"))
    val tmp = s"$path/__rebuilding"
    // build reads $path/codes (via `live`) WHILE writing to the
    // sibling — no self-overwrite; the swap is rename-only
    build(live, "id", "vec", tmp, nCells, kmeansIterations)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (d <- Seq("centroids", "codes")) {
      val dst = new org.apache.hadoop.fs.Path(s"$path/$d")
      fs.delete(dst, true)
      if (!fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/$d"), dst))
        throw new java.io.IOException(s"rebuild swap failed for $path/$d")
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/tombstones"), true): Unit
  }

  /** Fold tombstones into the code files: rewrite `codes/` keeping
    * only live rows (same filter [[search]] applies), preserving the
    * cell partitioning and the gen stamps (drift history survives),
    * then drop the tombstone table. The swap is write-to-sibling +
    * rename ([[Sink.compactParquet]]'s discipline). `cellCol` =
    * "centroid_id" for the flat index, "cell" for the PQ index. */
  def compact(spark: SparkSession, path: String,
              cellCol: String = "centroid_id"): Unit =
    tombstonesOpt(spark, path) match {
      case None => ()
      case Some(t) =>
        val latest = t.groupBy("id").agg(max("tomb_gen").as("__tg"))
        val live = spark.read.parquet(s"$path/codes")
          .join(broadcast(latest), Seq("id"), "left")
          .filter(col("__tg").isNull || col("gen") >= col("__tg"))
          .drop("__tg")
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val codesPath = new org.apache.hadoop.fs.Path(s"$path/codes")
        val tmp = new org.apache.hadoop.fs.Path(s"$path/codes__compacting")
        live.write.mode("overwrite").partitionBy(cellCol).parquet(tmp.toString)
        fs.delete(codesPath, true)
        if (!fs.rename(tmp, codesPath))
          throw new java.io.IOException(s"compaction swap failed for $path/codes")
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/tombstones"), true): Unit
    }

  /** Per-cell drift of the admitted generations against the build:
    * (centroid_id, n_base, n_cur, psi_contrib, psi_total, retrain).
    * PSI over the cell CATEGORIES (Laplace +0.5/cell over the K
    * trained cells, so empty sides stay finite); retrain = total
    * above `threshold` (0.2 — between the classic 0.1 "moderate" and
    * 0.25 "shifted" rules, the conservative side for an index whose
    * probe recall decays monotonically with cell skew). */
  def driftReport(spark: SparkSession, path: String,
                  threshold: Double = 0.2,
                  cellCol: String = "centroid_id",
                  cellsDir: String = "centroids"): DataFrame = {
    val k = spark.read.parquet(s"$path/$cellsDir").count()
    val counted = spark.read.parquet(s"$path/codes")
      .withColumnRenamed(cellCol, "centroid_id")
      .groupBy("centroid_id")
      .agg(sum(when(col("gen") === 0, 1L).otherwise(0L)).as("n_base"),
        sum(when(col("gen") > 0, 1L).otherwise(0L)).as("n_cur"))
    val tot = counted.agg(
      coalesce(sum("n_base"), lit(0L)), coalesce(sum("n_cur"), lit(0L))).collect()(0)
    val (na, nc) = (tot.getLong(0), tot.getLong(1))
    val p = (col("n_base").cast("double") + 0.5) / (lit(na.toDouble) + lit(0.5 * k))
    val q = (col("n_cur").cast("double") + 0.5) / (lit(nc.toDouble) + lit(0.5 * k))
    val perCell = counted.select(col("centroid_id"), col("n_base"), col("n_cur"),
      ((p - q) * log(p / q)).as("__contrib"))
    perCell
      .crossJoin(broadcast(perCell.agg(sum("__contrib").as("__total"))))
      .select(col("centroid_id"), col("n_base"), col("n_cur"),
        round(col("__contrib"), 6).as("psi_contrib"),
        round(col("__total"), 6).as("psi_total"),
        (col("__total") > threshold).as("retrain"))
  }
}
