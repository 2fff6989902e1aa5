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
    * [[Similarity.ivfTopK]]. */
  def search(spark: SparkSession, path: String, queries: DataFrame,
             qId: String, qVec: String, k: Int, nprobe: Int): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val codes = spark.read.parquet(s"$path/codes")
    val qProbes = {
      val j = Similarity.withNorm(queries, qId, qVec, "query_id", "__qv", "__qn")
        .crossJoin(broadcast(
          Similarity.withNorm(centroids, "centroid_id", "cv",
            "centroid_id", "__cv", "__cn")))
        .withColumn("sim",
          Similarity.pairSim(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("sim"), col("centroid_id"))
      j.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= nprobe)
        .select(col("query_id"), col("__qv"), col("__qn"), col("centroid_id"))
    }
    val scored = qProbes.hint("broadcast")
      .join(codes, "centroid_id")
      .withColumn("sim",
        Similarity.pairSim(col("__qv"), col("vec"), col("__qn"), col("vecnorm")))
      .select(col("query_id"), col("id").as("neighbor_id"), col("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("sim"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

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
               nProbe: Int, topK: Int): DataFrame = {
    val cells = spark.read.parquet(s"$path/cells")
    val codebook = spark.read.parquet(s"$path/codebook")
    val codes = spark.read.parquet(s"$path/codes")
    val dtab = Quantize.adcTables(queries, qId, qVec, codebook, m, dim / m)
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__d2").asc, col("cell_id").asc)
    val probes = queries.filter(col(qVec).isNotNull)
      .select(col(qId).as("query_id"), transform(col(qVec), _.cast("double")).as("__qv"))
      .crossJoin(broadcast(cells))
      .withColumn("__d2", Quantize.l2sq(col("__qv"), col("ccv")))
      .withColumn("__rn", row_number().over(wp)).filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("cell_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adist").asc, col("neighbor_id").asc)
    codes
      .join(broadcast(probes), col("cell") === col("cell_id"))
      .select(col("query_id"), col("id"), posexplode(col("codes")).as(Seq("subspace", "code")))
      .join(broadcast(dtab), Seq("query_id", "subspace", "code"))
      .groupBy(col("query_id"), col("id").as("neighbor_id"))
      .agg(sum(col("d2")).as("adist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "neighbor_id", "adist")
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
