package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, partition-independent sampling.
  *
  * The reference samples with a seeded in-memory RNG
  * (`Latanova_v1.py:632-633`), which has no distributed equivalent:
  * Spark's `df.sample(seed)` depends on partitioning, so the "same"
  * sample changes when the cluster layout does. The scale-correct
  * replacement is CONTENT-keyed sampling — a row is in or out based on
  * a hash of its id, independent of where it is executed. That makes
  * samples reproducible across runs, cluster sizes, AND engines (the
  * DuckDB oracle replays the same md5 arithmetic), and it is a pure
  * narrow filter: no shuffle, pushes down past column pruning, costs
  * one scan at any data size.
  */
object Sampling {

  /** Pseudo-uniform bucket in [0, buckets) from the first 7 md5 hex
    * digits of the id's string rendering (28 bits — unbiased enough for
    * sampling). Delegates to the engine's one md5-prefix hash
    * ([[TextAnalysis.tokenHash31]]) so the value stays in lockstep with
    * the oracle's hash31 fragment. */
  def hashBucket(id: Column, buckets: Int): Column =
    TextAnalysis.tokenHash31(id.cast("string")) % buckets

  /** Keep ~`fraction` of rows, chosen by id hash. Deterministic and
    * stable under repartitioning; resolution 1/10000. Null-id rows are
    * dropped (a content-keyed sample is undefined without a key —
    * uniform policy across this module). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction outside [0,1]")
    df.filter(col(idCol).isNotNull &&
      hashBucket(col(idCol), 10000) < lit((fraction * 10000).round))
  }

  /** Stratified hash sample: per-stratum fractions (e.g. downsample the
    * dominant language, keep all of a rare one — the standard corpus
    * rebalancing move). Strata absent from the map get `default`.
    * Still a pure narrow filter — the strata column is just another
    * predicate input, so there is no shuffle and no skew concern. */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
                           fractions: Map[String, Double],
                           default: Double = 0.0): DataFrame = {
    (default +: fractions.values.toSeq).foreach(f =>
      require(f >= 0 && f <= 1, s"fraction $f outside [0,1]"))
    val threshold = fractions.foldLeft(lit((default * 10000).round)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit((f * 10000).round)).otherwise(acc)
    }
    df.filter(col(idCol).isNotNull &&
      hashBucket(col(idCol), 10000) < threshold)
  }

  /** Deterministic dataset split assignment (train/val/test): label
    * each row by where its id-hash bucket falls among the cumulative
    * fraction boundaries. Reproducible across runs, partitionings, and
    * engines; a pure narrow projection — no shuffle, no sort, no
    * global state, so "split the corpus" costs one scan at any size.
    * The same id always lands in the same split even as OTHER data
    * arrives (content-keyed, like [[hashSample]]) — the property that
    * keeps eval sets stable across corpus versions and prevents
    * train/test churn when a pipeline re-runs on grown data.
    * `splits` is ordered (label, fraction); fractions must sum to 1
    * (resolution 1/10000, the hash-bucket grain); the last label
    * absorbs rounding slack. Null-id rows are dropped (uniform policy
    * across this module). */
  def assignSplits(df: DataFrame, idCol: String,
                   splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    splits.foreach { case (l, f) =>
      require(f >= 0 && f <= 1, s"fraction $f for '$l' outside [0,1]") }
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $total")
    val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => (c * 10000).round)
    val b = hashBucket(col(idCol), 10000)
    val label = splits.map(_._1).zip(cuts).dropRight(1)
      .foldRight(lit(splits.last._1): Column) {
        case ((lbl, cut), acc) => when(b < lit(cut), lit(lbl)).otherwise(acc)
      }
    df.filter(col(idCol).isNotNull).withColumn("split", label)
  }

  /** Leakage-free split assignment: every member of a near-duplicate
    * CLUSTER lands in the same split, so a test document never has a
    * near-copy in train — the contamination [[assignSplits]]' row-id
    * hashing cannot prevent (near-dups hash independently). Clusters
    * come from SimHash near-dup edges → min-label connected
    * components; each row is keyed by its cluster representative
    * (its own id when unpaired — the common case, which costs only a
    * left join against the |pairs|-bounded label frame) and split by
    * [[assignSplits]] on that key. Output adds (rep, split).
    * Same determinism story as assignSplits: content-keyed, stable
    * across runs, partitionings, and corpus growth — except when new
    * data merges two clusters, where co-assignment (the safety
    * property) wins over per-row stability by design. */
  def assignSplitsLeakageFree(df: DataFrame, idCol: String, textCol: String,
                              splits: Seq[(String, Double)],
                              maxDist: Int = 3, rounds: Int = 3): DataFrame = {
    val pairs = Dedup.simhashNearDup(df, idCol, textCol, maxDist)
      .select("id_a", "id_b")
    val labels = Graph.minLabelPropagation(pairs, "id_a", "id_b", rounds)
      .select(col("id").as(idCol), col("lbl"))
    val withRep = df.join(labels, Seq(idCol), "left")
      .withColumn("rep", coalesce(col("lbl"), col(idCol))).drop("lbl")
    assignSplits(withRep, "rep", splits)
  }

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): row i gets priority key −ln(u_i)/w_i with u_i a
    * content-derived uniform in (0,1), and the k SMALLEST keys win —
    * distributionally identical to k sequential weighted draws (a row
    * with twice the weight is twice as likely at every draw), but
    * embarrassingly parallel: one narrow projection + a distributed
    * top-k (TakeOrdered — per-partition heaps, only P·k rows move).
    * u_i comes from the same md5 28-bit fragment as [[hashBucket]]
    * (+0.5 so u is never 0), so the sample is reproducible across
    * runs, partitionings, and engines — the standard "sample corpus
    * proportional to quality score" primitive, with a replayable
    * oracle. Rows with null id or weight ≤ 0 are excluded (zero weight
    * means never sampled; A-ES keys would be ±inf). Selection orders by
    * the FULL-precision key (quantizing first would collapse the
    * Exp(w)-distributed small keys into id-ordered ties); the appended
    * `skey` column is rounded for display/compare only. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (TextAnalysis.tokenHash31(
      concat(col(idCol).cast("string"), lit(s"#ws$seed"))).cast("double") + 0.5) /
      268435456.0
    val key = -log(u) / col(weightCol).cast("double")
    df.filter(col(idCol).isNotNull && col(weightCol).cast("double") > 0)
      .withColumn("__wskey", key)
      .orderBy(col("__wskey").asc, col(idCol).asc)
      .limit(k)
      .withColumn("skey", round(col("__wskey"), 6))
      .drop("__wskey")
  }

  /** Exact-n-per-key deterministic sample ("reservoir" semantics with a
    * content-defined priority): the n rows of each key with the lowest
    * md5(id) — reproducible across runs and engines, unlike a true
    * random reservoir. One shuffle keyed on `keyCol`; per-key work is a
    * sort of that key's rows (same bound as any per-key windowed op —
    * fine while no single key dominates a task's memory). */
  def samplePerKey(df: DataFrame, keyCol: String, idCol: String,
                   n: Int): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(md5(col(idCol).cast("string").cast("binary")).asc, col(idCol).asc)
    df.filter(col(idCol).isNotNull) // null ids: same drop policy as hashSample
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= n)
      .drop("__rank")
  }
}
