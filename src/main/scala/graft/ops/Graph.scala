package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal distributed graph kernel for dedup canonicalization:
  * near-duplicate PAIRS (from LSH / SimHash / embedding buckets) must
  * become CLUSTERS before a corpus can keep one representative per
  * group — transitive closure, i.e. connected components.
  */
object Graph {

  /** Connected components by `rounds` of min-label propagation: every
    * vertex starts labeled with its own id; each round it adopts the
    * minimum label among itself and its neighbors. After D rounds all
    * components of diameter ≤ D carry their minimum member id.
    *
    * Each round is two keyed shuffles (neighbor-min aggregation +
    * label join), and [[Checkpoints.cut]] truncates the otherwise
    * exponentially-deepening iterative lineage — the standard Spark
    * iterative-algorithm hygiene (executor-local by default, reliable
    * when a checkpoint dir is configured). Dedup clusters are near-cliques
    * (diameter 1–3), so a small fixed `rounds` converges; for
    * general graphs with long chains the large-star/small-star
    * alternation (Kiveris et al., "Connected Components in MapReduce")
    * converges in O(log n) rounds behind this same signature — the
    * fixed-round form is chosen because it is deterministic at any
    * cutoff, which the cross-engine oracle unrolls verbatim.
    *
    * Returns (id, lbl) for every vertex that appears in an edge. */
  def minLabelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                          rounds: Int, checkpointEvery: Int = 2): DataFrame = {
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    // materialize the edge frame ONCE: its lineage is the caller's
    // whole pair-generation pipeline (sketch + band join), and every
    // round's join would otherwise re-run it from scratch (measured
    // 26 s → 7 s on the q48 corpus-dedup query)
    val e2 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .transform(Checkpoints.cut)
    var labels = e2.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
    // cut cadence: same trade as [[pageRank]] — one eager job per cut,
    // lineage bounded at checkpointEvery rounds between cuts
    for (r <- 1 to rounds) {
      val msgs = e2.join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min("lbl").as("ml"))
      val next = labels.join(msgs, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("ml"), col("lbl"))).as("lbl"))
      labels =
        if (r % checkpointEvery == 0 || r == rounds) next.transform(Checkpoints.cut)
        else next
    }
    labels
  }

  /** Fixed-iteration PageRank over a directed edge list — the
    * "which sources/domains matter" centrality a corpus-curation
    * pipeline uses to weight crawl frontiers and source trust.
    *
    * pr⁰(v) = 1/N;  prᵏ(v) = (1−d)/N + d·Σ_{(u,v)∈E} prᵏ⁻¹(u)/deg(u).
    *
    * Determinism at any scale (and against the unrolled SQL oracle):
    * the per-edge contribution pr(u)/deg(u) is a scalar double op, but
    * its SUM over in-edges would be partition-order-dependent in
    * double. Contributions are therefore fixed-pointed —
    * floor(x·10¹⁵) as a primitive LONG — summed exactly (order-free),
    * and scaled back once per round. 10¹⁵ keeps every floored value
    * under 2⁵³ (double→long exact in any engine), and the LONG sum
    * cannot overflow BY CONSTRUCTION: Σ_edges floor(pr(u)/deg(u)·10¹⁵)
    * ≤ 10¹⁵·Σ_u pr(u) ≤ 10¹⁵ ≪ 2⁶³ — ranks are a (sub-)probability
    * mass, so even the GLOBAL contribution sum fits a long. The long
    * carrier replaces the r13 DECIMAL(38,0) carrier: identical exact
    * integer sums (same values, oracle row unchanged), but summed as
    * a codegen primitive instead of one Decimal allocation per edge
    * per round — the r13 sf1 run measured 58 s cumulative GC by q83,
    * attributed to exactly that allocation pressure. The floor
    * truncation error per round is ≤ in-degree·10⁻¹⁵, far below the
    * 6-dp output rounding.
    *
    * Shape per round: one keyed join (edges ⋈ ranks on src — ranks is
    * the N-row frame, broadcastable while N fits, shuffle-joinable
    * beyond) + one groupBy(dst) agg; lineage truncated per round like
    * [[minLabelPropagation]]. Dangling mass: vertices with out-degree
    * 0 (possible in a directed input) leak their rank — standard
    * simplified PageRank; pass symmetric edges for leak-free ranks.
    *
    * Returns (id, pr) for every vertex that appears in an edge.
    *
    * Key representation matters at scale: every internal shuffle
    * (edge distinct, degree agg, the per-round contribution agg) is
    * keyed by the vertex id — callers with string ids should pack
    * them into longs where a bijection exists and decode on output
    * (a long key halves shuffle bytes and hashes ~3× faster than a
    * short string; ranks are a pure function of graph structure, so
    * the values are bit-identical under any key bijection).
    * `assumeDistinct = true` skips the internal edge dedup for
    * callers whose edge list is already unique — one full-width
    * shuffle of the edge table saved. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, damping: Double = 0.85,
               checkpointEvery: Int = 2,
               assumeDistinct: Boolean = false,
               broadcastNodes: Long = 4000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping >= 0 && damping <= 1, s"damping $damping outside [0,1]")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    val e0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = (if (assumeDistinct) e0 else e0.distinct())
      .transform(Checkpoints.cut)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .transform(Checkpoints.cut)
    val n = nodes.count()
    // Join-strategy route on the NODE count (known exactly here, and
    // the rank/contribution/degree frames are all node-bounded): under
    // the gate every per-round join broadcasts the node-sized side —
    // zero rank-frame exchanges, zero edge-table sorts, the edge table
    // is never re-partitioned at all; above it the sort-merge route
    // pre-partitions+sorts the edge table ONCE before the lineage cut
    // (localCheckpoint preserves partitioning/ordering in the
    // LogicalRDD) so every round's rank join reuses that single
    // exchange+sort and only the node-bounded rank frame moves per
    // round — without it the SMJ re-shuffled the FULL edge table every
    // iteration (r13 sf1: q83 ~12x for data x10). Join strategy never
    // changes which rows match, and the per-round sums are order-free
    // fixed-point longs, so ranks are bit-identical on both routes
    // (route-parity spec'd). The `broadcastNodes` default (4M nodes
    // ≈ 64 MB raw, ~2x that as a hashed relation) sits well under any
    // realistic executor memory while keeping billion-node graphs on
    // the shuffle route; deployments tune the parameter.
    val small = n <= broadcastNodes
    val hint: DataFrame => DataFrame =
      if (small) org.apache.spark.sql.functions.broadcast else identity
    val ed0 = e.join(hint(deg), "src")
    val ed = (if (small) ed0
              else ed0.repartition(col("src")).sortWithinPartitions("src"))
      .transform(Checkpoints.cut)
    val base = (1.0 - damping) / n
    var ranks = nodes.withColumn("pr", lit(1.0 / n))
    // lineage cut cadence: each eager cut costs a full plan evaluation
    // job; a per-round cut therefore doubles the job count for bounded
    // 2-round lineages. Cutting every `checkpointEvery` rounds (and
    // always after the last) keeps lineage depth ≤ checkpointEvery
    // joins — same results (cuts are plan-invisible), fewer jobs.
    for (it <- 1 to iterations) {
      val contrib = ed.join(hint(ranks.withColumnRenamed("id", "src")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(floor(col("pr") / col("deg") * 1e15)
          .cast("long")).as("acc"))
      val next = ranks.drop("pr").join(hint(contrib), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + lit(damping) *
            (coalesce(col("acc"), lit(0L)).cast("double") / 1e15))
            .as("pr"))
      ranks =
        if (it % checkpointEvery == 0 || it == iterations)
          next.transform(Checkpoints.cut)
        else next
    }
    ranks
  }
}
