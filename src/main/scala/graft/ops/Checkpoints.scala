package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation policy for iterative operators (k-means Lloyd
  * rounds, min-label propagation, PageRank): each round must cut the
  * otherwise exponentially-deepening plan, but HOW it cuts is a
  * deployment decision, not an algorithm one.
  *
  *  - `localCheckpoint()` (default): blocks live in executor storage —
  *    zero external I/O, right for local mode and short-lived jobs, but
  *    a lost executor loses blocks with NO lineage to recompute them
  *    (the lineage was truncated), failing the job.
  *  - reliable `checkpoint()`: blocks persist to the SparkContext's
  *    checkpoint directory (HDFS/object store on a real cluster) —
  *    survives executor churn, the right mode for thousand-executor
  *    runs where churn is routine.
  *
  * The switch is Spark's own knob, not a new config: call
  * `spark.sparkContext.setCheckpointDir(path)` and every iterative
  * graft operator upgrades to reliable checkpoints; leave it unset and
  * they stay executor-resident. Same results either way (checkpointing
  * is plan-invisible) — specs assert parity in both modes.
  */
object Checkpoints {

  /** Cut lineage here: reliable when a checkpoint dir is configured,
    * executor-local otherwise. The reliable path persists the frame
    * before checkpointing — a bare `checkpoint()` materializes the plan
    * once for the eager count and then RECOMPUTES it to write the
    * checkpoint files (Spark's documented behavior); caching makes the
    * second pass a block read. The cache is dropped as soon as the
    * checkpoint exists — the returned frame reads checkpoint files. */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = cached.checkpoint()
      cached.unpersist(blocking = false)
      out
    } else df.localCheckpoint()
}
