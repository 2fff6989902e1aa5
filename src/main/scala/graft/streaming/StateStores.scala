package graft.streaming

/** Streaming state-store provider selection (session-builder knob).
  *
  * The default HDFS-backed provider keeps every key of streaming state
  * (dedup fingerprints, sketch registers, window panes) in an
  * executor-heap map with checkpoint snapshots — correct, but the heap
  * IS the state bound, which is the wrong shape at 100 TB where a
  * streaming-dedup fingerprint set alone outgrows memory. The RocksDB
  * provider (`GRAFT_STATE_STORE=rocksdb`; rocksdbjni ships with Spark)
  * spills state to local disk with a block-cache in front, so state
  * size is bounded by executor DISK, not heap — the production choice
  * for large stateful streams. Results are provider-independent (the
  * store is an exact key-value map either way); the round's parity
  * receipt runs the full streaming family under both providers.
  */
object StateStores {
  val HdfsBacked =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
  val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Provider class for `spark.sql.streaming.stateStore.providerClass`,
    * from `GRAFT_STATE_STORE` (unset/`hdfs` → default, `rocksdb` →
    * RocksDB). Rejects anything else loudly — a typo must not silently
    * fall back to the default store. */
  def providerClass: String = sys.env.get("GRAFT_STATE_STORE") match {
    case None | Some("hdfs") => HdfsBacked
    case Some("rocksdb")     => RocksDb
    case Some(other) => throw new IllegalArgumentException(
      s"GRAFT_STATE_STORE must be 'rocksdb' or 'hdfs', got '$other'")
  }

  /** Short tag for telemetry lines (BENCH_LOG provenance). */
  def tag: String =
    if (providerClass == RocksDb) "rocksdb" else "hdfs"
}
