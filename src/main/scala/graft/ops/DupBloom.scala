package graft.ops

/** Two-level Bloom filter over 64-bit keys — the map-side singleton
  * pruner of the stride-1 exact-substring family (r10 verdict #2) and
  * the membership pre-filter of its cross-corpus decontamination
  * route (#8).
  *
  * Two bitsets of `1 << logSlots` bits each: `bits1` marks "this slot
  * was hit at least once", `bits2` "at least twice". Each key probes
  * TWO positions (Kirsch–Mitzenmacher double hashing off the two
  * halves of the key); an add promotes every probed slot one level.
  * Partition filters merge exactly like counts saturating at 2:
  * `bits2' = b2a | b2b | (b1a & b1b)` — a key added once on each of
  * two partitions still promotes its slots to level 2.
  *
  * Guarantees (the only ones the exact-substring kernels rely on):
  *  - '''No false negatives''': a key added ≥ 2 times globally has
  *    every probed slot at level 2 after any merge order, so
  *    [[mightBeDup]] is true; a key added ≥ 1 time always passes
  *    [[mightContain]].
  *  - False POSITIVES (slot collisions) only let a provably-useless
  *    row survive the pre-filter — the exact fp-keyed count that
  *    follows still decides duplication, so results never change;
  *    collisions cost shuffle rows, not correctness.
  *
  * Sizing: callers estimate the add count n (for stride-1 windows,
  * Σ max(len − L + 1, 0) — one cheap agg, no explode) and take
  * `logSlotsFor(n)` ≈ 8 slots/key, capped at 2^27 slots (16 MiB per
  * bitset, 32 MiB broadcast). Past the cap a SINGLE filter degrades
  * to pruning less, never to wrong answers — build sites route
  * through [[ShardedDupBloom]], which holds the 8-slots/key budget to
  * ~16× that width by key-range sharding before the same graceful
  * degradation applies. */
final class DupBloom(val logSlots: Int) extends Serializable {
  require(logSlots >= 6 && logSlots <= 30, s"logSlots out of range: $logSlots")
  private val mask: Long = (1L << logSlots) - 1L
  val bits1: Array[Long] = new Array[Long](1 << (logSlots - 6))
  val bits2: Array[Long] = new Array[Long](1 << (logSlots - 6))

  @inline private def mix(h: Long): Long = {
    // splitmix64 finalizer — decorrelates the raw key (xxhash64 output
    // is already uniform; this keeps adversarial/structured keys safe)
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  @inline private def pos(h: Long, i: Int): Int = {
    val m = mix(h)
    (((m & 0xFFFFFFFFL) + i.toLong * (m >>> 32)) & mask).toInt
  }
  @inline private def get(bits: Array[Long], p: Int): Boolean =
    (bits(p >>> 6) & (1L << (p & 63))) != 0L
  @inline private def set(bits: Array[Long], p: Int): Unit =
    bits(p >>> 6) |= 1L << (p & 63)

  def add(h: Long): Unit = {
    var i = 0
    while (i < 2) {
      val p = pos(h, i)
      if (get(bits1, p)) set(bits2, p) else set(bits1, p)
      i += 1
    }
  }

  /** true iff every probed slot reached level 2 — all keys added
    * twice pass; singletons pass only on collisions. */
  def mightBeDup(h: Long): Boolean =
    get(bits2, pos(h, 0)) && get(bits2, pos(h, 1))

  /** true iff every probed slot reached level ≥ 1 — all added keys
    * pass; absent keys pass only on collisions. (`bits1` alone is the
    * membership set: an add always leaves it set at every probed
    * slot.) */
  def mightContain(h: Long): Boolean =
    get(bits1, pos(h, 0)) && get(bits1, pos(h, 1))

  def merge(other: DupBloom): DupBloom = {
    require(other.logSlots == logSlots, "mismatched DupBloom sizes")
    var w = 0
    while (w < bits1.length) {
      bits2(w) |= other.bits2(w) | (bits1(w) & other.bits1(w))
      bits1(w) |= other.bits1(w)
      w += 1
    }
    this
  }
}

object DupBloom {
  /** ~8 slots per expected key, clamped to [2^10, 2^27]. */
  def logSlotsFor(expectedAdds: Long): Int = {
    val want = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, expectedAdds * 8 - 1))
    math.min(27, math.max(10, want))
  }
}

/** Key-range-sharded [[DupBloom]] — the capacity route past the
  * single filter's 2^27-slot cap (r11 verdict #5). `nShards`
  * independent filters; a key belongs to exactly ONE shard, chosen by
  * an independent mix of the key (different odd multiplier than the
  * probe mixer, so shard choice and slot positions decorrelate), and
  * every add/query touches only that shard — so at ~8 slots/key PER
  * SHARD the aggregate prune ratio at n adds equals a single filter's
  * at n/nShards adds, with per-array sizes still bounded at 16 MiB.
  *
  * Same guarantees as [[DupBloom]] (no false negatives under any
  * merge order — each shard merges independently), same API, so the
  * build/probe sites are route-transparent. nShards = 1 IS the
  * single-filter behavior bit-for-bit (shardOf is constant 0 and the
  * inner filter probes identically).
  *
  * Cost model at scale: the broadcast ships nShards × 32 MiB once per
  * EXECUTOR (not per task). [[ShardedDupBloom.geometryFor]] caps
  * nShards at 16 (512 MiB — an ordinary executor's broadcast
  * headroom); past ~256M expected adds the geometry saturates and the
  * prune ratio degrades gracefully again — at that width shard the
  * CORPUS (process fp ranges in passes, one filter per pass) instead
  * of the filter. */
final class ShardedDupBloom(val nShards: Int, val logSlots: Int)
    extends Serializable {
  require(nShards >= 1 && nShards <= 64, s"nShards out of range: $nShards")
  val shards: Array[DupBloom] = Array.fill(nShards)(new DupBloom(logSlots))

  @inline private def shardOf(h: Long): Int =
    ShardedDupBloom.shardOf(h, nShards)

  def add(h: Long): Unit = shards(shardOf(h)).add(h)
  def mightBeDup(h: Long): Boolean = shards(shardOf(h)).mightBeDup(h)
  def mightContain(h: Long): Boolean = shards(shardOf(h)).mightContain(h)

  def merge(other: ShardedDupBloom): ShardedDupBloom = {
    require(other.nShards == nShards && other.logSlots == logSlots,
      "mismatched ShardedDupBloom geometry")
    var i = 0
    while (i < nShards) { shards(i).merge(other.shards(i)); i += 1 }
    this
  }
}

object ShardedDupBloom {
  /** Shard routing: odd-multiplier mix (xxhash64 prime2), top bits
    * folded — disjoint from DupBloom.mix's splitmix64 constants so a
    * slot collision in one shard says nothing about shard routing.
    * Exposed on the object so build sites can PARTITION the key
    * stream by shard and build each shard in its own task (one
    * 32 MiB filter of task memory) instead of allocating the whole
    * nShards × 32 MiB sharded filter per map task. */
  @inline def shardOf(h: Long, nShards: Int): Int = {
    val m = h * 0xC2B2AE3D27D4EB4FL
    (((m ^ (m >>> 29)) & Long.MaxValue) % nShards).toInt
  }

  /** (nShards, logSlots) holding ~8 slots/key: one filter while the
    * budget fits under the 2^27 cap, then 2^27-slot shards, count
    * capped at 16 (512 MiB broadcast). */
  def geometryFor(expectedAdds: Long): (Int, Int) = {
    // Clamp before the *8 and before narrowing: expectedAdds >= 2^60
    // would overflow the multiply, and a raw `.toInt` of the shifted
    // shard count wraps negative past 2^55 adds. Past 16 shards the
    // geometry saturates anyway (documented graceful degradation), so
    // clamping adds to 2^31 keys (16 shards exactly) loses nothing.
    val adds = math.min(math.max(1L, expectedAdds), 1L << 31)
    val slotsWanted = adds * 8
    if (slotsWanted <= (1L << 27)) (1, DupBloom.logSlotsFor(adds))
    else {
      val n = math.min(16L, (slotsWanted + (1L << 27) - 1) >> 27).toInt
      (n, 27)
    }
  }
}
