package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The only properties the exact-substring kernels rely on: NO false
  * negatives (under any partition/merge split), and graceful false
  * positives. */
class DupBloomSpec extends AnyFunSuite {

  test("no false negatives: every key added twice passes mightBeDup, any order/split") {
    val rnd = new scala.util.Random(7)
    val dups = Seq.fill(500)(rnd.nextLong())
    val singles = Seq.fill(2000)(rnd.nextLong())
    // split the adds across 3 "partitions" so promotion must survive
    // the merge path, including one-add-per-partition dup keys
    val parts = Array.fill(3)(new DupBloom(18))
    dups.zipWithIndex.foreach { case (h, i) =>
      parts(i % 3).add(h); parts((i + 1) % 3).add(h)
    }
    singles.zipWithIndex.foreach { case (h, i) => parts(i % 3).add(h) }
    val merged = parts.reduce(_ merge _)
    dups.foreach(h => assert(merged.mightBeDup(h), s"false negative for $h"))
    (dups ++ singles).foreach(h => assert(merged.mightContain(h)))
  }

  test("singletons are mostly pruned at a sane fill (false positives bounded)") {
    val rnd = new scala.util.Random(13)
    val b = new DupBloom(DupBloom.logSlotsFor(10000))
    val singles = Seq.fill(10000)(rnd.nextLong())
    singles.foreach(b.add)
    val fp = singles.count(b.mightBeDup).toDouble / singles.size
    assert(fp < 0.05, s"singleton false-positive rate $fp too high")
    // absent keys barely pass membership either
    val absent = Seq.fill(10000)(rnd.nextLong())
    val fpm = absent.count(b.mightContain).toDouble / absent.size
    assert(fpm < 0.15, s"membership false-positive rate $fpm too high")
  }

  test("merge is the saturating-at-2 count union") {
    val a = new DupBloom(12); val b = new DupBloom(12)
    a.add(42L); b.add(42L) // once on each side -> dup after merge
    a.add(7L)              // once total -> member, likely not dup
    assert(!a.mightBeDup(42L))
    a.merge(b)
    assert(a.mightBeDup(42L))
    assert(a.mightContain(7L))
  }

  test("logSlotsFor clamps to [10, 27]") {
    assert(DupBloom.logSlotsFor(0L) == 10)
    assert(DupBloom.logSlotsFor(1L << 40) == 27)
    assert(DupBloom.logSlotsFor(1000L) == 13)
  }
}
