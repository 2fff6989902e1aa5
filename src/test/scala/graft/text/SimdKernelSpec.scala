package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** The SIMD/scalar contract: [[SimdTriangle]] and [[ScalarTriangle]]
  * are BIT-identical (not approximately equal — the same doubles), so
  * kernel dispatch is a pure throughput decision and a cluster where
  * only some executors resolve the incubator module still produces
  * exactly one answer. */
class SimdKernelSpec extends AnyFunSuite {

  private def fill(n: Int, seed: Long): Array[Double] = {
    val rng = new java.util.Random(seed)
    Array.fill(n)(rng.nextGaussian())
  }

  private def tri(d: Int): Int = d * (d + 1) / 2

  test("build ships the incubator module to forked JVMs (the SIMD kernel " +
    "must actually be exercised by this suite, not silently skipped)") {
    assert(SimdSupport.available,
      "jdk.incubator.vector is not resolvable — did --add-modules fall " +
        "out of build.sbt javaOptions / scripts/_jvmflags.sh?")
  }

  test("SimdTriangle == ScalarTriangle bit-for-bit, including j-edge and " +
    "r-tail shapes") {
    assume(SimdSupport.available)
    // d sweeps across vector-length remainders (AVX-512: 8 lanes; the
    // assertion is lane-width independent); m sweeps the 4-chain tail
    for (d <- Seq(1, 3, 8, 13, 32, 67); m <- Seq(1, 2, 4, 7, 31, 64)) {
      val buf = fill(m * d, seed = d * 1000L + m)
      val a = fill(tri(d), seed = 42L) // nonzero start: += paths differ too
      val b = a.clone()
      ScalarTriangle.update(a, buf, m, d)
      SimdTriangle.update(b, buf, m, d)
      val diff = (0 until tri(d)).find(k =>
        java.lang.Double.doubleToRawLongBits(a(k)) !=
          java.lang.Double.doubleToRawLongBits(b(k)))
      diff.foreach { k =>
        fail(s"d=$d m=$m first bit-diff at packed cell $k: " +
          s"scalar=${a(k)} simd=${b(k)}")
      }
    }
  }

  test("ScalarTriangle computes the right cells (vs a naive reference, " +
    "within accumulation-order tolerance)") {
    val d = 19; val m = 23
    val buf = fill(m * d, seed = 7L)
    val xxt = new Array[Double](tri(d))
    ScalarTriangle.update(xxt, buf, m, d)
    def off(i: Int) = i * d - i * (i - 1) / 2
    for (i <- 0 until d; j <- i until d) {
      var s = 0.0
      for (r <- 0 until m) s += buf(r * d + i) * buf(r * d + j)
      val got = xxt(off(i) + j - i)
      assert(math.abs(got - s) <= 1e-12 * (1.0 + math.abs(s)),
        s"cell ($i,$j): got $got want ~$s")
    }
  }
}
