package graft.functions

import jdk.incubator.vector.{FloatVector, VectorOperators, VectorSpecies}

/**
 * Vector-API (JDK incubator) distance kernels for NAVIGATION/ROUTING use
 * only (HNSW graph walks, k-means cell assignment, PQ codebook scans) —
 * never for oracle-compared result distances or lossless pruning bounds,
 * which require the sequential-double kernel in [[Distances]].
 *
 * The species is pinned to 256-bit (not SPECIES_PREFERRED) so the float
 * summation order — and with it every seeded k-means fit and HNSW graph —
 * is identical on every host, including 128-bit-SIMD machines where the
 * JIT emulates the wider shape. Two independent accumulators break the
 * FMA loop-carried dependency, mirroring the scalar kernel's 4-way
 * unroll.
 *
 * Requires `--add-modules=jdk.incubator.vector` on the executing JVM
 * (this build's forked JVMs set it); [[Distances]] probes availability in
 * a try/catch at init and falls back to the scalar kernel otherwise —
 * scalac resolves the module from the JDK image, so COMPILING against it
 * needs no flag.
 */
object SimdKernels {
  private val S: VectorSpecies[java.lang.Float] = FloatVector.SPECIES_256
  private val L: Int = S.length()

  /** Squared L2 with float accumulation (navigation-grade). */
  def l2(a: Array[Float], b: Array[Float]): Float = {
    val n = math.min(a.length, b.length)
    var i = 0
    var acc0 = FloatVector.zero(S)
    var acc1 = FloatVector.zero(S)
    val upper2 = n - n % (2 * L)
    while (i < upper2) {
      val d0 = FloatVector.fromArray(S, a, i)
        .sub(FloatVector.fromArray(S, b, i))
      val d1 = FloatVector.fromArray(S, a, i + L)
        .sub(FloatVector.fromArray(S, b, i + L))
      acc0 = d0.fma(d0, acc0)
      acc1 = d1.fma(d1, acc1)
      i += 2 * L
    }
    val upper = n - n % L
    while (i < upper) {
      val d = FloatVector.fromArray(S, a, i)
        .sub(FloatVector.fromArray(S, b, i))
      acc0 = d.fma(d, acc0)
      i += L
    }
    var s = acc0.add(acc1).reduceLanes(VectorOperators.ADD)
    while (i < n) {
      val d = a(i) - b(i)
      s += d * d
      i += 1
    }
    s
  }
}
