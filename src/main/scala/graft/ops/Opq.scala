package graft.ops

import breeze.linalg.{svd, DenseMatrix}

/**
 * Optimized Product Quantization (Ge, He, Ke, Sun: "Optimized Product
 * Quantization for Approximate Nearest Neighbor Search", CVPR 2013 —
 * the non-parametric OPQ of §4; Faiss ships the same construction as
 * `OPQMatrix`): learn an orthogonal rotation R JOINTLY with the PQ
 * codebooks so the fixed-axis subspace slicing stops being the accuracy
 * bottleneck. Plain PQ quantizes coordinate blocks as-is — correlated
 * dimensions and unbalanced per-block variance both inflate
 * quantization error; a rotation decorrelates and re-balances before
 * the slicing, and L2 distances are rotation-invariant so search
 * semantics are unchanged.
 *
 * Alternating minimization (each step cannot increase the objective
 * Σ‖R·x − q(R·x)‖²):
 *  1. R fixed → fit/encode PQ in the rotated space ([[Pq.fit]], the
 *     seeded deterministic Lloyd's per subspace);
 *  2. codes fixed → orthogonal Procrustes: with X the sample and Y its
 *     reconstructions [[Pq.PqModel.decode]], R* = U·Vᵀ from
 *     svd(Y·Xᵀ) = U·S·Vᵀ (breeze/LAPACK — deterministic for a fixed
 *     machine, and the oracle consumes materialized aux, never a
 *     re-derivation, so platform variance cannot split engine/oracle).
 *
 * Scale shape: the fit is sample-bounded and driver-side like every fit
 * in the repo; the corpus-sized work (rotate + encode) is one row-local
 * distributed map with R broadcast (dim² multiply-adds per row), and
 * search reuses the [[Pq]] ADC kernels unchanged. The exact re-rank
 * runs in the ORIGINAL space — rotation invariance means the shortlist
 * is the only thing the rotated space decides.
 *
 * Reference context: the reference engine stores raw vectors and brute
 * scans memtables (plugin/vectorbackend hnswlib float storage);
 * compressed-domain search with a learned rotation is part of the
 * beyond-reference quantization family (PQ/SQ8/BQ/MRL) this repo adds.
 */
object Opq {

  /** R (dim×dim, row-major, orthogonal) + the PQ model fitted in the
   * rotated space. */
  final case class OpqModel(
      rotation: Array[Array[Float]],
      pq: Pq.PqModel) extends Serializable {
    def dim: Int = rotation.length

    /** R·v with double accumulation per output coordinate, rounded to
     * float once — the materialized-aux values ARE the contract, so the
     * only requirement is run-to-run determinism, which a sequential
     * fold has. */
    def rotate(v: Array[Float]): Array[Float] = {
      val d = rotation.length
      require(v.length == d, s"dim ${v.length} != rotation dim $d")
      val out = new Array[Float](d)
      var i = 0
      while (i < d) {
        val row = rotation(i)
        var acc = 0.0
        var j = 0
        while (j < d) { acc += row(j).toDouble * v(j).toDouble; j += 1 }
        out(i) = acc.toFloat
        i += 1
      }
      out
    }
  }

  /** Mean squared quantization error of `pq` over an already-rotated
   * sample — the alternation's objective, exposed for the monotonicity
   * spec. */
  def quantError(pq: Pq.PqModel, rotated: Array[Array[Float]]): Double = {
    var acc = 0.0
    rotated.foreach { v =>
      val rec = pq.decode(pq.encode(v))
      var j = 0
      while (j < v.length) {
        val d = v(j).toDouble - rec(j).toDouble
        acc += d * d
        j += 1
      }
    }
    acc / rotated.length
  }

  /** Seeded random orthogonal init (QR-by-Gram-Schmidt over N(0,1)
   * draws — Ge et al. initialize non-parametric OPQ from a random
   * rotation; identity init risks a local optimum at plain PQ). */
  private def randomOrthogonal(dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    val m = Array.fill(dim, dim)(rnd.nextGaussian())
    var i = 0
    while (i < dim) {
      var k = 0
      while (k < i) {
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += m(i)(j) * m(k)(j); j += 1 }
        j = 0
        while (j < dim) { m(i)(j) -= dot * m(k)(j); j += 1 }
        k += 1
      }
      var norm = 0.0
      var j = 0
      while (j < dim) { norm += m(i)(j) * m(i)(j); j += 1 }
      norm = math.sqrt(norm)
      require(norm > 1e-12, "degenerate Gram-Schmidt draw")
      j = 0
      while (j < dim) { m(i)(j) /= norm; j += 1 }
      i += 1
    }
    m
  }

  /** The alternating fit. `opqIterations` outer rounds; each runs a full
   * seeded PQ fit in the current rotated space then the Procrustes
   * update. Deterministic end-to-end. */
  def fit(
      sample: Array[Array[Float]],
      numSub: Int,
      codesPerSub: Int = 256,
      pqIterations: Int = 8,
      opqIterations: Int = 3,
      seed: Long = 42L): OpqModel = {
    require(sample.nonEmpty, "empty OPQ training sample")
    val dim = sample(0).length
    var r = randomOrthogonal(dim, seed)
    var pq: Pq.PqModel = null

    def applyR(v: Array[Float]): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += r(i)(j) * v(j).toDouble; j += 1 }
        out(i) = acc.toFloat
        i += 1
      }
      out
    }

    var t = 0
    while (t < opqIterations) {
      val rotated = sample.map(applyR)
      pq = Pq.fit(rotated, numSub, codesPerSub, pqIterations, seed)
      if (t < opqIterations - 1) {
        // Procrustes step: min_R ‖R·X − Y‖_F over orthogonal R with
        // Y = reconstructions of the CURRENT rotated sample. M = Y·Xᵀ,
        // svd(M) = U·S·Vᵀ → R = U·Vᵀ.
        val m = DenseMatrix.zeros[Double](dim, dim)
        rotated.indices.foreach { s =>
          val x = sample(s)
          val y = pq.decode(pq.encode(rotated(s)))
          var i = 0
          while (i < dim) {
            val yi = y(i).toDouble
            var j = 0
            while (j < dim) { m(i, j) += yi * x(j).toDouble; j += 1 }
            i += 1
          }
        }
        val svd.SVD(u, _, vt) = svd(m)
        val ruv = u * vt
        r = Array.tabulate(dim, dim)((i, j) => ruv(i, j))
      }
      t += 1
    }
    OpqModel(r.map(_.map(_.toFloat)), pq)
  }
}
