package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** OPQ: rotation orthogonality / norm preservation, deterministic fit,
 * and the property the rotation exists for — quantization error no
 * worse than plain PQ's on a correlated corpus. */
class OpqSpec extends AnyFunSuite {

  private val Dim = 32
  private val NumSub = 8

  /** Correlated corpus — dimensions are pairwise-coupled copies with
   * noise, the regime where axis-aligned PQ slicing loses and a learned
   * rotation wins (Ge et al. §1). */
  private def mkCorrelated(n: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.tabulate(n) { _ =>
      val base = Array.fill(Dim / 4)(rnd.nextGaussian().toFloat)
      Array.tabulate(Dim) { j =>
        base(j % (Dim / 4)) * (1.0f + 0.3f * (j / (Dim / 4))) +
          0.05f * rnd.nextGaussian().toFloat
      }
    }
  }

  test("rotation is orthogonal and preserves norms/distances") {
    val sample = mkCorrelated(800, 7L)
    val om = Opq.fit(sample, NumSub, codesPerSub = 64,
      pqIterations = 4, opqIterations = 3, seed = 42L)
    val r = om.rotation
    // R·Rᵀ = I within float tolerance
    for (i <- 0 until Dim; k <- 0 until Dim) {
      val dot = (0 until Dim).map(j => r(i)(j).toDouble * r(k)(j).toDouble).sum
      val want = if (i == k) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-5, s"RRt($i,$k) = $dot")
    }
    // distance preservation on raw pairs
    val a = sample(0); val b = sample(1)
    val d0 = graft.functions.Distances.l2(a, b)
    val d1 = graft.functions.Distances.l2(om.rotate(a), om.rotate(b))
    assert(math.abs(d0 - d1) / math.max(d0, 1e-9) < 1e-4)
  }

  test("fit is deterministic") {
    val sample = mkCorrelated(500, 11L)
    val m1 = Opq.fit(sample, NumSub, 32, 3, 2, seed = 5L)
    val m2 = Opq.fit(sample, NumSub, 32, 3, 2, seed = 5L)
    assert(m1.rotation.flatten.toSeq == m2.rotation.flatten.toSeq)
    assert(m1.pq.codebooks.flatten.flatten.toSeq
      == m2.pq.codebooks.flatten.flatten.toSeq)
  }

  test("ann_opq_rerank recall >= 0.9 vs exact kNN on the fixture") {
    val spark = graft.SparkEntry.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.PqQueries.queries("ann_opq_rerank")(spark, dir)
    val truth = graft.queries.VectorQueries.queries("knn_l2")(spark, dir)
    val rec = graft.ops.Recall.meanAtK(got, truth, graft.queries.PqQueries.K)
    info(f"opq reranked recall $rec%.4f")
    assert(rec >= 0.9, f"reranked OPQ recall $rec%.4f")
  }

  test("learned rotation beats plain PQ quantization error on correlated data") {
    val sample = mkCorrelated(1500, 3L)
    val plain = Pq.fit(sample, NumSub, 64, 6, 42L)
    val plainErr = Opq.quantError(plain, sample)
    val om = Opq.fit(sample, NumSub, 64, pqIterations = 6,
      opqIterations = 4, seed = 42L)
    val rotated = sample.map(om.rotate)
    val opqErr = Opq.quantError(om.pq, rotated)
    info(f"plain PQ mse $plainErr%.5f vs OPQ $opqErr%.5f")
    assert(opqErr < plainErr,
      f"OPQ $opqErr%.6f should beat plain PQ $plainErr%.6f on correlated data")
  }
}
