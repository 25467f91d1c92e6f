package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Scalar quantization (SQ8) — the simplest compressed-domain ANN store:
 * one byte per dimension on a per-dimension uniform grid learned from a
 * sample (the `SQ8` index type FAISS/Milvus expose). 64-dim float32
 * drops 256 B -> 64 B per vector, a 4x memory cut with near-lossless
 * recall, and unlike PQ it needs no codebook training beyond a min/max
 * pass.
 *
 * Implementation shape: an SQ model IS a product-quantization model with
 * subspace width 1 whose "codebook" per dimension is the uniform grid
 * (stored at float precision, exactly like a float SQ store would hold
 * its reconstruction levels). Encoding uses the closed form
 * (`round((v - min) / step)`, O(dim) per vector — the actual SQ
 * advantage over PQ's nearest-codeword scan); the ADC scan, heap merge,
 * and exact re-rank stages are shared with [[Pq]] via [[SqModel.toPq]],
 * so the oracle replay machinery (materialized codebooks + codes, SQL
 * list_zip ADC) is identical too.
 */
object Sq {

  /** Per-dimension uniform grid: level c of dimension d reconstructs to
   * `(mins(d) + c * steps(d)).toFloat`. Stored double-precision so the
   * grid arithmetic is exact; reconstruction levels round to float once,
   * matching a float-valued SQ store. */
  final case class SqModel(
      mins: Array[Double],
      steps: Array[Double],
      levels: Int) extends Serializable {
    def dim: Int = mins.length

    /** Closed-form encode: nearest grid level, clamped to [0, levels).
     * Values outside the sampled range saturate — the standard SQ
     * behavior. */
    def encode(v: Array[Float]): Array[Int] = {
      require(v.length == dim, s"dim ${v.length} != model dim $dim")
      val out = new Array[Int](dim)
      var d = 0
      while (d < dim) {
        val c = math.round((v(d).toDouble - mins(d)) / steps(d)).toInt
        out(d) = if (c < 0) 0 else if (c >= levels) levels - 1 else c
        d += 1
      }
      out
    }

    /** Reconstruction level (float, the stored precision). */
    def recon(d: Int, c: Int): Float = (mins(d) + c * steps(d)).toFloat

    /** View as a subDim-1 PQ model: dimension = subspace, grid = codebook.
     * Shares the ADC scan/merge kernels and the SQL replay shape. */
    def toPq: Pq.PqModel =
      Pq.PqModel(1, Array.tabulate(dim)(d =>
        Array.tabulate(levels)(c => Array(recon(d, c)))))
  }

  /** Min/max fit per dimension over the sample; a degenerate dimension
   * (min == max) gets step 1.0 so every value encodes to level 0. */
  def fit(sample: Array[Array[Float]], levels: Int = 256): SqModel = {
    require(sample.nonEmpty, "empty SQ training sample")
    val dim = sample(0).length
    val mins = Array.fill(dim)(Double.MaxValue)
    val maxs = Array.fill(dim)(Double.MinValue)
    sample.foreach { v =>
      var d = 0
      while (d < dim) {
        val x = v(d).toDouble
        if (x < mins(d)) mins(d) = x
        if (x > maxs(d)) maxs(d) = x
        d += 1
      }
    }
    val steps = Array.tabulate(dim)(d =>
      if (maxs(d) > mins(d)) (maxs(d) - mins(d)) / (levels - 1) else 1.0)
    SqModel(mins, steps, levels)
  }

  /** Encode a corpus: (id, vec) -> (id, codes ARRAY<INT>). */
  def encodeDf(vectors: DataFrame, model: SqModel): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bm = spark.sparkContext.broadcast(model)
    vectors.select(col("id"), col("vec"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, bm.value.encode(v)) }
      .toDF("id", "codes")
  }

  /** Compressed-domain kNN over SQ codes — the [[Pq.search]] ADC kernel
   * with the grid as codebook. */
  def search(codes: DataFrame, queries: DataFrame, model: SqModel,
      k: Int): DataFrame =
    Pq.search(codes, queries, model.toPq, k)

  /** Two-stage: SQ shortlist + exact re-rank against raw vectors. */
  def searchReranked(codes: DataFrame, vectors: DataFrame, queries: DataFrame,
      model: SqModel, k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    Pq.rerankExact(search(codes, queries, model, shortlist),
      vectors, queries, k)
  }
}
