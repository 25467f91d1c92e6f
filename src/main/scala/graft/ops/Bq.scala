package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Binary quantization (BQ) — the most aggressive compressed-domain ANN
 * store: one SIGN BIT per dimension against a per-dimension threshold
 * learned from a sample (the binary-embedding / `BIN_FLAT` family). A
 * 64-dim float32 vector packs into a single long — a 32x memory cut —
 * and candidate scoring is a Hamming distance: one XOR + popcount per
 * 64 dimensions. Recall comes back through the standard exact re-rank
 * of a Hamming shortlist.
 *
 * Spark shape: encoding is a map; the scan is pure `functions` column
 * algebra (`bit_count(a ^ b)` folded over the packed words with
 * `zip_with`/`aggregate`) — whole-stage codegen end to end, no UDF in
 * the hot path — followed by the same bounded top-k aggregation and
 * exact re-rank stages every other compressed path uses. The DuckDB
 * twin replays the Hamming scan bit-for-bit from materialized code
 * tables (integer arithmetic both sides).
 */
object Bq {

  /** Per-dimension sign thresholds (the sample mean — the standard
   * zero-centering choice for binary embeddings). */
  final case class BqModel(thresholds: Array[Double]) extends Serializable {
    def dim: Int = thresholds.length
    def words: Int = (dim + 63) / 64

    /** Pack sign bits little-endian: bit (d % 64) of word (d / 64) is set
     * iff v(d) > threshold(d). */
    def encode(v: Array[Float]): Array[Long] = {
      require(v.length == dim, s"dim ${v.length} != model dim $dim")
      val out = new Array[Long](words)
      var d = 0
      while (d < dim) {
        if (v(d).toDouble > thresholds(d)) out(d / 64) |= (1L << (d % 64))
        d += 1
      }
      out
    }
  }

  def fit(sample: Array[Array[Float]]): BqModel = {
    require(sample.nonEmpty, "empty BQ training sample")
    val dim = sample(0).length
    val sums = new Array[Double](dim)
    sample.foreach { v =>
      var d = 0
      while (d < dim) { sums(d) += v(d); d += 1 }
    }
    BqModel(sums.map(_ / sample.length))
  }

  /** Encode a corpus: (id, vec) -> (id, code ARRAY<LONG>). */
  def encodeDf(vectors: DataFrame, model: BqModel): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bm = spark.sparkContext.broadcast(model)
    vectors.select(col("id"), col("vec"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, bm.value.encode(v)) }
      .toDF("id", "code")
  }

  /** Hamming distance between two packed code columns — pure column
   * algebra, codegen-friendly, bit-identical in DuckDB
   * (`list_sum([bit_count(xor(x[1], x[2])) ...])`). */
  def hamming(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0L), (acc, v) => acc + v)

  /** Two-stage BQ search: Hamming shortlist over the packed codes, exact
   * L2 re-rank against the raw vectors.
   *
   * @param codes   (id, code ARRAY<LONG>) from [[encodeDf]]
   * @param qCodes  (qid, qcode ARRAY<LONG>) — queries through the same encoder
   * @param vectors (id, vec) raw corpus for the re-rank join
   * @param queries (qid, qv)
   */
  def searchReranked(codes: DataFrame, qCodes: DataFrame, vectors: DataFrame,
      queries: DataFrame, k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val spark = codes.sparkSession
    val shortUdaf = udaf(new graft.functions.TopKAggregator(shortlist),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble))
    val short = codes.join(broadcast(qCodes))
      .select(col("qid"), col("id"),
        hamming(col("code"), col("qcode")).cast("double").as("dist"))
      .groupBy("qid").agg(shortUdaf(col("id"), col("dist")).as("topk"))
      .select(col("qid"), explode(col("topk.ids")).as("id"))
    Pq.rerankExact(short, vectors, queries, k)
  }
}
