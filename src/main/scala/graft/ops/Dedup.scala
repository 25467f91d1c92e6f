package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/**
 * Scalable near-duplicate detection for document corpora — the
 * training-data-pipeline operators (beyond reference parity; built on the
 * same bucket-join machinery as the vector partitioners):
 *
 *  - MinHash + LSH banding: shingle -> minhash signature -> band keys ->
 *    bucket self-join -> signature-estimated Jaccard filter. Candidate
 *    generation never compares all pairs: cost is sum of bucket sizes
 *    squared, which stays near-linear when duplicates are sparse.
 *  - SimHash: 64-bit token-weight fingerprint; 16-bit band exact-match
 *    buckets guarantee every pair within Hamming distance 3 shares a band
 *    (pigeonhole over 4 bands), then exact Hamming filter.
 *
 * All hashes are the deterministic, JVM-independent ones in
 * [[graft.functions.Text]], so signatures agree across executors.
 */
object Dedup {

  /** Remove super-buckets before a band self-join. A bucket holding more
   * than `maxBucketSize` documents is non-discriminative (its band says
   * "similar to everything") and would make the join quadratic in the
   * hottest key — the classic LSH skew pathology. Dropped buckets cost no
   * real recall for pair-finding: any truly near-duplicate pair collides
   * in several independent bands, so discriminative bands still emit it.
   * This cap is what keeps candidate generation near-linear at corpus
   * scale. */
  private def dropSuperBuckets(banded: DataFrame, maxBucketSize: Int): DataFrame = {
    val sizes = banded.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("_bucket_n"))
      .where(col("_bucket_n") <= maxBucketSize)
      .select(col("band_idx").as("_bi"), col("band_key").as("_bk"))
    banded.join(broadcast(sizes),
      banded("band_idx") === col("_bi") && banded("band_key") === col("_bk"))
      .drop("_bi", "_bk")
  }

  /** MinHash-LSH candidate pairs (i < j) with estimated Jaccard >= threshold.
   * Output: (i, j, est_jaccard). */
  def minhashPairs(
      docs: DataFrame, // (doc_id LONG, text STRING)
      numHashes: Int = 64,
      rowsPerBand: Int = 4,
      shingleWidth: Int = 3,
      threshold: Double = 0.5,
      seed: Long = 42L,
      maxBucketSize: Int = 500): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hasher = Text.MinHasher(numHashes, seed)
    val b = spark.sparkContext.broadcast(hasher)

    val sigs = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val sig = b.value.signature(text, shingleWidth)
        (id, sig, b.value.bandKeys(sig, rowsPerBand))
      }
      .toDF("doc_id", "sig", "bands")

    val banded = dropSuperBuckets(
      sigs.select(col("doc_id"), col("sig"),
        posexplode(col("bands")).as(Seq("band_idx", "band_key"))),
      maxBucketSize)

    // join on bare ids only — carrying the 64-slot signatures through the
    // candidate join multiplies shuffle volume ~100x; re-attach them to
    // the (much smaller) deduped pair set afterwards
    val keys = banded.select(col("doc_id"), col("band_idx"), col("band_key"))
    val pairs = keys.as("a").join(keys.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .dropDuplicates("i", "j")

    val sigOnly = sigs.select(col("doc_id"), col("sig"))
    val est = udf((a: Seq[Long], bSig: Seq[Long]) =>
      Text.minhashSimilarity(a.toArray, bSig.toArray))
    pairs
      .join(sigOnly.select(col("doc_id").as("i"), col("sig").as("sig_a")), "i")
      .join(sigOnly.select(col("doc_id").as("j"), col("sig").as("sig_b")), "j")
      .select(col("i"), col("j"), est(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** SimHash near-duplicate pairs (i < j) within the given Hamming radius.
   * Band width 16 over 4 bands: complete for radius <= 3 (up to bands
   * dropped by the super-bucket cap). */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int = 3,
      maxBucketSize: Int = 500): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, Text.simhash(text)) }
      .toDF("doc_id", "sh")
    val banded = dropSuperBuckets(
      sigs.select(col("doc_id"), col("sh"),
        explode(expr(
          "array(" + (0 until 4).map(i =>
            s"named_struct('band_idx', $i, 'band_key', shiftright(sh, ${i * 16}) % 65536)")
            .mkString(",") + ")")).as("b"))
        .select(col("doc_id"), col("sh"),
          col("b.band_idx").as("band_idx"), col("b.band_key").as("band_key")),
      maxBucketSize)
    val ham = udf((a: Long, b: Long) => Text.hammingDistance(a, b))
    banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        ham(col("a.sh"), col("b.sh")).as("hamming"))
      .dropDuplicates("i", "j")
      .where(col("hamming") <= maxHamming)
  }

  /** Exact dedup at scale: keep the smallest id per identical content hash.
   * (SQL-oracled variant lives in TextQueries; this is the library form.) */
  def exact(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val h = docs.withColumn("_h", md5(col(textCol)))
    val keep = h.groupBy("_h").agg(min(col(idCol)).as(idCol)).select(col(idCol))
    docs.join(keep, idCol)
  }
}
