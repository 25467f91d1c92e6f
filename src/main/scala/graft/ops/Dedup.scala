package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Text

/**
 * Scalable near-duplicate detection for document corpora — the
 * training-data-pipeline operators (beyond reference parity; built on the
 * same bucket-join machinery as the vector partitioners):
 *
 *  - MinHash + LSH banding: shingle -> minhash signature -> band keys ->
 *    per-bucket pair generation -> signature-estimated Jaccard filter.
 *    Candidate generation never compares all pairs: cost is sum of bucket
 *    sizes squared, which stays near-linear when duplicates are sparse.
 *  - SimHash: 64-bit token-weight fingerprint; 16-bit band exact-match
 *    buckets guarantee every pair within Hamming distance 3 shares a band
 *    (pigeonhole over 4 bands), then exact Hamming filter.
 *
 * Candidate pairs are produced by ONE shuffle of the banded table
 * (groupBy band -> in-bucket pair enumeration). A bucket larger than
 * `maxBucketSize` is non-discriminative (its band says "similar to
 * everything") and is dropped whole — the classic LSH skew guard; truly
 * near-duplicate pairs collide in several independent bands, so
 * discriminative bands still emit them. This cap is what keeps candidate
 * generation near-linear at corpus scale (no quadratic hot key, no
 * driver-side bucket statistics).
 *
 * All hashes are the deterministic, JVM-independent ones in
 * [[graft.functions.Text]], so signatures agree across executors.
 */
object Dedup {

  /** One pass over the corpus: (doc_id, sig ARRAY<LONG>, bands ARRAY<LONG>). */
  def minhashSignatures(
      docs: DataFrame, // (doc_id LONG, text STRING)
      numHashes: Int = 64,
      rowsPerBand: Int = 4,
      shingleWidth: Int = 3,
      seed: Long = 42L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hasher = Text.MinHasher(numHashes, seed)
    val b = spark.sparkContext.broadcast(hasher)
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val sig = b.value.signature(text, shingleWidth)
        (id, sig, b.value.bandKeys(sig, rowsPerBand))
      }
      .toDF("doc_id", "sig", "bands")
  }

  /** Candidate (i < j) pairs sharing a band bucket of size <= maxBucketSize:
   * one shuffle on the band key, pairs enumerated inside each bucket. */
  private def bucketPairs(
      banded: Dataset[(Long, Int, Long)], // (doc_id, band_idx, band_key)
      maxBucketSize: Int): DataFrame = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded.groupByKey { case (_, bi, bk) => (bi, bk) }
      .flatMapGroups { (_: (Int, Long), it: Iterator[(Long, Int, Long)]) =>
        // bounded buffering: stop reading a super-bucket at cap+1 instead
        // of materializing it — the hot bucket the cap exists to drop must
        // not first be held whole in one task's memory
        val ids = new Array[Long](maxBucketSize + 1)
        var n = 0
        while (it.hasNext && n <= maxBucketSize) { ids(n) = it.next()._1; n += 1 }
        if (n > maxBucketSize) Iterator.empty
        else {
          java.util.Arrays.sort(ids, 0, n)
          for {
            i <- (0 until n).iterator
            j <- (i + 1) until n
          } yield (ids(i), ids(j))
        }
      }
      .toDF("i", "j")
      .dropDuplicates("i", "j")
  }

  /** MinHash-LSH candidate pairs (i < j) with estimated Jaccard >= threshold
   * from a precomputed signature table. Output: (i, j, est_jaccard). */
  def minhashPairsFromSigs(
      sigBands: DataFrame, // (doc_id, sig, bands) from [[minhashSignatures]]
      threshold: Double = 0.5,
      maxBucketSize: Int = 500): DataFrame = {
    val spark = sigBands.sparkSession
    import spark.implicits._
    val banded = sigBands
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_key")))
      .as[(Long, Int, Long)]
    val pairs = bucketPairs(banded, maxBucketSize)
    // join on bare ids only — carrying the 64-slot signatures through the
    // candidate join multiplies shuffle volume ~100x; attach them to the
    // (much smaller) deduped pair set afterwards
    val sigOnly = sigBands.select(col("doc_id"), col("sig"))
    val est = udf((a: Seq[Long], bSig: Seq[Long]) =>
      Text.minhashSimilarity(a.toArray, bSig.toArray))
    pairs
      .join(sigOnly.select(col("doc_id").as("i"), col("sig").as("sig_a")), "i")
      .join(sigOnly.select(col("doc_id").as("j"), col("sig").as("sig_b")), "j")
      .select(col("i"), col("j"), est(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** MinHash-LSH near-duplicate pairs, end to end. */
  def minhashPairs(
      docs: DataFrame,
      numHashes: Int = 64,
      rowsPerBand: Int = 4,
      shingleWidth: Int = 3,
      threshold: Double = 0.5,
      seed: Long = 42L,
      maxBucketSize: Int = 500): DataFrame =
    minhashPairsFromSigs(
      minhashSignatures(docs, numHashes, rowsPerBand, shingleWidth, seed),
      threshold, maxBucketSize)

  /** SimHash banding: (doc_id, sh, band_idx, band_key) — 4 x 16-bit bands. */
  def simhashBands(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val sh = Text.simhash(text)
        // mask, not %: remainder keeps the dividend's sign, so a negative
        // simhash would get different keys than a positive one for
        // identical 16-bit band content, breaking pigeonhole completeness
        (0 until 4).map(i => (id, sh, i, (sh >>> (i * 16)) & 0xFFFFL))
      }
      .toDF("doc_id", "sh", "band_idx", "band_key")
  }

  /** SimHash near-duplicate pairs (i < j) within the given Hamming radius
   * from a precomputed band table. Band width 16 over 4 bands: complete
   * for radius <= 3 (up to bands dropped by the super-bucket cap). */
  def simhashPairsFromBands(
      banded: DataFrame, // (doc_id, sh, band_idx, band_key)
      maxHamming: Int = 3,
      maxBucketSize: Int = 500): DataFrame = {
    val spark = banded.sparkSession
    import spark.implicits._
    val pairs = bucketPairs(
      banded.select(col("doc_id"), col("band_idx"), col("band_key"))
        .as[(Long, Int, Long)], maxBucketSize)
    val sh = banded.select(col("doc_id"), col("sh")).dropDuplicates("doc_id")
    val ham = udf((a: Long, b: Long) => Text.hammingDistance(a, b))
    pairs
      .join(sh.select(col("doc_id").as("i"), col("sh").as("sh_a")), "i")
      .join(sh.select(col("doc_id").as("j"), col("sh").as("sh_b")), "j")
      .select(col("i"), col("j"), ham(col("sh_a"), col("sh_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** SimHash near-duplicate pairs, end to end. */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int = 3,
      maxBucketSize: Int = 500): DataFrame =
    simhashPairsFromBands(simhashBands(docs), maxHamming, maxBucketSize)

  /** Exact dedup at scale: keep the smallest id per identical content hash.
   * (SQL-oracled variant lives in TextQueries; this is the library form.) */
  def exact(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val h = docs.withColumn("_h", md5(col(textCol)))
    val keep = h.groupBy("_h").agg(min(col(idCol)).as(idCol)).select(col(idCol))
    docs.join(keep, idCol)
  }
}
