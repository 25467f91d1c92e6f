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
    // estimated jaccard = equal-slot fraction, in pure column algebra
    // (zip_with + aggregate stay inside whole-stage codegen; the boxed
    // Seq[Long] UDF this replaces dominated the 1.5M-pair verify pass).
    // Integer count / size is exact in double — bit-equal to
    // Text.minhashSimilarity and to the oracle's SQL replay.
    val est = expr("aggregate(zip_with(sig_a, sig_b, " +
      "(x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
      .cast("double") / size(col("sig_a")).cast("double")
    pairs
      .join(sigOnly.select(col("doc_id").as("i"), col("sig").as("sig_a")), "i")
      .join(sigOnly.select(col("doc_id").as("j"), col("sig").as("sig_b")), "j")
      .select(col("i"), col("j"), est.as("est_jaccard"))
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
    // native bit_count(xor) == Long.bitCount(a ^ b) (the UDF this
    // replaces) — the exact-Hamming verdict stays in whole-stage codegen
    pairs
      .join(sh.select(col("doc_id").as("i"), col("sh").as("sh_a")), "i")
      .join(sh.select(col("doc_id").as("j"), col("sh").as("sh_b")), "j")
      .select(col("i"), col("j"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** SimHash near-duplicate pairs, end to end. */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int = 3,
      maxBucketSize: Int = 500): DataFrame =
    simhashPairsFromBands(simhashBands(docs), maxHamming, maxBucketSize)

  /** Random-hyperplane (sign) LSH bands for embedding-cosine near-dup:
   * (id, band, bkey) — `numBands` keys of `bitsPerBand` sign bits each,
   * from seeded Gaussian hyperplanes (Charikar's SimHash for vectors).
   * Two vectors at angle θ agree on one sign bit with prob 1 − θ/π, so
   * near-parallel pairs (cosine near-dups) collide in some band with
   * overwhelming probability while random pairs collide at ~2^-bits per
   * band — candidate generation stays near-linear in corpus size. */
  def embeddingBands(
      vecs: DataFrame, // (id LONG, vec ARRAY<FLOAT>)
      dim: Int,
      numBands: Int = 16,
      bitsPerBand: Int = 16,
      seed: Long = 42L): DataFrame = {
    require(bitsPerBand <= 62, "band key must fit a Long")
    val spark = vecs.sparkSession
    import spark.implicits._
    val planes = {
      val r = new java.util.Random(seed)
      Array.fill(numBands * bitsPerBand)(Array.fill(dim)(r.nextGaussian()))
    }
    val b = spark.sparkContext.broadcast(planes)
    vecs.select(col("id"), col("vec"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val ps = b.value
        (0 until numBands).map { band =>
          var key = 0L
          var bit = 0
          while (bit < bitsPerBand) {
            val p = ps(band * bitsPerBand + bit)
            var d = 0.0
            var i = 0
            val n = math.min(dim, v.length)
            while (i < n) { d += p(i) * v(i); i += 1 }
            if (d > 0) key |= (1L << bit)
            bit += 1
          }
          (id, band, key)
        }
      }
      .toDF("id", "band", "bkey")
  }

  /** Embedding-cosine near-duplicate pairs from materialized band + corpus
   * tables: one shuffle of the banded table enumerates in-bucket pairs
   * (super-buckets dropped whole, the LSH skew guard), then the exact
   * sequential-double cosine filter runs only on candidates. Semantics are
   * deliberately plain-SQL-replayable: identical to a band self-join with
   * a HAVING count <= maxBucketSize bucket filter. */
  def embeddingNearDupPairs(
      corpus: DataFrame, // (id LONG, vec ARRAY<FLOAT>)
      bands: DataFrame, // (id, band, bkey) from [[embeddingBands]]
      maxDist: Double,
      maxBucketSize: Int = 200): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val pairs = bucketPairs(
      bands.select(col("id"), col("band"), col("bkey"))
        .as[(Long, Int, Long)], maxBucketSize)
    pairs
      .join(corpus.select(col("id").as("i"), col("vec").as("va")), "i")
      .join(corpus.select(col("id").as("j"), col("vec").as("vb")), "j")
      .select(col("i"), col("j"),
        graft.functions.Distances.cosine(col("va"), col("vb")).as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** Exact dedup at scale: keep the smallest id per identical content hash.
   * (SQL-oracled variant lives in TextQueries; this is the library form.) */
  def exact(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val h = docs.withColumn("_h", md5(col(textCol)))
    val keep = h.groupBy("_h").agg(min(col(idCol)).as(idCol)).select(col(idCol))
    docs.join(keep, idCol)
  }

  /** Connected components over an undirected pair list (i, j) — the
   * cluster-selection step after near-dup pair generation (a pipeline
   * keeps one document per component). Star contraction: each round
   * every current super-node points to the minimum of its closed
   * neighborhood (pointers strictly decrease, so no cycles and the
   * component minimum always survives as its own representative), the
   * edge set is rewritten through those pointers, self-loops drop, and
   * the round repeats on the CONTRACTED graph. Near-dup components are
   * dense clusters, so the first round collapses most of the edge mass
   * (a clique contracts in one round) — unlike plain label propagation,
   * which re-joins the full edge set for every round of the diameter.
   * Edges and the id→component mapping stay distributed throughout (no
   * driver-side graph state). Returns (id, component) with component =
   * the smallest id in the connected component. Throws if `maxIters`
   * rounds don't converge — an adversarial long-path graph wants the
   * alternating large-star/small-star variant (Kiveris et al. 2014),
   * not silent wrong answers. */
  def connectedComponents(pairs: DataFrame, // (i LONG, j LONG)
      maxIters: Int = 25): DataFrame = {
    // each round MUST truncate lineage (localCheckpoint, eager): an
    // iterative join/agg chain otherwise doubles the logical plan per
    // round and planning cost explodes long before the data does. On a
    // real cluster prefer reliable checkpointing (survives executor
    // loss); block-manager truncation is the single-node equivalent.
    var edges = pairs.select(col("i").as("a"), col("j").as("b"))
      .where(col("i") =!= col("j")).localCheckpoint()
    var mapping = edges.select(col("a").as("id"))
      .unionAll(edges.select(col("b").as("id"))).distinct()
      .select(col("id"), col("id").as("component")).localCheckpoint()
    var nEdges = edges.count()
    var it = 0
    while (nEdges > 0 && it < maxIters) {
      // super-node -> min of closed neighborhood (strictly decreasing
      // pointer unless already the local minimum)
      val sym = edges.unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      val lbl1 = sym.groupBy("a").agg(min(col("b")).as("m"))
        .select(col("a").as("node"), least(col("a"), col("m")).as("lbl"))
      // one pointer jump (lbl ∘ lbl): pointers stay within the component
      // and strictly decrease, and a path now halves per round (O(log n)
      // rounds) instead of shedding one edge per round. Every lbl value
      // is itself an edge endpoint, so the inner self-join is total.
      val hop = lbl1.select(col("node").as("pnode"), col("lbl").as("plbl"))
      val lbl = lbl1.join(hop, col("lbl") === col("pnode"))
        .select(col("node"), col("plbl").as("lbl"))
        .localCheckpoint()
      // compose into the id -> component mapping (components with no
      // remaining edges keep their representative)
      mapping = mapping
        .join(lbl.select(col("node").as("component"), col("lbl")),
          Seq("component"), "left")
        .select(col("id"), coalesce(col("lbl"), col("component")).as("component"))
        .localCheckpoint()
      // contract: rewrite endpoints through the pointers, drop self-loops
      edges = edges
        .join(lbl.select(col("node").as("a"), col("lbl").as("la")), "a")
        .join(lbl.select(col("node").as("b"), col("lbl").as("lb")), "b")
        .select(col("la").as("a"), col("lb").as("b"))
        .where(col("a") =!= col("b"))
        .distinct()
        .localCheckpoint()
      nEdges = edges.count()
      it += 1
    }
    require(nEdges == 0, s"connectedComponents: no convergence in $maxIters rounds")
    mapping
  }
}
