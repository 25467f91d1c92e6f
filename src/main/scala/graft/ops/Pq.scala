package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.functions.Distances

/**
 * Product quantization — the memory-bounded ANN scale path. A 100 TB
 * vector corpus cannot keep raw float vectors hot (128-dim float32 =
 * 512 B/vector); PQ stores one byte per subspace (16 B/vector at m=16,
 * a 32x reduction), scans codes with per-query ADC lookup tables, and
 * re-ranks a shortlist against the raw vectors it fetches for only
 * k' << n candidates (Jegou, Douze, Schmid: "Product Quantization for
 * Nearest Neighbor Search", TPAMI 2011 — asymmetric distance
 * computation, §IV; the reference engine keeps raw vectors in native
 * stores, e.g. plugin/vectorbackend hnswlib float storage, so
 * compressed-domain scan is an extension beyond reference parity).
 *
 * Spark shape: the model (m subspace codebooks, 256 codewords each) is a
 * broadcast value; encoding is a map; search is a per-partition tight
 * loop over the code column with bounded (dist, id) heaps — only k rows
 * per (query, input partition) reach the shuffle, identical dataflow to
 * [[Ann.bruteForce]]. Nothing driver-side scales with the corpus.
 *
 * Determinism contract (what the DuckDB gate replays): codebooks and
 * codes are seeded and deterministic, materialized as aux parquet; the
 * ADC distance is per-subspace sequential-double L2 (the [[Distances.l2]]
 * kernel restricted to the subspace slice) accumulated across subspaces
 * in subspace order — both levels are plain left folds, so
 * `list_sum(list(subdist ORDER BY sub))` in SQL reproduces them
 * bit-for-bit.
 */
object Pq {

  /** m per-subspace codebooks: codebooks(sub)(code) is a subDim-length
   * centroid. dim = numSub * subDim; codes fit a byte when
   * codesPerSub <= 256 (stored as INT for parquet/SQL friendliness). */
  final case class PqModel(
      subDim: Int,
      codebooks: Array[Array[Array[Float]]]) extends Serializable {
    def numSub: Int = codebooks.length
    def codesPerSub: Int = codebooks(0).length
    def dim: Int = numSub * subDim

    /** Squared-L2 from the query's sub-slice [sub*subDim, ...) to a
     * codeword — the oracle's per-subspace list_zip sum, sequential
     * double over the slice. */
    @inline private[Pq] def subDist(q: Array[Float], sub: Int,
        cw: Array[Float]): Double = {
      val off = sub * subDim
      var acc = 0.0
      var j = 0
      while (j < subDim) {
        val d = q(off + j).toDouble - cw(j).toDouble
        acc += d * d
        j += 1
      }
      acc
    }

    /** Nearest codeword per subspace (ties -> lower code; strict `<`
     * keeps the first/lowest, so encoding is order-deterministic). */
    def encode(v: Array[Float]): Array[Int] = {
      require(v.length == dim, s"dim ${v.length} != model dim $dim")
      val out = new Array[Int](numSub)
      var sub = 0
      while (sub < numSub) {
        val cb = codebooks(sub)
        var best = 0
        var bd = Double.MaxValue
        var c = 0
        while (c < cb.length) {
          val d = subDist(v, sub, cb(c))
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        out(sub) = best
        sub += 1
      }
      out
    }

    /** ADC lookup table for one query: table(sub)(code) = squared-L2
     * from the query sub-slice to that codeword. Built once per query
     * per partition; a code scan then costs numSub adds per vector. */
    def adcTable(q: Array[Float]): Array[Array[Double]] = {
      require(q.length == dim, s"dim ${q.length} != model dim $dim")
      Array.tabulate(numSub)(sub =>
        Array.tabulate(codesPerSub)(c => subDist(q, sub, codebooks(sub)(c))))
    }

    /** ADC distance: left fold of the per-subspace entries in subspace
     * order (bit-equal to the oracle's ordered list_sum). */
    def adcDistance(table: Array[Array[Double]], codes: Array[Int]): Double = {
      var acc = 0.0
      var sub = 0
      while (sub < codes.length) { acc += table(sub)(codes(sub)); sub += 1 }
      acc
    }

    /** Reconstruction (decode): concatenated codeword slices. */
    def decode(codes: Array[Int]): Array[Float] = {
      val out = new Array[Float](dim)
      var sub = 0
      while (sub < numSub) {
        System.arraycopy(codebooks(sub)(codes(sub)), 0, out, sub * subDim, subDim)
        sub += 1
      }
      out
    }
  }

  /** Seeded per-subspace Lloyd's with k-means++ init (same algorithm as
   * [[graft.partitioners.KMeansPartitioner.fit]], run independently on
   * each subspace slice). Empty cells keep their init codeword —
   * harmless duplicates, never nondeterminism. */
  def fit(
      sample: Array[Array[Float]],
      numSub: Int,
      codesPerSub: Int = 256,
      iterations: Int = 8,
      seed: Long = 42L): PqModel = {
    require(sample.nonEmpty, "empty PQ training sample")
    val dim = sample(0).length
    require(dim % numSub == 0, s"dim $dim not divisible by numSub $numSub")
    val subDim = dim / numSub
    val k = math.min(codesPerSub, sample.length)
    val codebooks = Array.tabulate(numSub) { sub =>
      val off = sub * subDim
      val slice = sample.map(v => java.util.Arrays.copyOfRange(v, off, off + subDim))
      val rnd = new scala.util.Random(seed ^ (sub.toLong * 0x9E3779B97F4A7C15L))
      val cents = new Array[Array[Float]](k)
      cents(0) = slice(rnd.nextInt(slice.length)).clone()
      var c = 1
      while (c < k) {
        val d2 = slice.map { v =>
          var best = Double.MaxValue
          var i = 0
          while (i < c) {
            val d = Distances.l2Fast(cents(i), v)
            if (d < best) best = d
            i += 1
          }
          best
        }
        val total = d2.sum
        var r = rnd.nextDouble() * total
        var idx = 0
        while (idx < slice.length - 1 && r > d2(idx)) { r -= d2(idx); idx += 1 }
        cents(c) = slice(idx).clone()
        c += 1
      }
      var iter = 0
      while (iter < iterations) {
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Int](k)
        slice.foreach { v =>
          var best = 0; var bd = Double.MaxValue
          var i = 0
          while (i < k) {
            val d = Distances.l2Fast(cents(i), v)
            if (d < bd) { bd = d; best = i }
            i += 1
          }
          counts(best) += 1
          var j = 0
          while (j < subDim) { sums(best)(j) += v(j); j += 1 }
        }
        var i = 0
        while (i < k) {
          if (counts(i) > 0)
            cents(i) = Array.tabulate(subDim)(j => (sums(i)(j) / counts(i)).toFloat)
          i += 1
        }
        iter += 1
      }
      cents
    }
    PqModel(subDim, codebooks)
  }

  /** Encode a corpus: (id, vec) -> (id, codes ARRAY<INT>). */
  def encodeDf(vectors: DataFrame, model: PqModel): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bm = spark.sparkContext.broadcast(model)
    vectors.select(col("id"), col("vec"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, bm.value.encode(v)) }
      .toDF("id", "codes")
  }

  /** Compressed-domain exact-ADC kNN: broadcast query block x partitioned
   * code column, per-partition ADC tables + bounded (dist, id) max-heaps,
   * global top-k list merge. Distances are the quantized approximation;
   * see [[searchReranked]] for the recall-restoring second stage.
   *
   * @param codes   (id LONG, codes ARRAY<INT>) from [[encodeDf]]
   * @param queries (qid LONG, qv ARRAY<FLOAT>)
   * @return (qid, rn, id, dist) — rn 1..k ascending (dist, id)
   */
  def search(codes: DataFrame, queries: DataFrame, model: PqModel,
      k: Int): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val qArr = queries.select(col("qid"), col("qv"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bq = spark.sparkContext.broadcast(qArr)
    val bm = spark.sparkContext.broadcast(model)

    val partials = codes.select(col("id"), col("codes"))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        val m = bm.value
        val qs = bq.value
        val nq = qs.length
        if (!it.hasNext || nq == 0) Iterator.empty
        else {
          val tables = qs.map(q => m.adcTable(q._2))
          val heaps = Array.fill(nq)(new graft.functions.BoundedTopK(k))
          while (it.hasNext) {
            val (id, cs) = it.next()
            var qi = 0
            while (qi < nq) {
              heaps(qi).offer(m.adcDistance(tables(qi), cs), id)
              qi += 1
            }
          }
          Iterator.range(0, nq).flatMap { qi =>
            val (ids, ds) = heaps(qi).drainSorted()
            if (ids.isEmpty) Iterator.empty
            else Iterator.single(Ann.PartialList(qs(qi)._1, ids, ds))
          }
        }
      }
    Ann.mergePartialLists(partials.toDF(), k)
  }

  /** Two-stage PQ search: ADC shortlist of `shortlist` candidates in the
   * compressed domain, then exact re-rank of only those ids against the
   * raw vectors (the standard IVFADC+R refinement — raw-vector IO is
   * k' rows per query instead of the whole corpus).
   *
   * @param vectors (id LONG, vec ARRAY<FLOAT>) — raw corpus, joined only
   *                for shortlisted ids
   */
  def searchReranked(codes: DataFrame, vectors: DataFrame, queries: DataFrame,
      model: PqModel, k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    rerankExact(search(codes, queries, model, shortlist), vectors, queries, k)
  }

  /** Exact-L2 re-rank of a (qid, id) shortlist against the raw vectors —
   * the +R stage shared by flat-PQ and IVF-PQ search. */
  def rerankExact(shortlist: DataFrame, vectors: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    val exact = shortlist.select("qid", "id")
      .join(vectors.select(col("id"), col("vec")), "id")
      .join(broadcast(queries.select(col("qid"), col("qv"))), "qid")
      .select(col("qid"), col("id"), Distances.l2(col("qv"), col("vec")).as("dist"))
    val topkUdaf = udaf(new graft.functions.TopKAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    exact.groupBy("qid").agg(topkUdaf(col("id"), col("dist")).as("topk"))
      .select(col("qid"), posexplode(arrays_zip(col("topk.ids").as("id"),
        col("topk.dists").as("dist"))))
      .select(col("qid"), (col("pos") + 1).as("rn"),
        col("col.id").as("id"), col("col.dist").as("dist"))
  }

  /** IVF-PQ: the ADC scan restricted to routed cells — the composition a
   * 100 TB ANN deployment actually runs (Jegou et al. §V, IVFADC): a
   * coarse quantizer (here [[graft.partitioners.KMeansPartitioner]])
   * assigns every code row to a cell, queries probe their nearest cells,
   * and the compressed-domain scan touches only probed cells instead of
   * the full corpus. Spark shape: cogroup on cell id — per cell, one ADC
   * table per probing query, bounded (dist, id) heaps over the cell's
   * code rows, k rows per (query, cell) to the shuffle, global list
   * merge. Nothing driver-side; the cell fan-out IS the cluster fan-out.
   *
   * @param routedCodes   (pid INT, id LONG, codes ARRAY<INT>)
   * @param routedQueries (pid INT, qid LONG, qv ARRAY<FLOAT>)
   */
  def searchRoutedAdc(routedCodes: DataFrame, routedQueries: DataFrame,
      model: PqModel, k: Int): DataFrame = {
    val spark = routedCodes.sparkSession
    import spark.implicits._
    val bm = spark.sparkContext.broadcast(model)
    val partials = routedCodes.select(col("pid"), col("id"), col("codes"))
      .as[(Int, Long, Array[Int])]
      .groupByKey(_._1)
      .cogroup(routedQueries.select(col("pid"), col("qid"), col("qv"))
        .as[(Int, Long, Array[Float])].groupByKey(_._1)) { (_, dataIt, queryIt) =>
        val qs = queryIt.toArray.sortBy(_._2)
        if (qs.isEmpty || !dataIt.hasNext) Iterator.empty
        else {
          val m = bm.value
          val nq = qs.length
          val tables = qs.map(q => m.adcTable(q._3))
          val heaps = Array.fill(nq)(new graft.functions.BoundedTopK(k))
          dataIt.foreach { case (_, id, cs) =>
            var qi = 0
            while (qi < nq) {
              heaps(qi).offer(m.adcDistance(tables(qi), cs), id)
              qi += 1
            }
          }
          Iterator.range(0, nq).flatMap { qi =>
            val (ids, ds) = heaps(qi).drainSorted()
            if (ids.isEmpty) Iterator.empty
            else Iterator.single(Ann.PartialList(qs(qi)._2, ids, ds))
          }
        }
      }
    Ann.mergePartialLists(partials.toDF(), k)
  }
}
