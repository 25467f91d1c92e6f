package graft.partitioners

import java.util.Random
import graft.functions.{HotTracer, L2HashFamily, Sax, SpaceFillingCurve}

/**
 * The reference's partitioner family (SURVEY §2.2, reference
 * partitioner package) re-expressed as small, broadcastable, immutable
 * routing models: `dataPartitions` fans an insert/delete out to the
 * partitions that must hold it, `queryPartitions` fans a query out to the
 * partitions that might hold its neighbors.
 *
 * Contract shared by all models (reference PartitionFunction.java):
 *  - value-less deletions route to ALL partitions
 *    (SimplePartitionFunction.java:42-48);
 *  - query fan-out must cover every partition its matching vectors were
 *    routed to (recall requires dataPartitions(v) subset-of union of
 *    queryPartitions over fresh history).
 *
 * Adaptive models (LSH+SFC, Odyssey, KMeans, SFC) are *fitted* driver-side
 * on a bounded sample (the reference runs these operators at
 * parallelism 1 with windowed state — same centralization, but we bound
 * the sample and broadcast the resulting model so routing itself is
 * embarrassingly parallel).
 */
/** Time-aware routing contract: models whose routing can depend on event
 * time (P5's adaptive range history routes an insert by the range version
 * in effect at its timestamp and fans a query over all still-fresh
 * versions). Static models ignore the time arguments. */
trait TemporalPartitionerModel extends Serializable {
  def numPartitions: Int
  def dataPartitions(vec: Array[Float], id: Long, ts: Long): Array[Int]
  def queryPartitions(vec: Array[Float], qtime: Long, ttl: Long): Array[Int]
  /** Routing for a deletion without a vector payload: everywhere. */
  def deleteAllPartitions: Array[Int] = Array.range(0, numPartitions)
  /** Routing for a deletion that carries its vector: every partition the
   * id's insert may have been routed to within the retention window
   * (static models: same as data routing). */
  def deleteDataPartitions(vec: Array[Float], id: Long, ts: Long,
      maxTtl: Long): Array[Int] = dataPartitions(vec, id, ts)
}

trait PartitionerModel extends TemporalPartitionerModel {
  def dataPartitions(vec: Array[Float], id: Long): Array[Int]
  def queryPartitions(vec: Array[Float]): Array[Int]
  final override def dataPartitions(vec: Array[Float], id: Long, ts: Long): Array[Int] =
    dataPartitions(vec, id)
  final override def queryPartitions(vec: Array[Float], qtime: Long, ttl: Long): Array[Int] =
    queryPartitions(vec)
}

/** P1 `simple`: hash(id) % n for data; queries broadcast to all
 * (reference SimplePartitionFunction.java:30-66). */
final case class SimplePartitioner(numPartitions: Int) extends PartitionerModel {
  override def dataPartitions(vec: Array[Float], id: Long): Array[Int] =
    Array(java.lang.Math.floorMod(java.lang.Long.hashCode(id), numPartitions))
  override def queryPartitions(vec: Array[Float]): Array[Int] =
    Array.range(0, numPartitions)
}

/** P2 `lsh`: k1 independent LSH families; element routes to the union of
 * floorMod(hash-vector's hashCode, n) over families
 * (reference LSHPartitionFunction.java:110-165). */
final case class LshPartitioner(
    numPartitions: Int, families: Array[L2HashFamily]) extends PartitionerModel {
  protected def buckets(vec: Array[Float]): Array[Int] = {
    val set = new java.util.LinkedHashSet[Integer]()
    families.foreach { f => set.add(L2HashFamily.nodeId(f.hash(vec), numPartitions)) }
    val out = new Array[Int](set.size())
    val it = set.iterator(); var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
  override def dataPartitions(vec: Array[Float], id: Long): Array[Int] = buckets(vec)
  override def queryPartitions(vec: Array[Float]): Array[Int] = buckets(vec)
}

object LshPartitioner {
  def seeded(numPartitions: Int, dim: Int, numFamilies: Int, numHashes: Int,
      width: Float, seed: Long): LshPartitioner = {
    val parent = new Random(seed)
    LshPartitioner(numPartitions,
      Array.fill(numFamilies)(L2HashFamily(dim, numHashes, width, parent)))
  }
}

/** P3 `lsh+random`: query fan-out = LSH partitions plus n/3 seeded random
 * extras for recall (reference LSHAndRandomPartitionFunction.java:143-173).
 * The extras are drawn deterministically from the query vector so routing
 * is reproducible (the reference draws from a shared Random — wall-clock
 * dependent; determinism is strictly more testable). */
final case class LshRandomPartitioner(base: LshPartitioner, extraSeed: Long)
    extends PartitionerModel {
  override def numPartitions: Int = base.numPartitions
  override def dataPartitions(vec: Array[Float], id: Long): Array[Int] =
    base.dataPartitions(vec, id)
  override def queryPartitions(vec: Array[Float]): Array[Int] = {
    val set = new java.util.LinkedHashSet[Integer]()
    base.queryPartitions(vec).foreach(set.add(_))
    val r = new Random(extraSeed ^ java.util.Arrays.hashCode(vec))
    val extras = numPartitions / 3
    var i = 0
    while (i < extras) { set.add(r.nextInt(numPartitions)); i += 1 }
    val out = new Array[Int](set.size())
    val it = set.iterator(); var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }
}

/** P4 `lsh+proximity`: queries probe the hash-cube neighborhood — every
 * hash vector within +-proximity per component
 * (reference LSHProximityPartitionFunction.java:98-223). Fan-out is
 * (2p+1)^numHashes per family, so keep numHashes*proximity small. */
final case class LshProximityPartitioner(
    numPartitions: Int, families: Array[L2HashFamily], proximity: Int)
    extends PartitionerModel {
  override def dataPartitions(vec: Array[Float], id: Long): Array[Int] = {
    val set = new java.util.LinkedHashSet[Integer]()
    families.foreach { f => set.add(L2HashFamily.nodeId(f.hash(vec), numPartitions)) }
    set.toArray(Array.empty[Integer]).map(_.intValue())
  }
  override def queryPartitions(vec: Array[Float]): Array[Int] = {
    val set = new java.util.LinkedHashSet[Integer]()
    families.foreach { f =>
      val h = f.hash(vec)
      def enumerate(i: Int, cur: Array[Int]): Unit =
        if (i == h.length) set.add(L2HashFamily.nodeId(cur, numPartitions))
        else {
          var d = -proximity
          while (d <= proximity) {
            cur(i) = h(i) + d
            enumerate(i + 1, cur)
            d += 1
          }
        }
      enumerate(0, new Array[Int](h.length))
    }
    set.toArray(Array.empty[Integer]).map(_.intValue())
  }
}

/** P5 `lsh+hilbert|zorder|gray|peano` — the VStream-paper partitioner:
 * per family, LSH-hash the vector, normalize each hash component by the
 * observed min/max, map onto a 2^bits grid, take the space-filling-curve
 * index, and binary-search learned equi-depth boundaries ("heads") for the
 * partition (reference LSHWithSpaceFillingPartitionFunction.java:105-238 +
 * lsh/LSHashSpaceFillingPartitioner.java:12-356). Boundaries are learned
 * from a sample (equi-depth over curve values) by [[LshSfcPartitioner.fit]].
 */
final case class LshSfcFamilyModel(
    family: L2HashFamily,
    mins: Array[Int], maxs: Array[Int],
    heads: Array[BigInt], // ascending curve-value boundaries, length numPartitions-1
    curve: SpaceFillingCurve)

final case class LshSfcPartitioner(
    numPartitions: Int, models: Array[LshSfcFamilyModel], bits: Int)
    extends PartitionerModel {

  private def gridCoord(h: Int, min: Int, max: Int): Long = {
    val range = math.max(1, max - min)
    val clamped = math.min(math.max(h, min), max)
    val g = ((clamped - min).toDouble / range * ((1 << bits) - 1)).toLong
    g
  }

  def partitionFor(m: LshSfcFamilyModel, vec: Array[Float]): Int = {
    val h = m.family.hash(vec)
    val coords = new Array[Long](h.length)
    var i = 0
    while (i < h.length) { coords(i) = gridCoord(h(i), m.mins(i), m.maxs(i)); i += 1 }
    val cv = m.curve.index(coords)
    // binary search: number of heads <= cv
    var lo = 0; var hi = m.heads.length
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (m.heads(mid) <= cv) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def all(vec: Array[Float]): Array[Int] = {
    val set = new java.util.LinkedHashSet[Integer]()
    models.foreach(m => set.add(partitionFor(m, vec)))
    set.toArray(Array.empty[Integer]).map(_.intValue())
  }
  override def dataPartitions(vec: Array[Float], id: Long): Array[Int] = all(vec)
  override def queryPartitions(vec: Array[Float]): Array[Int] = all(vec)
}

object LshSfcPartitioner {
  private def gridCoord(h: Int, min: Int, max: Int, bits: Int): Long = {
    val range = math.max(1, max - min)
    val clamped = math.min(math.max(h, min), max)
    ((clamped - min).toDouble / range * ((1 << bits) - 1)).toLong
  }

  /** Learn one family's re-learnable range model — hash min/max plus
   * equi-depth curve-value boundaries — from a sample. The hash family
   * itself is fixed for the partitioner's lifetime (reference: range
   * update in LSHashSpaceFillingPartitioner.java:179-202 re-learns only
   * ranges, never hash functions). */
  private[partitioners] def learn(fam: L2HashFamily, curve: SpaceFillingCurve,
      sample: Array[Array[Float]], numPartitions: Int, numHashes: Int,
      bits: Int): LshSfcFamilyModel = {
    val hashes = sample.map(fam.hash)
    val mins = Array.tabulate(numHashes)(i => hashes.map(_(i)).min)
    val maxs = Array.tabulate(numHashes)(i => hashes.map(_(i)).max)
    val curveValues = hashes.map { h =>
      curve.index(Array.tabulate(numHashes)(i =>
        gridCoord(h(i), mins(i), maxs(i), bits)))
    }.sorted
    val heads = Array.tabulate(numPartitions - 1) { p =>
      curveValues(((p + 1).toLong * curveValues.length / numPartitions).toInt
        .min(curveValues.length - 1))
    }
    LshSfcFamilyModel(fam, mins, maxs, heads, curve)
  }

  /** Equi-depth fit over a sample of vectors: learn per-family hash
   * min/max and curve-value boundaries so partitions get equal counts. */
  def fit(sample: Array[Array[Float]], numPartitions: Int, dim: Int,
      numFamilies: Int, numHashes: Int, width: Float, bits: Int,
      curveName: String, seed: Long): LshSfcPartitioner = {
    val parent = new Random(seed)
    val families = Array.fill(numFamilies)(L2HashFamily(dim, numHashes, width, parent))
    val curve = SpaceFillingCurve(curveName, numHashes, bits)
    LshSfcPartitioner(numPartitions,
      families.map(learn(_, curve, sample, numPartitions, numHashes, bits)), bits)
  }

  /** Re-learn every family's ranges/boundaries from a fresh sample,
   * keeping the hash families (so a vector's hash is stable across range
   * versions — the property P5's history fan-out relies on). */
  def refit(existing: LshSfcPartitioner, sample: Array[Array[Float]]): LshSfcPartitioner =
    existing.copy(models = existing.models.map(m =>
      learn(m.family, m.curve, sample, existing.numPartitions, m.mins.length,
        existing.bits)))
}

/** P6 `odyssey`: SAX-word replication groups with hot/skew randomization
 * (reference OdysseyPartitionFunction.java:36-204). Data goes to every
 * worker of its word's group (replication factor = group size); queries
 * probe one deterministic worker per group. Hot words (top-lambda in the
 * fit sample) spread across groups by a secondary hash. */
final case class OdysseyPartitioner(
    numPartitions: Int, replicationFactor: Int, sax: Sax,
    hotWords: Set[Long]) extends PartitionerModel {
  private val numGroups = math.max(1, numPartitions / replicationFactor)
  private def groupOf(word: Long): Int =
    if (hotWords.contains(word))
      java.lang.Math.floorMod(java.lang.Long.hashCode(word * 0x9E3779B97F4A7C15L),
        numGroups)
    else java.lang.Math.floorMod(word.toInt, numGroups)
  private def workers(group: Int): Array[Int] =
    Array.tabulate(replicationFactor)(r => (group * replicationFactor + r) % numPartitions)

  override def dataPartitions(vec: Array[Float], id: Long): Array[Int] =
    workers(groupOf(sax.encode(vec).toLong))
  override def queryPartitions(vec: Array[Float]): Array[Int] = {
    val word = sax.encode(vec).toLong
    // one worker per group, chosen by the query's word (deterministic
    // stand-in for the reference's round-robin)
    Array.tabulate(numGroups) { g =>
      (g * replicationFactor +
        java.lang.Math.floorMod(word.toInt, replicationFactor)) % numPartitions
    }
  }
}

object OdysseyPartitioner {
  def fit(sample: Array[Array[Float]], numPartitions: Int, replicationFactor: Int,
      paaSize: Int, width: Int, lambda: Int): OdysseyPartitioner = {
    val sax = Sax(paaSize, width, 0.01)
    val tracer = new HotTracer(math.max(1, sample.length), lambda)
    sample.foreach(v => tracer.offer(sax.encode(v).toLong))
    OdysseyPartitioner(numPartitions, replicationFactor, sax, tracer.hotWords)
  }
}

/** P7 `kmeans`: route to the replicationFactor nearest centroids
 * (reference KMeansPartitionFunction.java:66-125; we run full-dimension
 * Lloyd's — the reference's smile wrapper truncates distance to the first
 * 10 dims, NKMeans.java:40-49, an artifact not worth reproducing). */
final case class KMeansPartitioner(
    centroids: Array[Array[Float]], replicationFactor: Int,
    queryProbes: Int) extends PartitionerModel {
  override def numPartitions: Int = centroids.length
  private def nearest(vec: Array[Float], r: Int): Array[Int] = {
    // allocation-free bounded selection — this runs once per routed row;
    // the fast kernel is safe: routing is self-consistent (the oracle
    // replays materialized routing, never recomputes it)
    val k = centroids.length
    val outI = new Array[Int](r)
    val outD = new Array[Double](r)
    var m = 0
    var i = 0
    while (i < k) {
      val d = graft.functions.Distances.l2Fast(centroids(i), vec)
      if (m < r || d < outD(m - 1) || (d == outD(m - 1) && i < outI(m - 1))) {
        var pos = if (m < r) m else r - 1
        while (pos > 0 && (outD(pos - 1) > d ||
            (outD(pos - 1) == d && outI(pos - 1) > i))) {
          outD(pos) = outD(pos - 1); outI(pos) = outI(pos - 1); pos -= 1
        }
        outD(pos) = d; outI(pos) = i
        if (m < r) m += 1
      }
      i += 1
    }
    if (m == r) outI else java.util.Arrays.copyOf(outI, m)
  }
  override def dataPartitions(vec: Array[Float], id: Long): Array[Int] =
    nearest(vec, replicationFactor)
  /** IVF semantics: probe the queryProbes nearest cells. */
  override def queryPartitions(vec: Array[Float]): Array[Int] =
    nearest(vec, queryProbes)
}

object KMeansPartitioner {
  import graft.functions.Distances

  /** Seeded Lloyd's with k-means++ init on a sample. */
  def fit(sample: Array[Array[Float]], k: Int, replicationFactor: Int,
      iterations: Int = 10, seed: Long = 42L,
      queryProbes: Int = -1): KMeansPartitioner = {
    require(sample.nonEmpty)
    val rnd = new Random(seed)
    val dim = sample(0).length
    val centroids = new Array[Array[Float]](k)
    centroids(0) = sample(rnd.nextInt(sample.length)).clone()
    var c = 1
    while (c < k) {
      // k-means++: sample proportional to squared distance to nearest centroid
      val d2 = sample.map { v =>
        var best = Double.MaxValue
        var i = 0
        while (i < c) { val d = Distances.l2Fast(centroids(i), v); if (d < best) best = d; i += 1 }
        best
      }
      val total = d2.sum
      var r = rnd.nextDouble() * total
      var idx = 0
      while (idx < sample.length - 1 && r > d2(idx)) { r -= d2(idx); idx += 1 }
      centroids(c) = sample(idx).clone()
      c += 1
    }
    var iter = 0
    while (iter < iterations) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bd = Double.MaxValue
        var i = 0
        while (i < k) { val d = Distances.l2Fast(centroids(i), v); if (d < bd) { bd = d; best = i }; i += 1 }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      var i = 0
      while (i < k) {
        if (counts(i) > 0) {
          centroids(i) = Array.tabulate(dim)(j => (sums(i)(j) / counts(i)).toFloat)
        }
        i += 1
      }
      iter += 1
    }
    KMeansPartitioner(centroids, replicationFactor,
      if (queryProbes > 0) queryProbes else replicationFactor)
  }
}

/** Skew salting over any base partitioner: a base partition with more
 * than its fair share of vectors is split into `splits(p)` sub-partitions
 * by id hash; queries probe every sub-partition of each probed base
 * partition, so routing semantics (and recall) are unchanged while the
 * per-task index build is bounded — the vector-engine analog of AQE skew
 * salting. */
final case class SaltedPartitioner(base: PartitionerModel, splits: Array[Int])
    extends PartitionerModel {
  private val offsets: Array[Int] = splits.scanLeft(0)(_ + _)
  override def numPartitions: Int = offsets.last
  @inline private def salt(id: Long, c: Int): Int =
    offsets(c) + java.lang.Math.floorMod(java.lang.Long.hashCode(id * 0x9E3779B97F4A7C15L), splits(c))
  override def dataPartitions(vec: Array[Float], id: Long): Array[Int] =
    base.dataPartitions(vec, id).map(c => salt(id, c))
  override def queryPartitions(vec: Array[Float]): Array[Int] =
    base.queryPartitions(vec).flatMap(c =>
      Array.range(offsets(c), offsets(c) + splits(c)))
}

object SaltedPartitioner {
  /** Derive split factors from a sample routed through the base model so
   * no sub-partition expects more than `targetPerPartition` of the
   * `totalCount`-row corpus. */
  def fromSample(base: PartitionerModel, sample: Array[Array[Float]],
      totalCount: Long, targetPerPartition: Long): SaltedPartitioner = {
    val counts = new Array[Long](base.numPartitions)
    sample.zipWithIndex.foreach { case (v, i) =>
      base.dataPartitions(v, i.toLong).foreach(counts(_) += 1)
    }
    val scale = totalCount.toDouble / math.max(1, sample.length)
    val splits = counts.map { c =>
      math.max(1, math.ceil(c * scale / targetPerPartition).toInt)
    }
    SaltedPartitioner(base, splits)
  }
}

/** P8 `hilbert` (raw SFC, no LSH): clamp raw coordinates to [minValue,
 * maxValue], quantize to the grid, curve index, equi-depth heads
 * (reference SpaceFillingPartitionFunction.java:44-205). */
final case class SfcPartitioner(
    numPartitions: Int, minValue: Float, maxValue: Float, bits: Int,
    curve: SpaceFillingCurve, heads: Array[BigInt]) extends PartitionerModel {
  def curveIndex(vec: Array[Float]): BigInt = {
    val coords = vec.map { x =>
      val clamped = math.min(math.max(x, minValue), maxValue)
      ((clamped - minValue).toDouble / (maxValue - minValue) * ((1 << bits) - 1)).toLong
    }
    curve.index(coords)
  }
  private def p(vec: Array[Float]): Array[Int] = {
    val cv = curveIndex(vec)
    var lo = 0; var hi = heads.length
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (heads(mid) <= cv) lo = mid + 1 else hi = mid
    }
    Array(lo)
  }
  override def dataPartitions(vec: Array[Float], id: Long): Array[Int] = p(vec)
  override def queryPartitions(vec: Array[Float]): Array[Int] = p(vec)
}

object SfcPartitioner {
  def fit(sample: Array[Array[Float]], numPartitions: Int, minValue: Float,
      maxValue: Float, bits: Int, curveName: String): SfcPartitioner = {
    require(sample.nonEmpty)
    val curve = SpaceFillingCurve(curveName, sample(0).length, bits)
    val pre = SfcPartitioner(numPartitions, minValue, maxValue, bits, curve, Array.empty)
    val values = sample.map(pre.curveIndex).sorted
    val heads = Array.tabulate(numPartitions - 1) { p =>
      values(((p + 1).toLong * values.length / numPartitions).toInt.min(values.length - 1))
    }
    SfcPartitioner(numPartitions, minValue, maxValue, bits, curve, heads)
  }
}
