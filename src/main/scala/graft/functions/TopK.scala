package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded top-k merge with the reference's exact ordering contract:
 * ascending (distance, id) with ties broken by smaller id, and duplicate
 * ids (same vector found in several partitions) collapsed
 * (reference: data/result/SearchResult.java sort():55-72,
 * append()/dedup:106-114, merge combine():143-183).
 */
object TopK {

  /** Merge two (dist,id)-ascending lists into one, keep k, drop duplicate ids.
   * Inputs must already be sorted by (dist, id). */
  def merge(
      ids1: Array[Long], d1: Array[Double],
      ids2: Array[Long], d2: Array[Double],
      k: Int): (Array[Long], Array[Double]) = {
    val outIds = new Array[Long](k)
    val outD = new Array[Double](k)
    val seen = new java.util.HashSet[Long](k * 2)
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < ids1.length || j < ids2.length)) {
      val take1 =
        if (j >= ids2.length) true
        else if (i >= ids1.length) false
        else d1(i) < d2(j) || (d1(i) == d2(j) && ids1(i) <= ids2(j))
      val (id, d) = if (take1) { val r = (ids1(i), d1(i)); i += 1; r }
                    else { val r = (ids2(j), d2(j)); j += 1; r }
      if (seen.add(id)) { outIds(n) = id; outD(n) = d; n += 1 }
    }
    (java.util.Arrays.copyOf(outIds, n), java.util.Arrays.copyOf(outD, n))
  }

  /** Sort parallel (id, dist) arrays by (dist asc, id asc) — the canonical
   * result order (SearchResult.sort). */
  def sorted(ids: Array[Long], dists: Array[Double]): (Array[Long], Array[Double]) = {
    val idx = ids.indices.toArray.sortBy(i => (dists(i), ids(i)))
    (idx.map(ids), idx.map(dists))
  }
}

/** Allocation-free bounded (dist, id) max-heap: root = current worst
 * entry, replaced when a strictly better (smaller (dist, id)) pair
 * arrives — the per-(query, partition) scan kernel shared by
 * [[graft.ops.Ann.bruteForce]], the cold-tier wave scan and the PQ/SQ
 * code scans. NOT thread-safe; one instance per (query, task).
 *
 * DEDUPS BY ID (keep the best entry per id — the keyed-result contract
 * every downstream merge already applies, reference
 * SearchResult.java:106-114): without it, duplicate ids inside ONE
 * partition occupy several of the k slots and starve the global
 * dedup-merge of distinct candidates, so the "exact" answer becomes
 * LAYOUT-dependent — the r14 probe caught an attr-aligned tier (which
 * concentrates every copy of an id into one segment) returning the
 * 12th-distinct id where the mixed layout returned the 10th, on a
 * corpus whose source rows carry duplicate keys. The duplicate scan is
 * O(k) but runs only for candidates already inside the admission bound
 * (a ~k·ln(n)/n fraction of a random-order scan). */
final class BoundedTopK(k: Int) {
  private val hd = new Array[Double](k)
  private val hi = new Array[Long](k)
  private var n = 0

  @inline private def worse(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    d1 > d2 || (d1 == d2 && i1 > i2)

  /** Restore the max-heap below `start` after its key DECREASED (a
   * duplicate id arrived with a smaller distance): parents only ever
   * got better, so only the downward property can break. */
  private def siftDown(start: Int): Unit = {
    var c = start
    var done = false
    while (!done) {
      val l = 2 * c + 1; val r = l + 1
      var m = c
      if (l < n && worse(hd(l), hi(l), hd(m), hi(m))) m = l
      if (r < n && worse(hd(r), hi(r), hd(m), hi(m))) m = r
      if (m == c) done = true
      else {
        val td = hd(c); hd(c) = hd(m); hd(m) = td
        val ti = hi(c); hi(c) = hi(m); hi(m) = ti
        c = m
      }
    }
  }

  def offer(d: Double, id: Long): Unit = {
    // cheap reject first: worse than the current bound can neither
    // enter nor improve an in-heap copy (the root IS the worst entry,
    // so any in-heap copy of `id` is already better than this one)
    if (n == k && worse(d, id, hd(0), hi(0))) return
    // dedup: keep the single best entry per id
    var j = 0
    while (j < n) {
      if (hi(j) == id) {
        if (hd(j) <= d) return // existing copy is better or equal
        hd(j) = d // better copy: decrease in place, restore downward
        siftDown(j)
        return
      }
      j += 1
    }
    if (n < k) {
      var c = n; hd(c) = d; hi(c) = id; n = c + 1
      while (c > 0 && worse(hd(c), hi(c), hd((c - 1) / 2), hi((c - 1) / 2))) {
        val p = (c - 1) / 2
        val td = hd(c); hd(c) = hd(p); hd(p) = td
        val ti = hi(c); hi(c) = hi(p); hi(p) = ti
        c = p
      }
    } else {
      hd(0) = d; hi(0) = id
      siftDown(0)
    }
  }

  /** Current admission bound: a candidate with dist STRICTLY above this
   * can never enter (equal-dist candidates must still be offered — ties
   * resolve on id). +Infinity until the heap holds k entries. */
  def bound: Double = if (n < k) Double.PositiveInfinity else hd(0)

  /** Contents as (dist, id)-ascending parallel arrays; the heap stays
   * valid (drain copies). */
  def drainSorted(): (Array[Long], Array[Double]) =
    TopK.sorted(java.util.Arrays.copyOf(hi, n), java.util.Arrays.copyOf(hd, n))

  def size: Int = n
}

/** Accumulated top-k state: parallel arrays sorted by (dist, id), length <= k. */
final case class TopKBuffer(ids: Array[Long], dists: Array[Double])

final case class TopKResult(ids: Array[Long], dists: Array[Double])

/** Typed two-phase aggregator: per-partition partial top-k + final merge —
 * Spark's partial/final aggregation gives the reference's
 * per-partition-search + kNN-merge (C1 + C3) shape for free. */
final class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), TopKBuffer, TopKResult] {

  override def zero: TopKBuffer = TopKBuffer(Array.empty, Array.empty)

  override def reduce(b: TopKBuffer, in: (Long, Double)): TopKBuffer = {
    val (id, dist) = in
    // dedup: the same id can arrive once per probed partition when storage
    // is replicated (LSH/odyssey fan-out); keep the single best entry
    var existing = -1
    var e = 0
    while (e < b.ids.length && existing < 0) { if (b.ids(e) == id) existing = e; e += 1 }
    val base =
      if (existing < 0) b
      else if (b.dists(existing) <= dist) return b
      else {
        val n0 = b.ids.length
        val ids2 = new Array[Long](n0 - 1)
        val ds2 = new Array[Double](n0 - 1)
        System.arraycopy(b.ids, 0, ids2, 0, existing)
        System.arraycopy(b.dists, 0, ds2, 0, existing)
        System.arraycopy(b.ids, existing + 1, ids2, existing, n0 - 1 - existing)
        System.arraycopy(b.dists, existing + 1, ds2, existing, n0 - 1 - existing)
        TopKBuffer(ids2, ds2)
      }
    val n = base.ids.length
    if (n >= k && (dist > base.dists(n - 1) ||
        (dist == base.dists(n - 1) && id > base.ids(n - 1)))) base
    else {
      // insertion position by (dist, id)
      var pos = 0
      while (pos < n && (base.dists(pos) < dist ||
          (base.dists(pos) == dist && base.ids(pos) < id))) pos += 1
      val m = math.min(n + 1, k)
      val ids = new Array[Long](m)
      val ds = new Array[Double](m)
      System.arraycopy(base.ids, 0, ids, 0, pos)
      System.arraycopy(base.dists, 0, ds, 0, pos)
      ids(pos) = id; ds(pos) = dist
      val tail = m - pos - 1
      if (tail > 0) {
        System.arraycopy(base.ids, pos, ids, pos + 1, tail)
        System.arraycopy(base.dists, pos, ds, pos + 1, tail)
      }
      TopKBuffer(ids, ds)
    }
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    val (ids, ds) = TopK.merge(a.ids, a.dists, b.ids, b.dists, k)
    TopKBuffer(ids, ds)
  }

  override def finish(b: TopKBuffer): TopKResult = TopKResult(b.ids, b.dists)

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[TopKResult] = Encoders.product[TopKResult]
}

/** Typed aggregator over whole partial top-k LISTS (the reference's
 * SearchResult.combine(): each input row is already a per-partition
 * (dist, id)-ascending top-k), so the global merge is a k-way sorted-list
 * merge per row instead of exploding every (id, dist) pair back into
 * single-element inputs. Input arrays MUST be (dist, id)-ascending —
 * every store/search path in this repo emits them that way. */
final class TopKListAggregator(k: Int)
    extends Aggregator[(Array[Long], Array[Double]), TopKBuffer, TopKResult] {

  override def zero: TopKBuffer = TopKBuffer(Array.empty, Array.empty)

  override def reduce(b: TopKBuffer, in: (Array[Long], Array[Double])): TopKBuffer = {
    val (ids, ds) = TopK.merge(b.ids, b.dists, in._1, in._2, k)
    TopKBuffer(ids, ds)
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    val (ids, ds) = TopK.merge(a.ids, a.dists, b.ids, b.dists, k)
    TopKBuffer(ids, ds)
  }

  override def finish(b: TopKBuffer): TopKResult = TopKResult(b.ids, b.dists)

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[TopKResult] = Encoders.product[TopKResult]
}
