package graft.store

import graft.functions.Distances
import graft.Metric

/**
 * In-JVM HNSW index with timestamps and versioned deletes — the hot-tier
 * store (reference semantics: plugin/vectorbackend/memtable/
 * hnsw_memtablerep.{h,cc} V1 — incremental graph build at insert time;
 * hnswalg.h markDelete:221-227 — deletes filter at search; per-item
 * (label, version, ts) with freshness filter hnswlib.h:135-146).
 *
 * Implementation follows the published HNSW algorithm (Malkov & Yashunin,
 * TPAMI 2018): exponential level draw (mL = 1/ln(M)), greedy descent on
 * upper layers, beam search (efConstruction / efSearch) on the lower
 * layers, neighbor lists pruned to M (2M at layer 0).
 *
 * Deterministic: level draws are seeded from (seed, insertion order), so
 * the same insert sequence builds the same graph on every executor.
 *
 * Single-threaded by design — one instance per partition per task.
 */
final class HnswStore(
    metric: Metric,
    m: Int = 16,
    efConstruction: Int = 128,
    efSearch: Int = 16,
    seed: Long = 42L) extends VectorStore {

  private val dist = Distances.forMetric(metric)
  private val maxM0 = 2 * m
  private val mL = 1.0 / math.log(m.toDouble)

  // element storage (internal index = insertion order)
  private val labels = new scala.collection.mutable.ArrayBuffer[Long]()
  private val tss = new scala.collection.mutable.ArrayBuffer[Long]()
  private val vecs = new scala.collection.mutable.ArrayBuffer[Array[Float]]()
  private val levels = new scala.collection.mutable.ArrayBuffer[Int]()
  // neighbors(layer)(node) = array of internal ids
  private val neighbors = new scala.collection.mutable.ArrayBuffer[
    scala.collection.mutable.ArrayBuffer[Array[Int]]]()
  private var entryPoint = -1
  private var maxLevel = -1
  private val rnd = new java.util.Random(seed)
  // label -> latest live internal id (versioned upsert; delete removes)
  private val latest = new java.util.HashMap[Long, Int]()

  override def size: Int = latest.size()

  private def levelFor(): Int = {
    val u = rnd.nextDouble()
    (-math.log(u) * mL).toInt
  }

  private final class Cand(val id: Int, val d: Double)
  private val byDistAsc = new java.util.Comparator[Cand] {
    def compare(a: Cand, b: Cand): Int = {
      val c = java.lang.Double.compare(a.d, b.d)
      if (c != 0) c else Integer.compare(a.id, b.id)
    }
  }
  private val byDistDesc = new java.util.Comparator[Cand] {
    def compare(a: Cand, b: Cand): Int = -byDistAsc.compare(a, b)
  }

  // visited-flag epoch array: one clear-free reset per search (hot path —
  // a HashSet here dominates build time with boxing/rehash)
  private var visitedEpoch = new Array[Int](1024)
  private var epoch = 0

  /** Beam search on one layer from an entry node; returns up to ef closest
   * (internal) candidates, ascending. */
  private def searchLayer(q: Array[Float], entry: Int, ef: Int, layer: Int): Array[Cand] = {
    if (visitedEpoch.length < labels.length) {
      visitedEpoch = java.util.Arrays.copyOf(visitedEpoch,
        math.max(labels.length, visitedEpoch.length * 2))
    }
    epoch += 1
    val visited = visitedEpoch
    val ep = epoch
    val candidates = new java.util.PriorityQueue[Cand](byDistAsc) // to expand
    val found = new java.util.PriorityQueue[Cand](byDistDesc)     // best ef, max on top
    val d0 = dist(q, vecs(entry))
    candidates.add(new Cand(entry, d0))
    found.add(new Cand(entry, d0))
    visited(entry) = ep
    while (!candidates.isEmpty) {
      val c = candidates.poll()
      if (found.size() >= ef && c.d > found.peek().d) {
        candidates.clear()
      } else {
        val nbrs = neighbors(layer)(c.id)
        var i = 0
        while (i < nbrs.length) {
          val nb = nbrs(i)
          if (visited(nb) != ep) {
            visited(nb) = ep
            val d = dist(q, vecs(nb))
            if (found.size() < ef || d < found.peek().d) {
              candidates.add(new Cand(nb, d))
              found.add(new Cand(nb, d))
              if (found.size() > ef) found.poll()
            }
          }
          i += 1
        }
      }
    }
    val out = new Array[Cand](found.size())
    var i = out.length - 1
    while (i >= 0) { out(i) = found.poll(); i -= 1 }
    out
  }

  /** Neighbor selection with the paper's diversity heuristic (Malkov &
   * Yashunin, Alg. 4): keep candidate e only if it is closer to the base
   * point than to every already-selected neighbor — preserves long-range
   * inter-cluster links (plain closest-M disconnects clustered data into
   * cliques), then backfill with the skipped closest ones (keepPruned). */
  private def selectNeighbors(cands: Array[Cand], max: Int): Array[Int] = {
    if (cands.length <= max) return cands.map(_.id)
    val selected = new scala.collection.mutable.ArrayBuffer[Cand](max)
    val skipped = new scala.collection.mutable.ArrayBuffer[Cand]()
    var i = 0
    while (i < cands.length && selected.length < max) {
      val c = cands(i)
      var good = true
      var j = 0
      while (good && j < selected.length) {
        if (dist(vecs(c.id), vecs(selected(j).id)) < c.d) good = false
        j += 1
      }
      if (good) selected += c else skipped += c
      i += 1
    }
    var s = 0
    while (selected.length < max && s < skipped.length) {
      selected += skipped(s); s += 1
    }
    selected.map(_.id).toArray
  }

  override def put(label: Long, ts: Long, vec: Array[Float]): Unit = {
    val id = labels.length
    val level = levelFor()
    labels += label; tss += ts; vecs += vec; levels += level
    while (neighbors.length <= level) {
      val layer = new scala.collection.mutable.ArrayBuffer[Array[Int]]()
      var i = 0
      while (i < labels.length - 1) { layer += Array.empty[Int]; i += 1 }
      neighbors += layer
    }
    var l = 0
    while (l < neighbors.length) {
      if (neighbors(l).length < labels.length) neighbors(l) += Array.empty[Int]
      l += 1
    }
    latest.put(label, id)
    if (entryPoint == -1) { entryPoint = id; maxLevel = level; return }

    var ep = entryPoint
    // greedy descent through layers above the node's level
    var lc = maxLevel
    while (lc > level) {
      var changed = true
      var best = dist(vec, vecs(ep))
      while (changed) {
        changed = false
        val nbrs = neighbors(lc)(ep)
        var i = 0
        while (i < nbrs.length) {
          val d = dist(vec, vecs(nbrs(i)))
          if (d < best) { best = d; ep = nbrs(i); changed = true }
          i += 1
        }
      }
      lc -= 1
    }
    // insert at layers min(level, maxLevel) .. 0
    lc = math.min(level, maxLevel)
    while (lc >= 0) {
      val cands = searchLayer(vec, ep, efConstruction, lc)
      val maxConn = if (lc == 0) maxM0 else m
      val selected = selectNeighbors(cands, m)
      neighbors(lc)(id) = selected
      // bidirectional links with pruning
      var i = 0
      while (i < selected.length) {
        val nb = selected(i)
        val cur = neighbors(lc)(nb)
        if (cur.length < maxConn) {
          neighbors(lc)(nb) = cur :+ id
        } else {
          // prune with the same diversity heuristic
          val all = (cur :+ id).map(x => new Cand(x, dist(vecs(nb), vecs(x))))
          java.util.Arrays.sort(all, byDistAsc)
          neighbors(lc)(nb) = selectNeighbors(all, maxConn)
        }
        i += 1
      }
      if (cands.nonEmpty) ep = cands(0).id
      lc -= 1
    }
    if (level > maxLevel) { maxLevel = level; entryPoint = id }
  }

  override def delete(label: Long): Unit = latest.remove(label)

  /** True iff internal id is the live version of its label and fresh. */
  private def accept(id: Int, tsFloor: Long, tsCeil: Long): Boolean = {
    val t = tss(id)
    t >= tsFloor && t <= tsCeil && {
      val live = latest.get(labels(id))
      live != null && live == id
    }
  }

  override def search(q: Array[Float], k: Int, tsFloor: Long,
      tsCeil: Long): Array[(Long, Double)] = {
    if (entryPoint == -1 || latest.isEmpty) return Array.empty
    var ep = entryPoint
    var lc = maxLevel
    while (lc > 0) {
      var changed = true
      var best = dist(q, vecs(ep))
      while (changed) {
        changed = false
        val nbrs = neighbors(lc)(ep)
        var i = 0
        while (i < nbrs.length) {
          val d = dist(q, vecs(nbrs(i)))
          if (d < best) { best = d; ep = nbrs(i); changed = true }
          i += 1
        }
      }
      lc -= 1
    }
    // over-fetch so the accept-filter (deletes, versions, freshness) can
    // drop candidates and still leave k (reference filters inside the
    // C++ search; filtering post-beam with a widened ef is the standard
    // library workaround)
    val ef = math.max(efSearch, k * 4)
    val cands = searchLayer(q, ep, ef, 0)
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Double)](k)
    val seenLabels = new java.util.HashSet[Long]()
    var i = 0
    while (i < cands.length && out.length < k) {
      val c = cands(i)
      if (accept(c.id, tsFloor, tsCeil) && seenLabels.add(labels(c.id))) {
        out += ((labels(c.id), c.d))
      }
      i += 1
    }
    // ensure (dist, id-label) tie order
    out.sortBy { case (l, d) => (d, l) }.toArray
  }
}
