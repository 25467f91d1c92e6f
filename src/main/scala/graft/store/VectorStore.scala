package graft.store

import graft.functions.Distances
import graft.Metric

/**
 * The minimal vector-store contract the reference exposes through its
 * RocksDB plugin (reference: plugin/vectorbackend/tests/
 * vector_column_family_test.cc:250-307 — put(id, ts, vec) / delete(id) /
 * search(vec, k, tsFloor) -> top-k), plus the upper time bound that the
 * engine's seqnum filter implies (hnswlib.h:135-146: `seq < querySeq &&
 * ts >= tsFloor`).
 *
 * Implementations are per-partition, executor-local, single-threaded
 * (one instance per partition inside mapPartitions / mapGroupsWithState —
 * never shared across tasks).
 */
trait VectorStore extends Serializable {
  def put(id: Long, ts: Long, vec: Array[Float]): Unit
  def delete(id: Long): Unit
  def size: Int
  /** top-k (id, dist) ascending (dist, id), only elements with
   * eventTime in [tsFloor, tsCeil] and not deleted/superseded. */
  def search(q: Array[Float], k: Int, tsFloor: Long = Long.MinValue,
      tsCeil: Long = Long.MaxValue): Array[(Long, Double)]
}

/** Exact brute-force store: columnar arrays + bounded insertion top-k.
 * The correctness oracle (recall 1.0 by construction); also the fallback
 * when a partition is too small to justify an index. */
final class ExactStore(metric: Metric, initialCapacity: Int = 1024) extends VectorStore {
  private val dist = Distances.forMetric(metric)
  private var ids = new Array[Long](initialCapacity)
  private var ts = new Array[Long](initialCapacity)
  private var vecs = new Array[Array[Float]](initialCapacity)
  private var n = 0
  // latest version (insertion index) per live id; delete removes the entry
  private val latest = new java.util.HashMap[Long, Int]()

  private def grow(): Unit = {
    val cap = ids.length * 2
    ids = java.util.Arrays.copyOf(ids, cap)
    ts = java.util.Arrays.copyOf(ts, cap)
    vecs = java.util.Arrays.copyOf(vecs, cap)
  }

  override def put(id: Long, t: Long, vec: Array[Float]): Unit = {
    if (n == ids.length) grow()
    ids(n) = id; ts(n) = t; vecs(n) = vec
    latest.put(id, n) // upsert: newer version supersedes (reference V4)
    n += 1
  }

  override def delete(id: Long): Unit = latest.remove(id)

  override def size: Int = latest.size()

  override def search(q: Array[Float], k: Int, tsFloor: Long,
      tsCeil: Long): Array[(Long, Double)] = {
    // bounded top-k by (dist, id) over live versions
    val heapIds = new Array[Long](k)
    val heapD = new Array[Double](k)
    var m = 0
    val it = latest.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val idx = e.getValue
      val t = ts(idx)
      if (t >= tsFloor && t <= tsCeil) {
        val d = dist(q, vecs(idx))
        val id = e.getKey
        if (m < k || d < heapD(m - 1) || (d == heapD(m - 1) && id < heapIds(m - 1))) {
          var pos = if (m < k) m else k - 1
          while (pos > 0 && (heapD(pos - 1) > d ||
              (heapD(pos - 1) == d && heapIds(pos - 1) > id))) {
            heapD(pos) = heapD(pos - 1); heapIds(pos) = heapIds(pos - 1); pos -= 1
          }
          heapD(pos) = d; heapIds(pos) = id
          if (m < k) m += 1
        }
      }
    }
    Array.tabulate(m)(i => (heapIds(i), heapD(i)))
  }
}
