package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming exact deduplication over a document stream — the streaming
 * counterpart of `Dedup.exact` / `text_dedup_exact`: each arriving
 * document is flagged `first = true` iff its content hash has never been
 * seen before (across all previous micro-batches and earlier in the
 * current one). A training-data ingest keeps `first` rows only.
 *
 * Spark shape: documents hash to a 128-bit md5 identity and route to
 * `hash % numShards` — state and lookups scale out with the shard count,
 * and a shard's state is two sorted parallel long arrays (16 bytes per
 * distinct document, NOT the text), merged once per batch (O(seen +
 * batch log batch)) with binary-search lookups. With the RocksDB state
 * store provider the per-batch state encode is incremental; the
 * in-memory provider round-trips O(seen) bytes — fine for the default
 * HDFS-backed store too, since entries are 16 bytes.
 *
 * Determinism: same-batch duplicates are resolved in ascending doc_id
 * order (the keeper is the smallest id in the batch, matching the batch
 * operator's min-id keeper), independent of partitioning or arrival
 * interleaving inside the batch.
 */
object StreamDedup {

  case class DocEvent(docId: Long, text: String)
  /** Per-shard state: 128-bit hashes as parallel arrays sorted by
   * (hi, lo). */
  case class ShardSeen(hi: Array[Long], lo: Array[Long])
  case class DedupVerdict(docId: Long, shard: Int, first: Boolean)

  /** 128-bit content identity (md5, big-endian halves). */
  def contentHash(text: String): (Long, Long) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.wrap(d)
    (bb.getLong(0), bb.getLong(8))
  }

  private def contains(s: ShardSeen, hi: Long, lo: Long): Boolean = {
    var a = 0
    var b = s.hi.length - 1
    while (a <= b) {
      val m = (a + b) >>> 1
      val c = java.lang.Long.compare(s.hi(m), hi) match {
        case 0 => java.lang.Long.compare(s.lo(m), lo)
        case x => x
      }
      if (c == 0) return true
      else if (c < 0) a = m + 1
      else b = m - 1
    }
    false
  }

  /** Merge sorted state with a sorted batch of new (hi, lo) pairs. */
  private def merge(s: ShardSeen, add: Array[(Long, Long)]): ShardSeen = {
    if (add.isEmpty) s
    else {
      val n = s.hi.length + add.length
      val hi = new Array[Long](n)
      val lo = new Array[Long](n)
      var i = 0; var j = 0; var o = 0
      while (i < s.hi.length || j < add.length) {
        val takeOld = j >= add.length || (i < s.hi.length &&
          (s.hi(i) < add(j)._1 || (s.hi(i) == add(j)._1 && s.lo(i) <= add(j)._2)))
        if (takeOld) { hi(o) = s.hi(i); lo(o) = s.lo(i); i += 1 }
        else { hi(o) = add(j)._1; lo(o) = add(j)._2; j += 1 }
        o += 1
      }
      ShardSeen(hi, lo)
    }
  }

  /** Flag every document with its global-first verdict. Append mode;
   * compose with `.filter(_.first)` for the deduped stream. */
  def run(docs: Dataset[DocEvent], numShards: Int = 64): Dataset[DedupVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.map { doc =>
      val (hi, lo) = contentHash(doc.text)
      (math.floorMod(hi, numShards).toInt, hi, lo, doc.docId)
    }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (shard: Int, it: Iterator[(Int, Long, Long, Long)],
            state: GroupState[ShardSeen]) => {
          val prev = state.getOption.getOrElse(ShardSeen(Array.empty, Array.empty))
          val batch = it.toArray.sortBy(_._4) // ascending docId = keeper
          val fresh = scala.collection.mutable.HashSet.empty[(Long, Long)]
          val out = batch.map { case (_, hi, lo, docId) =>
            val first = !contains(prev, hi, lo) && fresh.add((hi, lo))
            DedupVerdict(docId, shard, first)
          }
          if (fresh.nonEmpty)
            state.update(merge(prev, fresh.toArray.sorted))
          out.iterator
        })
  }
}
