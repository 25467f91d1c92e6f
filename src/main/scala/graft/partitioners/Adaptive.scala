package graft.partitioners

/**
 * P5's adaptive range history — the VStream paper's core mechanism
 * (reference lsh/LSHashSpaceFillingPartitioner.java: boundary re-learn
 * :179-202, query fan-out over historical ranges :314-355, isFresh
 * :352-355):
 *
 *  - equi-depth curve boundaries are re-learned as the insert
 *    distribution drifts; each learned boundary set (a "range version")
 *    governs the routing of inserts with event time in
 *    [fromTime, toTime);
 *  - a query fans out over the union of partitions from every version
 *    whose validity window can still hold data fresh for the query
 *    (version.toTime >= qtime - ttl && version.fromTime <= qtime — the
 *    reference's `updateTime + interval >= qTime - ttl`);
 *  - versions whose data has entirely aged out of the maximum freshness
 *    window are expired (range-history GC).
 *
 * Hash families are drawn once and never change — only ranges re-learn —
 * so a vector hashes identically under every version and the history
 * fan-out is exactly "where would this vector have been routed back
 * then". The whole model is a few KB (hash params + boundaries): cheap
 * to broadcast per batch and cheap to hold in streaming state
 * ([[graft.streaming.AdaptiveRouter]]).
 */
final case class RangeVersion(partitioner: LshSfcPartitioner,
    fromTime: Long, toTime: Long)

final case class AdaptiveLshSfcPartitioner(versions: Vector[RangeVersion])
    extends TemporalPartitionerModel {
  require(versions.nonEmpty, "adaptive partitioner needs at least one version")

  override def numPartitions: Int = versions.head.partitioner.numPartitions

  /** The version in effect at ts: latest with fromTime <= ts (data older
   * than the first version routes by the first). */
  def versionAt(ts: Long): RangeVersion = {
    var i = versions.length - 1
    while (i > 0 && versions(i).fromTime > ts) i -= 1
    versions(i)
  }

  override def dataPartitions(vec: Array[Float], id: Long, ts: Long): Array[Int] =
    versionAt(ts).partitioner.dataPartitions(vec, id)

  /** Union fan-out over every version still fresh for [qtime-ttl, qtime].
   * A query whose window intersects no version (e.g. entirely before the
   * first fit) falls back to the version at its qtime — the deterministic
   * stand-in for the reference's random-partition fallback
   * (LSHashSpaceFillingPartitioner.java: no-range branch). */
  override def queryPartitions(vec: Array[Float], qtime: Long, ttl: Long): Array[Int] = {
    val set = new java.util.LinkedHashSet[Integer]()
    versions.foreach { v =>
      if (v.fromTime <= qtime && v.toTime >= qtime - ttl)
        v.partitioner.queryPartitions(vec).foreach(set.add(_))
    }
    if (set.isEmpty) versionAt(qtime).partitioner.queryPartitions(vec)
    else {
      val out = new Array[Int](set.size())
      val it = set.iterator(); var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
  }

  /** A delete carrying its vector must reach every partition the id's
   * insert may have been routed to within the retention window. */
  override def deleteDataPartitions(vec: Array[Float], id: Long, ts: Long,
      maxTtl: Long): Array[Int] = {
    val set = new java.util.LinkedHashSet[Integer]()
    versions.foreach { v =>
      if (v.fromTime <= ts && v.toTime >= ts - maxTtl)
        v.partitioner.dataPartitions(vec, id).foreach(set.add(_))
    }
    val out = new Array[Int](set.size())
    val it = set.iterator(); var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Close the current version at asOfTime and open a new one with
   * boundaries re-learned from the sample (hash families unchanged). */
  def refit(sample: Array[Array[Float]], asOfTime: Long): AdaptiveLshSfcPartitioner = {
    val closed = versions.init :+ versions.last.copy(toTime = asOfTime)
    val relearned = LshSfcPartitioner.refit(versions.last.partitioner, sample)
    AdaptiveLshSfcPartitioner(
      closed :+ RangeVersion(relearned, asOfTime, Long.MaxValue))
  }

  /** Drop versions that can no longer hold fresh data (isFresh GC); the
   * current version is always kept. */
  def expire(floor: Long): AdaptiveLshSfcPartitioner = {
    val kept = versions.filter(_.toTime >= floor)
    AdaptiveLshSfcPartitioner(if (kept.isEmpty) Vector(versions.last) else kept)
  }
}

object AdaptiveLshSfcPartitioner {
  /** Initial fit: one version valid from `fromTime` onward. */
  def init(sample: Array[Array[Float]], numPartitions: Int, dim: Int,
      numFamilies: Int, numHashes: Int, width: Float, bits: Int,
      curveName: String, seed: Long, fromTime: Long): AdaptiveLshSfcPartitioner =
    AdaptiveLshSfcPartitioner(Vector(RangeVersion(
      LshSfcPartitioner.fit(sample, numPartitions, dim, numFamilies,
        numHashes, width, bits, curveName, seed),
      fromTime, Long.MaxValue)))
}
