package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Metric
import graft.functions.TopKAggregator
import graft.partitioners.PartitionerModel
import graft.store.ExactStore

/**
 * The reference's continuously-running search job under Structured
 * Streaming (reference §3.1: sources -> partition fan-out -> keyed
 * insert-&-search operator (C1) -> partial-result merge (C3) -> sink):
 *
 *  - one input stream of insert/delete/query events (event-time stamped);
 *  - fan-out via a broadcast PartitionerModel (replaces the reference's
 *    parallelism-1 partitioner + murmur-key trick — routing is a pure
 *    function, so it runs fully parallel);
 *  - `flatMapGroupsWithState` keyed by partition id holds the partition's
 *    live vectors (hot tier), applies inserts/deletes in event-time order,
 *    answers queries against the store, and evicts entries older than
 *    maxObservedTime - maxTtl (reference V7 eviction);
 *  - partial top-k results carry numPartitionsSent (reference
 *    PartitionedQuery.java:17) and are merged per micro-batch (a query's
 *    fan-out all lands in one batch, so the per-batch merge is complete —
 *    the reference's completeness counter becomes a groupBy).
 *
 * State is the raw vector set (encodable case classes); the per-batch
 * store build is exact. An HNSW hot tier drops in by serializing the
 * index into state — the contract is unchanged (see graft.store).
 */
object VectorStreamJob {

  /** Unified stream element (insert / delete / query). */
  final case class StreamEvent(
      kind: String, // "i" | "d" | "q"
      id: Long,
      vec: Array[Float],
      eventTime: Long,
      ttl: Long,
      k: Int)

  final case class Routed(pid: Int, numPartitionsSent: Int, ev: StreamEvent)

  final case class StoredVec(id: Long, ts: Long, vec: Array[Float])
  final case class PartitionState(vecs: Array[StoredVec], tombstones: Array[Long],
      maxTs: Long)

  final case class PartialResult(
      queryId: Long, pid: Int, numPartitionsSent: Int,
      ids: Array[Long], dists: Array[Double], queryEventTime: Long)

  /** Fan events out to partitions (data -> dataPartitions, value-less
   * deletes -> all, queries -> queryPartitions with the sent-count). */
  def route(events: Dataset[StreamEvent], model: PartitionerModel): Dataset[Routed] = {
    val spark = events.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(model)
    events.flatMap { ev =>
      ev.kind match {
        case "q" =>
          val ps = b.value.queryPartitions(ev.vec)
          ps.map(pid => Routed(pid, ps.length, ev))
        case "d" if ev.vec == null =>
          b.value.deleteAllPartitions.map(pid => Routed(pid, 0, ev))
        case _ =>
          b.value.dataPartitions(ev.vec, ev.id).map(pid => Routed(pid, 0, ev))
      }
    }
  }

  final case class HnswState(bytes: Array[Byte], inserted: Long)

  /** C1 with an HNSW hot tier held in state as a serialized index —
   * inserts are incremental (the reference's HNSW memtable, V1); the
   * graph keeps tombstoned nodes (like the reference) and is compacted
   * (rebuilt from live entries) when more than half its nodes are dead. */
  def partialsHnsw(routed: Dataset[Routed], metric: Metric, maxTtl: Long,
      m: Int = 16, efConstruction: Int = 64, efSearch: Int = 64)
      : Dataset[PartialResult] = {
    val spark = routed.sparkSession
    import spark.implicits._
    def serialize(s: graft.store.HnswStore): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(s); oos.close(); bos.toByteArray
    }
    def deserialize(b: Array[Byte]): graft.store.HnswStore = {
      val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(b))
      val s = ois.readObject().asInstanceOf[graft.store.HnswStore]
      ois.close(); s
    }
    routed.groupByKey(_.pid).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (pid: Int, events: Iterator[Routed], state: GroupState[HnswState]) => {
        var store = state.getOption.map(s => deserialize(s.bytes))
          .getOrElse(new graft.store.HnswStore(metric, m, efConstruction, efSearch,
            seed = 42L + pid))
        var inserted = state.getOption.map(_.inserted).getOrElse(0L)
        val out = new scala.collection.mutable.ArrayBuffer[PartialResult]()
        val evs = events.toArray.sortBy(r => (r.ev.eventTime, r.ev.id))
        evs.foreach { r =>
          val ev = r.ev
          ev.kind match {
            case "i" => store.put(ev.id, ev.eventTime, ev.vec); inserted += 1
            case "d" => store.delete(ev.id)
            case "q" =>
              val ttl = math.min(ev.ttl, maxTtl)
              val res = store.search(ev.vec, ev.k, ev.eventTime - ttl, ev.eventTime)
              out += PartialResult(ev.id, pid, r.numPartitionsSent,
                res.map(_._1), res.map(_._2), ev.eventTime)
          }
        }
        // compaction: rebuild when most graph nodes are dead versions
        if (inserted > 64 && store.size * 2 < inserted) {
          val fresh = new graft.store.HnswStore(metric, m, efConstruction,
            efSearch, seed = 42L + pid)
          store.liveEntries.foreach { case (label, ts, vec) => fresh.put(label, ts, vec) }
          store = fresh
          inserted = store.size.toLong
        }
        state.update(HnswState(serialize(store), inserted))
        out.iterator
      })
  }

  /** The keyed insert-&-search operator (C1). */
  def partials(routed: Dataset[Routed], metric: Metric, maxTtl: Long)
      : Dataset[PartialResult] = {
    val spark = routed.sparkSession
    import spark.implicits._
    routed.groupByKey(_.pid).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (pid: Int, events: Iterator[Routed], state: GroupState[PartitionState]) => {
        val prev = state.getOption.getOrElse(PartitionState(Array.empty, Array.empty, 0L))
        val live = new java.util.LinkedHashMap[Long, StoredVec]()
        prev.vecs.foreach(v => live.put(v.id, v))
        val dead = new java.util.HashSet[Long]()
        prev.tombstones.foreach(dead.add(_))
        var maxTs = prev.maxTs
        val out = new scala.collection.mutable.ArrayBuffer[PartialResult]()

        // event-time order within the batch (the reference relies on
        // arrival order; micro-batching requires an explicit sort)
        val evs = events.toArray.sortBy(r => (r.ev.eventTime, r.ev.id))
        evs.foreach { r =>
          val ev = r.ev
          if (ev.eventTime > maxTs) maxTs = ev.eventTime
          ev.kind match {
            case "i" =>
              live.put(ev.id, StoredVec(ev.id, ev.eventTime, ev.vec))
              dead.remove(ev.id)
            case "d" =>
              live.remove(ev.id)
              dead.add(ev.id)
            case "q" =>
              val store = new ExactStore(metric, math.max(16, live.size()))
              val it = live.values().iterator()
              while (it.hasNext) { val v = it.next(); store.put(v.id, v.ts, v.vec) }
              // maxTtl is the global upper bound on freshness windows
              // (reference params maxTTL) — clamping makes eviction safe
              val ttl = math.min(ev.ttl, maxTtl)
              val res = store.search(ev.vec, ev.k, ev.eventTime - ttl, ev.eventTime)
              out += PartialResult(ev.id, pid, r.numPartitionsSent,
                res.map(_._1), res.map(_._2), ev.eventTime)
          }
        }
        // TTL eviction (V7): no future query can reach entries older than
        // maxTs - maxTtl (queries' event times are >= maxTs going forward)
        val floor = maxTs - maxTtl
        val kept = new scala.collection.mutable.ArrayBuffer[StoredVec]()
        val it = live.values().iterator()
        while (it.hasNext) { val v = it.next(); if (v.ts >= floor) kept += v }
        state.update(PartitionState(kept.toArray, dead.toArray.map(Long.unbox), maxTs))
        out.iterator
      })
  }

  /** C3 merge for a (micro-)batch of partials -> complete SearchResults
   * (qid, rn, id, dist) — only queries whose partial count matches
   * numPartitionsSent are complete (always true when the fan-out landed in
   * one batch). */
  def mergePartials(batch: DataFrame, k: Int): DataFrame = {
    val topkUdaf = udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    val flat = batch.select(col("queryId").as("qid"), col("numPartitionsSent"),
        explode(arrays_zip(col("ids").as("id"), col("dists").as("dist"))).as("e"))
      .select(col("qid"), col("numPartitionsSent"), col("e.id").as("id"),
        col("e.dist").as("dist"))
    val complete = batch.groupBy(col("queryId").as("qid"))
      .agg(countDistinct(col("pid")).as("np"),
        first(col("numPartitionsSent")).as("sent"))
      .where(col("np") === col("sent"))
      .select(col("qid"))
    flat.join(complete, "qid")
      .groupBy("qid").agg(topkUdaf(col("id"), col("dist")).as("topk"))
      .select(col("qid"), posexplode(arrays_zip(col("topk.ids").as("id"),
        col("topk.dists").as("dist"))))
      .select(col("qid"), (col("pos") + 1).as("rn"),
        col("col.id").as("id"), col("col.dist").as("dist"))
  }

  /** Wire the full pipeline onto a streaming Dataset; results are appended
   * per micro-batch via foreachBatch into `sink`. */
  def run(events: Dataset[StreamEvent], model: PartitionerModel, k: Int,
      metric: Metric, maxTtl: Long, useHnsw: Boolean = false)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val routed = route(events, model)
    val p = if (useHnsw) partialsHnsw(routed, metric, maxTtl)
            else partials(routed, metric, maxTtl)
    p.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[PartialResult], _: Long) =>
        sink(mergePartials(batch.toDF(), k))
      }
      .start()
  }
}
