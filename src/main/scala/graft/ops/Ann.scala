package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Metric
import graft.functions.TopKAggregator
import graft.partitioners.TemporalPartitionerModel
import graft.store.{ExactStore, HnswStore, VectorStore}

/**
 * Batch approximate/partitioned kNN — the reference's whole pipeline
 * (partition fan-out -> per-partition indexed search -> global top-k
 * merge; reference §3.1 dataflow) as one Spark transform:
 *
 *   corpus --explode dataPartitions--> (pid, id, ts, vec)   \
 *                                                            cogroup(pid)
 *   queries --explode queryPartitions--> (pid, qid, ...)    /
 *     -> per-pid: build VectorStore (hot-tier index), search each query
 *     -> partial (qid, id, dist)
 *   -> groupBy(qid) topK merge (partial agg) -> (qid, rn, id, dist)
 *
 * The cogroup is a single co-partitioned shuffle on pid; the merge moves
 * only k rows per (query, probed partition). At cluster scale the
 * partitioner model is a broadcast value and every stage is
 * embarrassingly parallel — the same properties the reference engineers
 * by hand with keyed state.
 */
object Ann {

  final case class VecRow(pid: Int, id: Long, ts: Long, vec: Array[Float])
  final case class QueryRow(pid: Int, qid: Long, qtime: Long, ttl: Long, vec: Array[Float])
  final case class Partial(qid: Long, id: Long, dist: Double)

  /**
   * @param vectors  (id LONG, vec ARRAY<FLOAT>, eventTime LONG) — inserts
   *                 only; pair with [[applyDeletes]] for tombstones
   * @param queries  (qid LONG, qv ARRAY<FLOAT>, qtime LONG, ttl LONG)
   * @param useHnsw  HNSW hot-tier index vs exact per-partition scan
   */
  def search(
      vectors: DataFrame,
      queries: DataFrame,
      model: TemporalPartitionerModel,
      k: Int,
      metric: Metric = Metric.L2,
      useHnsw: Boolean = true,
      hnswM: Int = 16,
      efConstruction: Int = 128,
      efSearch: Int = 64): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._

    val bModel = spark.sparkContext.broadcast(model)

    val vecRows: Dataset[VecRow] = vectors
      .select(col("id"), col("vec"), col("eventTime"))
      .as[(Long, Array[Float], Long)]
      .flatMap { case (id, vec, ts) =>
        bModel.value.dataPartitions(vec, id, ts).map(pid => VecRow(pid, id, ts, vec))
      }

    val queryRows: Dataset[QueryRow] = queries
      .select(col("qid"), col("qv"), col("qtime"), col("ttl"))
      .as[(Long, Array[Float], Long, Long)]
      .flatMap { case (qid, qv, qtime, ttl) =>
        bModel.value.queryPartitions(qv, qtime, ttl)
          .map(pid => QueryRow(pid, qid, qtime, ttl, qv))
      }

    searchRouted(vecRows, queryRows, k, metric, useHnsw, hnswM,
      efConstruction, efSearch)
  }

  /** The pipeline downstream of routing — callers that already hold the
   * routed rows (e.g. after materializing them as oracle aux tables)
   * enter here and avoid a second routing pass over the corpus. */
  def searchRouted(
      vecRows: Dataset[VecRow],
      queryRows: Dataset[QueryRow],
      k: Int,
      metric: Metric = Metric.L2,
      useHnsw: Boolean = true,
      hnswM: Int = 16,
      efConstruction: Int = 128,
      efSearch: Int = 64): DataFrame = {
    val spark = vecRows.sparkSession
    import spark.implicits._

    val partials: Dataset[Partial] = vecRows.groupByKey(_.pid)
      .cogroup(queryRows.groupByKey(_.pid)) { (_, vecs, qs) =>
        val qList = qs.toArray
        if (qList.isEmpty) Iterator.empty
        else {
          val store: VectorStore =
            if (useHnsw) new HnswStore(metric, hnswM, efConstruction, efSearch)
            else new ExactStore(metric)
          // deterministic build order -> deterministic graph
          vecs.toArray.sortBy(v => (v.ts, v.id))
            .foreach(v => store.put(v.id, v.ts, v.vec))
          qList.sortBy(_.qid).iterator.flatMap { q =>
            store.search(q.vec, k, q.qtime - q.ttl, q.qtime)
              .map { case (id, d) => Partial(q.qid, id, d) }
          }
        }
      }

    val topkUdaf = udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    partials.toDF()
      .groupBy("qid").agg(topkUdaf(col("id"), col("dist")).as("topk"))
      .select(col("qid"), posexplode(arrays_zip(col("topk.ids").as("id"),
        col("topk.dists").as("dist"))))
      .select(col("qid"), (col("pos") + 1).as("rn"),
        col("col.id").as("id"), col("col.dist").as("dist"))
  }

  /** Versioned-delete reconciliation for the cold tier (reference V4):
   * drop every vector row superseded or deleted by a later event for the
   * same id. `events` = (id, eventTime, isDeletion); keeps a row iff it is
   * the latest event for its id and that event is not a deletion. */
  def applyDeletes(vectors: DataFrame, deletes: DataFrame): DataFrame =
    vectors.join(deletes.select(col("id").as("del_id"), col("eventTime").as("del_ts")),
        col("id") === col("del_id") && col("del_ts") >= col("eventTime"), "left_anti")
}
