package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Metric
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

  /** Candidate admission shared by EVERY exact scan kernel (bruteForce
   * and both loop orders of the per-cell scan): the L2 path computes
   * through the bounded early-abandon distance — bit-identical results,
   * since the partial sum of squares is nondecreasing, so abandoning
   * past the heap's admission bound can never change the top-k — and
   * other metrics compute in full. A NaN distance (NaN vector
   * component) never admits on the L2 path; NaN inputs are out of
   * contract for these kernels (bruteForce, the oracle-gated baseline,
   * has always behaved this way). One copy, so the bit-exactness
   * contract cannot drift between kernels. */
  @inline private[graft] def offerBounded(h: graft.functions.BoundedTopK,
      qv: Array[Float], v: Array[Float], id: Long, l2Abandon: Boolean,
      distFn: (Array[Float], Array[Float]) => Double): Unit =
    if (l2Abandon) {
      val bd = h.bound
      val d = graft.functions.Distances.l2Bounded(qv, v, bd)
      if (d <= bd) h.offer(d, id)
    } else h.offer(distFn(qv, v), id)

  final case class VecRow(pid: Int, id: Long, ts: Long, vec: Array[Float])
  final case class QueryRow(pid: Int, qid: Long, qtime: Long, ttl: Long, vec: Array[Float])
  final case class Partial(qid: Long, id: Long, dist: Double)
  /** One per-(query, partition) top-k LIST, (dist, id)-ascending — the
   * merge input unit (reference SearchResult): 1 row per probed
   * partition reaches the shuffle instead of k. */
  final case class PartialList(qid: Long, ids: Array[Long], dists: Array[Double])

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

    val partials: Dataset[PartialList] = vecRows.groupByKey(_.pid)
      .cogroup(queryRows.groupByKey(_.pid)) { (_, vecs, qs) =>
        val qList = qs.toArray
        if (qList.isEmpty) Iterator.empty
        else if (!useHnsw) exactCellScan(vecs, qList, k, metric)
        else {
          val store: VectorStore =
            new HnswStore(metric, hnswM, efConstruction, efSearch)
          // deterministic build order -> deterministic graph
          vecs.toArray.sortBy(v => (v.ts, v.id))
            .foreach(v => store.put(v.id, v.ts, v.vec))
          qList.sortBy(_.qid).iterator.map { q =>
            val res = store.search(q.vec, k, q.qtime - q.ttl, q.qtime)
            PartialList(q.qid, res.map(_._1), res.map(_._2))
          }
        }
      }
    mergePartialLists(partials.toDF(), k)
  }

  /** The exact per-cell scan on densified primitive arrays with the
   * bounded-heap + L2-early-abandon kernel, replacing the per-query
   * [[ExactStore]] probe (boxed HashMap iteration per query, un-bounded
   * distance). The LOOP ORDER adapts to the cell's shape: the inner
   * loop must stream the SMALLER side so it stays cache-resident —
   * row-outer/query-inner when data rows outnumber queries (the
   * [[bruteForce]] shape: few queries against a big corpus), but
   * query-outer/row-inner when queries outnumber rows, which is the
   * kNN-join's standing state (per-cell queries = rows × probe fan-out;
   * a same-JVM A/B at 100k vectors, 128 cells × 4 probes measured
   * row-outer ~1.9× SLOWER there — 87 s vs 47 s — because each data row
   * re-streamed the 1.6 MB query block). Results are bit-identical in
   * both orders — same latest-version upsert resolution ((ts,
   * id)-ordered last put wins), same per-query freshness window, same
   * (dist, id)-ascending top-k with smaller-id tie-break; a query with
   * zero in-window candidates ships no partial (the merge produces no
   * rows for it either way). */
  private def exactCellScan(vecs: Iterator[VecRow], qs: Array[QueryRow],
      k: Int, metric: Metric): Iterator[PartialList] = {
    val rows = vecs.toArray.sortBy(v => (v.ts, v.id))
    val latest = new java.util.HashMap[Long, Int](rows.length * 2)
    var i = 0
    while (i < rows.length) { latest.put(rows(i).id, i); i += 1 }
    // densify the live set into parallel primitive arrays once per cell
    val m = latest.size()
    val ids = new Array[Long](m)
    val ts = new Array[Long](m)
    val vv = new Array[Array[Float]](m)
    var j = 0
    val lit = latest.values().iterator()
    while (lit.hasNext) {
      val idx = lit.next()
      ids(j) = rows(idx).id; ts(j) = rows(idx).ts; vv(j) = rows(idx).vec
      j += 1
    }
    val qsSorted = qs.sortBy(_.qid)
    val nq = qsSorted.length
    val distFn = graft.functions.Distances.forMetric(metric)
    val l2Abandon = metric == Metric.L2
    if (nq <= m) {
      // few queries, many rows: stream the rows, keep the query block hot
      val heaps = Array.fill(nq)(new graft.functions.BoundedTopK(k))
      var r = 0
      while (r < m) {
        val id = ids(r); val t = ts(r); val v = vv(r)
        var qi = 0
        while (qi < nq) {
          val q = qsSorted(qi)
          if (t >= q.qtime - q.ttl && t <= q.qtime)
            offerBounded(heaps(qi), q.vec, v, id, l2Abandon, distFn)
          qi += 1
        }
        r += 1
      }
      Iterator.range(0, nq).flatMap { qi =>
        val (hid, hd) = heaps(qi).drainSorted()
        if (hid.isEmpty) Iterator.empty
        else Iterator.single(PartialList(qsSorted(qi).qid, hid, hd))
      }
    } else {
      // more queries than rows (the join's fan-out shape): stream the
      // queries, keep the row block hot; one heap at a time
      Iterator.range(0, nq).flatMap { qi =>
        val q = qsSorted(qi)
        val floor = q.qtime - q.ttl
        val h = new graft.functions.BoundedTopK(k)
        var r = 0
        while (r < m) {
          val t = ts(r)
          if (t >= floor && t <= q.qtime)
            offerBounded(h, q.vec, vv(r), ids(r), l2Abandon, distFn)
          r += 1
        }
        val (hid, hd) = h.drainSorted()
        if (hid.isEmpty) Iterator.empty
        else Iterator.single(PartialList(q.qid, hid, hd))
      }
    }
  }

  /** Global top-k merge of per-(query, partition) lists: list-in partial
   * aggregation, k-way sorted merge with cross-partition id dedup. */
  private[graft] def mergePartialLists(partials: DataFrame, k: Int): DataFrame = {
    val spark = partials.sparkSession
    import spark.implicits._
    val mergeUdaf = udaf(new graft.functions.TopKListAggregator(k),
      implicitly[org.apache.spark.sql.Encoder[(Array[Long], Array[Double])]])
    partials
      .groupBy("qid").agg(mergeUdaf(col("ids"), col("dists")).as("topk"))
      .select(col("qid"), posexplode(arrays_zip(col("topk.ids").as("id"),
        col("topk.dists").as("dist"))))
      .select(col("qid"), (col("pos") + 1).as("rn"),
        col("col.id").as("id"), col("col.dist").as("dist"))
  }

  /** Exact brute-force kNN: broadcast query set x partitioned corpus,
   * per-partition bounded (dist, id) max-heaps, global partial top-k
   * merge. Only k rows per (query, input partition) reach the shuffle and
   * the 616M-element (query x vector) cross product is never materialized
   * as rows — the scan is a tight loop over the corpus partition with the
   * query block resident (the plan a 1000-executor scoring job wants).
   *
   * The query set must fit in a broadcast (same contract as the
   * broadcast-join formulation it replaces); the corpus side streams.
   * Distances use the sequential-double kernel, so results are bit-equal
   * to the oracle-gated formulation, ties broken by smaller id.
   *
   * @param vectors (id LONG, vec ARRAY<FLOAT>, eventTime LONG)
   * @param queries (qid LONG, qv ARRAY<FLOAT>, qtime LONG, ttl LONG)
   * @return (qid, rn, id, dist) — rn 1..k by ascending (dist, id)
   */
  def bruteForce(vectors: DataFrame, queries: DataFrame, k: Int,
      metric: Metric = Metric.L2): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val qArr = queries.select(col("qid"), col("qv"), col("qtime"), col("ttl"))
      .as[(Long, Array[Float], Long, Long)].collect()
    val bq = spark.sparkContext.broadcast(qArr)
    val distFn = graft.functions.Distances.forMetric(metric)

    val partials = vectors.select(col("id"), col("vec"), col("eventTime"))
      .as[(Long, Array[Float], Long)]
      .mapPartitions { it =>
        // empty input partitions contribute nothing to any merge — skip
        // heap allocation and don't ship nq empty partials
        if (!it.hasNext) Iterator.empty
        else {
          val qs = bq.value
          val nq = qs.length
          // per-query bounded (dist, id) max-heap — shared scan kernel
          val heaps = Array.fill(nq)(new graft.functions.BoundedTopK(k))
          // L2's partial sum of squares is nondecreasing, so candidates
          // can abandon exactly once they exceed the heap's admission
          // bound — results stay bit-identical (see Distances.l2Bounded);
          // IP/cosine partials aren't monotone, no bounded kernel there
          val l2Abandon = metric == graft.Metric.L2
          while (it.hasNext) {
            val (id, v, ts) = it.next()
            var qi = 0
            while (qi < nq) {
              val q = qs(qi)
              if (ts >= q._3 - q._4 && ts <= q._3)
                offerBounded(heaps(qi), q._2, v, id, l2Abandon, distFn)
              qi += 1
            }
          }
          // drain each heap to a (dist, id)-ascending list partial;
          // zero-length partials carry no information for this merge
          Iterator.range(0, nq).flatMap { qi =>
            val (ids, ds) = heaps(qi).drainSorted()
            if (ids.isEmpty) Iterator.empty
            else Iterator.single(PartialList(qs(qi)._1, ids, ds))
          }
        }
      }
    mergePartialLists(partials.toDF(), k)
  }

  /** Routed kNN JOIN (all-kNN): for EVERY vector in `vectors`, its k
   * nearest OTHER vectors — the batch retrieval composition a training
   * pipeline runs (hard-negative mining, cross-corpus near-dup
   * candidates, SemDeDup's pair stage). queries == corpus here, so the
   * [[bruteForce]]/[[search]] query-broadcast contract does not hold:
   * NEITHER side leaves the executors — both route through the
   * partitioner model (data to its cells, each vector-as-query to its
   * probe cells) and meet in the pid-keyed cogroup of [[searchRouted]].
   * One shuffle per side keyed on the cell; pair work is Σ_cell
   * |q_c|·|d_c| instead of n², with cell count scaled to the corpus so
   * per-cell cost stays bounded.
   *
   * Self matches are searched as k+1 then dropped: a vector's home cell
   * is its own nearest centroid (in the probe set of any sane model), so
   * self is always a candidate; removing it from the merged top-(k+1)
   * leaves exactly the non-self top-k. The self-drop makes this a
   * SELF-join; for a cross-corpus join (retrieve from corpus B for every
   * row of corpus A) use [[search]] directly — its query side is a
   * routed Dataset too (only [[bruteForce]] broadcasts queries), and no
   * self-exclusion applies across corpora.
   *
   * @param vectors (id LONG, vec ARRAY<FLOAT>, eventTime LONG)
   * @param model   partitioner fitted on a (sample of) the same corpus —
   *                typically [[graft.partitioners.KMeansPartitioner]]
   *                with cells ~ corpus/targetCellSize, WRAPPED in
   *                [[graft.partitioners.SaltedPartitioner]] on clustered
   *                data: queries == corpus makes a hot cell's pair mass
   *                quadratic in its density (measured at 100k vectors /
   *                128 cells: ONE cell held 359M of 1.05B total pairs —
   *                a single straggler task was the whole wall clock);
   *                salting splits the cell's data across sub-partitions
   *                and fans its queries to all of them — same pair mass,
   *                bounded per-task work
   * @param window  when set, the join is TEMPORAL (the reference's V3
   *                freshness semantics composed with the join): each
   *                vector retrieves only among rows with eventTime in
   *                [its own eventTime - window, its own eventTime] —
   *                "neighbors among the last W events", the
   *                recency-bounded negative-mining / backfill-dedup
   *                shape. Self stays in its own window (ts is the
   *                inclusive ceiling), so the drop-self argument is
   *                unchanged. None = unbounded (the full contract span).
   * @return (qid, rn, id, dist) — rn 1..k by ascending (dist, id),
   *         qid over every input id, self excluded */
  def knnJoin(vectors: DataFrame, k: Int, model: TemporalPartitionerModel,
      metric: Metric = Metric.L2, useHnsw: Boolean = false,
      window: Option[Long] = None): DataFrame = {
    val (dr, qr) = selfJoinRouting(vectors, model, window)
    knnJoinRouted(dr, qr, k, metric, useHnsw)
  }

  /** The join's query-time window: the full ±2^62 eventTime contract
   * span (qtime = 2^62-1, ttl = 2^63-1 so the floor lands at -2^62) — a
   * qtime of MaxValue/2 with a MaxValue/2 ttl would silently exclude
   * negative eventTimes from every top-k (the same convention bug the
   * SQL rewrite's scaladoc records fixing). */
  private val JoinQtime: Long = Long.MaxValue / 2
  private val JoinTtl: Long = Long.MaxValue

  /** The (data, query) routing of a self-join: every vector routed to
   * its cells as data AND to its probe cells as a query — unbounded
   * window by default, or each vector's own [ts - window, ts] when a
   * temporal window is requested — the one copy of the construction
   * shared by [[knnJoin]] and the oracle entries (which persist +
   * aux-materialize the pair). */
  def selfJoinRouting(vectors: DataFrame, model: TemporalPartitionerModel,
      window: Option[Long] = None)
      : (Dataset[VecRow], Dataset[QueryRow]) = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(model)
    val base = vectors.select(col("id"), col("vec"), col("eventTime"))
      .as[(Long, Array[Float], Long)]
    val dr = base.flatMap { case (id, v, ts) =>
      b.value.dataPartitions(v, id, ts).map(pid => VecRow(pid, id, ts, v)) }
    val qr = base.flatMap { case (qid, v, ts) =>
      val (qtime, ttl) = window match {
        case Some(w) => (ts, w)
        case None => (JoinQtime, JoinTtl)
      }
      b.value.queryPartitions(v, qtime, ttl)
        .map(pid => QueryRow(pid, qid, qtime, ttl, v)) }
    (dr, qr)
  }

  /** The join downstream of routing — callers that already hold the
   * routed rows (e.g. after materializing them as oracle aux) enter
   * here. See [[knnJoin]] for the semantics. */
  def knnJoinRouted(vecRows: Dataset[VecRow], queryRows: Dataset[QueryRow],
      k: Int, metric: Metric = Metric.L2,
      useHnsw: Boolean = false): DataFrame = {
    // the re-rank window spans at most k+1 rows per qid (the merged list)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("dist"), col("id"))
    searchRouted(vecRows, queryRows, k + 1, metric, useHnsw)
      .where(col("id") =!= col("qid"))
      .select(col("qid"), row_number().over(w).as("rn"), col("id"),
        col("dist"))
      .where(col("rn") <= k)
  }

  /** Versioned-delete reconciliation for the cold tier (reference V4):
   * drop every vector row superseded or deleted by a later event for the
   * same id. `events` = (id, eventTime, isDeletion); keeps a row iff it is
   * the latest event for its id and that event is not a deletion. */
  def applyDeletes(vectors: DataFrame, deletes: DataFrame): DataFrame =
    vectors.join(deletes.select(col("id").as("del_id"), col("eventTime").as("del_ts")),
        col("id") === col("del_id") && col("del_ts") >= col("eventTime"), "left_anti")
}
