package graft.store

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Metric
import graft.functions.Distances

/**
 * The r16 serving engine decision inside the exact-kernel fast path
 * ([[ColdTier.searchIndexedLiteralFiltered]]): an admission-collapsed
 * literal plan is served by the PROCESS-LOCAL kernel over
 * [[ColdTier.SegmentDataCache]]-resident segments (zero Spark jobs per
 * statement once warm) with the lazy DISTRIBUTED scan as fallback. The
 * two engines must be bit-identical on every literal shape — same
 * conservative admission, same resolved Catalyst predicate, same
 * tombstone semantics, same BoundedTopK kernel — and the fallback must
 * keep its scan pushdown. Which engine served is observable via
 * [[ColdTier.exactServedFrom]] ("memory" | "scan");
 * [[ColdTier.literalServedVia]] stays "exact" for both.
 */
class ExactServeLocalSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private val dim = 8
  private val k = 5

  /** One attr-ALIGNED tier shared by the suite: 4 single-label segments
   * (250 rows each, label = segmentId), a numeric score attr, attr
   * stats on label — the converged layout where admission collapses a
   * label literal to its one segment. */
  private lazy val fixture: (String,
      IndexedSeq[(Long, Array[Float], Long, Long, Double)]) = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("exact-serve-local").toString
    val rnd = new java.util.Random(61L)
    val all = (0 until 1000).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat), i.toLong,
        (i % 4).toLong, i.toDouble)
    }
    (0L until 4L).foreach { l =>
      ColdTier.seal(
        all.filter(_._4 == l).toDF("id", "vec", "eventTime", "label", "score"),
        dir, l)
    }
    ColdTier.sealAttrStats(spark, dir, "label")
    (dir, all)
  }

  private def queriesDf(qv: Array[Float]) = {
    import spark.implicits._
    Seq((0L, qv, 100000L, 1000000L)).toDF("qid", "qv", "qtime", "ttl")
  }

  /** Runs the literal plan under both engines, asserts the decision
   * observables, returns (memoryRows, scanRows) sorted by (qid, rn). */
  private def bothEngines(
      filters: Seq[(String, Seq[Any], org.apache.spark.sql.types.DataType)],
      ranges: Seq[ColdTier.RangeBound] = Nil,
      qv: Array[Float]): (Seq[(Long, Int, Long, Double)],
      Seq[(Long, Int, Long, Double)]) = {
    def run(): Seq[(Long, Int, Long, Double)] =
      ColdTier.searchIndexedLiteralFiltered(spark, fixture._1,
          queriesDf(qv), k, filters, Metric.L2, shortlist = 8,
          efSearch = 32, ranges = ranges)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val mem = run()
    assert(ColdTier.literalServedVia.get == "exact")
    assert(ColdTier.exactServedFrom.get == "memory",
      "default engine should be the warm-cache local kernel")
    spark.conf.set(ColdTier.ExactServeLocalKey, "false")
    val scan = try run() finally
      spark.conf.unset(ColdTier.ExactServeLocalKey)
    assert(ColdTier.literalServedVia.get == "exact")
    assert(ColdTier.exactServedFrom.get == "scan",
      "kill switch should force the distributed scan engine")
    (mem, scan)
  }

  test("memory and scan engines are bit-identical on every literal shape") {
    val (dir, all) = fixture
    val qv = all(123)._2
    val lt = org.apache.spark.sql.types.LongType

    // EQUALITY: label = 2 — also checked against an independent truth
    val (mEq, sEq) = bothEngines(Seq(("label", Seq(2L), lt)), qv = qv)
    assert(mEq == sEq)
    val truthEq = all.filter(_._4 == 2L)
      .map { case (id, v, _, _, _) => (id, Distances.l2(qv, v)) }
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toList
    assert(mEq.map(_._3).toList == truthEq)

    // IN: label IN (1, 3) — two admitted segments, merged by one heap
    val (mIn, sIn) = bothEngines(Seq(("label", Seq(1L, 3L), lt)), qv = qv)
    assert(mIn == sIn)
    val truthIn = all.filter(r => r._4 == 1L || r._4 == 3L)
      .map { case (id, v, _, _, _) => (id, Distances.l2(qv, v)) }
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toList
    assert(mIn.map(_._3).toList == truthIn)

    // CONJUNCTION with a numeric RANGE on an un-statted attr (score):
    // admission collapses via the label, hydration applies both exactly
    val rb = Seq(
      ColdTier.RangeBound("score", ">=", 100.0,
        org.apache.spark.sql.types.DoubleType),
      ColdTier.RangeBound("score", "<", 700.0,
        org.apache.spark.sql.types.DoubleType))
    val (mCj, sCj) = bothEngines(Seq(("label", Seq(2L), lt)), rb, qv)
    assert(mCj == sCj)
    val truthCj = all
      .filter(r => r._4 == 2L && r._5 >= 100.0 && r._5 < 700.0)
      .map { case (id, v, _, _, _) => (id, Distances.l2(qv, v)) }
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toList
    assert(mCj.map(_._3).toList == truthCj)

    // a value no segment admits: empty result from the shared early
    // return, both engines
    val empty = ColdTier.searchIndexedLiteralFiltered(spark, dir,
      queriesDf(qv), k, Seq(("label", Seq(99L), lt)), Metric.L2,
      shortlist = 8, efSearch = 32)
    assert(empty.count() == 0)
  }

  test("tombstones kill rows identically in both engines") {
    import spark.implicits._
    val (dir, all) = fixture
    val qv = all(123)._2
    val lt = org.apache.spark.sql.types.LongType
    val (before, _) = bothEngines(Seq(("label", Seq(2L), lt)), qv = qv)
    val victim = before.head._3
    assert(ColdTier.sealDeletes(
      Seq((victim, victim)).toDF("id", "ts"), dir, batchId = 901L))
    val (mAfter, sAfter) = bothEngines(Seq(("label", Seq(2L), lt)), qv = qv)
    assert(mAfter == sAfter)
    assert(!mAfter.exists(_._3 == victim),
      s"tombstoned id $victim should be gone")
    assert(mAfter.map(_._3) != before.map(_._3))
  }

  test("non-plan-time or oversized query sets fall back to the scan engine") {
    import spark.implicits._
    val (dir, all) = fixture
    val qv = all(123)._2
    val lt = org.apache.spark.sql.types.LongType
    def run(qs: org.apache.spark.sql.DataFrame) =
      ColdTier.searchIndexedLiteralFiltered(spark, dir, qs, k,
        Seq(("label", Seq(2L), lt)), Metric.L2, shortlist = 8,
        efSearch = 32).collect()

    // a cached query set is an InMemoryRelation, not a LocalRelation —
    // the plan-time row bound cannot be established, so: scan engine
    val cached = queriesDf(qv).cache()
    try {
      cached.count()
      val viaCache = run(cached)
      assert(ColdTier.exactServedFrom.get == "scan")
      assert(viaCache.nonEmpty)
    } finally cached.unpersist()

    // a query batch past the configured bound stays distributed
    val two = Seq((0L, qv, 100000L, 1000000L), (1L, qv, 100000L, 1000000L))
      .toDF("qid", "qv", "qtime", "ttl")
    spark.conf.set(ColdTier.ExactServeLocalMaxQueriesKey, "1")
    try {
      run(two)
      assert(ColdTier.exactServedFrom.get == "scan")
    } finally spark.conf.unset(ColdTier.ExactServeLocalMaxQueriesKey)
    // and under the default bound the same batch serves from memory —
    // through the PARALLEL per-query kernel (r16: >1 plan-time queries
    // fan across ExecutionContext.global; slot-indexed assembly keeps
    // the output bit-identical to the sequential order) — bit-equal to
    // the distributed scan engine on the same batch
    val memBatch = run(two)
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(ColdTier.exactServedFrom.get == "memory")
    spark.conf.set(ColdTier.ExactServeLocalKey, "false")
    val scanBatch = try run(two)
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      finally spark.conf.unset(ColdTier.ExactServeLocalKey)
    assert(memBatch == scanBatch,
      "parallel batch kernel must be bit-identical to the scan engine")
    // both queries share one qv: identical per-query answers, rn 1..k
    assert(memBatch.count(_._1 == 0L) == k && memBatch.count(_._1 == 1L) == k)
  }

  test("warm cache: one load per admitted segment, reused across statements") {
    val (dir, all) = fixture
    val qv = all(123)._2
    val lt = org.apache.spark.sql.types.LongType
    ColdTier.SegmentDataCache.invalidateAll()
    def run(lbl: Long) =
      ColdTier.searchIndexedLiteralFiltered(spark, dir, queriesDf(qv), k,
        Seq(("label", Seq(lbl), lt)), Metric.L2, shortlist = 8,
        efSearch = 32).collect()
    run(2L)
    assert(ColdTier.exactServedFrom.get == "memory")
    val afterFirst = ColdTier.SegmentDataCache.entryCount
    assert(afterFirst == 1, s"one admitted segment -> one entry, " +
      s"got $afterFirst")
    run(2L); run(2L)
    assert(ColdTier.SegmentDataCache.entryCount == afterFirst,
      "repeat statements must not reload the segment")
    run(1L)
    assert(ColdTier.SegmentDataCache.entryCount == afterFirst + 1)
    assert(ColdTier.SegmentDataCache.cachedBytes > 0)
  }

  test("admission past the cache byte budget falls back to the scan " +
      "engine bit-equally (r16 verdict #7: a statement must not pin " +
      "more decoded bytes than the engine may hold)") {
    val (dir, all) = fixture
    val qv = all(123)._2
    val lt = org.apache.spark.sql.types.LongType
    def run() = ColdTier.searchIndexedLiteralFiltered(spark, dir,
        queriesDf(qv), k, Seq(("label", Seq(2L), lt)), Metric.L2,
        shortlist = 8, efSearch = 32)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val mem = run()
    assert(ColdTier.exactServedFrom.get == "memory")
    // 250 admitted rows estimate far above 2 KiB: the statement must
    // not enter the memory engine (positive budget, so the engine
    // itself stays enabled — this is the admitted-bytes precondition,
    // not the kill switch)
    spark.conf.set(ColdTier.SegmentCacheBytesKey, "2048")
    val scan = try run()
      finally spark.conf.unset(ColdTier.SegmentCacheBytesKey)
    assert(ColdTier.exactServedFrom.get == "scan",
      "an admission past the byte budget must fall back to the scan engine")
    assert(mem == scan)
  }

  test("parallel batch kernel with a non-positive wait bound falls back " +
      "to the scan engine bit-equally (finite Await, r16 verdict #7)") {
    import spark.implicits._
    val (dir, all) = fixture
    val qv = all(123)._2
    val lt = org.apache.spark.sql.types.LongType
    val two = Seq((0L, qv, 100000L, 1000000L), (1L, all(500)._2, 100000L,
      1000000L)).toDF("qid", "qv", "qtime", "ttl")
    def run() = ColdTier.searchIndexedLiteralFiltered(spark, dir, two, k,
        Seq(("label", Seq(2L), lt)), Metric.L2, shortlist = 8,
        efSearch = 32)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val mem = run()
    assert(ColdTier.exactServedFrom.get == "memory")
    spark.conf.set(ColdTier.ExactServeLocalTimeoutSecKey, "0")
    val scan = try run()
      finally spark.conf.unset(ColdTier.ExactServeLocalTimeoutSecKey)
    assert(ColdTier.exactServedFrom.get == "scan",
      "a disabled batch wait bound must fall back to the scan engine")
    assert(mem == scan)
    // the single-query inline path never waits, so it stays on memory
    spark.conf.set(ColdTier.ExactServeLocalTimeoutSecKey, "0")
    try {
      ColdTier.searchIndexedLiteralFiltered(spark, dir, queriesDf(qv), k,
        Seq(("label", Seq(2L), lt)), Metric.L2, shortlist = 8,
        efSearch = 32).collect()
      assert(ColdTier.exactServedFrom.get == "memory")
    } finally spark.conf.unset(ColdTier.ExactServeLocalTimeoutSecKey)
  }

  test("scan fallback keeps the literal pushed to the parquet scan") {
    val (dir, all) = fixture
    val qv = all(123)._2
    val lt = org.apache.spark.sql.types.LongType
    spark.conf.set(ColdTier.ExactServeLocalKey, "false")
    try {
      val df = ColdTier.searchIndexedLiteralFiltered(spark, dir,
        queriesDf(qv), k, Seq(("label", Seq(2L), lt)), Metric.L2,
        shortlist = 8, efSearch = 32)
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("PushedFilters: ["),
        "the scan engine must push the literal to the parquet scan")
    } finally spark.conf.unset(ColdTier.ExactServeLocalKey)
  }

  test("single-wave fast path (fwf >= 1) is bit-identical to the two-wave " +
      "plan and keeps the searchStats contract") {
    import spark.implicits._
    val (dir, all) = fixture
    val qs = Seq(
      (0L, all(123)._2, 100000L, 1000000L),
      (1L, all(500)._2, 100000L, 1000000L))
      .toDF("qid", "qv", "qtime", "ttl")
    def run(fwf: Double) = ColdTier.search(spark, dir, qs, k, Metric.L2,
        firstWaveFraction = fwf, terminationFactor = 1.0)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    // both are lossless exact plans; fwf = 1.0 takes the r16 single-wave
    // path (no thresholds join, no wave-2 scan, no wave1Top persist)
    assert(run(1.0) == run(0.34))
    val stats = scala.collection.mutable.Map.empty[String, Long]
    ColdTier.search(spark, dir, qs, k, Metric.L2, firstWaveFraction = 1.0,
      terminationFactor = 1.0, searchStats = Some(stats)).collect()
    assert(stats("wave1_probes") == 8L, // 2 queries x 4 fresh segments
      s"got ${stats("wave1_probes")}")
    assert(stats("wave2_planned") == 0L && stats("wave2_scanned") == 0L)
  }

  test("catalog cache kill switch: catalog stays correct with the cache off") {
    val (dir, _) = fixture
    val on = ColdTier.catalog(spark, dir).map(_.segmentId).sorted
    spark.conf.set(ColdTier.CatalogCacheKey, "false")
    val off = try ColdTier.catalog(spark, dir).map(_.segmentId).sorted
      finally spark.conf.unset(ColdTier.CatalogCacheKey)
    assert(on.sameElements(off))
  }
}
