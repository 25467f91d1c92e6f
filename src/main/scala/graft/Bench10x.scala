package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * The 10x scale point as its OWN main, spawnable in a fresh JVM.
 *
 * Why a separate process: the 10x ANN/brute-force comparison is the
 * headline scale-up evidence, and it has twice been mis-recorded when it
 * ran last inside the long bench JVM (r5: scaleup 0.247; r7:
 * ann_10x 245.9 s vs a clean ~125 s — old-gen garbage and page-cache
 * pressure from the preceding ~1000 s of suite work, not plan cost).
 * A child JVM starts with a clean heap by construction, so the number
 * stays attributable no matter what ran before it. [[Bench]] spawns this
 * main (inheriting the parent's module flags and classpath) and falls
 * back to calling [[run]] in-process only if the spawn itself fails.
 *
 * Corpus: 10x-replicated center-mixture (same cluster structure, 10x
 * density per center — TESTDATA.md: no real SIFT/BIGANN exists in this
 * sandbox). Ground truth by the exact bounded-heap kernel; ANN is the
 * same IVF-cells + salted per-partition HNSW composition as
 * bench_ann_ivf_hnsw. Min-of-`reps` with a GC between reps, and the raw
 * per-rep seconds ride the output so a noisy run is diagnosable instead
 * of adjudicable-only-by-rerun.
 */
object Bench10x {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Runs the sweep; returns the headline JSON key fragment (no braces). */
  def run(spark: SparkSession, sfDir: String, cpus: Int, reps: Int): String = {
    import graft.ops.Ann
    import graft.partitioners.{KMeansPartitioner, SaltedPartitioner}
    // environment calibration in THIS jvm before any timed section —
    // the 10x family's round-over-round drift separates into environment
    // vs code against this canned constant-work point (Bench.calibrationBf)
    val calibSec = Bench.calibrationBf(spark, cpus)
    val mult = 10
    val vecs1 = Bench.derivedVectors(spark, sfDir).repartition(cpus)
    // the fit sample and cells are identical to the 1x bench section's by
    // construction (same derivation, same seed) — the salting is the only
    // corpus-size-dependent piece, refit for the 10x count
    val sample = vecs1.limit(8192).select("vec").collect()
      .map(_.getSeq[Float](0).toArray)
    // the corpus MUST be materialized before timing: uncached, every
    // brute-force and ANN pass re-paid the derivation (≈77M gaussians per
    // 600k vectors) plus the repartition shuffle, so both sides of the
    // recorded r7 comparison measured corpus synthesis, not search — the
    // actual root cause behind "ANN slower than brute force at 10x"
    // (bf_10x 97s at sf0.1 was mostly derivation; the sf0.01 smoke shows
    // 10.7s "bf" where the real scan is sub-second). MEMORY_AND_DISK:
    // ~5 GB deserialized at sf0.1, spills instead of OOMing elsewhere.
    val vecs10 = Bench.derivedVectorsN(spark, sfDir, mult)
      .repartition(cpus * 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nVec10 = vecs10.count()
    // ~2100 queries at sf0.1-10x: per-query comparisons need enough
    // queries that fixed costs (job scheduling, sidecar cache warm-up)
    // amortize — brute force scales linearly in queries, the indexed
    // probe path sublinearly, and ~200 queries hid exactly that
    val qMod = sys.env.getOrElse("SPARK_GRAFT_10X_QMOD", "2861").toLong
    val q10 = vecs10.where(col("id") % qMod === 0)
      .select(col("id").as("qid"), col("vec").as("qv"),
        lit(Long.MaxValue / 2).as("qtime"), lit(Long.MaxValue / 2).as("ttl"))
      .cache()
    val nQ10 = q10.count()

    def bfRun() = Ann.bruteForce(vecs10, q10, 10, Metric.L2)
      .groupBy("qid").agg(collect_set(col("id")).as("ids")).collect()
    val (bfRows, bf1) = time(bfRun())
    val bfTimes = bf1 +: (2 to reps).map { _ => System.gc(); time(bfRun())._2 }

    val cells = KMeansPartitioner.fit(sample, k = cpus * 2,
      replicationFactor = 1, iterations = 4, seed = 42L, queryProbes = 8)
    val salt10 = SaltedPartitioner.fromSample(cells, sample, nVec10,
      targetPerPartition = 4000L)
    def annRun() = Ann.search(vecs10, q10, salt10, 10, Metric.L2,
        useHnsw = true, hnswM = 16, efConstruction = 48, efSearch = 64)
      .groupBy("qid").agg(collect_set(col("id")).as("ids")).collect()
    System.gc()
    val (annRows, ann1) = time(annRun())
    val annTimes = ann1 +: (2 to reps).map { _ => System.gc(); time(annRun())._2 }

    val truth = bfRows.map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val rc = annRows.map { r =>
      val t = truth(r.getLong(0))
      r.getSeq[Long](1).count(t.contains).toDouble / t.size
    }

    // --- routed kNN JOIN at the scale point (200k vectors vs the
    // parent's 30k), cells scaled with the corpus (256 vs 96 — the
    // cells ~ corpus/constant policy the operator's scaladoc states).
    // The scaling claim is PAIRS/S against the parent's key: pair mass
    // is measured (below), not assumed — clusters densify with the
    // corpus, so the workload grows faster than vector count
    val joinN10 = math.min(200000L, nVec10).toInt
    val joinVecs10 = vecs10.limit(joinN10)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    joinVecs10.count()
    // salted like the 1x point (one hot cell otherwise serializes a
    // third of the pair mass — Ann.knnJoin scaladoc)
    val joinModel10 = SaltedPartitioner.fromSample(
      KMeansPartitioner.fit(sample, k = 256, replicationFactor = 1,
        iterations = 4, seed = 42L, queryProbes = 4),
      sample, joinN10, targetPerPartition = 500L)
    // measured pair mass — same attribution key as the 1x point, so the
    // scale pair separates workload growth (clusters densify) from lost
    // kernel efficiency (the dedup pair-normalized recipe)
    val joinPairs10 = {
      import spark.implicits._
      val (dj, qj) = Ann.selfJoinRouting(joinVecs10.toDF(), joinModel10)
      dj.groupByKey(_.pid).count().toDF("pid", "nd")
        .join(qj.groupByKey(_.pid).count().toDF("pid2", "nq"),
          col("pid") === col("pid2"))
        .agg(sum(col("nd") * col("nq"))).first().getLong(0)
    }
    def joinRun10() = Ann.knnJoin(joinVecs10.toDF(), 5, joinModel10,
      Metric.L2, useHnsw = false).count()
    System.gc()
    val (_, join1) = time(joinRun10())
    val joinTimes = join1 +: (2 to reps).flatMap { i =>
      if (!Bench.BenchBudget.allow(s"knn_join_10x_rep$i",
          math.ceil(join1).toLong)) None
      else { System.gc(); Some(time(joinRun10())._2) }
    }
    joinVecs10.unpersist()

    // --- the amortized serving shape: ann_10x_sec above REBUILDS every
    // per-partition graph per run (insert+query throughput — the
    // streaming number), so comparing it against a cached-corpus scan
    // reads as "ANN loses to brute force" when what actually loses is
    // build-per-query. Seal the corpus into cold segments ALONG
    // VECTOR-SPACE STRUCTURE (one segment per k-means cell) with HNSW
    // sidecars ONCE (build, timed), then time the query pass alone with
    // probeSegments routing — probes/query stay constant as the corpus
    // grows, so query/sec on the built index vs query/sec of the exact
    // scan is the comparison a 100-TB serving deployment cares about.
    val tier = java.nio.file.Files.createTempDirectory("bench10x-tier")
      .toString
    val nSegs = cpus * 2
    val bCells = spark.sparkContext.broadcast(cells)
    val withCell = vecs10.withColumn("cell",
      udf((v: Seq[Float]) => bCells.value.dataPartitions(v.toArray, 0L)(0))
        .apply(col("vec")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (_, buildSec) = time {
      val segStats = graft.store.ColdTier.sealMany(
        withCell.select(col("cell").cast("long").as("segmentId"), col("id"),
          col("vec"), col("eventTime"),
          pmod(col("id"), lit(8)).cast("long").as("label"),
          // 1%-selectivity label for the static-vs-adaptive overfetch
          // comparison below (100 uniform values)
          pmod(col("id"), lit(100)).cast("long").as("label100")), tier)
      // label100 rides the sidecars as per-node hashes (format v2) so
      // the 1pct section can measure the IN-WALK filtered probe on the
      // same build — one extra long per row through the same shuffle
      // (r13: the build key now includes this hashing)
      graft.store.ColdTier.sealIndexes(spark, tier,
        segStats.map(_.segmentId).toSeq,
        Metric.L2, m = 16, efConstruction = 48, maxGraphRows = 150000,
        attrColumns = Seq("label100"))
    }
    withCell.unpersist()
    // probeSegments 12 / efSearch 96: the serving paths beat the exact
    // scan ~5x at probes=8/ef=64 but recorded recall 0.9275 — spending
    // half the margin on wider probes buys the >= 0.95 recall a serving
    // claim should carry (still a clear multiple over brute force)
    def idxRun() = graft.store.ColdTier.searchIndexed(spark, tier, q10, 10,
        Metric.L2, shortlist = 96, efSearch = 96, probeSegments = 12)
      .groupBy("qid").agg(collect_set(col("id")).as("ids")).collect()
    // rep 1 cold-loads every shard sidecar from disk — the r9 artifact's
    // [24.10, 16.61] rep spread was exactly that IO riding the min-of-2
    // (r8 happened to run warmer). The cold pass gets its own key; the
    // serving number is min over >= 2 WARM reps only.
    val (idxRows, idxCold) = time(idxRun())
    val idxWarm = (1 to math.max(2, reps - 1)).map { _ =>
      System.gc(); time(idxRun())._2 }
    val idxTimes = idxCold +: idxWarm
    def recallVsTruth(rows: Array[org.apache.spark.sql.Row]): Double = {
      val per = rows.map { r =>
        val t = truth(r.getLong(0))
        r.getSeq[Long](1).count(t.contains).toDouble / t.size
      }
      if (per.nonEmpty) per.sum / per.length else 0.0
    }
    val idxRecall = recallVsTruth(idxRows)
    // the serving fast path: same routing + probes, graph distances
    // merged directly — no tier-wide candidate-hydration scan
    def fastRun() = graft.store.ColdTier.searchIndexedFast(spark, tier, q10,
        10, Metric.L2, efSearch = 96, probeSegments = 12, shortlist = 96)
      .groupBy("qid").agg(collect_set(col("id")).as("ids")).collect()
    val (fastRows, fast1) = time(fastRun())
    val fastTimes = fast1 +: (2 to reps).map { _ => System.gc(); time(fastRun())._2 }
    val fastRecall = recallVsTruth(fastRows)

    // --- FILTERED serving at 10x: per-query label equality through the
    // indexed probe (filter-oblivious graph shortlist over-fetched 8x,
    // candidate-bounded hydration under the equality). The tier is
    // vector-clustered, so attr admission cannot prune — this measures
    // the hydration-side cost of a selectivity-1/8 filter at 6M rows;
    // the full-tier attr-stats seal gets its own build key.
    val (_, attrStatsSec) = time(
      graft.store.ColdTier.sealAttrStats(spark, tier, "label"))
    val qF = q10.withColumn("qfilter",
      pmod(col("qid"), lit(8)).cast("long")).cache()
    qF.count()
    // same terminal action as idxRun/fastRun (collect_set + driver
    // collect) so the filtered-vs-unfiltered q/s ratio is apples-to-apples
    def filtRun() = graft.store.ColdTier.searchIndexedFiltered(spark, tier,
        qF, 10, "label", Metric.L2, shortlist = 96, efSearch = 96,
        probeSegments = 12, overfetch = 8)
      .groupBy("qid").agg(collect_set(col("id")).as("ids")).collect()
    System.gc()
    val filt1 = time(filtRun())._2
    val filtTimes = filt1 +: (2 to reps).flatMap { i =>
      if (!Bench.BenchBudget.allow(s"ann_filtered_10x_rep$i",
          math.ceil(filt1).toLong)) None
      else { System.gc(); Some(time(filtRun())._2) }
    }
    qF.unpersist()

    // --- selectivity-DRIVEN overfetch at 10x (the r11 verdict's ask):
    // a 1%-selectivity label through the same indexed probe, once with
    // the static 8x over-fetch (the registered guess) and once with the
    // histogram estimate sizing the shortlist (adaptiveOverfetch inside
    // searchIndexedLiteralFiltered — the attr-stats sidecar on label100
    // estimates ~1/100, raising the factor to the 64x cap). Same single
    // literal label on both sides, recall vs the exact filtered kernel
    // over the same 512-query subsample: the static point's recall
    // collapse (~8 surviving candidates for k=10) vs the adaptive
    // point's recovery is the evidence the ESTIMATOR sizes the
    // shortlist instead of the operator.
    val (_, attrStats100Sec) = time(
      graft.store.ColdTier.sealAttrStats(spark, tier, "label100"))
    val selLbl = 37L
    val onePctNQ = 512
    // r14 (the r13 rc=124 lesson): the SLOW rare-label points — the
    // adaptive 39x over-fetch at ~1.6 q/s and the mixed-layout in-walk
    // walk at ~0.5-0.8 q/s — run ONCE over a 128-query subsample. Their
    // r13 twin spread (in-walk best-rep 1045 vs 628 s across twins) was
    // wider than any within-run rep gain, so reps bought nothing, and
    // the two points alone cost ~33 min of the driver's budget (the
    // rc=124 timeout). The static point keeps the full 512 x min-of-2
    // (the frontier anchor at ~3 min). Per-point query counts ride the
    // artifact — no silent caps.
    val sub1pNQ = 128
    val q1p = q10.limit(onePctNQ).cache(); q1p.count()
    val sel1p = graft.store.ColdTier.estimateSelectivity(spark, tier,
      "label100", Seq(selLbl.toDouble), Double.NaN, Double.NaN)
    val adaptiveFactor = graft.store.ColdTier.adaptiveOverfetch(8, sel1p)
    val q1pF = q1p.withColumn("qfilter", lit(selLbl)).cache(); q1pF.count()
    val q1pS = q1p.limit(sub1pNQ).cache(); q1pS.count()
    val q1pSF = q1pS.withColumn("qfilter", lit(selLbl)).cache()
    val subQids = q1pS.select("qid").collect().map(_.getLong(0)).toSet
    def filtered1pTruth() = graft.store.ColdTier.search(spark, tier, q1pF,
        10, Metric.L2, firstWaveFraction = 1.0, terminationFactor = 1.0,
        filterColumn = Some("label100"))
      .groupBy("qid").agg(collect_set(col("id")).as("ids")).collect()
    val truth1p = filtered1pTruth()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // recall over the point's own query set (`qids` restricts to a
    // subsample — a missing qid counts 0 only among the queries the
    // point actually ran)
    def recall1p(rows: Array[org.apache.spark.sql.Row],
        qids: Set[Long] = null): Double = {
      val per = truth1p.toSeq
        .filter { case (qid, _) => qids == null || qids(qid) }
        .map { case (qid, t) =>
          if (t.isEmpty) 1.0
          else rows.collectFirst { case r if r.getLong(0) == qid =>
            r.getSeq[Long](1).count(t.contains).toDouble / t.size
          }.getOrElse(0.0)
        }
      if (per.nonEmpty) per.sum / per.length else 0.0
    }
    def arr(ts: Seq[Double]) =
      ts.map(t => "%.2f".format(t)).mkString("[", ",", "]")
    // guarded phases append their keys here; a skipped phase's keys are
    // simply absent AND its name lands in bench10x_skipped
    val frags = scala.collection.mutable.ArrayBuffer.empty[String]
    // --- ROTATION (r15, closing r14 verdict #1): the rare-label
    // frontier is ANSWERED (the aligned exact kernel dominates — r14d),
    // so its expensive CONTEXT points — adaptive 39x over-fetch
    // (~90-140 s), mixed-layout in-walk (~165-225 s), and the aligned
    // in-walk pair (~70-90 s) — retire to an every-other-round rotation
    // instead of eating the per-round budget (r14 margins: 65-217 s).
    // The every-other-round schedule is ROUND-DETERMINISTIC (r15
    // verdict #4 — an env flag the operator must remember is how
    // "deferred" silently becomes "never ran"): the harness derives the
    // current round from the committed BENCH_r{N}.json artifacts in the
    // working directory (max N + 1 — the driver commits r{N}'s artifact
    // before round N+1 starts) and runs rotation on ODD rounds (r15 ran
    // it; the parity continues from there). SPARK_GRAFT_BENCH_ROTATION
    // =1/=0 still force-overrides for hand-driven runs. The artifact
    // stamps bench_rotation_round + bench_rotation_policy next to the
    // ran/deferred lists so on-schedule deferral is machine-checkable.
    // Kept per-round: the mixed static anchor, the aligned static
    // anchor, the lossless endpoint, and the cheap qin/SQL serving
    // points below.
    val rotationRound: Int = {
      val pat = java.util.regex.Pattern.compile("BENCH_r(\\d+)\\.json")
      val prior = Option(new java.io.File(".").listFiles()).toSeq.flatten
        .flatMap { f =>
          val m = pat.matcher(f.getName)
          if (m.matches()) Some(m.group(1).toInt) else None
        }
      if (prior.isEmpty) 0 else prior.max + 1
    }
    val rotationOn = sys.env.get("SPARK_GRAFT_BENCH_ROTATION") match {
      case Some("1") => true
      case Some("0") => false
      case _ => rotationRound % 2 == 1
    }
    val rotationRan = scala.collection.mutable.ArrayBuffer.empty[String]
    val rotationDeferred = scala.collection.mutable.ArrayBuffer.empty[String]
    // a rotation-enabled point still clears the shared budget before it
    // is listed as RAN — a budget denial lands in bench_rotation_
    // deferred (and, via allow(), in bench10x_skipped) so ran/deferred
    // can never claim a run that did not happen
    def rotate(point: String, estSec: Long)(body: => Unit): Unit =
      if (!rotationOn) rotationDeferred += point
      else if (Bench.BenchBudget.allow(point, estSec)) {
        rotationRan += point; body
      } else rotationDeferred += point
    def static1pRun() = graft.store.ColdTier.searchIndexedFiltered(spark,
        tier, q1pF, 10, "label100", Metric.L2, shortlist = 96,
        efSearch = 96, probeSegments = 12, overfetch = 8)
      .groupBy("qid").agg(collect_set(col("id")).as("ids")).collect()
    System.gc()
    val (staticRows, static1pA) = time(static1pRun())
    val static1pTimes =
      if (reps >= 2 && Bench.BenchBudget.allow("1pct_static_rep2",
          math.ceil(static1pA).toLong))
        Seq(static1pA, { System.gc(); time(static1pRun())._2 })
      else Seq(static1pA)
    val static1pRecall = recall1p(staticRows)
    rotate("1pct_adaptive", 300) {
      def adaptive1pRun() = graft.store.ColdTier
        .searchIndexedLiteralFiltered(spark, tier, q1pS, 10,
          filters = Seq(("label100", Seq(selLbl),
            org.apache.spark.sql.types.LongType)),
          metric = Metric.L2, shortlist = 96, efSearch = 96,
          probeSegments = 12, overfetch = 8)
        .groupBy("qid").agg(collect_set(col("id")).as("ids")).collect()
      System.gc()
      val (adaptiveRows, adaptive1pA) = time(adaptive1pRun())
      val adaptive1pRecall = recall1p(adaptiveRows, subQids)
      frags += s""""ann_filtered1pct_adaptive_queries":$sub1pNQ,""" +
        s""""ann_filtered1pct_adaptive_sec":${"%.2f".format(adaptive1pA)},""" +
        s""""ann_filtered1pct_adaptive_secs":${arr(Seq(adaptive1pA))},""" +
        s""""ann_filtered1pct_adaptive_q_per_sec":${"%.1f".format(sub1pNQ / adaptive1pA)},""" +
        s""""ann_filtered1pct_adaptive_recall":${"%.4f".format(adaptive1pRecall)}"""
    }

    // --- IN-WALK filtered probe on the SAME mixed layout (r12 verdict
    // #2): the label applies at candidate acceptance inside each graph
    // walk (sidecars carry label100 hashes from the build), so every
    // surfaced candidate matches and the shortlist needs no
    // 1/selectivity inflation — 24 per probed segment replaces the
    // adaptive point's 96x39. Subsampled 128 queries x 1 rep (see the
    // r14 note above); recall vs the same exact filtered kernel.
    rotate("1pct_inwalk", 420) {
      def inWalk1pRun() = graft.store.ColdTier.searchIndexedInWalkFiltered(
          spark, tier, q1pSF, 10, "label100", Metric.L2, shortlist = 24,
          efSearch = 96, probeSegments = 12)
        .groupBy("qid").agg(collect_set(col("id")).as("ids")).collect()
      System.gc()
      val (inWalkRows, inWalk1pA) = time(inWalk1pRun())
      val inWalk1pRecall = recall1p(inWalkRows, subQids)
      frags += s""""ann_filtered1pct_inwalk_queries":$sub1pNQ,""" +
        s""""ann_filtered1pct_inwalk_sec":${"%.2f".format(inWalk1pA)},""" +
        s""""ann_filtered1pct_inwalk_secs":${arr(Seq(inWalk1pA))},""" +
        s""""ann_filtered1pct_inwalk_q_per_sec":${"%.1f".format(sub1pNQ / inWalk1pA)},""" +
        s""""ann_filtered1pct_inwalk_recall":${"%.4f".format(inWalk1pRecall)}"""
    }
    // q1p/q1pF stay cached: the attr-aligned recluster points below
    // (after the early-termination section, which needs the tier's
    // CURRENT cell-aligned layout) reuse the same queries and truth

    // --- V5 early termination at scale: the EWMA-assisted approximate
    // two-wave scan (terminationFactor 0.8, reference vector_options.h:
    // 79-96 + version_set.cc:2689-2698) on the same cell-aligned tier.
    // Lossless scan first (the exactness baseline AND the EWMA's training
    // signal via learnThreshold), then the approximate pass with
    // per-query thresholds + the learned fallback; the probe-plan stats
    // record how many wave-2 segment probes the threshold actually
    // skipped. Recall is vs the exact brute-force truth. A 512-query
    // subsample: the evidence is recall + skip fraction, and the full
    // 2068-query wave scan at 10x costs ~6 min PER RUN — the r9 full-set
    // section alone was ~25 min of child wall time for identical
    // conclusions.
    import graft.store.ColdTier
    val etNQ = 512
    val etQ = q10.limit(etNQ).cache(); etQ.count()
    def losslessScan() = ColdTier.search(spark, tier, etQ, 10, Metric.L2,
      firstWaveFraction = 0.25, terminationFactor = 1.0)
    System.gc()
    val (losslessDf, lossless1) = time {
      val df = losslessScan(); df.count(); df
    }
    val losslessTimes = Seq(lossless1)
    val ewma = ColdTier.learnThreshold(losslessDf, 10, None)
    // probe-plan instrumentation runs eagerly at call time — keep it in
    // its own UNTIMED pass so the timed reps measure the search alone
    val etStats = scala.collection.mutable.Map.empty[String, Long]
    ColdTier.search(spark, tier, etQ, 10, Metric.L2,
      firstWaveFraction = 0.25, terminationFactor = 0.8,
      ewmaThreshold = ewma, searchStats = Some(etStats))
    def approxRun() = ColdTier.search(spark, tier, etQ, 10, Metric.L2,
        firstWaveFraction = 0.25, terminationFactor = 0.8,
        ewmaThreshold = ewma)
      .groupBy("qid").agg(collect_set(col("id")).as("ids")).collect()
    System.gc()
    val (etRows, et1) = time(approxRun())
    val etTimes = et1 +: (2 to reps).flatMap { i =>
      if (!Bench.BenchBudget.allow(s"coldscan_et_rep$i",
          math.ceil(et1).toLong)) None
      else { System.gc(); Some(time(approxRun())._2) }
    }
    val etRecall = recallVsTruth(etRows)
    etQ.unpersist()
    val w2Planned = etStats.getOrElse("wave2_planned", 0L)
    val w2Scanned = etStats.getOrElse("wave2_scanned", 0L)

    // --- the CONVERGED rare-label point (r12 verdict #1): reclusterByAttr
    // re-seals the whole 6M-row tier attr-aligned on label100 (one
    // quantile bucket per label, indexes + attr-stats rebuilt — the same
    // pass the streaming lifecycle runs via autoReclusterAttr), then the
    // SAME static filtered call that read recall ~0.61 on the mixed
    // layout runs again: admission now collapses each query to its one
    // matching bucket, whose walk is filter-dense by construction. This
    // is where the rare-label serving story ends — the over-fetch sweep
    // proved fan-out alone caps at ~0.88. Runs AFTER the early-
    // termination section so the et keys keep measuring the
    // cell-aligned layout they always measured.
    // split guards (r14c lesson: a slow hour skipped the WHOLE section
    // under one 500 s estimate, losing the endpoint key the round
    // existed to measure): the build gates the family, then each point
    // gates itself — a tight run still ships the build + the lossless
    // endpoint and drops the cheaper context points piecemeal.
    if (Bench.BenchBudget.allow("1pct_attrrc_build", 300)) {
      val (rcSegs, attrRcBuildSec) = time(
        graft.store.ColdTier.reclusterByAttr(spark, tier, "label100",
          buckets = 100, cellsPerBucket = 1, metric = Metric.L2,
          m = 16, efConstruction = 48, maxGraphRows = 150000))
      frags += s""""ann_filtered1pct_attrrc_build_sec":${"%.2f".format(attrRcBuildSec)},""" +
        s""""ann_filtered1pct_attrrc_segments":${rcSegs.length}"""
      // --- the LOSSLESS endpoint (r13 verdict #2): the exact filtered
      // kernel over the ALIGNED tier. Admission collapses every query
      // to its one single-label bucket (distinct-value bucketing: 100
      // int labels seal as 100 single-label segments since r14), so the
      // full-wave scan reads ~1/100 of the tier per query — recall 1.0
      // by construction (it IS the kernel the frontier recalls
      // against), measured q/s closes the rare-label story.
      def alignedExactRun() = filtered1pTruth()
      if (Bench.BenchBudget.allow("1pct_aligned_exact", 60)) {
        System.gc()
        val (alignedRows, alignedExactA) = time(alignedExactRun())
        val alignedExactTimes =
          if (reps >= 2 && Bench.BenchBudget.allow("1pct_aligned_exact_rep2",
              math.ceil(alignedExactA).toLong))
            Seq(alignedExactA, { System.gc(); time(alignedExactRun())._2 })
          else Seq(alignedExactA)
        val alignedExactRecall = recall1p(alignedRows)
        frags += s""""ann_filtered1pct_aligned_exact_sec":${"%.2f".format(alignedExactTimes.min)},""" +
          s""""ann_filtered1pct_aligned_exact_secs":${arr(alignedExactTimes)},""" +
          s""""ann_filtered1pct_aligned_exact_q_per_sec":${"%.1f".format(onePctNQ / alignedExactTimes.min)},""" +
          s""""ann_filtered1pct_aligned_exact_recall":${"%.4f".format(alignedExactRecall)}"""
      }
      def attrRc1pRun() = graft.store.ColdTier.searchIndexedFiltered(spark,
          tier, q1pF, 10, "label100", Metric.L2, shortlist = 96,
          efSearch = 96, probeSegments = 12, overfetch = 8)
        .groupBy("qid").agg(collect_set(col("id")).as("ids")).collect()
      if (Bench.BenchBudget.allow("1pct_attrrc_static", 60)) {
        System.gc()
        val (attrRcRows, attrRc1pA) = time(attrRc1pRun())
        val attrRc1pTimes = attrRc1pA +: (2 to reps).flatMap { i =>
          if (!Bench.BenchBudget.allow(s"1pct_attrrc_static_rep$i",
              math.ceil(attrRc1pA).toLong)) None
          else { System.gc(); Some(time(attrRc1pRun())._2) }
        }
        val attrRc1pRecall = recall1p(attrRcRows)
        frags += s""""ann_filtered1pct_attrrc_sec":${"%.2f".format(attrRc1pTimes.min)},""" +
          s""""ann_filtered1pct_attrrc_secs":${arr(attrRc1pTimes)},""" +
          s""""ann_filtered1pct_attrrc_q_per_sec":${"%.1f".format(onePctNQ / attrRc1pTimes.min)},""" +
          s""""ann_filtered1pct_attrrc_recall":${"%.4f".format(attrRc1pRecall)}"""
      }
      // --- the COMPOSITION point: in-walk acceptance ON the converged
      // attr-aligned layout at a PLAIN shortlist (24). Measured r13
      // outcome: fastest probe point, recall BELOW aligned-static — on
      // a label-dense bucket the walk is DEPTH-bound, not filter-bound,
      // so the plain shortlist reads shallower than the 8x-deep static
      // one. Kept measured so the frontier ships as data.
      def attrRcInWalk1pRun(sl: Int) =
        graft.store.ColdTier.searchIndexedInWalkFiltered(spark, tier, q1pF,
            10, "label100", Metric.L2, shortlist = sl, efSearch = 96,
            probeSegments = 12)
          .groupBy("qid").agg(collect_set(col("id")).as("ids")).collect()
      rotate("1pct_attrrc_inwalk", 40) {
        System.gc()
        val (attrRcIwRows, attrRcIw1pA) = time(attrRcInWalk1pRun(24))
        val attrRcIw1pTimes = attrRcIw1pA +: (2 to reps).flatMap { i =>
          if (!Bench.BenchBudget.allow(s"1pct_attrrc_inwalk_rep$i",
              math.ceil(attrRcIw1pA).toLong)) None
          else { System.gc(); Some(time(attrRcInWalk1pRun(24))._2) }
        }
        val attrRcIw1pRecall = recall1p(attrRcIwRows)
        frags += s""""ann_filtered1pct_attrrc_inwalk_sec":${"%.2f".format(attrRcIw1pTimes.min)},""" +
          s""""ann_filtered1pct_attrrc_inwalk_secs":${arr(attrRcIw1pTimes)},""" +
          s""""ann_filtered1pct_attrrc_inwalk_q_per_sec":${"%.1f".format(onePctNQ / attrRcIw1pTimes.min)},""" +
          s""""ann_filtered1pct_attrrc_inwalk_recall":${"%.4f".format(attrRcIw1pRecall)}"""
      }
      // --- aligned in-walk at a DEEPER shortlist (r13 verdict #4): the
      // depth-bound hypothesis' test point — shortlist 96 should read as
      // deep as the static call's 96x8 over-fetched walk while keeping
      // the acceptance filter, i.e. ~aligned-static recall at a multiple
      // of its q/s.
      rotate("1pct_attrrc_inwalk96", 50) {
        System.gc()
        val (attrRcIw96Rows, attrRcIw96A) = time(attrRcInWalk1pRun(96))
        val attrRcIw96Times = attrRcIw96A +: (2 to reps).flatMap { i =>
          if (!Bench.BenchBudget.allow(s"1pct_attrrc_inwalk96_rep$i",
              math.ceil(attrRcIw96A).toLong)) None
          else { System.gc(); Some(time(attrRcInWalk1pRun(96))._2) }
        }
        val attrRcIw96Recall = recall1p(attrRcIw96Rows)
        frags += s""""ann_filtered1pct_attrrc_inwalk96_sec":${"%.2f".format(attrRcIw96Times.min)},""" +
          s""""ann_filtered1pct_attrrc_inwalk96_secs":${arr(attrRcIw96Times)},""" +
          s""""ann_filtered1pct_attrrc_inwalk96_q_per_sec":${"%.1f".format(onePctNQ / attrRcIw96Times.min)},""" +
          s""""ann_filtered1pct_attrrc_inwalk96_recall":${"%.4f".format(attrRcIw96Recall)}"""
      }
      // --- the per-query-IN rare-label answer as DATA (r14 verdict #5):
      // the qin IN-WALK probe sits on the same beam-bound cliff equality
      // sat on (it runs a plain shortlist), so on the CONVERGED layout
      // the serving answer for rare-label IN is the same as for equality
      // — the EXACT filterIn kernel: per-value admission collapses each
      // IN value to its one single-label bucket, the scan kernel answers
      // each exactly and the by-qid merge recomposes (lossless by the
      // oracle-gated filterIn construction; knn_coldtier* filterIn
      // entries are bit-exact in DuckDB). This point measures that
      // endpoint's throughput at |IN| = 2 — expected ~half the equality
      // endpoint's q/s (two buckets scanned per query).
      if (Bench.BenchBudget.allow("1pct_qin_exact", 60)) {
        val qinLbl2 = 73L
        val qQin = q1p.withColumn("qfin",
          array(lit(selLbl), lit(qinLbl2))).cache()
        qQin.count()
        def qinExactRun() = graft.store.ColdTier.search(spark, tier, qQin,
            10, Metric.L2, firstWaveFraction = 1.0,
            terminationFactor = 1.0, filterColumn = Some("label100"),
            filterIn = true)
          .groupBy("qid").agg(collect_set(col("id")).as("ids")).collect()
        System.gc()
        val (_, qinExactA) = time(qinExactRun())
        val qinExactTimes =
          if (reps >= 2 && Bench.BenchBudget.allow("1pct_qin_exact_rep2",
              math.ceil(qinExactA).toLong))
            Seq(qinExactA, { System.gc(); time(qinExactRun())._2 })
          else Seq(qinExactA)
        qQin.unpersist()
        frags += s""""ann_filtered1pct_qin_exact_queries":$onePctNQ,""" +
          s""""ann_filtered1pct_qin_exact_in_size":2,""" +
          s""""ann_filtered1pct_qin_exact_sec":${"%.2f".format(qinExactTimes.min)},""" +
          s""""ann_filtered1pct_qin_exact_secs":${arr(qinExactTimes)},""" +
          s""""ann_filtered1pct_qin_exact_q_per_sec":${"%.1f".format(onePctNQ / qinExactTimes.min)}"""
      }
      // --- the lossless endpoint through the SQL SURFACE (r14 verdict
      // #3): the same rare-label equality idiom a user writes — `WHERE
      // label100 = x ORDER BY l2_distance(vec, q) LIMIT 10` — against a
      // REGISTERED corpus, served end-to-end by the optimizer rewrite +
      // the exact-kernel serving decision (searchIndexedLiteralFiltered
      // picks the admission-collapsed exact scan on the aligned tier;
      // the warm-up asserts it via literalServedVia and THROWS
      // otherwise). Issued as 512 independent spark.sql statements
      // through a 16-thread pool — the serving-deployment shape, where
      // per-statement plan work (parse/analyze/rewrite) amortizes
      // across concurrent queries. Recall vs the same exact filtered
      // truth — 1.0000 expected by construction. The registered corpus
      // parquet is a tiny schema stand-in: the rewrite REPLACES the
      // corpus scan with the tier probe, so corpus bytes are never
      // read; the 6M-row tier is the real serving target.
      if (Bench.BenchBudget.allow("1pct_sql_exact", 90)) {
        val standin = java.nio.file.Files
          .createTempDirectory("bench10x-sqlcorpus").toString
        vecs10.limit(64)
          .withColumn("label100", pmod(col("id"), lit(100)).cast("long"))
          .write.mode("overwrite").parquet(standin)
        graft.GraftFunctions.register(spark)
        graft.plans.KnnIndex.install(spark)
        val qPairs = q1p.select("qid", "qv").collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        try {
          graft.plans.KnnIndex.register(standin, tier, idCol = "id",
            vecCol = "vec", metric = Metric.L2, efSearch = 96,
            probeSegments = 12, shortlist = 96,
            filterColumns = Set("label100"), filterOverfetch = 8)
          spark.read.parquet(standin)
            .createOrReplaceTempView("graft_bench_corpus_al")
          def sqlOne(qv: Array[Float]): Array[Long] = {
            val arrLit = qv.map(f => s"CAST($f AS FLOAT)")
              .mkString("array(", ",", ")")
            spark.sql(
              s"""SELECT id, l2_distance(vec, $arrLit) AS dist
                 |FROM graft_bench_corpus_al WHERE label100 = $selLbl
                 |ORDER BY dist LIMIT 10""".stripMargin)
              .collect().map(_.getLong(0))
          }
          // warm-up (stats/catalog caches) + the serving-decision gate
          graft.store.ColdTier.literalServedVia.remove()
          sqlOne(qPairs.head._2)
          require(graft.store.ColdTier.literalServedVia.get == "exact",
            "1pct_sql_exact: the graph probe served the aligned tier " +
              "through SQL — the exact-kernel decision did not fire")
          val threads = 16
          val pool = java.util.concurrent.Executors
            .newFixedThreadPool(threads)
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutor(pool)
          System.gc()
          val (hits, sqlA) = time {
            val futs = qPairs.map { case (qid, qv) =>
              scala.concurrent.Future((qid, sqlOne(qv)))
            }
            scala.concurrent.Await.result(
              scala.concurrent.Future.sequence(futs.toSeq),
              scala.concurrent.duration.Duration.Inf)
          }
          pool.shutdown()
          val sqlRecall = hits.map { case (qid, ids) =>
            val t = truth1p.getOrElse(qid, Set.empty[Long])
            if (t.isEmpty) 1.0 else ids.count(t.contains).toDouble / t.size
          }.sum / hits.length
          frags += s""""ann_filtered1pct_sql_exact_queries":${qPairs.length},""" +
            s""""ann_filtered1pct_sql_exact_threads":$threads,""" +
            s""""ann_filtered1pct_sql_exact_sec":${"%.2f".format(sqlA)},""" +
            s""""ann_filtered1pct_sql_exact_q_per_sec":${"%.1f".format(qPairs.length / sqlA)},""" +
            s""""ann_filtered1pct_sql_exact_recall":${"%.4f".format(sqlRecall)}"""
        } finally {
          graft.plans.KnnIndex.unregister(standin)
          org.apache.commons.io.FileUtils.deleteQuietly(
            new java.io.File(standin))
        }
      }
    }
    q1pSF.unpersist(); q1pS.unpersist()
    q1pF.unpersist(); q1p.unpersist()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tier))

    // free the serving sections' held memory BEFORE the dedup phase —
    // the first child-JVM run of this phase died in a GC-locker spill
    // storm here: the SidecarCache still pinned the 6M-vector tier's
    // shard graphs (deleting the tier DIR never evicts the path-keyed
    // cache) and the 10x corpus blocks release asynchronously unless
    // blocked on. Dedup gets the heap the earlier phases borrowed.
    q10.unpersist(blocking = true)
    vecs10.unpersist(blocking = true)
    graft.store.ColdTier.sidecarCacheInvalidate()
    spark.catalog.clearCache()
    System.gc()

    // --- dedup 1x + 10x, in THIS child JVM (r11 verdict #1: the parent
    // ran this phase last in a ~2000s-old JVM and the artifact recorded
    // a 5.5x pair-throughput collapse on unchanged code). Both scale
    // points run here back-to-back so the pair-normalized ratio is
    // same-JVM same-phase, and calib_dedup10x_sec — the canned
    // constant-work kernel measured immediately before the phase —
    // separates environment drift from code on every future round.
    System.gc()
    val calibDedupSec = Bench.calibrationBf(spark, cpus)
    import graft.ops.Dedup
    // same corpus discipline as the parent's 1x/2x sweep: sub-shingle
    // docs excluded (their degenerate signatures cross-match variants)
    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .where(length(col("text")) >= 3).cache()
    val nDoc1 = docs1.count()
    def dedupRun(d: org.apache.spark.sql.DataFrame) =
      Dedup.minhashPairs(d).count()
    var pairs1 = 0L
    val d1Times = (1 to 2).map { _ =>
      System.gc(); val (c, t) = time(dedupRun(docs1)); pairs1 = c; t }
    // ten corpus copies under per-variant seeded alphabet permutations:
    // each char bijection maps shingle sets bijectively, so every
    // variant reproduces the near-dup cluster structure EXACTLY (pair
    // mass x10, checkable via dedup_pairs_{1x,10x}), while
    // cross-variant shingle overlap stays far below the jaccard gate
    val alphabet = {
      import spark.implicits._
      docs1.select(col("text")).as[String]
        .flatMap(_.iterator.map(_.toString)).distinct()
        .collect().map(_.charAt(0)).sorted
    }
    val multD = 10
    val perms = Array.tabulate(multD - 1) { r =>
      val rnd = new scala.util.Random(9000L + r)
      alphabet.zip(rnd.shuffle(alphabet.toVector)).toMap
    }
    val bPerms = spark.sparkContext.broadcast(perms)
    val docs10 = {
      import spark.implicits._
      docs1.as[(Long, String)].flatMap { case (id, t) =>
        (0 until multD).iterator.map { r =>
          if (r == 0) (id, t)
          else (id + r.toLong * (1L << 40),
            t.map(c => bPerms.value(r - 1).getOrElse(c, c)))
        }
      }.toDF("doc_id", "text").repartition(cpus * 2).cache()
    }
    val nDoc10 = docs10.count()
    var pairs10 = 0L
    val d10Times = (1 to 2).map { _ =>
      System.gc(); val (c, t) = time(dedupRun(docs10)); pairs10 = c; t }
    docs10.unpersist(); docs1.unpersist()
    val dps10 = nDoc10 / d10Times.min
    val pps1 = pairs1 / d1Times.min
    val pps10 = pairs10 / d10Times.min

    val recall = if (rc.nonEmpty) rc.sum / rc.length else 0.0
    s""""calib_bf_100k_10x_sec":${"%.2f".format(calibSec)},""" +
      s""""ann_recall_at_10_10x":${"%.4f".format(recall)},""" +
      s""""ann_vectors_per_sec_10x":${"%.1f".format((nVec10 + nQ10) / annTimes.min)},""" +
      s""""n_vectors_10x":$nVec10,""" +
      s""""bf_10x_sec":${"%.2f".format(bfTimes.min)},""" +
      s""""ann_10x_sec":${"%.2f".format(annTimes.min)},""" +
      // self-adjudicating semantics: ann_10x_sec REBUILDS every
      // per-partition graph inside the run (it is an insert+query
      // throughput number); the serving comparison against bf_10x_sec is
      // ann_indexed_/ann_fastpath_query_10x_sec on the once-built index
      s""""ann_10x_includes_graph_build":true,""" +
      s""""bf_10x_secs":${arr(bfTimes)},"ann_10x_secs":${arr(annTimes)},""" +
      s""""ann_index_build_10x_sec":${"%.2f".format(buildSec)},""" +
      s""""ann_indexed_query_10x_sec":${"%.2f".format(idxWarm.min)},""" +
      s""""ann_indexed_query_10x_cold_sec":${"%.2f".format(idxCold)},""" +
      s""""ann_indexed_query_10x_secs":${arr(idxTimes)},""" +
      s""""ann_indexed_recall_10x":${"%.4f".format(idxRecall)},""" +
      s""""ann_indexed_query_per_sec_10x":${"%.1f".format(nQ10 / idxWarm.min)},""" +
      s""""ann_fastpath_query_10x_sec":${"%.2f".format(fastTimes.min)},""" +
      s""""ann_fastpath_query_10x_secs":${arr(fastTimes)},""" +
      s""""ann_fastpath_recall_10x":${"%.4f".format(fastRecall)},""" +
      s""""ann_fastpath_query_per_sec_10x":${"%.1f".format(nQ10 / fastTimes.min)},""" +
      s""""coldtier_attrstats_build_10x_sec":${"%.2f".format(attrStatsSec)},""" +
      s""""ann_filtered_query_10x_sec":${"%.2f".format(filtTimes.min)},""" +
      s""""ann_filtered_query_10x_secs":${arr(filtTimes)},""" +
      s""""ann_filtered_query_per_sec_10x":${"%.1f".format(nQ10 / filtTimes.min)},""" +
      s""""knn_join_n_10x":$joinN10,""" +
      s""""knn_join_pairs_10x":$joinPairs10,""" +
      s""""knn_join_sec_10x":${"%.2f".format(joinTimes.min)},""" +
      s""""knn_join_secs_10x":${arr(joinTimes)},""" +
      s""""knn_join_vec_per_sec_10x":${"%.1f".format(joinN10 / joinTimes.min)},""" +
      s""""knn_join_pairs_per_sec_10x":${"%.1f".format(joinPairs10 / joinTimes.min)},""" +
      s""""coldscan_et_queries":$etNQ,""" +
      s""""coldscan_lossless_10x_sec":${"%.2f".format(losslessTimes.min)},""" +
      s""""coldscan_early_term_10x_sec":${"%.2f".format(etTimes.min)},""" +
      s""""coldscan_early_term_10x_secs":${arr(etTimes)},""" +
      s""""coldscan_early_term_recall_10x":${"%.4f".format(etRecall)},""" +
      s""""coldscan_wave2_planned_10x":$w2Planned,""" +
      s""""coldscan_wave2_scanned_10x":$w2Scanned,""" +
      s""""coldscan_wave2_skipped_frac_10x":${"%.3f".format(
        if (w2Planned == 0) 0.0 else 1.0 - w2Scanned.toDouble / w2Planned)},""" +
      s""""coldtier_attrstats100_build_10x_sec":${"%.2f".format(attrStats100Sec)},""" +
      s""""ann_filtered1pct_queries":$onePctNQ,""" +
      s""""ann_filtered1pct_selectivity_est":${"%.4f".format(sel1p.getOrElse(-1.0))},""" +
      s""""ann_filtered1pct_adaptive_overfetch":$adaptiveFactor,""" +
      s""""ann_filtered1pct_static_sec":${"%.2f".format(static1pTimes.min)},""" +
      s""""ann_filtered1pct_static_secs":${arr(static1pTimes)},""" +
      s""""ann_filtered1pct_static_q_per_sec":${"%.1f".format(onePctNQ / static1pTimes.min)},""" +
      s""""ann_filtered1pct_static_recall":${"%.4f".format(static1pRecall)},""" +
      frags.map(_ + ",").mkString +
      // rotation bookkeeping: which retired rare-label context points
      // ran this round vs deferred ON SCHEDULE (odd-round parity derived
      // from the committed BENCH_r{N}.json artifacts — the round +
      // policy keys make the schedule machine-checkable) — DISJOINT
      // from bench10x_skipped, which stays the budget-trim signal
      s""""bench_rotation_round":$rotationRound,""" +
      s""""bench_rotation_policy":"odd-rounds${sys.env.get("SPARK_GRAFT_BENCH_ROTATION").map(v => s" (forced=$v)").getOrElse("")}",""" +
      s""""bench_rotation_ran":[${rotationRan.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""bench_rotation_deferred":[${rotationDeferred.map("\"" + _ + "\"").mkString(",")}],""" +
      Bench.BenchBudget.keys("bench10x_skipped") + "," +
      s""""calib_dedup10x_sec":${"%.2f".format(calibDedupSec)},""" +
      s""""n_docs_10x":$nDoc10,""" +
      s""""dedup_docs_per_sec_1x_child":${"%.1f".format(nDoc1 / d1Times.min)},""" +
      s""""dedup_docs_per_sec_10x":${"%.1f".format(dps10)},""" +
      s""""dedup_scaleup_10x":${"%.3f".format(dps10 / (nDoc1 / d1Times.min))},""" +
      s""""dedup_pairs_1x":$pairs1,"dedup_pairs_10x":$pairs10,""" +
      s""""dedup_pairs_per_sec_1x":${"%.1f".format(pps1)},""" +
      s""""dedup_pairs_per_sec_10x":${"%.1f".format(pps10)},""" +
      s""""dedup_pair_normalized_scaleup_10x":${"%.3f".format(pps10 / pps1)},""" +
      s""""dedup_1x_secs":${arr(d1Times)},"dedup_10x_secs":${arr(d10Times)},""" +
      s""""bf_query_per_sec_10x":${"%.1f".format(nQ10 / bfTimes.min)}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // CORE-AWARE default, same contract as the parent's
    // SPARK_GRAFT_BENCH_REPS (r16 verdict #3): the 8-core run must fit
    // the window by running less, not by timing out artifact-less
    val reps = sys.env.get("SPARK_GRAFT_10X_REPS").map(_.toInt)
      .getOrElse(if (sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt >= 16)
        2 else 1)
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val frag = run(spark, sfDir, cpus, reps)
    println(s"""{"metric":"bench10x",$frag}""")
    spark.stop()
  }
}
