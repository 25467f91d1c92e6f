package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Metric

/**
 * Cold-tier segment storage: sealed vector segments as Parquet files with
 * a small stats catalog — the Spark re-expression of the reference's
 * HNSW-SST hierarchy (reference semantics, not mechanism):
 *
 *  - V3 freshness pruning: a segment whose [minTs, maxTs] window is
 *    disjoint from the query's [tsFloor, tsCeil] is never read (the
 *    reference's `lastest_key_time` SST skip, db/version_set.cc:2590-2597;
 *    here it also pushes into Parquet row-group stats).
 *  - V5/V6 hot-first search with early termination: segments are ordered
 *    per query by centroid proximity ("temperature"); after a first wave
 *    establishes a kth-distance threshold, remaining segments are skipped
 *    when their triangle-inequality lower bound exceeds
 *    `threshold * terminationFactor` (factor 1.0 = provably lossless skip;
 *    < 1.0 = the reference's approximate early termination,
 *    version_set.cc:2640-2652).
 *  - V7 eviction: `evict` drops whole segments older than the retention
 *    floor (watermark - maxTtl).
 *
 * The catalog is tiny (one row per segment) and lives as Parquet next to
 * the segments; at cluster scale it is broadcast to plan per-query
 * segment lists, so pruning costs no distributed work.
 */
object ColdTier {

  final case class SegmentStats(segmentId: Long, path: String, count: Long,
      minTs: Long, maxTs: Long, centroid: Array[Float], radius: Double)

  private def statsPath(dir: String) = s"$dir/_segments"

  /** Seal a batch of vectors (id, vec, eventTime) into a new segment. */
  def seal(vectors: DataFrame, dir: String, segmentId: Long): SegmentStats = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val path = s"$dir/segment-$segmentId"
    vectors.select(col("id"), col("vec"), col("eventTime"))
      .write.mode("overwrite").parquet(path)
    val written = spark.read.parquet(path)
    val dim = written.select(size(col("vec"))).first().getInt(0)
    val agg = written.select(
      count(lit(1)), min(col("eventTime")), max(col("eventTime")),
      array((0 until dim).map(i => avg(element_at(col("vec"), i + 1))): _*))
      .first()
    val centroid = agg.getSeq[Double](3).map(_.toFloat).toArray
    val bc = spark.sparkContext.broadcast(centroid)
    val radius = written.select(
      max(graft.functions.Distances.l2(col("vec"), typedLit(bc.value))))
      .first().getDouble(0)
    val stats = SegmentStats(segmentId, path, agg.getLong(0), agg.getLong(1),
      agg.getLong(2), centroid, math.sqrt(radius))
    Seq(stats).toDF().write.mode("append").parquet(statsPath(dir))
    stats
  }

  def catalog(spark: SparkSession, dir: String): Array[SegmentStats] = {
    import spark.implicits._
    spark.read.parquet(statsPath(dir)).as[SegmentStats].collect()
  }

  /** V7: drop segments entirely older than the retention floor. Returns
   * surviving stats (files of dropped segments are left for out-of-band
   * deletion — metadata-first eviction like the reference's version edit). */
  def evict(spark: SparkSession, dir: String, retentionFloor: Long): Array[SegmentStats] = {
    import spark.implicits._
    val keep = catalog(spark, dir).filter(_.maxTs >= retentionFloor)
    keep.toSeq.toDF().write.mode("overwrite").parquet(statsPath(dir) + ".tmp")
    // atomic-ish swap via rewrite (single-writer catalog assumption)
    keep.toSeq.toDF().write.mode("overwrite").parquet(statsPath(dir))
    keep
  }

  /** Search the cold tier: per-query segment pruning (freshness window +
   * distance lower bound), hot-first two-wave scan.
   *
   * @param queries (qid, qv, qtime, ttl)
   * @param firstWaveFraction fraction of candidate segments searched
   *        unconditionally, hottest (nearest centroid) first — the
   *        reference's termination_lower_bound
   * @param terminationFactor multiplier on the wave-1 kth distance used to
   *        skip remaining segments; 1.0 = lossless (triangle inequality),
   *        lower = more aggressive (reference termination_factor 0.8)
   */
  def search(spark: SparkSession, dir: String, queries: DataFrame, k: Int,
      metric: Metric = Metric.L2,
      firstWaveFraction: Double = 0.3,
      terminationFactor: Double = 1.0): DataFrame = {
    import spark.implicits._
    val segs = catalog(spark, dir)
    val qRows = queries.select(col("qid"), col("qv"), col("qtime"), col("ttl"))
      .as[(Long, Array[Float], Long, Long)].collect()

    // plan per-query segment lists driver-side from the tiny catalog
    final case class Probe(qid: Long, segmentId: Long, wave: Int)
    val probes = qRows.flatMap { case (qid, qv, qtime, ttl) =>
      val fresh = segs.filter(s => s.maxTs >= qtime - ttl && s.minTs <= qtime)
      val ordered = fresh.sortBy(s =>
        (math.sqrt(graft.functions.Distances.l2(qv, s.centroid)) - s.radius, s.segmentId))
      val wave1 = math.max(1, math.ceil(ordered.length * firstWaveFraction).toInt)
      ordered.zipWithIndex.map { case (s, i) =>
        (qid, s.segmentId, if (i < wave1) 1 else 2,
          math.max(0.0, math.sqrt(graft.functions.Distances.l2(qv, s.centroid)) - s.radius))
      }
    }.toSeq.toDF("qid", "segmentId", "wave", "lower_bound")

    val byQid = qRows.map(q => q._1 -> q).toMap
    val bq = spark.sparkContext.broadcast(byQid)
    val dist = graft.functions.Distances.forMetric(metric)

    def scanWave(probeDf: DataFrame): DataFrame = {
      val perSeg = probeDf.collect().groupBy(_.getLong(1))
      val parts = perSeg.toSeq.flatMap { case (segId, rows) =>
        val seg = segs.find(_.segmentId == segId).get
        val qids = rows.map(_.getLong(0))
        Seq((seg.path, qids))
      }
      parts.map { case (path, qids) =>
        val data = spark.read.parquet(path)
          .select(col("id"), col("vec"), col("eventTime"))
        val qdf = qids.toSeq.map { qid =>
          val (_, qv, qtime, ttl) = bq.value(qid)
          (qid, qv, qtime - ttl, qtime)
        }.toDF("qid", "qv", "floor_ts", "ceil_ts")
        data.join(broadcast(qdf),
            col("eventTime") >= col("floor_ts") && col("eventTime") <= col("ceil_ts"))
          .select(col("qid"), col("id"),
            graft.functions.Distances.forMetric(metric, col("qv"), col("vec")).as("dist"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("qid")
              .orderBy(col("dist"), col("id"))))
          .where(col("rn") <= k)
          .drop("rn")
      }.reduceOption(_ unionAll _)
        .getOrElse(spark.emptyDataset[(Long, Long, Double)].toDF("qid", "id", "dist"))
    }

    // wave 1: unconditional hot-first scan
    val wave1 = scanWave(probes.where(col("wave") === 1)).cache()
    // per-query kth distance -> skip threshold
    val thresholds = wave1.groupBy("qid")
      .agg(max(col("dist")).as("kth"))
      .select(col("qid").as("t_qid"), (sqrt(col("kth")) * terminationFactor).as("thr"))
    // wave 2: only segments whose lower bound beats the threshold
    val wave2Probes = probes.where(col("wave") === 2)
      .join(thresholds, col("qid") === col("t_qid"), "left")
      .where(col("thr").isNull || col("lower_bound") <= col("thr"))
      .select(col("qid"), col("segmentId"), col("wave"), col("lower_bound"))
    val wave2 = scanWave(wave2Probes)

    // final merge
    wave1.unionAll(wave2)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("dist"), col("id"))))
      .where(col("rn") <= k)
      .select(col("qid"), col("rn"), col("id"), col("dist"))
  }
}
