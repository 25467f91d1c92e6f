package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Metric

/** Scratch dev driver (see verify skill): currently drives the round-11
 * histogram attr-stats surface end-to-end on real testdata — seal a
 * label-structured tier from sf0.001 embeddings, check gap pruning
 * plans one probe per query where [min,max] would plan three, check the
 * selectivity estimate sizes the filtered SQL rewrite's overfetch, and
 * run a filtered + range SQL query through the rewrite. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")

    // 1. label-STRUCTURED tier: seg0 = {0,9}, seg1 = {3,4,5}, seg2 = rest
    val tier = java.nio.file.Files.createTempDirectory("probe-hist").toString
    val seg = when(col("label") === 0 || col("label") === 9, 0L)
      .when(col("label") >= 3 && col("label") <= 5, 1L)
      .otherwise(2L)
    graft.store.ColdTier.sealMany(
      e.select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("vec_id").as("eventTime"), col("label"), seg.as("segmentId")),
      tier)
    graft.store.ColdTier.sealAttrStats(spark, tier, "label")

    // 2. gap pruning: band [3,5] must plan ONE probe per query
    val queries = e.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        lit(Long.MaxValue / 2).as("qtime"), lit(Long.MaxValue / 2).as("ttl"),
        lit(3).as("qflo"), lit(5).as("qfhi"))
    val stats = scala.collection.mutable.Map.empty[String, Long]
    val out = graft.store.ColdTier.search(spark, tier, queries, 10,
      Metric.L2, firstWaveFraction = 0.34, terminationFactor = 1.0,
      filterColumn = Some("label"), filterRange = true,
      searchStats = Some(stats)).collect()
    val nq = queries.count()
    val planned = stats("wave1_probes") + stats("wave2_planned")
    println(s"probe hist-gap: $nq queries, ${out.length} rows, " +
      s"$planned probes planned (min/max alone would plan ${3 * nq})")
    require(planned == nq, "gap pruning must collapse to one probe/query")
    require(out.nonEmpty, "filtered search must return rows")

    // 3. selectivity estimate + adaptive overfetch policy
    val sel = graft.store.ColdTier.estimateSelectivity(spark, tier,
      "label", Seq(7.0), Double.NaN, Double.NaN)
    println(s"probe selectivity(label=7): $sel -> overfetch " +
      s"${graft.store.ColdTier.adaptiveOverfetch(4, sel)}")
    require(sel.exists(s => s > 0.0 && s < 0.5), s"estimate off: $sel")

    // 4. filtered + range SQL through the unified rewrite (plan-time
    //    literal path with histogram-sized overfetch)
    graft.store.ColdTier.sealIndexes(spark, tier, 0L until 3L, Metric.L2,
      m = 8, efConstruction = 64)
    graft.plans.KnnIndex.install(spark)
    graft.GraftFunctions.register(spark)
    val corpusPath = java.nio.file.Files
      .createTempDirectory("probe-corpus").toString
    spark.read.parquet(
        graft.store.ColdTier.catalog(spark, tier).map(_.path): _*)
      .select("id", "vec", "label")
      .write.mode("overwrite").parquet(corpusPath)
    graft.plans.KnnIndex.register(corpusPath, tier,
      filterColumns = Set("label"))
    spark.read.parquet(corpusPath).createOrReplaceTempView("probe_corpus")
    val q = e.limit(1).collect()(0).getSeq[Float](1).toArray
    val arr = q.map(f => s"CAST($f AS FLOAT)").mkString("array(", ",", ")")
    val eqDf = spark.sql(
      s"""SELECT id, l2_distance(vec, $arr) AS dist
         |FROM probe_corpus WHERE label = 7 ORDER BY dist LIMIT 5""".stripMargin)
    val bandDf = spark.sql(
      s"""SELECT id, l2_distance(vec, $arr) AS dist
         |FROM probe_corpus WHERE label BETWEEN 3 AND 5
         |ORDER BY dist LIMIT 5""".stripMargin)
    val eqRows = eqDf.collect()
    val bandRows = bandDf.collect()
    println(s"probe rewrite: eq=${eqRows.length} rows, " +
      s"band=${bandRows.length} rows")
    require(eqRows.length == 5 && bandRows.length == 5)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tier))
    println("probe OK")
  }
}
