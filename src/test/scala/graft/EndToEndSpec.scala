package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Distances
import graft.ops.{Ann, Recall}
import graft.partitioners.LshPartitioner
import graft.sources.VectorFiles

/** The reference's end-to-end oracle test re-created (reference:
 * StreamSearchJobTest.java:36-130 — run the pipeline over a SIFT-format
 * base + query file, compare against ivecs ground truth, assert
 * recall@k): fvecs written to disk, read through the split-parallel
 * source, searched via partitioner + HNSW, ground truth via ivecs. */
class EndToEndSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("fvecs -> partitioned HNSW search -> ivecs ground truth, recall@10 >= 0.9") {
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("graft-e2e")
    val basePath = dir.resolve("base.fvecs").toString
    val queryPath = dir.resolve("query.fvecs").toString
    val gtPath = dir.resolve("gt.ivecs").toString

    // clustered corpus (SIFT-like locality), seed-fixed
    val rnd = new java.util.Random(77L)
    val dim = 24
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian().toFloat * 2))
    val base = Array.tabulate(4000) { i =>
      centers(i % 16).map(x => x + rnd.nextGaussian().toFloat * 0.1f)
    }
    val queries = Array.tabulate(60) { qi => base(qi * 66).map(x => x + 0.01f) }
    VectorFiles.write(basePath, base.iterator, VectorFiles.F32)
    VectorFiles.write(queryPath, queries.iterator, VectorFiles.F32)
    // ground truth ivecs via local brute force (the fixture generator role)
    val gt = queries.map { q =>
      base.zipWithIndex.map { case (v, id) => (id.toLong, Distances.l2(q, v)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1.toFloat)
    }
    VectorFiles.write(gtPath, gt.iterator, VectorFiles.I32)

    val vecs = VectorFiles.read(spark, basePath, VectorFiles.F32)
      .select(col("id"), col("vec"), col("id").as("eventTime"))
    val qdf = VectorFiles.read(spark, queryPath, VectorFiles.F32)
      .select(col("id").as("qid"), col("vec").as("qv"),
        lit(Long.MaxValue / 2).as("qtime"), lit(Long.MaxValue / 2).as("ttl"))
    val model = LshPartitioner.seeded(8, dim, numFamilies = 4, numHashes = 2,
      width = 6.0f, seed = 38324L)
    val results = Ann.search(vecs, qdf, model, 10, Metric.L2, useHnsw = true)

    val truth = VectorFiles.readIvecs(spark, gtPath)
      .select(col("qid"), posexplode(col("ids")))
      .select(col("qid"), (col("pos") + 1).as("rn"), col("col").as("id"))
    val recall = Recall.meanAtK(results, truth, 10)
    info(s"e2e recall@10 = $recall")
    assert(recall >= 0.9, s"recall $recall")
  }
}
