package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Metric
import graft.ops.{Ann, Dedup}
import graft.partitioners._

/**
 * Approximate operators (no SQL oracle — the driver records rows-only;
 * quality is enforced by the recall/completeness ScalaTest specs in
 * AnnRecallSpec, which compare these against the exact oracled queries):
 *
 *  - ann_lsh_hnsw: P2 LSH fan-out + per-partition HNSW (the reference's
 *    core configuration, reference params.yaml partitioner family)
 *  - ann_ivf: P7 k-means cells with multi-probe (IVF-style)
 *  - ann_sfc: P5 LSH + Hilbert curve equi-depth partitions
 *  - dedup_minhash / dedup_simhash: banded near-dup candidate generation
 */
object AnnQueries {
  val K = 10

  /** corpus: (id, vec, eventTime := vec_id). */
  private def vectorsDf(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings").select(col("vec_id").as("id"),
      col("embedding").as("vec"), col("vec_id").as("eventTime"))

  /** queries: every 10th vector, unbounded freshness window. */
  private def queriesDf(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings").where(col("vec_id") % VectorQueries.QueryMod === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        lit(Long.MaxValue / 2).as("qtime"), lit(Long.MaxValue / 2).as("ttl"))

  private val Dim = 64

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_lsh_hnsw" -> { (s, dir) =>
      // coarse hashes (high collision for near neighbors) x many families
      // (many probes) — recall comes from the union over families
      val model = LshPartitioner.seeded(numPartitions = 16, dim = Dim,
        numFamilies = 8, numHashes = 2, width = 4.0f, seed = 38324L)
      Ann.search(vectorsDf(s, dir), queriesDf(s, dir), model, K,
        Metric.L2, useHnsw = true)
    },

    "ann_ivf" -> { (s, dir) =>
      val sample = Tables(s, dir, "embeddings").limit(5000)
        .select("embedding").collect().map(_.getSeq[Float](0).toArray)
      val model = KMeansPartitioner.fit(sample, k = 16, replicationFactor = 1,
        iterations = 8, seed = 42L, queryProbes = 8)
      Ann.search(vectorsDf(s, dir), queriesDf(s, dir), model, K,
        Metric.L2, useHnsw = false)
    },

    "ann_sfc" -> { (s, dir) =>
      val sample = Tables(s, dir, "embeddings").limit(5000)
        .select("embedding").collect().map(_.getSeq[Float](0).toArray)
      val model = LshSfcPartitioner.fit(sample, numPartitions = 8, dim = Dim,
        numFamilies = 4, numHashes = 4, width = 2.0f, bits = 7,
        curveName = "hilbert", seed = 38324L)
      Ann.search(vectorsDf(s, dir), queriesDf(s, dir), model, K,
        Metric.L2, useHnsw = true)
    },

    "ann_lsh_random" -> { (s, dir) =>
      val base = LshPartitioner.seeded(numPartitions = 16, dim = Dim,
        numFamilies = 4, numHashes = 2, width = 4.0f, seed = 38324L)
      Ann.search(vectorsDf(s, dir), queriesDf(s, dir),
        LshRandomPartitioner(base, 7L), K, Metric.L2, useHnsw = true)
    },

    "ann_lsh_proximity" -> { (s, dir) =>
      val fams = Array(graft.functions.L2HashFamily.seeded(Dim, 3, 4.0f, 5L))
      Ann.search(vectorsDf(s, dir), queriesDf(s, dir),
        LshProximityPartitioner(16, fams, proximity = 1), K, Metric.L2,
        useHnsw = false)
    },

    "ann_odyssey" -> { (s, dir) =>
      val sample = Tables(s, dir, "embeddings").limit(5000)
        .select("embedding").collect().map(_.getSeq[Float](0).toArray)
      val model = OdysseyPartitioner.fit(sample, numPartitions = 12,
        replicationFactor = 3, paaSize = 4, width = 2, lambda = 4)
      Ann.search(vectorsDf(s, dir), queriesDf(s, dir), model, K,
        Metric.L2, useHnsw = false)
    },

    "dedup_minhash" -> { (s, dir) =>
      Dedup.minhashPairs(Tables(s, dir, "documents"), numHashes = 64,
        rowsPerBand = 4, shingleWidth = 3, threshold = 0.5)
    },

    "dedup_simhash" -> { (s, dir) =>
      Dedup.simhashPairs(Tables(s, dir, "documents"), maxHamming = 16)
    })
}
