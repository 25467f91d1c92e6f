package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry
import graft.functions.Distances

/** Product quantization: deterministic fit, ADC consistency with the
 * reconstruction distance, compressed-domain search vs a local reference,
 * and re-ranked recall against exact kNN. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkEntry.configure(SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  private val Dim = 32
  private val NumSub = 8
  private val SubDim = Dim / NumSub

  /** Seeded clustered corpus: 20 gaussian clusters in [0,1)^32. */
  private def mkData(n: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    val centers = Array.fill(20, Dim)(rnd.nextFloat())
    Array.tabulate(n) { i =>
      val c = centers(i % 20)
      Array.tabulate(Dim)(j => c(j) + 0.05f * rnd.nextGaussian().toFloat)
    }
  }

  test("fit is deterministic for a fixed seed") {
    val data = mkData(500, 1L)
    val m1 = Pq.fit(data, NumSub, codesPerSub = 32, iterations = 5, seed = 7L)
    val m2 = Pq.fit(data, NumSub, codesPerSub = 32, iterations = 5, seed = 7L)
    assert(m1.codebooks.flatten.flatten.toSeq == m2.codebooks.flatten.flatten.toSeq)
    val m3 = Pq.fit(data, NumSub, codesPerSub = 32, iterations = 5, seed = 8L)
    assert(m1.codebooks.flatten.flatten.toSeq != m3.codebooks.flatten.flatten.toSeq)
  }

  test("adcDistance == subspace-ordered fold of slice L2 to the reconstruction") {
    val data = mkData(300, 2L)
    val m = Pq.fit(data, NumSub, codesPerSub = 32, iterations = 5, seed = 7L)
    val q = data(7)
    val table = m.adcTable(q)
    data.drop(100).take(50).foreach { v =>
      val codes = m.encode(v)
      val recon = m.decode(codes)
      // per-sub sequential-double L2 over slices, folded in sub order —
      // the exact arithmetic the DuckDB replay performs
      var want = 0.0
      for (sub <- 0 until NumSub) {
        val off = sub * SubDim
        want += Distances.l2(
          java.util.Arrays.copyOfRange(q, off, off + SubDim),
          java.util.Arrays.copyOfRange(recon, off, off + SubDim))
      }
      assert(m.adcDistance(table, codes) == want)
    }
  }

  test("quantization error is small relative to data spread") {
    val data = mkData(500, 3L)
    val m = Pq.fit(data, NumSub, codesPerSub = 64, iterations = 8, seed = 7L)
    val reconErr = data.map(v => Distances.l2(v, m.decode(m.encode(v)))).sum / data.length
    val mean = Array.tabulate(Dim)(j => data.map(_(j)).sum / data.length)
    val variance = data.map(v => Distances.l2(v, mean.map(_.toFloat))).sum / data.length
    assert(reconErr < variance / 10.0,
      s"recon err $reconErr vs variance $variance")
  }

  test("search matches a local full-scan ADC reference (multi-partition)") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val data = mkData(400, 4L)
    val m = Pq.fit(data, NumSub, codesPerSub = 32, iterations = 5, seed = 7L)
    val codes = data.zipWithIndex.map { case (v, i) => (i.toLong, m.encode(v)) }
    val qs = (0 until 10).map(i => (1000L + i, data(i * 37)))

    val got = Pq.search(
      codes.toSeq.toDF("id", "codes").repartition(8),
      qs.toDF("qid", "qv"), m, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val want = qs.flatMap { case (qid, qv) =>
      val table = m.adcTable(qv)
      codes.map { case (id, cs) => (id, m.adcDistance(table, cs)) }
        .sortBy { case (id, d) => (d, id) }
        .take(5).zipWithIndex
        .map { case ((id, d), i) => (qid, i + 1, id, d) }
    }.toSet
    assert(got == want)
  }

  test("routed ADC (IVF-PQ) == local reference over the routed candidate set; recall holds") {
    import spark.implicits._
    val data = mkData(1500, 6L)
    val m = Pq.fit(data, NumSub, codesPerSub = 64, iterations = 8, seed = 7L)
    val km = graft.partitioners.KMeansPartitioner.fit(data, k = 8,
      replicationFactor = 1, iterations = 8, seed = 11L, queryProbes = 3)
    val vecs = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val codes = vecs.map { case (id, v) => (id, m.encode(v)) }.toMap
    val qs = (0 until 30).map(i => (10000L + i, data(i * 47)))

    val dr = vecs.flatMap { case (id, v) =>
      km.dataPartitions(v, id).map(pid => (pid, id, codes(id))) }
    val qr = qs.flatMap { case (qid, qv) =>
      km.queryPartitions(qv).map(pid => (pid, qid, qv)) }
    val got = Pq.searchRoutedAdc(dr.toSeq.toDF("pid", "id", "codes").repartition(8),
        qr.toDF("pid", "qid", "qv"), m, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

    // local reference: ADC distance over exactly the ids sharing a probed cell
    val cellIds = dr.groupBy(_._1).map { case (p, rs) => p -> rs.map(_._2).toSet }
    val want = qs.flatMap { case (qid, qv) =>
      val cand = km.queryPartitions(qv).flatMap(p => cellIds.getOrElse(p, Set.empty)).distinct
      val table = m.adcTable(qv)
      cand.map(id => (id, m.adcDistance(table, codes(id))))
        .sortBy { case (id, d) => (d, id) }.take(10).zipWithIndex
        .map { case ((id, d), i) => (qid, i + 1, id, d) }
    }.toSet
    assert(got == want)

    // recall vs FULL-SCAN ADC isolates the routing loss from the
    // quantization loss: on clustered data each query's ADC-nearest ids
    // share its cluster's cell, so probing 3/8 cells keeps most of them
    val gotIds = got.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).toSet }
    val fullAdc = qs.map { case (qid, qv) =>
      val table = m.adcTable(qv)
      qid -> vecs.map { case (id, _) => (id, m.adcDistance(table, codes(id))) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    }.toMap
    val recall = qs.map { case (qid, _) =>
      (gotIds.getOrElse(qid, Set.empty[Long]) & fullAdc(qid)).size / 10.0
    }.sum / qs.length
    assert(recall >= 0.8, s"routed-vs-full ADC recall $recall")
  }

  test("reranked recall@10 >= 0.9 vs exact kNN (shortlist 10x k)") {
    import spark.implicits._
    val data = mkData(2000, 5L)
    val m = Pq.fit(data, NumSub, codesPerSub = 64, iterations = 8, seed = 7L)
    val vecs = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val codes = vecs.map { case (id, v) => (id, m.encode(v)) }
    val qs = (0 until 40).map(i => (10000L + i, data(i * 49)))
    val vdf = vecs.toSeq.toDF("id", "vec").repartition(8)

    val got = Pq.searchReranked(codes.toSeq.toDF("id", "codes").repartition(8),
        vdf, qs.toDF("qid", "qv"), m, k = 10, shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }

    val truth = qs.map { case (qid, qv) =>
      qid -> vecs.map { case (id, v) => (id, Distances.l2(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    }.toMap
    val recall = qs.map { case (qid, _) =>
      (got.getOrElse(qid, Set.empty[Long]) & truth(qid)).size / 10.0
    }.sum / qs.length
    assert(recall >= 0.9, s"reranked recall $recall")
  }
}
