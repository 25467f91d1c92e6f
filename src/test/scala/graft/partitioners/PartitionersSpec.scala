package graft.partitioners

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Sax

class PartitionersSpec extends AnyFunSuite {
  private def randomVecs(n: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }
  private val vecs = randomVecs(2000, 16, 11L)

  /** The recall-safety contract: a query identical to a stored vector must
   * probe every partition that vector was routed to (or a superset). */
  private def coverage(m: PartitionerModel): Unit =
    vecs.take(200).zipWithIndex.foreach { case (v, i) =>
      val dp = m.dataPartitions(v, i.toLong).toSet
      val qp = m.queryPartitions(v).toSet
      assert(dp.subsetOf(qp) || qp.subsetOf(dp) || (dp intersect qp).nonEmpty,
        s"vector $i: data->$dp query->$qp")
    }

  test("simple: data hashed, queries broadcast, delete-all covers n") {
    val m = SimplePartitioner(8)
    assert(m.queryPartitions(vecs(0)).sameElements(0 until 8))
    assert(m.deleteAllPartitions.length == 8)
    val counts = vecs.map(v => m.dataPartitions(v, v.hashCode().toLong).head)
      .groupBy(identity).view.mapValues(_.length)
    assert(counts.size == 8)
    coverage(m)
  }

  test("lsh: deterministic, query partitions == data partitions") {
    val m = LshPartitioner.seeded(16, 16, 4, 4, 2.0f, 38324L)
    val m2 = LshPartitioner.seeded(16, 16, 4, 4, 2.0f, 38324L)
    vecs.take(100).foreach { v =>
      assert(m.dataPartitions(v, 0).sameElements(m2.dataPartitions(v, 0)))
      assert(m.dataPartitions(v, 0).sameElements(m.queryPartitions(v)))
    }
    // fan-out bounded by family count
    assert(vecs.forall(v => m.dataPartitions(v, 0).length <= 4))
  }

  test("lsh+random adds extra probes; still covers data partitions") {
    val base = LshPartitioner.seeded(12, 16, 4, 4, 2.0f, 38324L)
    val m = LshRandomPartitioner(base, 7L)
    vecs.take(100).foreach { v =>
      val dp = m.dataPartitions(v, 0).toSet
      val qp = m.queryPartitions(v).toSet
      assert(dp.subsetOf(qp))
      assert(qp.size >= dp.size)
    }
    // deterministic per vector
    assert(m.queryPartitions(vecs(0)).sameElements(m.queryPartitions(vecs(0))))
  }

  test("lsh+proximity: probe set is a superset of the exact bucket") {
    val fams = Array(graft.functions.L2HashFamily.seeded(16, 3, 3.0f, 5L))
    val m = LshProximityPartitioner(16, fams, proximity = 1)
    vecs.take(50).foreach { v =>
      val dp = m.dataPartitions(v, 0).toSet
      assert(dp.subsetOf(m.queryPartitions(v).toSet))
    }
  }

  test("lsh+sfc: fits equi-depth heads; routing balanced and deterministic") {
    val m = LshSfcPartitioner.fit(vecs, numPartitions = 8, dim = 16,
      numFamilies = 2, numHashes = 4, width = 2.0f, bits = 7,
      curveName = "hilbert", seed = 38324L)
    val counts = new Array[Int](8)
    vecs.foreach(v => m.dataPartitions(v, 0).foreach(counts(_) += 1))
    assert(counts.forall(_ > 0), s"empty partitions: ${counts.toList}")
    val avg = counts.sum.toDouble / 8
    val balance = (counts.max - avg) / avg // reference's balance metric
    assert(balance < 2.0, s"balance $balance, counts ${counts.toList}")
    coverage(m)
    // zorder and peano variants also fit
    Seq("zorder", "peano", "gray").foreach { c =>
      val mc = LshSfcPartitioner.fit(vecs.take(500), 4, 16, 1, 3, 2.0f, 5, c, 1L)
      assert(vecs.take(50).forall(v => mc.dataPartitions(v, 0).head < 4))
    }
  }

  test("odyssey: data replicated within group, query probes every group") {
    val m = OdysseyPartitioner.fit(vecs, numPartitions = 12,
      replicationFactor = 3, paaSize = 4, width = 2, lambda = 4)
    vecs.take(100).foreach { v =>
      val dp = m.dataPartitions(v, 0)
      assert(dp.length == 3) // the whole replication group
      val qp = m.queryPartitions(v)
      assert(qp.length == 4) // one worker per group
      assert(dp.intersect(qp).nonEmpty, "query must hit its own group's worker")
    }
  }

  test("kmeans: rf nearest cells for data, multi-probe for queries") {
    val m = KMeansPartitioner.fit(vecs, k = 8, replicationFactor = 2,
      iterations = 5, seed = 42L, queryProbes = 4)
    vecs.take(100).foreach { v =>
      val dp = m.dataPartitions(v, 0)
      val qp = m.queryPartitions(v)
      assert(dp.length == 2 && qp.length == 4)
      assert(dp.toSet.subsetOf(qp.toSet)) // probes include the data cells
    }
  }

  test("sfc raw: single partition per point, equi-depth balanced") {
    val m = SfcPartitioner.fit(vecs.map(_.take(4)), numPartitions = 8,
      minValue = -3f, maxValue = 3f, bits = 6, curveName = "zorder")
    val counts = new Array[Int](8)
    vecs.foreach(v => counts(m.dataPartitions(v.take(4), 0).head) += 1)
    val avg = counts.sum / 8.0
    assert(counts.forall(_ > 0))
    assert((counts.max - avg) / avg < 1.0, counts.toList.toString)
  }

  test("odyssey sax words distribute across groups") {
    val sax = Sax(4, 2, 0.01)
    val words = vecs.map(v => sax.encode(v))
    assert(words.distinct.length > 10) // gaussian data spreads over words
  }

  test("adaptive P5: version selection, fresh-range fan-out, expiry GC") {
    val m0 = AdaptiveLshSfcPartitioner.init(vecs, numPartitions = 8, dim = 16,
      numFamilies = 3, numHashes = 4, width = 4.0f, bits = 7,
      curveName = "hilbert", seed = 7L, fromTime = 0L)
    val shifted = vecs.map(_.map(_ + 6f))
    val m1 = m0.refit(shifted, asOfTime = 1000L)
    val m2 = m1.refit(vecs, asOfTime = 2000L)
    assert(m2.versions.map(v => (v.fromTime, v.toTime)) ==
      Vector((0L, 1000L), (1000L, 2000L), (2000L, Long.MaxValue)))
    // hash families are preserved across re-fits
    assert(m2.versions.map(_.partitioner.models.map(_.family).toSeq).distinct.size == 1)
    // data routes by the version at its timestamp
    vecs.take(50).zipWithIndex.foreach { case (v, i) =>
      assert(m2.dataPartitions(v, i.toLong, 500L)
        .sameElements(m2.versions(0).partitioner.dataPartitions(v, i.toLong)))
      assert(m2.dataPartitions(v, i.toLong, 1500L)
        .sameElements(m2.versions(1).partitioner.dataPartitions(v, i.toLong)))
    }
    // a query's fan-out covers every version intersecting its window...
    vecs.take(50).foreach { v =>
      val qp = m2.queryPartitions(v, qtime = 2100L, ttl = 1500L).toSet
      assert(m2.versions(1).partitioner.queryPartitions(v).toSet.subsetOf(qp))
      assert(m2.versions(2).partitioner.queryPartitions(v).toSet.subsetOf(qp))
    }
    // ...and no more: a window inside the current version probes it alone
    vecs.take(50).foreach { v =>
      assert(m2.queryPartitions(v, qtime = 2500L, ttl = 100L).toSet ==
        m2.versions(2).partitioner.queryPartitions(v).toSet)
    }
    // vector-carrying deletes cover the insert's possible routes
    vecs.take(50).zipWithIndex.foreach { case (v, i) =>
      val del = m2.deleteDataPartitions(v, i.toLong, ts = 2100L, maxTtl = 1500L).toSet
      assert(m2.versions(1).partitioner.dataPartitions(v, i.toLong).toSet.subsetOf(del))
    }
    // expiry drops stale versions, never the current one
    assert(m2.expire(1500L).versions.map(_.fromTime) == Vector(1000L, 2000L))
    assert(m2.expire(Long.MaxValue).versions.map(_.fromTime) == Vector(2000L))
    // a window intersecting no version falls back to the version at qtime
    // (the reference's no-fresh-range fallback) — never an empty fan-out
    vecs.take(20).foreach { v =>
      val qp = m2.queryPartitions(v, qtime = -500L, ttl = 10L)
      assert(qp.nonEmpty &&
        qp.sameElements(m2.versions.head.partitioner.queryPartitions(v)))
    }
  }

  test("salting: recall-lossless split of skewed cells, bounded sub-partitions") {
    // a deliberately skewed base: hash routing over 4 cells where cell 0
    // receives ~70% of ids (k-means on clustered data behaves like this)
    val base = new PartitionerModel {
      override def numPartitions: Int = 4
      override def dataPartitions(vec: Array[Float], id: Long): Array[Int] =
        Array(if (id % 10 < 7) 0 else (id % 3).toInt + 1)
      override def queryPartitions(vec: Array[Float]): Array[Int] =
        Array(0, 1)
    }
    val ids = (0L until 2000L).toArray
    val salted = SaltedPartitioner.fromSample(base,
      vecs.take(2000), totalCount = 2000L, targetPerPartition = 300L)

    // every salted sub-partition stays under the target (+sampling slack)
    val counts = new Array[Long](salted.numPartitions)
    ids.foreach { id => salted.dataPartitions(vecs((id % 2000).toInt), id)
      .foreach(counts(_) += 1) }
    assert(counts.max <= 360L, s"max sub-partition ${counts.max}")

    // recall-safety: a query probing base cell c reaches EVERY salted
    // sub-partition of c, so no stored vector becomes unreachable
    ids.take(500).foreach { id =>
      val v = vecs((id % 2000).toInt)
      val dp = salted.dataPartitions(v, id).toSet
      val qBase = base.queryPartitions(v).toSet
      val dBase = base.dataPartitions(v, id).toSet
      if (dBase.subsetOf(qBase))
        assert(dp.subsetOf(salted.queryPartitions(v).toSet),
          s"id $id routed to $dp, probes miss it")
    }
  }
}
