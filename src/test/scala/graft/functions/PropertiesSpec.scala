package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property-style randomized tests (FIXTURES.md §4 — the reference has
 * none; these strengthen the merge/partitioner/curve contracts). Seeded
 * generators, 200 cases per property. */
class PropertiesSpec extends AnyFunSuite {
  private val Cases = 200

  private def entries(rnd: scala.util.Random): List[(Long, Double)] =
    List.fill(rnd.nextInt(40))((rnd.nextInt(500).toLong, rnd.nextInt(50) / 10.0))

  private def buffer(es: List[(Long, Double)], k: Int): TopKBuffer = {
    val agg = new TopKAggregator(k)
    es.foldLeft(agg.zero)(agg.reduce)
  }

  test("property: merge commutative; result sorted by (dist,id) with distinct ids") {
    val rnd = new scala.util.Random(101)
    (0 until Cases).foreach { _ =>
      val agg = new TopKAggregator(10)
      val (a, b) = (entries(rnd), entries(rnd))
      val m1 = agg.merge(buffer(a, 10), buffer(b, 10))
      val m2 = agg.merge(buffer(b, 10), buffer(a, 10))
      assert(m1.ids.sameElements(m2.ids) && m1.dists.sameElements(m2.dists))
      val pairs = m1.dists.zip(m1.ids)
      assert(pairs.sameElements(pairs.sortBy { case (d, id) => (d, id) }))
      assert(m1.ids.distinct.length == m1.ids.length)
    }
  }

  test("property: merge associative up to k-truncation") {
    val rnd = new scala.util.Random(102)
    (0 until Cases).foreach { _ =>
      val agg = new TopKAggregator(8)
      val (a, b, c) = (entries(rnd), entries(rnd), entries(rnd))
      val left = agg.merge(agg.merge(buffer(a, 8), buffer(b, 8)), buffer(c, 8))
      val right = agg.merge(buffer(a, 8), agg.merge(buffer(b, 8), buffer(c, 8)))
      assert(left.ids.sameElements(right.ids))
    }
  }

  test("property: reduce is arrival-order independent (set semantics, best dist per id)") {
    val rnd = new scala.util.Random(103)
    (0 until Cases).foreach { _ =>
      val es = entries(rnd)
      val want = es.groupBy(_._1).map { case (id, xs) => (id, xs.map(_._2).min) }
        .toArray.sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
      assert(buffer(es, 10).ids.sameElements(want))
      assert(buffer(scala.util.Random.shuffle(es), 10).ids.sameElements(want))
    }
  }

  test("property: BoundedTopK dedups by id — k slots = k distinct ids, best dist per id, any offer order and any duplicate placement") {
    // the r14 bug shape: duplicate ids inside ONE partition's scan
    // occupied several heap slots, so the partition's top-k starved the
    // global dedup-merge of distinct candidates and the exact answer
    // depended on the LAYOUT (the attr-aligned tier concentrates every
    // copy of an id into one segment). The kernel must match the
    // reference's keyed contract (SearchResult.java:106-114): top-k
    // DISTINCT ids by (best dist, id).
    val rnd = new scala.util.Random(104)
    (0 until Cases).foreach { _ =>
      // duplicate-heavy stream: few distinct ids, many copies, varied
      // dists per id (versions) — including exact-equal copies
      val es = List.fill(5 + rnd.nextInt(60))(
        (rnd.nextInt(12).toLong, rnd.nextInt(20) / 4.0))
      val k = 1 + rnd.nextInt(10)
      val heap = new BoundedTopK(k)
      es.foreach { case (id, d) => heap.offer(d, id) }
      val (ids, dists) = heap.drainSorted()
      val want = es.groupBy(_._1).map { case (id, xs) => (id, xs.map(_._2).min) }
        .toArray.sortBy { case (id, d) => (d, id) }.take(k)
      assert(ids.sameElements(want.map(_._1)),
        s"ids ${ids.toList} != ${want.map(_._1).toList}")
      assert(dists.sameElements(want.map(_._2)))
      assert(ids.distinct.length == ids.length)
    }
  }

  test("property: lsh routing deterministic under seed, in range, data==query") {
    val rnd = new scala.util.Random(104)
    val m1 = graft.partitioners.LshPartitioner.seeded(16, 8, 3, 2, 4.0f, 99L)
    val m2 = graft.partitioners.LshPartitioner.seeded(16, 8, 3, 2, 4.0f, 99L)
    (0 until Cases).foreach { _ =>
      val v = Array.fill(8)(rnd.nextFloat() * 10 - 5)
      val p1 = m1.dataPartitions(v, 0)
      assert(p1.sameElements(m2.dataPartitions(v, 0)))
      assert(p1.forall(p => p >= 0 && p < 16))
      assert(p1.sameElements(m1.queryPartitions(v)))
    }
  }

  test("property: curve indexes in range for all curves") {
    val rnd = new scala.util.Random(105)
    val curves = Seq(ZOrderCurve(3, 3), GrayCurve(3, 3), HilbertCurve(3, 3),
      PeanoCurve(3, 2))
    (0 until Cases).foreach { _ =>
      curves.foreach { c =>
        val lim = if (c.isInstanceOf[PeanoCurve]) 9L else 8L
        val v = Array.fill(3)(math.abs(rnd.nextLong()) % lim)
        val idx = c.index(v)
        assert(idx >= 0 && idx < c.maxIndex)
      }
    }
  }

  test("property: freshness — ttl-filtered results always inside the window") {
    val rnd = new scala.util.Random(106)
    import graft.store.{ExactStore, HnswStore}
    (0 until 20).foreach { _ =>
      val ts = Array.fill(300)(rnd.nextInt(1000).toLong)
      val stores = Seq(new ExactStore(graft.Metric.L2),
        new HnswStore(graft.Metric.L2, efSearch = 32))
      stores.foreach { s =>
        (0 until 300).foreach { i =>
          val r2 = new scala.util.Random(i)
          s.put(i.toLong, ts(i), Array.fill(4)(r2.nextFloat()))
        }
        val q = Array.fill(4)(rnd.nextFloat())
        val (floor, ceil) = (200L, 700L)
        val got = s.search(q, 10, floor, ceil)
        assert(got.forall { case (id, _) =>
          ts(id.toInt) >= floor && ts(id.toInt) <= ceil })
      }
    }
  }

  test("property: SQ8 round-trip error bounded by half a grid step; codes in range") {
    val rnd = new scala.util.Random(77)
    (0 until Cases).foreach { _ =>
      val dim = 1 + rnd.nextInt(16)
      val n = 2 + rnd.nextInt(60)
      val sample = Array.fill(n)(Array.fill(dim)(rnd.nextGaussian().toFloat * 10f))
      val m = graft.ops.Sq.fit(sample, levels = 16 + rnd.nextInt(241))
      sample.foreach { v =>
        val codes = m.encode(v)
        codes.indices.foreach { d =>
          assert(codes(d) >= 0 && codes(d) < m.levels)
          // in-range values (the sample defines the range) reconstruct to
          // within half a step (+ float rounding of the stored level)
          assert(math.abs(v(d) - m.recon(d, codes(d))) <= m.steps(d) / 2 + 1e-4)
        }
      }
    }
  }

  test("property: StreamDedup merge keeps (hi,lo)-sorted order and all members") {
    import graft.streaming.StreamDedup
    val rnd = new scala.util.Random(78)
    (0 until Cases).foreach { _ =>
      val texts = List.fill(1 + rnd.nextInt(30))(s"t${rnd.nextInt(40)}")
      val hashes = texts.map(StreamDedup.contentHash).distinct.sorted
      val (a, b) = hashes.partition(_ => rnd.nextBoolean())
      val merged = StreamDedup.merge(
        StreamDedup.ShardSeen(a.map(_._1).toArray, a.map(_._2).toArray),
        b.toArray)
      val got = merged.hi.zip(merged.lo).toList
      assert(got == hashes, "merge must be the sorted union")
    }
  }
}
