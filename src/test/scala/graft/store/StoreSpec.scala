package graft.store

import org.scalatest.funsuite.AnyFunSuite
import graft.Metric
import graft.functions.Distances

class StoreSpec extends AnyFunSuite {
  private def randomVecs(n: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  private def bruteForce(vecs: Array[Array[Float]], q: Array[Float], k: Int,
      live: Int => Boolean = _ => true): Array[Long] =
    vecs.indices.filter(live)
      .map(i => (i.toLong, Distances.l2(q, vecs(i))))
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toArray

  test("ExactStore matches brute force, honors ttl window and deletes") {
    val vecs = randomVecs(500, 16, 1L)
    val s = new ExactStore(Metric.L2)
    vecs.zipWithIndex.foreach { case (v, i) => s.put(i.toLong, i.toLong, v) }
    val q = vecs(7)
    assert(s.search(q, 10).map(_._1).sameElements(bruteForce(vecs, q, 10)))
    // freshness: only ts in [100, 200]
    val got = s.search(q, 10, 100L, 200L).map(_._1)
    assert(got.forall(id => id >= 100 && id <= 200))
    // delete the best hit (itself)
    s.delete(7L)
    assert(!s.search(q, 10).map(_._1).contains(7L))
    // upsert: re-insert id 7 with a new vector far away
    s.put(7L, 999L, Array.fill(16)(100f))
    assert(!s.search(q, 10).map(_._1).contains(7L)) // new version is far
    assert(s.size == 500)
  }

  test("HnswStore recall@10 >= 0.9 vs brute force on 2000 gaussian vectors") {
    val vecs = randomVecs(2000, 32, 2L)
    val s = new HnswStore(Metric.L2, m = 16, efConstruction = 128, efSearch = 64)
    vecs.zipWithIndex.foreach { case (v, i) => s.put(i.toLong, 0L, v) }
    val rnd = new java.util.Random(3L)
    val recalls = (0 until 50).map { _ =>
      val q = vecs(rnd.nextInt(2000))
      val truth = bruteForce(vecs, q, 10).toSet
      val got = s.search(q, 10).map(_._1)
      got.count(truth.contains).toDouble / 10
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"mean recall $mean")
  }

  test("HnswStore: deletes, upserts and freshness filtering") {
    val vecs = randomVecs(300, 16, 4L)
    val s = new HnswStore(Metric.L2, efSearch = 64)
    vecs.zipWithIndex.foreach { case (v, i) => s.put(i.toLong, i.toLong, v) }
    val q = vecs(5)
    assert(s.search(q, 5).map(_._1).contains(5L))
    s.delete(5L)
    assert(!s.search(q, 5).map(_._1).contains(5L))
    assert(s.size == 299)
    // freshness window excludes old elements
    val fresh = s.search(q, 10, 250L, 400L).map(_._1)
    assert(fresh.nonEmpty && fresh.forall(id => id >= 250))
    // upsert: new version of id 10 at the query point wins
    s.put(10L, 300L, q.clone())
    val top = s.search(q, 3).map(_._1)
    assert(top.contains(10L))
    assert(s.size == 299) // id 5 deleted; id 10 upsert replaces, not adds
  }

  test("HnswStore widens ef under heavy staleness / narrow freshness windows") {
    val vecs = randomVecs(300, 8, 9L)
    val s = new HnswStore(Metric.L2, m = 8, efConstruction = 32, efSearch = 16)
    // 90% stale: every label re-put 10 times (only the last version live)
    (0 until 10).foreach { v =>
      vecs.zipWithIndex.foreach { case (x, i) =>
        s.put(i.toLong, v * 1000L + i, x)
      }
    }
    val q = vecs(5)
    val full = s.search(q, 10)
    assert(full.length == 10, s"stale graph must still fill k: ${full.length}")
    assert(full.map(_._1).sameElements(bruteForce(vecs, q, 10)))
    // narrow window: only the final versions of labels 0..4 are fresh
    val narrow = s.search(q, 10, 9000L, 9004L).map(_._1)
    assert(narrow.toSet == Set(0L, 1L, 2L, 3L, 4L),
      s"narrow window must find every fresh element: ${narrow.toList}")
  }

  test("HnswStore in-walk filtered search: 1% attribute recall, v2 roundtrip, fallback on family mismatch / missing column") {
    val vecs = randomVecs(3000, 16, 11L)
    // 1% attribute, deliberately uncorrelated with vector space; the
    // store compares opaque longs, so the test can use the label itself
    val labels = Array.tabulate(3000)(i => (i % 100).toLong)
    val s = new HnswStore(Metric.L2, m = 16, efConstruction = 128,
      efSearch = 64)
    vecs.zipWithIndex.foreach { case (v, i) => s.put(i.toLong, 0L, v) }
    s.setAttrHashes("label", numeric = true, labels)
    assert(s.attrColumns == Set("label"))
    val rnd = new java.util.Random(12L)
    val recalls = (0 until 30).map { _ =>
      val qi = rnd.nextInt(3000)
      val q = vecs(qi)
      val lbl = (qi % 100).toLong
      val truth = bruteForce(vecs, q, 10, i => i % 100 == qi % 100).toSet
      val got = s.searchFiltered(q, 10, Long.MinValue, Long.MaxValue,
        "label", qNumeric = true, lbl)
      assert(got.forall { case (id, _) => id % 100 == lbl },
        "in-walk acceptance admitted a non-matching node")
      got.count(t => truth.contains(t._1)).toDouble / 10
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"in-walk filtered recall $mean")
    // v2 serialization roundtrip carries the hashes
    val bos = new java.io.ByteArrayOutputStream()
    s.writeTo(new java.io.DataOutputStream(bos))
    val r = HnswStore.readFrom(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)), efSearch = 64)
    assert(r.attrColumns == Set("label"))
    val q = vecs(123)
    assert(r.searchFiltered(q, 10, Long.MinValue, Long.MaxValue,
        "label", qNumeric = true, 23L)
      .sameElements(s.searchFiltered(q, 10, Long.MinValue, Long.MaxValue,
        "label", qNumeric = true, 23L)))
    // family mismatch / unknown column: conservative unfiltered fallback
    assert(s.searchFiltered(q, 10, Long.MinValue, Long.MaxValue,
        "label", qNumeric = false, 23L).sameElements(s.search(q, 10)))
    assert(s.searchFiltered(q, 10, Long.MinValue, Long.MaxValue,
        "other", qNumeric = true, 23L).sameElements(s.search(q, 10)))
    // an attribute-less graph still writes byte-format v1
    val s1 = new HnswStore(Metric.L2, efSearch = 32)
    vecs.take(50).zipWithIndex.foreach { case (v, i) => s1.put(i.toLong, 0L, v) }
    val bos1 = new java.io.ByteArrayOutputStream()
    s1.writeTo(new java.io.DataOutputStream(bos1))
    assert(bos1.toByteArray()(4) == 1, "attribute-less sidecar must stay v1")
    val r1 = HnswStore.readFrom(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos1.toByteArray)))
    assert(r1.attrColumns.isEmpty)
  }

  test("HnswStore is deterministic for the same insert sequence") {
    val vecs = randomVecs(400, 16, 6L)
    def build() = {
      val s = new HnswStore(Metric.L2, seed = 99L)
      vecs.zipWithIndex.foreach { case (v, i) => s.put(i.toLong, 0L, v) }
      s
    }
    val a = build(); val b = build()
    val q = randomVecs(1, 16, 7L)(0)
    assert(a.search(q, 10).sameElements(b.search(q, 10)))
  }
}
