package graft.tools

import graft.functions.Distances
import graft.partitioners.LshPartitioner
import graft.store.HnswStore

/** Pure-JVM diagnosis: separate LSH routing coverage from HNSW recall. */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42L)
    val dim = 32
    val centers = Array.fill(32)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 3200).map { i =>
      val c = centers(i % 32)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.05f))
    }.toArray
    val model = LshPartitioner.seeded(16, dim, 6, 2, 4.0f, 38324L)
    val dp = vecs.map { case (id, v) => model.dataPartitions(v, id).toSet }
    val queries = vecs.filter(_._1 % 40 == 0)
    var covSum = 0.0
    queries.foreach { case (qid, qv) =>
      val truth = vecs.map { case (id, v) => (id, Distances.l2(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
      val qp = model.queryPartitions(qv).toSet
      val covered = truth.count(t => dp(t.toInt).intersect(qp).nonEmpty)
      covSum += covered / 10.0
    }
    println(s"routing coverage = ${covSum / queries.length}")
    // fan-out stats
    val fanouts = vecs.map(v => dp(v._1.toInt).size)
    println(s"mean data fan-out = ${fanouts.sum.toDouble / fanouts.length}")
    val partCounts = new Array[Int](16)
    dp.foreach(_.foreach(partCounts(_) += 1))
    println(s"partition sizes = ${partCounts.toList}")
    // HNSW recall inside the biggest partition
    val big = partCounts.indexOf(partCounts.max)
    val members = vecs.filter(v => dp(v._1.toInt).contains(big))
    val store = new HnswStore(graft.Metric.L2, 16, 128, 64)
    members.foreach { case (id, v) => store.put(id, 0L, v) }
    var hr = 0.0
    val qs = members.take(50)
    qs.foreach { case (qid, qv) =>
      val truth = members.map { case (id, v) => (id, Distances.l2(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      val got = store.search(qv, 10).map(_._1)
      hr += got.count(truth.contains) / 10.0
    }
    println(s"hnsw in-partition recall = ${hr / qs.length} (partition size ${members.length})")
  }
}
