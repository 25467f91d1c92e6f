package graft.tools
import graft.store.HnswStore
object HnswBench {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(1L)
    val n = 30000
    val dim = 128
    val centers = Array.fill(256)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val vecs = Array.tabulate(n)(i => centers(i % 256).map(_ + rnd.nextGaussian().toFloat * 0.25f))
    // warmup
    val w = new HnswStore(graft.Metric.L2, 16, 64, 64)
    (0 until 5000).foreach(i => w.put(i, 0, vecs(i)))
    val t0 = System.nanoTime()
    val s = new HnswStore(graft.Metric.L2, 16, 64, 64)
    vecs.zipWithIndex.foreach { case (v, i) => s.put(i.toLong, 0L, v) }
    val buildSec = (System.nanoTime() - t0) / 1e9
    println(f"build: $n in $buildSec%.2fs = ${n / buildSec}%.0f inserts/s/thread")
    val t1 = System.nanoTime()
    var hits = 0
    (0 until 2000).foreach { i => hits += s.search(vecs(i * 7 % n), 10).length }
    val qSec = (System.nanoTime() - t1) / 1e9
    println(f"search: 2000 in $qSec%.2fs = ${2000 / qSec}%.0f q/s/thread ($hits)")
  }
}
