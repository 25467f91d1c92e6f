package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class CurvesSpec extends AnyFunSuite {

  test("zorder interleaves with dim0 least significant per bit plane") {
    // reference placement: bit (dimension*i + j) = bit i of coordinate j
    val c = ZOrderCurve(2, 2)
    // (x=0b01, y=0b10): bit0 of x at pos 0, bit0 of y at pos 1,
    // bit1 of x at pos 2, bit1 of y at pos 3 -> 0b1001 = 9? x=1: bits (1,0); y=2: bits(0,1)
    // pos0 = x bit0 = 1; pos1 = y bit0 = 0; pos2 = x bit1 = 0; pos3 = y bit1 = 1 -> 0b1001 = 9
    assert(c.index(Array(1L, 2L)) == BigInt(9))
    assert(c.index(Array(0L, 0L)) == BigInt(0))
    assert(c.index(Array(3L, 3L)) == BigInt(15))
  }

  test("zorder is a bijection on the grid") {
    val c = ZOrderCurve(3, 3)
    val seen = collection.mutable.Set.empty[BigInt]
    for (x <- 0 until 8; y <- 0 until 8; z <- 0 until 8)
      seen += c.index(Array(x.toLong, y.toLong, z.toLong))
    assert(seen.size == 512)
    assert(seen.max == BigInt(511) && seen.min == BigInt(0))
  }

  test("gray curve = per-coordinate gray code then zorder") {
    val g = GrayCurve(2, 3)
    val z = ZOrderCurve(2, 3)
    for (x <- 0 until 8; y <- 0 until 8) {
      val expected = z.index(Array(x ^ (x >> 1), y ^ (y >> 1)).map(_.toLong))
      assert(g.index(Array(x.toLong, y.toLong)) == expected)
    }
  }

  test("hilbert is a bijection and consecutive indices are grid neighbors") {
    for (dim <- Seq(2, 3); bits <- Seq(2, 3)) {
      val c = HilbertCurve(dim, bits)
      val side = 1 << bits
      val total = BigInt(side).pow(dim).toInt
      val byIndex = new Array[Array[Long]](total)
      def rec(prefix: List[Long], d: Int): Unit =
        if (d == dim) {
          val v = prefix.toArray
          val idx = c.index(v).toInt
          assert(byIndex(idx) == null, s"collision at $idx")
          byIndex(idx) = v
        } else (0 until side).foreach(x => rec(prefix :+ x.toLong, d + 1))
      rec(Nil, 0)
      // adjacency: each consecutive pair differs by 1 in exactly one coord
      for (i <- 1 until total) {
        val a = byIndex(i - 1); val b = byIndex(i)
        val diff = a.zip(b).map { case (p, q) => math.abs(p - q) }.sum
        assert(diff == 1, s"dim=$dim bits=$bits: index ${i - 1}->$i not adjacent")
      }
    }
  }

  test("hilbert matches canonical 2x2 first-order curve shape") {
    val c = HilbertCurve(2, 1)
    val pts = (0 until 4).map { i =>
      (0 until 2).flatMap(x => (0 until 2).map(y => Array(x.toLong, y.toLong)))
        .find(v => c.index(v).toInt == i).get.toList
    }
    // must be a Hamiltonian path over the 4 cells
    assert(pts.distinct.size == 4)
  }

  test("peano is a bijection and consecutive indices are grid neighbors") {
    val c = PeanoCurve(2, 2) // 9x9 grid, 81 cells
    val byIndex = collection.mutable.Map.empty[BigInt, (Long, Long)]
    for (x <- 0 until 9; y <- 0 until 9) {
      val idx = c.index(Array(x.toLong, y.toLong))
      assert(!byIndex.contains(idx))
      byIndex(idx) = (x.toLong, y.toLong)
    }
    assert(byIndex.size == 81)
    for (i <- 1 until 81) {
      val (ax, ay) = byIndex(BigInt(i - 1))
      val (bx, by) = byIndex(BigInt(i))
      assert(math.abs(ax - bx) + math.abs(ay - by) == 1, s"peano step $i not unit")
    }
  }

  test("curves reject wrong dimension") {
    intercept[IllegalArgumentException](ZOrderCurve(2, 2).index(Array(1L)))
    intercept[IllegalArgumentException](PeanoCurve(2, 2).index(Array(9L, 0L)))
  }

  test("part_gray oracle arithmetic equals GrayCurve.index on the full grid") {
    // the SQL twin's closed form (per-coordinate g = x ^ (x >> 1), then
    // the Z interleave) must BE GrayCurve, not merely resemble it
    val g = GrayCurve(2, 7)
    val z = ZOrderCurve(2, 7)
    for (x <- 0L until 128L; y <- 0L until 128L by 7) {
      val viaSql = z.index(Array(x ^ (x >> 1), y ^ (y >> 1)))
      assert(viaSql == g.index(Array(x, y)), s"cell ($x, $y)")
    }
  }
}
