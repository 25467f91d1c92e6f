package graft.functions

/**
 * Space-filling curve indexes over non-negative integer grid coordinates.
 * Semantics match the reference partitioners' curve family
 * (reference: flink-frontend partitioner/curve/{ZOrderCurve,GrayCurve,
 * PeanoCurve,HilbertCurve}.java): `index(vector)` maps a point on a
 * `dimension`-dim grid with `bits` bits (ternary digits for Peano) per
 * coordinate to a locality-preserving 1-D index.
 */
sealed trait SpaceFillingCurve extends Serializable {
  def dimension: Int
  def bits: Int
  def index(vector: Array[Long]): BigInt
  /** Highest index + 1 (curve range size). */
  def maxIndex: BigInt
}

object SpaceFillingCurve {
  def apply(name: String, dimension: Int, bits: Int): SpaceFillingCurve =
    name.toLowerCase match {
      case "zorder" => ZOrderCurve(dimension, bits)
      case "gray" => GrayCurve(dimension, bits)
      case "hilbert" => HilbertCurve(dimension, bits)
      case "peano" => PeanoCurve(dimension, bits)
      // The reference declares a Sierpinski variant but leaves it
      // unimplemented (SierpinskiCurve.java: UnsupportedOperationException);
      // we map it to Hilbert (closest locality behavior) rather than throw.
      case "sierpinski" => HilbertCurve(dimension, bits)
      case other => throw new IllegalArgumentException(s"unknown curve: $other")
    }
}

/** Bit-interleaved Z-order (Morton) index. Within each bit plane the
 * *first* dimension occupies the least-significant position, matching the
 * reference's placement `dimension * bitIdx + dimIdx`
 * (ZOrderCurve.java index loop). */
final case class ZOrderCurve(dimension: Int, bits: Int) extends SpaceFillingCurve {
  def index(vector: Array[Long]): BigInt = {
    require(vector.length == dimension, "Vector dimension mismatch.")
    var result = BigInt(0)
    var i = bits - 1
    while (i >= 0) {
      var j = 0
      while (j < dimension) {
        if (((vector(j) >> i) & 1L) != 0L) result = result.setBit(dimension * i + j)
        j += 1
      }
      i += 1 - 2 // decrement
    }
    result
  }
  def maxIndex: BigInt = BigInt(1) << (dimension * bits)
}

/** Gray-coded Z-order: per-coordinate binary-reflected Gray code, then
 * Z-order interleave (reference GrayCurve.java). */
final case class GrayCurve(dimension: Int, bits: Int) extends SpaceFillingCurve {
  private val z = ZOrderCurve(dimension, bits)
  def index(vector: Array[Long]): BigInt = {
    require(vector.length == dimension, "Vector dimension mismatch.")
    val buf = new Array[Long](dimension)
    var i = 0
    while (i < dimension) { buf(i) = vector(i) ^ (vector(i) >> 1); i += 1 }
    z.index(buf)
  }
  def maxIndex: BigInt = BigInt(1) << (dimension * bits)
}

/** N-dimensional Hilbert index via Skilling's public-domain algorithm
 * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004) — the same
 * algorithm behind the library the reference proxies
 * (HilbertCurve.java:46-50). Axes -> transposed form -> bit interleave. */
final case class HilbertCurve(dimension: Int, bits: Int) extends SpaceFillingCurve {
  def index(vector: Array[Long]): BigInt = {
    require(vector.length == dimension, "Vector dimension mismatch.")
    val x = java.util.Arrays.copyOf(vector, dimension)
    val n = dimension
    val m = 1L << (bits - 1)
    // Inverse undo excess work (axes -> transpose)
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) {
          x(0) ^= p // invert low bits of x(0)
        } else {
          val t = (x(0) ^ x(i)) & p
          x(0) ^= t
          x(i) ^= t
        }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // Interleave transposed bits, MSB plane first, dim 0 most significant
    // within a plane (transposed-form convention).
    var result = BigInt(0)
    var b = bits - 1
    while (b >= 0) {
      var j = 0
      while (j < n) {
        result = result << 1
        if (((x(j) >> b) & 1L) != 0L) result = result | 1
        j += 1
      }
      b -= 1
    }
    result
  }
  def maxIndex: BigInt = BigInt(1) << (dimension * bits)
}

/** N-dimensional Peano curve over ternary digits (Peano 1890, n-dim form
 * as in Sagan, "Space-Filling Curves", ch. 3 — the construction behind the
 * paper cited by the reference's PeanoCurve.java). Coordinates are written
 * as `bits` base-3 digits MSB-first; the index's digits are the coordinate
 * digits in interleaved order (level-major, dim-minor), each digit flipped
 * by the involution T(mu)=2-mu as many times as the parity of all earlier
 * interleaved digits belonging to *other* dimensions. (T preserves digit
 * parity, so the flip count can be computed from the raw coordinate
 * digits.) Note: the reference implementation fills only row 0 of its
 * input buffer — an apparent transcription bug that breaks bijectivity;
 * we implement the published construction, which is bijective and
 * unit-continuous (property-tested). */
final case class PeanoCurve(dimension: Int, bits: Int) extends SpaceFillingCurve {
  private val maxValue: Long = math.pow(3, bits).toLong
  def index(vector: Array[Long]): BigInt = {
    require(vector.length == dimension, "Vector dimension mismatch.")
    // digits(j)(i) = i-th most significant ternary digit of coordinate j
    val digits = Array.ofDim[Int](dimension, bits)
    var j = 0
    while (j < dimension) {
      require(vector(j) < maxValue && vector(j) >= 0, "Vector value out of range.")
      var v = vector(j)
      var b = bits - 1
      while (b >= 0) { digits(j)(b) = (v % 3).toInt; v /= 3; b -= 1 }
      j += 1
    }
    // prefix(j)(i) = sum of digits of coordinate j at levels < i
    var result = BigInt(0)
    var level = 0
    while (level < bits) {
      j = 0
      while (j < dimension) {
        // parity of digits preceding interleaved position (level, j) that
        // belong to other dims: dims j' < j at levels <= level, dims
        // j' > j at levels < level.
        var e = 0
        var jp = 0
        while (jp < dimension) {
          if (jp != j) {
            val upto = if (jp < j) level + 1 else level
            var l = 0
            while (l < upto) { e += digits(jp)(l); l += 1 }
          }
          jp += 1
        }
        val mu = digits(j)(level)
        val d = if (e % 2 == 0) mu else 2 - mu
        result = result * 3 + d
        j += 1
      }
      level += 1
    }
    result
  }
  def maxIndex: BigInt = BigInt(3).pow(dimension * bits)
}
