package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Vector distance functions as native codegen Catalyst expressions over
 * ARRAY<FLOAT> columns (reference semantics: hnswlib space_l2.h /
 * space_ip.h / space_cos.h — L2 is *squared* L2; IP and cosine are
 * `1 - similarity` so that ascending distance = closer for every metric).
 *
 * Accumulation is sequential in double precision (each float widened to
 * double), which makes results bit-identical to a DuckDB
 * `list_sum([(CAST(x AS DOUBLE)...)^2 ...])` oracle and independent of
 * Spark's physical plan.
 */
abstract class VectorDistanceExpression extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected def compute(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    // fail fast on mismatched dimensions: unsafe array reads do not
    // bounds-check, so without this a dim mismatch returns garbage
    // distances instead of an error
    if (aa.numElements() != bb.numElements()) {
      throw new IllegalArgumentException(
        s"$prettyName: vector dimensions differ (" +
          s"${aa.numElements()} vs ${bb.numElements()})")
    }
    compute(aa, bb)
  }

  /** Codegen twin of the dimension guard above. */
  protected def dimCheck(a: String, b: String): String =
    s"""if ($a.numElements() != $b.numElements()) {
       |  throw new IllegalArgumentException(
       |    "$prettyName: vector dimensions differ (" +
       |    $a.numElements() + " vs " + $b.numElements() + ")");
       |}""".stripMargin
}

/** Squared Euclidean distance: sum_i (a_i - b_i)^2. */
case class L2Distance(left: Expression, right: Expression) extends VectorDistanceExpression {
  override def prettyName: String = "l2_distance"

  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |${dimCheck(a, b)}
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Inner-product distance: 1 - sum_i a_i * b_i (hnswlib IP space). */
case class IpDistance(left: Expression, right: Expression) extends VectorDistanceExpression {
  override def prettyName: String = "ip_distance"

  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    1.0 - acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |${dimCheck(a, b)}
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = 1.0 - $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine distance: 1 - dot(a,b) / sqrt(|a|^2 * |b|^2); 1.0 if either norm is 0. */
case class CosineDistance(left: Expression, right: Expression) extends VectorDistanceExpression {
  override def prettyName: String = "cosine_distance"

  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |${dimCheck(a, b)}
         |final int $n = $a.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $a.getFloat($i);
         |  final double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 1.0 : 1.0 - $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Plain dot product (similarity, not a distance). */
case class DotProduct(left: Expression, right: Expression) extends VectorDistanceExpression {
  override def prettyName: String = "dot_product"

  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |${dimCheck(a, b)}
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level API + SQL registration for the distance expressions. */
object Distances {
  def l2(a: Column, b: Column): Column =
    Bridge.column(L2Distance(Bridge.expression(a), Bridge.expression(b)))
  def ip(a: Column, b: Column): Column =
    Bridge.column(IpDistance(Bridge.expression(a), Bridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineDistance(Bridge.expression(a), Bridge.expression(b)))
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Distance column for a [[graft.Metric]]. */
  def forMetric(metric: graft.Metric, a: Column, b: Column): Column = metric match {
    case graft.Metric.L2 => l2(a, b)
    case graft.Metric.IP => ip(a, b)
    case graft.Metric.Cosine => cosine(a, b)
  }

  /** True when the JDK Vector API kernels are loadable (JVM started with
   * --add-modules=jdk.incubator.vector, as this build's forked JVMs are).
   * Probed once; a missing module surfaces as a LinkageError on first
   * touch and flips the dispatch to the scalar kernels permanently. */
  private val simdAvailable: Boolean =
    try SimdKernels.l2(Array(1f, 2f), Array(1f, 2f)) == 0f
    catch { case _: LinkageError => false }

  /** Float-accumulating L2 — for NAVIGATION/ROUTING uses (HNSW graph
   * walks, k-means cell assignment, PQ codebook scans) where last-ulp
   * parity with the sequential-double oracle kernel is immaterial but
   * throughput is everything. Vector-API kernel when available (pinned
   * 256-bit species — host-independent summation order, so seeded fits
   * and graphs stay reproducible), 4-way-unrolled scalar otherwise.
   * Never use where results are oracle-compared or feed lossless pruning
   * bounds. */
  def l2Fast(a: Array[Float], b: Array[Float]): Double =
    if (simdAvailable) SimdKernels.l2(a, b).toDouble else l2FastScalar(a, b)

  private[graft] def l2FastScalar(a: Array[Float], b: Array[Float]): Double = {
    val n = a.length
    var s0 = 0f; var s1 = 0f; var s2 = 0f; var s3 = 0f
    var i = 0
    val n4 = n & ~3
    while (i < n4) {
      val d0 = a(i) - b(i); val d1 = a(i + 1) - b(i + 1)
      val d2 = a(i + 2) - b(i + 2); val d3 = a(i + 3) - b(i + 3)
      s0 += d0 * d0; s1 += d1 * d1; s2 += d2 * d2; s3 += d3 * d3
      i += 4
    }
    var acc = (s0 + s1) + (s2 + s3)
    while (i < n) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc.toDouble
  }

  /** Sequential-double squared L2 with early abandonment: returns the
   * EXACT l2(a, b) whenever that value is <= bound, or some value > bound
   * otherwise. Accumulation order is identical to [[l2]] and the partial
   * sum of squares is nondecreasing, so abandoning once it strictly
   * exceeds the bound cannot change any admitted result — bit-exactness
   * of a bounded top-k scan is preserved while pruned candidates stop
   * after a fraction of the dimensions. Checked every 16 dims to keep
   * the branch off the critical path. */
  def l2Bounded(a: Array[Float], b: Array[Float], bound: Double): Double = {
    val n = a.length
    var acc = 0.0
    var i = 0
    while (i < n) {
      val lim = math.min(n, i + 16)
      while (i < lim) {
        val d = a(i).toDouble - b(i).toDouble
        acc += d * d
        i += 1
      }
      if (acc > bound) return acc
    }
    acc
  }

  /** Pure-Scala versions (used by the in-memory stores / HNSW). */
  def l2(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
    acc
  }
  def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  def ip(a: Array[Float], b: Array[Float]): Double = 1.0 - dot(a, b)
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - d / math.sqrt(na * nb)
  }
  def forMetric(metric: graft.Metric): (Array[Float], Array[Float]) => Double = metric match {
    case graft.Metric.L2 => l2
    case graft.Metric.IP => ip
    case graft.Metric.Cosine => cosine
  }
}
