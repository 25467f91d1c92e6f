package graft.functions

import java.util.Random

/**
 * Locality-sensitive hashing on p-stable (Gaussian) projections,
 * Datar et al., SoCG 2004 — the scheme the reference uses
 * (reference: partitioner/lsh/L2Hash.java:35-38 `floor((a.v + b) / r)`,
 * partitioner/lsh/L2HashFamily.java — family of k such hashes, each
 * seeded from a parent `Random`'s `nextLong`).
 *
 * Determinism contract: same (dim, k, r, seed) -> identical hash values on
 * every JVM (java.util.Random is specified), so the model can be
 * broadcast or re-created per executor without coordination.
 */
final class L2Hash private (val a: Array[Float], val b: Float, val r: Float)
    extends Serializable {
  def hash(v: Array[Float]): Int = {
    var dotv = 0.0f
    var i = 0
    while (i < a.length) { dotv += a(i) * v(i); i += 1 }
    math.floor(((dotv + b) / r).toDouble).toInt
  }
}

object L2Hash {
  /** Draw order matches the reference (L2Hash ctor): first `b` uniform in
   * [0, r), then `dim` Gaussian components of `a`. */
  def apply(dim: Int, r: Float, random: Random): L2Hash = {
    val b = random.nextFloat() * r
    val a = new Array[Float](dim)
    var i = 0
    while (i < dim) { a(i) = random.nextGaussian().toFloat; i += 1 }
    new L2Hash(a, b, r)
  }
}

/** A family of k p-stable hashes (reference L2HashFamily.java). */
final class L2HashFamily private (val hashes: Array[L2Hash]) extends Serializable {
  def numHashes: Int = hashes.length
  def hash(v: Array[Float]): Array[Int] = {
    val out = new Array[Int](hashes.length)
    var i = 0
    while (i < hashes.length) { out(i) = hashes(i).hash(v); i += 1 }
    out
  }
}

object L2HashFamily {
  def apply(dim: Int, k: Int, r: Float, random: Random): L2HashFamily =
    new L2HashFamily(Array.fill(k)(L2Hash(dim, r, new Random(random.nextLong()))))

  def seeded(dim: Int, k: Int, r: Float, seed: Long): L2HashFamily =
    apply(dim, k, r, new Random(seed))

  /** Hash-values -> node id, `floorMod(arrayHash, n)`
   * (reference L2HashFamily.getNodeId:66-68, java.util.Arrays.hashCode). */
  def nodeId(hashValues: Array[Int], n: Int): Int = {
    var h = 1
    var i = 0
    while (i < hashValues.length) { h = 31 * h + hashValues(i); i += 1 }
    java.lang.Math.floorMod(h, n)
  }
}
