package graft.functions

/**
 * Deterministic text-analysis primitives for large-scale training-data
 * pipelines: tokenization, quality scoring, language-ID heuristics,
 * fingerprints (rolling hash), character shingles, MinHash and SimHash
 * signatures. All hashes are self-contained and platform-independent so
 * signatures computed on different executors/JVMs agree.
 */
object Text {

  /** Whitespace tokens (empty input -> empty array). */
  def tokens(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else text.trim.split("\\s+").filter(_.nonEmpty)

  /** BPE-ish subword-ish token count: runs of word chars or single
   * non-space punctuation (a cheap stand-in for a real tokenizer's
   * token count at corpus-statistics scale). */
  val bpeishPattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

  /** 64-bit FNV-1a over UTF-8 bytes — stable across JVMs. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Polynomial rolling hashes of every w-char window (Rabin-Karp style,
   * base 257 mod 2^61-1); the document fingerprint is the minimum window
   * hash (winnowing-lite). */
  def rollingFingerprint(text: String, w: Int): Long = {
    if (text == null || text.length < w) return fnv1a64(if (text == null) "" else text)
    val Mod = (1L << 61) - 1
    val Base = 257L
    def mulmod(a: Long, b: Long): Long = {
      val r = new java.math.BigInteger(java.lang.Long.toUnsignedString(a))
        .multiply(java.math.BigInteger.valueOf(b))
        .mod(java.math.BigInteger.valueOf(Mod))
      r.longValue()
    }
    var pow = 1L
    var i = 0
    while (i < w - 1) { pow = mulmod(pow, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (mulmod(h, Base) + text.charAt(i)) % Mod; i += 1 }
    var minH = h
    i = w
    while (i < text.length) {
      h = (h - mulmod(pow, text.charAt(i - w)) % Mod + Mod) % Mod
      h = (mulmod(h, Base) + text.charAt(i)) % Mod
      if (h < minH) minH = h
      i += 1
    }
    minH
  }

  /** Distinct character w-shingles. */
  def shingles(text: String, w: Int): Set[String] =
    if (text == null || text.length < w) Set.empty
    else (0 to text.length - w).view.map(i => text.substring(i, i + w)).toSet

  /** Jaccard similarity of the w-shingle sets. */
  def ngramJaccard(a: String, b: String, w: Int): Double = {
    val sa = shingles(a, w)
    val sb = shingles(b, w)
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }

  // ---- MinHash ---------------------------------------------------------

  /** numHashes universal-hash parameters (a*x+b mod p), seeded.
   * p = 2^31-1 (Mersenne) keeps every product inside a long — the hash
   * loop is plain integer arithmetic (hot path: |shingles| x numHashes
   * per document). */
  final case class MinHasher(numHashes: Int, seed: Long) extends Serializable {
    private val P = 2147483647L // 2^31 - 1
    private val (as, bs) = {
      val rnd = new java.util.Random(seed)
      val a = Array.fill(numHashes)(math.abs(rnd.nextLong()) % (P - 1) + 1)
      val b = Array.fill(numHashes)(math.abs(rnd.nextLong()) % P)
      (a, b)
    }
    /** Test hook: the (a, b) universal-hash parameters. */
    private[graft] def hashParams: (Array[Long], Array[Long]) = (as, bs)

    /** MinHash signature over the document's w-shingles.
     *
     * Hot path (corpus-dominant ASCII case): window FNV values are
     * computed straight off the chars (for ASCII, UTF-8 bytes == chars,
     * so this equals `fnv1a64(substring)` bit-for-bit) and deduped as a
     * sorted long[] — no per-shingle String, no Set. Dedup by hash is
     * signature-identical to dedup by string: the universal hashes see
     * only `x = fnv(shingle) % P`, so colliding shingles contributed one
     * distinct x either way. Non-ASCII text falls back to the substring
     * path (a char window may split a surrogate pair, whose lone-half
     * UTF-8 replacement bytes are not reproducible from a byte slice). */
    def signature(text: String, w: Int): Array[Long] = {
      val sig = Array.fill(numHashes)(Long.MaxValue)
      if (text == null || text.length < w) return sig
      var ascii = true
      var c = 0
      while (ascii && c < text.length) {
        if (text.charAt(c) >= 0x80) ascii = false
        c += 1
      }
      if (!ascii) {
        shingles(text, w).foreach { s =>
          val x = (fnv1a64(s) & Long.MaxValue) % P
          var i = 0
          while (i < numHashes) {
            val h = (as(i) * x + bs(i)) % P
            if (h < sig(i)) sig(i) = h
            i += 1
          }
        }
        return sig
      }
      val n = text.length
      val hs = new Array[Long](n - w + 1)
      var i = 0
      while (i <= n - w) {
        var h = 0xcbf29ce484222325L
        var j = i
        while (j < i + w) {
          h ^= text.charAt(j) & 0xffL
          h *= 0x100000001b3L
          j += 1
        }
        hs(i) = h
        i += 1
      }
      java.util.Arrays.sort(hs)
      var prev = 0L
      var first = true
      i = 0
      while (i < hs.length) {
        val hv = hs(i)
        if (first || hv != prev) {
          first = false; prev = hv
          val x = (hv & Long.MaxValue) % P
          var k = 0
          while (k < numHashes) {
            val h2 = (as(k) * x + bs(k)) % P
            if (h2 < sig(k)) sig(k) = h2
            k += 1
          }
        }
        i += 1
      }
      sig
    }

    /** LSH band keys: hash of each band of `rowsPerBand` signature slots. */
    def bandKeys(sig: Array[Long], rowsPerBand: Int): Array[Long] = {
      val numBands = sig.length / rowsPerBand
      Array.tabulate(numBands) { b =>
        var h = 0xcbf29ce484222325L ^ b
        var i = b * rowsPerBand
        while (i < (b + 1) * rowsPerBand) {
          h ^= sig(i); h *= 0x100000001b3L; i += 1
        }
        h
      }
    }
  }

  /** Estimated Jaccard from two signatures: fraction of agreeing slots. */
  def minhashSimilarity(a: Array[Long], b: Array[Long]): Double = {
    var same = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }

  // ---- SimHash ---------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens (Charikar 2002). */
  def simhash(text: String): Long = {
    val acc = new Array[Int](64)
    tokens(text).foreach { t =>
      val h = fnv1a64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // ---- Language ID / quality heuristics --------------------------------

  /** Tiny stopword lists per language (deterministic heuristic; accuracy is
   * secondary to the computation being exactly reproducible in the oracle). */
  val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "and", "of", "to", "in", "is", "that", "for", "on"),
    "de" -> Set("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"),
    "fr" -> Set("le", "la", "les", "et", "de", "un", "une", "est", "dans", "pour"),
    "es" -> Set("el", "la", "los", "las", "y", "de", "un", "una", "es", "en"))

  /** Language with the highest stopword hit count; "und" (undetermined) if
   * no stopword matches. Ties broken by language code order. */
  def langId(text: String): String = {
    val ts = tokens(text).map(_.toLowerCase)
    val scores = stopwords.view.mapValues(sw => ts.count(sw.contains)).toMap
    val best = scores.toSeq.sortBy { case (l, c) => (-c, l) }.head
    if (best._2 == 0) "und" else best._1
  }
}
