package graft

/**
 * Flat-YAML config loader (reference: util/Parameters.java loads ~80
 * fields from params.yaml). Supports the subset the reference's config
 * files actually use: `key: value` lines, `#` comments, quoted strings,
 * numbers, booleans, and inline lists `[a, b, c]`. No external
 * dependencies (zero-egress build).
 */
object ParamsLoader {

  def parse(text: String): Map[String, String] =
    text.linesIterator
      .map(_.takeWhile(_ != '#').trim)
      .filter(l => l.nonEmpty && l.contains(":"))
      .map { l =>
        val i = l.indexOf(':')
        val k = l.substring(0, i).trim
        val v = l.substring(i + 1).trim.stripPrefix("\"").stripSuffix("\"")
        k -> v
      }
      .toMap

  def load(path: String): Params =
    fromMap(parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path))))

  def list(v: String): Seq[String] =
    v.stripPrefix("[").stripSuffix("]").split(",").map(_.trim).filter(_.nonEmpty).toSeq

  def fromMap(m: Map[String, String]): Params = {
    val d = Params()
    def i(k: String, dv: Int) = m.get(k).map(_.toInt).getOrElse(dv)
    def l(k: String, dv: Long) = m.get(k).map(_.toLong).getOrElse(dv)
    def f(k: String, dv: Float) = m.get(k).map(_.toFloat).getOrElse(dv)
    def s(k: String, dv: String) = m.getOrElse(k, dv)
    Params(
      dim = i("vectorDim", d.dim),
      metric = s("metricType", d.metric),
      k = i("k", d.k),
      numPartitions = i("parallelism", d.numPartitions),
      maxTtl = l("maxTTL", d.maxTtl),
      lshNumFamilies = i("lshNumFamilies", d.lshNumFamilies),
      lshNumHashes = i("lshNumHashes", d.lshNumHashes),
      lshBucketWidth = f("lshBucketWidth", d.lshBucketWidth),
      lshSeed = l("lshSeed", d.lshSeed),
      sfcBits = i("lshPartitionUpdateHilbertBits", i("sfcBits", d.sfcBits)),
      hnswM = i("hnswM", d.hnswM),
      hnswEfConstruction = i("hnswEfConstruction", d.hnswEfConstruction),
      hnswEfSearch = i("hnswEfSearch", d.hnswEfSearch),
      maxElementsPerTable = i("rocksDBMaxElementsPerHnswTable", d.maxElementsPerTable))
  }
}
