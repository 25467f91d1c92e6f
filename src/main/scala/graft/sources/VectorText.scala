package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.VectorData

/**
 * Text vector protocol (reference: data/vector/HDFSVectorParser.java:43-98):
 *   `i <id>,<f1>,<f2>,...`  insert
 *   `d <id>`                delete
 *   `q <f1>,<f2>,...`       query (id assigned externally)
 * Blank lines ignored. The reference marks this deprecated but ships it;
 * we keep parse() as the spec and expose a DataFrame reader.
 */
object VectorText {

  sealed trait Parsed
  final case class Insert(data: VectorData) extends Parsed
  final case class Delete(id: Long) extends Parsed
  final case class Query(vec: Array[Float]) extends Parsed

  def parse(line: String): Option[Parsed] = {
    val t = line.trim
    if (t.isEmpty) None
    else t.charAt(0) match {
      case 'i' =>
        val parts = t.substring(1).trim.split(",")
        Some(Insert(VectorData.insert(parts.head.trim.toLong,
          parts.tail.map(_.trim.toFloat))))
      case 'd' =>
        Some(Delete(t.substring(1).trim.toLong))
      case 'q' =>
        Some(Query(t.substring(1).trim.split(",").map(_.trim.toFloat)))
      case _ => throw new IllegalArgumentException(s"unparseable line: $t")
    }
  }

  /** Read the insert/delete stream of a text vector file ->
   * (id, vec, eventTime := line order, ttl, isDeletion). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd
      .zipWithIndex()
      .flatMap { case (line, idx) =>
        parse(line).collect {
          case Insert(v) => (v.id, v.value, idx, Long.MaxValue, false)
          case Delete(id) => (id, null.asInstanceOf[Array[Float]], idx, Long.MaxValue, true)
        }
      }
      .toDF("id", "vec", "eventTime", "ttl", "isDeletion")
  }

  /** Read only the queries of a text vector file -> (qid := query ORDINAL
   * 0..nq-1, qv). The ordinal — not the raw line index — is what aligns
   * with ivecs ground-truth files, whose rows are indexed by query order
   * ([[VectorFiles.readIvecs]]); a line index would count inserts/deletes
   * and blank lines too and never join the ground truth. */
  def readQueries(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd
      .zipWithIndex()
      .flatMap { case (line, idx) =>
        parse(line).collect { case Query(v) => (idx, v) }
      }
      .sortBy(_._1)
      .zipWithIndex()
      .map { case ((_, v), ordinal) => (ordinal, v) }
      .toDF("qid", "qv")
  }
}
