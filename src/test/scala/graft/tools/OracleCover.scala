package graft.tools
object OracleCover {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println(s"queries without oracle: ${(q -- o).toList.sorted}")
    println(s"oracles without query: ${(o -- q).toList.sorted}")
  }
}
