package graft

import org.scalatest.funsuite.AnyFunSuite

class ParamsSpec extends AnyFunSuite {
  test("flat yaml parsing: comments, quotes, lists") {
    val m = ParamsLoader.parse(
      """# experiment config
        |vectorDim: 128
        |metricType: "L2"   # quoted
        |k: 10
        |insertRates: [9500, 0]
        |
        |maxTTL: 2400000
        |""".stripMargin)
    assert(m("vectorDim") == "128")
    assert(m("metricType") == "L2")
    assert(ParamsLoader.list(m("insertRates")) == Seq("9500", "0"))
  }

  test("fromMap applies reference defaults and overrides") {
    val p = ParamsLoader.fromMap(Map("vectorDim" -> "64", "k" -> "5",
      "hnswM" -> "32", "maxTTL" -> "1000"))
    assert(p.dim == 64 && p.k == 5 && p.hnswM == 32 && p.maxTtl == 1000L)
    assert(p.hnswEfConstruction == 128) // default preserved
    assert(Metric(p.metric) == Metric.L2)
  }
}
