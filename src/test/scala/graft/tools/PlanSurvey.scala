package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump PlanProps for every SparkEntry query so PlanCheckSpec
 * expectations can be extended from observed plans (then eyeballed for
 * scale sanity) instead of guessed. `Test/runMain graft.tools.PlanSurvey
 * [sfDir]`. */
object PlanSurvey {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val line =
        try {
          val p = PlanProps.of(spark, dir, name)
          val rows = fn(spark, dir).count()
          s"$name rows=$rows pushed=${p.pushedFilters} bcast=${p.broadcast} " +
            s"wscg=${p.wscg} smj=${p.sortMerge} objAgg=${p.objHashAgg}"
        } catch { case e: Throwable => s"$name ERROR ${e.getMessage}" }
      println(s"PLANSURVEY $line")
    }
    spark.stop()
  }
}
