package graft.tools

import graft.api.GraftSession

/** Print a SparkEntry query's executed plan (dev tool): args = name [sfDir]. */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(16, "graft-explain")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
