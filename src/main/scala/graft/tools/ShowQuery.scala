package graft.tools

import graft.api.GraftSession

/** Print a SparkEntry query's result (dev tool): args = name [sfDir]. */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(16, "graft-show")
    graft.SparkEntry.queries(name)(spark, sfDir).show(100, truncate = false)
    spark.stop()
  }
}
