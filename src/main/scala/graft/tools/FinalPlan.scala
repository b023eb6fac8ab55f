package graft.tools

import graft.api.GraftSession

/** Dump a SparkEntry query's EXECUTED plan after running it through
  * the noop sink (dev tool; feeds plans/rNN *_final.txt artifacts).
  *
  * `.explain("formatted")` before execution shows the INITIAL adaptive
  * plan (`isFinalPlan=false`): AQE's runtime rewrites — exchange/stage
  * reuse, AQEShuffleRead coalescing, join-strategy changes — are
  * invisible there. Claims about those must be checked against the
  * plan AFTER the action, which is what this prints/writes.
  *
  * args = outDir sfDir query [query ...]; plan lands in
  * `outDir/<query>_final.txt`.
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: FinalPlan <outDir> <sfDir> <query> [<query>...]")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = args(1)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-finalplan")
    args.drop(2).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val txt = df.queryExecution.executedPlan.toString
      java.nio.file.Files.write(outDir.resolve(s"${name}_final.txt"),
        txt.getBytes("UTF-8"))
      println(s"[finalplan] wrote $name (${txt.length} chars)")
    }
    spark.stop()
  }
}
