package graft.tools

import graft.api.GraftSession

/** Write `.explain("formatted")` output for SparkEntry queries to
  * files (dev tool; feeds the plans/rNN before/after artifacts).
  *
  * args = outDir sfDir query [query ...]; each query's plan lands in
  * `outDir/<query>.txt`. Uses the same tuned session as Verify/Bench
  * so plan shapes match what the bench times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <sfDir> <query> [<query>...]")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = args(1)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-plandump")
    args.drop(2).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // QueryExecution.explainString mirrors Dataset.explain("formatted")
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $name (${txt.length} chars)")
    }
    spark.stop()
  }
}
