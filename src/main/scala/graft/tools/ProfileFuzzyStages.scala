package graft.tools

import org.apache.spark.sql.functions._
import graft.api.GraftSession
import graft.stress.StressFixture

/** Stage-by-stage decomposition of the q52 spanning path at stress
  * scale 10 — which of (key fanout, candidate join, distinct,
  * levenshtein verify, exact collapse) owns the wall time. */
object ProfileFuzzyStages {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-fuzzy-stages")
    spark.range(100000L).selectExpr("sum(id)").collect()
    val fp = StressFixture.FuzzyPlan(2000000L)
    val fz = StressFixture.fuzzyStrings(spark, fp)
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val v = f
      println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  value=$v")
    }
    t("fixture count")(fz.count())
    val base = fz.select(col("fid").as("__fid"), col("fstr").as("__fstr"))
      .filter(col("__fstr").isNotNull)
    val groups = base.groupBy("__fstr")
      .agg(min(col("__fid")).as("__rid"), count(lit(1)).as("__cnt"))
    t("exact collapse (groupBy)")(groups.count())
    val reps = groups.select(col("__rid"), col("__fstr")).localCheckpoint(true)
    t("members join")(base.join(groups.select(col("__fstr"), col("__rid")), "__fstr").count())
    // reproduce the internal UDFs via the public API at tiny k to
    // isolate: run selfPairs stages by hand is private — instead time
    // the whole spanning call for reference
    t("selfPairs spanning e2e")(
      graft.operators.FuzzyJoin.selfPairs(fz, "fid", "fstr", 1, spanning = true).count())
    spark.stop()
  }
}
