package graft.tools

import graft.api.GraftSession
import graft.operators.FuzzyJoin
import graft.stress.StressFixture

/** One-off profile of the q52/q54 stress paths at both scales (the
  * r14 hashed-segment-key rewrite's before/after harness). */
object ProfileFuzzy {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-fuzzy")
    spark.range(100000L).selectExpr("sum(id)").collect()
    Seq(1, 10).foreach { scale =>
      val fp = StressFixture.FuzzyPlan(200000L * scale)
      val fz = StressFixture.fuzzyStrings(spark, fp).localCheckpoint(true)
      def timed(label: String, expect: Long)(f: => Long): Unit = {
        var best = Double.MaxValue; var v = 0L
        (1 to 3).foreach { _ =>
          val t0 = System.nanoTime()
          v = f
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        println(f"[fuzzy] scale $scale $label: $best%.2f s value=$v ${if (v == expect) "ok" else "FAIL expect " + expect}")
      }
      timed("spanning", fp.spanningPairs)(
        FuzzyJoin.selfPairs(fz, "fid", "fstr", 1, spanning = true).count())
      timed("dedup   ", fp.nClusters)(
        FuzzyJoin.fuzzyDedup(fz, "fid", "fstr", 1).count())
    }
    spark.stop()
  }
}
