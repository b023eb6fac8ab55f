package graft.tools

import org.apache.spark.sql.functions._
import graft.api.GraftSession
import graft.dedup.Dedup
import graft.stress.StressFixture
import graft.stress.StressFixture.StressPlan

/** One-off profile of the dd13 semantic-dedup stress path at both
  * scales (the r14 lead()-window rewrite's before/after harness). */
object ProfileDd13 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-dd13")
    spark.range(100000L).selectExpr("sum(id)").collect()
    val dir = sys.env.getOrElse("GRAFT_STRESS_DIR", "/tmp/graft-stress")
    Seq(1, 10).foreach { scale =>
      val p = StressPlan(500000L * scale)
      val emb = spark.read.parquet(s"$dir/s$scale/embeddings.parquet")
      val blob = StressFixture.denseBlob(spark, p)
      def dd13 = Dedup.semanticDupPairs(emb.unionByName(blob),
        "vec_id", "embedding", nCells = 64, threshold = 0.95, windowSize = 6)
      var best = Double.MaxValue; var v = 0L
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        v = dd13.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      val expect = p.nTwins + 6 * p.blobSize - 21
      println(f"[dd13] scale $scale: $best%.2f s  value=$v expect=$expect ${if (v == expect) "ok" else "FAIL"}")
    }
    spark.stop()
  }
}
