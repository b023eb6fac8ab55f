package graft.tools

import org.apache.spark.sql.functions._
import graft.api.GraftSession
import graft.dedup.Dedup

/** Ad-hoc stage profiler for the dd8 LSH near-dedup path (dev tool). */
object ProfileDd8 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-profile-dd8")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs = d.unionByName(
      d.select((col("doc_id") + 10000L).as("doc_id"), col("text")))
    docs.count() // warm

    def pairs(k: Int, bands: Int) =
      Dedup.minHashLshPairs(docs, "doc_id", "text",
        shingleN = 7, k = k, bands = bands, threshold = 1.0,
        spanning = true)

    time("pairs k=128 b=32")(pairs(128, 32).count())
    time("pairs k=32 b=8")(pairs(32, 8).count())
    time("pairs k=32 b=8 (rep)")(pairs(32, 8).count())
    time("clusters")(Dedup.duplicateClusters(pairs(32, 8)).count())
    time("dedupNear e2e")(Dedup.dedupNear(docs, "doc_id", pairs(32, 8)).count())
    time("dedupNear e2e (rep)")(Dedup.dedupNear(docs, "doc_id", pairs(32, 8)).count())
    spark.stop()
  }
}
