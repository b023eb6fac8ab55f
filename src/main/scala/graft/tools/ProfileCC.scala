package graft.tools

import org.apache.spark.sql.functions._
import graft.api.GraftSession
import graft.dedup.Dedup

/** Ad-hoc profiler for dd6 (pairs + connected components) — dev tool. */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-profile-cc")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val padded = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000L).as("doc_id"),
        concat(col("text"), lit(" graft dedup pad tail")).as("text"))
    val all = docs.unionByName(padded)
    all.count() // warm

    val pairs = time("ngramJaccardPairs build") {
      val p = Dedup.ngramJaccardPairs(all, "doc_id", "text",
        shingleN = 7, threshold = 0.5).persist()
      println(s"  pairs=${p.count()}")
      p
    }
    val cc = time("duplicateClusters")(
      Dedup.duplicateClusters(pairs))
    time("cc materialize")(println(s"  cc rows=${cc.count()}"))
    // full pipeline as the bench runs it (no pre-persisted pairs)
    pairs.unpersist()
    time("dd6 end-to-end") {
      val r = Dedup.duplicateClusters(
        Dedup.ngramJaccardPairs(all, "doc_id", "text",
          shingleN = 7, threshold = 0.5))
        .orderBy(col("id").asc)
      println(s"  rows=${r.count()}")
    }
    spark.stop()
  }
}
