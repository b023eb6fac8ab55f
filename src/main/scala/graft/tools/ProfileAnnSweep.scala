package graft.tools

import org.apache.spark.sql.functions._

import graft.api.GraftSession
import graft.similarity.Ann

/** Parameter sweep for the approximate ANN tiers against the exact
  * top-k reference — the measurement behind the ann6 floor choices
  * (round-10 verdict task: clear recall 0.5 on every tier at
  * documented cost).
  *
  * Run: sbt "runMain graft.tools.ProfileAnnSweep [sfDir]"
  */
object ProfileAnnSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(16, "graft-ann-sweep")
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val k = 10
    val qs = emb.filter(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(emb, qs, k = k, quantized = true)
      .select("query_id", "neighbor_id")
    exact.cache()
    val denom = exact.count().toDouble

    def recallOf(approx: org.apache.spark.sql.DataFrame): Double =
      exact.intersect(approx.select("query_id", "neighbor_id")).count() / denom

    println(f"[sweep] $dir denom=$denom%.0f")
    println("[sweep] --- LSH (nBits, tables, probes) ---")
    for ((nb, tb, pr) <- Seq((8, 4, 8), (8, 4, 9), (8, 6, 9), (8, 8, 9),
                             (7, 4, 8), (7, 6, 8), (7, 8, 8), (6, 6, 7), (6, 8, 7))) {
      val t0 = System.nanoTime()
      val r = recallOf(Ann.lshTopK(emb, qs, k = k, dim = 64,
        nBits = nb, tables = tb, probes = pr))
      println(f"[sweep] lsh nBits=$nb tables=$tb probes=$pr recall=$r%.3f  ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println("[sweep] --- IVF-PQ (nCells, nProbe, rerank) ---")
    for ((nc, np, rr) <- Seq((16, 4, 50), (16, 6, 50), (16, 6, 100), (16, 8, 100),
                             (16, 8, 250), (16, 12, 250), (16, 12, 500),
                             (16, 16, 500))) {
      val t0 = System.nanoTime()
      val r = recallOf(Ann.ivfPqTopK(emb, qs, k = k, nCells = nc, nProbe = np,
        m = 8, ksub = 16, rerank = rr))
      println(f"[sweep] ivfpq nCells=$nc nProbe=$np rerank=$rr recall=$r%.3f  ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println("[sweep] --- IVF (nCells, nProbe) / PQ (m, ksub, rerank) current ---")
    for ((nc, np) <- Seq((16, 4), (16, 6))) {
      val r = recallOf(Ann.ivfTopK(emb, qs, k = k, nCells = nc, nProbe = np))
      println(f"[sweep] ivf nCells=$nc nProbe=$np recall=$r%.3f")
    }
    // the ≥0.9 retrieval-grade frontier (r10 task #4): rerank 25–50·k
    // and larger codebooks — the rerank scan is broadcast-driven and
    // column-pruned, so the cost grows with the shortlist, not the
    // corpus
    for ((m, ks, rr) <- Seq((8, 16, 50), (8, 16, 100), (8, 16, 250),
                            (8, 16, 500), (8, 32, 250), (16, 16, 250))) {
      val t0 = System.nanoTime()
      val r = recallOf(Ann.pqTopK(emb, qs, k = k, m = m, ksub = ks, rerank = rr))
      println(f"[sweep] pq m=$m ksub=$ks rerank=$rr recall=$r%.3f  ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
