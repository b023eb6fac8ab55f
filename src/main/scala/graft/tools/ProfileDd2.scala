package graft.tools

import org.apache.spark.sql.functions._
import graft.api.GraftSession
import graft.functions.hashfns

/** Ad-hoc stage profiler for the dd2 MinHash+LSH pipeline (dev tool):
  * isolates signature kernel, banding, candidate join, estimate
  * prefilter, and exact verification costs at the bench SF. */
object ProfileDd2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-profile-dd2")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val near = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000L).as("doc_id"),
        concat(col("text"), lit(" graft dedup pad tail")).as("text"))
    val docs = d.unionByName(near)
    docs.count() // warm

    val k = 128; val bands = 32; val seed = 42L
    def sigCol(kk: Int) = graft.expressions.GraftFunctions
      .graft_minhash(hashfns.shingleHashes(col("text"), 3), kk, seed)
    time("shingleHashes only")(docs.select(size(hashfns.shingleHashes(col("text"), 3)))
      .agg(count(lit(1))).collect()(0))
    time("sig k=128")(docs.select(sigCol(128).as("s")).agg(count(lit(1))).collect()(0))
    time("sig k=128 (rep)")(docs.select(sigCol(128).as("s")).agg(count(lit(1))).collect()(0))
    time("sig k=64")(docs.select(sigCol(64).as("s")).agg(count(lit(1))).collect()(0))
    val sig = docs.select(col("doc_id").as("id"), sigCol(k).as("sig"))
    val exploded = sig.select(col("id"),
      explode(hashfns.lshBandKeys(col("sig"), bands, k / bands)).as("bk"))
    time("explode band keys")(exploded.count())
    val w = org.apache.spark.sql.expressions.Window.partitionBy("bk").orderBy(col("id").asc)
    val capped = exploded.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 1000).drop("__rn")
    val a = capped.alias("a"); val b = capped.alias("b")
    val cand = a.join(b, col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    time("candidates")(cand.count())
    val est = cand
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est", graft.expressions.GraftFunctions
        .graft_minhash_agreement(col("sig_a"), col("sig_b")))
      .filter(col("est") >= 0.35)
      .select("id_a", "id_b")
    time("estimate prefilter")(est.count())
    val shingled = docs.select(col("doc_id").as("id"),
      hashfns.distinctWordShingles(col("text"), 3).as("sh"))
    val verified = est
      .join(shingled.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(shingled.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard", hashfns.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.5)
    time("exact verify")(verified.count())
    time("dd2 e2e")(graft.dedup.Dedup.minHashLshPairs(docs, "doc_id", "text",
      shingleN = 3, k = 128, bands = 32, threshold = 0.5).count())
    time("dd2 e2e k=64 b=16")(graft.dedup.Dedup.minHashLshPairs(docs, "doc_id", "text",
      shingleN = 3, k = 64, bands = 16, threshold = 0.5).count())
    spark.stop()
  }
}
