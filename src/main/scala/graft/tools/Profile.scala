package graft.tools

import org.apache.spark.sql.functions._
import graft.api.GraftSession
import graft.functions.hashfns

/** Ad-hoc stage profiler for the dedup hot path (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-profile")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.count() // warm

    time("normalize+split")(docs.select(size(split(lower(col("text")), " ")).as("n"))
      .agg(sum("n")).collect()(0).getLong(0))
    // composed Column-chain shingling (the pre-kernel implementation,
    // kept inline as the comparison baseline for the kernel rows)
    def composedShingles(text: org.apache.spark.sql.Column, n: Int) = {
      val words = split(graft.functions.textfns.normalizeText(text), " ")
      val k = size(words) - (n - 1)
      when(k <= 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), k),
          i => concat_ws(" ", slice(words, i, lit(n)))))
    }
    time("composedShingles7")(docs.select(size(composedShingles(col("text"), 7)).as("n"))
      .agg(sum("n")).collect()(0).getLong(0))
    time("kernelShingles7")(docs.select(size(hashfns.wordShingles(col("text"), 7)).as("n"))
      .agg(sum("n")).collect()(0).getLong(0))
    time("kernelShingles7+distinct")(docs.select(
      size(hashfns.distinctWordShingles(col("text"), 7)).as("n"))
      .agg(sum("n")).collect()(0).getLong(0))
    time("explode toks")(docs.select(col("doc_id"),
      explode(hashfns.distinctWordShingles(col("text"), 7)).as("sh")).count())
    val toks = docs.select(col("doc_id").as("id"),
      explode(hashfns.distinctWordShingles(col("text"), 7)).as("sh"))
    time("self-join pairs") {
      val a = toks.alias("a"); val b = toks.alias("b")
      a.join(b, col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
        .groupBy(col("a.id"), col("b.id")).count().count()
    }
    time("shingleHashes3")(docs.select(size(hashfns.shingleHashes(col("text"), 3)).as("n"))
      .agg(sum("n")).collect()(0).getLong(0))
    time("minHashSig k=128")(docs.select(
      size(hashfns.minHashSig(col("text"), 3, 128, 42L)).as("n"))
      .agg(sum("n")).collect()(0).getLong(0))
    time("simHashSig")(docs.select(hashfns.simHashSig(col("text"), 3).as("h"))
      .agg(sum("h")).collect()(0).getLong(0))
    time("srp+hamming noop")(spark.range(10).count())
    spark.stop()
  }
}
