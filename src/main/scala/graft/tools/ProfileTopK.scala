package graft.tools

import org.apache.spark.sql.functions._
import graft.api.{GraftFrame, GraftSession}

/** Isolates q34_topn_agg's cost structure vs its window twin q30
  * (dev tool): same join input, then (a) window rank, (b) BoundedTopK
  * aggregate, (c) BoundedTopK over the pre-joined cached input (no
  * join), (d) a plain groupBy max (hash-agg floor). Run with
  * SPARK_GRAFT_SF_DIR to pick the scale.
  */
object ProfileTopK {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-profile-topk")
    import spark.implicits._
    def time(name: String)(f: => Any): Unit = {
      // median of 3 like the bench
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[topk] $name%-34s ${ts(1)}%8.3f s")
    }
    def g(name: String) = GraftFrame(spark.read.parquet(s"$sfDir/$name.parquet"))
    def joined = g("orders")
      .join(g("customer"), Seq("o_custkey" -> "c_custkey"), "inner")
      .select("c_mktsegment", "o_orderkey", "o_totalprice")
    joined.df.write.format("noop").mode("overwrite").save() // warm

    time("join only (noop)")(
      joined.df.write.format("noop").mode("overwrite").save())
    time("q30 window (join+rank)")(
      joined.groupBy("c_mktsegment")
        .sliceMax(col("o_totalprice"), 3, col("o_orderkey"))
        .arrange(asc("c_mktsegment"), desc("o_totalprice"), asc("o_orderkey"))
        .df.write.format("noop").mode("overwrite").save())
    time("q34 agg (join+boundedTopK)")(
      joined.groupBy("c_mktsegment")
        .sliceMaxAgg(col("o_totalprice"), 3, col("o_orderkey"))
        .arrange(asc("c_mktsegment"), desc("o_totalprice"), asc("o_orderkey"))
        .df.write.format("noop").mode("overwrite").save())

    val cached = joined.df.cache()
    cached.count()
    time("cached: window")(
      GraftFrame(cached).groupBy("c_mktsegment")
        .sliceMax(col("o_totalprice"), 3, col("o_orderkey"))
        .df.write.format("noop").mode("overwrite").save())
    time("cached: boundedTopK")(
      GraftFrame(cached).groupBy("c_mktsegment")
        .sliceMaxAgg(col("o_totalprice"), 3, col("o_orderkey"))
        .df.write.format("noop").mode("overwrite").save())
    time("cached: plain hash agg max")(
      cached.groupBy("c_mktsegment").agg(max("o_totalprice"))
        .write.format("noop").mode("overwrite").save())

    // synthetic skew: one giant group — where the bounded-agg shuffle
    // contract should pay off vs window-sorting the whole partition
    val big = spark.range(20000000L)
      .select((col("id") % 4).cast("string").as("grp"),
        col("id").as("k"),
        (rand(7) * 1e6).as("v")).cache()
    big.count()
    time("skew 20M/4grp: window")(
      GraftFrame(big).groupBy("grp")
        .sliceMax(col("v"), 3, col("k"))
        .df.write.format("noop").mode("overwrite").save())
    time("skew 20M/4grp: boundedTopK")(
      GraftFrame(big).groupBy("grp")
        .sliceMaxAgg(col("v"), 3, col("k"))
        .df.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
