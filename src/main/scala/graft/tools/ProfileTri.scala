package graft.tools

import org.apache.spark.sql.functions._
import graft.api.GraftSession

/** Stage profiler for the q64 triangle path (dev tool). */
object ProfileTri {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-profile-tri")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tri] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    o.count() // warm
    val edges = o.select((col("o_orderkey") % 1000).as("src"),
      (col("o_custkey") % 1000).as("dst"))
    val e0 = edges
      .select(col("src").cast("long").as("__a"), col("dst").cast("long").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull &&
        col("__a") =!= col("__b"))
      .select(least(col("__a"), col("__b")).as("u"),
        greatest(col("__a"), col("__b")).as("v"))
      .distinct().localCheckpoint(true)
    time("e0 count")(e0.count())
    val deg = e0.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg")).localCheckpoint(true)
    time("deg count")(deg.count())
    val withDeg = e0
      .join(deg.select(col("id").as("u"), col("deg").as("__du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("__dv")), "v")
    val uFirst = col("__du") < col("__dv") ||
      (col("__du") === col("__dv") && col("u") < col("v"))
    var oriented: org.apache.spark.sql.DataFrame = null
    time("oriented trunc")(
      { oriented = withDeg.select(
          when(uFirst, col("u")).otherwise(col("v")).as("s"),
          when(uFirst, col("v")).otherwise(col("u")).as("t"))
          .localCheckpoint(true); oriented.count() })
    val adj = broadcast(oriented.groupBy(col("s"))
      .agg(collect_list(col("t")).as("__ts")))
    val triPlan = oriented
      .join(adj.select(col("s"), col("__ts").as("__ta")), "s")
      .join(adj.select(col("s").as("t"), col("__ts").as("__tb")), "t")
      .select(col("s"), col("t"),
        array_intersect(col("__ta"), col("__tb")).as("__cs"))
      .filter(size(col("__cs")) > 0)
    time("tri n_triangles")(triPlan.agg(sum(size(col("__cs")))).collect()(0))
    var tri: org.apache.spark.sql.DataFrame = null
    time("tri trunc")({ tri = triPlan.localCheckpoint(true); tri.count() })
    val weighted = tri.select(explode(array(
        struct(col("s").as("id"), size(col("__cs")).cast("long").as("__c")),
        struct(col("t").as("id"), size(col("__cs")).cast("long").as("__c"))))
        .as("__x"))
      .select(col("__x.id").as("id"), col("__x.__c").as("__c"))
      .unionByName(tri.select(explode(col("__cs")).as("id"), lit(1L).as("__c")))
    time("corner counts")(weighted.groupBy("id").agg(sum(col("__c")).as("__t")).count())
    spark.stop()
  }
}
