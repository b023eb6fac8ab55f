package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.GraftFrame

class TopKAggSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark
  import spark.implicits._

  test("sliceMaxAgg matches the window-rank sliceMax exactly") {
    val joined = GraftFrame(SparkT.table("orders"))
      .join(GraftFrame(SparkT.table("customer")), Seq("o_custkey" -> "c_custkey"), "inner")
      .select("c_mktsegment", "o_orderkey", "o_totalprice")
    val viaWindow = joined.groupBy("c_mktsegment")
      .sliceMax(col("o_totalprice"), 3, col("o_orderkey")).df
    val viaAgg = joined.groupBy("c_mktsegment")
      .sliceMaxAgg(col("o_totalprice"), 3, col("o_orderkey")).df
    assert(viaAgg.count() == viaWindow.count())
    assert(viaAgg.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaAgg).count() == 0)
  }

  test("sliceMinAgg keeps the n smallest with deterministic ties") {
    val d = Seq((1, 5.0, 10L), (1, 5.0, 11L), (1, 4.0, 12L), (1, 6.0, 13L),
      (2, 1.0, 20L)).toDF("g", "v", "id")
    val got = GraftFrame(d).groupBy("g").sliceMinAgg(col("v"), 2, col("id")).df
      .orderBy("g", "v", "id").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 4.0, 12L), (1, 5.0, 10L), (2, 1.0, 20L)))
  }

  test("bounded_topk plans as a partial ObjectHashAggregate (map-side bound)") {
    val d = SparkT.table("orders")
    val q = GraftFrame(d).groupBy("o_custkey")
      .sliceMaxAgg(col("o_totalprice"), 2, col("o_orderkey")).df
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(1500))
    assert(plan.contains("partial_graft_bounded_topk"), plan.take(1500))
  }

  test("buffers survive serialization: many partitions, small groups") {
    val d = spark.range(0, 1000).select(
      (col("id") % 7).as("g"), col("id").cast("double").as("v"), col("id"))
      .repartition(16)
    val got = GraftFrame(d).groupBy("g").sliceMaxAgg(col("v"), 3, col("id")).df
    assert(got.count() == 21)
    // per group: the 3 largest v values
    val top = got.filter(col("g") === 0).orderBy(col("v").desc)
      .collect().map(_.getDouble(1)).toSeq
    assert(top == Seq(994.0, 987.0, 980.0))
  }

  test("null ordering keys lose to any non-null key") {
    val d = Seq((1, Some(2.0), 1L), (1, None, 2L), (1, Some(1.0), 3L))
      .toDF("g", "v", "id")
    val got = GraftFrame(d).groupBy("g").sliceMaxAgg(col("v"), 2, col("id")).df
      .collect().map(_.getLong(2)).sorted.toSeq
    assert(got == Seq(1L, 3L))
  }

  test("null primary loses to a real +Infinity primary (sliceMin parity)") {
    val d = Seq((1, Some(Double.PositiveInfinity), 5L), (1, Option.empty[Double], 1L))
      .toDF("g", "v", "id")
    val agg = GraftFrame(d).groupBy("g").sliceMinAgg(col("v"), 1, col("id")).df
      .collect().map(_.getLong(2)).toSeq
    val win = GraftFrame(d).groupBy("g").sliceMin(col("v"), 1, col("id")).df
      .collect().map(_.getLong(2)).toSeq
    assert(agg == Seq(5L) && win == Seq(5L))
  }

  test("NaN ranks first under sliceMaxAgg, matching the window twin") {
    val d = Seq((1, Double.NaN, 1L), (1, Double.PositiveInfinity, 2L),
      (1, 3.0, 3L)).toDF("g", "v", "id")
    val agg = GraftFrame(d).groupBy("g").sliceMaxAgg(col("v"), 2, col("id")).df
      .collect().map(_.getLong(2)).sorted.toSeq
    val win = GraftFrame(d).groupBy("g").sliceMax(col("v"), 2, col("id")).df
      .collect().map(_.getLong(2)).sorted.toSeq
    assert(agg == win && agg == Seq(1L, 2L))
  }

  test("a null TIEBREAK does not erase a non-null primary key") {
    // (v=100, id=null) must still win over (v=1, id=1) — the null only
    // affects its own sort level, like sliceMax's asc_nulls_last
    val d = Seq((1, 100.0, Option.empty[Long]), (1, 1.0, Some(1L)))
      .toDF("g", "v", "id")
    val got = GraftFrame(d).groupBy("g").sliceMaxAgg(col("v"), 1, col("id")).df
      .collect().map(_.getDouble(1)).toSeq
    assert(got == Seq(100.0))
  }

  test("sliceMaxAgg preserves group context for chained verbs") {
    val d = Seq((1, 5.0, 10L), (1, 4.0, 11L), (2, 9.0, 20L)).toDF("g", "v", "id")
    val out = GraftFrame(d).groupBy("g").sliceMaxAgg(col("v"), 1, col("id"))
      .summarise("n" -> count(lit(1)))
    // grouped summarise after the slice: one row per group, not one total
    assert(out.df.count() == 2)
  }
}
