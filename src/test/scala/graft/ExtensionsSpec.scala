package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.GraftFunctions._
import graft.operators.RangeJoin

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark
  import spark.implicits._

  test("optimizer rule folds hamming self-comparison out of the plan") {
    val d = Seq(1L, 2L, -7L).toDF("x")
    val q = d.select(graft_hamming64(col("x"), col("x")).as("h"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("graft_hamming64"),
      q.queryExecution.optimizedPlan.toString)
    assert(q.collect().map(_.getInt(0)).toSeq == Seq(0, 0, 0))
  }

  test("rule preserves null semantics for nullable inputs") {
    val d = Seq(Some(5L), None).toDF("x")
    val r = q2(d).collect()
    assert(r(0).getInt(0) == 0)
    assert(r(1).isNullAt(0))
  }
  private def q2(d: org.apache.spark.sql.DataFrame) =
    d.select(graft_hamming64(col("x"), col("x")).as("h"))

  test("rule does NOT fold distinct columns") {
    val d = Seq((1L, 3L)).toDF("a", "b")
    val q = d.select(graft_hamming64(col("a"), col("b")).as("h"))
    assert(q.collect()(0).getInt(0) == 1)
  }

  test("bucketed range join equals the naive theta join") {
    val points = Seq((1L, 3.7), (2L, 10.0), (3L, 55.5)).toDF("id", "v")
    val iv = Seq((100L, 3.0, 4.0), (101L, 9.5, 10.0), (102L, 0.0, 100.0))
      .toDF("ivid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, iv, "v", "lo", "hi", 2.5)
      .select("id", "ivid")
    val naive = points.join(iv, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("id", "ivid")
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
  }

  test("range join plans as a hash equi-join on the bucket, not BNL") {
    val points = SparkT.table("events").selectExpr("event_id", "value")
    val iv = SparkT.table("part").limit(50)
      .selectExpr("p_partkey", "CAST(p_size AS DOUBLE) AS lo",
        "CAST(p_size AS DOUBLE) + 2.5 AS hi")
    val q = RangeJoin.pointInInterval(points, iv, "value", "lo", "hi", 2.5)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(800))
  }
}
