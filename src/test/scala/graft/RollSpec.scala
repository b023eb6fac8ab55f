package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Roll

class RollSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark
  import spark.implicits._

  test("timeStats hand case: trailing range frame, exact sums, peers in-frame") {
    val obs = Seq(("a", 0L, 1.10), ("a", 50L, 2.20), ("a", 100L, 4.40),
      ("a", 100L, 0.30), ("a", 500L, 8.00)).toDF("k", "t", "v")
    val got = Roll.timeStats(obs, Seq("k"), "t", "v", windowSeconds = 101L)
      .orderBy(col("t").asc, col("v").asc)
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    // window [t-100, t]; the two t=100 rows are RANGE peers: both see
    // all four early rows (frame [0,100])
    assert(got.toSeq == Seq(
      (0L, 1.10, 1L, 1.10, 1.10, 1.10, 1.10),
      (50L, 2.20, 2L, 3.30, 1.65, 1.10, 2.20),
      (100L, 0.30, 4L, 8.00, 2.00, 0.30, 4.40),
      (100L, 4.40, 4L, 8.00, 2.00, 0.30, 4.40),
      (500L, 8.00, 1L, 8.00, 8.00, 8.00, 8.00)))
  }

  test("timeStats: null ts/value rows excluded; null key is its own series") {
    val obs = Seq((Some("a"), Some(0L), Some(1.0)),
      (Some("a"), None, Some(2.0)), (Some("a"), Some(10L), None),
      (None, Some(0L), Some(5.0)), (None, Some(1L), Some(7.0)))
      .toDF("k", "t", "v")
    val got = Roll.timeStats(obs, Seq("k"), "t", "v", windowSeconds = 100L)
    assert(got.count() == 3L)
    val nulls = got.filter(col("k").isNull).orderBy(col("t"))
      .select("roll_sum").as[Double].collect().toSeq
    assert(nulls == Seq(5.0, 12.0))
  }

  test("rowStats hand case: trailing 2-row frame over (ts, value) total order") {
    val obs = Seq(("a", 0L, 3.0), ("a", 1L, 1.0), ("a", 1L, 2.0), ("a", 2L, 5.0))
      .toDF("k", "t", "v")
    val got = Roll.rowStats(obs, Seq("k"), "t", "v", nRows = 2)
      .orderBy(col("t").asc, col("v").asc)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    // order: (0,3.0), (1,1.0), (1,2.0), (2,5.0) — value breaks the t=1 tie
    assert(got.toSeq == Seq(
      (0L, 3.0, 1L, 3.0), (1L, 1.0, 2L, 4.0), (1L, 2.0, 2L, 3.0), (2L, 5.0, 2L, 7.0)))
  }

  test("one WindowExec: the five aggregates share a single frame") {
    val obs = Seq(("a", 0L, 1.0), ("a", 5L, 2.0)).toDF("k", "t", "v")
    val plan = Roll.timeStats(obs, Seq("k"), "t", "v", windowSeconds = 10L)
      .queryExecution.executedPlan.toString
    assert(plan.split("Window ").length == 2, s"expected exactly one Window node:\n$plan")
  }

  test("refusals fail fast") {
    val obs = Seq(("a", 0L, 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] { Roll.timeStats(obs, Seq("k"), "t", "v", 0L) }
    intercept[IllegalArgumentException] { Roll.timeStats(obs, Seq("k"), "nope", "v", 1L) }
    intercept[IllegalArgumentException] { Roll.rowStats(obs, Seq("k"), "t", "v", 0) }
  }
}
