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

  test("interval overlap join: exactly-once vs the naive relation, incl. touching endpoints") {
    import spark.implicits._
    val l = Seq((1L, 0L, 10L), (2L, 5L, 7L), (3L, 100L, 100L), (4L, 20L, 30L))
      .toDF("l_id", "l_lo", "l_hi")
    val r = Seq((10L, 10L, 12L),   // touches l1 at exactly 10 (closed: match)
                (11L, 6L, 6L),     // inside l1 and l2
                (12L, 31L, 40L),   // adjacent to l4 but disjoint
                (13L, 0L, 200L))   // spans everything
      .toDF("r_id", "r_lo", "r_hi")
    val got = RangeJoin.intervalOverlap(l, r, "l_lo", "l_hi", "r_lo", "r_hi",
        bucketWidth = 4.0)
      .select("l_id", "r_id")
    val naive = l.join(r, col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("l_id", "r_id")
    // exceptAll both ways: catches duplicate emissions, not just set drift
    assert(got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0)
    assert(got.count() == naive.count())
  }

  test("interval overlap join: equi-join plan, giant-interval guard, collision require") {
    import spark.implicits._
    val l = Seq((1L, 0L, 10L)).toDF("l_id", "l_lo", "l_hi")
    val r = Seq((2L, 5L, 2000000L)).toDF("r_id", "r_lo", "r_hi")
    val q = RangeJoin.intervalOverlap(l, r, "l_lo", "l_hi", "r_lo", "r_hi",
      bucketWidth = 1.0, maxCellsPerInterval = 100L)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(800))
    // the 2M-bucket interval must raise loudly, not explode silently
    val e = intercept[Exception] { q.collect() }
    assert(e.getMessage != null || e.getCause != null)
    // shared column names are a corrupted join waiting to happen
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(l, l, "l_lo", "l_hi", "l_lo", "l_hi", 1.0)
    }
  }

  test("mergeIntervals: islands fuse overlap+touch, gaps split; group isolation; guards") {
    import SparkT.spark.implicits._
    val iv = Seq(
      // group a: [1,5] [3,7] (overlap) [7,9] (touch) → island [1,9];
      // [12,14] isolated; [20,20] point
      ("a", 1L, 5L), ("a", 3L, 7L), ("a", 7L, 9L),
      ("a", 12L, 14L), ("a", 20L, 20L),
      // group b: same coordinates must not fuse with a's
      ("b", 4L, 6L),
      // null-endpoint rows are excluded
      ("a", 100L, 100L)).toDF("g", "lo", "hi")
      .unionByName(Seq(("a", Option.empty[Long], Option(5L)))
        .toDF("g", "lo", "hi"))
    val got = graft.operators.RangeJoin.mergeIntervals(iv, Seq("g"), "lo", "hi")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      ("a", 1L, 9L, 3L), ("a", 12L, 14L, 1L), ("a", 20L, 20L, 1L),
      ("a", 100L, 100L, 1L), ("b", 4L, 6L, 1L)))
    // an inverted interval raises, loudly
    val bad = Seq(("x", 5L, 3L)).toDF("g", "lo", "hi")
    val e = intercept[Exception] {
      graft.operators.RangeJoin.mergeIntervals(bad, Seq("g"), "lo", "hi")
        .collect()
    }
    assert(e.getMessage.contains("inverted"), e.getMessage.take(200))
    intercept[IllegalArgumentException] {
      graft.operators.RangeJoin.mergeIntervals(iv, Seq.empty, "lo", "hi")
    }
    intercept[IllegalArgumentException] {
      graft.operators.RangeJoin.mergeIntervals(iv, Seq("g"), "nope", "hi")
    }
  }
}
