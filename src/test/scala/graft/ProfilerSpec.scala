package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiler

/** One-pass column profiling: exact ground truth on a null-bearing
  * heterogeneous fixture, the approximate-distinct scale mode, and
  * the argument contracts. */
class ProfilerSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("a"), Some(1.5)),
    (2L, Some("b"), None),
    (3L, None, Some(2.5)),
    (4L, Some("a"), Some(1.5)),
    (5L, None, None))
    .toDF("id", "s", "v")

  test("columnStats: exact counts, null splits, ranges; caller column order") {
    val got = Profiler.columnStats(fixture, Seq("v", "s", "id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5), r.getString(6)))
    assert(got.map(_._1).toSeq == Seq("v", "s", "id"), "caller order lost")
    val byName = got.map(t => t._1 -> t).toMap
    assert(byName("id") == ("id", 5L, 5L, 0L, 5L, "1", "5"))
    assert(byName("s") == ("s", 5L, 3L, 2L, 2L, "a", "b"))
    assert(byName("v") == ("v", 5L, 3L, 2L, 2L, "1.5", "2.5"))
  }

  test("columnStats: one aggregate pass (single scan in the plan)") {
    val plan = Profiler.columnStats(fixture, Seq("id", "s"),
      approxDistinct = true).queryExecution.executedPlan.toString
    // approx mode must NOT plan the Expand replication the exact
    // multi-distinct needs — the whole profile is one scan-side agg
    assert(!plan.contains("Expand"), plan.take(800))
  }

  test("columnStats: approximate distinct stays within HLL tolerance") {
    val wide = (1L to 2000L).toDF("id")
    val exact = Profiler.columnStats(wide, Seq("id"))
      .collect()(0).getLong(4)
    val approx = Profiler.columnStats(wide, Seq("id"), approxDistinct = true)
      .collect()(0).getLong(4)
    assert(exact == 2000L)
    assert(math.abs(approx - 2000L) <= 200L, s"approx=$approx")
  }

  test("columnStats: refusals — empty cols, unknown column") {
    intercept[IllegalArgumentException] {
      Profiler.columnStats(fixture, Seq.empty)
    }
    val e = intercept[IllegalArgumentException] {
      Profiler.columnStats(fixture, Seq("id", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
