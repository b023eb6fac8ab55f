package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quantile

/** Bit-parity and plan-shape pins for the bounded-state exact grouped
  * quantile (the corpus-scale replacement for `percentile`'s
  * whole-group aggregation buffer). */
class QuantileSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark

  /** 3 groups x irregular sizes, non-dyadic values, one null, one
    * singleton group — positions p·(n−1) hit every interpolation case. */
  private def fixture = {
    import spark.implicits._
    val rows =
      (1 to 97).map(i => ("a", Some(math.sin(i) * 1000 + i * 0.37))) ++
      (1 to 40).map(i => ("b", Some(i * 7.77 - 150))) ++
      Seq(("b", Option.empty[Double]), ("c", Some(42.42)))
    rows.toDF("g", "v")
  }

  test("exactGrouped is bit-identical to the percentile built-in") {
    val ps = Seq("p01" -> 0.01, "p50" -> 0.5, "p99" -> 0.99, "p0" -> 0.0, "p100" -> 1.0)
    val got = Quantile.exactGrouped(fixture, Seq("g"), "v", ps)
      .orderBy("g").collect()
    val want = fixture.groupBy("g").agg(
        expr("percentile(v, 0.01)").as("p01"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.99)").as("p99"),
        expr("percentile(v, 0.0)").as("p0"),
        expr("percentile(v, 1.0)").as("p100"))
      .orderBy("g").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      (1 to 5).foreach { i =>
        // identical operation order => identical doubles, not merely close
        assert(g.getDouble(i) == w.getDouble(i),
          s"group ${g.getString(0)} col $i: ${g.getDouble(i)} != ${w.getDouble(i)}")
      }
    }
  }

  test("exactGrouped plan: histogram count + digest window, no row sort funnel") {
    val plan = Quantile.exactGrouped(fixture, Seq("g"), "v", Seq("p50" -> 0.5))
      .queryExecution.executedPlan.toString
    // two exchanges BY DESIGN: (group, value) for the parallel count,
    // then group-only carrying distinct digests into the window — a
    // one-exchange row-rank plan serializes each group's full row set
    // through a single sort task (3 groups ⇒ 3 tasks, the skew case)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
    assert(!plan.contains("percentile"), "must not fall back to the buffering aggregate")
    // rank + group-count must share ONE window pass (same spec, two
    // frames) — a second Window node means the count regressed to its
    // own whole-dataset pass
    val windows = "(?m)^\\s*[+:]?-?\\s*Window ".r.findAllIn(plan).size max
      "Window \\[".r.findAllIn(plan).size
    assert(windows == 1, s"expected 1 Window node, got $windows:\n$plan")
  }

  test("exactGrouped ignores nulls and keeps singleton groups") {
    val out = Quantile.exactGrouped(fixture, Seq("g"), "v", Seq("med" -> 0.5))
      .orderBy("g").collect()
    assert(out.length == 3)
    assert(out(2).getDouble(1) == 42.42) // singleton group c
  }
}
