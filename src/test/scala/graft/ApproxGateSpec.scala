package graft

import org.scalatest.funsuite.AnyFunSuite

/** Error ceilings for the declared sketch-quality gate (q28b) — the
  * spec-pinned bounds behind the rows-only correctness entry, exactly
  * as AnnSpec pins the ann6 recall floors.
  *
  * Bounds: HLL++ standard error is ~1.04/sqrt(m); Spark's default
  * `approx_count_distinct` targets rsd=0.05 and the explicit variant
  * here targets 0.02 — we pin at the target (parts) and 2x target
  * (orders; small-cardinality groups wobble above one sigma).
  * percentile_approx at accuracy=100 bounds RANK error by 1/100; on
  * this price distribution that is ~1% relative VALUE error — pinned
  * at 3%. Measured at sf0.001: parts 2.5%, orders ≤1.2%, p99 ≤1.2%.
  */
class ApproxGateSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark

  test("declared sketch-error gate (q28b): relative errors under the pinned ceilings") {
    val rows = SparkEntry.queries("q28b_sketch_error")(spark, SparkT.sfDir)
      .collect()
    assert(rows.length == 3, "one row per returnflag group")
    rows.foreach { r =>
      val flag = r.getString(0)
      val parts = r.getDouble(1); val orders = r.getDouble(2)
      val p99 = r.getDouble(3)
      assert(parts <= 0.05, s"$flag: hll_parts_relerr $parts > 0.05 (default rsd)")
      assert(orders <= 0.04, s"$flag: hll_orders_relerr $orders > 0.04 (2x rsd 0.02)")
      assert(p99 <= 0.03, s"$flag: p99_relerr $p99 > 0.03")
    }
  }
}
