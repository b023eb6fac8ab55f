package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Resample

class ResampleSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark
  import spark.implicits._

  test("hand case: bucket floor, latest-per-bucket, forward fill, observed flag") {
    val obs = Seq(("a", 0L, 1.0), ("a", 2050L, 2.0), ("a", 2080L, 3.0))
      .toDF("k", "t", "v")
    val got = Resample.timeGrid(obs, Seq("k"), "t", "v", stepSeconds = 1000L)
      .orderBy("grid_ts").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (0L, 1.0, true),     // observed
      (1000L, 1.0, false), // carried forward
      (2000L, 3.0, true))) // latest in bucket wins (ts 2080 over 2050)
  }

  test("same-ts ties take the larger value; null ts/value rows excluded") {
    val obs = Seq(
      (Some("a"), Some(10L), Some(5.0)), (Some("a"), Some(10L), Some(7.0)),
      (Some("a"), None, Some(9.0)), (Some("a"), Some(20L), None))
      .toDF("k", "t", "v")
    val got = Resample.timeGrid(obs, Seq("k"), "t", "v", stepSeconds = 100L)
      .collect()
    assert(got.length == 1 && got(0).getDouble(2) == 7.0)
  }

  test("null key rows form their own series") {
    val obs = Seq(
      (Some("a"), 0L, 1.0), (Some("a"), 150L, 2.0),
      (None, 0L, 9.0), (None, 250L, 8.0))
      .toDF("k", "t", "v")
    val got = Resample.timeGrid(obs, Seq("k"), "t", "v", stepSeconds = 100L)
    assert(got.filter(col("k").isNull).count() == 3L) // grid 0,100,200
    assert(got.filter(col("k") === "a").count() == 2L)
  }

  test("giant-span guard raises; refusals fail fast") {
    val obs = Seq(("a", 0L, 1.0), ("a", 10000000L, 2.0)).toDF("k", "t", "v")
    val e = intercept[Exception] {
      Resample.timeGrid(obs, Seq("k"), "t", "v", stepSeconds = 1L,
        maxCellsPerKey = 1000L).collect()
    }
    assert(e.getMessage != null || e.getCause != null)
    intercept[IllegalArgumentException] {
      Resample.timeGrid(obs, Seq("k"), "t", "v", stepSeconds = 0L)
    }
    intercept[IllegalArgumentException] {
      Resample.timeGrid(obs, Seq("k"), "nope", "v", stepSeconds = 1L)
    }
  }
}
