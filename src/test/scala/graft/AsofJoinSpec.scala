package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark
  import spark.implicits._

  test("asofBackward attaches most recent prior-or-equal right row per key") {
    val left = Seq(
      (1L, 100L, 50L),  // id, key, t
      (2L, 100L, 150L),
      (3L, 100L, 250L),
      (4L, 200L, 10L)    // key with no right rows at/before t
    ).toDF("id", "k", "t")
    val right = Seq(
      (100L, 40L, "a"),
      (100L, 150L, "b"),  // tie: t equal → matches (prior-or-equal)
      (100L, 200L, "c"),
      (200L, 999L, "z")   // only after the left row
    ).toDF("k", "t", "v")

    val out = AsofJoin.asofBackward(left, right, "k", "t", "t",
        Seq("v" -> "last_v"))
      .orderBy("id").collect()
    assert(out.map(r => Option(r.getString(3))).toSeq ==
      Seq(Some("a"), Some("b"), Some("c"), None))
  }

  test("asofBackward keeps every left row (left-join semantics)") {
    val ev = SparkT.table("events")
    val ms = graft.streaming.Streams.runningTotals(ev)
      .select("event_id", "user_id", "ts_ms", "event_type")
    val purchases = ms.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_ms")
    val clicks = ms.filter(col("event_type") === "click").select("user_id", "ts_ms")
    val joined = AsofJoin.asofBackward(purchases, clicks,
      "user_id", "ts_ms", "ts_ms", Seq("ts_ms" -> "last_click_ms"))
    assert(joined.count() == purchases.count())
    // carried click time never exceeds the purchase time
    assert(joined.filter(col("last_click_ms") > col("ts_ms")).count() == 0)
  }

  test("asofBackward rejects colliding or reserved column names") {
    val left = Seq((1L, 10L, 20L)).toDF("id", "k", "t")
    val right = Seq((10L, 5L, "a")).toDF("k", "t", "v")
    // target name collides with a left column
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(left, right, "k", "t", "t", Seq("v" -> "id"))
    }
    assert(e1.getMessage.contains("collide"))
    // left column uses a reserved internal name
    val badLeft = left.withColumnRenamed("id", "__side")
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(badLeft, right, "k", "t", "t", Seq("v" -> "vv"))
    }
    assert(e2.getMessage.contains("reserved"))
    // duplicate targets
    val e3 = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(left, right, "k", "t", "t",
        Seq("v" -> "vv", "t" -> "vv"))
    }
    assert(e3.getMessage.contains("duplicate"))
  }
}
