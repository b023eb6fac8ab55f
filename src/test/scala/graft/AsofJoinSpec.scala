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
    // a RESERVED target would be swept by the native path's internal
    // drop("__t") — refused on both paths
    val e4 = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(left, right, "k", "t", "t", Seq("v" -> "__t"))
    }
    assert(e4.getMessage.contains("reserved"))
    // fractional time columns truncate toward zero (future matches)
    val e5 = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(left.withColumn("t", col("t").cast("double")),
        right, "k", "t", "t", Seq("v" -> "vv"))
    }
    assert(e5.getMessage.contains("non-integral"))
    // mismatched key types silently break the native exec's
    // co-partitioning — refused there, coerced by the composed twin
    val e6 = intercept[IllegalArgumentException] {
      AsofJoin.asofBackwardNative(left.withColumn("k", col("k").cast("int")),
        right, "k", "t", "t", Seq("v" -> "vv"))
    }
    assert(e6.getMessage.contains("hash to different partitions"))
  }

  test("native exec: null left time never matches a right row at Long.MinValue") {
    // timeOf maps a null time to Long.MinValue internally; without the
    // explicit null guard a right row at literally MinValue would
    // match a null-time left row, diverging from the composed twin
    // (which sorts the null BEFORE MinValue — NullsFirst)
    val left = Seq((1L, Some(100L), None: Option[Long]),
      (2L, Some(100L), Some(0L))).toDF("id", "k", "t")
    val right = Seq((100L, Long.MinValue, "sentinel")).toDF("k", "t", "v")
    val composed = AsofJoin.asofBackward(left, right, "k", "t", "t",
      Seq("v" -> "last_v")).orderBy("id").collect().map(_.toSeq).toSeq
    val native = AsofJoin.asofBackwardNative(left, right, "k", "t", "t",
      Seq("v" -> "last_v")).orderBy("id").collect().map(_.toSeq).toSeq
    assert(composed == native, s"composed $composed vs native $native")
    assert(composed(0)(3) == null, "null-time left row must match nothing")
    assert(composed(1)(3) == "sentinel", "real-time left row matches the MinValue row")
  }

  test("native exec matches the composed twin on edge cases (ties, nulls, misses)") {
    val left = Seq(
      (1L, Some(100L), Some(50L)),
      (2L, Some(100L), Some(150L)),  // tie with a right row
      (3L, Some(100L), Some(250L)),
      (4L, Some(200L), Some(10L)),   // right rows only in the future
      (5L, Some(300L), Some(70L)),   // key absent on the right
      (6L, None,       Some(90L)),   // null key: never matches (DuckDB ASOF)
      (7L, Some(100L), None),        // null time: never matches (DuckDB ASOF)
      (8L, Some(400L), Some(60L))    // matches a right row whose VALUE is null
    ).toDF("id", "k", "t")
    val right = Seq(
      (Some(100L), Some(40L),  Some("a")),
      (Some(100L), Some(150L), Some("b")),
      (Some(100L), Some(200L), Some("c")),
      (Some(200L), Some(999L), Some("z")),
      (Some(100L), None,       Some("n")),  // null time: excluded from matching
      (None,       Some(80L),  Some("nk")), // null key: excluded from matching
      (Some(400L), Some(20L),  Some("x")),
      (Some(400L), Some(50L),  None)        // later matched row carries NULL —
                                            // row semantics must NOT resurrect "x"
    ).toDF("k", "t", "v")
    val composed = AsofJoin.asofBackward(left, right, "k", "t", "t",
      Seq("v" -> "last_v")).orderBy("id")
    val native = AsofJoin.asofBackwardNative(left, right, "k", "t", "t",
      Seq("v" -> "last_v")).orderBy("id")
    // same names/types; nullability may differ — the composed twin's
    // union degrades left columns to nullable, the native exec keeps
    // the left schema's exact flags
    assert(composed.schema.map(f => (f.name, f.dataType)) ==
      native.schema.map(f => (f.name, f.dataType)))
    val c = composed.collect().map(_.toSeq).toSeq
    val n = native.collect().map(_.toSeq).toSeq
    assert(c == n, s"composed:\n${c.mkString("\n")}\nnative:\n${n.mkString("\n")}")
    // spot-check the semantics themselves, not just twin agreement
    val byId = n.map(r => r.head -> r(3)).toMap
    assert(byId(2L) == "b")   // tie → prior-or-equal matches
    assert(byId(4L) == null)  // future-only right rows don't match
    // null keys and null times NEVER match — DuckDB ASOF's equality
    // join and time comparison are both null-rejecting, and this
    // module's contract is parity with it (an unfiltered null-time
    // right row would otherwise be carried into every left row that
    // precedes the first real-timestamped right row)
    assert(byId(6L) == null)
    assert(byId(7L) == null)
    assert(byId(8L) == null)  // matched row's null VALUE carries as null
  }

  test("native exec matches composed on the q27-shaped event workload") {
    val ev = graft.streaming.Streams.runningTotals(SparkT.table("events"))
      .select("event_id", "user_id", "ts_ms", "event_type")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_ms")
    val clicks = ev.filter(col("event_type") === "click").select("user_id", "ts_ms")
    val composed = AsofJoin.asofBackward(purchases, clicks,
      "user_id", "ts_ms", "ts_ms", Seq("ts_ms" -> "last_click_ms"))
    val native = AsofJoin.asofBackwardNative(purchases, clicks,
      "user_id", "ts_ms", "ts_ms", Seq("ts_ms" -> "last_click_ms"))
    assert(native.exceptAll(composed).count() == 0)
    assert(composed.exceptAll(native).count() == 0)
  }

  test("native plan: AsofJoinExec with sort-merge shape, no union/window") {
    val ev = graft.streaming.Streams.runningTotals(SparkT.table("events"))
      .select("event_id", "user_id", "ts_ms", "event_type")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_ms")
    val clicks = ev.filter(col("event_type") === "click").select("user_id", "ts_ms")
    val native = AsofJoin.asofBackwardNative(purchases, clicks,
      "user_id", "ts_ms", "ts_ms", Seq("ts_ms" -> "last_click_ms"))
    native.collect() // must execute through the custom exec
    val p = native.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), p.take(1200))
    assert(!p.contains("Window"), "native path must not fall back to the window twin")
    assert(!p.contains("Union"), "native path must not union the two sides")
  }
}
