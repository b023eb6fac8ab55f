package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Snapshot

class SnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "name", "price")

  test("merge applies upserts, deletes, and inserts; output columns = base columns") {
    val changes = Seq(
      (2L, "b2", 25.0, "upsert"),  // replace key 2
      (3L, null.asInstanceOf[String], 0.0, "delete"), // tombstone key 3
      (4L, "d", 40.0, "upsert")    // fresh key
    ).toDF("id", "name", "price", "op")
    val got = Snapshot.merge(base, changes, Seq("id")).orderBy("id")
    assert(got.columns.toSeq == Seq("id", "name", "price"))
    assert(got.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "a", 10.0), (2L, "b2", 25.0), (4L, "d", 40.0)))
  }

  test("latest-wins by version; delete beats upsert at the same version") {
    val changes = Seq(
      (1L, "old", 1.0, "upsert", 1L),
      (1L, "new", 2.0, "upsert", 7L),   // highest version wins
      (2L, "x", 0.0, "delete", 5L),
      (2L, "y", 9.0, "upsert", 5L),     // same version: delete wins
      (3L, "z", 3.0, "upsert", 1L),
      (3L, null.asInstanceOf[String], 0.0, "delete", 0L) // older delete loses
    ).toDF("id", "name", "price", "op", "v")
    val got = Snapshot.merge(base, changes, Seq("id"),
        versionCol = Some("v")).orderBy("id")
    assert(got.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "new", 2.0), (3L, "z", 3.0)))
  }

  test("unknown op raises at execution; missing columns fail fast at construction") {
    val bad = Seq((1L, "a", 1.0, "UPSERT")).toDF("id", "name", "price", "op")
    val e = intercept[Exception] {
      Snapshot.merge(base, bad, Seq("id")).collect()
    }
    assert(e.getMessage.contains("upsert") || e.getCause != null)
    intercept[IllegalArgumentException] {
      Snapshot.merge(base, base, Seq("id")) // no op column
    }
    intercept[IllegalArgumentException] {
      Snapshot.merge(base, bad, Seq("nope")) // key not in base
    }
    intercept[IllegalArgumentException] {
      Snapshot.merge(base, bad, Seq("id"), versionCol = Some("v")) // no version col
    }
  }

  test("empty batch is identity; deletes of absent keys no-op; empty base takes inserts") {
    val none = Seq.empty[(Long, String, Double, String)]
      .toDF("id", "name", "price", "op")
    assert(Snapshot.merge(base, none, Seq("id")).orderBy("id").collect().toSeq ==
      base.orderBy("id").collect().toSeq)
    val ghost = Seq((99L, null.asInstanceOf[String], 0.0, "delete"))
      .toDF("id", "name", "price", "op")
    assert(Snapshot.merge(base, ghost, Seq("id")).count() == 3L)
    val emptyBase = none.select("id", "name", "price")
    val ins = Seq((5L, "e", 5.0, "upsert")).toDF("id", "name", "price", "op")
    assert(Snapshot.merge(emptyBase, ins, Seq("id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((5L, "e", 5.0)))
  }

  test("diff: minimal batch, null-safe change detection, merge round-trip law") {
    val next = Seq(
      (1L, "a", 10.0),   // untouched → no diff row
      (2L, "b2", 25.0),  // changed → upsert
      (4L, "d", 40.0)    // new → upsert;  key 3 vanished → delete
    ).toDF("id", "name", "price")
    val d = Snapshot.diff(base, next, Seq("id")).orderBy("id")
    assert(d.collect().map(r =>
      (r.getLong(0), r.getString(3))).toSeq ==
      Seq((2L, "upsert"), (3L, "delete"), (4L, "upsert")))
    // the round-trip law: merge(base, diff(base, next)) == next
    val rt = Snapshot.merge(base, Snapshot.diff(base, next, Seq("id")), Seq("id"))
    assert(rt.orderBy("id").collect().toSeq == next.orderBy("id").collect().toSeq)
    // null payloads compare null-safely: a null staying null is NOT a
    // change; null keys pair up as their own key
    val bn = Seq((Some(1L), null.asInstanceOf[String], 1.0),
      (None, "nk", 2.0)).toDF("id", "name", "price")
    assert(Snapshot.diff(bn, bn, Seq("id")).isEmpty)
    val nn = Seq((Some(1L), null.asInstanceOf[String], 1.0),
      (None, "nk2", 2.0)).toDF("id", "name", "price")
    val dn = Snapshot.diff(bn, nn, Seq("id")).collect()
    assert(dn.length == 1 && dn(0).isNullAt(0) && dn(0).getString(3) == "upsert")
    // refusals
    intercept[IllegalArgumentException] {
      Snapshot.diff(base, base.drop("price"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Snapshot.diff(base.withColumn("op", lit("x")),
        base.withColumn("op", lit("x")), Seq("id"))
    }
  }

  test("q56 plan: a small changes batch broadcasts the anti-join") {
    val q = SparkEntry.queries("q56_merge_snapshot")(spark, SparkT.sfDir)
    // materialize so AQE finalizes join strategies from runtime stats
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "small-batch merge must broadcast the changed-key anti-join:\n" + p.take(1500))
  }
}
