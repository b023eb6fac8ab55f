package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{GraftFrame, GraftVerbError}
import graft.api.GraftFrame.{asc, desc}

/** dplyr-semantic fidelity of the verb layer (reference behaviors:
  * R/mutate.R sequential+in-place, R/arrange.R NA placement,
  * R/join.R na_matches="na", R/bind.R, R/summarise.R drop-groups). */
class GraftFrameSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark
  import spark.implicits._

  private def df3 = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
    .toDF("id", "name", "v")

  test("mutate is sequential and replaces in place") {
    val out = GraftFrame(df3)
      .mutate("v" -> (col("v") * 2), "w" -> (col("v") + 1))
      .df
    // replaced column keeps its position; new column appended
    assert(out.columns.toSeq == Seq("id", "name", "v", "w"))
    val r = out.orderBy("id").collect()
    assert(r(0).getDouble(2) == 20.0)  // v replaced
    assert(r(0).getDouble(3) == 21.0)  // w sees the NEW v (sequential)
  }

  test("arrangeStable: ties preserve original order (reference test-arrange.R)") {
    // mirror of the reference stability test: x has ties, order_marker
    // tracks the original row order
    val d = Seq((1, 1), (1, 2), (1, 3), (2, 4), (2, 5))
      .toDF("x", "order_marker")
      .repartition(3) // stability must hold across partitions too
    val markers = GraftFrame(d).arrangeStable(asc("x")).df
      .collect().map(_.getInt(1)).toSeq
    // within x=1 the original order 1,2,3 survives; within x=2, 4,5.
    // repartition permutes rows, so "original order" is the frame's
    // pre-sort order — recover it per tie-group and assert monotone
    val preSort = d.collect().map(r => (r.getInt(0), r.getInt(1)))
    val expected = Seq(1, 2).flatMap(x => preSort.filter(_._1 == x).map(_._2))
    assert(markers == expected, s"got $markers, want $expected")
  }

  test("arrangeStable on a file-ordered frame preserves file order on ties") {
    val d = SparkT.table("nation")
      .select((col("n_nationkey") % 2).cast("long").as("par"),
        col("n_nationkey").cast("long").as("k"))
    val fileOrder = d.collect().map(_.getLong(1)).toSeq
    val got = GraftFrame(d).arrangeStable(asc("par")).df
      .collect().map(_.getLong(1)).toSeq
    val want = fileOrder.filter(_ % 2 == 0) ++ fileOrder.filter(_ % 2 == 1)
    assert(got == want)
  }

  test("arrangeByGroup sorts within groups; plain arrange ignores groups") {
    // mirrors reference ".by_group = TRUE sorts within groups" and
    // ".by_group = FALSE ignores groups"
    val d = Seq(("b", 2), ("a", 1), ("b", 1), ("a", 2)).toDF("g", "x")
    val grouped = GraftFrame(d).groupBy("g")
    val byGroup = grouped.arrangeByGroup(asc("x")).df
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(byGroup == Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)))
    val global = grouped.arrange(asc("x")).df
      .collect().map(_.getInt(1)).toSeq
    assert(global == Seq(1, 1, 2, 2)) // sorted by x only, groups ignored
    // ungrouped frame: byGroup degenerates to plain arrange
    val ungrouped = GraftFrame(d).arrangeByGroup(asc("x")).df
      .collect().map(_.getInt(1)).toSeq
    assert(ungrouped == Seq(1, 1, 2, 2))
  }

  test("arrangeByGroup overlap: a group col named as a sort key keeps the user's direction") {
    // reference R/arrange.R: group cols prepend; a group col that is
    // ALSO a user key adopts that key's direction and the duplicate
    // user key is dropped (not sorted twice)
    val d = Seq(("b", 2), ("a", 1), ("b", 1), ("a", 2)).toDF("g", "x")
    val out = GraftFrame(d).groupBy("g")
      .arrangeByGroup(desc("g"), asc("x")).df
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(out == Seq(("b", 1), ("b", 2), ("a", 1), ("a", 2)))
  }

  test("arrange with no keys is identity (reference: arrange() no columns)") {
    val f = GraftFrame(df3)
    assert(f.arrange().eq(f))
  }

  test("arrange: nulls last ascending, nulls first descending") {
    val d = Seq(Some(2.0), None, Some(1.0)).toDF("x")
    val ascOrder = GraftFrame(d).arrange(asc("x")).df.collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(ascOrder.toSeq == Seq(1.0, 2.0, null))
    val descOrder = GraftFrame(d).arrange(desc("x")).df.collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(descOrder.toSeq == Seq(null, 2.0, 1.0))
  }

  test("joins match null keys (na_matches = na)") {
    val l = Seq((Some(1), "l1"), (None, "l2")).toDF("k", "lv")
    val r = Seq((Some(1), "r1"), (None, "r2")).toDF("k", "rv")
    val j = GraftFrame(l).innerJoin(GraftFrame(r), Seq("k"))
    assert(j.df.count() == 2) // null key matched null key
    val nullRow = j.df.filter(col("k").isNull).collect()
    assert(nullRow.length == 1 && nullRow(0).getString(1) == "l2"
      && nullRow(0).getString(2) == "r2")
  }

  test("full join coalesces key, keeps both sides") {
    val l = Seq((1, "a"), (2, "b")).toDF("k", "lv")
    val r = Seq((2, "x"), (3, "y")).toDF("k", "rv")
    val j = GraftFrame(l).fullJoin(GraftFrame(r), Seq("k"))
      .arrange(asc("k")).df.collect()
    assert(j.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("join suffixes duplicate non-key columns") {
    val l = Seq((1, "a")).toDF("k", "v")
    val r = Seq((1, "b")).toDF("k", "v")
    val j = GraftFrame(l).innerJoin(GraftFrame(r), Seq("k"))
    assert(j.names == Seq("k", "v_x", "v_y"))
  }

  test("bindRows fills missing columns with null") {
    val a = Seq((1, "a")).toDF("id", "name")
    val b = Seq(Tuple1(2)).toDF("id")
    val u = GraftFrame(a).bindRows(GraftFrame(b)).arrangeBy("id").df.collect()
    assert(u.length == 2 && u(1).isNullAt(1))
  }

  test("bindCols zips positionally") {
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq("a", "b", "c").toDF("y")
    val z = GraftFrame(a).bindCols(GraftFrame(b)).df
      .orderBy("x").collect()
    assert(z.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("bindCols disambiguates duplicate names") {
    val a = Seq(1).toDF("x")
    val b = Seq(2).toDF("x")
    assert(GraftFrame(a).bindCols(GraftFrame(b)).names == Seq("x", "x_rhs"))
  }

  test("bindCols fails on unequal row counts (dplyr errors, no silent truncation)") {
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq("a", "b").toDF("y")
    val e = intercept[Exception] {
      GraftFrame(a).bindCols(GraftFrame(b)).df.collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("unequal row counts")))
  }

  test("semi/anti joins match null keys, consistent with join() na_matches") {
    val l = Seq(Some(1), None, Some(2)).toDF("k")
    val rWithNull = Seq(Option.empty[Int], Some(1)).toDF("k")
    val rNoNull = Seq(Some(1)).toDF("k")
    // right has a null key → left's null row is "present"
    assert(GraftFrame(l).semiJoin(GraftFrame(rWithNull), Seq("k")).df.count() == 2)
    assert(GraftFrame(l).antiJoin(GraftFrame(rWithNull), Seq("k")).df.count() == 1)
    // right has no null key → left's null row is "absent"
    assert(GraftFrame(l).semiJoin(GraftFrame(rNoNull), Seq("k")).df.count() == 1)
    assert(GraftFrame(l).antiJoin(GraftFrame(rNoNull), Seq("k")).df.count() == 2)
  }

  test("summarise computes R sample statistics and drops groups") {
    val d = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0)).toDF("k", "v")
    val out = GraftFrame(d).groupBy("k")
      .summarise("sd" -> stddev_samp(col("v")), "vr" -> var_samp(col("v")),
        "n" -> count(lit(1)))
    assert(out.groupVars.isEmpty)
    val r = out.df.collect()(0)
    assert(math.abs(r.getAs[Double]("sd") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("vr") - 1.0) < 1e-12)
    assert(r.getAs[Long]("n") == 3L)
  }

  test("group_by accumulates like dplyr .add and select prunes groups") {
    val f = GraftFrame(df3).groupBy("id").groupBy("name")
    assert(f.groupVars == Seq("id", "name"))
    assert(f.select("name", "v").groupVars == Seq("name"))
    assert(f.ungroup.groupVars.isEmpty)
  }

  test("headN limits, distinct_ dedups, renameAll renames") {
    val d = Seq(1, 1, 2, 2, 3).toDF("x")
    assert(GraftFrame(d).distinct_().df.count() == 3)
    assert(GraftFrame(d).headN(2).df.count() == 2)
    assert(GraftFrame(d).renameAll(Seq("y")).names == Seq("y"))
  }

  test("semi and anti joins partition the left side") {
    val cust = GraftFrame(SparkT.table("customer"))
    val ords = GraftFrame(SparkT.table("orders"))
      .selectExpr2("c_custkey" -> col("o_custkey"))
    val s = cust.semiJoin(ords, Seq("c_custkey")).df.count()
    val a = cust.antiJoin(ords, Seq("c_custkey")).df.count()
    assert(s + a == cust.df.count())
    assert(s > 0)
  }

  test("mutateGrouped computes per-group aggregates joined to rows") {
    val d = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("g", "x")
    val out = GraftFrame(d).groupBy("g")
      .mutateGrouped("total" -> sum(col("x")), "share" -> (col("x") / sum(col("x"))))
      .df.orderBy("g", "x").collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("a", 4.0, 0.25), ("a", 4.0, 0.75), ("b", 10.0, 1.0)))
    // ungrouped: whole-frame aggregate
    val whole = GraftFrame(d).mutateGrouped("total" -> sum(col("x")))
      .df.select("total").distinct().collect()
    assert(whole.length == 1 && whole(0).getDouble(0) == 14.0)
  }

  test("mutateGrouped pairs evaluate sequentially (dplyr), both branches") {
    val d = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("g", "x")
    // ungrouped: pair 2's aggregate must see pair 1's new column AND
    // pair 1's replaced values
    val u = GraftFrame(d)
      .mutateGrouped("y" -> (col("x") * 2), "z" -> sum(col("y")))
      .df.select("z").distinct().collect()
    assert(u.length == 1 && u(0).getDouble(0) == 28.0)
    val r = GraftFrame(d)
      .mutateGrouped("x" -> negate(col("x")), "s" -> sum(col("x")))
      .df.select("s").distinct().collect()
    assert(r.length == 1 && r(0).getDouble(0) == -14.0)
    // grouped: same contract per group
    val g = GraftFrame(d).groupBy("g")
      .mutateGrouped("y" -> (col("x") * 2), "z" -> sum(col("y")))
      .df.filter(col("g") === "a").select("z").distinct().collect()
    assert(g.length == 1 && g(0).getDouble(0) == 8.0)
  }

  test("fillDown carries last non-null forward per group; dropNa/replaceNa") {
    val d = Seq(
      ("a", 1L, Some(10.0)), ("a", 2L, None), ("a", 3L, None),
      ("b", 1L, None), ("b", 2L, Some(5.0))
    ).toDF("g", "t", "v")
    val filled = GraftFrame(d).groupBy("g")
      .fillDown(Seq(col("t")), "v").df
      .orderBy("g", "t").collect().map(r => Option(r.get(2)).map(_.asInstanceOf[Double]))
    assert(filled.toSeq == Seq(Some(10.0), Some(10.0), Some(10.0), None, Some(5.0)))
    assert(GraftFrame(d).dropNa("v").df.count() == 2)
    val rep = GraftFrame(d).replaceNa(0.0, "v").df
      .filter(col("v") === 0.0).count()
    assert(rep == 3)
  }

  test("ungrouped fillDown carries across range partitions without a global window") {
    // values only at sparse positions: carry-forward must cross every
    // partition boundary of the range-partitioned two-phase plan
    val n = 5000
    val d = (1 to n).map(i =>
        (i.toLong, if (i % 997 == 1) Some(i.toDouble) else None))
      .toDF("t", "v")
    val filled = GraftFrame(d).fillDown(Seq(col("t")), "v")
    val plan = filled.df.queryExecution.executedPlan.toString
    // the DATA takes a range exchange, not a single-partition funnel
    // (the one SinglePartition sort in the plan is the tiny
    // one-row-per-partition boundary table)
    assert(plan.contains("rangepartitioning"),
      "ungrouped fill must range-partition the data:\n" + plan.take(1200))
    val got = filled.df.orderBy("t").collect()
      .map(r => Option(r.get(1)).map(_.asInstanceOf[Double]))
    (1 to n).foreach { i =>
      val expected = if (i < 1) None else Some((((i - 1) / 997) * 997 + 1).toDouble)
      assert(got(i - 1) == expected, s"row $i")
    }
  }

  test("countBy tallies and sorts; pull collects one column") {
    val d = Seq("a", "b", "b", "c", "b", "c").toDF("k")
    val counted = GraftFrame(d).countBy(Seq("k"), sort = true).df.collect()
    assert(counted.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("b", 3L), ("c", 2L), ("a", 1L)))
    val pulled = GraftFrame(d).distinct_().arrangeBy("k").pull("k")
    assert(pulled.toSeq == Seq("a", "b", "c"))
  }

  test("sliceSample is deterministic per seed and bounded") {
    val d = SparkT.table("customer")
    val s1 = GraftFrame(d).sliceSample(7, seed = 5L).df
      .select("c_custkey").collect().map(_.getLong(0)).sorted.toSeq
    val s2 = GraftFrame(d).sliceSample(7, seed = 5L).df
      .select("c_custkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 == s2 && s1.length == 7 && s1.distinct.length == 7)
  }

  test("grouped sliceSample draws n per group") {
    val d = SparkT.table("customer")
    val got = GraftFrame(d).groupBy("c_mktsegment").sliceSample(3).df
      .groupBy("c_mktsegment").count().collect()
    assert(got.length == 5 && got.forall(_.getLong(1) == 3L))
  }

  test("separate splits in place; unite concatenates at first position") {
    val d = Seq(("25-989-741", 1), ("13-5-2", 2)).toDF("phone", "x")
    val sep = GraftFrame(d).separate("phone", Seq("cc", "area"), "-")
    assert(sep.names == Seq("cc", "area", "x"))
    assert(sep.df.collect()(0).getString(0) == "25")
    val un = sep.unite("code", Seq("cc", "area"), "/")
    assert(un.names == Seq("code", "x"))
    assert(un.arrangeBy("x").df.collect()(0).getString(0) == "25/989")
  }

  test("unite renders nulls as NA (tidyr default), keeping separators") {
    val d = Seq((Some("x"), Option.empty[String]), (None, Some("y")))
      .toDF("a", "b")
    val got = GraftFrame(d).unite("c", Seq("a", "b"), "/").df
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("NA/y", "x/NA"))
  }

  test("nest collapses groups to sorted struct arrays; unnest restores them") {
    val d = Seq(("a", 2, 20.0), ("a", 1, 10.0), ("b", 3, 30.0)).toDF("g", "k", "v")
    val nested = GraftFrame(d).groupBy("g").nest("data", Seq("k", "v"))
    val rows = nested.df.orderBy("g").collect()
    assert(rows.length == 2)
    val aData = rows(0).getSeq[Row](1)
    assert(aData.map(r => (r.getInt(0), r.getDouble(1))) == Seq((1, 10.0), (2, 20.0)),
      "nested array must be sorted for determinism")
    // round trip restores every original row
    val back = nested.unnest("data").df
      .orderBy("g", "k").collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(back.toSeq == Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0)))
    // nesting requires a grouping, like tidyr
    intercept[IllegalArgumentException] { GraftFrame(d).nest("data", Seq("k")) }
  }

  test("nestJoin attaches matching right rows as a sorted array; unmatched = empty") {
    val left = Seq(("a", 1), ("b", 2), ("c", 3), (null, 4))
      .toDF("k", "x")
    val right = Seq(("a", 20, "q"), ("a", 10, "p"), ("b", 30, "r"), (null, 40, "s"))
      .toDF("k", "y", "z")
    val got = GraftFrame(left).nestJoin(GraftFrame(right), Seq("k"), "items").df
      .orderBy("x").collect()
    // left shape preserved: one output row per left row, columns + array
    assert(got.length == 4)
    val aItems = got(0).getSeq[Row](2)
    assert(aItems.map(r => (r.getInt(0), r.getString(1))) == Seq((10, "p"), (20, "q")),
      "nested structs sorted, key column dropped from them")
    assert(got(1).getSeq[Row](2).length == 1)
    assert(got(2).getSeq[Row](2).isEmpty, "unmatched left row gets an EMPTY array")
    assert(got(3).getSeq[Row](2).map(_.getInt(0)) == Seq(40),
      "null key matches null key (the join contract)")
    // law: unnest(nestJoin) == innerJoin rows (unmatched vanish, like tidyr)
    val viaNest = GraftFrame(left).nestJoin(GraftFrame(right), Seq("k"), "items")
      .unnest("items").df.select("k", "x", "y", "z")
    val viaJoin = GraftFrame(left).innerJoin(GraftFrame(right), Seq("k"))
      .df.select("k", "x", "y", "z")
    assert(viaNest.exceptAll(viaJoin).isEmpty && viaJoin.exceptAll(viaNest).isEmpty)
    // refusals: colliding output column, nothing to nest, missing key
    intercept[IllegalArgumentException] {
      GraftFrame(left).nestJoin(GraftFrame(right), Seq("k"), "x")
    }
    intercept[IllegalArgumentException] {
      GraftFrame(left).nestJoin(GraftFrame(right.select("k")), Seq("k"), "items")
    }
    intercept[GraftVerbError] {
      GraftFrame(left).nestJoin(GraftFrame(right), Seq("nope"), "items")
    }
  }

  test("complete fills the missing grid combinations; expand is the grid") {
    val d = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 3L)).toDF("f", "s", "n")
    val grid = GraftFrame(d).expand(Seq("f", "s")).df.collect()
    assert(grid.length == 4) // {a,b} × {x,y}
    val full = GraftFrame(d).complete(Seq("f", "s"), fill = Map("n" -> lit(0L))).df
      .orderBy("f", "s").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(full.toSeq == Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 3L), ("b", "y", 0L)))
  }

  test("complete is null-safe and fills only the rows it creates") {
    // a null grid value is a real value (tidyr semantics): the (a, null, 5)
    // observation must survive, NOT be replaced by the fill
    val d = Seq(("a", Option.empty[String], Some(5L)), ("a", Some("x"), None),
      ("b", Some("x"), Some(3L))).toDF("f", "s", "n")
    val full = GraftFrame(d).complete(Seq("f", "s"), fill = Map("n" -> lit(0L))).df
      .orderBy("f", "s").collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(full.toSeq == Seq(
      ("a", None, Some(5L)),      // pre-existing null key row kept
      ("a", Some("x"), None),     // pre-existing null VALUE kept (no fill)
      ("b", None, Some(0L)),      // created combo → filled
      ("b", Some("x"), Some(3L))))
  }

  test("grouped complete expands the grid within each group") {
    val d = Seq(("g1", "x", 1L), ("g1", "y", 2L), ("g2", "z", 3L)).toDF("g", "s", "n")
    val full = GraftFrame(d).groupBy("g").complete(Seq("s"), fill = Map("n" -> lit(0L))).df
      .orderBy("g", "s").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // g2 never saw x/y → per-group grid adds nothing there (tidyr grouped
    // complete); g1's grid is {x,y}, both present
    assert(full.toSeq == Seq(("g1", "x", 1L), ("g1", "y", 2L), ("g2", "z", 3L)))
    // and the group context survives the verb
    assert(GraftFrame(d).groupBy("g").complete(Seq("s")).groupVars == Seq("g"))
  }

  test("unnest preserves the group context") {
    val d = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0)).toDF("g", "k", "v")
    val out = GraftFrame(d).groupBy("g").nest("data", Seq("k", "v"))
      .groupBy("g").unnest("data")
      .summarise("cnt" -> count(lit(1))).df
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 2L), ("b", 1L))) // per-group, not global
  }

  test("pivotLonger unpivots value columns against id columns") {
    val d = Seq((1, 2.0, 3.0)).toDF("id", "a", "b")
    val longd = GraftFrame(d).pivotLonger(Seq("a", "b")).df
      .orderBy("name").collect()
    assert(longd.map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1, "a", 2.0), (1, "b", 3.0)))
  }

  test("eager/lazy mode surface maps to Spark semantics") {
    val base = GraftFrame(SparkT.table("nation"))
    assert(base.isLazy && base.asLazy.eq(base))
    assert(!base.hasPendingOps) // bare scan
    val pending = base.filter(col("n_nationkey") > 5)
    assert(pending.hasPendingOps)
    assert(base.select("n_name").hasPendingOps) // any verb pends, like cuplyr
    // a verb the optimizer folds to nothing still pends (analyzed-plan
    // semantics — the reference counts AST nodes, not optimized ones)
    assert(base.filter(lit(true)).hasPendingOps)
    val eager = pending.asEager
    assert(eager.df.storageLevel.useMemory)
    assert(!eager.hasPendingOps) // cashed in: the plan resolves to the cache
    assert(eager.filter(col("n_nationkey") > 7).hasPendingOps) // new verb pends again
    assert(graft.api.GraftSession.hasEngine(SparkT.spark))
    assert(graft.api.GraftSession.engineInfo(SparkT.spark).contains("Spark"))
    eager.unpersist()
  }

  test("session introspection mirrors the reference's gpu utilities") {
    val spark = SparkT.spark
    val mem = graft.api.GraftSession.memoryState(spark)
    assert(mem("executors") >= 1 && mem("storage_max") > 0)
    assert(graft.api.GraftSession.details(spark).nonEmpty)
    val d = SparkT.table("nation")
    val info = graft.api.GraftSession.objectInfo(d)
    assert(info("columns") == d.columns.length.toString)
    assert(BigInt(info("est_size_bytes")) > 0)
    assert(graft.api.GraftSession.verifyData(d))
    val cmp = graft.api.GraftSession.sizeComparison(d)
    assert(cmp("cached_bytes") > 0)
    d.unpersist()
    graft.api.GraftSession.gc(spark) // must not throw; cache is clear after
    assert(!d.storageLevel.useMemory || d.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("gc frees only unreferenced graft caches; gcAll is the hammer") {
    val spark = SparkT.spark
    val kept = GraftFrame(df3).compute()
    // an unreachable computed frame: the handle dies with the helper's
    // stack frame (a `locally` block can leave the local in a live
    // method-frame slot, defeating collection)
    def makeDropped(): org.apache.spark.sql.DataFrame = {
      val dropped = GraftFrame(df3.filter(col("id") > 0)).compute()
      dropped.df // the (plan-only) DataFrame lets us observe cache state
    }
    val droppedDf = makeDropped()
    // gc() must never touch a frame the caller still references
    graft.api.GraftSession.gc(spark)
    assert(kept.df.storageLevel.useMemory, "gc() cleared a live frame's cache")
    // ...and must eventually reclaim the dropped one (weak-ref clearing
    // needs a JVM collection; retry a few times, as with R's gc()).
    // System.gc() alone is a hint some collectors ignore
    // (-XX:+DisableExplicitGC, some G1 configs), so each attempt also
    // applies real allocation pressure to force a collection cycle.
    var tries = 0
    var sink = 0 // consumed below so the churn can't be dead-code-eliminated
    while (droppedDf.storageLevel.useMemory && tries < 40) {
      var i = 0
      while (i < 64) { sink ^= new Array[Byte](1 << 20).length; i += 1 }
      System.gc(); Thread.sleep(25)
      graft.api.GraftSession.gc(spark)
      tries += 1
    }
    assert(sink >= 0)
    assert(!droppedDf.storageLevel.useMemory,
      "gc() never reclaimed an unreferenced computed frame")
    graft.api.GraftSession.gcAll(spark)
    assert(!kept.df.storageLevel.useMemory, "gcAll must clear everything")
  }

  test("compute persists; collapse is lazy; collect pulls rows") {
    val f = GraftFrame(df3).collapse()
    assert(f.df.storageLevel.useMemory) // marked, not yet materialized
    val c = f.compute()
    assert(c.collect().length == 3)
    c.unpersist()
  }

  test("sliceMax respects group context; sliceMin mirrors it") {
    val d = Seq(("a", 1), ("a", 3), ("a", 2), ("b", 9), ("b", 8)).toDF("g", "v")
    val top = GraftFrame(d).groupBy("g").sliceMax(col("v"), 2, col("v"))
      .arrangeBy("g", "v").df.collect().map(r => (r.getString(0), r.getInt(1)))
    assert(top.toSeq == Seq(("a", 2), ("a", 3), ("b", 8), ("b", 9)))
    val bottom = GraftFrame(d).sliceMin(col("v"), 1).df.collect()
    assert(bottom.length == 1 && bottom(0).getInt(1) == 1) // ungrouped: global min
  }

  test("rename keeps positions and remaps groups; relocate reorders") {
    val f = GraftFrame(df3).groupBy("id").rename("ident" -> "id")
    assert(f.names == Seq("ident", "name", "v"))
    assert(f.groupVars == Seq("ident"))
    assert(GraftFrame(df3).relocate("v").names == Seq("v", "id", "name"))
  }

  test("dims and schema report without mutation") {
    val f = GraftFrame(df3)
    assert(f.dims == (3L, 3))
    assert(f.schema.fieldNames.toSeq == Seq("id", "name", "v"))
  }

  test("mutating joins preserve x's grouping (dplyr contract)") {
    val left = Seq(("a", 1, 10), ("a", 2, 20), ("b", 3, 30)).toDF("g", "k", "v")
    val dims = Seq((1, "one"), (2, "two"), (3, "three")).toDF("k", "lbl")
    val out = GraftFrame(left).groupBy("g")
      .leftJoin(GraftFrame(dims), Seq("k"))
      .summarise("n" -> count(lit(1)))
      .arrangeBy("g").df.collect()
    // one row PER GROUP — not one global row
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 2L), ("b", 1L)))
    // a suffixed grouping column follows its rename
    val clash = Seq((1, "x")).toDF("k", "g") // right also has "g"
    val j = GraftFrame(left).groupBy("g").innerJoin(GraftFrame(clash), Seq("k"))
    assert(j.groupVars == Seq("g_x"))
    assert(j.names.contains("g_x") && j.names.contains("g_y"))
  }

  test("transmute retains grouping variables (dplyr contract)") {
    val d = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "v")
    val t = GraftFrame(d).groupBy("g").transmute("v2" -> col("v") * 2)
    assert(t.names == Seq("g", "v2"))
    val out = t.summarise("s" -> sum(col("v2"))).arrangeBy("g").df.collect()
    assert(out.map(r => (r.getString(0), r.getLong(1).toInt)).toSeq ==
      Seq(("a", 6), ("b", 6)))
  }

  test("sliceMaxAgg rejects non-numeric ordering keys instead of silent nulls") {
    val d = Seq(("a", "zed"), ("a", "alpha")).toDF("g", "name")
    intercept[IllegalArgumentException] {
      GraftFrame(d).groupBy("g").sliceMaxAgg(col("name"), 1)
    }
  }

  test("mutateGrouped leaves user-windowed aggregates un-rewrapped") {
    import org.apache.spark.sql.expressions.Window
    val d = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 5.0))
      .toDF("g", "t", "x")
    // explicit running-sum window inside a grouped mutate: must not be
    // wrapped in the group window again (nested windows fail analysis)
    val out = GraftFrame(d).groupBy("g").mutateGrouped(
        "cum" -> sum(col("x")).over(
          Window.partitionBy(col("g")).orderBy(col("t"))))
      .arrangeBy("g", "t").df.collect()
    assert(out.map(_.getDouble(3)).toSeq == Seq(10.0, 30.0, 5.0))
    // and the ungrouped hoist path tolerates a user window too
    val out2 = GraftFrame(d).mutateGrouped(
        "cum" -> sum(col("x")).over(Window.partitionBy(col("g")).orderBy(col("t"))))
      .arrangeBy("g", "t").df.collect()
    assert(out2.map(_.getDouble(3)).toSeq == Seq(10.0, 30.0, 5.0))
  }

  test("unite refuses an empty source list; bindCols uniquifies _rhs clashes") {
    intercept[IllegalArgumentException] {
      GraftFrame(df3).unite("key", Seq())
    }
    val l = Seq((1, 2)).toDF("x", "y")
    val r = Seq((3, 4)).toDF("x", "x_rhs")
    val bound = GraftFrame(l).bindCols(GraftFrame(r))
    assert(bound.names.distinct.length == bound.names.length,
      s"duplicate output names: ${bound.names}")
    assert(bound.names.toSet == Set("x", "y", "x_rhs", "x_rhs_rhs"))
  }

  test("rows_* family: update vs patch semantics, insert/upsert/delete, null keys") {
    val x = GraftFrame(Seq(
      (Some(1L), Some("a"), Some(10.0)),
      (Some(2L), None, Some(20.0)),
      (None, Some("nk"), Some(30.0))).toDF("id", "nm", "p"))
    // UPDATE overwrites, explicit nulls included; partial payload
    // leaves the untouched column alone
    val upd = GraftFrame(Seq((Some(1L), None: Option[String]),
      (Some(99L), Some("ghost"))).toDF("id", "nm"))
    val afterUpd = x.rowsUpdate(upd, Seq("id")).df
      .orderBy(col("id").asc_nulls_first).collect()
    assert(afterUpd.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("nk"), None, None)) // null-key row kept; id=1 nulled
    assert(afterUpd.map(_.getDouble(2)).toSeq == Seq(30.0, 10.0, 20.0))
    // PATCH fills only nulls (id=2's nm), never overwrites (id=1's nm)
    val patch = GraftFrame(Seq((1L, "zzz"), (2L, "filled")).toDF("id", "nm"))
    val afterPatch = x.rowsPatch(patch, Seq("id")).df
      .orderBy(col("id").asc_nulls_first).collect()
    assert(afterPatch.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("nk"), Some("a"), Some("filled")))
    // INSERT appends only fresh keys (incl. vs the null key), missing
    // columns become null; UPSERT = update + insert
    val ins = GraftFrame(Seq((Some(2L), 99.0), (Some(5L), 50.0),
      (None, 77.0)).toDF("id", "p"))
    val afterIns = x.rowsInsert(ins, Seq("id")).df
    assert(afterIns.count() == 4L) // only id=5 is new
    assert(afterIns.filter(col("id") === 5L).collect()(0).isNullAt(1))
    val afterUps = x.rowsUpsert(ins, Seq("id")).df
    assert(afterUps.count() == 4L)
    assert(afterUps.filter(col("id") === 2L).collect()(0).getDouble(2) == 99.0)
    assert(afterUps.filter(col("id").isNull).collect()(0).getDouble(2) == 77.0)
    // DELETE drops by key, null-safely
    val del = GraftFrame(Seq(Option(2L), None).toDF("id"))
    assert(x.rowsDelete(del, Seq("id")).df.collect().map(_.getLong(0)).toSeq ==
      Seq(1L))
    // refusals: columns outside the target, empty keys
    intercept[IllegalArgumentException] {
      x.rowsUpdate(GraftFrame(Seq((1L, "v")).toDF("id", "nope")), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      x.rowsUpdate(upd, Seq())
    }
  }
}
