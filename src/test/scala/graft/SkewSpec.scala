package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark

  test("saltedSummarise equals direct aggregation") {
    val li = SparkT.table("lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("sq"), count(col("l_quantity")).as("n"),
        min(col("l_discount")).as("mn"), max(col("l_discount")).as("mx"))
    val salted = Skew.saltedSummarise(li, Seq("l_returnflag"), salts = 8,
      ("sq", "l_quantity", "sum"), ("n", "l_quantity", "count"),
      ("mn", "l_discount", "min"), ("mx", "l_discount", "max"))
    assert(salted.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(salted).count() == 0)
  }

  test("saltedSummarise plan is exactly two hash exchanges (partial spread + merge)") {
    // the declared q43 query without its final sort: one exchange on
    // (keys, salt) for the spread phase, one on keys for the merge —
    // no third shuffle, no collect
    val salted = Skew.saltedSummarise(
      SparkT.table("lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity", "l_discount"),
      Seq("l_returnflag", "l_linestatus"), salts = 32,
      ("sum_qty", "l_quantity", "sum"), ("n", "l_quantity", "count"),
      ("min_disc", "l_discount", "min"), ("max_disc", "l_discount", "max"))
    val plan = salted.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2,
      "salted aggregate must shuffle exactly twice:\n" + plan.take(1500))
  }

  test("saltedSummarise rejects non-algebraic ops") {
    val li = SparkT.table("lineitem")
    intercept[IllegalArgumentException] {
      Skew.saltedSummarise(li, Seq("l_returnflag"), 4, ("a", "l_quantity", "avg"))
        .collect()
    }
  }

  test("skewAwareJoin returns the same rows as a plain join") {
    val li = SparkT.table("lineitem").select("l_orderkey", "l_quantity")
    val o = SparkT.table("orders").select(col("o_orderkey").as("l_orderkey"),
      col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"), "inner")
    val skewed = Skew.skewAwareJoin(li, o, "l_orderkey", hotThreshold = 3,
      sampleFraction = 0.5)
    assert(skewed.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(skewed).count() == 0)
  }
}
