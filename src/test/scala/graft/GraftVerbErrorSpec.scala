package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{GraftFrame, GraftVerbError}

/** Friendly-error-boundary parity with the reference's GPU error
  * wrapper (R/gpu.R; tests/testthat/test-gpu-error-wrapper.R): the
  * classic mistakes — a missing column in filter/select/mutate/
  * arrange/summarise, an unknown group_by column, a bad join key —
  * must rethrow with the VERB name, the referenced/missing columns and
  * the available ones, keeping the raw AnalysisException as the cause. */
class GraftVerbErrorSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark

  private def frame = {
    import spark.implicits._
    GraftFrame(Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("id", "name", "score"))
  }

  private def expectVerbError(verb: String, mustMention: Seq[String])(body: => Any): Unit = {
    val e = intercept[GraftVerbError](body)
    assert(e.verb == verb, s"expected verb '$verb', got '${e.verb}'")
    assert(e.getMessage.contains(s"graft verb '$verb' failed"))
    mustMention.foreach(m =>
      assert(e.getMessage.contains(m), s"message must mention '$m': ${e.getMessage}"))
    assert(e.getCause.isInstanceOf[org.apache.spark.sql.AnalysisException],
      "original AnalysisException must ride along as the cause")
  }

  test("filter on a missing column names the verb, the column, and what's available") {
    expectVerbError("filter", Seq("typo_col", "Missing from the frame: typo_col",
      "Available columns: id, name, score")) {
      frame.filter(col("typo_col") > 1)
    }
  }

  test("select on a missing column is wrapped") {
    expectVerbError("select", Seq("nope", "Available columns: id, name, score")) {
      frame.select("id", "nope")
    }
  }

  test("mutate referencing a missing column is wrapped") {
    expectVerbError("mutate", Seq("ghost")) {
      frame.mutate("twice" -> (col("ghost") * 2))
    }
  }

  test("arrange and summarise are wrapped") {
    expectVerbError("arrange", Seq("zzz")) {
      frame.arrange(GraftFrame.asc("zzz"))
    }
    expectVerbError("summarise", Seq("missing_val")) {
      frame.groupBy("name").summarise("s" -> sum(col("missing_val")))
    }
  }

  test("group_by fails at group_by() time, not verbs later at summarise") {
    expectVerbError("group_by", Seq("namez", "Available columns: id, name, score")) {
      frame.groupBy("namez")
    }
  }

  test("join key errors name the side and its columns") {
    val dim = {
      import spark.implicits._
      GraftFrame(Seq((1L, "x")).toDF("dim_id", "label"))
    }
    val left = intercept[GraftVerbError](frame.innerJoin(dim, Seq("not_here")))
    assert(left.getMessage.contains("inner_join"))
    assert(left.getMessage.contains("missing from the left frame"))
    val right = intercept[GraftVerbError](
      frame.join(dim, Seq("id" -> "bad_key"), "left"))
    assert(right.verb == "left_join")
    assert(right.getMessage.contains("missing from the right frame"))
    assert(right.getMessage.contains("Available right columns: dim_id, label"))
    val semi = intercept[GraftVerbError](frame.semiJoin(dim, Seq("id")))
    assert(semi.verb == "semi_join")
    assert(semi.getMessage.contains("missing from the right frame"))
  }

  test("valid verbs still work unchanged through the boundary") {
    assert(frame.filter(col("score") > 2.5).df.count() == 1)
    assert(frame.groupBy("name").summarise("s" -> sum(col("score"))).df.count() == 2)
  }
}
