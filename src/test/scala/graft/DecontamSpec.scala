package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Decontam

class DecontamSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark
  import spark.implicits._

  private val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private def bench = Seq((0L, benchText)).toDF("doc_id", "text")

  test("containment: benchmark copies 1.0, splices partial, disjoint 0.0") {
    val corpus = Seq(
      (1L, benchText),                                  // verbatim copy
      (2L, "one two three four five six seven eight"),  // disjoint
      (3L, s"one two three four five six $benchText"),  // spliced
      (4L, "tiny doc")                                  // unshingleable (<5 words)
    ).toDF("doc_id", "text")
    val got = Decontam.containment(corpus, bench, "doc_id", "text", shingleN = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) == 1.0)
    assert(got(2L) == 0.0)
    assert(got(3L) > 0.2 && got(3L) < 1.0)
    assert(got(4L) == 0.0)
  }

  test("contaminated applies the threshold") {
    val corpus = Seq(
      (1L, benchText),
      (2L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val flagged = Decontam.contaminated(corpus, bench, "doc_id", "text",
      threshold = 0.5, shingleN = 5).collect().map(_.getLong(0)).toSeq
    assert(flagged == Seq(1L))
  }

  test("containmentBloom: row-identical to containment incl. duplicate ids; lazy subquery build") {
    val corpus = Seq(
      (1L, benchText),
      (2L, "one two three four five six seven eight"),
      (3L, s"one two three four five six $benchText"),
      (3L, benchText), // duplicate id — must fold into ONE output row, as containment does
      (4L, "tiny doc")
    ).toDF("doc_id", "text")
    val exact = Decontam.containment(corpus, bench, "doc_id", "text", shingleN = 5)
    val bloom = Decontam.containmentBloom(corpus, bench, "doc_id", "text",
      shingleN = 5, expectedItems = 1024)
    // construction-is-lazy contract: the sketch is an uncorrelated scalar
    // subquery executed WITH the query, not a driver-built plan literal
    assert(bloom.queryExecution.analyzed.toString.contains("scalar-subquery"),
      "bloom must be built as a lazy scalar subquery")
    assert(bloom.orderBy("doc_id").collect().toSeq ==
      exact.orderBy("doc_id").collect().toSeq)
  }

  test("probe side broadcasts; corpus text never reaches an exchange") {
    val q = SparkEntry.queries("txt10_decontam")(spark, SparkT.sfDir)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"), "probe set must broadcast")
    // every shuffle carries ids/counts only — never the text column
    val shuffles = p.split("Exchange hashpartitioning").drop(1)
    assert(shuffles.nonEmpty)
    shuffles.foreach { s =>
      assert(!s.takeWhile(_ != ')').contains("text"),
        "an exchange partitions on the text column")
    }
  }
}
