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

  // ---- span-level contamination (txt22) --------------------------------

  test("contaminatedSpans: full copy = full coverage, middle splice localized, clean doc none") {
    // benchText is 10 words; windowWords = 4
    val corpus = Seq(
      (1L, benchText),                                       // full coverage [0,10)
      (2L, "one two three four five six seven eight"),       // clean
      (3L, s"one two three four $benchText nine ten eleven twelve"), // middle splice [4,14)
      (4L, "tiny doc")                                       // shorter than the window
    ).toDF("doc_id", "text")
    val got = Decontam.contaminatedSpans(corpus, bench, "doc_id", "text",
        windowWords = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((1L, 0L, 10L, 10L), (3L, 4L, 14L, 10L)))
  }

  test("scrubContaminatedSpans removes exactly the leaked words (normalized form)") {
    val corpus = Seq(
      (1L, s"One Two THREE four $benchText"), // tail splice; casing must normalize
      (2L, "clean doc stays put here")
    ).toDF("doc_id", "text")
    val got = Decontam.scrubContaminatedSpans(corpus, bench, "doc_id", "text",
        windowWords = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "one two three four")
    assert(got(2L) == "clean doc stays put here")
  }

  test("contaminatedSpans edges: empty bench, null text, full-leak doc") {
    val corpus = Seq((1L, benchText), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val emptyBench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Decontam.contaminatedSpans(corpus, emptyBench, "doc_id", "text",
      windowWords = 4).isEmpty)
    val scrub = Decontam.scrubContaminatedSpans(corpus, bench, "doc_id", "text",
        windowWords = 4)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(scrub(1L) == Some("")) // entirely benchmark coverage → empty string
    assert(scrub(2L) == None)     // null text passes through as null
  }

  test("txt22 plan: bench window digests broadcast; corpus text never shuffles") {
    val q = SparkEntry.queries("txt22_contam_spans")(spark, SparkT.sfDir)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"), "bench digest probe must broadcast")
    val shuffles = p.split("Exchange hashpartitioning").drop(1)
    assert(shuffles.nonEmpty)
    shuffles.foreach { s =>
      assert(!s.takeWhile(_ != ')').contains("text"),
        "an exchange partitions on the text column")
    }
  }

  test("semantic: planted copy flags at 1.0, paraphrase-near flags, orthogonal survives") {
    val bench = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(2.0f, 0.0f, 0.0f)),    // scaled copy of bench 0 → cos 1
      (11L, Array(0.9f, 0.1f, 0.0f)),    // near bench 0
      (12L, Array(0.0f, 0.0f, 1.0f)),    // orthogonal to both
      (13L, Array(-1.0f, 0.0f, 0.0f)))   // anti-parallel: signed score −1
      .toDF("vec_id", "embedding")
    val got = Decontam.semantic(corpus, bench, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(10L, 11L))
    assert(got(0)._2 == 0L && got(0)._3 == 1.0)
    assert(got(1)._2 == 0L && got(1)._3 > 0.5)
  }

  test("semantic: min-bench-id tie-break, empty bench, null vectors, dim mismatch") {
    val corpus = Seq((10L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    // two identical bench vectors: the tie goes to the smaller id
    val tied = Seq((5L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val t1 = Decontam.semantic(corpus, tied, threshold = 0.5).collect()
    assert(t1.length == 1 && t1(0).getLong(1) == 2L)
    // empty benchmark → empty result, not a crash
    assert(Decontam.semantic(corpus, tied.filter(col("vec_id") < 0), 0.0).count() == 0L)
    // null vectors drop on both sides
    val nullCorpus = Seq((10L, Some(Array(1.0f, 0.0f))), (11L, None))
      .toDF("vec_id", "embedding")
    assert(Decontam.semantic(nullCorpus, tied, threshold = 0.5).count() == 1L)
    // mixed dimensions fail fast, not a silent prefix dot
    val badBench = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Decontam.semantic(corpus, badBench, threshold = 0.0).collect()
    }
    assert(e.getMessage != null || e.getCause != null)
  }
}
