package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Search

/** Inverted-index + boolean search + BM25: pinned against locally
  * computed ground truth (including the exact Okapi formula), plus
  * the persistence/pushdown contract of the row-form index. */
class SearchSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark
  import spark.implicits._

  private val fixture = Seq(
    (1L, "alpha beta gamma alpha"),
    (2L, "alpha beta"),
    (3L, "gamma delta epsilon"),
    (4L, "alpha   beta\n\tgamma  GAMMA"),   // messy whitespace + case
    (5L, ""),                                // zero tokens
    (6L, null.asInstanceOf[String]),
    (7L, "beta beta beta gamma"))

  private def docs = fixture.toDF("doc_id", "text")

  private def tokens(t: String): Seq[String] =
    if (t == null) Seq.empty
    else t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty).toSeq

  test("invertedIndex: one row per distinct (term, doc); null/empty text vanish") {
    val idx = Search.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = fixture.flatMap { case (id, t) =>
      tokens(t).distinct.map(w => (id, w))
    }.toSet
    assert(idx == want)
  }

  test("andSearch / orSearch match the definitional ground truth") {
    val idx = Search.invertedIndex(docs, "doc_id", "text")
    def docsWith(p: Seq[String] => Boolean): Set[Long] =
      fixture.collect { case (id, t) if p(tokens(t)) => id }.toSet
    val and2 = Search.andSearch(idx, Seq("alpha", "gamma"))
      .collect().map(_.getLong(0)).toSet
    assert(and2 == docsWith(ws => ws.contains("alpha") && ws.contains("gamma")))
    assert(and2 == Set(1L, 4L))
    val or2 = Search.orSearch(idx, Seq("delta", "beta"))
      .collect().map(_.getLong(0)).toSet
    assert(or2 == docsWith(ws => ws.contains("delta") || ws.contains("beta")))
    // absent term: AND empties, OR ignores
    assert(Search.andSearch(idx, Seq("alpha", "zzz")).count() == 0)
    assert(Search.orSearch(idx, Seq("zzz", "beta")).count() ==
      docsWith(_.contains("beta")).size)
    // duplicate query terms collapse (not double-counted in the AND)
    assert(Search.andSearch(idx, Seq("alpha", "alpha", "gamma"))
      .collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    intercept[IllegalArgumentException] { Search.andSearch(idx, Seq.empty) }
    intercept[IllegalArgumentException] { Search.orSearch(idx, Seq.empty) }
  }

  test("bm25TopDocs equals the locally computed Okapi reference") {
    val terms = Seq("alpha", "gamma")
    val (k1, b) = (1.2, 0.75)
    val lens = fixture.map { case (id, t) => id -> tokens(t).length }
      .filter(_._2 > 0).toMap
    val n = lens.size.toDouble
    val avgdl = lens.values.sum.toDouble / n
    val dfm = terms.map(t => t ->
      fixture.count { case (_, x) => tokens(x).contains(t) }.toDouble).toMap
    val want = fixture.flatMap { case (id, t) =>
      val ws = tokens(t)
      val s = terms.map { q =>
        val tf = ws.count(_ == q).toDouble
        if (tf == 0) 0.0
        else math.log((n - dfm(q) + 0.5) / (dfm(q) + 0.5) + 1.0) *
          tf * (k1 + 1) / (tf + k1 * (1 - b + b * lens(id) / avgdl))
      }.sum
      if (s > 0) Some(id -> BigDecimal(s).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) else None
    }.sortBy { case (id, s) => (-s, id) }.take(3)
    val got = Search.bm25TopDocs(docs, "doc_id", "text", terms, topN = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want, s"got=$got want=$want")
    intercept[IllegalArgumentException] {
      Search.bm25TopDocs(docs, "doc_id", "text", Seq.empty, 3)
    }
    intercept[IllegalArgumentException] {
      Search.bm25TopDocs(docs, "doc_id", "text", terms, 0)
    }
  }

  test("persisted index round-trips; term predicate pushes to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_searchspec").toString
    Search.invertedIndex(docs, "doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val got = Search.andSearch(back, Seq("alpha", "gamma"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
    val plan = Search.andSearch(back, Seq("alpha", "gamma"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      "term IN (...) must reach the parquet scan:\n" + plan.take(1000))
  }

  test("tfidfKeywords: hand-computed scores, k cut, rank order, tie-break") {
    import SparkT.spark.implicits._
    // 4 docs; "common" is in all 4 (idf = ln 1 = 0), "pair" in 2,
    // "solo"/"only"/"lone" in 1 each
    val docs = Seq(
      (1L, "common solo solo pair"),
      (2L, "common pair"),
      (3L, "common only"),
      (4L, "common lone")).toDF("doc_id", "text")
    val got = Search.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
      .sortBy(t => (t._1, t._5))
    def r4(x: Double) = BigDecimal(x).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: solo tf=2·ln(4/1), pair 1·ln(4/2), common 1·ln(1)=0
    assert(got.filter(_._1 == 1L).map(t => (t._2, t._3, t._4)).toSeq ==
      Seq(("solo", 2L, r4(2.0 * math.log(4.0))),
        ("pair", 1L, r4(math.log(2.0)))))
    // doc 2: pair beats common (0.0); k=2 keeps both, common ranked 2nd
    assert(got.filter(_._1 == 2L).map(t => (t._2, t._5)).toSeq ==
      Seq(("pair", 1), ("common", 2)))
    // every doc emits ≤ k rows with ranks 1..k
    assert(got.groupBy(_._1).values.forall(rows =>
      rows.map(_._5).sorted.toSeq == (1 to rows.size).toSeq))
    // tie-break: two equal-score singleton terms order alphabetically
    val tie = Seq((1L, "zebra apple"), (2L, "filler")).toDF("doc_id", "text")
    val tg = Search.tfidfKeywords(tie, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 1L).orderBy(col("kw_rank").asc)
      .collect().map(_.getString(1))
    assert(tg.toSeq == Seq("apple", "zebra"))
    intercept[IllegalArgumentException] {
      Search.tfidfKeywords(docs, "doc_id", "text", k = 0)
    }
  }
}
