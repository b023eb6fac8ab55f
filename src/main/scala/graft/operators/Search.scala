package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword search over a document corpus: posting-list index build,
  * boolean term search, and BM25 ranked retrieval — the corpus-
  * inspection primitives of a curation pipeline (find the documents
  * behind a heavy-hitter token, audit a blocklist candidate, pull
  * examples for a quality-rule regression).
  *
  * Scale shape: the index is ROWS (term, doc_id), never per-term
  * arrays — a stopword's posting list is billions of ids at corpus
  * scale, and an `collect_list` row would be a driver-sized object;
  * as rows it is just a big partition, and every consumer below is a
  * groupBy/join over (term, doc_id) keys. Term lookups filter
  * `term IN (...)` BEFORE any aggregation, so a query touches the
  * postings of its own terms only (predicate pushdown to the parquet
  * scan when the index is persisted; bucketing the saved table by
  * `term` additionally co-locates each term's postings for
  * shuffle-free lookups). Scoring aggregates shuffle one row per
  * (matching doc, query term) — query-sized, not corpus-sized.
  */
object Search {

  /** The library's standard tokenization (the txt16/txt19 idiom):
    * whitespace-split of the lowercased, whitespace-collapsed text. */
  private def wordsOf(textCol: Column): Column =
    split(lower(trim(regexp_replace(textCol, "\\s+", " "))), " ")

  /** Posting rows (term, doc_id), one per DISTINCT term occurrence in
    * a document — the inverted index in its scale-safe row form.
    * Persist with `.write.bucketBy(n, "term")` (co-located lookups)
    * or plain parquet (term predicates still push down); pass the
    * read-back frame to [[andSearch]]/[[orSearch]]. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(wordsOf(col(textCol)))).as("term"))
      .filter(col("term") =!= "")

  /** Documents containing EVERY query term: filter the postings to
    * the term set (pushed to the scan), count distinct terms per doc,
    * keep full matches. `index` is an [[invertedIndex]] frame (built
    * inline or read back from parquet). */
  def andSearch(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "andSearch: empty term list")
    val t = terms.distinct
    index.filter(col("term").isin(t: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("__nt")) // index rows are distinct per (doc, term)
      .filter(col("__nt") === t.size)
      .select("doc_id")
  }

  /** Documents containing ANY query term. */
  def orSearch(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "orSearch: empty term list")
    index.filter(col("term").isin(terms.distinct: _*))
      .select("doc_id").distinct()
  }

  /** BM25 ranked retrieval: top `topN` documents for a bag of query
    * terms, scored with the standard Okapi formula
    *
    *   score(d) = Σ_t  ln((N − df_t + 0.5)/(df_t + 0.5) + 1)
    *              · tf_td·(k1 + 1) / (tf_td + k1·(1 − b + b·len_d/avgdl))
    *
    * over the corpus statistics (N documents with ≥1 token, document
    * length in tokens, average length, per-term document frequency).
    *
    * ONE corpus scan: tokens explode with the per-doc length attached
    * scan-side (no separate length aggregate); the term filter cuts
    * the stream to the query's terms before the tf groupBy, so the
    * only corpus-wide work is the scalar (N, avgdl) aggregate —
    * everything after is query-sized. df comes from the tf frame
    * itself. Scores are rounded to 4 dp and ranked (score desc,
    * doc_id asc) — the rounding makes boundary ties deterministic
    * across engines, the txt8 ln-parity discipline.
    *
    * Output: (doc_id, score), `topN` rows, ranked. */
  def bm25TopDocs(docs: DataFrame, idCol: String, textCol: String,
                  terms: Seq[String], topN: Int,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopDocs: empty term list")
    require(topN > 0, s"bm25TopDocs: topN must be positive, got $topN")
    val t = terms.distinct
    // tokens with the doc's length attached scan-side; zero-token
    // docs vanish here and are excluded from N/avgdl on BOTH the
    // engine and oracle sides (they can match no term)
    val toks = docs
      .select(col(idCol).as("doc_id"),
        filter(wordsOf(col(textCol)), w => w =!= "").as("__ws"))
      .select(col("doc_id"), size(col("__ws")).as("len"),
        explode(col("__ws")).as("term"))
    // (N, avgdl) as a pure SCALAR aggregate over a second projection
    // of the same scan — map-side partials, nothing doc-cardinality
    // ever shuffles (the two scans are the documented recompute-vs-
    // materialize tradeoff; a groupBy(doc_id) route would scan twice
    // anyway AND shuffle a row per document)
    val stats = docs
      .select(size(filter(wordsOf(col(textCol)), w => w =!= "")).as("len"))
      .filter(col("len") > 0)
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("len")).as("avgdl"))
    val tf = toks.filter(col("term").isin(t: _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first(col("len")).as("len"))
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val scored = tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__s",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / col("avgdl"))))
      .groupBy("doc_id").agg(round(sum(col("__s")), 4).as("score"))
    scored.orderBy(col("score").desc, col("doc_id").asc).limit(topN)
  }

  /** Per-document keyword extraction: the `k` highest-TF-IDF terms of
    * every document — the "what is this doc about" summary column a
    * curation pipeline attaches before clustering, mixing or eyeball
    * audits (the per-doc companion of the corpus-level txt8 TF-IDF
    * table).
    *
    * Scoring is txt8's exactly: tf·ln(N/df) over the standard
    * tokenization, ROUNDED to 4 dp before ranking — the rounding is
    * what makes boundary ranks deterministic across engines (two
    * terms whose raw scores differ below libm's ulp tie at 4 dp and
    * fall through to the term tie-break; ranking by the raw double
    * would let the last ulp decide membership differently per
    * engine). Rank = (tfidf desc, term asc), top `k` per doc.
    *
    * Scale shape: one explode → (doc, term) tf aggregate (map-side
    * combined — the only corpus-cardinality shuffle), df re-aggregated
    * from the tf digests, N a broadcast scalar, and the top-k runs as
    * a window rank PARTITIONED BY DOCUMENT — each partition is one
    * doc's vocabulary (bounded by doc length), so the sort
    * parallelizes across docs and no hot-group risk exists (this is
    * the sliceMax case, not the q34 BoundedTopK case: the group key
    * is the finest-grained column in the table).
    *
    * Output: (doc_id, term, tf, tfidf, kw_rank), ≤ k rows per doc. */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    require(k > 0, s"tfidfKeywords: k must be positive, got $k")
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(wordsOf(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("tf") * log(col("__n_docs").cast("double")
          / col("df").cast("double")), 4).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("kw_rank", row_number().over(w))
      .filter(col("kw_rank") <= k)
  }
}
