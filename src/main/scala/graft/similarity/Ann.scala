package graft.similarity

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.expressions.GraftFunctions
import graft.functions.vecfns

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Three tiers:
  *   1. [[bruteForceTopK]] — exact, scalable: queries broadcast to every
  *      partition, per-partition bounded heaps, then a final top-k over
  *      parts × Q × k candidate rows. Never materializes or sorts the
  *      N×Q score matrix.
  *   2. [[bruteForceTopKSql]] — exact, declarative (window rank). Used
  *      as the oracle-matched baseline; the full score set shuffles, so
  *      it is the sf-small correctness twin of (1), not the scale path.
  *   3. [[lshTopK]] — approximate: SRP-LSH buckets restrict candidates
  *      before exact scoring (the 100 TB path when Q is large too).
  */
object Ann {

  /** One candidate's score — THE shared kernel of every exact heap
    * path (bruteForceTopK + filteredTopK): the bit-identical-to-SQL
    * quantized arithmetic and the float cosine live in exactly one
    * place, so the exact twins cannot drift apart. */
  private def scorePair(caller: String, vec: Array[Float], qv: Array[Long],
                        na: Double, q: Array[Float], qQuantI: Array[Long],
                        qNbI: Double, quantized: Boolean): Double =
    if (quantized) {
      // EXACTLY the SQL twin's arithmetic (and operation order):
      // integer dots cast to double, then sign(d)*d*d/(na*nb)
      require(qv.length == qQuantI.length,
        s"$caller: corpus vector dim ${qv.length} != query vector dim " +
          s"${qQuantI.length} — mixed-dimension data is a pipeline bug; " +
          "failing fast beats a silent prefix dot product")
      val d = longDot(qv, qQuantI).toDouble
      if (na == 0 || qNbI == 0) 0.0
      else math.signum(d) * d * d / (na * qNbI)
    } else {
      require(vec.length == q.length,
        s"$caller: corpus vector dim ${vec.length} != query vector dim " +
          s"${q.length} — mixed-dimension data is a pipeline bug; failing " +
          "fast beats a silent prefix dot product (or an out-of-bounds crash)")
      var dot = 0.0; var sna = 0.0; var snb = 0.0; var i = 0
      while (i < vec.length) {
        val x = vec(i).toDouble; val y = q(i).toDouble
        dot += x * y; sna += x * x; snb += y * y; i += 1
      }
      if (sna == 0 || snb == 0) 0.0
      else dot / (math.sqrt(sna) * math.sqrt(snb))
    }

  /** Exact top-k neighbors per query by cosine.
    *
    * `queries` is collected to the driver (it must be the small side —
    * the same contract as a broadcast join) and shipped once per
    * executor via a broadcast variable; the corpus is streamed
    * partition-by-partition through per-query bounded heaps. Output:
    * (query_id, neighbor_id, score, rank).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     quantized: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    // cast to array<float> like every other tier (pq/ivf/Column paths):
    // an uncast array<double> input would ClassCastException per row in
    // getSeq[Float] below
    val qRows: Array[(Long, Array[Float])] = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bc = spark.sparkContext.broadcast(qRows)

    val candidates = corpus
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>")).rdd
      .mapPartitions { it =>
        val qs = bc.value
        // quantized mode pre-derives each query's integer vector and
        // self-dot once per partition
        val qQuant: Array[Array[Long]] =
          if (quantized) qs.map(q => quantize1000(q._2)) else null
        val qNb: Array[Double] =
          if (quantized) qQuant.map(q => longDot(q, q).toDouble) else null
        // per-query bounded worst-first ordering: (score asc, id desc)
        // so the head is the entry to evict
        val heaps = qs.map(_ => new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
          Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }))
        it.foreach { r =>
          val id = r.getLong(0)
          val vec = r.getSeq[Float](1).toArray
          val qv: Array[Long] = if (quantized) quantize1000(vec) else null
          val na: Double = if (quantized) longDot(qv, qv).toDouble else 0.0
          var qi = 0
          while (qi < qs.length) {
            // exclude self-matches — every other tier (SQL/LSH/IVF) does,
            // and the exact twins must return identical neighbor sets
            if (qs(qi)._1 != id) {
              val s = scorePair("bruteForceTopK", vec, qv, na, qs(qi)._2,
                if (quantized) qQuant(qi) else null,
                if (quantized) qNb(qi) else 0.0, quantized)
              val h = heaps(qi)
              if (h.size < k) h.enqueue((s, id))
              else {
                val (ws, wid) = h.head
                if (s > ws || (s == ws && id < wid)) { h.dequeue(); h.enqueue((s, id)) }
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (s, id) => Row(qs(qi)._1, id, s) }
        }
      }
    val schema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false)))
    val candDf = spark.createDataFrame(candidates, schema)
    // the final rank sorts ONLY the parts × Q × k surviving candidates
    // — never the N×Q score matrix
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    candDf.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** FILTERED exact top-k: each query searches only corpus rows whose
    * `matchCols` values equal its own — the metadata-constrained
    * vector search every retrieval stack needs ("nearest neighbors
    * within this language / license / source"). Post-filtering a
    * global top-k is WRONG at any k (a query whose match class is
    * rare can lose every neighbor to the filter); pre-filtering with
    * one scan per distinct value re-reads the corpus per class. This
    * runs ONE corpus scan: query descriptors broadcast grouped by
    * match key, each corpus row consults only the hash bucket of its
    * own key, per-(query) bounded heaps as in [[bruteForceTopK]] — no
    * N×Q matrix, no per-class rescan, match classes of any skew.
    *
    * Keys compare as canonical strings (both sides cast DF-side), so
    * an int32 label on one side and int64 on the other cannot
    * silently never-match. Same quantized scoring / rank contract as
    * [[bruteForceTopK]] — the DuckDB oracle replays it with a join
    * predicate added. */
  def filteredTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                   matchCols: Seq[String],
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   quantized: Boolean = false): DataFrame = {
    require(matchCols.nonEmpty,
      "filteredTopK: matchCols must be non-empty (use bruteForceTopK for unfiltered)")
    val spark = corpus.sparkSession
    // SQL equality semantics: a NULL match value matches NOTHING (the
    // oracle's join predicate never matches NULL) — and concat_ws
    // SKIPS null arguments, so without this filter (NULL,'mit') and
    // ('mit',NULL) would collide into one key despite the separator.
    // Null-keyed rows drop on both sides.
    // null EMBEDDINGS drop too (matching trainSample's guard): a null
    // vector can't score, and letting one through would NPE deep in
    // getSeq(...).toArray instead of behaving like the oracle's join
    // (which never matches a NULL vector row either way — cosine of
    // NULL is NULL and survives no rank filter)
    def nonNullKeys(df: DataFrame) =
      df.filter(matchCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(vecCol).isNotNull)
    // NUL separator (escaped, not a raw byte): a space would make
    // ("a b", "c") and ("a", "b c") collide into one match class for
    // multi-column keys
    def mkey(df: DataFrame) =
      concat_ws("\u0000", matchCols.map(c => col(c).cast("string")): _*)
    val qRows: Array[(Long, Array[Float], String)] = nonNullKeys(queries)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"),
        mkey(queries))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getString(2)))
    val bc = spark.sparkContext.broadcast(qRows)

    val candidates = nonNullKeys(corpus)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"),
        mkey(corpus)).rdd
      .mapPartitions { it =>
        val qs = bc.value
        val byKey: Map[String, Array[Int]] =
          qs.indices.toArray.groupBy(i => qs(i)._3)
        val qQuant: Array[Array[Long]] =
          if (quantized) qs.map(q => quantize1000(q._2)) else null
        val qNb: Array[Double] =
          if (quantized) qQuant.map(q => longDot(q, q).toDouble) else null
        val heaps = qs.map(_ => new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
          Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }))
        it.foreach { r =>
          byKey.get(r.getString(2)).foreach { qIdx =>
            val id = r.getLong(0)
            val vec = r.getSeq[Float](1).toArray
            val qv: Array[Long] = if (quantized) quantize1000(vec) else null
            val na: Double = if (quantized) longDot(qv, qv).toDouble else 0.0
            var j = 0
            while (j < qIdx.length) {
              val qi = qIdx(j)
              if (qs(qi)._1 != id) {
                val s = scorePair("filteredTopK", vec, qv, na, qs(qi)._2,
                  if (quantized) qQuant(qi) else null,
                  if (quantized) qNb(qi) else 0.0, quantized)
                val h = heaps(qi)
                if (h.size < k) h.enqueue((s, id))
                else {
                  val (ws, wid) = h.head
                  if (s > ws || (s == ws && id < wid)) { h.dequeue(); h.enqueue((s, id)) }
                }
              }
              j += 1
            }
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (s, id) => Row(qs(qi)._1, id, s) }
        }
      }
    val schema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    spark.createDataFrame(candidates, schema)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** k-NN LABEL PROPAGATION: predict a label for every query vector
    * by majority vote among its `k` nearest corpus neighbors — the
    * standard semi-supervised curation move (a few thousand
    * hand-labeled quality/topic/language examples fan out to the
    * whole corpus through embedding space; cheap, strong baseline
    * before any trained classifier).
    *
    * Determinism end to end: neighbors come from [[bruteForceTopK]]
    * in QUANTIZED scoring mode (bit-identical to the SQL window-rank
    * twin — the ann1 oracle contract), and the vote resolves ties by
    * (votes desc, best-neighbor rank asc, label asc): a 2–2 split
    * goes to the label owning the NEAREST neighbor, engines agree
    * because rank itself is deterministic. Null-labeled corpus rows
    * are excluded from voting (they can teach nothing), so a query
    * may resolve from fewer than k votes; queries are classified
    * from the corpus EXCLUDING themselves (bruteForceTopK's own
    * self-match rule — classify-the-training-set stays honest).
    *
    * Scale shape = [[bruteForceTopK]]'s: queries broadcast under the
    * ANN small-side contract, one corpus scan with per-partition
    * bounded heaps; the vote is a ≤ Q·k-row aggregate plus a
    * per-query window over ≤ distinct-label rows.
    *
    * Output: (query_id, label, votes, best_rank) — one row per query
    * with ≥ 1 labeled neighbor. */
  def knnClassify(corpus: DataFrame, queries: DataFrame, k: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  labelCol: String = "label"): DataFrame = {
    require(k > 0, s"knnClassify: k must be positive, got $k")
    require(corpus.columns.contains(labelCol),
      s"knnClassify: no label column '$labelCol' in the corpus frame")
    val top = bruteForceTopK(corpus, queries, k, idCol, vecCol,
      quantized = true)
    val labels = corpus
      .filter(col(labelCol).isNotNull)
      .select(col(idCol).cast("long").as("neighbor_id"),
        col(labelCol).as("__knn_lbl"))
    val votes = top.join(labels, "neighbor_id")
      .groupBy(col("query_id"), col("__knn_lbl"))
      .agg(count(lit(1)).as("votes"), min(col("rank")).as("best_rank"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("votes").desc, col("best_rank").asc, col("__knn_lbl").asc)
    votes.withColumn("__knn_rn", row_number().over(w))
      .filter(col("__knn_rn") === 1)
      .select(col("query_id"), col("__knn_lbl").as(labelCol),
        col("votes"), col("best_rank"))
  }

  /** Spark's `round(x*1000.0, 0)` for doubles, scalar twin:
    * BigDecimal.valueOf (Double.toString repr) + HALF_UP — the exact
    * semantics of Catalyst's Round, so quantized heap scores match the
    * SQL twin bit-for-bit. */
  private[graft] def quantize1000(v: Array[Float]): Array[Long] = {
    val out = new Array[Long](v.length)
    var i = 0
    while (i < v.length) {
      out(i) = java.math.BigDecimal.valueOf(v(i).toDouble * 1000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      i += 1
    }
    out
  }

  private[graft] def longDot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Micro-quantized cosine: floor(cos·10⁶ + 0.5) over the ×1000
    * integer dots, cos = d / (√na·√nb). Every step (integer dots →
    * double, sqrt, divide, multiply, +0.5, floor) is one correctly-
    * rounded IEEE op, so any engine replays the value bit-for-bit —
    * floor(x+0.5), NOT round(), because round-half semantics differ
    * across engines at negative halves while floor never does.
    * Zero-norm vectors score 0 by contract. */
  private def microCos(d: Long, na: Long, nb: Long): Long =
    if (na == 0L || nb == 0L) 0L
    else math.floor(
      d.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
        * 1000000.0 + 0.5).toLong

  /** Margin-based nearest-match mining (the ratio margin of Artetxe &
    * Schwenk, "Margin-based Parallel Corpus Mining", ACL 2019): for
    * each query x, the best corpus match y by
    *
    *   margin(x,y) = cos(x,y) / ((avgFwd(x) + avgBwd(y)) / 2)
    *
    * where avgFwd(x) = mean cosine over x's k nearest corpus rows and
    * avgBwd(y) = mean cosine over y's k nearest QUERY rows; matches
    * with margin below `minMargin` (or a non-positive denominator —
    * an anti-correlated neighborhood has no meaningful margin) are
    * dropped. The margin normalizes each pair by how "hubby" both
    * endpoints are: raw cosine thresholds over-select hub vectors
    * that are near everything, the classic failure of
    * cosine-threshold bitext/pair mining.
    *
    * Output: (query_id, match_id, cos, margin) — at most one row per
    * query. Rows whose ids collide across the two sides never match
    * themselves (the [[bruteForceTopK]] self-exclusion contract).
    *
    * Scale shape: `queries` is the SMALL side (the broadcast-join
    * contract of [[bruteForceTopK]]) — collected once and shipped per
    * executor; the corpus streams through ONE scan that computes the
    * Q micro-quantized cosines per row and feeds (a) per-query
    * forward bounded heaps and (b) that same row's backward top-k
    * statistic over the query set — the backward pass costs nothing
    * extra because the Q cosines are already in hand. Only
    * parts × Q × k candidate tuples ever leave the scan; no N×Q
    * matrix, no corpus shuffle. For corpus×corpus mining at 100 TB,
    * run per query-shard — each shard is one scan — or feed ANN
    * shortlists ([[ivfPqTopK]]) as the candidate source and rescore.
    *
    * Exactness: cosines are micro-quantized ([[microCos]]) and the
    * margin is ONE double division of exactly-represented integers —
    * margin = 2·nF·nB·cosq / (nB·sumF + nF·sumB), the paper's formula
    * when both neighbor lists are full (nF = nB = k) and the
    * count-weighted generalization when the corpus or query side has
    * fewer than k rows — so a SQL oracle replays result AND rank
    * order bit-for-bit. */
  def marginMine(corpus: DataFrame, queries: DataFrame, k: Int,
                 minMargin: Double = 1.0,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"marginMine: k must be >= 1, got $k")
    val spark = corpus.sparkSession
    val qRows: Array[(Long, Array[Long])] = queries
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .collect()
      .map(r => (r.getLong(0), quantize1000(r.getSeq[Float](1).toArray)))
    val bc = spark.sparkContext.broadcast(qRows)

    val candidates = corpus
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>")).rdd
      .mapPartitions { it =>
        val qs = bc.value
        val qNb: Array[Long] = qs.map(q => longDot(q._2, q._2))
        // forward heaps: worst-first (lowest cosq, then largest id at
        // the head) per query; entries carry the candidate's backward
        // statistic so it never needs a second corpus pass
        val heaps = qs.map(_ => new scala.collection.mutable.PriorityQueue[(Long, Long, Long, Long)]()(
          Ordering.by[(Long, Long, Long, Long), (Long, Long)] {
            case (cq, id, _, _) => (-cq, id)
          }))
        val cosRow = new Array[Long](qs.length)
        it.foreach { r =>
          val id = r.getLong(0)
          val qv = quantize1000(r.getSeq[Float](1).toArray)
          val na = longDot(qv, qv)
          var qi = 0
          while (qi < qs.length) {
            cosRow(qi) =
              if (qs(qi)._1 == id) Long.MinValue // self: excluded both directions
              else microCos(longDot(qv, qs(qi)._2), na, qNb(qi))
            qi += 1
          }
          // backward top-k over this row's query cosines (selection by
          // partial sort of a copy — Q is broadcast-small by contract)
          val sorted = cosRow.filter(_ != Long.MinValue).sorted(Ordering[Long].reverse)
          val bCnt = math.min(k, sorted.length)
          var bSum = 0L; var bi = 0
          while (bi < bCnt) { bSum += sorted(bi); bi += 1 }
          qi = 0
          while (qi < qs.length) {
            val cq = cosRow(qi)
            if (cq != Long.MinValue) {
              val h = heaps(qi)
              if (h.size < k) h.enqueue((cq, id, bSum, bCnt.toLong))
              else {
                val (wc, wid, _, _) = h.head
                if (cq > wc || (cq == wc && id < wid)) {
                  h.dequeue(); h.enqueue((cq, id, bSum, bCnt.toLong))
                }
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (cq, id, bSum, bCnt) =>
            Row(qs(qi)._1, id, cq, bSum, bCnt)
          }
        }
      }
    val schema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("match_id", LongType, nullable = false),
      StructField("cosq", LongType, nullable = false),
      StructField("bwd_sum", LongType, nullable = false),
      StructField("bwd_cnt", LongType, nullable = false)))
    val candDf = spark.createDataFrame(candidates, schema)

    // global forward top-k (merges the per-partition heaps), then the
    // forward sums — everything below operates on ≤ parts·Q·k rows
    val wFwd = Window.partitionBy("query_id")
      .orderBy(col("cosq").desc, col("match_id").asc)
    val topk = candDf.withColumn("__r", row_number().over(wFwd))
      .filter(col("__r") <= k)
    val fwd = topk.groupBy("query_id")
      .agg(sum(col("cosq")).as("fwd_sum"), count(lit(1)).as("fwd_cnt"))
    val num = lit(2L) * col("fwd_cnt") * col("bwd_cnt") * col("cosq")
    val den = col("bwd_cnt") * col("fwd_sum") + col("fwd_cnt") * col("bwd_sum")
    val wBest = Window.partitionBy("query_id")
      .orderBy(col("margin").desc, col("match_id").asc)
    topk.join(fwd, Seq("query_id"))
      .filter(den > 0L)
      .withColumn("margin", num.cast("double") / den.cast("double"))
      .withColumn("__b", row_number().over(wBest))
      .filter(col("__b") === 1 && col("margin") >= minMargin)
      .select(col("query_id"), col("match_id"),
        (col("cosq").cast("double") / lit(1000000.0)).as("cos"),
        col("margin"))
  }

  /** Exact top-k, fully declarative: broadcast-nested-loop score +
    * window rank. Scores are computed on integer-quantized vectors
    * (x→round(1000x)) so the ranking key sign(d)·d²/(|a|²|b|²) is an
    * exact-integer-derived double — bit-identical in any IEEE engine,
    * which makes the result independently verifiable by SQL oracle.
    */
  def bruteForceTopKSql(corpus: DataFrame, queries: DataFrame, k: Int,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def quant(c: org.apache.spark.sql.Column) =
      transform(c, x => round(x.cast("double") * 1000.0, 0).cast("long"))
    def idot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

    val c = corpus.select(col(idCol).as("neighbor_id"), quant(col(vecCol)).as("qv"))
    val q = queries.select(col(idCol).as("query_id"), quant(col(vecCol)).as("qq"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("d", idot(col("qv"), col("qq")).cast("double"))
      .withColumn("na", idot(col("qv"), col("qv")).cast("double"))
      .withColumn("nb", idot(col("qq"), col("qq")).cast("double"))
      .withColumn("score",
        when(col("na") === 0 || col("nb") === 0, lit(0.0))
          .otherwise(signum(col("d")) * col("d") * col("d") / (col("na") * col("nb"))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
  }

  /** IVF (inverted-file) top-k: a seeded KMeans coarse quantizer
    * partitions the corpus into `nCells` cells; each query probes only
    * its `nProbe` nearest cells, then exact cosine + rank within those
    * candidates. The classic trade: recall grows with nProbe, compute
    * shrinks by ~nCells/nProbe versus brute force.
    *
    * Scale: training samples the corpus (KMeans on the full 100 TB is
    * pointless — centroids converge on a sample); assignment is one
    * scan with a broadcast centroid array; the search side shuffles
    * only (query, cell) candidates. Identical vectors always share a
    * cell, so exact-duplicate recall is 1.0 by construction.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L,
              trainFraction: Double = 1.0, maxTrainRows: Int = 16384,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession

    // Coarse-quantizer training runs DRIVER-side on a bounded sample:
    // a 16–256-centroid Lloyd's over ≤16k vectors is milliseconds of
    // local compute, versus ~25 distributed jobs (k-means|| init + 20
    // iterations) for spark.ml KMeans whose per-job overhead dwarfs
    // the arithmetic at any scale — centroids converge on a sample
    // regardless of corpus size.
    val train = trainSample(corpus, vecCol, trainFraction, maxTrainRows, seed)
    val centers = lloydKMeans(train, nCells, iters = 15, seed)
    val bc = spark.sparkContext.broadcast(centers)

    val cellOf = udf { (v: Seq[Float]) =>
      val cs = bc.value
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        val cv = cs(c)
        // early exit: non-negative terms, so a partial sum at bestD can
        // never win — the winner's sum always runs to completion, so the
        // chosen cell is bit-identical (the lloydKMeans d2 discipline)
        while (i < v.length && d < bestD) { val t = v(i) - cv(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    val probesOf = udf { (v: Seq[Float]) =>
      val cs = bc.value
      cs.indices.map { c =>
        var d = 0.0; var i = 0
        val cv = cs(c)
        while (i < v.length) { val t = v(i) - cv(i); d += t * t; i += 1 }
        (d, c)
      }.sortBy(_._1).take(nProbe).map(_._2)
    }

    val cells = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cell", cellOf(col("cv")))
    val probed = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("cell", explode(probesOf(col("qv"))))
    val cand = cells.join(broadcast(probed), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", vecfns.cosine(col("cv"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Bounded driver-side training sample for codebook/centroid
    * estimation.
    *
    * With the default `trainFraction = 1.0` the sample is made uniform
    * AUTOMATICALLY when the corpus exceeds `maxTrainRows`: a bare
    * `limit` would take the first rows in file order, and on a corpus
    * sorted or clustered by content that trains biased codebooks
    * (unbalanced IVF cells, poor PQ quantization). The size probe is
    * one count() over the id-only projection — parquet-metadata cheap
    * — and the sample oversamples 4× before the limit so the draw
    * reaches `maxTrainRows` with near-certainty. Callers that know
    * their corpus size can still pass an explicit `trainFraction` and
    * skip the probe. */
  private[graft] def trainSample(corpus: DataFrame, vecCol: String,
                          trainFraction: Double, maxTrainRows: Int,
                          seed: Long): Array[Array[Float]] = {
    val base =
      if (trainFraction < 1.0)
        corpus.sample(withReplacement = false, trainFraction, seed)
      else {
        val n = corpus.count()
        if (n <= maxTrainRows) corpus
        else corpus.sample(withReplacement = false,
          math.min(1.0, maxTrainRows * 4.0 / n), seed)
      }
    // shuffle BEFORE the limit: CollectLimit drains partitions in
    // order, so `sample.limit(max)` would keep only the sampled rows
    // from the FIRST partitions — reintroducing the head-of-table bias
    // the uniform sample exists to remove. The rand sort touches only
    // the ~4×maxTrainRows sampled rows, not the corpus.
    // null vectors are unscoreable rows, not training signal — without
    // this filter a single null landing in the sample NPEs the
    // driver-side toArray below before any caller-side null handling
    base.select(col(vecCol).cast("array<float>"))
      .filter(col(vecCol).isNotNull)
      .orderBy(rand(seed + 1)).limit(maxTrainRows)
      .collect().map(_.getSeq[Float](0).toArray)
  }

  /** Deterministic k-means++ seeding + Lloyd's iterations, local.
    * Empty clusters keep their previous center. Double accumulation,
    * float centroids (matching the stored embedding precision). */
  private[graft] def lloydKMeans(points: Array[Array[Float]], k: Int,
                                      iters: Int, seed: Long): Array[Array[Float]] = {
    require(points.nonEmpty, "ivf: empty training sample")
    val dim = points(0).length
    val rnd = new java.util.Random(seed)
    // bounded distance: stops accumulating once the partial sum
    // reaches `bound`. EXACT for argmin/under-bound tests — terms are
    // non-negative, so a partial ≥ bound implies the total is too, and
    // a completed sum is the full IEEE-identical value. Halves the
    // assignment work at k=16 without moving a single centroid bit.
    def d2(a: Array[Float], b: Array[Float],
           bound: Double = Double.MaxValue): Double = {
      var s = 0.0; var i = 0
      while (i < dim && s < bound) {
        val t = a(i).toDouble - b(i); s += t * t; i += 1
      }
      s
    }
    // k-means++: first center uniform, then proportional to d² to the
    // nearest chosen center
    val kk = math.min(k, points.length)
    val centers = Array.ofDim[Array[Float]](kk)
    centers(0) = points(rnd.nextInt(points.length)).clone()
    val minD2 = points.map(p => d2(p, centers(0)))
    var c = 1
    while (c < kk) {
      val total = minD2.sum
      var pick = points.length - 1
      if (total > 0) {
        var r = rnd.nextDouble() * total
        var i = 0
        while (i < points.length && r >= 0) { r -= minD2(i); if (r < 0) pick = i; i += 1 }
      }
      centers(c) = points(pick).clone()
      var i = 0
      while (i < points.length) {
        val d = d2(points(i), centers(c), minD2(i))
        if (d < minD2(i)) minD2(i) = d
        i += 1
      }
      c += 1
    }
    // Lloyd's
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      var i = 0
      while (i < points.length) {
        val p = points(i)
        var best = 0; var bestD = Double.MaxValue; var ci = 0
        while (ci < kk) {
          val d = d2(p, centers(ci), bestD)
          if (d < bestD) { bestD = d; best = ci }
          ci += 1
        }
        counts(best) += 1
        val s = sums(best)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        i += 1
      }
      var ci = 0
      while (ci < kk) {
        if (counts(ci) > 0) {
          val s = sums(ci); val n = counts(ci).toDouble
          val nc = new Array[Float](dim)
          var j = 0
          while (j < dim) { nc(j) = (s(j) / n).toFloat; j += 1 }
          centers(ci) = nc
        }
        ci += 1
      }
      it += 1
    }
    centers
  }

  /** Final ranking shared by the PQ tiers — either rank the ADC
    * candidates directly (`rerank` = 0), or exact-rerank refinement
    * (the IVFADC+R shape): keep the top-`rerank` ADC shortlist per
    * query, re-score it EXACTLY (squared L2 against the raw vectors)
    * and re-rank. Recall then depends on shortlist MEMBERSHIP (did the
    * true neighbor survive into the top-`rerank` by code distance —
    * much weaker than needing codes to order the top-k correctly),
    * not on code granularity. Cost at scale: the ≤ `rerank`·Q-row
    * shortlist broadcasts into ONE extra column-pruned (id, vector)
    * corpus scan — the raw vectors stay in storage, exactly the
    * IVFADC+R storage discipline; nothing quadratic, no corpus
    * shuffle. After a rerank, `approx_dist` holds the EXACT squared
    * L2 of the surviving candidates (the column name is the stable
    * schema contract across the ANN tiers; clamped at 0 against
    * float cancellation on near-identical vectors). */
  private def rankPqCandidates(corpus: DataFrame, queries: DataFrame,
      candDf: DataFrame, k: Int, rerank: Int,
      idCol: String, vecCol: String): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("approx_dist").asc, col("neighbor_id").asc)
    if (rerank <= 0) {
      candDf.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "approx_dist")
    } else {
      val short = candDf.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= rerank)
        .select("query_id", "neighbor_id")
      val qv = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<float>").as("__qv"))
      val exact = corpus
        .select(col(idCol).cast("long").as("neighbor_id"),
          col(vecCol).cast("array<float>").as("__nv"))
        .join(broadcast(short), Seq("neighbor_id"))
        .join(broadcast(qv), Seq("query_id"))
        .withColumn("approx_dist", greatest(lit(0.0),
          GraftFunctions.graft_dot(col("__nv"), col("__nv"))
            - lit(2.0) * GraftFunctions.graft_dot(col("__nv"), col("__qv"))
            + GraftFunctions.graft_dot(col("__qv"), col("__qv"))))
      exact.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "approx_dist")
    }
  }

  /** Product-quantization top-k by asymmetric distance (ADC).
    *
    * The memory-bound scale path: the corpus is held as m sub-codes
    * (m bytes/vector vs 4·dim — a 32× compression at dim=64/m=8), so a
    * 100 TB float corpus becomes ~3 TB of codes that fit executor
    * memory where raw vectors cannot. Sub-codebooks (m × ksub × dim/m)
    * train driver-side on a bounded sample — see [[lloydKMeans]];
    * encoding is one scan; search builds per-query lookup tables ONCE
    * per partition (the ADC trick: m·ksub partial distances per query,
    * amortized over every row in the partition) and streams codes
    * through bounded per-query heaps exactly like [[bruteForceTopK]].
    *
    * Output: (query_id, rank, neighbor_id, approx_dist) — approximate
    * squared L2, ascending. Identical vectors share codes, so an exact
    * duplicate attains the minimal ADC distance (the query's own
    * quantization residual) and ranks first.
    *
    * `rerank > 0` enables the exact-rerank refinement (IVFADC+R
    * shape): the ADC pass keeps a shortlist of `rerank` ≥ k candidates
    * per query, which is then re-scored EXACTLY against the raw
    * vectors and re-ranked — recall becomes bounded by shortlist
    * membership rather than code granularity, for one extra targeted
    * (id, vector) corpus scan. See [[rankPqCandidates]].
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 8, ksub: Int = 16, rerank: Int = 0, seed: Long = 42L,
             trainFraction: Double = 1.0, maxTrainRows: Int = 16384,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    require(rerank == 0 || rerank >= k,
      s"pq: rerank=$rerank must be 0 (off) or >= k=$k — a shortlist smaller " +
        "than k cannot produce k reranked results")
    val shortK = if (rerank > 0) rerank else k
    val train = trainSample(corpus, vecCol, trainFraction, maxTrainRows, seed)
    require(train.nonEmpty, "pq: empty training sample")
    require(ksub >= 2 && ksub <= 256,
      s"pq: ksub=$ksub — codes are stored as one byte per subspace, so at " +
        "most 256 sub-centroids (values past 255 would silently wrap and " +
        "score against the wrong LUT entries)")
    val dim = train(0).length
    require(dim % m == 0, s"pq: dim $dim not divisible by m=$m")
    val sub = dim / m
    // per-subspace codebooks over the sample's subvectors
    val codebooks: Array[Array[Array[Float]]] = Array.tabulate(m) { j =>
      val subVecs = train.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      lloydKMeans(subVecs, ksub, iters = 15, seed + j)
    }
    val bcCb = spark.sparkContext.broadcast(codebooks)

    val encode = udf { (v: Seq[Float]) =>
      val cb = bcCb.value
      val codes = new Array[Byte](m)
      var j = 0
      while (j < m) {
        val cbj = cb(j)
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < cbj.length) {
          var d = 0.0; var i = 0
          val cv = cbj(c)
          while (i < sub && d < bestD) { val t = v(j * sub + i) - cv(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        codes(j) = best.toByte
        j += 1
      }
      codes
    }

    val qRows: Array[(Long, Array[Float])] = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bcQ = spark.sparkContext.broadcast(qRows)

    val encoded = corpus.select(col(idCol).cast("long").as("id"),
      encode(col(vecCol).cast("array<float>")).as("codes"))
    val candidates = encoded.rdd.mapPartitions { it =>
      val qs = bcQ.value
      val cb = bcCb.value
      // ADC lookup tables: lut(q)(j*ksub + c) = ||q_sub_j - cb(j)(c)||²
      val luts = qs.map { case (_, qv) =>
        val lut = new Array[Double](m * ksub)
        var j = 0
        while (j < m) {
          val cbj = cb(j)
          var c = 0
          while (c < cbj.length) {
            var d = 0.0; var i = 0
            val cv = cbj(c)
            while (i < sub) { val t = qv(j * sub + i) - cv(i); d += t * t; i += 1 }
            lut(j * ksub + c) = d
            c += 1
          }
          j += 1
        }
        lut
      }
      // worst-first heaps: head = (largest dist, largest id) to evict —
      // natural (d, id) max-ordering, so distance ties evict the
      // largest id, keeping bottom-k by (dist asc, id asc)
      val heaps = qs.map(_ => new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
        Ordering.by[(Double, Long), (Double, Long)](identity)))
      it.foreach { r =>
        val id = r.getLong(0)
        val codes = r.getAs[Array[Byte]](1)
        var qi = 0
        while (qi < qs.length) {
          if (qs(qi)._1 != id) {
            val lut = luts(qi)
            var d = 0.0; var j = 0
            while (j < m) { d += lut(j * ksub + (codes(j) & 0xFF)); j += 1 }
            val h = heaps(qi)
            if (h.size < shortK) h.enqueue((d, id))
            else {
              val (wd, wid) = h.head
              if (d < wd || (d == wd && id < wid)) { h.dequeue(); h.enqueue((d, id)) }
            }
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (d, id) => Row(qs(qi)._1, id, d) }
      }
    }
    val schema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false),
      StructField("approx_dist", DoubleType, nullable = false)))
    rankPqCandidates(corpus, queries,
      spark.createDataFrame(candidates, schema), k, rerank, idCol, vecCol)
  }

  /** IVF-PQ top-k: the combined billion-scale tier — IVF's candidate
    * restriction (probe `nProbe` of `nCells` cells) AND PQ's memory
    * compression (m-byte residual codes instead of 4·dim-byte
    * vectors), completing the ladder flat → LSH → IVF → PQ → IVF-PQ.
    *
    * Classic residual quantization: each corpus vector stores (cell,
    * PQ codes of v − centroid[cell]); a query probing cell c builds an
    * ADC lookup table against (q − centroid[c]) — one table per
    * (query, probed cell), m·ksub entries, built once per partition
    * and amortized over every row in it. Scan-side work per row is
    * m LUT adds for the queries probing that row's cell; rows in
    * unprobed cells cost one array lookup. Bounded per-query heaps as
    * in [[pqTopK]]; the final rank sorts only parts × Q × k
    * candidates. `rerank > 0` adds the exact-rerank refinement
    * (IVFADC+R) — see [[rankPqCandidates]].
    *
    * Output: (query_id, rank, neighbor_id, approx_dist) — approximate
    * squared L2 ascending. An exact duplicate of the query lands in
    * the query's nearest cell with the query's own residual codes, so
    * it attains the minimal ADC distance and ranks first — recall on
    * identical twins is ≥ the IVF-alone tier at equal probe budget
    * (pinned by AnnSpec).
    */
  /** Trained IVF-PQ model: coarse centroids + per-subspace RESIDUAL
    * codebooks. Deterministic for (corpus, params, seed) — both the
    * inline [[ivfPqTopK]] and the persisted-index pair
    * [[buildIvfPqIndex]]/[[ivfPqTopKIndexed]] go through this one
    * trainer and one encoder, so indexed ≡ fresh by construction. */
  private[graft] final case class IvfPqModel(
      centers: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]],
      m: Int, ksub: Int) {
    val dim: Int = centers(0).length
    val sub: Int = dim / m
  }

  private def trainIvfPqModel(corpus: DataFrame, nCells: Int, m: Int,
      ksub: Int, seed: Long, trainFraction: Double, maxTrainRows: Int,
      vecCol: String): IvfPqModel = {
    val train = trainSample(corpus, vecCol, trainFraction, maxTrainRows, seed)
    require(train.nonEmpty, "ivfpq: empty training sample")
    require(ksub >= 2 && ksub <= 256,
      s"ivfpq: ksub=$ksub — byte codes cap sub-centroids at 256 (wrap would " +
        "silently score against the wrong LUT entries)")
    val dim = train(0).length
    require(dim % m == 0, s"ivfpq: dim $dim not divisible by m=$m")
    val sub = dim / m
    val centers = lloydKMeans(train, nCells, iters = 15, seed)
    def nearestCell(v: Array[Float]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < centers.length) {
        var d = 0.0; var i = 0
        val cv = centers(c)
        while (i < dim && d < bestD) { val t = v(i).toDouble - cv(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    def residual(v: Array[Float], cell: Int): Array[Float] = {
      val cv = centers(cell)
      val r = new Array[Float](dim)
      var i = 0
      while (i < dim) { r(i) = v(i) - cv(i); i += 1 }
      r
    }
    // sub-codebooks over training RESIDUALS (the quantities encoded)
    val residuals = train.map(v => residual(v, nearestCell(v)))
    val codebooks: Array[Array[Array[Float]]] = Array.tabulate(m) { j =>
      val subVecs = residuals.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      lloydKMeans(subVecs, ksub, iters = 15, seed + j)
    }
    IvfPqModel(centers, codebooks, m, ksub)
  }

  /** The model's two broadcast handles — created ONCE per operator
    * call and passed to every stage that needs them (encode + search
    * in the inline path), not re-broadcast per stage: broadcasts live
    * until context shutdown, so duplicates pin doubled driver/
    * BlockManager bookkeeping for the whole session. */
  private def broadcastModel(spark: SparkSession, model: IvfPqModel):
      (org.apache.spark.broadcast.Broadcast[Array[Array[Float]]],
       org.apache.spark.broadcast.Broadcast[Array[Array[Array[Float]]]]) =
    (spark.sparkContext.broadcast(model.centers),
      spark.sparkContext.broadcast(model.codebooks))

  /** One scan: cell assignment + residual PQ encoding together →
    * (id, cell, codes). */
  private def ivfPqEncode(corpus: DataFrame, model: IvfPqModel,
      bc: (org.apache.spark.broadcast.Broadcast[Array[Array[Float]]],
           org.apache.spark.broadcast.Broadcast[Array[Array[Array[Float]]]]),
      idCol: String, vecCol: String): DataFrame = {
    val m = model.m; val sub = model.sub
    val (bcCenters, bcCb) = bc
    val encode = udf { (v: Seq[Float]) =>
      val cs = bcCenters.value; val cb = bcCb.value
      val vv = v.toArray
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        val cv = cs(c)
        while (i < vv.length && d < bestD) { val t = vv(i) - cv(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      val cv = cs(best)
      val codes = new Array[Byte](m)
      var j = 0
      while (j < m) {
        val cbj = cb(j)
        var bc = 0; var bcD = Double.MaxValue; var ci = 0
        while (ci < cbj.length) {
          var d = 0.0; var i = 0
          val e = cbj(ci)
          while (i < sub) {
            val t = (vv(j * sub + i) - cv(j * sub + i)) - e(i); d += t * t; i += 1
          }
          if (d < bcD) { bcD = d; bc = ci }
          ci += 1
        }
        codes(j) = bc.toByte
        j += 1
      }
      (best, codes)
    }
    corpus.select(col(idCol).cast("long").as("id"),
      encode(col(vecCol).cast("array<float>")).as("cc"))
      .select(col("id"), col("cc._1").as("cell"), col("cc._2").as("codes"))
  }

  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nCells: Int = 16, nProbe: Int = 4,
                m: Int = 8, ksub: Int = 16, rerank: Int = 0, seed: Long = 42L,
                trainFraction: Double = 1.0, maxTrainRows: Int = 16384,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(rerank == 0 || rerank >= k,
      s"ivfpq: rerank=$rerank must be 0 (off) or >= k=$k — a shortlist " +
        "smaller than k cannot produce k reranked results")
    val model = trainIvfPqModel(corpus, nCells, m, ksub, seed,
      trainFraction, maxTrainRows, vecCol)
    val bc = broadcastModel(corpus.sparkSession, model)
    val encoded = ivfPqEncode(corpus, model, bc, idCol, vecCol)
    ivfPqSearchStage(encoded, corpus, queries, model, bc, k, nProbe, nCells,
      rerank, idCol, vecCol)
  }

  /** ADC scan + rank over a pre-encoded (id, cell, codes) frame —
    * shared by the inline and persisted-index paths. Rows whose cell
    * no query probes contribute nothing (slot −1), which is why the
    * indexed path may prune them from the scan entirely. */
  private def ivfPqSearchStage(encoded: DataFrame, corpus: DataFrame,
      queries: DataFrame, model: IvfPqModel,
      bc: (org.apache.spark.broadcast.Broadcast[Array[Array[Float]]],
           org.apache.spark.broadcast.Broadcast[Array[Array[Array[Float]]]]),
      k: Int, nProbe: Int,
      nCells: Int, rerank: Int, idCol: String, vecCol: String): DataFrame = {
    val spark = corpus.sparkSession
    val shortK = if (rerank > 0) rerank else k
    val m = model.m; val ksub = model.ksub
    val sub = model.sub; val dim = model.dim
    val (bcCenters, bcCb) = bc
    val qRows: Array[(Long, Array[Float])] = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bcQ = spark.sparkContext.broadcast(qRows)
    val probeCount = math.min(nProbe, nCells)

    val candidates = encoded.rdd.mapPartitions { it =>
      val qs = bcQ.value
      val cs = bcCenters.value
      val cb = bcCb.value
      // per query: probed cells (nearest probeCount centroids) and one
      // ADC LUT per probed cell against the query's residual there
      val probes: Array[Array[Int]] = qs.map { case (_, qv) =>
        cs.indices.map { c =>
          var d = 0.0; var i = 0
          val cv = cs(c)
          while (i < dim) { val t = qv(i).toDouble - cv(i); d += t * t; i += 1 }
          (d, c)
        }.sortBy(_._1).take(probeCount).map(_._2).toArray
      }
      // slotOf(qi)(cell) = LUT slot, or -1 when the query skips the cell
      val slotOf: Array[Array[Int]] = probes.map { ps =>
        val a = Array.fill(cs.length)(-1)
        var s = 0
        while (s < ps.length) { a(ps(s)) = s; s += 1 }
        a
      }
      val luts: Array[Array[Array[Double]]] = qs.indices.map { qi =>
        val qv = qs(qi)._2
        probes(qi).map { cell =>
          val cv = cs(cell)
          val lut = new Array[Double](m * ksub)
          var j = 0
          while (j < m) {
            val cbj = cb(j)
            var ci = 0
            while (ci < cbj.length) {
              var d = 0.0; var i = 0
              val e = cbj(ci)
              while (i < sub) {
                val t = (qv(j * sub + i) - cv(j * sub + i)) - e(i); d += t * t; i += 1
              }
              lut(j * ksub + ci) = d
              ci += 1
            }
            j += 1
          }
          lut
        }
      }.toArray
      val heaps = qs.map(_ => new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
        Ordering.by[(Double, Long), (Double, Long)](identity)))
      it.foreach { r =>
        val id = r.getLong(0)
        val cell = r.getInt(1)
        val codes = r.getAs[Array[Byte]](2)
        var qi = 0
        while (qi < qs.length) {
          val slot = slotOf(qi)(cell)
          if (slot >= 0 && qs(qi)._1 != id) {
            val lut = luts(qi)(slot)
            var d = 0.0; var j = 0
            while (j < m) { d += lut(j * ksub + (codes(j) & 0xFF)); j += 1 }
            val h = heaps(qi)
            if (h.size < shortK) h.enqueue((d, id))
            else {
              val (wd, wid) = h.head
              if (d < wd || (d == wd && id < wid)) { h.dequeue(); h.enqueue((d, id)) }
            }
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (d, id) => Row(qs(qi)._1, id, d) }
      }
    }
    val schema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false),
      StructField("approx_dist", DoubleType, nullable = false)))
    rankPqCandidates(corpus, queries,
      spark.createDataFrame(candidates, schema), k, rerank, idCol, vecCol)
  }

  /** Build and PERSIST an IVF-PQ index: train once, encode once,
    * write once — every later query batch pays an index scan instead
    * of retraining codebooks and re-encoding the corpus (the dd14
    * incremental pattern applied to vector search; at 100 TB the
    * encode pass is the dominant cost and amortizing it across query
    * batches is the production deployment shape).
    *
    * Layout under `dir`:
    *  - `codes/` — (id, codes) parquet PARTITIONED BY the IVF cell:
    *    a query batch probing p of nCells cells reads only those
    *    partition directories (Spark partition pruning on the scan —
    *    plan-asserted in AnnSpec), so probe selectivity becomes I/O
    *    selectivity, which the inline path cannot offer;
    *  - `codebooks/` — the model, a few KB: one row per coarse
    *    centroid (kind 0) and per sub-codebook entry (kind 1), plus
    *    the params string `nCells/m/ksub/seed/dim` on every row —
    *    [[ivfPqTopKIndexed]] refuses parameter drift loudly, the
    *    params-guard discipline of the dedup signature index.
    *
    * Training and encoding are the SAME code as [[ivfPqTopK]]
    * (one trainer, one encoder), so querying the index reproduces the
    * inline result row-for-row at equal parameters — spec-pinned. */
  def buildIvfPqIndex(corpus: DataFrame, dir: String,
                      nCells: Int = 16, m: Int = 8, ksub: Int = 16,
                      seed: Long = 42L, trainFraction: Double = 1.0,
                      maxTrainRows: Int = 16384,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    val model = trainIvfPqModel(corpus, nCells, m, ksub, seed,
      trainFraction, maxTrainRows, vecCol)
    val params = s"$nCells/$m/$ksub/$seed/${model.dim}"
    val cbRows =
      model.centers.zipWithIndex.map { case (v, c) =>
        (0, c, 0, v.toSeq, params)
      } ++
      model.codebooks.zipWithIndex.flatMap { case (cbj, j) =>
        cbj.zipWithIndex.map { case (v, ci) => (1, j, ci, v.toSeq, params) }
      }
    import spark.implicits._
    cbRows.toSeq.toDF("kind", "idx1", "idx2", "vec", "params")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    ivfPqEncode(corpus, model, broadcastModel(spark, model), idCol, vecCol)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
  }

  /** [[ivfPqTopK]] against a prebuilt [[buildIvfPqIndex]] directory —
    * no training, no encode pass: the model loads from `codebooks/`
    * (KBs), the query batch's probe-cell UNION is computed
    * driver-side against the loaded centroids, and the `codes/` scan
    * is FILTERED to those cells — partition pruning turns probe
    * selectivity into I/O selectivity (rows in unprobed cells would
    * score nothing anyway, so pruning them is result-invariant).
    * `corpus` supplies raw vectors for the exact rerank stage only
    * (`rerank = 0` never reads it). Row-identical to the inline path
    * at equal (params, seed) by shared-trainer construction;
    * parameter drift against the stored params string fails loudly. */
  def ivfPqTopKIndexed(spark: SparkSession, dir: String,
                       queries: DataFrame, corpus: DataFrame, k: Int,
                       nCells: Int = 16, nProbe: Int = 4,
                       m: Int = 8, ksub: Int = 16, rerank: Int = 0,
                       seed: Long = 42L,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    require(rerank == 0 || rerank >= k,
      s"ivfpq-indexed: rerank=$rerank must be 0 (off) or >= k=$k")
    val cbDf = spark.read.parquet(s"$dir/codebooks")
    val rows = cbDf.select("kind", "idx1", "idx2", "vec", "params").collect()
    require(rows.nonEmpty, s"ivfpq-indexed: empty codebooks at $dir")
    val storedParams = rows(0).getString(4)
    val centers = rows.filter(_.getInt(0) == 0).sortBy(_.getInt(1))
      .map(_.getSeq[Float](3).toArray)
    val dim = centers(0).length
    val want = s"$nCells/$m/$ksub/$seed/$dim"
    require(storedParams == want,
      s"ivfpq-indexed: index at $dir was built with params $storedParams, " +
        s"query side uses $want — rebuild the index or match the parameters")
    val codebooks = Array.tabulate(m) { j =>
      rows.filter(r => r.getInt(0) == 1 && r.getInt(1) == j)
        .sortBy(_.getInt(2)).map(_.getSeq[Float](3).toArray)
    }
    val model = IvfPqModel(centers, codebooks, m, ksub)
    // union of every query's probe set, computed driver-side against
    // the loaded centroids — the codes scan reads ONLY these cells
    val probeCount = math.min(nProbe, nCells)
    val qVecs = queries.select(col(vecCol).cast("array<float>"))
      .filter(col(vecCol).isNotNull)
      .collect().map(_.getSeq[Float](0).toArray)
    val probedCells: Array[Int] = qVecs.flatMap { qv =>
      centers.indices.map { c =>
        var d = 0.0; var i = 0
        val cv = centers(c)
        while (i < dim) { val t = qv(i).toDouble - cv(i); d += t * t; i += 1 }
        (d, c)
      }.sortBy(_._1).take(probeCount).map(_._2)
    }.distinct.sorted
    val encoded = spark.read.parquet(s"$dir/codes")
      .filter(col("cell").isin(probedCells.map(Integer.valueOf): _*))
      .select("id", "cell", "codes")
    ivfPqSearchStage(encoded, corpus, queries, model,
      broadcastModel(spark, model), k, nProbe, nCells,
      rerank, idCol, vecCol)
  }

  /** Approximate top-k: SRP-LSH bucket join (multi-table for recall)
    * restricts candidates, then exact cosine + rank within candidates.
    *
    * `probes > 1` enables query-directed multiprobe: each query also
    * joins the buckets reached by flipping its `probes − 1`
    * lowest-|margin| hyperplane bits per table. Probing is strictly
    * QUERY-side — the corpus index stays one bucket per table, so
    * recall grows (candidate superset ⇒ monotone, spec-pinned)
    * without any extra corpus-side replication, the multiprobe
    * alternative to adding tables at 100 TB.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              nBits: Int = 8, tables: Int = 4, probes: Int = 1, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(probes >= 1 && probes <= nBits + 1,
      s"lsh: probes=$probes must be in [1, nBits+1=${nBits + 1}] — single-bit " +
        "flips of an nBits code reach at most nBits+1 distinct buckets")
    def bucketed(df: DataFrame, idAs: String, vecAs: String) = {
      val buckets = (0 until tables).map { t =>
        struct(lit(t).as("t"),
          vecfns.srpBucket(col(vecCol), dim, nBits, seed + t * 7919L).as("h"))
      }
      df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
        explode(array(buckets: _*)).as("bk"))
    }
    val c = bucketed(corpus, "neighbor_id", "cv")
    val q =
      if (probes == 1) bucketed(queries, "query_id", "qv")
      else {
        val perTable = (0 until tables).map { t =>
          transform(
            vecfns.srpProbes(col(vecCol), dim, nBits, seed + t * 7919L, probes),
            h => struct(lit(t).as("t"), h.as("h")))
        }
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
          explode(flatten(array(perTable: _*))).as("bk"))
      }
    val cand = c.join(broadcast(q), Seq("bk"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id", "cv", "qv")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("score", vecfns.cosine(col("cv"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }
}
