package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** PCA over embedding columns — the standard dimensionality-reduction
  * step in front of vector search (the FAISS PCA/OPQ preprocessing
  * discipline): project 64-dim embeddings to the top-k principal
  * components to shrink index size and distance cost while keeping
  * most of the variance.
  *
  * Engineered in the repo's exactness discipline:
  *  - the covariance sufficient statistics come from ONE pass of the
  *    [[graft.expressions.GramMatrix]] aggregate over scan-side
  *    QUANTIZED vectors — exact integer sums, bit-identical at any
  *    partitioning and DuckDB-replayable (the cur25 oracle);
  *  - the eigendecomposition is a deterministic cyclic JACOBI sweep
  *    on the driver over the d×d matrix (d ≤ 1024 by the aggregate's
  *    bound — a 64×64 solve is microseconds; corpus size never
  *    touches it);
  *  - the projection is a scan-side expression over a broadcast
  *    basis (k codegen'd dot products per row, no UDF).
  */
object Pca {

  /** Raw Gram/moment sufficient statistics as a DataFrame of
    * upper-triangular entries (i, j, n, m_i, m_j, s_ij) — everything
    * BIGINT-exact at quantization `scale`. ONE aggregate over the
    * corpus (fixed ~d²/2-long buffer per task, map-side combined);
    * the (i, j) index table is a broadcast d² constant. */
  def gram(emb: DataFrame, vecCol: String, d: Int,
           scale: Long = 10000L): DataFrame = {
    require(d >= 1, s"Pca.gram: d must be positive, got $d")
    require(scale >= 1, s"Pca.gram: scale must be >= 1, got $scale")
    val spark = emb.sparkSession
    val q = quantize(col(vecCol), scale)
    val agged = emb.filter(col(vecCol).isNotNull)
      .agg(GraftFunctions.graft_gram(q, d).as("g"))
      .select(col("g.n").as("n"), col("g.moments").as("moments"),
        col("g.products").as("products"))
    val pairs = spark.range(d).select(col("id").as("i"))
      .crossJoin(spark.range(d).select(col("id").as("j")))
      .filter(col("i") <= col("j"))
      .withColumn("idx",
        col("i") * d - col("i") * (col("i") - 1) / 2 + (col("j") - col("i")))
    agged.crossJoin(broadcast(pairs))
      .select(col("i"), col("j"), col("n"),
        element_at(col("moments"), (col("i") + 1).cast("int")).as("m_i"),
        element_at(col("moments"), (col("j") + 1).cast("int")).as("m_j"),
        element_at(col("products"), (col("idx") + 1).cast("int")).as("s_ij"))
  }

  /** Pearson correlation matrix (upper triangle) from [[gram]]'s
    * exact statistics: corr_ij = (n·S_ij − m_i·m_j) /
    * √((n·S_ii − m_i²)(n·S_jj − m_j²)), evaluated in DOUBLE with one
    * fixed operation order so any engine replaying the formula over
    * the same integer sums computes the bit-identical result (rounded
    * 6dp in the declared query). Zero-variance dimensions yield null
    * (correlation undefined), never a division artifact. The feature-
    * redundancy report for embedding pipelines: |corr| ≈ 1 pairs are
    * candidates for dropping before PCA/indexing.
    *
    * The full-corpus Gram aggregate executes exactly ONCE: the single
    * struct row collects (the [[fit]] discipline) and the
    * d(d+1)/2-row statistics table is a driver-built local relation —
    * building three branches off the gram PLAN would instead lean on
    * exchange reuse to avoid re-running the aggregate, which Spark
    * does not guarantee. The corr arithmetic itself still runs as the
    * same fixed-order column expressions. */
  def correlation(emb: DataFrame, vecCol: String, d: Int,
                  scale: Long = 10000L): DataFrame = {
    require(d >= 1, s"Pca.correlation: d must be positive, got $d")
    val spark = emb.sparkSession
    import spark.implicits._
    val row = gramStruct(emb, vecCol, d, scale)
    val n = row.getLong(0)
    val m = row.getSeq[Long](1)
    val s = row.getSeq[Long](2)
    def idx(i: Int, j: Int): Int = i * d - i * (i - 1) / 2 + (j - i)
    val stats = (for { i <- 0 until d; j <- i until d } yield
      (i.toLong, j.toLong, n, m(i), m(j), s(idx(i, i)), s(idx(j, j)),
        s(idx(i, j))))
      .toDF("i", "j", "n", "m_i", "m_j", "__sii", "__sjj", "s_ij")
    def varTerm(mCol: Column, sCol: Column): Column =
      col("n").cast("double") * sCol.cast("double") -
        mCol.cast("double") * mCol.cast("double")
    stats.select(col("i"), col("j"),
      when(varTerm(col("m_i"), col("__sii")) <= 0.0 ||
           varTerm(col("m_j"), col("__sjj")) <= 0.0, lit(null).cast("double"))
        .otherwise(
          (col("n").cast("double") * col("s_ij").cast("double")
            - col("m_i").cast("double") * col("m_j").cast("double")) /
          sqrt(varTerm(col("m_i"), col("__sii"))
            * varTerm(col("m_j"), col("__sjj"))))
        .as("corr"))
  }

  /** q = ⌊v·scale + 0.5⌋ per element — the micro-quantization every
    * exact-replay operator here uses. */
  private def quantize(vec: Column, scale: Long): Column =
    transform(vec, x =>
      floor(x.cast("double") * scale.toDouble + 0.5).cast("long"))

  /** Trained basis: `components` holds the k principal directions,
    * each a length-d ROW (k×d — one array per component, which is why
    * `k = components.length`), the per-dimension means subtracted
    * before projection, and the eigenvalue (variance) per component,
    * descending. */
  final case class PcaModel(means: Array[Double],
                            components: Array[Array[Double]],
                            variances: Array[Double]) {
    def d: Int = means.length
    def k: Int = components.length
  }

  /** Fit the top-`k` principal components: one distributed Gram pass
    * (exact integer statistics) + a driver-side deterministic Jacobi
    * eigensolve of the d×d covariance. Eager by necessity (the
    * aggregate must run to train — the BPE/pageRankFp precedent). */
  def fit(emb: DataFrame, vecCol: String, d: Int, k: Int,
          scale: Long = 10000L): PcaModel = {
    require(k >= 1 && k <= d, s"Pca.fit: need 1 <= k <= d, got k=$k d=$d")
    val row = gramStruct(emb, vecCol, d, scale)
    val n = row.getLong(0)
    require(n >= 2, s"Pca.fit: need at least 2 vectors, got $n")
    val m = row.getSeq[Long](1).toArray
    val s = row.getSeq[Long](2).toArray
    val sc2 = scale.toDouble * scale.toDouble
    // covariance C_ij = (S_ij − m_i·m_j/n) / ((n−1)·scale²)
    val cov = Array.ofDim[Double](d, d)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (s(idx).toDouble - m(i).toDouble * m(j).toDouble / n) /
          ((n - 1).toDouble * sc2)
        cov(i)(j) = c; cov(j)(i) = c
        idx += 1; j += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    // order components by eigenvalue DESC, eigenvector sign canonical
    // (largest-|component| entry positive) so the fit is deterministic
    val order = vals.zipWithIndex.sortBy { case (v, ix) => (-v, ix) }
      .map(_._2).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(d)(r => vecs(r)(c))
      val pivot = v.indices.maxBy(r => (math.abs(v(r)), -r))
      if (v(pivot) < 0) v.map(-_) else v
    }
    PcaModel(m.map(_.toDouble / (n * scale.toDouble)), comps,
      order.map(vals(_)))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * deterministic (fixed sweep order, fixed tolerance), O(d³) per
    * sweep, driver-side only. Returns (eigenvalues, eigenvector
    * columns). */
  private[graft] def jacobiEigen(a0: Array[Array[Double]],
      maxSweeps: Int = 64, tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > tol && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol / (d * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case sgn => sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** [[project]] + per-component variance normalization (divide each
    * coordinate by √eigenvalue) — PCA WHITENING, the "all-but-the-top"
    * style post-processing that equalizes component scales so cosine/
    * L2 in the reduced space stops being dominated by the first
    * component. Components with eigenvalue ≤ `eps` pass through
    * unscaled (a zero-variance direction carries no signal to
    * equalize — dividing by ~0 would amplify quantization noise). */
  def whiten(emb: DataFrame, vecCol: String, model: PcaModel,
             outCol: String = "pca_w", eps: Double = 1e-12): DataFrame = {
    val scales = model.variances.map(v =>
      if (v <= eps) 1.0 else 1.0 / math.sqrt(v))
    val projected = project(emb, vecCol, model, outCol)
    projected.withColumn(outCol,
      zip_with(col(outCol), typedlit(scales.toSeq), (x, s) => x * s))
  }

  /** Project `vecCol` onto the model's components: output column
    * `outCol` is `array<double>` of length model.k, computed
    * scan-side over the broadcast basis (k zip_with/aggregate dot
    * products per row — codegen, no UDF, no shuffle). */
  def project(emb: DataFrame, vecCol: String, model: PcaModel,
              outCol: String = "pca"): DataFrame = {
    val comps = model.components
    val meansLit = typedlit(model.means.toSeq)
    val centered = zip_with(col(vecCol).cast("array<double>"), meansLit,
      (x, mu) => x - mu)
    val dots = comps.map { comp =>
      aggregate(
        zip_with(centered, typedlit(comp.toSeq), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
    }
    emb.withColumn(outCol, array(dots: _*))
  }

  private def gramStruct(emb: DataFrame, vecCol: String, d: Int,
                         scale: Long): org.apache.spark.sql.Row =
    emb.filter(col(vecCol).isNotNull)
      .agg(GraftFunctions.graft_gram(quantize(col(vecCol), scale), d).as("g"))
      .select(col("g.n"), col("g.moments"), col("g.products"))
      .collect()(0)
}
