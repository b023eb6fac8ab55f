package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Pca

class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark
  import spark.implicits._

  private def vecsDf(vs: Seq[Array[Float]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")

  test("gram: exact integer statistics match a local reference at any partitioning") {
    val rnd = new scala.util.Random(7)
    val d = 5
    val vs = Seq.fill(200)(Array.fill(d)((rnd.nextDouble() - 0.5).toFloat))
    val scale = 10000L
    // local reference over the SAME quantization
    val q = vs.map(_.map(x => math.floor(x.toDouble * scale + 0.5).toLong))
    val expN = q.length.toLong
    val expM = Array.tabulate(d)(i => q.map(_(i)).sum)
    val expS = for (i <- 0 until d; j <- i until d)
      yield ((i, j), q.map(r => r(i) * r(j)).sum)
    val expMap = expS.toMap
    Seq(1, 7).foreach { parts =>
      val got = Pca.gram(vecsDf(vs).repartition(parts), "embedding", d, scale)
        .collect()
      assert(got.length == d * (d + 1) / 2)
      got.foreach { r =>
        val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
        assert(r.getLong(2) == expN)
        assert(r.getLong(3) == expM(i), s"m_$i")
        assert(r.getLong(4) == expM(j), s"m_$j")
        assert(r.getLong(5) == expMap((i, j)), s"s_$i$j")
      }
    }
  }

  test("gram: null rows skip; wrong length and null elements raise") {
    val ok = Seq((1L, Array(1.0f, 2.0f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val r = Pca.gram(ok, "embedding", 2, 10L).collect()
    assert(r.forall(_.getLong(2) == 1L)) // only the non-null row counted
    val bad = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] { Pca.gram(bad, "embedding", 2, 10L).collect() }
    assert(e.getMessage != null)
  }

  test("jacobi: recovers a hand-built spectrum; basis orthonormal") {
    // A = Q diag(9, 4, 1) Qᵀ for a known rotation Q
    val q = Array(
      Array(math.sqrt(0.5), -math.sqrt(0.5), 0.0),
      Array(math.sqrt(0.5), math.sqrt(0.5), 0.0),
      Array(0.0, 0.0, 1.0))
    val lam = Array(9.0, 4.0, 1.0)
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => q(i)(k) * lam(k) * q(j)(k)).sum)
    val (vals, vecs) = Pca.jacobiEigen(a)
    assert(vals.sorted.reverse.zip(Seq(9.0, 4.0, 1.0))
      .forall { case (g, e) => math.abs(g - e) < 1e-9 })
    // columns orthonormal
    for (c1 <- 0 until 3; c2 <- 0 until 3) {
      val dot = (0 until 3).map(r => vecs(r)(c1) * vecs(r)(c2)).sum
      assert(math.abs(dot - (if (c1 == c2) 1.0 else 0.0)) < 1e-9, s"$c1,$c2")
    }
  }

  test("fit + project: planted 2-D subspace is recovered; reconstruction improves with k") {
    val rnd = new scala.util.Random(11)
    val d = 8
    // two fixed orthogonal directions + tiny isotropic noise
    val b1 = Array.tabulate(d)(i => if (i < 4) 0.5 else 0.0)
    val b2 = Array.tabulate(d)(i => if (i >= 4) 0.5 else 0.0)
    val vs = Seq.fill(400) {
      val (a, b) = (rnd.nextGaussian(), 0.5 * rnd.nextGaussian())
      Array.tabulate(d)(i =>
        (a * b1(i) + b * b2(i) + 0.001 * rnd.nextGaussian()).toFloat)
    }
    val df = vecsDf(vs)
    val model = Pca.fit(df, "embedding", d, k = 4, scale = 100000L)
    // top-2 variance dominates the rest by orders of magnitude
    assert(model.variances(0) > model.variances(1))
    assert(model.variances(1) > 100 * model.variances(2),
      model.variances.mkString(","))
    // deterministic: refit gives the identical model
    val model2 = Pca.fit(df.repartition(13), "embedding", d, k = 4,
      scale = 100000L)
    assert(model.means.sameElements(model2.means))
    assert(model.components.zip(model2.components)
      .forall { case (x, y) => x.sameElements(y) })
    // projection variance per component == eigenvalue (up to n-1 norm)
    val proj = Pca.project(df, "embedding", model)
    val pr = proj.select(col("pca")).collect().map(_.getSeq[Double](0))
    val n = pr.length
    (0 until 4).foreach { c =>
      val xs = pr.map(_(c))
      val mu = xs.sum / n
      val varc = xs.map(x => (x - mu) * (x - mu)).sum / (n - 1)
      assert(math.abs(varc - model.variances(c)) < 1e-6 * math.max(1.0, model.variances(c)),
        s"component $c: $varc vs ${model.variances(c)}")
    }
    // reconstruction error shrinks as k grows (2 components suffice)
    def reconErr(k: Int): Double = {
      val m = Pca.fit(df, "embedding", d, k, scale = 100000L)
      val p = Pca.project(df, "embedding", m)
        .select(col("embedding"), col("pca")).collect()
      p.map { r =>
        val v = r.getSeq[Float](0).map(_.toDouble)
        val z = r.getSeq[Double](1)
        val rec = Array.tabulate(d)(i =>
          m.means(i) + (0 until k).map(c => z(c) * m.components(c)(i)).sum)
        v.zip(rec).map { case (x, y) => (x - y) * (x - y) }.sum
      }.sum / p.length
    }
    val e1 = reconErr(1); val e2 = reconErr(2)
    assert(e2 < e1)
    assert(e2 < 1e-4, s"2 components must capture the planted plane, err=$e2")
  }

  test("fit refusals: k out of range, too few rows") {
    val df = vecsDf(Seq(Array(1.0f, 0.0f)))
    intercept[IllegalArgumentException] { Pca.fit(df, "embedding", 2, 3) }
    intercept[IllegalArgumentException] { Pca.fit(df, "embedding", 2, 1) }
  }

  test("whiten: unit variance per component; zero-variance passthrough") {
    val rnd = new scala.util.Random(23)
    val d = 6
    val vs = Seq.fill(300)(Array.fill(d)((rnd.nextDouble() - 0.5).toFloat))
    val df = vecsDf(vs)
    val model = Pca.fit(df, "embedding", d, k = 3, scale = 100000L)
    val w = Pca.whiten(df, "embedding", model)
      .select(col("pca_w")).collect().map(_.getSeq[Double](0))
    val n = w.length
    (0 until 3).foreach { c =>
      val xs = w.map(_(c))
      val mu = xs.sum / n
      val varc = xs.map(x => (x - mu) * (x - mu)).sum / (n - 1)
      // tolerance: the variance estimate rides float32 inputs through
      // scale-1e5 quantization — a few 1e-6 of drift is expected
      assert(math.abs(varc - 1.0) < 1e-4, s"component $c variance $varc")
    }
    // a planted zero-variance direction passes through unscaled
    val flat = vecsDf(Seq.fill(50)(Array(1.0f, 2.0f)))
    val m2 = Pca.fit(flat, "embedding", 2, k = 2)
    val w2 = Pca.whiten(flat, "embedding", m2)
      .select(col("pca_w")).collect().map(_.getSeq[Double](0))
    assert(w2.forall(r => r.forall(x => math.abs(x) < 1e-6)))
  }

  test("declared pca recall gate (ann13): shortlist+rerank floor") {
    // the fixture embeddings have a deliberately FLAT spectrum
    // (var_captured ≈ 0.38 at 16/64 dims — the hardest case for
    // dimensionality reduction); raw 16-dim top-10 recall is ~0.29
    // there, while the deployed shape (100-candidate shortlist in
    // PCA space + exact cosine rerank) measures 0.86. Floor leaves
    // regression margin.
    val r = SparkEntry.queries("ann13_pca_recall")(spark, SparkT.sfDir)
      .collect()(0)
    assert(r.getDouble(2) >= 0.70, s"pca recall@10 = ${r.getDouble(2)}")
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 1.0) // var fraction
  }

  test("correlation: diagonal 1, hand-built perfect/anti/null cases") {
    import graft.similarity.Pca
    // col0 = t, col1 = 2t (corr +1), col2 = -t (corr -1), col3 = const
    // (zero variance -> null)
    val vs = (1 to 100).map(t =>
      Array(t.toFloat, 2f * t, -t.toFloat, 5f))
    val df = vecsDf(vs)
    val got = Pca.correlation(df, "embedding", 4, scale = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got((0L, 0L)) == Some(1.0))
    assert(got((1L, 1L)) == Some(1.0))
    assert(math.abs(got((0L, 1L)).get - 1.0) < 1e-12)
    assert(math.abs(got((0L, 2L)).get + 1.0) < 1e-12)
    assert(got((0L, 3L)).isEmpty && got((3L, 3L)).isEmpty,
      "zero-variance column must yield null, not a division artifact")
    assert(got.size == 10) // upper triangle of 4x4
  }

  test("gram: float/double input fails analysis; integral widths accepted") {
    import graft.expressions.GraftFunctions.graft_gram
    // raw float embeddings must NOT silently truncate toward zero —
    // the analysis error names the quantize-first contract
    val floats = vecsDf(Seq(Array(0.9f, 0.9f)))
    val e = intercept[Exception] {
      floats.agg(graft_gram(col("embedding"), 2)).collect()
    }
    assert(e.getMessage.contains("integral") || e.getMessage.contains("quantize"),
      s"expected the quantize-first analysis error, got: ${e.getMessage}")
    // array<int> rides the type-dispatched getter to the same sums
    val ints = Seq(Tuple1(Array(3, 4)), Tuple1(Array(1, 2))).toDF("qv")
    val r = ints.agg(graft_gram(col("qv"), 2).as("g"))
      .select(col("g.n"), col("g.moments"), col("g.products")).collect()(0)
    assert(r.getLong(0) == 2L)
    assert(r.getSeq[Long](1) == Seq(4L, 6L))
    assert(r.getSeq[Long](2) == Seq(10L, 14L, 20L)) // s00, s01, s11
  }

  test("gram plan: partial aggregation, no self-join, one exchange") {
    val df = vecsDf(Seq.fill(50)(Array(0.1f, 0.2f, 0.3f)))
    val q = Pca.gram(df, "embedding", 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("graft_gram"), plan.take(500))
    // partial+final pair, not a row-explode self-join
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }
}
