package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation.
  *
  * The production use: rank DOMAINS/HOSTS by link authority to
  * prioritize crawling and weight training data (the CommonCrawl
  * harmonic-centrality/PageRank discipline) — a quality signal no
  * per-document score can provide, because it lives in the graph
  * structure between sources.
  */
object Graph {

  /** FIXED-POINT PageRank: the classic damped recursion evaluated in
    * scaled INTEGER arithmetic, so the result is deterministic to the
    * last bit at any partitioning, any cluster size, and any engine —
    * integer sums are order-free where float sums are not, which is
    * what makes this variant independently verifiable (a DuckDB
    * oracle replays every iteration exactly) and reproducible across
    * reruns of a 1000-executor job.
    *
    * Ranks are maintained as `r_fp = r · scale` (BIGINT). Per
    * iteration, with N = node count and damping d = dampNum/dampDen:
    *
    *   contrib(u→v) = r_fp(u) DIV outdeg(u)
    *   dangShare    = (Σ_{outdeg(u)=0} r_fp(u)) DIV N
    *   r_fp'(v)     = ((scale DIV N) · (dampDen − dampNum)) DIV dampDen
    *                + ((inflow(v) + dangShare) · dampNum) DIV dampDen
    *
    * Every DIV floors a positive value, so each iteration's result is
    * within numIter·N/scale of the real-valued recursion (≤ 1e-9·N
    * rank units at the default scale 10¹²) — bias, not noise: the
    * same everywhere, every time. Total mass shrinks by the dropped
    * remainders instead of drifting randomly.
    *
    * Graph contract: edges de-duplicate, self-loops and null
    * endpoints drop, the node set is src ∪ dst. Output: (id, rank_fp,
    * rank) with rank = rank_fp/scale rounded to 6dp for human eyes
    * and rank_fp the exact value (the cross-engine comparison key —
    * BIGINT on both sides; a raw double in oracle output would be
    * the only one in the query set and serves no purpose).
    *
    * Scale shape: the canonical distributed PageRank — one shuffle
    * per iteration keyed on the destination (inflow aggregate,
    * map-side combined) plus a scalar dangling-mass aggregate; the
    * edge table (id, deg) is computed once. Like `Bpe.train`, this is
    * an ITERATIVE operator: it runs ~2 jobs per iteration and
    * truncates lineage each round (the duplicateClusters discipline),
    * so construction is NOT lazy. Host graphs are small relative to
    * the corpora they rank (10⁸ hosts vs 10¹¹ pages), and iterations
    * are O(edges). */
  def pageRankFp(edges: DataFrame, srcCol: String, dstCol: String,
                 numIter: Int = 3, scale: Long = 1000000000000L,
                 dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(numIter >= 1, s"pageRankFp: numIter must be >= 1, got $numIter")
    require(scale >= 1000000L, s"pageRankFp: scale must be >= 1e6, got $scale")
    require(dampNum > 0 && dampDen > dampNum,
      s"pageRankFp: need 0 < dampNum < dampDen, got $dampNum/$dampDen")
    val spark = edges.sparkSession
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
    val eT = trunc(e)
    val nodes = trunc(
      eT.select(col("src").as("id")).union(eT.select(col("dst").as("id"))).distinct())
    val deg = trunc(eT.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")))
    val n = nodes.count()
    if (n == 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("rank_fp",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.DoubleType))))

    val base = ((scale / n) * (dampDen - dampNum)) / dampDen
    var ranks = nodes.select(col("id"), lit(scale / n).as("r"))
    for (_ <- 1 to numIter) {
      val dang = ranks.join(deg, Seq("id"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L))).collect()(0).getLong(0)
      val dangShare = dang / n
      val inflow = ranks.join(deg, "id")
        .join(eT, col("id") === col("src"))
        .select(col("dst"), expr("r DIV deg").as("c"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("c")).as("inflow"))
      // Column `/` is DOUBLE division — the integer recursion must go
      // through SQL DIV or the whole determinism claim dies here
      ranks = trunc(nodes.join(inflow, Seq("id"), "left")
        .withColumn("__in", coalesce(col("inflow"), lit(0L)) + lit(dangShare))
        .select(col("id"),
          (lit(base) + expr(s"(__in * ${dampNum}L) DIV ${dampDen}L")).as("r")))
    }
    ranks.select(col("id"), col("r").as("rank_fp"),
      round(col("r").cast("double") / scale.toDouble, 6).as("rank"))
  }

  /** Per-node TRIANGLE counts over the undirected simple graph —
    * the local-clustering signal of link analysis: organic
    * communities close triangles, link farms and spam rings mostly
    * do not, so triangles-per-degree separates embedded hosts from
    * bolted-on ones (the companion metric to [[pageRankFp]]'s global
    * authority).
    *
    * Exact and deterministic (pure integer counting — no float
    * anywhere), enumerated ONCE per triangle via DEGREE ORIENTATION
    * (Cohen's MapReduce scheme / Suri–Vassilvitskii): every edge
    * points from its lower (degree, id) endpoint to the higher, each
    * triangle becomes exactly one wedge at its lowest corner plus
    * one closing edge, and the wedge fan-out per node is bounded by
    * its ORIENTED out-degree ≤ O(√m) on any graph — the hot node of
    * a star graph (degree 10⁸, zero triangles) emits ZERO wedges
    * because every edge points INTO it; an id-ordered or unoriented
    * wedge join would fan it out quadratically. That bound is the
    * whole point at 100 TB: wedge volume is Σ out-deg² ≤ O(m^1.5)
    * worst-case, linear-ish on real power-law link graphs.
    *
    * Graph contract = [[pageRankFp]]'s: edges de-duplicate (after
    * canonicalizing direction), self-loops and null endpoints drop,
    * the node set is src ∪ dst; nodes in no triangle report 0.
    * Plan: two joins build the oriented adjacency with the target's
    * degree attached; one self-join on the source makes wedges; one
    * equi-join on (b, c) closes them; explode + count per corner.
    * All equi-joins, no BNL, no iteration, no driver state.
    *
    * Output: (id, triangles), one row per node. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e0 = edges
      .select(col(srcCol).cast("long").as("__a"), col(dstCol).cast("long").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull &&
        col("__a") =!= col("__b"))
      .select(least(col("__a"), col("__b")).as("u"),
        greatest(col("__a"), col("__b")).as("v"))
      .distinct()
    val deg = e0.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val nodes = deg.select("id")
    // orient u↔v from the lower (deg, id) endpoint; carry the
    // target's degree so wedge ordering uses the SAME total order
    // (the closing edge exists iff (deg_b, b) < (deg_c, c))
    val withDeg = e0
      .join(deg.select(col("id").as("u"), col("deg").as("__du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("__dv")), "v")
    val uFirst = col("__du") < col("__dv") ||
      (col("__du") === col("__dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("s"),
      when(uFirst, col("v")).otherwise(col("u")).as("t"),
      when(uFirst, col("__dv")).otherwise(col("__du")).as("dt"))
    val x = oriented.alias("x"); val y = oriented.alias("y")
    val wedges = x.join(y, col("x.s") === col("y.s") &&
        (col("x.dt") < col("y.dt") ||
          (col("x.dt") === col("y.dt") && col("x.t") < col("y.t"))))
      .select(col("x.s").as("a"), col("x.t").as("b"), col("y.t").as("c"))
    val tris = wedges.join(
      oriented.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"))
    val corner = tris.select(explode(array(col("a"), col("b"), col("c")))
        .as("id"))
      .groupBy("id").agg(count(lit(1)).as("__t"))
    nodes.join(corner, Seq("id"), "left")
      .select(col("id"), coalesce(col("__t"), lit(0L)).as("triangles"))
  }

  /** Lineage truncation between iterations (the duplicateClusters
    * discipline): localCheckpoint keeps executor-resident blocks —
    * right for iterative refinement. */
  private def trunc(df: DataFrame): DataFrame = df.localCheckpoint()
}
