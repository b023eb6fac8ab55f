package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped continuous quantiles with BOUNDED per-row state —
  * the corpus-scale replacement for `percentile(...)`, whose
  * aggregation buffer holds EVERY value of a group in one in-memory
  * array (over a near-unique column that is ~rowcount values in one
  * buffer — an OOM at 100 TB; cuplyr's grouped quantile verb is
  * reference R/verbs-summarise.R).
  *
  * Shape: one hash exchange on the group keys, then
  *  1. a window pass ranks each value (`row_number`) and counts the
  *     group (WindowExec streams the ranked pass and buffers the
  *     counted pass per group in a spillable row array — disk-backed,
  *     never an unbounded in-memory agg buffer);
  *  2. the k-th / (k+1)-th order statistics each percentile needs are
  *     picked out by a plain conditional aggregate over the SAME
  *     partitioning (no second exchange), and the final projection
  *     interpolates.
  *
  * Interpolation follows Spark's `percentile` exactly — 0-based
  * position p·(n−1), result (hi−pos)·x_lo + (pos−lo)·x_hi with the
  * degenerate lo==hi case short-circuited — so results are
  * bit-identical to the built-in (and to DuckDB's `quantile_cont`
  * wherever the built-in already matches it). Null values are ignored,
  * as in SQL; a group with zero non-null values is absent from the
  * output (the built-in would return null — callers needing that row
  * can left-join groups back).
  */
object Quantile {

  /** @param ps (outputColumn, percentile) pairs, each p in [0,1].
    * Output: one row per group, groupCols ++ ps.map(_._1). */
  def exactGrouped(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   ps: Seq[(String, Double)]): DataFrame = {
    require(groupCols.nonEmpty, "exactGrouped: need at least one group column")
    require(ps.nonEmpty, "exactGrouped: need at least one percentile")
    ps.foreach { case (n, p) =>
      require(p >= 0.0 && p <= 1.0, s"exactGrouped: percentile $n=$p outside [0,1]")
    }
    val gcols = groupCols.map(col)
    val v = col(valueCol).cast("double")
    val byGroup = Window.partitionBy(gcols: _*)
    val ranked = df.filter(v.isNotNull)
      .select(gcols :+ v.as("__v"): _*)
      .withColumn("__idx", row_number().over(byGroup.orderBy(col("__v").asc)).cast("long") - 1L)
      .withColumn("__n", count(lit(1)).over(byGroup))
    val aggs = ps.flatMap { case (name, p) =>
      val pos = lit(p) * (col("__n") - 1L).cast("double") // 0-based position
      Seq(
        max(when(col("__idx") === floor(pos), col("__v"))).as(s"__lo_$name"),
        max(when(col("__idx") === ceil(pos), col("__v"))).as(s"__hi_$name"),
        // pos is constant within a group; max() just carries it through
        max(pos).as(s"__pos_$name"))
    }
    val outs = ps.map { case (name, _) =>
      val pos = col(s"__pos_$name")
      val lo = floor(pos); val hi = ceil(pos)
      when(lo === hi, col(s"__lo_$name"))
        .otherwise((hi - pos) * col(s"__lo_$name") + (pos - lo) * col(s"__hi_$name"))
        .as(name)
    }
    ranked.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
      .select(gcols ++ outs: _*)
  }
}
