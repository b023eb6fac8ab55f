package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the data-quality gate a pipeline
  * runs before pointing a training job at a new table: null rates,
  * cardinalities and value ranges per column, in ONE pass over the
  * data, as a small tidy frame (one row per column) instead of a
  * one-row-of-many-columns summary nobody can filter.
  *
  * Scale shape: a single global aggregate — partial per task,
  * map-side combined, one row reaches the driver side of the plan.
  * The only scale-sensitive choice is DISTINCT counting:
  *  - `approxDistinct = true` (the 100 TB default): HLL++
  *    `approx_count_distinct` folds into the same single scan-side
  *    aggregate — no expansion, no extra shuffle;
  *  - `approxDistinct = false` (exact): Spark plans multi-column
  *    `count(DISTINCT …)` via Expand — the input is replicated once
  *    per profiled column before the shuffle. Exact and
  *    oracle-replayable, the right choice for validation scales;
  *    at corpus scale prefer the approximate form.
  *
  * Output, one row per profiled column, ordered as given:
  * (col_name, n_rows, n_nonnull, n_null, n_distinct, min_value,
  * max_value) — min/max cast to strings so heterogeneous column
  * types share one schema (the tidy-profile convention).
  */
object Profiler {

  def columnStats(df: DataFrame, cols: Seq[String],
                  approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "columnStats: cols must be non-empty")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"columnStats: columns not in the frame: ${missing.mkString(", ")}")
    def distinctOf(c: String) =
      if (approxDistinct) approx_count_distinct(col(c))
      else countDistinct(col(c))
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        distinctOf(c).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val summary = df.agg(aggs.head, aggs.tail: _*)
    // one summary row → one tidy row per column (stateless explode of
    // a struct array; ordering column keeps the caller's column order
    // without relying on the sort being stable across engines)
    val packed = summary.select(explode(array(cols.zipWithIndex.map {
      case (c, i) => struct(
        lit(i).as("ord"), lit(c).as("col_name"), col("__rows").as("n_rows"),
        col(s"__n_$c").as("n_nonnull"),
        (col("__rows") - col(s"__n_$c")).as("n_null"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))
    }: _*)).as("r"))
    packed.select(col("r.ord").as("ord"), col("r.col_name").as("col_name"),
        col("r.n_rows").as("n_rows"), col("r.n_nonnull").as("n_nonnull"),
        col("r.n_null").as("n_null"), col("r.n_distinct").as("n_distinct"),
        col("r.min_value").as("min_value"), col("r.max_value").as("max_value"))
      .orderBy(col("ord").asc).drop("ord")
  }
}
