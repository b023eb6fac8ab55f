package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: project an irregular event series onto
  * a fixed time grid — the step between raw event tables and anything
  * that assumes aligned periods (drift gates, CUSUM charts, rate
  * models, feature windows).
  */
object Resample {

  /** Per key, one row per `stepSeconds` grid cell from that key's
    * first to last observation, carrying the latest observed value at
    * or before the cell (last-observation-carried-forward):
    *
    *  1. each observation lands in bucket `ts − (ts mod step)`
    *     (floor to the grid, any-sign-safe);
    *  2. a bucket with several observations keeps the LATEST, ties
    *     broken by the larger value — `max(struct(ts, value))`, one
    *     deterministic aggregate, no window over raw events;
    *  3. the key's grid materializes from a bounded `sequence`
    *     (intervals wider than `maxCellsPerKey` cells raise through a
    *     guard the explode CONSUMES — a sensor that went quiet for a
    *     year at 1 s step should fail loudly, not explode the stage);
    *  4. empty cells forward-fill from the last observed bucket (a
    *     per-key window over GRID cells, bounded by grid length,
    *     never event count); cells before the key's first observation
    *     do not exist by construction (the grid starts at it).
    *
    * Output: keyCols ++ (grid_ts, valueCol, observed) — `observed`
    * false on carried-forward rows. `tsCol` is integral epoch
    * SECONDS (callers convert; an integral grid keeps every bucket
    * boundary exact). Null key rows form their own series (null-safe
    * join, the grouped-drift contract); null ts/value rows are
    * excluded.
    *
    * Scale shape: one shuffle to (key, bucket) for the aggregate; the
    * grid explode is output-sized; the fill window partitions per
    * key. Grid size per key is span/step — bounded by contract, and
    * orders of magnitude below event counts for any real sensor. */
  def timeGrid(df: DataFrame, keyCols: Seq[String], tsCol: String,
               valueCol: String, stepSeconds: Long,
               maxCellsPerKey: Long = 1000000L): DataFrame = {
    require(stepSeconds >= 1, s"timeGrid: stepSeconds must be >= 1, got $stepSeconds")
    require(maxCellsPerKey >= 1, s"timeGrid: maxCellsPerKey must be >= 1")
    val missing = (keyCols ++ Seq(tsCol, valueCol)).filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"timeGrid: input is missing column(s): ${missing.mkString(", ")}")
    val gs = keyCols.map(col)
    val ts = col(tsCol).cast("long")
    val bucket = ts - pmod(ts, lit(stepSeconds))
    val obs = df.filter(ts.isNotNull && col(valueCol).isNotNull)
      .select(gs ++ Seq(bucket.as("__b"), ts.as("__t"), col(valueCol).as("__raw")): _*)
      .groupBy(gs :+ col("__b"): _*)
      .agg(max(struct(col("__t").as("t"), col("__raw").as("v")))
        .getField("v").as("__v"))
    val bounds = obs.groupBy(gs: _*)
      .agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
    val cells = (col("__hi") - col("__lo")) / lit(stepSeconds) + lit(1L)
    val guard = when(cells <= maxCellsPerKey, lit(0L))
      .otherwise(raise_error(concat(
        lit(s"timeGrid: a key's grid exceeds $maxCellsPerKey cells ("),
        cells.cast("string"),
        lit(") — raise stepSeconds or split the series upstream")))
        .cast("long"))
    val grid = bounds.withColumn("__g",
      explode(sequence(col("__lo") + guard, col("__hi"), lit(stepSeconds))))
      .select(gs :+ col("__g"): _*)
    val obsA = obs.select(
      keyCols.map(c => col(c).as(s"__k_$c")) ++ Seq(col("__b"), col("__v")): _*)
    val joinCond = (keyCols.map(c => col(c) <=> col(s"__k_$c"))
      :+ (col("__g") === col("__b"))).reduce(_ && _)
    val w = Window.partitionBy(gs: _*).orderBy(col("__g").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obsA, joinCond, "left")
      .select(gs ++ Seq(col("__g").as("grid_ts"),
        last(col("__v"), ignoreNulls = true).over(w).as(valueCol),
        col("__v").isNotNull.as("observed")): _*)
  }
}
