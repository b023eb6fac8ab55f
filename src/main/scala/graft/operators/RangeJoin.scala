package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join, bucketed.
  *
  * Spark plans `l.point BETWEEN r.lo AND r.hi` as a broadcast-nested-
  * loop (or worse, cartesian) join — O(N·M) comparisons. Bucketing
  * turns it into an equi-join: quantize the domain into `bucketWidth`
  * cells, explode each interval to the cells it overlaps, map each
  * point to its cell, hash-join on cell, and re-check the exact
  * predicate. Cost becomes O(N + M·spans + matches) with one ordinary
  * shuffle — the same trick production engines use for interval/
  * geospatial joins.
  *
  * Pick `bucketWidth` near the typical interval length: much smaller
  * multiplies `spans` (interval replication), much larger multiplies
  * false candidates. Degenerate giant intervals replicate across many
  * cells — cap or split them upstream.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pBucket = floor(col(pointCol) / bucketWidth).cast("long")
    val loB = floor(col(loCol) / bucketWidth).cast("long")
    val hiB = floor(col(hiCol) / bucketWidth).cast("long")
    val p = points.withColumn("__cell", pBucket)
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__cell", explode(sequence(loB, hiB)))
    p.join(iv, Seq("__cell"), "inner")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__cell")
  }

  /** Interval×interval OVERLAP join (closed intervals: a pair matches
    * iff `l.lo <= r.hi && r.lo <= l.hi`) — concurrent sessions,
    * overlapping validity windows, time-range conflict detection.
    *
    * Same bucketing idea as [[pointInInterval]], with the standard
    * exactly-once refinement: both sides explode to their covered
    * cells, the hash join runs on the cell, and a pair is emitted
    * ONLY from the cell containing `max(l.lo, r.lo)` — every
    * overlapping pair shares that cell (the later start lies inside
    * both intervals), so the output needs no `distinct()` and no
    * row ever shuffles twice. Cost O(N·spans + M·spans + matches),
    * one ordinary shuffle.
    *
    * The two inputs must have DISJOINT column names (fail-fast
    * require — a silent name collision would corrupt the join
    * output). Intervals wider than `maxCellsPerInterval` buckets
    * raise at execution rather than silently exploding the
    * replication factor — raise `bucketWidth`, or split degenerate
    * giant intervals upstream (the [[pointInInterval]] contract made
    * loud).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lLoCol: String, lHiCol: String,
                      rLoCol: String, rHiCol: String,
                      bucketWidth: Double,
                      maxCellsPerInterval: Long = 1024L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxCellsPerInterval >= 1, "maxCellsPerInterval must be >= 1")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"intervalOverlap: inputs share column name(s) ${overlap.mkString(", ")} — rename one side")

    def cells(df: DataFrame, loCol: String, hiCol: String): DataFrame = {
      val loB = floor(col(loCol) / bucketWidth).cast("long")
      val hiB = floor(col(hiCol) / bucketWidth).cast("long")
      val spans = hiB - loB + 1L
      // the guard rides the sequence START, which the explode consumes
      // — a raise_error on a dead column never fires
      val guard = when(spans <= maxCellsPerInterval, lit(0L))
        .otherwise(raise_error(concat(
          lit(s"intervalOverlap: an interval covers more than " +
            s"$maxCellsPerInterval buckets ("), spans.cast("string"),
          lit(") — raise bucketWidth or split giant intervals upstream")))
          .cast("long"))
      df.filter(col(loCol) <= col(hiCol))
        .withColumn("__cell", explode(sequence(loB + guard, hiB)))
    }
    val l = cells(left, lLoCol, lHiCol)
    val r = cells(right, rLoCol, rHiCol).withColumnRenamed("__cell", "__rcell")
    l.join(r, col("__cell") === col("__rcell"))
      .filter(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol) &&
        floor(greatest(col(lLoCol), col(rLoCol)) / bucketWidth).cast("long")
          === col("__cell"))
      .drop("__cell", "__rcell")
  }
}
