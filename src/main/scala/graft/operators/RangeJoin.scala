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
}
