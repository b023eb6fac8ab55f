package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot grouping/join keys.
  *
  * Context: AQE (`spark.sql.adaptive.skewJoin.enabled`, on in
  * GraftSession) already splits skewed SORT-MERGE JOIN partitions at
  * runtime. What AQE does NOT fix is single-key aggregation skew — one
  * key with 10^9 rows still lands on one reducer — and broadcast-side
  * selection for hot keys. These helpers cover those.
  */
object Skew {

  /** Two-phase (salted) aggregation: deterministic row salt spreads a
    * hot key over `salts` reducers for the partial phase; the final
    * phase merges `salts` rows per key. Supported aggregate shapes are
    * the algebraic ones whose merge is themselves (`sum`, `count` →
    * sum, `min`, `max`); non-algebraic aggregates (avg, distinct)
    * must be rewritten by the caller (avg = sum/count).
    *
    * The salt is a hash of the whole row struct — deterministic across
    * retries (a `rand()` salt would break speculative execution /
    * stage retry exactly-once semantics).
    */
  def saltedSummarise(df: DataFrame, keys: Seq[String], salts: Int,
                      aggs: (String, String, String)*): DataFrame = {
    // aggs: (outputName, inputCol, op) with op in sum|count|min|max
    // Salt = hash(partition_id, row) — the partition id spreads fully
    // identical rows (the common log-duplication case a row-only hash
    // would send to ONE reducer), while staying deterministic under
    // task retry (a retried task recomputes the same partition).
    val salt = pmod(
      xxhash64(spark_partition_id() +: df.columns.map(col): _*), lit(salts))
    def partial(op: String, c: String): Column = op match {
      case "sum" => sum(col(c))
      case "count" => count(col(c))
      case "min" => min(col(c))
      case "max" => max(col(c))
      case other => throw new IllegalArgumentException(
        s"saltedSummarise supports sum/count/min/max, got '$other'")
    }
    def merge(op: String, c: String): Column = op match {
      case "sum" | "count" => sum(col(c))
      case "min" => min(col(c))
      case "max" => max(col(c))
    }
    val phase1 = df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head match { case (n, c, op) => partial(op, c).as(n) },
        aggs.tail.map { case (n, c, op) => partial(op, c).as(n) }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(aggs.head match { case (n, _, op) => merge(op, n).as(n) },
        aggs.tail.map { case (n, _, op) => merge(op, n).as(n) }: _*)
  }

  /** Split-route join for known-hot keys: rows whose key frequency
    * exceeds `hotThreshold` (estimated from a deterministic sample)
    * join against a broadcast of the right side's matching slice; the
    * long tail takes the ordinary shuffle join. One union at the end.
    *
    * Use when the right side is too big to broadcast whole but the
    * hot keys' slice fits — the case AQE's skew-join can't help
    * (it splits partitions, but the right side still shuffles).
    */
  def skewAwareJoin(left: DataFrame, right: DataFrame, key: String,
                    hotThreshold: Long, sampleFraction: Double = 0.05): DataFrame = {
    // below 1/sampleFraction the sample cutoff floors to "any key seen
    // once in the sample" — on a table with >= ~1/fraction rows per
    // key that classifies essentially EVERY key hot, and the operator
    // broadcasts most of the right side: the exact OOM it exists to
    // avoid. Demand a threshold the sample can actually discriminate.
    require(hotThreshold * sampleFraction >= 1.0,
      s"skewAwareJoin: hotThreshold=$hotThreshold is below 1/sampleFraction=" +
        f"${1.0 / sampleFraction}%.0f — the ${sampleFraction * 100}%.0f%% sample cannot " +
        "distinguish such keys from the long tail; raise hotThreshold or sampleFraction")
    val hot = left.sample(withReplacement = false, sampleFraction, seed = 42L)
      .groupBy(key).count()
      .filter(col("count") >= math.max(1L, (hotThreshold * sampleFraction).toLong))
      .select(col(key))
    val hotKeys = broadcast(hot)
    val leftHot = left.join(hotKeys, Seq(key), "left_semi")
    val leftTail = left.join(hotKeys, Seq(key), "left_anti")
    val rightHotSlice = broadcast(right.join(hotKeys, Seq(key), "left_semi"))
    leftHot.join(rightHotSlice, Seq(key), "inner")
      .unionByName(leftTail.join(right, Seq(key), "inner"))
  }
}
