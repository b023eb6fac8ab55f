package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the time-series operator relational
  * engines bolt on specially (DuckDB `ASOF JOIN`, kdb `aj`).
  *
  * Composed from built-ins per the Spark-first preference order
  * (compose > custom plan): tag and union both sides, sort within the
  * key partition by (time, side), and carry the right side's latest
  * values forward with `last(ignoreNulls)` over an unbounded-preceding
  * window. One shuffle on the key, one sort — the same cost profile as
  * a sort-merge join, with no per-row probing.
  *
  * Scale: left (N) and right (M) shuffle once each on `keyCol`;
  * window state is O(1) per row (only the carried columns). Skewed
  * keys behave like any window partition — AQE skew handling applies
  * to the exchange, and a hot key costs one task its sort.
  */
object AsofJoin {

  /** For each left row, attach the most recent right row with
    * `rightTime <= leftTime` on the same key (strictly "prior or
    * equal"; ties resolve to the right row, matching DuckDB ASOF).
    *
    * @param valueCols right-side columns to carry (renamed as given)
    */
  /** Sort key for a time column without precision loss: timestamps go
    * through `unix_micros` (a bare cast("long") truncates to SECONDS,
    * which can match a left row to a right row sub-second in its
    * future); integral columns pass through. Fractional numeric types
    * are REFUSED rather than cast — cast("long") truncates toward
    * zero, so leftTime=1.5 would "match" a rightTime=1.9 row from its
    * future; the caller must supply an integral or timestamp column
    * (scale fractional seconds to micros first). */
  private def timeKey(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case _: TimestampType => unix_micros(col(c))
      case _: TimestampNTZType => unix_micros(col(c).cast("timestamp"))
      case _: DateType => unix_date(col(c)).cast("long")
      case LongType | IntegerType | ShortType | ByteType => col(c).cast("long")
      case other => throw new IllegalArgumentException(
        s"asof: time column '$c' has non-integral type $other — a long cast " +
          "would truncate and match future rows; convert to an integral " +
          "epoch (e.g. micros) or a timestamp first")
    }
  }

  private def validate(left: DataFrame, right: DataFrame, keyCol: String,
                       valueCols: Seq[(String, String)]): Unit = {
    val leftCols = left.columns
    // the output is leftCols ++ carried targets, so a target name equal
    // to a left column — or a left column using one of our scratch
    // names — would produce ambiguous output columns; fail fast
    val reserved = Set("__k", "__t", "__side", "__v", "__c")
    require(leftCols.contains(keyCol),
      s"asof: key column '$keyCol' not found in left frame (${leftCols.mkString(", ")})")
    require(right.columns.contains(keyCol),
      s"asof: key column '$keyCol' not found in right frame (${right.columns.mkString(", ")})")
    val clashes = valueCols.map(_._2).filter(leftCols.contains)
    require(clashes.isEmpty,
      s"asof: valueCols target name(s) ${clashes.mkString(", ")} collide with left columns; rename the targets")
    val badLeft = leftCols.filter(reserved.contains)
    require(badLeft.isEmpty,
      s"asof: left column(s) ${badLeft.mkString(", ")} use reserved internal names (__k/__t/__side/__v/__c)")
    // a target named "__t" would be swept away by the native path's
    // trailing drop of its internal time key (Dataset.drop removes
    // EVERY attribute with the name); forbid the whole scratch set
    val badTargets = valueCols.map(_._2).filter(reserved.contains)
    require(badTargets.isEmpty,
      s"asof: valueCols target name(s) ${badTargets.mkString(", ")} use reserved internal names (__k/__t/__side/__v/__c)")
    val dupTargets = valueCols.map(_._2).diff(valueCols.map(_._2).distinct)
    require(dupTargets.isEmpty,
      s"asof: duplicate valueCols target name(s) ${dupTargets.distinct.mkString(", ")}")
  }

  def asofBackward(left: DataFrame, right: DataFrame,
                   keyCol: String, leftTime: String, rightTime: String,
                   valueCols: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns
    validate(left, right, keyCol, valueCols)
    // side 0 = right (sorts before left on time ties → ties match).
    // The carried columns ride in ONE struct so the window's
    // last(ignoreNulls=true) skips only LEFT filler rows (null struct),
    // never a matched right row whose individual value is null — i.e.
    // ROW semantics, the same as DuckDB ASOF and the native exec; a
    // per-column carry would resurrect older non-null values and could
    // even mix columns from different right rows.
    // DuckDB-ASOF parity: a right row with a NULL key or NULL time can
    // never match (equality join + time comparison are both
    // null-rejecting there), but Spark's Window groups nulls together
    // and sorts them FIRST — unfiltered, a null-time right row would
    // be carried as the "most recent prior" into every left row before
    // the first real-timestamped right row, and null-key rows would
    // match null-key left rows
    val taggedRight = right
      .filter(col(keyCol).isNotNull && col(rightTime).isNotNull)
      .select(
        col(keyCol).as("__k"), timeKey(right, rightTime).as("__t"),
        lit(0).as("__side"),
        struct(valueCols.map { case (from, to) => col(from).as(to) }: _*).as("__v"))
    val taggedLeft = left.select(
      Seq(col(keyCol).as("__k"), timeKey(left, leftTime).as("__t"),
        lit(1).as("__side")) ++ leftCols.map(c => col(c)): _*)

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned.withColumn("__c", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map { case (_, to) =>
        col("__c").getField(to).as(to)
      }: _*)
  }

  /** [[asofBackward]] on the native sorted-merge physical operator
    * ([[graft.plans.AsofJoinExec]]): same semantics and output schema,
    * but each side shuffles/sorts independently on (key, time) and a
    * single merge pass joins them — no union of the two sides and no
    * window buffer over the carried columns. Use when the right side
    * is large or many columns are carried; the composed twin remains
    * the zero-custom-code fallback. */
  def asofBackwardNative(left: DataFrame, right: DataFrame,
                         keyCol: String, leftTime: String, rightTime: String,
                         valueCols: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.graftbridge.Bridge
    val leftCols = left.columns
    validate(left, right, keyCol, valueCols)
    // the native exec co-partitions each side by ITS OWN key hash and
    // reads the right key with the left key's physical type — a type
    // mismatch (schema drift: INT vs BIGINT custkey) would co-locate
    // nothing and silently carry all-null values. The composed twin
    // coerces via its union; the native path demands equality.
    val lkType = left.schema(keyCol).dataType
    val rkType = right.schema(keyCol).dataType
    require(lkType == rkType,
      s"asof: key column '$keyCol' has type $lkType on the left but $rkType on " +
        "the right — equal keys would hash to different partitions in the " +
        "native exec; cast one side first (the composed asofBackward coerces " +
        "automatically)")

    val spark = left.sparkSession
    graft.plans.GraftExtensions.ensureStrategies(spark)
    // pre-lower the time columns to LONG sort keys (same mapping as
    // the composed twin); the node references ordinals, so build both
    // sides with fixed column positions
    val lPrep = left.select(leftCols.map(col) :+
      timeKey(left, leftTime).as("__t"): _*)
    // null-key/null-time right rows never match (DuckDB-ASOF parity —
    // same filter as the composed twin)
    val rPrep = right
      .filter(col(keyCol).isNotNull && col(rightTime).isNotNull)
      .select(
        col(keyCol).as("__k") +: timeKey(right, rightTime).as("__t") +:
          valueCols.map { case (from, to) => col(from).as(s"__v_$to") }: _*)
    val lPlan = Bridge.analyzed(lPrep)
    val rPlan = Bridge.analyzed(rPrep)
    val carried = valueCols.zipWithIndex.map { case ((_, to), i) =>
      AttributeReference(to, rPlan.output(2 + i).dataType, nullable = true)()
    }
    val node = graft.plans.AsofJoinNode(lPlan, rPlan,
      leftKeyIdx = leftCols.indexOf(keyCol), rightKeyIdx = 0,
      leftTimeIdx = leftCols.length, rightTimeIdx = 1,
      rightValIdx = valueCols.indices.map(_ + 2),
      carried = carried)
    Bridge.dataFrame(spark, node).drop("__t")
  }
}
