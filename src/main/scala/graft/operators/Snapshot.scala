package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental snapshot maintenance: apply a CDC-style changes batch
  * (upserts + delete tombstones) to a base snapshot, producing the
  * next snapshot. This is the crawl-refresh primitive a corpus
  * pipeline runs between dedup passes — re-crawled pages replace
  * their previous rows, dead pages tombstone out, new pages append —
  * without any table-format dependency: plain DataFrames in, plain
  * DataFrame out (write it wherever the pipeline persists snapshots;
  * compose with `Tables` bucketed writes to make the NEXT merge's
  * join shuffle-free on the base side).
  *
  * Scale shape: the merge is ONE key-shuffle — a left-anti join of
  * the base against the changed-key set plus a union of the upsert
  * rows. A typical incremental batch is orders of magnitude smaller
  * than the snapshot, so the anti-join broadcasts (AQE picks this up
  * from runtime stats); a full-size batch degrades to one sort-merge
  * join, never more. The latest-wins resolution shuffles only the
  * changes batch. Base rows never rewrite in place — the output is a
  * new snapshot, the immutable-snapshot discipline object stores
  * need.
  */
object Snapshot {

  /** The next snapshot: `base` with `changes` applied.
    *
    * `changes` must carry every `base` column plus `opCol` with
    * values `"upsert"` (insert-or-replace the row for that key) or
    * `"delete"` (tombstone: remove the key; payload columns are
    * ignored and may be null). Any other op value raises at
    * execution. Output columns = `base` columns exactly.
    *
    * Conflict resolution when a key appears more than once in the
    * batch: highest `versionCol` wins when given; remaining ties
    * resolve deterministically — `"delete"` before `"upsert"` (a
    * tombstone beats a same-version rewrite: the conservative read
    * of contradictory feeds), then by a 64-bit payload hash so
    * reruns pick the same survivor even on pathological inputs
    * (differing payloads at the same key/version/op are a data error;
    * the hash makes the arbitrary choice reproducible, up to hash
    * collision). */
  def merge(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
            opCol: String = "op",
            versionCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "Snapshot.merge: keyCols must be non-empty")
    val missingKey = keyCols.filterNot(base.columns.contains)
    require(missingKey.isEmpty,
      s"Snapshot.merge: key column(s) ${missingKey.mkString(", ")} not in base")
    val missing = (base.columns.toSeq :+ opCol).filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"Snapshot.merge: changes is missing column(s): ${missing.mkString(", ")}")
    versionCol.foreach(v => require(changes.columns.contains(v),
      s"Snapshot.merge: changes is missing version column $v"))

    // op validation rides the resolved-op column, which every branch
    // below CONSUMES (ordering, filter, isNotNull) — a pruned
    // raise_error never fires, so it must not sit on a dead column
    val vop = when(col(opCol).isin("upsert", "delete"), col(opCol))
      .otherwise(raise_error(concat(
        lit(s"Snapshot.merge: $opCol must be 'upsert' or 'delete', got: "),
        coalesce(col(opCol).cast("string"), lit("null")))))
    val payload = base.columns.toSeq
    val ordering =
      versionCol.map(v => col(v).desc).toSeq ++ Seq(col("__op").asc,
        xxhash64(struct(payload.map(col): _*)).asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    val resolved = changes
      .withColumn("__op", vop)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)

    val changedKeys = resolved
      .filter(col("__op").isNotNull) // consumes __op: invalid ops raise here too
      .select(keyCols.map(col): _*)
    val upserts = resolved
      .filter(col("__op") === "upsert")
      .select(payload.map(col): _*)
    base.join(changedKeys, keyCols, "left_anti").unionByName(upserts)
  }
}
