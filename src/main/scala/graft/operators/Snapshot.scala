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

  /** The inverse of [[merge]]: the minimal changes batch that turns
    * `base` into `next` — `"upsert"` rows for keys that are new or
    * whose payload changed, `"delete"` tombstones for keys that
    * vanished; untouched rows emit NOTHING. The round-trip law
    * `merge(base, diff(base, next)) == next` holds exactly (it is
    * the SnapshotSpec property), which makes this the
    * snapshot-to-incremental bridge: compute a full refresh however
    * you like, ship only the diff.
    *
    * Column sets must match; comparison is null-safe per column
    * (NULL == NULL for change detection); null key rows pair up
    * null-safely, the library's grouped-operator contract. At most
    * one row per key per side is assumed (snapshots, not logs —
    * [[merge]]'s output satisfies this when keys are unique).
    *
    * Scale shape: ONE null-safe key join for the upsert side (full
    * outer semantics expressed as left join + presence marker — the
    * payload comparison rides the join row, no second shuffle) plus
    * one anti-join for tombstones; both on the same key, so AQE
    * plans them together and a mostly-unchanged snapshot ships a
    * diff proportional to the CHANGE, not the table. */
  def diff(base: DataFrame, next: DataFrame, keyCols: Seq[String],
           opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "Snapshot.diff: keyCols must be non-empty")
    require(base.columns.toSet == next.columns.toSet,
      s"Snapshot.diff: column sets differ — base has ${base.columns.mkString(", ")}; " +
        s"next has ${next.columns.mkString(", ")}")
    val missingKey = keyCols.filterNot(base.columns.contains)
    require(missingKey.isEmpty,
      s"Snapshot.diff: key column(s) ${missingKey.mkString(", ")} not in the snapshots")
    require(!base.columns.contains(opCol),
      s"Snapshot.diff: snapshots already contain the op column '$opCol'")
    val payload = base.columns.toSeq
    val b = base.select(payload.map(c => col(c).as(s"__b_$c"))
      :+ lit(true).as("__b_present"): _*)
    val keyCond = keyCols.map(c => col(c) <=> col(s"__b_$c")).reduce(_ && _)
    val samePayload = payload.map(c => col(c) <=> col(s"__b_$c")).reduce(_ && _)
    val upserts = next.join(b, keyCond, "left")
      .filter(col("__b_present").isNull || !samePayload)
      .select(payload.map(col) :+ lit("upsert").as(opCol): _*)
    val n = next.select(keyCols.map(c => col(c).as(s"__n_$c")): _*)
    val delCond = keyCols.map(c => col(c) <=> col(s"__n_$c")).reduce(_ && _)
    val deletes = base.join(n, delCond, "left_anti")
      .select(payload.map(col) :+ lit("delete").as(opCol): _*)
    upserts.unionByName(deletes)
  }
}
