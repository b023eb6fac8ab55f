package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.operators.{Freq, Shuffle, Skew}

/** Degenerate-input robustness: empty corpora and all-null columns are
  * routine at scale (empty partitions, filtered-out shards, corrupt
  * upstream batches) — every operator must return an empty/neutral
  * result, never throw. */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark

  private def emptyDocs: DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private def nullTextDocs: DataFrame = {
    import spark.implicits._
    Seq((1L, null: String), (2L, null: String), (3L, "real text here okay"))
      .toDF("doc_id", "text")
  }

  test("dedup family returns empty results on an empty corpus") {
    assert(Dedup.exact(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.minHashLshPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minHashLshPairs(emptyDocs, "doc_id", "text",
      threshold = 1.0, spanning = true).count() == 0)
    assert(Dedup.simHashPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.crossDedup(emptyDocs, emptyDocs, "doc_id", "text",
      threshold = 1.0, spanning = true).count() == 0)
    assert(Dedup.dedupNear(emptyDocs, "doc_id",
      Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text")).count() == 0)
  }

  test("null text never pairs, never throws; non-null rows still process") {
    val pairs = Dedup.minHashLshPairs(nullTextDocs, "doc_id", "text",
      threshold = 1.0, spanning = true)
    // null texts have no shingles: jaccard(∅,∅)=0 < 1.0 — no pairs
    assert(pairs.count() == 0)
    val kept = Dedup.exact(nullTextDocs, "text", "doc_id")
    // null != null in SQL semantics: two null-text documents are NOT
    // duplicates of each other, so ALL rows survive exact dedup
    assert(kept.count() == 3,
      s"null-text rows must not collapse into one group: ${kept.collect().toSeq}")
    // and the dup map reports no null-text row as anyone's duplicate
    assert(Dedup.exactDupMap(nullTextDocs, "text", "doc_id").count() == 0)
  }

  test("heavyHitters on an empty stream returns no hitters") {
    assert(Freq.heavyHitters(emptyDocs.select(col("text")), "text", 0.01)
      .count() == 0)
  }

  test("epochShuffle of an empty frame is empty; single row is itself") {
    import spark.implicits._
    assert(Shuffle.epochShuffle(emptyDocs, "doc_id", 1).count() == 0)
    val one = Seq((42L, "x")).toDF("doc_id", "text")
    assert(Shuffle.epochShuffle(one, "doc_id", 9).collect()
      .map(_.getLong(0)).toSeq == Seq(42L))
  }

  test("saltedSummarise and skewAwareJoin handle empty inputs") {
    import spark.implicits._
    val empty = emptyDocs.select(col("doc_id"),
      lit(1.0).as("v")).filter(lit(false))
    assert(Skew.saltedSummarise(empty, Seq("doc_id"), salts = 4,
      ("s", "v", "sum")).count() == 0)
    val right = Seq((1L, "a")).toDF("doc_id", "tag")
    assert(Skew.skewAwareJoin(emptyDocs, right, "doc_id",
      hotThreshold = 10, sampleFraction = 0.2).count() == 0)
  }

  test("hamming64Pairs: empty input is empty; >63 maxHamming refused") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "sig")
    assert(Dedup.hamming64Pairs(empty, maxHamming = 4).count() == 0)
    // maxHamming+1 pigeonhole blocks must fit in 64 bits — 64+ would
    // silently produce zero-width block keys instead of a guarantee
    intercept[IllegalArgumentException] {
      Dedup.hamming64Pairs(empty, maxHamming = 64)
    }
  }

  test("decisionHash raises on null and negative ids — no silent routing") {
    // a null id must NOT hash to null (downstream threshold CaseWhens
    // would silently route the row to their otherwise-branch, e.g.
    // every bad row into the "test" split) — it must raise
    import spark.implicits._
    val nulls = Seq[(java.lang.Long, String)]((null, "x")).toDF("doc_id", "t")
    val eN = intercept[Exception] {
      nulls.select(Shuffle.decisionHash(col("doc_id"), 48271L, 11213L)).collect()
    }
    assert(eN.getMessage != null)
    val negs = Seq((-1L, "x")).toDF("doc_id", "t")
    intercept[Exception] {
      negs.select(Shuffle.decisionHash(col("doc_id"), 48271L, 11213L)).collect()
    }
  }

  test("leakageSafeSplit: empty pairs = per-doc behavior, empty docs = empty") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val split = Dedup.leakageSafeSplit(docs, "doc_id", noPairs)
    assert(split.count() == 2)
    // with no pairs, every doc is its own cluster representative
    assert(split.filter(col("rep") =!= col("doc_id")).count() == 0)
    val emptyDocs2 = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.leakageSafeSplit(emptyDocs2, "doc_id", noPairs).count() == 0)
  }
}
