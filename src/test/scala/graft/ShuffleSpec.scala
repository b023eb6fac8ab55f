package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Shuffle

/** Epoch-shuffle contracts: permutation, epoch decorrelation,
  * partition-layout independence (the property `rand(seed)` lacks),
  * and the single-range-exchange plan shape. */
class ShuffleSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark

  private def docs = SparkT.table("documents").select(col("doc_id"))

  test("epochShuffle is a permutation: same multiset of ids, new order") {
    val shuffled = Shuffle.epochShuffle(docs, "doc_id", epoch = 1)
    val ids = shuffled.collect().map(_.getLong(0))
    assert(ids.length == docs.count())
    assert(ids.toSet == docs.collect().map(_.getLong(0)).toSet)
    // and it actually shuffles: the order is not the sorted-id order
    assert(!(ids sameElements ids.sorted))
    // avalanche contract — the reason for the xorshift rounds: a pure
    // affine (LCG) key is MONOTONE for small consecutive ids, leaving
    // the corpus in id order. Require near-total adjacency destruction.
    val pos = ids.zipWithIndex.toMap
    val adjacentSurvivors = ids.sorted.sliding(2).count {
      case Array(a, b) => pos.get(b).exists(pb => (pos(a) - pb).abs == 1)
      case _ => false
    }
    assert(adjacentSurvivors <= 5,
      s"$adjacentSurvivors adjacent-id pairs still adjacent — key is not mixing")
  }

  test("different epochs give different orders; same epoch reproduces exactly") {
    val e1 = Shuffle.epochShuffle(docs, "doc_id", 1).collect().map(_.getLong(0))
    val e2 = Shuffle.epochShuffle(docs, "doc_id", 2).collect().map(_.getLong(0))
    val e1again = Shuffle.epochShuffle(docs, "doc_id", 1).collect().map(_.getLong(0))
    assert(!(e1 sameElements e2), "epochs must decorrelate")
    assert(e1 sameElements e1again, "same epoch must reproduce exactly")
  }

  test("order is independent of partition layout (rand(seed) is not)") {
    val base = Shuffle.epochShuffle(docs, "doc_id", 5).collect().map(_.getLong(0))
    val relaid = Shuffle.epochShuffle(docs.repartition(7), "doc_id", 5)
      .collect().map(_.getLong(0))
    assert(base sameElements relaid,
      "the permutation must not depend on how the input happens to be partitioned")
  }

  test("plan: one range exchange, no hash exchange, no single-partition window") {
    val q = Shuffle.epochShuffle(docs, "doc_id", 3)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"), p.take(800))
    assert(!p.contains("Exchange hashpartitioning"), p.take(800))
    assert(!p.contains("Window"), "no global window allowed:\n" + p.take(800))
  }

  test("epochShuffle rejects negative epochs") {
    intercept[IllegalArgumentException] {
      Shuffle.epochShuffle(docs, "doc_id", -1)
    }
  }

  test("shuffleKey raises on a negative id (engine >>/% divergence guard)") {
    import spark.implicits._
    val bad = Seq(3L, -1L, 7L).toDF("doc_id")
    val e = intercept[Exception] {
      Shuffle.epochShuffle(bad, "doc_id", 0).collect()
    }
    assert(e.getMessage.contains("non-negative"), e.getMessage)
  }
}
