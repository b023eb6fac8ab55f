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

  // ---- stratified fixed-size sampling ---------------------------------

  test("stratifiedSample: exactly min(n, stratum size) rows per stratum") {
    val d = SparkT.table("documents").select("doc_id", "source", "lang")
    val sizes = Shuffle.stratifiedSample(d, Seq("source"), "doc_id", 3)
      .groupBy("source").count().collect()
    val strata = d.select("source").distinct().count()
    assert(sizes.length == strata)
    val perStratum = d.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { r =>
      assert(r.getLong(1) == math.min(3L, perStratum(r.getString(0))))
    }
  }

  test("stratifiedSample: n larger than every stratum returns the whole frame") {
    val d = SparkT.table("documents").select("doc_id", "source")
    val out = Shuffle.stratifiedSample(d, Seq("source"), "doc_id", 1000000)
    assert(out.count() == d.count())
  }

  test("stratifiedSample membership is partition-layout independent") {
    val d = SparkT.table("documents").select("doc_id", "source")
    def ids(df: org.apache.spark.sql.DataFrame) =
      Shuffle.stratifiedSample(df, Seq("source"), "doc_id", 4)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(d) == ids(d.repartition(13)))
    assert(ids(d) == ids(d.repartition(1)))
  }

  test("stratifiedSample keeps all input columns and no helper column") {
    val d = SparkT.table("documents").select("doc_id", "source", "lang")
    val out = Shuffle.stratifiedSample(d, Seq("source"), "doc_id", 2)
    assert(out.columns.toSeq == Seq("doc_id", "source", "lang"))
  }

  test("stratifiedSample decorrelates from the split hash (independent constants)") {
    // if the sample hash reused cur4's split constants, the sampled
    // set would be exactly the lowest-hash head of the TRAIN split —
    // per-stratum samples must instead spread across splits roughly
    // like the 80/10/10 base rates. Weak-form check: at 20 strata × 5
    // docs the sample must NOT be 100% train.
    val d = SparkT.table("documents").select("doc_id", "source")
    val sampled = Shuffle.stratifiedSample(d, Seq("source"), "doc_id", 5)
      .withColumn("h", Shuffle.decisionHash(col("doc_id"), 48271L, 11213L))
      .withColumn("split",
        when(col("h") < 1717986917L, "train")
          .when(col("h") < 1932735282L, "valid").otherwise("test"))
    val nonTrain = sampled.filter(col("split") =!= "train").count()
    assert(nonTrain > 0, "stratified sample is the low head of the split hash")
  }

  test("stratifiedSample plan: bounded partial aggregate, no window sort") {
    val d = SparkT.table("documents").select("doc_id", "source")
    val q = Shuffle.stratifiedSample(d, Seq("source"), "doc_id", 5)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("graft_bounded_topk"), p.take(800))
    assert(!p.contains("Window"), "no window sort allowed:\n" + p.take(800))
  }
}
