package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.api.GraftFrame

/** Property-style randomized checks: graft verb semantics vs direct
  * in-memory reference implementations, over seeded scalacheck
  * generators (deterministic — every failure is reproducible by seed).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkT.spark
  import spark.implicits._

  private val trials = 6

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val rowGen: Gen[List[(Option[Int], Double)]] =
    Gen.listOfN(120, Gen.zip(
      Gen.option(Gen.choose(-5, 5)), Gen.choose(-100.0, 100.0)))

  test("arrange: ascending nulls last, descending nulls first, values ordered") {
    (1 to trials).foreach { s =>
      val data = sample(rowGen, s)
      val df = data.toDF("k", "v")
      val asc = GraftFrame(df).arrange(GraftFrame.asc("k")).df
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
      val (ascVals, ascNulls) = asc.span(_.isDefined)
      assert(ascNulls.forall(_.isEmpty), s"seed $s: nulls must be last ascending")
      assert(ascVals.flatten.toSeq == ascVals.flatten.toSeq.sorted, s"seed $s")
      val desc = GraftFrame(df).arrange(GraftFrame.desc("k")).df
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
      val (descNulls, descVals) = desc.span(_.isEmpty)
      assert(descVals.forall(_.isDefined), s"seed $s: nulls must be first descending")
      assert(descVals.flatten.toSeq == descVals.flatten.toSeq.sorted.reverse, s"seed $s")
      assert(descNulls.length == ascNulls.length)
    }
  }

  test("join: na_matches='na' inner join equals the null-key-matching cross product") {
    (1 to trials).foreach { s =>
      val left = sample(rowGen, s).take(40)
      val right = sample(rowGen, s + 1000).take(40)
      val got = GraftFrame(left.toDF("k", "v"))
        .join(GraftFrame(right.toDF("k", "w")), Seq("k" -> "k"), "inner")
        .df.count()
      val want = left.map(_._1).map(lk =>
        right.count(r => r._1 == lk).toLong).sum
      assert(got == want, s"seed $s: got $got want $want")
    }
  }

  test("sliceMaxAgg == sliceMax == in-memory top-n per group") {
    (1 to trials).foreach { s =>
      val data = sample(rowGen, s).zipWithIndex.map { case ((k, v), i) =>
        (k.getOrElse(99), v, i.toLong)
      }
      val df = data.toDF("g", "v", "id")
      val n = 1 + (s % 3)
      val want = data.groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy { case (_, v, id) => (-v, id) }.take(n)
      }.toSet
      val viaAgg = GraftFrame(df).groupBy("g")
        .sliceMaxAgg(col("v"), n, col("id")).df
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
      val viaWin = GraftFrame(df).groupBy("g")
        .sliceMax(col("v"), n, col("id")).df
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
      assert(viaAgg == want, s"seed $s n=$n (agg)")
      assert(viaWin == want, s"seed $s n=$n (window)")
    }
  }

  test("summarise sum/mean/count agree with in-memory reference") {
    (1 to trials).foreach { s =>
      val data = sample(rowGen, s).map { case (k, v) => (k.getOrElse(0), v) }
      val got = GraftFrame(data.toDF("g", "v")).groupBy("g")
        .summarise("sm" -> sum(col("v")), "mn" -> avg(col("v")),
          "n" -> count(lit(1)))
        .df.collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
      data.groupBy(_._1).foreach { case (g, rows) =>
        val (sm, mn, n) = got(g)
        assert(math.abs(sm - rows.map(_._2).sum) < 1e-9, s"seed $s g=$g sum")
        assert(math.abs(mn - rows.map(_._2).sum / rows.length) < 1e-9, s"seed $s g=$g mean")
        assert(n == rows.length, s"seed $s g=$g n")
      }
    }
  }

  test("pivotLonger preserves every (id, metric, value) triple") {
    (1 to trials).foreach { s =>
      val data = sample(rowGen, s).zipWithIndex.map { case ((_, v), i) =>
        (i.toLong, v, v * 2 + 1)
      }
      val longd = GraftFrame(data.toDF("id", "a", "b"))
        .pivotLonger(Seq("a", "b")).df
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      val want = data.flatMap { case (id, a, b) =>
        Seq((id, "a", a), (id, "b", b))
      }.toSet
      assert(longd == want, s"seed $s")
    }
  }
}
