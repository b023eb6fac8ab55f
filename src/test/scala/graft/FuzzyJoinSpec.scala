package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FuzzyJoin

/** PassJoin fuzzy self-join: pinned EQUAL to the all-pairs levenshtein
  * ground truth (sound + complete, not just high recall). */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark

  /** Distinct part names + planted one/two-edit variants + shorts. */
  private def names = {
    import spark.implicits._
    val base = SparkT.table("part")
      .select(lower(col("p_name")).as("s")).distinct()
      .collect().map(_.getString(0)).toSeq
    val planted = base.take(20).zipWithIndex.flatMap { case (s, i) =>
      Seq(
        s.updated(s.length / 2, 'z'),              // 1 substitution
        s.drop(1),                                 // 1 deletion
        "x" + s.updated(0, 'q'))                   // distance 2
        .map(v => s"$v#$i") // suffix keeps planted variants distinct
        .map(v => v.dropRight(2 + (i / 10))) // vary lengths a bit
    }
    val shorts = Seq("a", "ab", "b", "xy", "", "abc")
    (base ++ planted ++ shorts).distinct
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
  }

  test("selfPairs equals the all-pairs levenshtein ground truth (k=2)") {
    import spark.implicits._
    val df = names.toDF("id", "s")
    val got = FuzzyJoin.selfPairs(df, "id", "s", maxDistance = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val local = names
    val want = (for {
      (ia, sa) <- local; (ib, sb) <- local if ia < ib
      d = levenshteinRef(sa, sb) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(want.nonEmpty, "fixture produced no close pairs — test is vacuous")
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("selfPairs k=0 finds exactly the duplicate strings") {
    import spark.implicits._
    val df = Seq((1L, "alpha"), (2L, "alpha"), (3L, "beta"), (4L, "alphA"))
      .toDF("id", "s")
    val got = FuzzyJoin.selfPairs(df, "id", "s", maxDistance = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)))
  }

  test("null strings never match; negative k refused") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "x")).toDF("id", "s")
    assert(FuzzyJoin.selfPairs(df, "id", "s", 2).count() == 0)
    intercept[IllegalArgumentException] {
      FuzzyJoin.selfPairs(df, "id", "s", -1)
    }
  }

  test("segments: contiguous, exhaustive, deterministic") {
    for (m <- 0 to 40; k <- 0 to 4) {
      val segs = FuzzyJoin.segments(m, k)
      assert(segs.length == k + 1)
      assert(segs.map(_._2).sum == m)
      segs.sliding(2).foreach {
        case Seq((s1, l1), (s2, _)) => assert(s2 == s1 + l1)
        case _ =>
      }
    }
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
