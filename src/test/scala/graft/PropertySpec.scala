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

  private val textGen: Gen[List[String]] = {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    Gen.listOfN(40, Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" "))))
  }

  test("repetitionRatio stays in [0,1) and is 0 iff all n-grams distinct") {
    (1 to trials).foreach { s =>
      val texts = sample(textGen, 100L + s)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val got = df.select(col("id"),
        graft.functions.textfns.repetitionRatio(col("t"), 3).as("r"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val r = got(i.toLong)
        assert(r >= 0.0 && r < 1.0, s"seed $s doc $i: $r")
        val ws = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
        val grams = ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
        val expect = if (grams.isEmpty) 0.0
          else 1.0 - grams.distinct.size.toDouble / grams.size.toDouble
        assert(math.abs(r - expect) < 1e-12, s"seed $s doc $i: $r vs $expect")
      }
    }
  }

  test("chunking invariant: stride-W windows reassemble the normalized text") {
    // W = S (no overlap): concatenating the chunks reproduces the
    // normalized word sequence exactly — nothing lost, nothing doubled
    val W = 7
    (1 to trials).foreach { s =>
      val texts = sample(textGen, 200L + s).filter(_.trim.nonEmpty)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val d = df.select(col("id"),
          split(graft.functions.textfns.normalizeText(col("t")), " ").as("w"))
        .withColumn("nw", size(col("w")))
      val nChunks = when(col("nw") <= W, lit(1L))
        .otherwise(ceil((col("nw") - lit(W)).cast("double") / W).cast("long") + 1L)
      val chunks = d
        .withColumn("cid", explode(sequence(lit(0L), nChunks - 1)))
        .select(col("id"), col("cid"),
          concat_ws(" ", slice(col("w"), col("cid").cast("int") * W + 1, lit(W))).as("chunk"))
        .collect().groupBy(_.getLong(0))
      texts.zipWithIndex.foreach { case (t, i) =>
        val joined = chunks(i.toLong).sortBy(_.getLong(1)).map(_.getString(2))
          .filter(_.nonEmpty).mkString(" ")
        val norm = t.toLowerCase.trim.replaceAll("\\s+", " ")
        assert(joined == norm, s"seed $s doc $i")
      }
    }
  }

  test("heavyHitters == exact GROUP BY HAVING over random zipf-ish streams") {
    // random streams with planted skew: the Misra-Gries candidate
    // superset + exact-verify pipeline must equal the direct
    // aggregation for EVERY stream and capacity that satisfies the
    // recall precondition — across partitionings (merge paths differ)
    val streamGen: Gen[List[String]] = for {
      nHot <- Gen.choose(1, 5)
      hots <- Gen.listOfN(nHot, Gen.zip(
        Gen.identifier.map(_.take(6)), Gen.choose(50, 300)))
      tailN <- Gen.choose(500, 3000)
    } yield {
      val hot = hots.flatMap { case (w, n) => List.fill(n)("hot_" + w) }
      val tail = (0 until tailN).map(i => s"t$i").toList
      hot ++ tail
    }
    (1 to trials).foreach { s =>
      val words = sample(streamGen, 3000L + s)
      val parts = 1 + (s % 4) * 3 // exercise single- and multi-partition merges
      val df = spark.createDataset(words).repartition(parts).toDF("w")
      val frac = 0.01
      val total = words.size
      val thresh = math.ceil(total * frac).toLong
      val expected = words.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= thresh).toMap
      val got = graft.operators.Freq.heavyHitters(df, "w", minFraction = frac)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed $s parts $parts total $total")
    }
  }

  test("groupedHeavyHitters == per-group HAVING over random grouped streams") {
    // the grouped form under the same regime, with group sizes varying
    // by 10×: each group's threshold derives from ITS total, so an
    // item hot only in a small group must surface there and nowhere
    // else — across partitionings (per-group sketch merge paths)
    (1 to trials).foreach { s =>
      val rnd = new scala.util.Random(9000 + s)
      val nGroups = 2 + rnd.nextInt(3)
      val rows = (0 until nGroups).flatMap { g =>
        val gname = s"g$g"
        val scale = 1 + g * 3
        val hot = (0 until 1 + rnd.nextInt(3)).flatMap { i =>
          List.fill((20 + rnd.nextInt(60)) * scale)(s"hot_${g}_$i")
        }
        val tail = (0 until (100 + rnd.nextInt(300)) * scale).map(i => s"t$i")
        (hot ++ tail).map((gname, _))
      }
      val parts = 1 + (s % 4) * 3
      val df = rows.toDF("g", "w").repartition(parts)
      val frac = 0.02
      val expected = rows.groupBy(_._1).flatMap { case (g, ws) =>
        val thresh = math.ceil(ws.size * frac).toLong
        ws.groupBy(_._2).view.mapValues(_.size.toLong)
          .filter(_._2 >= thresh)
          .map { case (w, n) => (g, w) -> n }
      }.toMap
      val got = graft.operators.Freq
        .groupedHeavyHitters(df, Seq("g"), "w", minFraction = frac)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == expected, s"seed $s parts $parts: " +
        s"missing=${(expected.keySet -- got.keySet).take(4)} " +
        s"extra=${(got.keySet -- expected.keySet).take(4)}")
    }
  }

  test("spanning LSH clusters == ground-truth duplicate classes over random corpora") {
    // randomized structural check for the threshold=1.0 spanning path:
    // K distinct base texts, each duplicated a random number of times
    // under shuffled ids — the spanning pairs' connected components
    // must recover EXACTLY the planted classes (and the pair count
    // must stay linear: sum(m_i - 1), never the clique's quadratic)
    val wordBank = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
    (1 to trials).foreach { s =>
      val rnd = new scala.util.Random(s)
      val nClasses = 3 + rnd.nextInt(5)
      // base texts pairwise distinct (distinct word SETS, ≥ 4 words so
      // 3-gram shingles exist)
      val bases = (0 until nClasses).map { c =>
        rnd.shuffle(wordBank).take(4 + rnd.nextInt(4)).mkString(" ") +
          s" marker${c}tag"
      }
      val mults = bases.indices.map(_ => 1 + rnd.nextInt(6))
      val rows = rnd.shuffle(bases.zip(mults).zipWithIndex.flatMap {
        case ((text, m), c) => (0 until m).map(_ => (c, text))
      }).zipWithIndex.map { case ((c, text), id) => (id.toLong, c, text) }
      val df = rows.map { case (id, _, text) => (id, text) }.toDF("doc_id", "text")
      val pairs = graft.dedup.Dedup.minHashLshPairs(df, "doc_id", "text",
        shingleN = 3, k = 16, bands = 4, threshold = 1.0, spanning = true)
      val expectedPairs = mults.map(m => (m - 1).toLong).sum
      assert(pairs.count() == expectedPairs,
        s"seed $s: expected linear pair count $expectedPairs")
      val clusters = graft.dedup.Dedup.duplicateClusters(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val truth = rows.groupBy(_._2).values.map(_.map(_._1).toSet)
        .filter(_.size > 1).toSet
      val got = clusters.groupBy(_._2).values.map(_.keys.toSet).toSet
      assert(got == truth, s"seed $s: clusters $got != planted $truth")
    }
  }

  test("FuzzyJoin.selfPairs == brute-force levenshtein over random corpora (k=0..2)") {
    // randomized soundness+completeness for the PassJoin path,
    // including the representative collapse: small alphabet + short
    // lengths force heavy duplication, shared segments, and dense
    // near-pairs — the regimes where an off-by-one in the position
    // window or the expansion would show
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(identity)
      for (i <- 1 to b.length) {
        var prev = d(0); d(0) = i
        for (j <- 1 to a.length) {
          val t = d(j)
          d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
            prev + (if (a(j - 1) == b(i - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length)
    }
    (1 to trials).foreach { s =>
      val rnd = new scala.util.Random(1000 + s)
      val n = 25 + rnd.nextInt(20)
      val strs = (0 until n).map { _ =>
        val len = rnd.nextInt(7) // 0..6 — includes empty + short-arm
        (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      val rows = strs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = rows.toDF("id", "s")
      for (k <- 0 to 2) {
        val got = graft.operators.FuzzyJoin.selfPairs(df, "id", "s", k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val want = (for {
          (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
          d = lev(sa, sb) if d <= k
        } yield (ia, ib, d)).toSet
        assert(got == want, s"seed $s k=$k: missing=${(want -- got).take(4)} " +
          s"extra=${(got -- want).take(4)}")
      }
    }
  }

  test("FuzzyJoin.linkPairs == brute-force cross levenshtein over random corpora (k=0..2)") {
    // the linkage (R-S) form under the same hostile regime: tiny
    // alphabet, short strings, heavy duplication on BOTH sides —
    // duplicates must expand to full m×n blocks, distance-0 cross
    // matches must surface, and the asymmetric probe/candidate key
    // coverage must hold for every length combination
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(identity)
      for (i <- 1 to b.length) {
        var prev = d(0); d(0) = i
        for (j <- 1 to a.length) {
          val t = d(j)
          d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
            prev + (if (a(j - 1) == b(i - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length)
    }
    (1 to trials).foreach { s =>
      val rnd = new scala.util.Random(5000 + s)
      def corpus(m: Int, off: Long) = (0 until m).map { i =>
        val len = rnd.nextInt(7)
        (off + i,
          (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      }
      val l = corpus(20 + rnd.nextInt(15), 0L)
      val r = corpus(20 + rnd.nextInt(15), 10000L)
      val ldf = l.toDF("id", "s"); val rdf = r.toDF("id", "s")
      for (k <- 0 to 2) {
        val got = graft.operators.FuzzyJoin
          .linkPairs(ldf, "id", "s", rdf, "id", "s", k)
          .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
        val want = (for {
          (ia, sa) <- l; (ib, sb) <- r
          d = lev(sa, sb) if d <= k
        } yield (ia, ib, d)).toSet
        assert(got == want, s"seed $s k=$k: missing=${(want -- got).take(4)} " +
          s"extra=${(got -- want).take(4)}")
      }
    }
  }

  test("hamming64Pairs: pigeonhole completeness — every ≤maxHamming pair found") {
    // the structural guarantee the perceptual/SimHash tier rests on:
    // splitting a 64-bit signature into maxHamming+1 blocks means any
    // pair within maxHamming shares at least one unchanged block, so
    // candidate generation can NEVER miss a true pair (while buckets
    // stay under bucketCap). Property-checked: random base sigs, each
    // perturbed by flipping 0..maxHamming RANDOM bit positions
    // (including positions in the uncovered high bits when 64 doesn't
    // divide evenly) — the (base, variant) pair must always surface
    // with the exact popcount distance.
    (1 to trials).foreach { s =>
      val rnd = new scala.util.Random(s * 7919L)
      val maxHamming = 1 + rnd.nextInt(7) // blocks ∈ [2, 8]
      val n = 40
      val rows = (0 until n).flatMap { i =>
        val base = rnd.nextLong()
        val flips = rnd.nextInt(maxHamming + 1)
        val positions = rnd.shuffle((0 until 64).toList).take(flips)
        val variant = positions.foldLeft(base)((v, p) => v ^ (1L << p))
        Seq((i.toLong, base), (i.toLong + 1000L, variant))
      }
      val sigs = rows.toDF("id", "sig")
      val found = graft.dedup.Dedup.hamming64Pairs(sigs, maxHamming)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      rows.grouped(2).foreach { pair =>
        val Seq((idA, a), (idB, b)) = pair
        val dist = java.lang.Long.bitCount(a ^ b)
        assert(found.get((idA, idB)).orElse(found.get((idB, idA)))
          .contains(dist),
          s"seed $s maxHamming $maxHamming: planted pair ($idA,$idB) at " +
            s"distance $dist not found or wrong distance (got ${found.get((idA, idB))})")
      }
    }
  }
}
