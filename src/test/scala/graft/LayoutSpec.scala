package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Z-order layout: bit-interleave correctness plus the MEASURED
  * locality claim — the point of the operator is that every written
  * file covers a small bounding box of ALL clustered columns, so the
  * spec computes the per-file boxes both ways and requires the
  * z-order layout to beat the linear sort by a wide margin. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark

  private def lineitem = SparkT.table("lineitem")

  test("mortonKey matches a reference interleave on exhaustive small values") {
    import spark.implicits._
    def ref(a: Long, b: Long, bits: Int): Long = {
      var z = 0L
      for (j <- 0 until bits) {
        z |= ((a >> j) & 1L) << (2 * j)
        z |= ((b >> j) & 1L) << (2 * j + 1)
      }
      z
    }
    val pairs = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.mortonKey(col("a"), col("b"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == ref(a, b, 4), s"($a,$b)")
    }
    // the 4-bit curve over 16x16 is a bijection onto [0,256)
    assert(got.values.toSet.size == 256)
  }

  test("mortonKey raises on out-of-range and null inputs") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((256L, 0L)).toDF("a", "b")
        .select(Layout.mortonKey(col("a"), col("b"), 8)).collect()
    }
    assert(e.getMessage.contains("must be in [0, 256)"), e.getMessage)
    val n = intercept[Exception] {
      Seq((Option.empty[Long], Some(1L))).toDF("a", "b")
        .select(Layout.mortonKey(col("a"), col("b"), 8)).collect()
    }
    assert(n.getMessage.contains("NULL"), n.getMessage)
    intercept[IllegalArgumentException] {
      Layout.mortonKey(col("a"), col("b"), 0)
    }
  }

  test("zOrderKey rank normalization isolates a heavy hitter (equi-depth, not equi-width)") {
    import spark.implicits._
    // 90% of values are 7 (heavy hitter), the rest spread 10..1000.
    // Equi-WIDTH bucketing would mix the hitter with values 10..62 in
    // bucket 0 of a 0..1000 range; equi-depth cuts put the hitter
    // strictly below every other value's bucket, so the hitter's key
    // is shared with NO other value.
    val d = ((1 to 900).map(_ => (7, 7)) ++ (1 to 100).map(i => (i * 10, i * 10)))
      .toDF("x", "y")
    val keyed = d.withColumn("z", Layout.zOrderKey(d, Seq("x", "y"), bits = 4))
    val hitterKeys = keyed.filter(col("x") === 7).select("z").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(hitterKeys.size == 1)
    assert(keyed.filter(col("x") =!= 7 && col("z") === hitterKeys.head).count() == 0,
      "non-hitter rows share the heavy hitter's z-key")
  }

  /** Expected number of files a point predicate on ONE dimension must
    * read under min/max pruning: the sum over files of that
    * dimension's normalized min-max extent. The metric the layout
    * actually changes — with overlapping curve-segment boxes, sum of
    * AREAS stays ≈1 for any equal-count partition; what z-order buys
    * is bounding the worst single-column cost. */
  private def dimCosts(path: String, c1: String, c2: String): (Double, Double) = {
    val df = spark.read.parquet(path)
      .select(input_file_name().as("f"), col(c1).cast("double").as("x"),
        col(c2).cast("double").as("y"))
    val dom = df.agg(
      (max(col("x")) - min(col("x"))).as("dx"),
      (max(col("y")) - min(col("y"))).as("dy")).collect()(0)
    val r = df.groupBy("f").agg(
        (max(col("x")) - min(col("x"))).as("bx"),
        (max(col("y")) - min(col("y"))).as("by"))
      .agg(sum(col("bx") / dom.getDouble(0)).as("cx"),
        sum(col("by") / dom.getDouble(1)).as("cy")).collect()(0)
    (r.getDouble(0), r.getDouble(1))
  }

  test("zOrderWrite halves the worst-column scan cost vs a linear sort (measured)") {
    val tmp = Files.createTempDirectory("graft-zorder").toString
    val d = lineitem.select("l_partkey", "l_suppkey", "l_orderkey", "l_quantity")
    val nFiles = 32

    Layout.zOrderWrite(d, Seq("l_partkey", "l_suppkey"), s"$tmp/z", nFiles)
    // baseline: same file count, clustered by the FIRST column only
    d.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(s"$tmp/linear")

    val (zx, zy) = dimCosts(s"$tmp/z", "l_partkey", "l_suppkey")
    val (lx, ly) = dimCosts(s"$tmp/linear", "l_partkey", "l_suppkey")
    // linear by partkey: a suppkey-only predicate reads ALL files
    // (cost_y = nFiles); z-order: every file is narrow in BOTH dims
    // (measured ~9.5 vs 32 at this fixture — gate at 2x with margin)
    val zWorst = math.max(zx, zy); val lWorst = math.max(lx, ly)
    assert(zWorst * 2 < lWorst,
      f"z-order worst-dim cost $zWorst%.2f not 2x better than linear $lWorst%.2f")
    // the leading-column advantage of the linear sort survives on its
    // own dim, which is exactly the trade being bought
    assert(lx < zx)
    // and both layouts hold the same rows
    assert(spark.read.parquet(s"$tmp/z").count() == d.count())
  }

  test("zOrderWrite plan shape: one range exchange, key dropped from output") {
    val tmp = Files.createTempDirectory("graft-zorder-p").toString
    val d = lineitem.select("l_partkey", "l_suppkey", "l_orderkey").limit(1000)
    Layout.zOrderWrite(d, Seq("l_partkey", "l_suppkey"), s"$tmp/z", 4)
    val out = spark.read.parquet(s"$tmp/z")
    assert(out.columns.toSeq.sorted == Seq("l_orderkey", "l_partkey", "l_suppkey"))
  }

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".") && f.length() > 0) Seq(f)
      else Seq.empty
    walk(new java.io.File(dir))
  }

  test("compact: small files merge to the byte-target count, content exact") {
    val tmp = Files.createTempDirectory("graft-compact").toString
    val d = lineitem.select("l_orderkey", "l_quantity").limit(4000)
    d.repartition(20).write.parquet(s"$tmp/in")
    assert(parquetFiles(s"$tmp/in").length == 20)
    val stats = Layout.compact(spark, s"$tmp/in", s"$tmp/out",
      targetFileBytes = 1L << 30)
    assert(stats.filesBefore == 20 && stats.filesAfter == 1)
    val in = spark.read.parquet(s"$tmp/in")
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.exceptAll(in).isEmpty && in.exceptAll(out).isEmpty)
  }

  test("compact partitioned: per-directory byte targets — a skewed partition keeps several files, a tiny one gets exactly one") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact-p").toString
    // partition "big" ~50x the bytes of partition "small"
    val d = (0 until 51000).map { i =>
      (if (i < 50000) "big" else "small", i.toLong, s"payload_$i")
    }.toDF("p", "id", "s")
    d.repartition(8).write.partitionBy("p").parquet(s"$tmp/in")
    val bigBytes = parquetFiles(s"$tmp/in/p=big").map(_.length()).sum
    // target = half the big partition: big → 2 files, small → 1
    val stats = Layout.compact(spark, s"$tmp/in", s"$tmp/out",
      targetFileBytes = bigBytes / 2 + 1, partitionCols = Seq("p"))
    assert(parquetFiles(s"$tmp/out/p=big").length == 2,
      "skewed partition compacts to ITS OWN byte-derived count")
    assert(parquetFiles(s"$tmp/out/p=small").length == 1)
    assert(stats.filesAfter == 3)
    val in = spark.read.parquet(s"$tmp/in")
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.exceptAll(in).isEmpty && in.exceptAll(out).isEmpty,
      "compaction preserves content exactly, partition column included")
  }

  test("compact refusals: bad target, empty input, wrong partition col") {
    val tmp = Files.createTempDirectory("graft-compact-r").toString
    intercept[IllegalArgumentException] {
      Layout.compact(spark, tmp, s"$tmp/out", 0L)
    }
    intercept[IllegalArgumentException] {
      Layout.compact(spark, s"$tmp/nothing", s"$tmp/out", 1L << 20)
    }
    lineitem.select("l_orderkey").limit(10).write.parquet(s"$tmp/flat")
    intercept[IllegalArgumentException] {
      Layout.compact(spark, s"$tmp/flat", s"$tmp/out", 1L << 20,
        partitionCols = Seq("nope"))
    }
  }
}
