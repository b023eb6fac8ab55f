package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark

  test("csv round-trips a table with header + inferred schema") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/nation"
    val nation = SparkT.table("nation")
    nation.write.option("header", "true").csv(dir)
    val back = Tables.csv(spark, dir)
    assert(back.count() == nation.count())
    assert(back.columns.toSeq == nation.columns.toSeq)
    assert(back.agg(sum("n_nationkey")).collect()(0).getLong(0) ==
      nation.agg(sum("n_nationkey")).collect()(0).getLong(0))
  }

  test("json round-trips a table") {
    val dir = Files.createTempDirectory("graft_json").toString + "/region"
    val region = SparkT.table("region")
    region.write.json(dir)
    val back = Tables.json(spark, dir)
    assert(back.count() == region.count())
    assert(back.select("r_name").exceptAll(region.select("r_name")).count() == 0)
  }

  test("registerAll exposes every table to spark.sql") {
    Tables.registerAll(spark, SparkT.sfDir)
    val n = spark.sql(
      "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()(0).getLong(0)
    assert(n > 0)
  }
}
