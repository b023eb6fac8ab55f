package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** Dev drive: bucketed catalog write + exchange-free join (see
  * Tables.writeBucketed). Prints DRIVE_* lines for capture. */
object DriveBucketed {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Tables.writeBucketed(orders, "orders_bb", "o_orderkey", 8)
    Tables.writeBucketed(li, "lineitem_bb", "o_orderkey", 8)
    // force the sort-merge path: broadcast would hide the exchange
    // question entirely (and silently disable bucketed scans)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = spark.table("lineitem_bb").join(spark.table("orders_bb"), "o_orderkey")
    val n = j.count()
    val plan = j.queryExecution.executedPlan.toString
    println("DRIVE_ROWS=" + n)
    println("DRIVE_EXCHANGES=" + "Exchange hashpartitioning".r.findAllIn(plan).length)
    println("DRIVE_SMJ=" + plan.contains("SortMergeJoin"))
    println("DRIVE_BUCKETED_SCAN=" + "Bucketed: true".r.findAllIn(plan).length)
    // probes: overwrite an existing bucketed table; join mismatched
    // bucket counts (one side must then shuffle, rows still correct)
    Tables.writeBucketed(orders, "orders_bb", "o_orderkey", 8)
    Tables.writeBucketed(orders, "orders_b4", "o_orderkey", 4)
    println("DRIVE_OVERWRITE_OK=true")
    val j2 = spark.table("lineitem_bb").join(spark.table("orders_b4"), "o_orderkey")
    println("DRIVE_MISMATCH_ROWS=" + j2.count())
    spark.stop()
  }
}
