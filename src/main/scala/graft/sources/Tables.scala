package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the test corpus layout (`<sfDir>/<name>.parquet`)
  * plus generic readers. Parquet is the primary source — columnar,
  * splittable, predicate-pushdown-capable — matching how the reference
  * ingests Arrow-backed columnar data (reference: R/tbl-gpu.R,
  * src/transfer_io.cpp).
  */
object Tables {
  val tpchTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val allTables: Seq[String] = tpchTables ++ Seq("events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view for `spark.sql` use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    allTables.foreach(t => load(spark, sfDir, t).createOrReplaceTempView(t))

  def csv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true").csv(path)

  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
