package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen framework warmup so the first timed query doesn't
    // absorb session initialization cost
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(100).count()
    spark.range(100000L).selectExpr("sum(id)").collect()
    // a failing query must NOT masquerade as a normal timing: its slot
    // is null in "queries" and its name + error go to "failed"
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case t: Throwable => Some(Option(t.getMessage).getOrElse(t.getClass.getName))
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, err) =>
      s"\"" + k + "\":" + (if (err.isDefined) "null" else v.toString)
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(e)) =>
      s"""{"query":"$k","error":${jsonStr(e)}}"""
    }.mkString("[", ",", "]")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }

  private def jsonStr(s: String): String =
    "\"" + s.take(200).flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
