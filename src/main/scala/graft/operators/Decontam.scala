package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.hashfns

/** Train/test contamination check: how much of each corpus document is
  * covered by a benchmark (evaluation-set) corpus.
  *
  * The standard decontamination primitive for pretraining pipelines:
  * flag training documents whose n-gram overlap with any benchmark
  * text is high enough that keeping them would leak the test set.
  *
  * Scale contract: the benchmark side is SMALL by definition (eval
  * sets, not corpora) — its distinct shingles broadcast; the corpus
  * side explodes shingles scan-side (codegen kernel), probes the
  * broadcast set with an existence join (no shuffle of text or
  * shingles), and only (id, hit-count) pairs — partially aggregated
  * map-side — reach the one shuffle. A 100 TB corpus streams through
  * at scan speed.
  */
object Decontam {

  /** Per-document containment: (id, n_sh, n_hits, containment) where
    * `containment` = |distinct n-grams ∩ benchmark n-grams| /
    * |distinct n-grams|, 0.0 for unshingleable docs.
    *
    * ONE corpus scan: the shingle kernel runs once, `explode_outer`
    * keeps unshingleable docs (null shingle row), the broadcast probe
    * marks hits, and a single partial-aggregated groupBy yields both
    * the total and the hit count.
    */
  def containment(corpus: DataFrame, bench: DataFrame,
                  idCol: String, textCol: String,
                  shingleN: Int = 5): DataFrame = {
    val probe = bench
      .select(explode(hashfns.distinctWordShingles(col(textCol), shingleN)).as("sh"))
      .distinct()
      .withColumn("__hit", lit(1))
    val docSh = corpus
      .select(col(idCol), hashfns.distinctWordShingles(col(textCol), shingleN).as("shs"))
      .select(col(idCol), size(col("shs")).as("__n"),
        explode_outer(col("shs")).as("sh"))
    docSh.join(broadcast(probe), Seq("sh"), "left")
      .groupBy(idCol)
      .agg(max(col("__n")).as("n_sh"), count(col("__hit")).as("n_hits"))
      .select(col(idCol), col("n_sh"), col("n_hits"),
        when(col("n_sh") <= 0, lit(0.0))
          .otherwise(col("n_hits").cast("double")
            / col("n_sh").cast("double")).as("containment"))
  }

  /** Documents whose containment meets `threshold` — the rows a
    * decontamination pass would drop. */
  def contaminated(corpus: DataFrame, bench: DataFrame,
                   idCol: String, textCol: String,
                   threshold: Double, shingleN: Int = 5): DataFrame =
    containment(corpus, bench, idCol, textCol, shingleN)
      .filter(col("containment") >= threshold)
}
