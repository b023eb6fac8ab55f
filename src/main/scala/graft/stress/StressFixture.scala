package graft.stress

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic stress fixtures — the measurement corpus
  * behind the 100 TB linearity claims (SURVEY §5).
  *
  * Every value derives from `xxhash64` of the row id, so a fixture is
  * bit-reproducible across runs WITHOUT stored state, and a scale-s
  * corpus has the same class-size DISTRIBUTION as a scale-10s corpus
  * (10× the classes at each size tier, plus a 10× larger boilerplate
  * class). That structural self-similarity is what makes a two-point
  * wall-time ratio a meaningful linearity probe: double the scale
  * doubles every tier, so a linear path's time must scale with the
  * data and a super-linear path's cannot hide.
  *
  * Document corpus (`total` rows; total = 5M at the prescribed stress
  * scale):
  *  - class 0: total/50 copies of one text — the "boilerplate page"
  *    (100k-fold at total=5M: the 10^5 duplicate class the round-7/8
  *    verdicts prescribe as the spanning-path hot case)
  *  - 10 classes of total/500 copies
  *  - 100 classes of total/5000 copies
  *  - total/500 classes of exactly 10 copies
  *  - 23/25 · total singletons
  * A duplicate is an identical text modulo a deterministic upper-case
  * variant (one row in three) that text normalization equalizes, so
  * the threshold-1.0 spanning dedup path must recover EXACTLY the
  * class partition. All the audit invariants are therefore closed
  * form — no oracle engine needed at 5M rows:
  *  - spanning pairs  = dupRows − dupClasses (occupancy−1 per class)
  *  - dedup survivors = nClasses
  *  - paragraph-dedup survivors (nonempty) = singletons (the shared
  *    header paragraph and every duplicated body paragraph are banned)
  *
  * Every doc is `header ∥ "\n\n" ∥ body`: the header repeats across
  * the 20 source groups (the txt13 boilerplate paragraph), the body
  * opens with a class-unique `cls<N>` token guaranteeing distinct
  * classes have distinct shingle sets, followed by 24 words drawn by
  * hash from a 1000-word vocabulary.
  *
  * Embeddings (total/5 base vectors + 100 planted twins): dim-64
  * uniform in [-1,1] from per-(id, coordinate) hashes; vector
  * `nEmb + q` is an exact copy of vector `q` for q < 100, so the
  * exact top-1 neighbor of each query q is its twin — the ANN
  * invariant (bruteForceTopK excludes only self-matches).
  *
  * Lineitem (6·total rows): every 100th row lands on hot orderkey 0
  * (300k-fold at stress scale), the tail spreads ≤7 rows per key; the
  * `grp` aggregation key sends HALF the corpus to one group ("HOT")
  * and the rest over 1000 tail groups. Quantities and prices are
  * integer-valued doubles so sums (and sums of products, cast to
  * long) are exact and order-independent — the salted/split-route
  * paths must match the plain plans bit-for-bit.
  */
object StressFixture {

  /** Closed-form row counts and invariants for a corpus of `total`
    * documents. `total` must be a multiple of 5000 so every class
    * tier divides evenly. */
  final case class StressPlan(total: Long) {
    require(total >= 5000 && total % 5000 == 0,
      s"StressPlan: total must be a positive multiple of 5000, got $total")
    /** rows in each of the four duplicated segments */
    val seg: Long = total / 50
    val bClassSize: Long = total / 500 // 10 classes
    val cClassSize: Long = total / 5000 // 100 classes
    val dClasses: Long = total / 500 // classes of exactly 10 copies
    val dupRows: Long = 4 * seg
    val singletons: Long = total - dupRows
    val dupClasses: Long = 111 + dClasses
    val nClasses: Long = dupClasses + singletons
    /** spanning emits occupancy−1 pairs per duplicate class, exactly */
    val expectedSpanningPairs: Long = dupRows - dupClasses
    /** first singleton doc id (bench docs for the decontam gate) */
    val firstSingleton: Long = 4 * seg

    val nEmb: Long = total / 5
    val nTwins: Long = 100L
    /** dd13 hot-cell case: one dense cluster (exact copies of one
      * off-corpus vector) of nEmb/50 members — 2% of the corpus in
      * ONE k-means cell, the SemDeDup worst case. */
    val blobSize: Long = nEmb / 50

    val nLineitem: Long = total * 6
    /** orderkey space: 0 (hot) plus the id/7 tail */
    val nOrderKeys: Long = nLineitem / 7 + 2
  }

  /** Closed-form counts for the fuzzy-join stress corpus of `total`
    * strings — the q52/q54 hot-case fixture:
    *  - ids [0, dupN): ONE string duplicated dupN-fold ("z"×17 — the
    *    boilerplate-title class the round-13 verdict prescribes;
    *    dupN = total/20, so 10k-fold at the prescribed total=200k)
    *  - ids [dupN, total): unique 17-char strings, g(id) = id·A mod
    *    10^16 zero-padded to 16 digits (A = 736583297561, coprime to
    *    10 ⇒ injective; the multiplication spreads consecutive ids
    *    across the digit space, so PassJoin segment grams carry ~8
    *    digits of entropy and buckets stay near-singleton — measured:
    *    max probe-bucket occupancy 1 at 1.9M strings. A STRUCTURED
    *    multiplier here silently recreates the shared-segment hot key
    *    and mis-measures the operator: the first choice, 10^12 − 11,
    *    kept id mod 10^4 in the top digits and a constant 9-run in
    *    the middle — 190-occupancy buckets, ~10^9 candidate pairs,
    *    and a 120 s stage that was fixture artifact, not operator
    *    cost) plus a mod-11 check
    *    character ('a'+g%11). Any single digit change d·10^p shifts
    *    g mod 11 by ±d ≠ 0 (10 ≡ −1 mod 11, 11 prime), so two
    *    distinct base strings always differ in ≥ 2 positions — and
    *    equal-length edit distance 1 requires exactly one differing
    *    position — hence NO accidental within-1 pairs. Every 100th
    *    single (j ≡ 1 mod 100) instead carries the PREVIOUS single's
    *    string with its first character (the masked MSD) replaced by
    *    'x' — a planted distance-1 pair. A variant collides with a
    *    non-base string only if the two g values differ solely in the
    *    masked digit, i.e. base ids differ by d·10^15·A⁻¹ mod 10^16 —
    *    minimum 10^15, unreachable at any corpus size this fixture
    *    permits (id·A must also fit signed 64-bit; both bounds are
    *    enforced by the require below). All invariants below are
    *    exact at maxDistance = 1.
    */
  final case class FuzzyPlan(total: Long) {
    require(total >= 2000 && total % 2000 == 0,
      s"FuzzyPlan: total must be a positive multiple of 2000, got $total")
    val dupN: Long = total / 20
    val nSingles: Long = total - dupN
    /** singles with j ≡ 1 (mod 100): one planted distance-1 pair each */
    val nPlanted: Long = nSingles / 100
    /** spanning selfPairs at k=1: dup-class star + planted rep pairs */
    val spanningPairs: Long = (dupN - 1) + nPlanted
    /** fuzzyDedup survivors: 1 dup-class rep + unpaired singles +
      * one rep per planted pair */
    val nClusters: Long = 1 + nSingles - nPlanted
    /** complete selfPairs at k=1: the dup-class clique + planted */
    val completePairs: Long = dupN * (dupN - 1) / 2 + nPlanted
  }

  private val FuzzyA = 736583297561L

  private def fuzzyG(baseNum: Column): Column =
    pmod(baseNum * lit(FuzzyA), lit(10000000000000000L))

  /** (fid, fstr) fuzzy corpus under the plan — see [[FuzzyPlan]]. */
  def fuzzyStrings(spark: SparkSession, p: FuzzyPlan): DataFrame = {
    require(p.total <= 8000000L,
      s"fuzzyStrings: total ${p.total} too large — id·A must stay in " +
        "signed 64-bit and variant base deltas far below 10^15")
    val j = col("id") - p.dupN
    val isVariant = pmod(j, lit(100L)) === 1
    val baseNum = when(isVariant, col("id") - 1).otherwise(col("id"))
    val g = fuzzyG(baseNum)
    val checkChars = "abcdefghijk".map(_.toString).toArray
    val base = concat(lpad(g.cast("string"), 16, "0"),
      element_at(lit(checkChars), (pmod(g, lit(11L)) + 1).cast("int")))
    spark.range(p.total).select(
      col("id").as("fid"),
      when(col("id") < p.dupN, lit("z" * 17))
        .when(isVariant, concat(lit("x"), substring(base, 2, 16)))
        .otherwise(base).as("fstr"))
  }

  /** Right-side catalog for the q55 linkage stress: the 16-digit base
    * string (check char DROPPED) of every non-variant single, ids
    * offset by 10^9. Each row's only within-1 left partner is its own
    * base (one deletion): a different base differs in ≥1 digit on top
    * of the deletion (the mod-11 check makes distinct bases differ in
    * ≥2 of their 17 positions, of which at most one is the dropped
    * check char); the dup class is 'z'×17; an 'x'-variant within 1 of
    * a 16-digit string would need the variant minus one char to be
    * all digits, but both its 'x' and its check char survive any
    * single deletion except their own, and deleting either still
    * leaves the other non-digit. So linkPairs at k=1 has EXACTLY
    * nSingles − nPlanted rows — linear, closed-form. */
  def fuzzyLinkRight(spark: SparkSession, p: FuzzyPlan): DataFrame =
    spark.range(p.dupN, p.total)
      .filter(pmod(col("id") - p.dupN, lit(100L)) =!= 1)
      .select((col("id") + 1000000000L).as("fid"),
        lpad(fuzzyG(col("id")).cast("string"), 16, "0").as("fstr"))

  /** Integer division as a Column (values stay well under 2^52, where
    * double division is exact). */
  private def idiv(a: Column, b: Long): Column =
    floor(a / lit(b.toDouble)).cast("long")

  /** Duplicate-class id of a document id under the plan. */
  def clsOf(p: StressPlan, id: Column): Column =
    when(id < p.seg, lit(0L))
      .when(id < 2 * p.seg, lit(1L) + idiv(id - p.seg, p.bClassSize))
      .when(id < 3 * p.seg, lit(11L) + idiv(id - 2 * p.seg, p.cClassSize))
      .when(id < 4 * p.seg, lit(111L) + idiv(id - 3 * p.seg, 10L))
      .otherwise(lit(111L + p.dClasses) + (id - lit(4 * p.seg)))

  /** Document text for a doc id: class-determined content plus a
    * deterministic case variant (1 row in 3) that normalization must
    * equalize — duplicates are "near", not byte-identical. */
  def textOf(p: StressPlan, id: Column): Column = {
    val cls = clsOf(p, id)
    val header =
      concat(lit("site header banner source "), pmod(cls, lit(20L)).cast("string"))
    val words = (1 to 24).map(i =>
      concat(lit("t"), pmod(xxhash64(cls, lit(i)), lit(1000L)).cast("string")))
    val body =
      concat_ws(" ", concat(lit("cls"), cls.cast("string")) +: words: _*)
    val t = concat(header, lit("\n\n"), body)
    when(pmod(id, lit(3L)) === 1, upper(t)).otherwise(t)
  }

  /** (doc_id, cls, text). `cls` is the ground-truth class label the
    * invariant checks aggregate over — dedup code under test never
    * sees it. */
  def docs(spark: SparkSession, p: StressPlan): DataFrame =
    spark.range(p.total).select(
      col("id").as("doc_id"),
      clsOf(p, col("id")).as("cls"),
      textOf(p, col("id")).as("text"))

  /** dim-64 embedding of an effective id, coordinates uniform on
    * [-1, 1] in steps of 1e-3. */
  private def embOf(eid: Column): Column =
    transform(sequence(lit(0), lit(63)),
      j => ((pmod(xxhash64(eid, j), lit(2001L)) - 1000L) / 1000.0).cast("float"))

  /** (vec_id, embedding): nEmb base vectors + nTwins exact copies of
    * vectors [0, nTwins) at ids [nEmb, nEmb + nTwins). */
  def embeddings(spark: SparkSession, p: StressPlan): DataFrame =
    spark.range(p.nEmb + p.nTwins).select(
      col("id").as("vec_id"),
      embOf(when(col("id") >= p.nEmb, col("id") - p.nEmb).otherwise(col("id")))
        .as("embedding"))

  /** (vec_id, embedding): [[StressPlan.blobSize]] EXACT copies of one
    * off-corpus vector (effective id 3·nEmb + 7 — never a corpus or
    * twin id, so the blob is cosine-1.0 only within itself) at ids
    * [2·nEmb, 2·nEmb + blobSize). Union with [[embeddings]] to plant
    * the dd13 hot-cell: the whole blob lands in one k-means cell at
    * one centroid distance, so the window plan must emit exactly
    * windowSize·B − windowSize·(windowSize+1)/2 within-blob pairs —
    * linear in B, never the B²/2 clique. */
  def denseBlob(spark: SparkSession, p: StressPlan): DataFrame =
    spark.range(p.blobSize).select(
      (col("id") + 2 * p.nEmb).as("vec_id"),
      embOf(lit(3 * p.nEmb + 7)).as("embedding"))

  /** (l_orderkey, grp, l_quantity): hot orderkey 0 takes 1% of rows,
    * the HOT group takes 50%; quantities are integer-valued doubles
    * in [1, 50]. */
  def lineitem(spark: SparkSession, p: StressPlan): DataFrame =
    spark.range(p.nLineitem).select(
      when(pmod(col("id"), lit(100L)) === 0, lit(0L))
        .otherwise(idiv(col("id"), 7L) + 1).as("l_orderkey"),
      when(pmod(xxhash64(col("id"), lit(2L)), lit(2L)) === 0, lit("HOT"))
        .otherwise(concat(lit("f"),
          pmod(xxhash64(col("id"), lit(3L)), lit(1000L)).cast("string")))
        .as("grp"),
      (pmod(xxhash64(col("id")), lit(50L)) + 1).cast("double").as("l_quantity"))

  /** (o_orderkey, o_totalprice): one row per orderkey, integer-valued
    * prices in [1, 10^6]. */
  def orders(spark: SparkSession, p: StressPlan): DataFrame =
    spark.range(p.nOrderKeys).select(
      col("id").as("o_orderkey"),
      (pmod(xxhash64(col("id"), lit(7L)), lit(1000000L)) + 1).cast("double")
        .as("o_totalprice"))

  /** Expected dd9 (cross-corpus dedup vs the every-10th-doc reference)
    * survivor count, computed by trivially-correct relational logic
    * over the ground-truth class column: a doc survives iff NO member
    * of its class is a reference doc (set-equality holds exactly
    * within a class; the reference-side self-match drops reference
    * docs themselves, matching the declared dd9 oracle's semantics). */
  def expectedCrossSurvivors(docsDf: DataFrame): Long =
    docsDf.groupBy("cls")
      .agg(count(lit(1)).as("n"),
        max(when(pmod(col("doc_id"), lit(10L)) === 0, 1).otherwise(0)).as("has_ref"))
      .filter(col("has_ref") === 0)
      .agg(coalesce(sum("n"), lit(0L))).collect()(0).getLong(0)

  /** Write the four fixture tables under `dir` unless already present
    * (the `_SUCCESS` of the last-written table is the marker). */
  def writeIfMissing(spark: SparkSession, dir: String, p: StressPlan): Unit = {
    if (Files.exists(Paths.get(s"$dir/orders.parquet/_SUCCESS"))) return
    docs(spark, p).write.mode("overwrite").parquet(s"$dir/docs.parquet")
    embeddings(spark, p).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    lineitem(spark, p).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    orders(spark, p).write.mode("overwrite").parquet(s"$dir/orders.parquet")
  }
}
