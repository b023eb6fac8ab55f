package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, epoch-stable corpus shuffle — the data-ORDER
  * primitive of a pretraining pipeline (cf. the reference's sampling
  * utilities, R/utils.R; this is their corpus-scale counterpart).
  *
  * Training wants a DIFFERENT but REPRODUCIBLE permutation of the
  * corpus every epoch: rerunning epoch 7 after a preemption, or on a
  * different executor count, must produce byte-identical batch order,
  * and two epochs must be decorrelated. A seeded RNG shuffle gives
  * neither (Spark RNG streams are partition-indexed, so the layout of
  * the input decides the permutation); `ORDER BY rand(seed)` is
  * likewise partition-dependent. The shuffle key here is the same
  * overflow-safe affine-hash family as the mixture/split/resample
  * samplers (engine-stable integer arithmetic, DuckDB-replayable),
  * keyed on (id, epoch) with constants pairwise-independent from the
  * cur3/cur4/cur5 hashes.
  *
  * Scale shape: ONE range exchange (the global sort) is the entire
  * cost — identical to any sorted write: sample split points,
  * range-partition, sort within partitions. No window over an
  * unpartitioned frame, no driver materialization, so 1000 executors
  * each sort and emit their own range independently.
  */
object Shuffle {

  private val P = 2147483647L // 2^31 − 1 (prime); hash domain
  private val Mult = 69621L   // MINSTD-family multiplier, ≠ cur3/cur4/cur5's
  private val Add = 30011L
  private val EpochStride = 104729L

  /** The shuffle key: an affine map mod P keyed on epoch, then TWO
    * xorshift-multiply rounds.
    *
    * The nonlinear rounds are load-bearing: one affine map alone is
    * MONOTONE over any id range where id·Mult never wraps P (ids
    * 0..30k, i.e. every small corpus and the low end of every big
    * one), and composing affine maps just yields another affine map —
    * so a pure-LCG "shuffle" of consecutive ids is the identity order
    * locally. xor of a value with its own shifted self is not
    * expressible as an affine map mod P; two such rounds interleaved
    * with mod-P multiplies give measured avalanche (4/499 adjacent-id
    * pairs still adjacent after ordering; rank correlation ≈ −0.04;
    * 1/500 positions shared between epochs — ShuffleSpec pins the
    * contracts).
    *
    * The key is 31 bits, so distinct ids collide at the birthday rate
    * (~N²/2^32 pairs corpus-wide); the epoch-keyed pre-mix makes the
    * collision classes DIFFER per epoch, so a pair tied in one
    * epoch's order (broken by ascending id) is unordered-biased in no
    * other — without the pre-mix, ids congruent mod P would tie the
    * same way in every epoch.
    *
    * Every intermediate stays under 2^63 (max t·mult ≈ 2^32·22695477
    * < 2^57): no Spark Long wrap, no DuckDB BIGINT overflow error —
    * bit-for-bit replayable. xor and >> agree across engines because
    * every intermediate is non-negative (ids must be ≥ 0). */
  def shuffleKey(idCol: Column, epoch: Int): Column =
    decisionHash(idCol, Mult, Add + epoch.toLong * EpochStride, "shuffleKey")

  /** Avalanche-quality 31-bit hash of a non-negative id for per-row
    * DECISIONS (split membership, keep/drop sampling) as well as the
    * epoch orders: affine map mod P keyed by (`mult`, `add`), then two
    * xorshift-multiply rounds.
    *
    * The nonlinear rounds are load-bearing for THRESHOLD decisions
    * exactly as they are for orders: one affine step alone is MONOTONE
    * over any id range where id·mult never wraps P — with the
    * splitter's 48271 multiplier that is every id below ~35590, so a
    * fixture-scale corpus (and the dense low-id head of any real one)
    * would land 100% under the 0.8·P "train" threshold (measured:
    * the pre-fix cur4 put every fixture doc in train at all SFs, a
    * degenerate split the hash-matched oracle could not catch because
    * both sides computed the same monotone map).
    *
    * Distinct (`mult`, `add`) pairs keep decisions pairwise
    * independent across operators (mixture/split/resample/epoch).
    * Every intermediate stays under 2^63, xor/>> agree across engines
    * on the enforced non-negative domain — bit-for-bit replayable in
    * DuckDB (see the q47/cur4/cur5/cur6 oracles). */
  def decisionHash(idCol: Column, mult: Long, add: Long,
                   caller: String = "decisionHash"): Column = {
    // widen FIRST: shiftright on an IntegerType column is a Java int
    // shift, which masks the distance to 5 bits — `int >> 32` is a
    // no-op, so an int32 id column would mix differently than the same
    // ids stored as int64 (and differently than the DuckDB replay,
    // where BIGINT >> 32 really shifts), breaking the byte-identical
    // replay contract
    val idRaw = idCol.cast("long")
    // enforce the documented non-negativity precondition: engine >>
    // and % semantics diverge on negatives (Spark's % keeps the sign,
    // and >> on a negative sign-extends), so a negative id would
    // silently produce an engine-divergent decision — fail loudly at
    // the first bad row instead. NULL must fail the same way: a bare
    // `idRaw < 0` guard passes null through (null < 0 is null, which
    // CaseWhen treats as false), the hash comes out null, and every
    // downstream threshold CaseWhen silently routes the row to its
    // otherwise-branch — e.g. 100% of null-id docs landing in the
    // "test" split with no error.
    val id = when(idRaw.isNull || idRaw < 0, raise_error(concat(
      lit(s"$caller: id must be a non-negative long, got "),
      coalesce(idRaw.cast("string"), lit("NULL")))))
      .otherwise(idRaw)
    // Fold the HIGH 32 id bits in (salted) BEFORE the mod-P reduction:
    // a bare `id % P` first step would give every pair of ids
    // congruent mod P an identical key under EVERY salt — a
    // systematic bias at corpora past 2^31 documents.
    val t0 = id.bitwiseXOR(shiftright(id, 32) + lit(add))
    val t1 = ((t0 % lit(P)) * lit(mult) + lit(add)) % lit(P)
    val t2 = t1.bitwiseXOR(shiftright(t1, 15))
    val h1 = (t2 * lit(1664525L) + lit(1013904223L)) % lit(P)
    val t3 = h1.bitwiseXOR(shiftright(h1, 13))
    (t3 * lit(22695477L) + lit(77557187L)) % lit(P)
  }

  /** `df` in the epoch's shuffled order. The output ordering IS the
    * result — feed it straight to a sharded sequential write. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int): DataFrame = {
    require(epoch >= 0, s"epochShuffle: epoch must be non-negative, got $epoch")
    df.orderBy(shuffleKey(col(idCol), epoch).asc, col(idCol).asc)
  }

  private val StratMult = 16807L // MINSTD original; ≠ every other sampler's
  private val StratAdd = 49297L

  /** Deterministic stratified fixed-SIZE sample: exactly
    * min(n, |stratum|) rows per stratum, membership decided by ranking
    * the stratum's rows under the avalanche [[decisionHash]] (own
    * constants, pairwise independent of the mixture/split/resample/
    * epoch hashes) with ascending-id tiebreak. The per-COUNT
    * counterpart of cur3's per-source rates: rate-based sampling
    * cannot promise "exactly 500 docs per language" for an eval set,
    * and a seeded `ORDER BY rand()` per stratum is partition-layout
    * dependent — this reproduces exact membership across engines,
    * reruns, and cluster sizes.
    *
    * Scale shape: rides the BoundedTopK partial aggregate (q34's
    * physical path) — every task keeps at most n candidate rows per
    * stratum, so the shuffle moves ≤ n·tasks rows per stratum instead
    * of window-sorting whole strata (a 10-billion-row stratum costs
    * its scan plus n rows per task, never a stratum-wide sort).
    */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], idCol: String,
                       n: Int): DataFrame = {
    require(strataCols.nonEmpty, "stratifiedSample: need at least one stratum column")
    require(n > 0, s"stratifiedSample: n must be positive, got $n")
    val hashed = df.withColumn("__strat_h",
      decisionHash(col(idCol), StratMult, StratAdd, "stratifiedSample"))
    graft.api.GraftFrame(hashed)
      .groupBy(strataCols: _*)
      .sliceMinAgg(col("__strat_h"), n, col(idCol))
      .df
      .drop("__strat_h")
  }

  private val PriMult = 40692L // L'Ecuyer MRG multiplier; ≠ every other sampler's
  private val PriAdd = 52361L

  /** Deterministic WEIGHTED sampling without replacement — priority
    * sampling (Duffield–Lund–Thorup, JACM 2007): item i gets priority
    * q_i = w_i / u_i with u_i uniform in (0, 1], the n highest
    * priorities are the sample, and each sampled item carries the
    * estimation weight ŵ_i = max(w_i, τ) where τ is the (n+1)-th
    * priority — the published scheme whose subset-sum estimates are
    * unbiased with near-optimal variance (Σŵ over any sampled subset
    * estimates that subset's true Σw). [[stratifiedSample]] answers
    * "exactly n docs per language"; this answers "n docs per language
    * PICKED PROPORTIONALLY to quality/length/importance, with the
    * reweighting factor training needs to stay unbiased".
    *
    * Determinism and replayability: u_i = (h_i + 1)/2³¹ with h_i the
    * avalanche [[decisionHash]] (own constants, pairwise independent
    * of the mixture/split/resample/stratified/epoch hashes), weights
    * quantize to integers at 1/`scale`, and the priority is the EXACT
    * integer floor(w_q · 2³¹ ÷ (h+1)) — rank order is pure BIGINT
    * arithmetic, bit-replayable in DuckDB, stable across engines,
    * reruns and cluster sizes (a float w/u ranking would tie-break on
    * libm ulps). Ties (same floored priority) break by ascending id.
    * τ and ŵ stay on the quantized-weight scale: priorities ARE
    * weight-unit values (q = w/u), so ŵ_q = max(w_q, τ_q) and one
    * double division converts back to user units.
    *
    * Contract: weights must be positive (null/≤0 after quantization
    * raises, naming the first bad row — a zero-weight doc in a
    * weighted sampler is a pipeline bug, not a doc to silently drop);
    * w_q must stay under 2³² so w_q·2³¹ fits a BIGINT (raise, not
    * wrap — pick `scale` accordingly, the documented contract). The
    * priority itself can then reach ~2⁶³ — beyond the 2⁵³ exactness
    * bound of the bounded aggregate's double-encoded ordering keys —
    * so the strata path orders on the SPLIT key (pri DIV 2³¹,
    * pri MOD 2³¹), each half < 2³² and exactly representable, which
    * preserves the full 63-bit rank order bit-for-bit.
    *
    * Scale shape: the strata path rides the BoundedTopK partial
    * aggregate exactly like [[stratifiedSample]] (every task keeps ≤
    * n+1 candidate rows per stratum — a billion-row stratum costs its
    * scan plus n+1 rows per task, never a sort); the global path is
    * one TakeOrdered. The (n+1)-th priority (τ) and the final
    * row_number both run over the ALREADY-SELECTED ≤ (n+1)·strata
    * rows.
    *
    * Output: df columns ++ (priority, est_weight), the ≤ n sampled
    * rows per stratum (all rows when a stratum has ≤ n; τ = 0 then,
    * so ŵ = w exactly — the DLT small-stratum contract). */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String, n: Int,
                     strataCols: Seq[String] = Nil,
                     scale: Long = 100L): DataFrame = {
    require(n > 0, s"prioritySample: n must be positive, got $n")
    require(scale >= 1, s"prioritySample: scale must be >= 1, got $scale")
    val missing = (strataCols ++ Seq(idCol, weightCol))
      .filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"prioritySample: input is missing column(s): ${missing.mkString(", ")}")
    val wqRaw = floor(col(weightCol).cast("double") * lit(scale.toDouble)
      + lit(0.5)).cast("long")
    val wq = when(wqRaw.isNull || wqRaw <= 0L, raise_error(concat(
        lit("prioritySample: weight must quantize positive at scale " +
          s"$scale, got "),
        coalesce(col(weightCol).cast("string"), lit("NULL")),
        lit(" for id "), col(idCol).cast("string"))))
      .when(wqRaw >= lit(4294967296L), raise_error(concat(
        lit(s"prioritySample: quantized weight overflows 2^32 at scale $scale: "),
        wqRaw.cast("string"), lit(" for id "), col(idCol).cast("string"))))
      .otherwise(wqRaw)
    val h = decisionHash(col(idCol), PriMult, PriAdd, "prioritySample") + lit(1L)
    val hashed = df
      .withColumn("__pri_wq", wq)
      .withColumn("__pri_h", h)
      .withColumn("__pri", expr("(__pri_wq * 2147483648L) DIV __pri_h"))
    // top-(n+1): the extra row is τ, the estimation threshold.
    // __pri can reach ~2^63 (wq up to 2^32−1, h as small as 1), but
    // BoundedTopK's ordering keys are exact only below 2^53 (the
    // double encoding) — so the aggregate orders on the SPLIT key
    // (hi, lo) = (__pri DIV 2^31, __pri MOD 2^31), both < 2^32 and
    // exactly double-representable, whose lexicographic descending
    // order IS __pri's descending order bit-for-bit. The tiebreak
    // slots encode ascending, so lo rides as −lo. The window re-rank
    // below stays on the exact BIGINT __pri itself.
    val selected =
      if (strataCols.nonEmpty)
        graft.api.GraftFrame(hashed)
          .groupBy(strataCols: _*)
          .sliceMaxAgg(expr("__pri DIV 2147483648L"), n + 1,
            negate(expr("__pri % 2147483648L")), col(idCol))
          .df
      else hashed.orderBy(col("__pri").desc, col(idCol).asc).limit(n + 1)
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col("__pri").desc, col(idCol).asc)
    val ranked = selected
      .withColumn("__rk", row_number().over(w))
      .withColumn("__tau",
        max(when(col("__rk") === n + 1, col("__pri"))).over(
          Window.partitionBy(strataCols.map(col): _*)))
    ranked.filter(col("__rk") <= n)
      .select(df.columns.map(col) ++ Seq(
        col("__pri").as("priority"),
        (greatest(col("__pri_wq"), coalesce(col("__tau"), lit(0L)))
          .cast("double") / lit(scale.toDouble)).as("est_weight")): _*)
  }
}
