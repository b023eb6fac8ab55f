package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for graft's hot loops.
  *
  * Preference order per the Spark-first design: compose built-ins where
  * semantics allow; drop to a codegen'd `Expression` only where the
  * built-in composition (`zip_with` + `aggregate` higher-order
  * functions, which are interpreted per-element closures) would dominate
  * the profile. These four are exactly those cases: ANN scoring
  * (cosine), near-dup verification (hamming), and signature computation
  * (minhash/simhash) run once per row × per candidate over the whole
  * corpus.
  *
  * All participate in whole-stage codegen via `nullSafeCodeGen` emitting
  * calls to the static kernels in [[Kernels]].
  */

/** cosine(array<float>, array<float>) → double. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.Kernels.cosineF($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** dot(array<float>, array<float>) → double. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.Kernels.dotF($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** hamming64(bigint, bigint) → int — popcount of XOR. */
case class HammingDistance64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hamming64"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** minhash_sig(array<bigint> element-hashes) → array<bigint> of k mins. */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(a: Any): Any =
    Kernels.minHashSignature(a.asInstanceOf[ArrayData], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Kernels.minHashSignature($a, $k, ${seed}L);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** simhash64(array<bigint> element-hashes) → bigint. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(a: Any): Any =
    Kernels.simHash64(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Kernels.simHash64($a);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** shingle_hashes(string) → array<bigint>: distinct word-n-gram hashes. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(a: Any): Any =
    Kernels.shingleHashes(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Kernels.shingleHashes($a, $n);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** char_shingle_hashes(string) → array<bigint>: code-point n-grams. */
case class CharShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_char_shingle_hashes"

  override def nullSafeEval(a: Any): Any =
    Kernels.charShingleHashes(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Kernels.charShingleHashes($a, $n);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** word_shingles(string) → array<string>: word-n-gram strings —
  * distinct set by default, every occurrence with `all = true`. */
case class WordShingleStrings(child: Expression, n: Int, all: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String =
    if (all) "graft_word_shingles_all" else "graft_word_shingles"

  override def nullSafeEval(a: Any): Any =
    Kernels.wordShingleStrings(a.asInstanceOf[UTF8String], n, all)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Kernels.wordShingleStrings($a, $n, $all);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** text_stats(string) → struct: one-pass corpus text statistics
  * (stopword hits per language, token/punct/char counts) — see
  * [[Kernels.textStats]] for the exact regex-twin semantics. */
case class TextStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextStats.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_text_stats"

  override def nullSafeEval(a: Any): Any =
    Kernels.textStats(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Kernels.textStats($a);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("s_en", IntegerType, nullable = false),
    StructField("s_de", IntegerType, nullable = false),
    StructField("s_fr", IntegerType, nullable = false),
    StructField("s_es", IntegerType, nullable = false),
    StructField("s_zh", IntegerType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))
}

/** gopher_stats(string) → struct: one-pass Gopher hard-rule statistics
  * (word/char/symbol/alpha-word counts, line bullet/ellipsis counts,
  * distinct required stopwords) — see [[Kernels.gopherStats]] for the
  * exact regex-twin semantics. */
case class GopherStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = GopherStats.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_gopher_stats"

  override def nullSafeEval(a: Any): Any =
    Kernels.gopherStats(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Kernels.gopherStats($a);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object GopherStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_wchars", IntegerType, nullable = false),
    StructField("n_sym", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_bullet", IntegerType, nullable = false),
    StructField("n_ellipsis", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))
}

/** lsh_bands(array<bigint> signature) → array<bigint> of band keys. */
case class LshBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_lsh_bands"

  override def nullSafeEval(a: Any): Any =
    Kernels.lshBandKeys(a.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Kernels.lshBandKeys($a, $bands, $rowsPerBand);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** minhash_agreement(array<bigint>, array<bigint>) → double ∈ [0,1]. */
case class MinHashAgreement(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_agreement"

  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.minHashAgreement(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.Kernels.minHashAgreement($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** srp_bucket(array<float>) → bigint — packed LSH sign bits. */
case class SrpBucket(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_srp_bucket"

  override def nullSafeEval(a: Any): Any =
    Kernels.srpBucket(a.asInstanceOf[ArrayData], nBits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Kernels.srpBucket($a, $nBits, ${seed}L);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** srp_probes(array<float>) → array<bigint> — query-directed
  * multiprobe LSH codes: base bucket + lowest-|margin| bit flips.
  * See [[Kernels.srpProbes]]. */
case class SrpProbes(child: Expression, nBits: Int, seed: Long, probes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_srp_probes"

  override def nullSafeEval(a: Any): Any =
    Kernels.srpProbes(a.asInstanceOf[ArrayData], nBits, seed, probes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Kernels.srpProbes($a, $nBits, ${seed}L, $probes);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** fingerprint64(string) → bigint — polynomial rolling hash. */
case class PolyFingerprint(child: Expression, base: Long = 257L)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_fingerprint64"

  override def nullSafeEval(a: Any): Any =
    Kernels.polyFingerprint(a.asInstanceOf[UTF8String], base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Kernels.polyFingerprint($a, ${base}L);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** sorted_rank(array<double> sorted ASC, double) → bigint: the number
  * of array elements strictly below the probe (lower bound) — the
  * equi-depth bucket rank for z-order clustering. The composed
  * alternative (a chained `when(v > q, 1)` sum over 2^bits − 1 cut
  * literals) evaluates every comparison for every row — 255 branches
  * per column per written row at the default bits=8; this is one
  * O(log cuts) binary-search call inside codegen. Sortedness is the
  * caller's contract (approxQuantile output is non-decreasing); equal
  * consecutive cuts collapse to one boundary, exactly like the
  * strict-< count they replace. */
case class SortedRank(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sorted_rank"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<double>, double), " +
            s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.sortedRankD(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.Kernels.sortedRankD($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** sorted_contains(array<T> sorted ASC, T) → boolean for T ∈
  * {bigint, string} — binary-search membership probe for broadcast
  * banned/allow sets. `array_contains` scans linearly: at B set
  * elements × P probes that is O(P·B) work (the stress gate measured
  * paragraphDedup growing 25× for 10× data exactly because its banned
  * set grows WITH the corpus); this probe is O(P·log B). The string
  * flavor exists so md5-fingerprint sets keep their 128-bit collision
  * bound rather than degrading to a 64-bit rehash. The caller owns the
  * sortedness contract (build the set with `sort_array`; Spark's
  * string sort and `UTF8String.compareTo` are both binary-lexicographic
  * so they agree) and the no-null-elements contract. */
case class SortedContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sorted_contains"

  // analysis-time type gate: the kernels read raw ArrayData slots
  // (getLong / UTF8String), so a mistyped raw-expression use (e.g.
  // array<int>) would otherwise pass analysis and corrupt or
  // ClassCastException at execution. The Column/SQL wrappers cast, but
  // the expression must hold its own contract.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) |
           (ArrayType(StringType, _), StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<bigint>, bigint) or (array<string>, string), " +
            s"got (${l.simpleString}, ${r.simpleString})")
    }

  private def stringProbe: Boolean = right.dataType == StringType

  override def nullSafeEval(a: Any, b: Any): Any =
    if (stringProbe)
      Kernels.sortedContainsUtf8(a.asInstanceOf[ArrayData], b.asInstanceOf[UTF8String])
    else
      Kernels.sortedContains(a.asInstanceOf[ArrayData], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      if (stringProbe)
        s"${ev.value} = graft.expressions.Kernels.sortedContainsUtf8($a, $b);"
      else
        s"${ev.value} = graft.expressions.Kernels.sortedContains($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** sorted_intersect(array<bigint>, array<bigint>) → array<bigint>:
  * two-pointer intersection of ASC-sorted distinct long arrays (the
  * q64 adjacency-intersection kernel). `array_intersect` allocates a
  * boxed hash set per ROW; this is O(|a|+|b|) on primitive slots.
  * Caller owns the sorted+distinct contract on both inputs; output is
  * ASC-sorted, set-equal to array_intersect's. */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sorted_intersect"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<bigint>, array<bigint>), " +
            s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.sortedIntersectL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.Kernels.sortedIntersectL($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** window_digests(string, w) → array<struct<s,h1,h2>>: every sliding
  * w-word window of the normalized text as a (start, dual-64-bit
  * digest) row — see [[Kernels.windowDigestPairs]] for the fused
  * semantics and the collision standard. */
case class WindowDigests(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"graft_window_digests: w must be >= 1, got $w")
  override def dataType: DataType = WindowDigests.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_window_digests"

  override def nullSafeEval(a: Any): Any =
    Kernels.windowDigestPairs(a.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Kernels.windowDigestPairs($a, $w);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object WindowDigests {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)
}

/** Column-level API + SQL registration for the native expressions. */
object GraftFunctions {

  // Column builders cast array inputs to the kernel element type: the
  // expressions skip analysis-time type checks (AbstractDataType is
  // private[sql]), and an array<double> read via getFloat would return
  // garbage silently rather than fail.
  private def asFloatArr(c: Column) = c.cast("array<float>")

  def graft_cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(asFloatArr(a)), Bridge.expression(asFloatArr(b))))
  def graft_dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(asFloatArr(a)), Bridge.expression(asFloatArr(b))))
  def graft_hamming64(a: Column, b: Column): Column = Bridge.column(HammingDistance64(Bridge.expression(a), Bridge.expression(b)))
  def graft_minhash(hashes: Column, k: Int, seed: Long): Column =
    Bridge.column(MinHashSignature(Bridge.expression(hashes.cast("array<bigint>")), k, seed))
  def graft_lsh_bands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    Bridge.column(LshBandKeys(Bridge.expression(sig.cast("array<bigint>")), bands, rowsPerBand))
  def graft_simhash64(hashes: Column): Column = Bridge.column(SimHash64(Bridge.expression(hashes)))
  def graft_srp_bucket(vec: Column, nBits: Int, seed: Long): Column =
    Bridge.column(SrpBucket(Bridge.expression(asFloatArr(vec)), nBits, seed))
  def graft_minhash_agreement(a: Column, b: Column): Column =
    Bridge.column(MinHashAgreement(Bridge.expression(a), Bridge.expression(b)))
  def graft_shingle_hashes(text: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), n))
  def graft_word_shingles(text: Column, n: Int): Column =
    Bridge.column(WordShingleStrings(Bridge.expression(text), n))
  def graft_word_shingles_all(text: Column, n: Int): Column =
    Bridge.column(WordShingleStrings(Bridge.expression(text), n, all = true))
  def graft_text_stats(text: Column): Column =
    Bridge.column(TextStats(Bridge.expression(text)))
  def graft_gopher_stats(text: Column): Column =
    Bridge.column(GopherStats(Bridge.expression(text)))
  def graft_char_shingle_hashes(text: Column, n: Int): Column =
    Bridge.column(CharShingleHashes(Bridge.expression(text), n))
  def graft_fingerprint64(text: Column, base: Long = 257L): Column =
    Bridge.column(PolyFingerprint(Bridge.expression(text), base))

  def graft_srp_probes(vec: Column, nBits: Int, seed: Long, probes: Int): Column =
    Bridge.column(SrpProbes(Bridge.expression(asFloatArr(vec)), nBits, seed, probes))

  def graft_sorted_contains(sortedArr: Column, v: Column): Column =
    Bridge.column(SortedContains(
      Bridge.expression(sortedArr.cast("array<bigint>")),
      Bridge.expression(v.cast("bigint"))))

  def graft_sorted_contains_str(sortedArr: Column, v: Column): Column =
    Bridge.column(SortedContains(
      Bridge.expression(sortedArr.cast("array<string>")),
      Bridge.expression(v.cast("string"))))

  def graft_sorted_rank(sortedArr: Column, v: Column): Column =
    Bridge.column(SortedRank(
      Bridge.expression(sortedArr.cast("array<double>")),
      Bridge.expression(v.cast("double"))))

  def graft_sorted_intersect(a: Column, b: Column): Column =
    Bridge.column(SortedIntersect(
      Bridge.expression(a.cast("array<bigint>")),
      Bridge.expression(b.cast("array<bigint>"))))

  def graft_window_digests(text: Column, w: Int): Column =
    Bridge.column(WindowDigests(Bridge.expression(text.cast("string")), w))

  /** One-pass exact Gram/moment aggregate over quantized vectors —
    * see [[GramMatrix]]. The input is NOT auto-cast: a raw
    * array<float>/array<double> embedding fails analysis instead of
    * silently truncating toward zero (which would corrupt the "exact"
    * statistics with no signal) — quantize first, e.g.
    * `transform(v, x => floor(x * scale + 0.5).cast("long"))`. */
  def graft_gram(vec: Column, d: Int): Column =
    Bridge.column(GramMatrix(Bridge.expression(vec), d)
      .toAggregateExpression())

  /** Bounded bottom-k aggregate — see [[BoundedTopK]]. `keys` are cast
    * to double; descending order = negate the key. */
  def graft_bounded_topk(payload: Column, keys: Seq[Column], k: Int): Column =
    Bridge.column(BoundedTopK(Bridge.expression(payload),
      keys.map(c => Bridge.expression(c.cast("double"))), k)
      .toAggregateExpression())

  /** Register SQL names so `spark.sql("SELECT graft_cosine(a,b) ...")`
    * works — parity with the reference's goal of "write ordinary
    * queries, engine executes them natively".
    *
    * Each argument is wrapped in a `Cast` to the kernel's element type,
    * mirroring the Column builders above: the kernels read raw
    * `ArrayData` slots (getFloat/getLong), so an uncast array<double>
    * would decode as garbage silently instead of failing analysis.
    */
  def register(spark: SparkSession): Unit = {
    val registry = Bridge.sessionState(spark).functionRegistry
    val floatArr = ArrayType(FloatType)
    val longArr = ArrayType(LongType)
    def c(e: Expression, t: DataType): Expression = Cast(e, t)
    registry.createOrReplaceTempFunction("graft_cosine",
      es => CosineSimilarity(c(es.head, floatArr), c(es(1), floatArr)), "built-in")
    registry.createOrReplaceTempFunction("graft_dot",
      es => DotProduct(c(es.head, floatArr), c(es(1), floatArr)), "built-in")
    registry.createOrReplaceTempFunction("graft_hamming64",
      es => HammingDistance64(c(es.head, LongType), c(es(1), LongType)), "built-in")
    registry.createOrReplaceTempFunction("graft_simhash64",
      es => SimHash64(c(es.head, longArr)), "built-in")
    registry.createOrReplaceTempFunction("graft_fingerprint64",
      es => PolyFingerprint(c(es.head, StringType)), "built-in")
    registry.createOrReplaceTempFunction("graft_text_stats",
      es => TextStats(c(es.head, StringType)), "built-in")
    registry.createOrReplaceTempFunction("graft_gopher_stats",
      es => GopherStats(c(es.head, StringType)), "built-in")
    registry.createOrReplaceTempFunction("graft_sorted_contains",
      es => SortedContains(c(es.head, longArr), c(es(1), LongType)), "built-in")
    registry.createOrReplaceTempFunction("graft_sorted_contains_str",
      es => SortedContains(c(es.head, ArrayType(StringType)), c(es(1), StringType)), "built-in")
    registry.createOrReplaceTempFunction("graft_sorted_rank",
      es => SortedRank(c(es.head, ArrayType(DoubleType)), c(es(1), DoubleType)), "built-in")
  }
}
