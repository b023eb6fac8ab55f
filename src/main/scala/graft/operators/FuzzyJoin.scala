package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (entity resolution: product
  * names, author strings, near-identical titles) without the
  * all-pairs comparison.
  *
  * Candidate generation is the PassJoin partition scheme: split every
  * string into `maxDistance + 1` contiguous segments — by pigeonhole,
  * two strings within edit distance k must agree EXACTLY on at least
  * one segment (k edits cannot touch all k+1 segments), and an
  * untouched segment's position in the other string shifts by at most
  * k (net insertions/deletions before it). So each string emits its
  * segments keyed by (segment index, own length) on the probe side
  * and every window-bounded substring that could match some
  * (segment index, compatible probe length) on the candidate side;
  * matching is one equi-join on those short keys. Sound AND complete
  * — the exact `levenshtein` verify then only discards, never
  * recovers.
  *
  * Scale shape: per-string candidate keys are bounded by the constant
  * (k+1)·(2k+1)² (segment count × compatible lengths × position
  * window) — the join shuffles short (index, length, gram) keys,
  * never the string cross-product; verification touches candidate
  * pairs only. Strings shorter than k+1 characters cannot host k+1
  * non-empty segments and take a bounded length-bucket arm instead
  * (within distance k of them = length ≤ 2k, a finite class).
  */
object FuzzyJoin {

  /** PassJoin segmentation: k+1 contiguous (start, len) pieces, the
    * remainder spread over the LAST segments. Deterministic — both
    * sides must derive the identical scheme. */
  private[graft] def segments(m: Int, k: Int): IndexedSeq[(Int, Int)] = {
    val parts = k + 1
    val base = m / parts
    val rem = m % parts
    val lens = IndexedSeq.fill(parts - rem)(base) ++ IndexedSeq.fill(rem)(base + 1)
    val starts = lens.scanLeft(0)(_ + _)
    lens.indices.map(i => (starts(i), lens(i)))
  }

  /** All unordered pairs (id_a < id_b, distance) within edit distance
    * `maxDistance`, exact. Null strings never match (SQL semantics). */
  def selfPairs(df: DataFrame, idCol: String, strCol: String,
                maxDistance: Int): DataFrame = {
    require(maxDistance >= 0,
      s"FuzzyJoin.selfPairs: maxDistance must be >= 0, got $maxDistance")
    val k = maxDistance
    // probe: the string's own segments, keyed (segIdx, ownLength, gram);
    // short strings (< k+1 chars) route to the length-bucket arm key
    val probeKeys = udf { (s: String) =>
      if (s == null) Seq.empty[(Int, Int, String)]
      else {
        val m = s.length
        if (m <= k) Seq((-1, 0, ""))
        else segments(m, k).zipWithIndex.map { case ((p, l), i) =>
          (i, m, s.substring(p, p + l))
        }
      }
    }
    // candidate: every substring that could equal segment i of a
    // compatible-length probe, within the ±k alignment window
    val candKeys = udf { (t: String) =>
      if (t == null) Seq.empty[(Int, Int, String)]
      else {
        val n = t.length
        val out = scala.collection.mutable.LinkedHashSet.empty[(Int, Int, String)]
        if (n <= 2 * k) out += ((-1, 0, "")) // can match a short-arm probe
        var m = math.max(k + 1, n - k)
        while (m <= n + k) {
          val segs = segments(m, k)
          var i = 0
          while (i < segs.length) {
            val (p, l) = segs(i)
            var pos = math.max(0, p - k)
            val end = math.min(n - l, p + k)
            while (pos <= end) {
              out += ((i, m, t.substring(pos, pos + l)))
              pos += 1
            }
            i += 1
          }
          m += 1
        }
        out.toSeq
      }
    }
    val base = df.select(col(idCol).as("__fid"), col(strCol).as("__fstr"))
      .filter(col("__fstr").isNotNull)
    val probe = base.select(col("__fid").as("id_p"),
      explode(probeKeys(col("__fstr"))).as("__k"))
    val cand = base.select(col("__fid").as("id_c"),
      explode(candKeys(col("__fstr"))).as("__k"))
    val candidates = probe.join(cand, probe("__k") === cand("__k"))
      .filter(col("id_p") =!= col("id_c"))
      .select(least(col("id_p"), col("id_c")).as("id_a"),
        greatest(col("id_p"), col("id_c")).as("id_b"))
      .distinct()
    val la = base.select(col("__fid").as("id_a"), col("__fstr").as("__sa"))
    val lb = base.select(col("__fid").as("id_b"), col("__fstr").as("__sb"))
    candidates
      .join(la, "id_a").join(lb, "id_b")
      .withColumn("distance", levenshtein(col("__sa"), col("__sb")))
      .filter(col("distance") <= k)
      .select(col("id_a"), col("id_b"), col("distance"))
  }
}
