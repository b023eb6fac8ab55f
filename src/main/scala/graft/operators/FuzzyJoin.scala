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
  * All lengths, segment boundaries and grams are measured in Unicode
  * CODE POINTS, not UTF-16 units — Spark's and DuckDB's `levenshtein`
  * count code-point edits, so a supplementary-plane character (emoji)
  * must occupy ONE position of the segmentation scheme or within-k
  * pairs straddling one could be silently missed.
  *
  * Hot-key discipline: identical strings are collapsed to ONE
  * representative (min id per distinct string) BEFORE segment
  * emission — within-k is invariant under string equality, so segment
  * keys, the candidate join and the levenshtein verify all run over
  * DISTINCT strings only. A boilerplate title duplicated m times
  * contributes one probe row instead of m, so the candidate join
  * cannot go quadratic in duplication (the failure mode `bucketCap`
  * guards in the LSH paths — here the collapse is lossless, no cap
  * needed). Member pairs are expanded back AFTER verification:
  * complete mode restores the full pair relation (quadratic in class
  * size because the ANSWER is — a 10k-fold class owns ~50M distance-0
  * pairs); `spanning = true` instead emits a component-equivalent
  * linear subset (see [[selfPairs]]) — the setting every clustering
  * consumer ([[fuzzyDedup]]) uses, and the only sane one at corpus
  * scale.
  *
  * The exact-collapse groups on the string column itself (one
  * shuffle of the strings): entity-resolution keys are short —
  * names, titles, addresses — so the shuffle moves kilobytes per
  * million rows. This operator is not meant for full-document
  * payloads; dedup documents with the signature-based
  * [[graft.dedup.Dedup]] family instead.
  *
  * Scale shape: per-string candidate keys are bounded by the constant
  * (k+1)·(2k+1)² (segment count × compatible lengths × position
  * window) — the join shuffles 8-byte key HASHES of (index, length,
  * gram) rather than the grams themselves (a 64-bit collision only
  * adds candidates the exact verify discards), never the string
  * cross-product; verification touches candidate
  * pairs only, one per DISTINCT-string pair. Strings shorter than
  * k+1 code points cannot host k+1 non-empty segments and take a
  * bounded length-bucket arm instead (within distance k of them =
  * length ≤ 2k, a finite class).
  */
object FuzzyJoin {

  /** PassJoin segmentation: k+1 contiguous (start, len) pieces, the
    * remainder spread over the LAST segments. Deterministic — both
    * sides must derive the identical scheme. Units are code points. */
  private[graft] def segments(m: Int, k: Int): IndexedSeq[(Int, Int)] = {
    val parts = k + 1
    val base = m / parts
    val rem = m % parts
    val lens = IndexedSeq.fill(parts - rem)(base) ++ IndexedSeq.fill(rem)(base + 1)
    val starts = lens.scanLeft(0)(_ + _)
    lens.indices.map(i => (starts(i), lens(i)))
  }

  /** One 64-bit FNV mix of (segment index, probe length, gram code
    * points) — segment keys travel as 8-byte hashes instead of an
    * (int, int, string) struct: the lshBandKeys discipline. A 64-bit
    * collision can only ADD candidates, which the exact levenshtein
    * verify then discards — never drop a true pair. */
  private def keyHash(i: Int, m: Int, cp: Array[Int], pos: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    h = (h ^ i) * 0x100000001b3L
    h = (h ^ m) * 0x100000001b3L
    var j = pos
    while (j < pos + len) { h = (h ^ cp(j)) * 0x100000001b3L; j += 1 }
    h
  }

  /** Sentinel key of the short-string arm (strings under k+1 code
    * points cannot host k+1 non-empty segments; anything within k of
    * one has length ≤ 2k — a finite bucket). */
  private val ShortArmKey = {
    var h = 0xcbf29ce484222325L
    h = (h ^ -1) * 0x100000001b3L
    (h ^ 0) * 0x100000001b3L
  }

  /** Probe-side keys: the string's own k+1 segments, keyed
    * (segIdx, ownLength, gram); short strings route to the
    * length-bucket arm. */
  private def probeKeysUdf(k: Int) = udf { (s: String) =>
    if (s == null) Array.emptyLongArray
    else {
      val cp = s.codePoints.toArray
      val m = cp.length
      if (m <= k) Array(ShortArmKey)
      else {
        val segs = segments(m, k)
        val out = new Array[Long](segs.length)
        var i = 0
        while (i < segs.length) {
          out(i) = keyHash(i, m, cp, segs(i)._1, segs(i)._2)
          i += 1
        }
        out
      }
    }
  }

  /** Candidate-side keys: every substring that could equal segment i
    * of a compatible-length probe (all probe lengths within ±k of own
    * length), within the ±k alignment window. Per-string fanout is
    * bounded by the constant (k+1)·(2k+1)². */
  private def candKeysUdf(k: Int) = udf { (t: String) =>
    if (t == null) Array.emptyLongArray
    else {
      val cp = t.codePoints.toArray
      val n = cp.length
      val out = scala.collection.mutable.LinkedHashSet.empty[Long]
      if (n <= 2 * k) out += ShortArmKey // can match a short-arm probe
      var m = math.max(k + 1, n - k)
      while (m <= n + k) {
        val segs = segments(m, k)
        var i = 0
        while (i < segs.length) {
          val (p, l) = segs(i)
          var pos = math.max(0, p - k)
          val end = math.min(n - l, p + k)
          while (pos <= end) {
            out += keyHash(i, m, cp, pos, l)
            pos += 1
          }
          i += 1
        }
        m += 1
      }
      out.toArray
    }
  }

  /** Deterministic per-key occupancy cap on a candidate-key frame —
    * keeps the `segmentCap` lowest representative ids per `__k`
    * bucket (see [[selfPairs]]'s segmentCap doc for the recall
    * tradeoff contract). */
  private def capBuckets(cand: DataFrame, ridCol: String, segmentCap: Int): DataFrame =
    if (segmentCap == Int.MaxValue) cand
    else {
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy("__k").orderBy(col(ridCol).asc)
      cand.withColumn("__rn", row_number().over(wc))
        .filter(col("__rn") <= segmentCap).drop("__rn")
    }

  /** All unordered pairs (id_a < id_b, distance) within edit distance
    * `maxDistance`, exact. Null strings never match (SQL semantics) —
    * null-string rows appear in NO pair.
    *
    * @param spanning emit a component-equivalent LINEAR subset of the
    *        pair relation instead of the complete list: one star edge
    *        (representative → member, distance 0) per duplicated
    *        string plus one edge per close DISTINCT-string pair
    *        (between representatives). Sound for clustering at ANY k:
    *        members of a string group share their exact string, so
    *        the complete graph's edges between two groups form a full
    *        bipartite block exactly when the representatives' distance
    *        is ≤ k — star + representative edges span the same
    *        connected components. NOT the complete pair list: a
    *        duplicate class of m copies yields m−1 pairs, not
    *        m(m−1)/2, and cross-group pairs surface once per group
    *        pair. Exactly what [[fuzzyDedup]] /
    *        [[graft.dedup.Dedup.duplicateClusters]] consume.
    * @param segmentCap occupancy cap on the CANDIDATE side of each
    *        (segment index, length, gram) key. The representative
    *        collapse removes identical-string hot keys losslessly,
    *        but many DISTINCT strings can still share a segment —
    *        equal-length boilerplate prefixes ("Amazon.com: …" titles)
    *        put every such string in one bucket, and candidate pairs
    *        go quadratic in its occupancy. A finite cap bounds total
    *        candidates at (k+1)·cap per probe string — linear in the
    *        corpus — as a DOCUMENTED recall tradeoff (a within-k pair
    *        is missed only if EVERY segment key it shares is over-cap;
    *        kept rows are deterministic, lowest representative ids —
    *        the `bucketCap` discipline of the LSH paths). The default
    *        is unbounded: the sound-AND-complete contract holds and
    *        the verify stage only discards.
    */
  def selfPairs(df: DataFrame, idCol: String, strCol: String,
                maxDistance: Int, spanning: Boolean = false,
                segmentCap: Int = Int.MaxValue): DataFrame = {
    require(maxDistance >= 0,
      s"FuzzyJoin.selfPairs: maxDistance must be >= 0, got $maxDistance")
    require(segmentCap >= 1,
      s"FuzzyJoin.selfPairs: segmentCap must be >= 1, got $segmentCap")
    val k = maxDistance
    val base = df.select(col(idCol).as("__fid"), col(strCol).as("__fstr"))
      .filter(col("__fstr").isNotNull)
    // exact-collapse: one representative (min id) per distinct string.
    // Everything downstream of this point sees each string ONCE.
    val groups = base.groupBy("__fstr")
      .agg(min(col("__fid")).as("__rid"), count(lit(1)).as("__cnt"))
    val reps = groups.select(col("__rid"), col("__fstr"))
    val probe = reps.select(col("__rid").as("rid_p"),
      explode(probeKeysUdf(k)(col("__fstr"))).as("__k"))
    val candRaw = reps.select(col("__rid").as("rid_c"),
      explode(candKeysUdf(k)(col("__fstr"))).as("__k"))
    val cand = capBuckets(candRaw, "rid_c", segmentCap)
    val candidates = probe.join(cand, probe("__k") === cand("__k"))
      .filter(col("rid_p") =!= col("rid_c"))
      .select(least(col("rid_p"), col("rid_c")).as("rid_a"),
        greatest(col("rid_p"), col("rid_c")).as("rid_b"))
      .distinct()
    val la = reps.select(col("__rid").as("rid_a"), col("__fstr").as("__sa"))
    val lb = reps.select(col("__rid").as("rid_b"), col("__fstr").as("__sb"))
    // verified close pairs between DISTINCT strings (distance >= 1:
    // equal strings collapsed into one representative above)
    val repPairs = candidates
      .join(la, "rid_a").join(lb, "rid_b")
      .withColumn("distance", levenshtein(col("__sa"), col("__sb")))
      .filter(col("distance") <= k)
      .select(col("rid_a"), col("rid_b"), col("distance"))
    val members = base.join(groups.select(col("__fstr"), col("__rid")), "__fstr")
      .select(col("__fid"), col("__rid"))
    if (spanning) {
      // star edges within each duplicated-string group (rep = min id,
      // so rep < member always) + one edge per close group pair
      val star = members.filter(col("__fid") =!= col("__rid"))
        .select(col("__rid").as("id_a"), col("__fid").as("id_b"),
          lit(0).as("distance"))
      star.unionByName(repPairs.select(col("rid_a").as("id_a"),
        col("rid_b").as("id_b"), col("distance")))
    } else {
      // complete expansion: all within-group pairs at distance 0, and
      // every cross-group member pair at the verified group distance.
      // Each unordered pair surfaces exactly once (within: ma < mb;
      // cross: groups are disjoint and rid_a < rid_b), no distinct().
      val within = members.select(col("__rid"), col("__fid").as("__ma"))
        .join(members.select(col("__rid"), col("__fid").as("__mb")), "__rid")
        .filter(col("__ma") < col("__mb"))
        .select(col("__ma").as("id_a"), col("__mb").as("id_b"),
          lit(0).as("distance"))
      val cross = repPairs
        .join(members.select(col("__rid").as("rid_a"), col("__fid").as("__ida")), "rid_a")
        .join(members.select(col("__rid").as("rid_b"), col("__fid").as("__idb")), "rid_b")
        .select(least(col("__ida"), col("__idb")).as("id_a"),
          greatest(col("__ida"), col("__idb")).as("id_b"), col("distance"))
      within.unionByName(cross)
    }
  }

  /** Record linkage: all (left id, right id, distance) pairs ACROSS
    * two tables within edit distance `maxDistance`, exact — matching
    * entities between catalogs/crawls whose keys (names, titles,
    * addresses) drifted by typos, truncation or OCR noise, without
    * the cross-product.
    *
    * Same PassJoin machinery as [[selfPairs]], asymmetric by
    * construction: the LEFT side plays probe (its own k+1 segments),
    * the RIGHT side plays candidate (window-bounded substrings for
    * every compatible probe length). Pigeonhole applies to the left
    * string's segmentation — a within-k pair (l, r) has ≥1 segment of
    * l untouched by the k edits, and its identical copy in r is one
    * of r's emitted window substrings — so one direction of keys
    * already covers every pair: sound AND complete, and the exact
    * `levenshtein` verify only discards. (The self-join needs no
    * second direction either; there both roles happen to be played by
    * the same frame.)
    *
    * Hot-key discipline as in [[selfPairs]]: each side collapses to
    * one representative per DISTINCT string (min id) before key
    * emission, so candidate generation and verification are quadratic
    * only in DISTINCT close strings, never in duplication; member
    * pairs expand afterward. Unlike the self-join, equal strings
    * across tables ARE matches (distance 0) — different id
    * namespaces, no self-pair to exclude — and a string duplicated
    * m× left and n× right legitimately owns m·n output pairs,
    * because that is the answer, produced by the final expansion
    * joins, not by the candidate join. Null strings on either side
    * match nothing. `segmentCap` caps RIGHT-side candidate buckets
    * with [[selfPairs]]'s documented recall tradeoff.
    *
    * Output: (`id_l`, `id_r`, `distance`), one row per matching pair.
    */
  def linkPairs(left: DataFrame, leftIdCol: String, leftStrCol: String,
                right: DataFrame, rightIdCol: String, rightStrCol: String,
                maxDistance: Int, segmentCap: Int = Int.MaxValue): DataFrame = {
    require(maxDistance >= 0,
      s"FuzzyJoin.linkPairs: maxDistance must be >= 0, got $maxDistance")
    require(segmentCap >= 1,
      s"FuzzyJoin.linkPairs: segmentCap must be >= 1, got $segmentCap")
    val k = maxDistance
    val baseL = left.select(col(leftIdCol).as("__fid"), col(leftStrCol).as("__fstr"))
      .filter(col("__fstr").isNotNull)
    val baseR = right.select(col(rightIdCol).as("__fid"), col(rightStrCol).as("__fstr"))
      .filter(col("__fstr").isNotNull)
    val groupsL = baseL.groupBy("__fstr").agg(min(col("__fid")).as("__rid"))
    val groupsR = baseR.groupBy("__fstr").agg(min(col("__fid")).as("__rid"))
    val probe = groupsL.select(col("__rid").as("rid_l"),
      explode(probeKeysUdf(k)(col("__fstr"))).as("__k"))
    val cand = capBuckets(
      groupsR.select(col("__rid").as("rid_r"),
        explode(candKeysUdf(k)(col("__fstr"))).as("__k")),
      "rid_r", segmentCap)
    val candidates = probe.join(cand, probe("__k") === cand("__k"))
      .select(col("rid_l"), col("rid_r")).distinct()
    val ll = groupsL.select(col("__rid").as("rid_l"), col("__fstr").as("__sl"))
    val lr = groupsR.select(col("__rid").as("rid_r"), col("__fstr").as("__sr"))
    val repPairs = candidates
      .join(ll, "rid_l").join(lr, "rid_r")
      .withColumn("distance", levenshtein(col("__sl"), col("__sr")))
      .filter(col("distance") <= k)
      .select(col("rid_l"), col("rid_r"), col("distance"))
    val membersL = baseL.join(groupsL, "__fstr")
      .select(col("__fid").as("id_l"), col("__rid").as("rid_l"))
    val membersR = baseR.join(groupsR, "__fstr")
      .select(col("__fid").as("id_r"), col("__rid").as("rid_r"))
    repPairs.join(membersL, "rid_l").join(membersR, "rid_r")
      .select(col("id_l"), col("id_r"), col("distance"))
  }

  /** End-to-end fuzzy (edit-distance) dedup: keep ONE representative
    * (the min-id member) per connected component of the within-k pair
    * graph, plus every unmatched row — the entity-resolution analog
    * of [[graft.dedup.Dedup.dedupNear]]'s pairs → clusters →
    * survivors pipeline.
    *
    * Pair generation runs in `spanning` mode (linear in duplication,
    * see [[selfPairs]]); clustering iterates over the small pair
    * graph; the final filter is an ANTI-join of the input against the
    * non-representative ids — row payloads never shuffle. Null-string
    * rows match nothing and therefore all survive.
    */
  def fuzzyDedup(df: DataFrame, idCol: String, strCol: String,
                 maxDistance: Int, maxIter: Int = 30,
                 reliableCheckpoint: Boolean = false,
                 driverThreshold: Long = 1L << 20): DataFrame = {
    val pairs = selfPairs(df, idCol, strCol, maxDistance, spanning = true)
      .select(col("id_a"), col("id_b"))
    graft.dedup.Dedup.dedupNear(df, idCol, pairs, maxIter,
      reliableCheckpoint, driverThreshold)
  }
}
