package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) join — the entity-resolution primitive: all
  * (left, right) pairs whose strings are within `maxDist` Levenshtein
  * edits, EXACT (recall 1.0 — the filter only prunes, never drops).
  *
  * Scale shape: candidate generation is the PassJoin segment filter
  * (Li, Deng, Feng 2011): partition the SHORTER string of a pair into
  * k+1 contiguous segments — k edits can destroy at most k of them, so
  * at least one segment survives VERBATIM as a substring of the longer
  * string, at a start position within ±k of its origin. Each shorter
  * string therefore emits its k+1 segments as equi-join keys
  * `(segIdx, shorterLen, gram)`, and each longer string enumerates the
  * substrings any within-k shorter string's segments could be —
  * (k+1) candidate lengths × (k+1) segments × (2k+1) positions, a
  * CONSTANT ≤ (k+1)²(2k+1) rows per string (45 at k=2) — and the
  * candidate join is a plain equi-join Catalyst shuffles on the gram
  * key. Nothing is ever all-pairs; candidates verify with one
  * threshold-banded `levenshtein(l, r, k)` (O(k·n) per pair, -1 early
  * exit past the threshold). Degenerate segments (strings shorter than
  * k+1 chars yield empty grams) keep the key's (segIdx, shorterLen)
  * components, so tiny strings pair only within their exact length
  * cohort — completeness holds there too, bounded by the tiny-string
  * population per length.
  *
  * Both directions run (left-shorter and right-strictly-shorter — the
  * equal-length case is claimed by the left-shorter direction only, so
  * no pair is generated twice by construction); a final `distinct` on
  * the id pair removes multi-segment duplicates. NULL strings never
  * join (no distance is defined).
  *
  * The gate's oracle is the brute-force exact join (length prefilter +
  * plain levenshtein), deliberately filter-independent: the hash match
  * proves the completeness guarantee, not just determinism.
  */
object FuzzyJoin {

  /** Guarded integer sequence: empty array when lo > hi (Spark's
    * `sequence` would silently generate a DESCENDING range).
    */
  private def seq0(lo: Column, hi: Column): Column =
    when(lo <= hi, sequence(lo, hi)).otherwise(array().cast("array<int>"))

  /** Segment i of a string of length `len` under the k+1 even split:
    * start floor(i·len/(k+1)) (0-based), end floor((i+1)·len/(k+1)).
    */
  private def segStart(i: Column, len: Column, k: Int): Column =
    floor(i.cast("long") * len.cast("long") / lit(k + 1)).cast("int")

  /** (id, segIdx, shorterLen, gram) — the k+1 segment keys of each
    * string playing the SHORTER role.
    */
  private def segmentKeys(df: DataFrame, idCol: String, strCol: String,
                          k: Int): DataFrame = {
    val len = length(col(strCol))
    df.select(col(idCol).as("__id"), col(strCol).as("__s"), len.as("__len"),
        explode(seq0(lit(0), lit(k))).as("__i"))
      .select(col("__id"), col("__i"),
        col("__len").as("__ls"),
        expr(s"substring(__s, cast(floor(__i * __len / ${k + 1}) as int) + 1, " +
          s"cast(floor((__i + 1) * __len / ${k + 1}) as int) - " +
          s"cast(floor(__i * __len / ${k + 1}) as int))").as("__gram"))
  }

  /** (id, segIdx, shorterLen, gram) — every substring of each string
    * playing the LONGER role that could be segment `segIdx` of a
    * within-k shorter string of length `shorterLen`: shorterLen ranges
    * over [len−k, len] (or [len−k, len−1] when `strictlyLonger` — the
    * equal-length case belongs to the other direction), start
    * positions within ±k of the segment's origin, clipped to bounds.
    */
  private def substringKeys(df: DataFrame, idCol: String, strCol: String,
                            k: Int, strictlyLonger: Boolean): DataFrame = {
    val len = length(col(strCol))
    val hi = if (strictlyLonger) len - 1 else len
    df.select(col(idCol).as("__id"), col(strCol).as("__s"), len.as("__len"),
        explode(seq0(greatest(len - k, lit(0)), hi)).as("__ls"))
      .select(col("__id"), col("__s"), col("__len"), col("__ls"),
        explode(seq0(lit(0), lit(k))).as("__i"))
      .select(col("__id"), col("__s"), col("__len"), col("__ls"), col("__i"),
        segStart(col("__i"), col("__ls"), k).as("__si"),
        (segStart(col("__i") + 1, col("__ls"), k)
          - segStart(col("__i"), col("__ls"), k)).as("__slen"))
      .select(col("__id"), col("__s"), col("__i"), col("__ls"), col("__slen"),
        // degenerate zero-length segments (strings shorter than k+1
        // chars) would otherwise enumerate up to 2k+1 IDENTICAL empty
        // grams — duplicate join keys that multiply candidate-pair
        // volume quadratically within tiny-string length cohorts before
        // the final distinct(). Every position yields the same '' key,
        // so one row carries the full match semantics: collapse the
        // position range to a point when __slen = 0.
        explode(seq0(greatest(col("__si") - k, lit(0)),
          when(col("__slen") === 0, greatest(col("__si") - k, lit(0)))
            .otherwise(least(col("__si") + k, col("__len") - col("__slen"))))).as("__p"))
      .select(col("__id"), col("__i"), col("__ls"),
        expr("substring(__s, __p + 1, __slen)").as("__gram"))
  }

  /** One candidate direction: `shortSide` strings in the shorter role
    * against `longSide` in the longer role.
    */
  private def candidates(shortSide: DataFrame, shortId: String, shortStr: String,
                         longSide: DataFrame, longId: String, longStr: String,
                         k: Int, strictlyLonger: Boolean): DataFrame =
    segmentKeys(shortSide, shortId, shortStr, k)
      .withColumnRenamed("__id", "__sid")
      .join(substringKeys(longSide, longId, longStr, k, strictlyLonger)
        .withColumnRenamed("__id", "__lid"),
        Seq("__i", "__ls", "__gram"))
      .select(col("__sid"), col("__lid"))

  /** All (l_id, r_id, dist) pairs with levenshtein ≤ maxDist between
    * `left.leftStr` and `right.rightStr`. Ids should be unique per
    * side (pairs are reported per id). `maxDist` is capped at 4: the
    * enumeration constant grows as (k+1)²(2k+1) and beyond a handful
    * of edits segment filtering stops being selective — use the n-gram
    * Jaccard / MinHash family for loose similarity instead.
    */
  def editDistanceJoin(left: DataFrame, leftId: String, leftStr: String,
                       right: DataFrame, rightId: String, rightStr: String,
                       maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 4, "maxDist must be in [0, 4]")
    val k = maxDist
    val l = prepped(left, leftId, leftStr, "l_id", "l_s")
    val r = prepped(right, rightId, rightStr, "r_id", "r_s")
    candidatePairs(l, r, k).join(l, "l_id").join(r, "r_id")
      .where(abs(length(col("l_s")) - length(col("r_s"))) <= k)
      .withColumn("dist", levenshtein(col("l_s"), col("r_s"), k))
      .where(col("dist") >= 0) // banded levenshtein returns -1 past k
      .select(col("l_id"), col("r_id"), col("dist"))
  }

  /** The PassJoin candidate relation `(l_id, r_id)` BEFORE the banded-
    * levenshtein verify — the selectivity diagnostic, exposed on the
    * [[graft.llm.Similarity.mipsCandidatePairs]] contract: completeness
    * is proven elsewhere (the gate's brute-force oracle); this measures
    * how far below all-pairs the segment filter actually lands, so the
    * candidate rate is a PINNED number (FuzzyJoinSpec), not a claim.
    * Exactly the relation [[editDistanceJoin]] verifies.
    */
  def editCandidatePairs(left: DataFrame, leftId: String, leftStr: String,
                         right: DataFrame, rightId: String, rightStr: String,
                         maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 4, "maxDist must be in [0, 4]")
    candidatePairs(prepped(left, leftId, leftStr, "l_id", "l_s"),
      prepped(right, rightId, rightStr, "r_id", "r_s"), maxDist)
  }

  private def prepped(df: DataFrame, idCol: String, strCol: String,
                      idAs: String, strAs: String): DataFrame =
    graft.Partitioning.spread(df)
      .where(col(strCol).isNotNull)
      .select(col(idCol).as(idAs), col(strCol).as(strAs))

  /** Distinct candidate pairs over prepped sides: left-shorter-or-equal
    * direction plus right-strictly-shorter direction.
    */
  private def candidatePairs(l: DataFrame, r: DataFrame, k: Int): DataFrame = {
    val lr = candidates(l, "l_id", "l_s", r, "r_id", "r_s", k,
      strictlyLonger = false)
      .select(col("__sid").as("l_id"), col("__lid").as("r_id"))
    val rl = candidates(r, "r_id", "r_s", l, "l_id", "l_s", k,
      strictlyLonger = true)
      .select(col("__lid").as("l_id"), col("__sid").as("r_id"))
    lr.union(rl).distinct()
  }
}
