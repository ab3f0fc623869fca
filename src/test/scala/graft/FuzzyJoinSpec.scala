package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.FuzzyJoin

/** Edit-distance join: completeness (recall 1.0) against a brute-force
  * reference on seeded random corpora — the segment filter must only
  * PRUNE, never drop — plus the edge battery (empty strings, equal
  * strings, nulls, k = 0).
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Classic unit-cost Levenshtein DP. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(ls: Seq[(Long, String)], rs: Seq[(Long, String)],
                    k: Int): Set[(Long, Long, Int)] =
    (for ((li, l) <- ls; (ri, r) <- rs; d = lev(l, r) if d <= k)
      yield (li, ri, d)).toSet

  private def run(ls: Seq[(Long, String)], rs: Seq[(Long, String)],
                  k: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.editDistanceJoin(ls.toDF("id", "s"), "id", "s",
      rs.toDF("id", "s"), "id", "s", maxDist = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("matches brute force on seeded random corpora for k = 0..3") {
    for (seed <- Seq(11, 29)) {
      val rnd = new scala.util.Random(seed)
      // small alphabet + short lengths force dense near-miss structure
      def word() = (0 until (rnd.nextInt(11) + 1))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val ls = (1L to 60L).map(i => (i, word()))
      val rs = (101L to 160L).map(i => (i, word()))
      for (k <- 0 to 3) {
        val got = run(ls, rs, k)
        val exp = brute(ls, rs, k)
        assert(got === exp,
          s"seed=$seed k=$k missing=${exp -- got} extra=${got -- exp}")
      }
    }
  }

  test("edge battery: empty strings, exact matches, nulls, k = 0") {
    val ls = Seq((1L, "abc"), (2L, ""), (3L, "a"))
    val rsRaw = Seq((11L, Some("abc")), (12L, Some("ab")), (13L, Some("")),
      (14L, Option.empty[String]))
    val df = rsRaw.toDF("id", "s")
    val got = FuzzyJoin.editDistanceJoin(ls.toDF("id", "s"), "id", "s",
      df, "id", "s", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // ed("abc","abc")=0, ed("abc","ab")=1, ed("","")=0, ed("a","")=1,
    // ed("a","ab")=1, ed("","a"... wait left "" vs right "ab" = 2 > 1;
    // null right never joins
    assert(got === Set((1L, 11L, 0), (1L, 12L, 1), (2L, 13L, 0),
      (3L, 13L, 1), (3L, 12L, 1)), got.toString)
    // k = 0 degenerates to exact string equality
    val eq = run(ls, Seq((21L, "abc"), (22L, "abd"), (23L, "")), 0)
    assert(eq === Set((1L, 21L, 0), (2L, 23L, 0)), eq.toString)
  }

  test("candidate pruning is real: disjoint corpora generate no verify work") {
    // structurally distant strings: no shared segment keys survive, so
    // the candidate relation itself is empty (cheaper than verifying)
    val ls = (1L to 40L).map(i => (i, s"aaaaaaa$i"))
    val rs = (101L to 140L).map(i => (i, s"zzzzzzz$i"))
    assert(run(ls, rs, 2) === Set.empty)
  }

  test("segment-filter selectivity is PINNED on the entity-resolution fixture: candidate rate ≪ 1") {
    // the join_fuzzy_edit gate proves completeness (brute-force oracle);
    // this pins the other half — how far below all-pairs the PassJoin
    // segment filter actually lands on realistic keyed names — so
    // selectivity is a measured number, not a scaladoc claim
    val base = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .filter(col("p_partkey") < 500)
      .select(col("p_partkey").as("k"),
        concat(col("p_name"), lit("#"), col("p_partkey")).as("nm"))
    val clean = base.select(col("k").as("id"), col("nm"))
    val dirty = base
      .withColumn("pos", pmod(col("k"), length(col("nm"))).cast("int") + 1)
      .select((col("k") + 100000L).as("id"),
        concat(expr("substring(nm, 1, pos - 1)"), lit("q"),
          expr("substring(nm, pos + 1, length(nm) - pos)")).as("nm"))
    val nPairs = dirty.count() * clean.count()
    val cand = FuzzyJoin.editCandidatePairs(dirty, "id", "nm",
      clean, "id", "nm", maxDist = 1).count()
    val matches = FuzzyJoin.editDistanceJoin(dirty, "id", "nm",
      clean, "id", "nm", maxDist = 1).count()
    assert(cand >= matches, "candidates must cover every verified pair")
    val rate = cand.toDouble / nPairs.toDouble
    info(f"candidate rate = $rate%.5f ($cand candidates / $nPairs pairs, $matches true)")
    assert(rate < 0.02,
      f"segment filter lost selectivity: candidate rate $rate%.4f on the gate fixture")
  }

  test("tiny-string cohort: zero-length segments emit ONE empty-gram key, results stay exact") {
    // strings shorter than k+1 chars have zero-length segments; the
    // position explode collapses to a single row there (duplicate ''
    // join keys would otherwise multiply candidate volume quadratically
    // within the cohort) — completeness must be unaffected
    val ls = Seq((1L, ""), (2L, "a"), (3L, "b"), (4L, "ab"), (5L, "ba"))
    val rs = Seq((11L, ""), (12L, "a"), (13L, "ab"), (14L, "bb"), (15L, "abc"))
    for (k <- 1 to 3)
      assert(run(ls, rs, k) === brute(ls, rs, k), s"k=$k")
    // candidate volume within the all-tiny cohort stays ≤ all-pairs
    val cand = FuzzyJoin.editCandidatePairs(ls.toDF("id", "s"), "id", "s",
      rs.toDF("id", "s"), "id", "s", maxDist = 3).count()
    assert(cand <= ls.size.toLong * rs.size,
      s"degenerate empty grams multiplied candidates: $cand")
  }
}
