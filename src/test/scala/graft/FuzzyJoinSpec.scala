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
}
