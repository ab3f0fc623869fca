package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Bpe

/** Pins for the batched merge selection in [[Bpe.learnMerges]]
  * (`batchT > 1`): T=1 bit-parity with the sequential algorithm, exact
  * agreement with an in-memory reference of the batched rule, the
  * non-interaction guarantee inside a round, and the documented
  * under-fill contract when admissible candidates run out.
  */
class BpeBatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val texts = Seq("low lower lowest low low",
    "new newer newest new lower", "aaa aa aaa banana bandana")
  private def fixture = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  /** In-memory reference of the BATCHED algorithm — the engine's rule
    * verbatim: per round, pair counts over the word table, candidates
    * in (cnt DESC, a, b) order capped at `cap`, greedy selection up to
    * the round's quota with the {a, b, a+b} touched-set admissibility,
    * replaces applied in selection order.
    */
  private def refBatched(texts: Seq[String], n: Int, t: Int, cap: Int)
      : Seq[(String, String, Long)] = {
    var words: Map[List[String], Long] = texts
      .flatMap(_.toLowerCase.split("\\s+")).filter(_.matches("^[a-z]+$"))
      .groupBy(identity).map { case (w, ws) => w.toList.map(_.toString) -> ws.size.toLong }
    def applyMerge(a: String, b: String): Unit =
      words = words.map { case (syms, f) =>
        val merged = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            merged += a + b; i += 2
          } else { merged += syms(i); i += 1 }
        }
        merged.toList -> f
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val rounds = (n + t - 1) / t
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val quota = math.min(t, n - r * t)
      val counts = words.toSeq.flatMap { case (syms, f) =>
        syms.zip(syms.tail).map(p => p -> f)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      if (counts.isEmpty) done = true
      else {
        val cand = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.take(cap)
        val touched = scala.collection.mutable.HashSet.empty[String]
        val taken = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var i = 0
        while (i < cand.length && taken.size < quota) {
          val ((a, b), c) = cand(i)
          if (!touched(a) && !touched(b) && !touched(a + b)) {
            taken += ((a, b, c)); touched ++= Seq(a, b, a + b)
          }
          i += 1
        }
        taken.foreach { case (a, b, c) => out += ((a, b, c)); applyMerge(a, b) }
      }
      r += 1
    }
    out.toSeq
  }

  test("batchT = 1 is bit-identical to the sequential algorithm") {
    val df = fixture
    val seq = Bpe.learnMerges(df, "text", 10).orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val b1 = Bpe.learnMerges(df, "text", 10, batchT = 1, candidateCap = 8)
      .orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(b1 === seq, "batchT=1 must reproduce sequential BPE exactly")
  }

  test("batched selection matches the in-memory reference (T=3, cap=12)") {
    val df = fixture
    val got = Bpe.learnMerges(df, "text", 9, batchT = 3, candidateCap = 12)
      .orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === refBatched(texts, 9, 3, 12))
  }

  test("disjoint candidates: one batched round equals T sequential rounds") {
    // every top pair touches distinct symbols, so the batched round's
    // frozen counts ARE the sequential counts — the two algorithms
    // must agree exactly here
    val df = Seq((0L, "ab ab cd cd ef ef"), (1L, "ab cd ef"))
      .toDF("doc_id", "text")
    val seq = Bpe.learnMerges(df, "text", 3).orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val bat = Bpe.learnMerges(df, "text", 3, batchT = 3, candidateCap = 12)
      .orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(bat === seq)
    assert(bat.map(p => Set(p._1, p._2)).reduce(_ ++ _).size === 6,
      "the three selected pairs must touch six distinct symbols")
  }

  test("under-fill contract: a round never makes up its deficit") {
    // "aaaa": round 1 counts only (a,a) — quota 2, 1 admissible;
    // round 2 counts (aa,aa) over the merged encoding — again 1.
    // Total 2 < nMerges 4, by the documented fixed-rounds contract.
    val df = Seq((0L, "aaaa aaaa")).toDF("doc_id", "text")
    val got = Bpe.learnMerges(df, "text", 4, batchT = 2, candidateCap = 8)
      .orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(got === Seq((1, "a", "a"), (2, "aa", "aa")),
      s"expected the two-round under-filled table, got $got")
  }
}
