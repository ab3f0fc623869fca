package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Corpus

/** Best-fit-decreasing packing invariants the cross-engine gate can't
  * express: the capacity contract (no bin over capacity except a
  * single oversize doc's own bin), offset disjointness, the
  * waste-vs-naive claim (FFD uses no more bins than next-fit in
  * arrival order — the packer a pipeline would otherwise write), and
  * the degenerate inputs (oversize, zero/NULL tokens).
  */
class PackBestFitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a skewed-length fixture: a few huge docs, many mid, a dust tail —
  // the shape real corpora have and the one where naive packing wastes
  private def skewed: DataFrame =
    ((1L to 6L).map(i => (i, 180L + 7L * i)) ++        // big: 187..222
      (10L to 29L).map(i => (i, 40L + (i % 7) * 13L)) ++ // mid: 40..118
      (50L to 89L).map(i => (i, 1L + (i % 11)))          // dust: 1..11
      ).toDF("doc_id", "n")

  private val CAP = 256L

  private def pack(df: DataFrame, nStreams: Int = 1): DataFrame =
    Corpus.packBestFit(df, "doc_id", "n", capacity = CAP, nStreams = nStreams)

  test("capacity invariant: no bin exceeds capacity unless it holds a single oversize doc") {
    val out = pack(skewed, nStreams = 3).collect()
    val byBin = out.groupBy(r => (r.getLong(2), r.getInt(3)))
    byBin.foreach { case ((stream, bin), rs) =>
      val load = rs.map(_.getLong(1)).sum
      assert(load <= CAP || (rs.length == 1 && rs.head.getLong(1) > CAP),
        s"stream $stream bin $bin overfull at $load with ${rs.length} docs")
    }
  }

  test("offsets are the in-bin prefix sums — placements tile each bin disjointly") {
    val out = pack(skewed, nStreams = 2).collect()
    out.groupBy(r => (r.getLong(2), r.getInt(3))).foreach { case (_, rs) =>
      // sorted by offset, each doc must start exactly where the
      // previous ends
      val sorted = rs.sortBy(_.getLong(4))
      sorted.foldLeft(0L) { (expect, r) =>
        assert(r.getLong(4) == expect,
          s"doc ${r.get(0)} offset ${r.getLong(4)} != expected $expect")
        expect + r.getLong(1)
      }
    }
  }

  test("FFD bins ≤ next-fit-in-arrival-order bins on the skewed fixture (the waste claim)") {
    val rows = skewed.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // the naive packer a pipeline writes first: walk in id order, open
    // a new bin whenever the doc doesn't fit the current one
    var nfBins = 0; var cur = CAP + 1
    rows.foreach { case (_, n) =>
      if (cur + n > CAP) { nfBins += 1; cur = n } else cur += n
    }
    val ffdBins = pack(skewed, nStreams = 1).select(col("bin")).distinct().count()
    info(s"FFD bins = $ffdBins, next-fit bins = $nfBins")
    assert(ffdBins <= nfBins,
      s"best-fit-decreasing used $ffdBins bins where naive next-fit used $nfBins")
    // and utilization is the same claim inverted: fewer bins at equal
    // total tokens = strictly less padding
    assert(ffdBins < nfBins,
      "on this skewed fixture FFD must strictly beat next-fit")
  }

  test("oversize docs get a bin of their own; zero/NULL tokens pack at zero cost") {
    val d = Seq((1L, Some(300L)), (2L, Some(10L)), (3L, Some(0L)),
      (4L, Option.empty[Long]), (5L, Some(500L))).toDF("doc_id", "n")
    val out = pack(d).collect().map(r =>
      r.getLong(0) -> ((r.getInt(3), r.getLong(4), r.getLong(1)))).toMap
    // 500 and 300 are oversize: sorted first, each opens its own bin
    assert(out(5L)._1 != out(1L)._1, "two oversize docs must not share a bin")
    assert(out(5L)._2 == 0L && out(1L)._2 == 0L)
    // nothing else lands in an oversize bin
    assert(out(2L)._1 != out(5L)._1 && out(2L)._1 != out(1L)._1)
    // zero/NULL-token docs clamp to 0 tokens and attach to the fullest
    // open bin (best fit at zero cost) — offsets equal that bin's load
    assert(out(3L)._3 == 0L && out(4L)._3 == 0L)
  }

  test("packBestFitBins: fill/waste arithmetic at capacity edges, overfull single-doc bins included") {
    // one stream so placements are fully determined: FFD order is
    // (2,300) (1,256) (3,255) (6,10) (4,1) (5,0) — 300 overflows into
    // its own bin, 256 exactly fills one, 255+1 closes to exactly 256,
    // the zero-token doc lands in the FIRST fullest bin (tie to low)
    val d = Seq((1L, 256L), (2L, 300L), (3L, 255L), (4L, 1L), (5L, 0L),
      (6L, 10L)).toDF("doc_id", "n")
    val bins = Corpus.packBestFitBins(pack(d), CAP).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getSeq[Long](3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(bins(0) == ((1L, Seq(2L), 300L, 0L, true)),
      s"oversize doc: fill 300, waste clamped to 0, flagged overfull — got ${bins(0)}")
    assert(bins(1) == ((2L, Seq(1L, 5L), 256L, 0L, false)),
      s"exactly-full bin keeps placement order incl. the zero-token doc — got ${bins(1)}")
    assert(bins(2) == ((2L, Seq(3L, 4L), 256L, 0L, false)),
      s"255+1 closes to zero waste — got ${bins(2)}")
    assert(bins(3) == ((1L, Seq(6L), 10L, 246L, false)),
      s"open tail bin carries its waste — got ${bins(3)}")
    // the manifest is a pure aggregation of the placements: fills and
    // doc sets must reconcile with the placement rows exactly
    val placed = pack(d).collect()
    assert(bins.values.map(_._3).sum == placed.map(_.getLong(1)).sum)
    assert(bins.values.flatMap(_._2).toSet == placed.map(_.getLong(0)).toSet)
  }

  test("deterministic: identical output across runs and partitionings") {
    val a = pack(skewed, nStreams = 4).collect().map(_.toString).sorted.toSeq
    val b = pack(skewed.repartition(13), nStreams = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b, "packing moved under a different input partitioning")
  }

  test("caller-keyed streams: a streamCol input packs per key and ignores nStreams") {
    val d = Seq((1L, 100L, "x"), (2L, 100L, "x"), (3L, 100L, "y"))
      .toDF("doc_id", "n", "grp")
    val out = Corpus.packBestFit(d, "doc_id", "n", capacity = 256,
      nStreams = 99, streamCol = Some("grp")).collect()
    assert(out.map(_.getString(2)).toSet == Set("x", "y"))
    // two 100-token docs share x's bin 0; y starts its own bin 0
    val x = out.filter(_.getString(2) == "x")
    assert(x.map(_.getInt(3)).toSet == Set(0))
    assert(x.map(_.getLong(4)).sorted.toSeq == Seq(0L, 100L))
  }
}
