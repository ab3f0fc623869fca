package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding (Sennrich et al. 2016): learn the
  * merge table from a corpus and re-tokenize with it — the real form of
  * the tokenizer a training-data pipeline sizes its token budgets with.
  *
  * Spark-first shape, standard word-frequency compression: the corpus
  * collapses ONCE to its distinct lowercase words with occurrence
  * counts, and every BPE iteration runs over that word table — cost
  * O(|vocab|) per merge, not O(corpus), which is the property that
  * makes BPE training feasible at 100 TB (the vocabulary grows
  * sublinearly in corpus size). Per iteration: adjacent-pair counts
  * (one map-side-combinable groupBy over exploded pairs, weighted by
  * word frequency), the argmax pair as ONE driver scalar (the k-means
  * centroid idiom — ties break by count DESC then pair lexicographic,
  * fully deterministic), and the merge applied as a narrow string
  * `replace` over the word encodings; lineage is truncated per round
  * like [[graft.ops.Graph.pageRank]].
  *
  * Symbol encoding: a word's symbol sequence is rendered as
  * `|s1||s2||…||sn|` — every symbol owns its `|…|` wrapper, so the
  * merge of (a, b) is literally `replace(enc, "|a||b|", "|ab|")`:
  * plain left-to-right non-overlapping string replacement (identical
  * semantics in Spark and DuckDB) IS greedy BPE merging, with the
  * double separator guaranteeing a replacement never bridges symbol
  * boundaries. Words are restricted to `[a-z]+` so the separator can
  * never occur in a symbol and string comparisons are byte-wise
  * identical across engines.
  */
object Bpe {

  /** Distinct-word table `(w, enc, freq)` for a corpus: lowercase
    * whitespace tokens restricted to `[a-z]+`, each with its initial
    * per-character encoding and total occurrence count.
    */
  private def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .where(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("enc",
        expr("""substring('|' || regexp_replace(w, '(.)', '$1||'), 1,
                length(w) * 3)"""))

  /** Learn `nMerges` BPE merges. Stops early when no adjacent pair
    * remains (all words fully merged or single-symbol).
    *
    * `batchT` is the MERGE-COUNT scaling knob: the sequential algorithm
    * runs one Spark job pair (count + checkpoint) PER merge — fine at a
    * gate's nMerges = 8, a scale problem at a production 30k-merge
    * vocabulary (30k sequential jobs whose per-job work is O(vocab),
    * correctly bounded; the JOB COUNT is what doesn't scale). With
    * `batchT = T`, each ROUND counts pairs once, collects the top
    * `candidateCap` candidates (a bounded, cap-sized driver list), and
    * greedily selects up to its quota of MUTUALLY NON-INTERACTING pairs
    * in (cnt DESC, a, b) order: a candidate is admissible iff none of
    * {a, b, a+b} was touched (consumed OR produced) by an
    * earlier-selected pair this round. That admissibility rule is what
    * makes the batch sound: two admissible pairs' `replace` patterns
    * can neither overlap in the encoding (overlap requires a shared
    * consumed symbol), nor create or destroy each other's occurrences
    * (creation/destruction requires one pair's produced or consumed
    * symbol to appear in the other) — so the round's replaces commute,
    * applying them in selection order equals any order, and every
    * selected pair's recorded cnt is still its true count at
    * application time. Job count drops from O(nMerges) to
    * O(nMerges / T).
    *
    * The honest contract change for T > 1: rounds are FIXED at
    * ceil(nMerges / T) with per-round quota min(T, remaining), and a
    * round whose admissible candidates run out (cap-bounded list, or
    * everything overlaps) under-fills its quota WITHOUT making the
    * deficit up later — the returned table can then hold fewer than
    * `nMerges` rows, and the merge SEQUENCE legitimately differs from
    * sequential BPE (the classic batched-BPE approximation: within a
    * round, counts are not refreshed between the T picks, so a pair
    * involving a just-created symbol can't win until the next round).
    * At `batchT = 1` the quota is 1, the top-1 candidate is always
    * admissible, and the output is BIT-IDENTICAL to the sequential
    * algorithm — BpeBatchSpec pins both properties.
    *
    * @param batchT merges selected per pair-count round (default 1 =
    *               exact sequential BPE)
    * @param candidateCap driver-collected candidates per round
    *                     (default 4 × batchT; must be ≥ batchT)
    * @return (step: int — 1-based, left, right, cnt: long) — the merge
    *         table in learned order
    */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int,
                  batchT: Int = 1, candidateCap: Int = 0): DataFrame = {
    require(nMerges >= 1, "nMerges must be at least 1")
    require(batchT >= 1, "batchT must be at least 1")
    val cap = if (candidateCap > 0) candidateCap else 4 * batchT
    require(cap >= batchT, s"candidateCap must be >= batchT, got $cap < $batchT")
    val spark = df.sparkSession
    import spark.implicits._
    var words = wordTable(df, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 0
    val rounds = (nMerges + batchT - 1) / batchT
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val quota = math.min(batchT, nMerges - r * batchT)
      val cand = words
        .select(col("freq"),
          expr("split(substring(enc, 2, length(enc) - 2), '\\\\|\\\\|')").as("s"))
        .where(size(col("s")) >= 2)
        .select(col("freq"), explode(expr(
          "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1), " +
            "(x, y) -> struct(x AS a, y AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(cap)
        .collect()
      if (cand.isEmpty) done = true
      else {
        val touched = scala.collection.mutable.HashSet.empty[String]
        val taken = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var i = 0
        while (i < cand.length && taken.size < quota) {
          val (a, b, cnt) =
            (cand(i).getString(0), cand(i).getString(1), cand(i).getLong(2))
          if (!touched(a) && !touched(b) && !touched(a + b)) {
            taken += ((a, b, cnt))
            touched ++= Seq(a, b, a + b)
          }
          i += 1
        }
        taken.foreach { case (a, b, cnt) =>
          step += 1
          merges += ((step, a, b, cnt))
        }
        words = taken.foldLeft(words) { case (wdf, (a, b, _)) =>
          wdf.withColumn("enc", expr(s"replace(enc, '|$a||$b|', '|$a$b|')"))
        }.localCheckpoint(true)
      }
      r += 1
    }
    merges.toSeq.toDF("step", "left", "right", "cnt")
  }

  /** Apply a learned merge table: per document, the BPE token count
    * after all merges (the number every packing / budget operator
    * downstream consumes). The merge fold runs over the DISTINCT-word
    * table again — each document then just joins its words to their
    * final symbol counts; out-of-vocabulary words (non-`[a-z]+`
    * tokens were never trained) are excluded on both sides by
    * construction.
    *
    * The fold is CHUNKED: every `checkpointEvery` merges the word
    * table localCheckpoints, bounding any single plan at
    * `checkpointEvery` nested `replace` calls — a realistic 30k-merge
    * table would otherwise build one plan containing every merge (an
    * analysis/codegen blowup); the word table is |vocab|-sized, so the
    * per-chunk materialization is the cheap side of that trade.
    * Chunk boundaries cannot change the result (the fold is a strict
    * left-to-right composition either way — CorpusSpec asserts boundary
    * invariance and scalar-reference parity at a 500-merge table).
    *
    * @return (idCol, n_bpe_tokens: long) — documents with no eligible
    *         words report 0
    */
  def encodeTokenCounts(df: DataFrame, idCol: String, textCol: String,
                        merges: Seq[(String, String)],
                        checkpointEvery: Int = 100): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be positive")
    var acc = wordTable(df, textCol)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      acc = acc.withColumn("enc", expr(s"replace(enc, '|$a||$b|', '|$a$b|')"))
      if ((i + 1) % checkpointEvery == 0 && i + 1 < merges.size)
        acc = acc.localCheckpoint(true)
    }
    val words = acc.select(col("w"),
      size(expr("split(substring(enc, 2, length(enc) - 2), '\\\\|\\\\|')"))
        .cast("long").as("n_syms"))
    val docWords = df
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .where(col("w").rlike("^[a-z]+$"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("n"))
    df.select(col(idCol)).distinct()
      .join(docWords.join(words, "w")
        .groupBy(col(idCol)).agg(sum(col("n") * col("n_syms")).as("t")),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("t"), lit(0L)).as("n_bpe_tokens"))
  }
}
