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
    * @return (step: int — 1-based, left, right, cnt: long) — the merge
    *         table in learned order
    */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1, "nMerges must be at least 1")
    val spark = df.sparkSession
    import spark.implicits._
    var words = wordTable(df, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val top = words
        .select(col("freq"),
          expr("split(substring(enc, 2, length(enc) - 2), '\\\\|\\\\|')").as("s"))
        .where(size(col("s")) >= 2)
        .select(col("freq"), explode(expr(
          "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1), " +
            "(x, y) -> struct(x AS a, y AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        step += 1
        merges += ((step, a, b, cnt))
        words = words
          .withColumn("enc", expr(s"replace(enc, '|$a||$b|', '|$a$b|')"))
          .localCheckpoint(true)
      }
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
