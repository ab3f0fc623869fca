package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization + counting, quality scoring, language identification,
  * and document fingerprinting. All pure `Column` expression trees over
  * built-in (codegen'd) functions — each runs as a single narrow map over
  * the corpus, no shuffle, no UDFs, arbitrarily partitionable: at 100 TB
  * these scale linearly with input splits.
  */
object TextAnalysis {

  /** Top bigram collocations by pointwise mutual information —
    * PMI(a,b) = ln(P(ab)/(P(a)·P(b))) over adjacent token pairs, the
    * classic corpus-statistics diagnostic (multi-word expressions,
    * tokenizer-merge candidates, boilerplate phrase detection).
    *
    * Scale shape: ONE tokenized scan feeds both the bigram and unigram
    * counts (adjacent pairs only — linear in corpus size, never a
    * co-occurrence window explosion); corpus totals (T tokens,
    * B bigrams) ride as a 1-row broadcast scalar; the unigram joins are
    * plain key shuffles on the term. `minCount` filters bigrams BEFORE
    * the joins — rare-pair noise (PMI's known failure mode) never
    * travels. PMI reduces to ln(c_ab·T²/(B·c_a·c_b)) over exact integer
    * counts cast to double in a fixed operation order, ln r6-rounded at
    * the source (the cross-engine rule); top-N compiles to
    * TakeOrderedAndProject.
    *
    * @return (a, b, c_ab: long, pmi: double) — topN by PMI desc, ties
    *         (a, b) asc
    */
  def pmiBigrams(df: DataFrame, textCol: String, minCount: Long,
                 topN: Int): DataFrame = {
    require(minCount >= 1L, "minCount must be positive")
    require(topN >= 1, "topN must be positive")
    val tk = graft.Partitioning.spread(df)
      .where(col(textCol).isNotNull)
      .select(split(lower(col(textCol)), "\\s+").as("tk"))
      .select(filter(col("tk"), t => t =!= "").as("tk"))
      .localCheckpoint(true)
    val uni = tk.select(explode(col("tk")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val big0 = tk.where(size(col("tk")) >= 2)
      .select(explode(expr(
        "zip_with(slice(tk, 1, size(tk) - 1), slice(tk, 2, size(tk) - 1), " +
          "(x, y) -> struct(x AS a, y AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("c_ab"))
    val big = big0.where(col("c_ab") >= minCount)
    // B is the total over ALL bigrams — the probability denominator
    // must not shrink with the minCount noise filter
    val totals = uni.agg(sum(col("c")).as("t_tot"))
      .crossJoin(big0.agg(sum(col("c_ab")).as("b_tot")))
    val pmi = graft.Num.r6(log(
      (col("c_ab").cast("double") * col("t_tot").cast("double") * col("t_tot").cast("double")) /
        (col("b_tot").cast("double") * col("ca").cast("double") * col("cb").cast("double"))))
    big
      .join(uni.select(col("t").as("a"), col("c").as("ca")), "a")
      .join(uni.select(col("t").as("b"), col("c").as("cb")), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("c_ab"), pmi.as("pmi"))
      .orderBy(col("pmi").desc, col("a").asc, col("b").asc)
      .limit(topN)
  }

  /** Deterministic polynomial rolling hash of a string:
    * h = fold(chars)(h0=7)((h,c) => (h*131 + codepoint(c)) mod 1e9+7).
    * Kept below 2^30 so every intermediate product fits comfortably in a
    * 64-bit long (no overflow divergence between engines) — the same fold
    * is expressible in the DuckDB oracle via `list_reduce`.
    */
  def rollingHash(c: Column): Column = graft.functions.RollingHash.hash(c)

  /** HOF reference formulation; [[rollingHash]] must agree exactly. */
  def rollingHashHof(c: Column): Column =
    aggregate(
      split(c, ""),
      lit(7L),
      (h, ch) => (h * lit(131L) + ascii(ch)) % lit(1000000007L))

  /** Whitespace tokens, lowercased. */
  def tokens(c: Column): Column = split(lower(c), "\\s+")

  /** BPE-ish token count: word runs + individual punctuation marks, the
    * standard pre-tokenizer regex shape.
    */
  def bpeishCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\w+|[^\\w\\s]"), lit(0)))

  val stopwordsEn = Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

  /** Quality metrics (length / punctuation / stopword ratios) + a simple
    * composite score. Ratios rounded to 6 decimals so results hash-match
    * a DuckDB oracle despite float formatting differences.
    */
  def quality(df: DataFrame, textCol: String,
              tokensCol: Option[String] = None): DataFrame = {
    val t = col(textCol)
    val toks = tokensCol.map(col).getOrElse(tokens(t))
    val nTok = size(toks)
    val stop = typedLit(stopwordsEn)
    df.withColumn("n_chars_calc", length(t))
      .withColumn("n_tokens", nTok)
      .withColumn("avg_token_len",
        graft.Num.r6(length(t).cast("double") / nTok.cast("double")))
      .withColumn("punct_ratio",
        graft.Num.r6(size(regexp_extract_all(t, lit("[^\\w\\s]"), lit(0))).cast("double")
          / length(t).cast("double")))
      .withColumn("stopword_ratio",
        graft.Num.r6(size(filter(toks, tk => array_contains(stop, tk))).cast("double")
          / nTok.cast("double")))
      .withColumn("quality_score",
        graft.Num.r6(least(lit(1.0), nTok.cast("double") / lit(50.0)) * lit(0.5)
          + col("stopword_ratio") * lit(0.3)
          + (lit(1.0) - col("punct_ratio")) * lit(0.2)))
  }

  /** n-gram-heuristic language ID: count hits against tiny per-language
    * marker-word sets; argmax with a fixed precedence order for ties.
    * Scores are integers so the argmax is exactly reproducible in SQL.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with", "for"),
    "de" -> Seq("der", "die", "und", "ist", "mit", "für"),
    "fr" -> Seq("le", "la", "et", "est", "avec", "pour"),
    "es" -> Seq("el", "la", "y", "es", "con", "para"),
    "zh" -> Seq("的", "是", "和", "在", "了", "有"))

  def langId(df: DataFrame, textCol: String,
             tokensCol: Option[String] = None): DataFrame = {
    val toks = tokensCol.map(col).getOrElse(tokens(col(textCol)))
    val scored = langMarkers.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"score_$lang",
        size(filter(toks, tk => array_contains(typedLit(words), tk))))
    }
    // argmax by fixed precedence (list order wins ties) — same CASE chain
    // the oracle uses, so comparison semantics are identical
    val langs = langMarkers.map(_._1)
    val pred = langs.foldRight(lit("und")) { case (lang, acc) =>
      val beats = langs.filterNot(_ == lang)
        .map(o => col(s"score_$lang") >= col(s"score_$o"))
        .foldLeft(col(s"score_$lang") > 0)(_ && _)
      when(beats, lit(lang)).otherwise(acc)
    }
    scored.withColumn("lang_pred", pred)
  }

  /** Token counting summary per document. */
  def tokenStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens", size(tokens(col(textCol))))
      .withColumn("bpeish_tokens", bpeishCount(col(textCol)))
      .withColumn("chars", length(col(textCol)))

  /** Document fingerprint: rolling hash of the full text (S9-style content
    * identity for incremental dedup / change detection).
    */
  def fingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fingerprint", rollingHash(col(textCol)))

  /** Split documents into fixed-size token windows with a stride —
    * context-length chunking for training-sequence packing. Chunk i
    * covers tokens [i*stride, i*stride + chunkTokens); the last window
    * may be short; overlapping windows (stride < chunkTokens) are the
    * standard long-document treatment. Pure narrow explode — output
    * rows ≈ tokens/stride per doc, no shuffle.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    val toks = tokens(col(textCol))
    df.select(col(idCol).as("doc"), toks.as("_tk"))
      .select(col("doc"), col("_tk"),
        explode(sequence(lit(0),
          greatest(floor((size(col("_tk")) - 1) / lit(stride)).cast("int"), lit(0)))).as("chunk_idx"))
      .select(col("doc"), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("_tk"), col("chunk_idx") * stride + 1, lit(chunkTokens)).as("_c"))
      .select(col("doc"), col("chunk_idx"),
        array_join(col("_c"), " ").as("chunk_text"),
        size(col("_c")).cast("long").as("n_tokens"))
  }

  /** PII-shaped masking: emails, URLs, then digit runs become typed
    * placeholder tokens. Patterns use only constructs with identical
    * semantics in Java regex and RE2 (character classes, `+`, literal
    * anchors) so the same text scrubs identically in any engine.
    * Application ORDER matters (URL before NUM, or port numbers leak) —
    * keep it in sync with the oracle SQL.
    */
  /** HTML boilerplate stripping — the first pass every web-crawl text
    * pipeline applies before quality/dedup: drop whole
    * script/style/noscript subtrees (their content is code, not prose),
    * strip the remaining tags, decode the common entities, and collapse
    * whitespace runs. Pure narrow regexp arithmetic; patterns are
    * RE2-compatible (inline `(?is)` flags, non-greedy subtree bodies)
    * so a DuckDB oracle reproduces every step byte-for-byte. This is a
    * heuristic TEXT pass, not an HTML parser — good enough for corpus
    * extraction, by design (a conformant parser would be a per-row
    * imperative library, the mapPartitions path).
    */
  def stripHtml(df: DataFrame, textCol: String,
                outCol: String = "clean"): DataFrame = {
    // one replace per subtree tag, NOT a back-referenced alternation —
    // RE2 (the oracle's engine) has no backreferences
    val noSubtrees = Seq("script", "style", "noscript")
      .foldLeft(col(textCol)) { (c, tag) =>
        regexp_replace(c, s"(?is)<$tag\\b[^>]*>.*?</$tag\\s*>", " ")
      }
    val noComments = regexp_replace(noSubtrees, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]*>", " ")
    // &amp; decodes LAST: an escaped entity shown as page content
    // ('&amp;lt;b&amp;gt;' renders as '&lt;b&gt;') must yield the
    // literal entity TEXT, never double-decode into a live tag
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    df.withColumn(outCol, trim(regexp_replace(decoded, "\\s+", " ")))
  }

  /** Unicode-script profile — the multilingual-corpus audit signal
    * (which writing system dominates a document) that a marker-word
    * langId ([[langId]]) cannot give for unseen languages: per-script
    * character counts over the standard blocks, ratios over the total
    * SCRIPT-character count (r6-rounded), and a dominant-script argmax
    * with fixed precedence ties (same integer-argmax idiom as langId).
    * Documents with no script characters at all profile as 'none'.
    * One narrow pass, zero shuffles.
    */
  val scriptBlocks: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-zÀ-ÖØ-öø-ÿĀ-ɏ", // ASCII + Latin-1 letters + Extended A/B
    "cyrillic" -> "Ѐ-ӿ",
    "greek" -> "Ͱ-Ͽ",
    "arabic" -> "؀-ۿ",
    "cjk" -> "一-鿿぀-ヿ가-힣ᄀ-ᇿ") // unified ideographs, kana, hangul (+jamo)

  def scriptProfile(df: DataFrame, textCol: String): DataFrame = {
    val counted = scriptBlocks.foldLeft(df) { case (d, (name, range)) =>
      // regexp_count, not size(regexp_extract_all(...)): the count is
      // identical without materializing one string per matched char
      d.withColumn(s"n_$name",
        regexp_count(col(textCol), lit(s"[$range]")).cast("long"))
    }
    val total = scriptBlocks.map(b => col(s"n_${b._1}")).reduce(_ + _)
    val withTotal = counted.withColumn("n_script_chars", total)
    val ratioed = scriptBlocks.foldLeft(withTotal) { case (d, (name, _)) =>
      d.withColumn(s"ratio_$name",
        when(col("n_script_chars") > 0, graft.Num.r6(
          col(s"n_$name").cast("double") / col("n_script_chars").cast("double")))
          .otherwise(lit(0.0)))
    }
    // fixed-precedence argmax: earlier blocks win ties (>=), 'none' when
    // nothing matched — deterministic like langId's integer argmax
    val names = scriptBlocks.map(_._1)
    val dominant = names.foldRight(lit("none"): Column) { (name, els) =>
      val beats = names.filterNot(_ == name)
        .map(o => col(s"n_$name") >= col(s"n_$o"))
        .foldLeft(col(s"n_$name") > 0)(_ && _)
      when(beats, lit(name)).otherwise(els)
    }
    ratioed.withColumn("script_pred", dominant)
  }

  def scrub(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("scrubbed",
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol),
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
          "https?://[^\\s]+", "<URL>"),
        "[0-9]+", "<NUM>"))

  /** Deterministic train/val/test split: label each row by where its
    * content hash lands in [0,100) — `train` below `trainPct`, `val`
    * below `trainPct + valPct`, `test` otherwise. Same stability
    * properties as [[hashSample]]: assignments survive re-ingestion and
    * corpus growth, and a document can never migrate between splits —
    * the property that prevents train/test leakage across dataset
    * versions.
    */
  def hashSplit(df: DataFrame, textCol: String, trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct, 0 <= valPct, trainPct+valPct < 100; got $trainPct/$valPct")
    val h = pmod(rollingHash(col(textCol)), lit(100L))
    df.withColumn("split",
      when(h < trainPct, "train")
        .when(h < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic hash sampling: keep rows whose content hash lands
    * under `pct` of the modulus. Unlike seeded RNG sampling this is
    * reproducible across engines, runs, AND growing datasets (a doc's
    * membership never changes as the corpus grows) — the property that
    * makes train/eval splits stable over re-ingestion. One narrow
    * filter, no shuffle.
    */
  def hashSample(df: DataFrame, textCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    df.filter(pmod(rollingHash(col(textCol)), lit(100L)) < pct)
  }

  /** Deterministic STRATIFIED sampling: per-group keep percentages
    * (e.g. downsample boilerplate-heavy languages, keep all of a rare
    * one) with the same content-hash stability as [[hashSample]] — a
    * document's membership never flips across runs or corpus growth,
    * and is independent of which group table partition it lands in.
    * Groups absent from `pcts` keep `defaultPct`. One narrow filter —
    * no shuffle, no per-group scan (a seeded `sampleBy` re-rolls
    * membership every run; this never does).
    */
  /** Weighted sampling WITHOUT replacement, deterministic: the
    * Efraimidis–Spirakis A-ES scheme with the per-row uniform drawn
    * from the content hash instead of an RNG. Each row gets
    * `u = (rollingHash(text) + 1) / (P + 1)` ∈ (0, 1] and priority key
    * `ln(u) / w` (the monotone transform of the classic `u^(1/w)` —
    * maximizing either picks the same rows, and the log form needs no
    * `pow`); the k rows with the LARGEST keys are the weighted sample.
    * Higher weight pulls the key toward 0 (the maximum), so a
    * quality-weighted corpus selection keeps high-quality docs with
    * proportionally higher odds while still giving every positive-weight
    * doc a chance — the production middle ground between hard top-k by
    * score (no diversity) and uniform sampling (no quality signal).
    * Membership is content-hash stable: re-running, re-sharding, or
    * re-ordering the corpus never re-rolls the sample (the [[hashSample]]
    * contract, extended to weights).
    *
    * Keys are r6-rounded (cross-engine `ln` may differ in the last ulp;
    * the 1e-6 grid absorbs it) with ties broken by `idCol`. The top-k
    * compiles to `TakeOrderedAndProject` — per-partition top-k, driver
    * merge, no global sort. Rows with NULL text or weight ≤ 0 are
    * excluded (they have no defined draw).
    *
    * @return input columns + `wkey`, the k selected rows
    */
  def weightedSample(df: DataFrame, idCol: String, textCol: String,
                     weightCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (rollingHash(col(textCol)).cast("double") + lit(1.0d)) /
      lit(1000000008.0d)
    df.where(col(textCol).isNotNull && col(weightCol) > 0.0d)
      .withColumn("wkey", graft.Num.r6(log(u) / col(weightCol)))
      .orderBy(col("wkey").desc, col(idCol).asc)
      .limit(k)
  }

  def stratifiedSample(df: DataFrame, groupCol: String, textCol: String,
                       pcts: Map[String, Int], defaultPct: Int): DataFrame = {
    require((pcts.values.toSeq :+ defaultPct).forall(p => p >= 0 && p <= 100),
      "percentages must be in [0,100]")
    val pct = pcts.foldLeft(lit(defaultPct)) { case (acc, (g, p)) =>
      when(col(groupCol) === g, lit(p)).otherwise(acc)
    }
    df.filter(pmod(rollingHash(col(textCol)), lit(100L)) < pct)
  }

  /** Gopher-style repetition metrics (Rae et al. 2021 §A1.1 use these
    * as removal rules for machine-generated/boilerplate text): per
    * document, the fraction of tokens taken by the single most frequent
    * word (`top_word_frac`), by the most frequent word bigram
    * (`top_bigram_frac`), and the distinct-token ratio
    * (`distinct_frac`). High top-fractions / low distinct ratios mark
    * repetitive junk a training corpus should drop.
    *
    * Entirely narrow per-row array arithmetic — no shuffle, no
    * tokenizer state; the inner frequency count is O(v*n) per doc over
    * the doc's own (small) vocabulary, which stays cache-resident.
    * Text is trimmed before tokenizing (a raw split would count the
    * empty-string tokens flanking leading/trailing whitespace). NULL
    * text yields NULL n_tokens and NULL metrics; empty or
    * whitespace-only text yields n_tokens = 0 and NULL metrics
    * (nothing to measure ≠ maximally repetitive — an untrimmed split
    * of "" is [""], which would score top_word_frac = 1.0 and feed an
    * admission filter exactly backwards).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withRepetitionCols(
      graft.Partitioning.spread(df).select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), col("rep_n_tokens").as("n_tokens"), col("top_word_frac"),
        col("top_bigram_frac"), col("distinct_frac"))

  /** Column-adding form of [[repetitionStats]] — composes NARROWLY with
    * other per-row scorers (e.g. [[quality]] inside
    * [[Corpus.gopherFilter]]) without an id-keyed self-join. Adds
    * `top_word_frac`, `top_bigram_frac`, `distinct_frac` and
    * `rep_n_tokens` (named to avoid clobbering [[quality]]'s
    * `n_tokens`, whose untrimmed tokenizer counts differently on
    * padded text).
    */
  private[graft] def withRepetitionCols(df: DataFrame, textCol: String): DataFrame = {
    // regex strip, not trim(): trim only removes ASCII spaces, so a
    // tab-only document would still tokenize to empty-string tokens
    val trimmed = regexp_replace(col(textCol), "^\\s+|\\s+$", "")
    val tk = when(length(trimmed) > 0, split(lower(trimmed), "\\s+"))
      .otherwise(array().cast("array<string>"))
    def topFrac(arr: Column): Column = {
      val n = size(arr)
      val topCnt = array_max(transform(array_distinct(arr),
        w => size(filter(arr, x => x === w))))
      when(n > 0, graft.Num.r6(topCnt.cast("double") / n.cast("double")))
    }
    df.withColumn("tk0", tk)
      .withColumn("rep_n_tokens", when(col(textCol).isNotNull,
        size(col("tk0")).cast("long")))
      .withColumn("top_word_frac", topFrac(col("tk0")))
      .withColumn("top_bigram_frac", topFrac(
        // greatest(..., 0): slice() rejects a negative length, and an
        // empty token array (empty/whitespace-only text) yields size-1 = -1
        zip_with(slice(col("tk0"), lit(1), greatest(size(col("tk0")) - 1, lit(0))),
          slice(col("tk0"), lit(2), greatest(size(col("tk0")) - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b))))
      .withColumn("distinct_frac", when(size(col("tk0")) > 0,
        graft.Num.r6(size(array_distinct(col("tk0"))).cast("double")
          / size(col("tk0")).cast("double"))))
      .drop("tk0")
  }
}
