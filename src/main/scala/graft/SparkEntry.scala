package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{EtlLeaf, EtlObj, EtlSchema}
import graft.ops._
import graft.llm._

/** Driver contract: one named query per implemented operator (SURVEY §2 +
  * the LLM-pipeline family), each with DuckDB-equivalent oracle SQL over
  * the same parquet tables. Column names and numeric types are aligned on
  * both sides (the driver sorts columns by name and hashes values), and
  * every rounded double uses [[Num.r6]] — the identical
  * `floor(x*1e6+0.5)/1e6` float expression — in both engines.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright; read it as raw nanos (legacy flag) and
    * rebuild a microsecond timestamp with integer arithmetic (`div`, not
    * `/`: a long→double division would lose precision above 2^53 ns).
    * Oracle equivalent: `make_timestamp(epoch_ns(ts) // 1000)`.
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Deterministic partsupp synthesis — the driver testdata ships no
    * partsupp table, so the three TPC-H shapes that need one (q2 / q9 /
    * q11) derive it: 4 supplier slots per part, supplier/qty/cost all
    * integer arithmetic over (p_partkey, slot) that the DuckDB oracle
    * reproduces verbatim ([[partsuppCte]]). Supply cost stays in
    * INTEGER CENTS end-to-end per the engine's money idiom. The
    * supplier count enters as a broadcast one-row aggregate, never a
    * driver-side count.
    */
  private def partsupp(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").select(col("p_partkey"))
    val sCount = t(s, dir, "supplier").agg(count(lit(1)).as("s_cnt"))
    p.crossJoin(broadcast(sCount))
      .select(col("p_partkey").as("ps_partkey"),
        explode(sequence(lit(0L), lit(3L))).as("i"), col("s_cnt"))
      .select(col("ps_partkey"),
        ((col("ps_partkey") * 3 + col("i") * ((col("s_cnt") / 4).cast("long") + 1))
          % col("s_cnt")).as("ps_suppkey"),
        ((col("ps_partkey") * 31 + col("i") * 17) % 9999 + 1).as("ps_availqty"),
        ((col("ps_partkey") * 37 + col("i") * 11) % 100000 + 100)
          .as("ps_supplycost_cents"))
  }

  /** DuckDB mirror of [[partsupp]], ending in `ps(ps_partkey,
    * ps_suppkey, ps_availqty, ps_supplycost_cents)`.
    */
  private lazy val partsuppCte: String =
    s"""ps AS (SELECT p_partkey AS ps_partkey,
       |  (p_partkey * 3 + i * ((SELECT count(*) FROM supplier) // 4 + 1))
       |    % (SELECT count(*) FROM supplier) AS ps_suppkey,
       |  (p_partkey * 31 + i * 17) % 9999 + 1 AS ps_availqty,
       |  (p_partkey * 37 + i * 11) % 100000 + 100 AS ps_supplycost_cents
       |FROM part, generate_series(0, 3) t(i))""".stripMargin

  // ------------------------------------------------------------------ views

  /** Flagship view query (SURVEY §7 step 5): the applyView('person')
    * analogue — customer ⟕ nation ⟕ region as the person⟕entity⟕belonging
    * N:1 chain with equality `where` (F6), required joins (J1),
    * broadcast-hinted dimensions.
    */
  private def viewFlagship(s: SparkSession, dir: String): DataFrame = {
    import ViewDsl._
    val reg = new Registry(Map(
      "Customer" -> t(s, dir, "customer"),
      "Nation"   -> t(s, dir, "nation"),
      "Region"   -> t(s, dir, "region")))
    val tree = ViewNode("Customer", where = Seq("c_mktsegment" -> "BUILDING"),
      children = Seq(ViewNode("Nation", required = true, broadcast = true,
        assoc = Some(Assoc("c_nationkey", "n_nationkey", BelongsTo)),
        children = Seq(ViewNode("Region", required = true, broadcast = true,
          assoc = Some(Assoc("n_regionkey", "r_regionkey", BelongsTo)))))))
    reg.applyView(tree)
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
  }

  // --------------------------------------------------------- oracle helpers

  /** DuckDB SQL for [[TextAnalysis.rollingHash]] of `expr`: identical fold
    * (h0=7; h = (h*131 + codepoint) mod 1e9+7). list_reduce has no init
    * parameter, so the seed is prepended to the codepoint list.
    */
  private def rhSql(expr: String, mult: Long = 131L): String =
    // NULL input must stay NULL: DuckDB's list_prepend(7, NULL) yields
    // [7], which would fingerprint a NULL text as the seed value while
    // Spark's rolling hash (null-safe expression) returns NULL
    s"CASE WHEN $expr IS NULL THEN NULL ELSE " +
      s"list_reduce(list_prepend(CAST(7 AS BIGINT), " +
      s"list_transform(string_split_regex($expr, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * $mult + b) % 1000000007) END"

  /** DuckDB BIGINT list of the UTF-8 bytes of a VARCHAR expression —
    * the oracle-side mirror of Spark's `encode(text, 'UTF-8')` payload.
    * DuckDB exposes characters (codepoints), not bytes, so each
    * codepoint expands to its UTF-8 encoding arithmetically (1-4 byte
    * classes). This keeps the multimodal oracles byte-accurate on
    * non-ASCII text, where per-character ascii()/substr() formulations
    * silently diverge from the payload bytes Spark processes.
    */
  private def utf8BytesSql(e: String): String =
    s"""CASE WHEN $e IS NULL THEN NULL
       |     WHEN $e = '' THEN CAST([] AS BIGINT[])
       |     ELSE flatten(list_transform(string_split_regex($e, ''), c ->
       |       CASE WHEN unicode(c) < 128 THEN [CAST(unicode(c) AS BIGINT)]
       |            WHEN unicode(c) < 2048 THEN [
       |              CAST(192 + unicode(c) // 64 AS BIGINT),
       |              CAST(128 + unicode(c) % 64 AS BIGINT)]
       |            WHEN unicode(c) < 65536 THEN [
       |              CAST(224 + unicode(c) // 4096 AS BIGINT),
       |              CAST(128 + (unicode(c) // 64) % 64 AS BIGINT),
       |              CAST(128 + unicode(c) % 64 AS BIGINT)]
       |            ELSE [
       |              CAST(240 + unicode(c) // 262144 AS BIGINT),
       |              CAST(128 + (unicode(c) // 4096) % 64 AS BIGINT),
       |              CAST(128 + (unicode(c) // 64) % 64 AS BIGINT),
       |              CAST(128 + unicode(c) % 64 AS BIGINT)] END)) END""".stripMargin

  /** Non-ASCII fixture rows for the multimodal byte-parity gates: the
    * 2-byte (Latin-1 supplement), 3-byte (CJK) and 4-byte (emoji) UTF-8
    * classes all present, so byte-vs-codepoint divergence cannot hide.
    * Unioned literally on BOTH sides (Spark input and oracle SQL).
    */
  private val nonAsciiDocs = Seq(
    99992L -> "héllo wörld — 日本語テキスト 😀",
    99993L -> "Größenmaßstäbe: čeština, русский, ελληνικά")

  private def withNonAsciiDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id"), col("text"))
      .union(nonAsciiDocs.toDF("doc_id", "text"))
  }

  private def nonAsciiUnionSql: String =
    nonAsciiDocs.map { case (i, txt) => s"UNION ALL SELECT $i, '$txt'" }.mkString(" ")

  /** DuckDB CTE chain ending in `rep(doc_id, rep_n_tokens,
    * top_word_frac, top_bigram_frac, distinct_frac)` — mirrors
    * [[TextAnalysis.withRepetitionCols]] (whitespace-strip, tokenize,
    * Gopher top-word/top-bigram/distinct fractions). Shared by the
    * repetition gate and the composite Gopher-filter oracle.
    */
  private def repetitionCtes(from: String): String = {
    val topWord = Num.r6Sql(
      "CAST(list_max(list_transform(list_distinct(tk), w -> len(list_filter(tk, x -> x = w)))) AS DOUBLE) / CAST(len(tk) AS DOUBLE)")
    val topBigram = Num.r6Sql(
      "CAST(list_max(list_transform(list_distinct(bg), w -> len(list_filter(bg, x -> x = w)))) AS DOUBLE) / CAST(len(bg) AS DOUBLE)")
    val distinctFrac = Num.r6Sql(
      "CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE)")
    s"""rs AS (SELECT doc_id, text,
       |         regexp_replace(text, '^\\s+|\\s+$$', '', 'g') AS st FROM $from),
       |rb AS (SELECT doc_id, text,
       |         CASE WHEN st = '' THEN CAST([] AS VARCHAR[])
       |              ELSE string_split_regex(lower(st), '\\s+') END AS tk FROM rs),
       |rg AS (SELECT *, list_transform(generate_series(1, len(tk) - 1),
       |                                i -> tk[i] || ' ' || tk[i + 1]) AS bg FROM rb),
       |rep AS (SELECT doc_id,
       |  CASE WHEN text IS NULL THEN NULL ELSE CAST(len(tk) AS BIGINT) END AS rep_n_tokens,
       |  CASE WHEN len(tk) > 0 THEN $topWord END AS top_word_frac,
       |  CASE WHEN len(bg) > 0 THEN $topBigram END AS top_bigram_frac,
       |  CASE WHEN len(tk) > 0 THEN $distinctFrac END AS distinct_frac
       |FROM rg)""".stripMargin
  }

  /** DuckDB CTE chain `nv -> c0..c{iters} -> cent -> asg` mirroring the
    * IVF front half over the embeddings table
    * ([[Similarity.quantizedCorpus]] + [[Similarity.assignClusters]]:
    * lowest-id seeds refined by `iters` Lloyd's rounds; assignment =
    * max-cosine centroid, ties to lowest cid; new centroid = normalized
    * mean with per-dimension sums as exact integers floor(x*1e6+0.5) —
    * the associative form both engines reproduce byte-identically).
    * Ends in asg(nn_id, cv, cluster); shared by the IVF-ANN and
    * SemDeDup oracles.
    */
  private def ivfAsgCtes(nCentroids: Int, iters: Int): String = {
    val kmeansCtes = (0 until iters).map { i =>
      s"""a$i AS (SELECT id, v, cid FROM (
         |  SELECT nn.id, nn.v, c.cid,
         |         row_number() OVER (PARTITION BY nn.id ORDER BY ${dotSql("nn.v", "c.centv")} DESC, c.cid ASC) AS rn
         |  FROM nv nn CROSS JOIN c$i c) WHERE rn = 1),
         |u$i AS (SELECT cid, unnest(v) AS x, unnest(generate_series(1, len(v))) AS dim FROM a$i),
         |s$i AS (SELECT cid, dim, sum(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS sx,
         |               count(*) AS cnt FROM u$i GROUP BY cid, dim),
         |m$i AS (SELECT cid, list(CAST(sx AS DOUBLE) / 1000000.0 / CAST(cnt AS DOUBLE) ORDER BY dim) AS mv
         |        FROM s$i GROUP BY cid),
         |c${i + 1} AS (SELECT c.cid,
         |              CASE WHEN m.mv IS NULL THEN c.centv ELSE ${nvSql("m.mv")} END AS centv
         |              FROM c$i c LEFT JOIN m$i m USING (cid))""".stripMargin
    }.mkString(",\n")
    s"""nv AS (SELECT vec_id AS id, ${nvSql("embedding")} AS v FROM embeddings),
       |c0 AS (SELECT id AS cid, v AS centv FROM nv WHERE id IN (SELECT id FROM nv ORDER BY id LIMIT $nCentroids)),
       |$kmeansCtes,
       |cent AS (SELECT cid, centv AS cv FROM c$iters),
       |asg AS (SELECT id AS nn_id, v AS cv, cid AS cluster FROM (
       |  SELECT nn.id, nn.v, c.cid,
       |         row_number() OVER (PARTITION BY nn.id ORDER BY ${dotSql("nn.v", "c.cv")} DESC, c.cid ASC) AS rn
       |  FROM nv nn CROSS JOIN cent c) WHERE rn = 1)""".stripMargin
  }

  /** DuckDB SQL for the L2-normalized double vector of `expr` (mirrors
    * [[Similarity.normalize]]: cast-to-double, sequential-fold sum of
    * squares, per-element divide).
    */
  private def nvSql(expr: String): String =
    s"list_transform($expr, x -> CAST(x AS DOUBLE) / " +
      s"sqrt(list_reduce(list_transform($expr, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), " +
      s"(a, b) -> a + b)))"

  /** DuckDB SQL for [[Similarity.dot]] over two normalized vectors (the
    * lambda index `i` is 1-based in DuckDB, matching `b[i]` 1-based
    * element access).
    */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform($a, (x, i) -> x * $b[i]), (p, q) -> p + q)"

  /** DuckDB SQL for [[Similarity.hyperplaneBucket]] over normalized vector
    * `v` (dims 0-based: `i-1`).
    */
  private def bucketSql(v: String, nPlanes: Int, firstPlane: Int = 0): String =
    (0 until nPlanes).map { p =>
      val comp = s"((((${firstPlane + p} * 4096 + (i - 1)) * 1103515245 + 12345) % 2147483648) / 2147483648.0 - 0.5)"
      s"CASE WHEN list_reduce(list_transform($v, (x, i) -> x * $comp), (p_, q_) -> p_ + q_) >= 0 " +
        s"THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString("(", " + ", ")")

  /** DuckDB SQL for the multi-table OR-amplified [[Similarity.topKLsh]]
    * oracle at (nPlanes, nTables): per-table bucket UNION, cross-table
    * candidate dedup, exact rescoring, rank. Table t hashes with planes
    * [t*nPlanes, (t+1)*nPlanes), matching the Scala side.
    */
  private def mlshOracleSql(nPlanes: Int, nTables: Int): String = {
    val score = Num.r6Sql(dotSql("c.v", "q.v"))
    val tables = (0 until nTables).map { t =>
      val sel = if (t == 0) "SELECT id, v, 0 AS tbl, " else s"SELECT id, v, $t, "
      sel + bucketSql("v", nPlanes, t * nPlanes) +
        (if (t == 0) " AS bucket FROM nv" else " FROM nv")
    }.mkString("\n  UNION ALL ")
    s"""WITH nv AS (SELECT vec_id AS id, ${nvSql("embedding")} AS v FROM embeddings),
       |bks AS ($tables),
       |cand AS (SELECT DISTINCT q.id AS query_id, c.id AS nn_id
       |         FROM bks c JOIN bks q ON c.tbl = q.tbl AND c.bucket = q.bucket
       |         WHERE q.id < 20 AND c.id <> q.id),
       |sc AS (SELECT cand.query_id, cand.nn_id, $score AS score
       |       FROM cand JOIN nv c ON c.id = cand.nn_id
       |                 JOIN nv q ON q.id = cand.query_id)
       |SELECT query_id, nn_id, score, CAST(rank AS INT) AS rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, nn_id) AS rank FROM sc)
       |WHERE rank <= 5""".stripMargin
  }

  /** toks + sh0: distinct (doc, n-gram shingle) pairs — the uncapped
    * prefix shared by the string-shingle ([[shingleCte]]) and
    * hashed-shingle ([[minhashCtes]]) families.
    */
  private def tokenShingleCte(n: Int, from: String = "documents"): String = {
    val gram = (0 until n).map(j => if (j == 0) "tk[i]" else s"tk[i + $j]")
      .mkString(" || ' ' || ")
    s"""toks AS (SELECT doc_id AS doc, string_split_regex(lower(text), '\\s+') AS tk FROM $from),
       |sh0 AS (SELECT DISTINCT doc, unnest(list_transform(generate_series(1, len(tk) - ${n - 1}), i -> $gram)) AS sh FROM toks WHERE len(tk) >= $n)""".stripMargin
  }

  private def shingleCte(n: Int, cap: Long): String =
    s"""${tokenShingleCte(n)},
       |shf AS (SELECT sh FROM (SELECT sh, count(*) AS c FROM sh0 GROUP BY sh) WHERE c <= $cap),
       |sh1 AS (SELECT doc, sh FROM sh0 WHERE sh IN (SELECT sh FROM shf)),
       |sizes AS (SELECT doc, count(*) AS sz FROM sh1 GROUP BY doc)""".stripMargin

  private def jaccardSql(interRel: String, threshold: Double): String = {
    val j = Num.r6Sql(s"CAST(i AS DOUBLE) / CAST(s1.sz + s2.sz - i AS DOUBLE)")
    s"""SELECT d1, d2, $j AS jaccard
       |FROM $interRel x JOIN sizes s1 ON x.d1 = s1.doc JOIN sizes s2 ON x.d2 = s2.doc
       |WHERE $j >= $threshold""".stripMargin
  }

  /** The full MinHash+LSH pair pipeline as reusable DuckDB CTEs ending in
    * `mh_pairs(d1, d2, jaccard)` — shared by the pair query and the
    * cluster query (mirrors [[Dedup.minhashLsh]] with n=3, k=16,
    * rowsPerBand=4, threshold=0.3, maxDocFreq=20).
    */
  private lazy val minhashCtes: String = {
    val perms = (0 until 16).map(i =>
      s"($i, ${Dedup.mixConstant(2L * i)}, ${Dedup.mixConstant(2L * i + 1)})").mkString(", ")
    // hashed-shingle formulation (mirrors Dedup.docShinglesHashed): the
    // cap, sizes, and verify intersection all operate on h = rh(sh)
    s"""${tokenShingleCte(3)},
       |h0 AS (SELECT DISTINCT doc, ${rhSql("sh")} AS h FROM sh0),
       |hf AS (SELECT h FROM (SELECT h, count(*) AS c FROM h0 GROUP BY h) WHERE c <= 20),
       |h1 AS (SELECT doc, h FROM h0 WHERE h IN (SELECT h FROM hf)),
       |sizes AS (SELECT doc, count(*) AS sz FROM h1 GROUP BY doc),
       |perms(i, a, b) AS (VALUES $perms),
       |mh AS (SELECT doc, i, min((a * h + b) % 2147483647) AS mh FROM h1 CROSS JOIN perms GROUP BY doc, i),
       |bands AS (SELECT doc, i // 4 AS band, string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bkey
       |          FROM mh GROUP BY doc, i // 4),
       |cand AS (SELECT DISTINCT l.doc AS d1, r.doc AS d2 FROM bands l
       |         JOIN bands r ON l.band = r.band AND l.bkey = r.bkey WHERE l.doc < r.doc),
       |inter AS (SELECT a.doc AS d1, b.doc AS d2, count(*) AS i
       |          FROM h1 a JOIN h1 b USING (h)
       |          JOIN cand c ON a.doc = c.d1 AND b.doc = c.d2
       |          WHERE a.doc < b.doc GROUP BY a.doc, b.doc),
       |mh_pairs AS (${jaccardSql("inter", 0.3)})""".stripMargin
  }

  /** Tokenized-documents base CTE shared by the text-analysis family. */
  private lazy val textBCte: String =
    s"""b AS (SELECT doc_id, text, string_split_regex(lower(text), '\\s+') AS toks FROM documents)"""

  /** Quality-metric CTEs ending in `qual` (mirrors
    * [[TextAnalysis.quality]]; ratios r6-rounded BEFORE the composite
    * score, exactly like the Spark columns).
    */
  private lazy val qualityCtes: String = {
    val stop = TextAnalysis.stopwordsEn.map(w => s"'$w'").mkString("[", ", ", "]")
    val avg = Num.r6Sql("CAST(length(text) AS DOUBLE) / CAST(len(toks) AS DOUBLE)")
    val punct = Num.r6Sql(raw"CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) / CAST(length(text) AS DOUBLE)")
    val stopr = Num.r6Sql(s"CAST(len(list_filter(toks, t -> list_contains($stop, t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)")
    val score = Num.r6Sql("least(1.0, CAST(nt AS DOUBLE) / 50.0) * 0.5 + stopword_ratio * 0.3 + (1.0 - punct_ratio) * 0.2")
    s"""qm AS (SELECT doc_id, CAST(length(text) AS INT) AS n_chars_calc,
       |             CAST(len(toks) AS INT) AS n_tokens,
       |             $avg AS avg_token_len, $punct AS punct_ratio, $stopr AS stopword_ratio,
       |             len(toks) AS nt FROM b),
       |qual AS (SELECT doc_id, n_chars_calc, n_tokens, avg_token_len, punct_ratio,
       |                stopword_ratio, $score AS quality_score FROM qm)""".stripMargin
  }

  /** Language-ID CTEs ending in `lang` (mirrors [[TextAnalysis.langId]]'s
    * fixed-precedence integer argmax).
    */
  private lazy val langCtes: String = {
    val langs = TextAnalysis.langMarkers.map(_._1)
    val scores = TextAnalysis.langMarkers.map { case (l, ws) =>
      val lst = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"CAST(len(list_filter(toks, t -> list_contains($lst, t))) AS INT) AS score_$l"
    }.mkString(", ")
    val cases = langs.map { l =>
      val beats = (s"score_$l > 0" +: langs.filterNot(_ == l)
        .map(o => s"score_$l >= score_$o")).mkString(" AND ")
      s"WHEN $beats THEN '$l'"
    }.mkString(" ")
    s"""lsc AS (SELECT doc_id, $scores FROM b),
       |lang AS (SELECT doc_id, CASE $cases ELSE 'und' END AS lang_pred FROM lsc)""".stripMargin
  }

  /** Winnowing CTEs ending in `wsel(doc, f)` — f = struct(pos, h), the
    * rightmost-minimal gram hash of each w-window (mirrors
    * [[Dedup.winnowFingerprints]]: same k-gram rolling hash, same
    * <=-fold tie rule, same short-doc exclusion).
    */
  private def winnowCtes(k: Int, w: Int, confirm: Boolean = false): String = {
    val gram = (0 until k).map(j => if (j == 0) "tk[i]" else s"tk[i + $j]")
      .mkString(" || ' ' || ")
    // confirm adds the second independent hash (mult 137) the pair
    // gate keys on; window-min selection stays on h alone either way
    val h2Field = if (confirm) s",\n       |                            h2 := ${rhSql(s"($gram)", 137L)}" else ""
    s"""wt AS (SELECT doc_id AS doc,
       |         string_split_regex(lower(text), '\\s+') AS tk FROM documents),
       |wg AS (SELECT doc,
       |         list_transform(generate_series(1, len(tk) - ${k - 1}),
       |           i -> struct_pack(pos := CAST(i - 1 AS BIGINT),
       |                            h := ${rhSql(s"($gram)")}$h2Field)) AS gr
       |       FROM wt WHERE len(tk) >= $k),
       |wsel AS (SELECT doc,
       |           unnest(list_transform(generate_series(1, len(gr) - ${w - 1}),
       |             j -> list_reduce(gr[j : j + ${w - 1}],
       |               (acc, x) -> CASE WHEN x.h <= acc.h THEN x ELSE acc END))) AS f
       |         FROM wg WHERE len(gr) >= $w)""".stripMargin
  }

  /** CCNet-perplexity CTEs ending in `ppl(doc_id, ppl)` (mirrors
    * [[Corpus.bigramLm]] with topM=100 on the doc_id%10=0 reference
    * slice + [[Corpus.perplexityScore]]'s stupid-backoff arithmetic).
    * CTE names are p-prefixed so the block composes with the shingle /
    * quality / language families in one WITH.
    */
  private lazy val perplexityCtes: String =
    s"""pref AS (SELECT list_filter(string_split_regex(lower(text), '\\s+'),
       |                t -> t <> '') AS tk
       |         FROM documents WHERE doc_id % 10 = 0 AND text IS NOT NULL),
       |prefbi AS (SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
       |                    i -> struct_pack(a := tk[i], b := tk[i + 1]))) AS p
       |           FROM pref WHERE len(tk) >= 2),
       |pbigram AS (SELECT a, b, cab FROM (
       |              SELECT p.a AS a, p.b AS b, count(*) AS cab,
       |                     row_number() OVER (ORDER BY count(*) DESC, p.a ASC, p.b ASC) AS rn
       |              FROM prefbi GROUP BY p.a, p.b)
       |            WHERE rn <= 100),
       |puni AS (SELECT t AS b, count(*) AS cb
       |         FROM (SELECT unnest(tk) AS t FROM pref) GROUP BY t),
       |ptot AS (SELECT sum(cb) AS t, count(*) AS v FROM puni),
       |pcorp AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |                   t -> t <> '') AS tk
       |          FROM documents WHERE text IS NOT NULL),
       |pcpairs AS (SELECT doc_id,
       |              unnest(list_transform(generate_series(1, len(tk) - 1),
       |                i -> struct_pack(a := tk[i], b := tk[i + 1]))) AS p
       |            FROM pcorp WHERE len(tk) >= 2),
       |pscored AS (SELECT doc_id,
       |              CASE WHEN bg.cab IS NOT NULL
       |                   THEN ln(CAST(bg.cab AS DOUBLE) / CAST(ua.cb AS DOUBLE))
       |                   ELSE ln(0.4) + ln(CAST(coalesce(ub.cb, 0) + 1 AS DOUBLE)
       |                                     / CAST(ptot.t + ptot.v AS DOUBLE)) END AS lp
       |            FROM pcpairs
       |            LEFT JOIN pbigram bg ON pcpairs.p.a = bg.a AND pcpairs.p.b = bg.b
       |            LEFT JOIN puni ua ON pcpairs.p.a = ua.b
       |            LEFT JOIN puni ub ON pcpairs.p.b = ub.b, ptot),
       |ppl AS (SELECT doc_id, ${Num.r6Sql("-avg(lp)")} AS ppl
       |        FROM pscored GROUP BY doc_id)""".stripMargin

  // ------------------------------------------------------------- the registry

  /** One entry per operator: (name, spark fn, oracle SQL). */
  private lazy val registry: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(

    // ---- view DSL / joins -------------------------------------------------
    ("view_flagship",
      (s: SparkSession, dir: String) => viewFlagship(s, dir),
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin),

    ("view_unique_first_order",
      (s: SparkSession, dir: String) => {
        import ViewDsl._
        val reg = new Registry(Map(
          "Customer" -> t(s, dir, "customer"), "Orders" -> t(s, dir, "orders")))
        val tree = ViewNode("Customer",
          children = Seq(ViewNode("Orders", unique = true,
            assoc = Some(Assoc("c_custkey", "o_custkey", BelongsTo)))))
        reg.applyView(tree)
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
      },
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN
        |  (SELECT * FROM orders QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) = 1) o
        |  ON c_custkey = o_custkey""".stripMargin),

    ("view_hasmany_nest",
      (s: SparkSession, dir: String) => {
        import ViewDsl._
        val reg = new Registry(Map(
          "Nation" -> t(s, dir, "nation"), "Customer" -> t(s, dir, "customer")))
        val tree = ViewNode("Nation",
          children = Seq(ViewNode("Customer", nest = true,
            assoc = Some(Assoc("n_nationkey", "c_nationkey", HasMany)))))
        reg.applyView(tree).select(col("n_nationkey"), col("n_name"),
          coalesce(size(col("customers")), lit(0)).cast("long").as("n_customers"),
          array_join(transform(col("customers"), x => x.getField("c_name")), ",").as("names"))
      },
      """SELECT n_nationkey, n_name, CAST(count(c_custkey) AS BIGINT) AS n_customers,
        |       string_agg(c_name, ',' ORDER BY c_custkey) AS names
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name""".stripMargin),

    ("view_m2m_through",
      (s: SparkSession, dir: String) => {
        val reg = new ViewDsl.Registry(Map(
          "Customer" -> t(s, dir, "customer"), "Orders" -> t(s, dir, "orders"),
          "Lineitem" -> t(s, dir, "lineitem")))
        reg.manyToMany("Customer", "Orders", "Lineitem",
            "c_custkey", "o_custkey", "o_orderkey", "l_orderkey")
          .groupBy(col("c_custkey"))
          .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("qty"))
      },
      """SELECT c_custkey, CAST(count(*) AS BIGINT) AS n_items, CAST(sum(l_quantity) AS DOUBLE) AS qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_custkey""".stripMargin),

    // ---- extract (J6 lookup joins, U2 dep DAG) ---------------------------
    ("extract_enrich",
      (s: SparkSession, dir: String) => {
        // spec deliberately scrambled: toposort must schedule
        // cust_nation_key before nation_name
        val spec = Seq(
          "nation_name" -> (Extract.Lookup(t(s, dir, "nation"), "cust_nation_key",
            "n_nationkey", Seq("n_name" -> "nation_name"),
            deps = Seq("cust_nation_key")): Extract.Extractor),
          "big_order" -> Extract.ExprField(Nil, _ => col("o_totalprice") > 100000.0),
          "cust_nation_key" -> Extract.Lookup(t(s, dir, "customer"), "o_custkey",
            "c_custkey", Seq("c_name" -> "cust_name", "c_nationkey" -> "cust_nation_key")))
        Extract.extract(t(s, dir, "orders"), spec)
          .select(col("o_orderkey"), col("cust_name"), col("cust_nation_key"),
            col("nation_name"), col("big_order"))
      },
      """SELECT o_orderkey, c_name AS cust_name, c_nationkey AS cust_nation_key,
        |       n_name AS nation_name, o_totalprice > 100000.0 AS big_order
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |            LEFT JOIN nation ON c_nationkey = n_nationkey""".stripMargin),

    ("extract_selfedge_bool",
      (s: SparkSession, dir: String) => {
        // C12 under the oracle gate: the reference's motherIsFemale/
        // fatherIsMale pattern — a nullable reference looked up against
        // self-edges, folded to a null-tolerant boolean via <=> (null
        // reference -> vacuously true; missing edge -> false)
        val cust = t(s, dir, "customer")
        val d = cust.select(col("c_custkey"),
          when(col("c_custkey") % 7 =!= 0, col("c_custkey") % 100).as("mentor"))
        val edges = cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").as("minorID"), col("c_custkey").as("majorID"))
        Extract.extract(d, Seq(
          "mentor_major" -> (Extract.Lookup(edges, "mentor", "minorID",
            Seq("majorID" -> "mentor_major")): Extract.Extractor),
          "mentor_self" -> Extract.ExprField(Seq("mentor_major"),
            _ => col("mentor").isNull || (col("mentor_major") <=> col("mentor")))))
      },
      """WITH d AS (SELECT c_custkey,
        |             CASE WHEN c_custkey % 7 <> 0 THEN c_custkey % 100 END AS mentor
        |           FROM customer),
        |e AS (SELECT c_custkey AS minorID, c_custkey AS majorID
        |      FROM customer WHERE c_custkey % 3 = 0)
        |SELECT d.c_custkey, d.mentor, e.majorID AS mentor_major,
        |       (d.mentor IS NULL OR (e.majorID IS NOT DISTINCT FROM d.mentor)) AS mentor_self
        |FROM d LEFT JOIN e ON d.mentor = e.minorID""".stripMargin),

    ("extract_selfjoin",
      (s: SparkSession, dir: String) => {
        // the mother/father pattern: two lookups into the SAME table by
        // different derived keys (reference: person.js:19-31)
        val c = t(s, dir, "customer")
        val spec = Seq(
          "prev_key" -> (Extract.ExprField(Nil, _ => col("c_custkey") - 1): Extract.Extractor),
          "next_key" -> Extract.ExprField(Nil, _ => col("c_custkey") + 1),
          "prev_name" -> Extract.Lookup(c, "prev_key", "c_custkey",
            Seq("c_name" -> "prev_name"), deps = Seq("prev_key")),
          "next_name" -> Extract.Lookup(c, "next_key", "c_custkey",
            Seq("c_name" -> "next_name"), deps = Seq("next_key")))
        Extract.extract(c, spec)
          .select(col("c_custkey"), col("c_name"), col("prev_name"), col("next_name"))
      },
      """SELECT c.c_custkey, c.c_name, p.c_name AS prev_name, n.c_name AS next_name
        |FROM customer c LEFT JOIN customer p ON c.c_custkey - 1 = p.c_custkey
        |                LEFT JOIN customer n ON c.c_custkey + 1 = n.c_custkey""".stripMargin),

    // ---- transform / path language ---------------------------------------
    ("transform_path",
      (s: SparkSession, dir: String) => {
        import Transform._
        val base = t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
          transform(split(col("text"), " "), x => struct(x.as("t"))).as("toks"))
        val spec = TObj(Seq(
          "doc_id" -> TPath("doc_id"),
          "n_toks" -> TPath("#toks"),
          "pairs" -> TArrMap("toks", TObj(Seq(
            "idx" -> TPath("#"),
            "tok" -> TPath("t"),
            "root_chars" -> TPath("$.n_chars"))))))
        Transform.applyTransform(base, spec)
          .select(col("doc_id"), col("n_toks").cast("long").as("n_toks"),
            explode(col("pairs")).as("p"))
          .select(col("doc_id"), col("n_toks"), col("p.idx").cast("long").as("idx"),
            col("p.tok").as("tok"), col("p.root_chars").as("root_chars"))
      },
      """WITH b AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents),
        |u AS (SELECT doc_id, n_chars, CAST(len(toks) AS BIGINT) AS n_toks,
        |             unnest(list_transform(toks, (x, i) -> {'i': i, 'x': x})) AS p
        |      FROM b)
        |SELECT doc_id, n_toks, CAST(p.i - 1 AS BIGINT) AS idx, p.x AS tok,
        |       n_chars AS root_chars
        |FROM u""".stripMargin),

    ("transform_scatter",
      (s: SparkSession, dir: String) => {
        val sc = Transform.scatter(
          t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")),
          Seq("o_orderkey" -> Seq("ids.okey", "okey_flat"),
            "o_totalprice" -> Seq("ids.price"),
            "o_orderstatus" -> Seq("status")))
        sc.select(col("okey_flat"), col("ids.okey").as("okey_nested"),
          col("ids.price").as("price"), col("status"))
      },
      """SELECT o_orderkey AS okey_flat, o_orderkey AS okey_nested,
        |       o_totalprice AS price, o_orderstatus AS status FROM orders""".stripMargin),

    ("transform_defaults",
      (s: SparkSession, dir: String) => {
        val masked = events(s, dir).select(col("event_id"),
          when(col("event_type") === "click", lit(null).cast("double"))
            .otherwise(col("value")).as("value"))
        Transform.applyDefaults(masked, Seq("value" -> -1.0, "channel" -> "none"))
      },
      """SELECT event_id,
        |       COALESCE(CASE WHEN event_type = 'click' THEN NULL ELSE value END, -1.0) AS value,
        |       'none' AS channel
        |FROM events""".stripMargin),

    // ---- badgerfish -------------------------------------------------------
    ("badgerfish_roundtrip",
      (s: SparkSession, dir: String) =>
        Badgerfish.attributes(Badgerfish.convert(t(s, dir, "region"), toBfish = true)),
      "SELECT r_regionkey, r_name FROM region"),

    ("badgerfish_values",
      (s: SparkSession, dir: String) =>
        Badgerfish.values(t(s, dir, "nation").select(col("n_name"),
          array(col("n_nationkey"), col("n_regionkey")).as("keys"))),
      """SELECT 'n_name' AS path, n_name AS value FROM nation
        |UNION ALL SELECT 'keys', CAST(n_nationkey AS VARCHAR) FROM nation
        |UNION ALL SELECT 'keys', CAST(n_regionkey AS VARCHAR) FROM nation""".stripMargin),

    // ---- schema / coercion / fixed-width ---------------------------------
    ("schema_coerce",
      (s: SparkSession, dir: String) => {
        val raw = t(s, dir, "orders").select(
          col("o_orderkey").cast("string").as("id"),
          when(col("o_orderkey") % 7 === 0, lit(""))
            .otherwise(col("o_custkey").cast("string")).as("cust"),
          when(col("o_orderkey") % 5 === 0, lit("0000-00-00"))
            .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("odate"),
          when(col("o_orderstatus") === "F", lit("false")).otherwise(lit("true")).as("done"),
          col("o_orderpriority").as("prio"))
        EtlSchema.applySchema(raw, EtlObj(Seq(
          "id" -> EtlLeaf("number"), "cust" -> EtlLeaf("Number"),
          "odate" -> EtlLeaf("Date"), "done" -> EtlLeaf("Boolean"),
          "prio" -> EtlLeaf("String"))))
      },
      """SELECT CAST(o_orderkey AS BIGINT) AS id,
        |  CAST(CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS BIGINT) AS cust,
        |  CAST(CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE strftime(o_orderdate, '%Y-%m-%d') END AS DATE) AS odate,
        |  o_orderstatus <> 'F' AS done,
        |  o_orderpriority AS prio
        |FROM orders""".stripMargin),

    ("schema_fixedwidth",
      (s: SparkSession, dir: String) => {
        val raw = t(s, dir, "orders").select(
          when(col("o_orderkey") % 11 === 0, lit(null))
            .otherwise(col("o_orderkey")).cast("string").as("okey"),
          col("o_orderstatus").as("status"),
          when(col("o_orderkey") % 3 === 0, lit(null))
            .otherwise((col("o_orderpriority") === "1-URGENT").cast("string")).as("urgent"),
          when(col("o_orderkey") % 5 === 0, lit("0000-00-00"))
            .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("odate"))
        EtlSchema.applyFixedWidth(raw, EtlObj(Seq(
          "okey" -> EtlLeaf("Number", Some(10)), "status" -> EtlLeaf("String", Some(2)),
          "urgent" -> EtlLeaf("Boolean", Some(3)), "odate" -> EtlLeaf("Date", Some(8)))))
      },
      """SELECT concat(
        |  CASE WHEN o_orderkey % 11 = 0 THEN repeat(' ', 10) ELSE lpad(CAST(o_orderkey AS VARCHAR), 10, '0') END,
        |  rpad(substr(o_orderstatus, 1, 2), 2, ' '),
        |  CASE WHEN o_orderkey % 3 = 0 THEN '   ' WHEN o_orderpriority = '1-URGENT' THEN '001' ELSE '000' END,
        |  CASE WHEN o_orderkey % 5 = 0 THEN '00000000' ELSE strftime(o_orderdate, '%Y%m%d') END
        |) AS value FROM orders""".stripMargin),

    // ---- validation / match ----------------------------------------------
    ("validate_clauses",
      (s: SparkSession, dir: String) => {
        val spec: Validate.Spec = Seq(
          "c_mktsegment" -> Seq(Validate.EqLit("BUILDING"), Validate.EqLit("AUTOMOBILE")),
          "c_name" -> Seq(Validate.Pred(x => x.rlike("^Customer#[0-9]+$"))),
          "c_acctbal" -> Seq(Validate.Absent, Validate.Pred(x => x > 0.0)))
        Validate.observed(Validate.validate(t(s, dir, "customer"), spec), "validate_clauses")
          .select(col("c_custkey"), col("c_mktsegment_valid"), col("c_name_valid"),
            col("c_acctbal_valid"), col("_valid"))
      },
      """SELECT c_custkey,
        |  (c_mktsegment IS NOT DISTINCT FROM 'BUILDING') OR (c_mktsegment IS NOT DISTINCT FROM 'AUTOMOBILE') AS c_mktsegment_valid,
        |  COALESCE(regexp_matches(c_name, '^Customer#[0-9]+$'), false) AS c_name_valid,
        |  (c_acctbal IS NULL) OR COALESCE(c_acctbal > 0.0, false) AS c_acctbal_valid,
        |  ((c_mktsegment IS NOT DISTINCT FROM 'BUILDING') OR (c_mktsegment IS NOT DISTINCT FROM 'AUTOMOBILE'))
        |    AND COALESCE(regexp_matches(c_name, '^Customer#[0-9]+$'), false)
        |    AND ((c_acctbal IS NULL) OR COALESCE(c_acctbal > 0.0, false)) AS "_valid"
        |FROM customer""".stripMargin),

    ("match_dispatch",
      (s: SparkSession, dir: String) =>
        Validate.dispatch(t(s, dir, "orders"), Seq(
          Validate.Mapping("fulfilled", Seq("o_orderstatus" -> "F")),
          Validate.Mapping("open", Seq("o_orderstatus" -> "O")),
          Validate.Mapping("pending", Seq("o_orderstatus" -> "P"))))
          .select(col("o_orderkey"), col("_mapping")),
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus IS NOT DISTINCT FROM 'F' THEN 'fulfilled'
        |       WHEN o_orderstatus IS NOT DISTINCT FROM 'O' THEN 'open'
        |       WHEN o_orderstatus IS NOT DISTINCT FROM 'P' THEN 'pending'
        |       ELSE NULL END AS "_mapping"
        |FROM orders""".stripMargin),

    ("match_validate_matrix",
      (s: SparkSession, dir: String) =>
        Validate.matchValidate(t(s, dir, "customer"), Seq(
          "c_mktsegment" -> Seq(Validate.EqLit("BUILDING")),
          "c_acctbal" -> Seq(Validate.Pred(x => x > 1000.0))),
          keep = Seq("c_custkey")),
      """SELECT c_custkey,
        |  NOT (c_mktsegment IS NOT DISTINCT FROM 'BUILDING') AS c_mktsegment_failed,
        |  NOT COALESCE(c_acctbal > 1000.0, false) AS c_acctbal_failed
        |FROM customer""".stripMargin),

    ("load_filter",
      (s: SparkSession, dir: String) =>
        // "already loaded" = customers holding a large order; the anti-join
        // keeps the rest (non-empty at every SF, unlike all-orders)
        Load.filterExisting(t(s, dir, "customer"),
          t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
            .select(col("o_custkey").as("c_custkey")), "c_custkey")
          .select(col("c_custkey"), col("c_name")),
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)""".stripMargin),

    ("load_jdbc_roundtrip",
      (s: SparkSession, dir: String) => {
        // S8 executed for real: parent-then-child load into an embedded
        // in-memory Derby database through the production writeJdbc
        // (bind-parameter INSERTs), read back over JDBC (S7 executed),
        // joined and compared against the parquet oracle. The embedded
        // in-memory URL is the SANDBOX fixture (single-JVM local mode —
        // no database server exists here); writeJdbc/readJdbc take any
        // URL, and a cluster run points them at a database server
        // reachable from every executor. The roundtrip materializes
        // eagerly (localCheckpoint) so the DB can be DROPPED before
        // returning — idempotent across the driver's repeated runs,
        // zero leaked databases. Dimension tables only — a fact-sized
        // JDBC scan belongs to readJdbcPartitioned.
        val name = s"g${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val url = s"jdbc:derby:memory:$name;create=true"
        val region = t(s, dir, "region")
          .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name"))
        val nation = t(s, dir, "nation")
          .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
            col("n_regionkey").cast("long").as("n_regionkey"))
        graft.ops.Load.loadOrdered("region" -> region, Seq("nation" -> nation),
          (nm, df) => graft.ops.Load.writeJdbc(df, url, nm))
        val r = graft.sources.Sources.readJdbc(s, url, "region")
        val n = graft.sources.Sources.readJdbc(s, url, "nation")
        val out = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"), col("r_name"))
          .localCheckpoint()
        try java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$name;drop=true")
        catch { case _: java.sql.SQLException => () } // 08006 = successful drop
        out
      },
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin),

    ("validate_array_elems",
      (s: SparkSession, dir: String) => {
        val base = t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        // array columns are joined to strings: the driver's pandas comparator
        // cannot hash numpy arrays (CORRECTNESS_r03 validate_array_elems err)
        Validate.validateElements(base, "toks",
          Seq(Validate.Pred(x => length(x) > 3)))
          .select(col("doc_id"),
            array_join(col("toks_elem_valid").cast("array<string>"), ",")
              .as("toks_elem_valid"),
            array_join(col("toks_invalid_idx").cast("array<string>"), ",")
              .as("toks_invalid_idx"),
            col("toks_valid"))
      },
      """WITH b AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CASE WHEN toks IS NULL THEN NULL ELSE COALESCE(array_to_string(list_transform(toks, x -> CAST(length(x) > 3 AS VARCHAR)), ','), '') END AS toks_elem_valid,
        |  CASE WHEN toks IS NULL THEN NULL ELSE COALESCE(array_to_string(list_filter(list_transform(toks, (x, i) -> CASE WHEN NOT length(x) > 3 THEN CAST(i - 1 AS INT) END), x -> x IS NOT NULL), ','), '') END AS toks_invalid_idx,
        |  len(list_filter(toks, x -> NOT length(x) > 3)) = 0 AS toks_valid
        |FROM b""".stripMargin),

    ("pipeline_e2e",
      (s: SparkSession, dir: String) => {
        // the full match -> defaults -> validate -> extract -> transform
        // composition over one registered mapping (reference
        // orchestration: etl.js:729-756)
        import Pipeline._
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val m = PipelineMapping("fulfilled",
          matchSpec = Seq("o_orderstatus" -> "F"),
          defaults = Seq("channel" -> "batch"),
          validation = Seq(
            "o_orderpriority" -> prios.map(p => Validate.EqLit(p): Validate.Clause),
            "o_totalprice" -> Seq(Validate.Pred(x => x > 0.0))),
          extract = Seq(
            "cust_name" -> Extract.Lookup(t(s, dir, "customer"), "o_custkey",
              "c_custkey", Seq("c_name" -> "cust_name"))),
          transform = Some(Transform.TObj(Seq(
            "okey" -> Transform.TPath("o_orderkey"),
            "cust" -> Transform.TPath("cust_name"),
            "channel" -> Transform.TPath("channel"),
            "valid" -> Transform.TPath("_valid")))))
        val other = PipelineMapping("open", matchSpec = Seq("o_orderstatus" -> "O"))
        Pipeline.run(t(s, dir, "orders"), Seq(m, other), "fulfilled")
      },
      """SELECT o_orderkey AS okey, c_name AS cust, 'batch' AS channel,
        |  (o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'))
        |    AND COALESCE(o_totalprice > 0.0, false) AS valid
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'""".stripMargin),

    // ---- OLAP composites over the TPC-H-shaped tables --------------------
    // float-sum discipline: l_quantity is integral (exact in float, any
    // order); prices are NOT — they aggregate as deterministic integer
    // cents via floor(x*100 + 0.5), the Num.r6 trick at cent scale
    ("tpch_q1",
      (s: SparkSession, dir: String) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            sum(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long")).as("sum_price_cents"),
            count(lit(1)).as("n"))
          .withColumn("avg_qty",
            Num.r6(col("sum_qty") / col("n").cast("double"))),
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  CAST(count(*) AS BIGINT) AS n,
        |  floor((sum(l_quantity) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin),

    ("tpch_q3",
      (s: SparkSession, dir: String) =>
        // shipping-priority shape: revenue cents per BUILDING order,
        // top 10 (TakeOrderedAndProject, ties by orderkey)
        t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
            .cast("long")).as("revenue_cents"))
          .orderBy(col("revenue_cents").desc, col("o_orderkey").asc)
          .limit(10),
      """SELECT o_orderkey,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue_cents DESC, o_orderkey LIMIT 10""".stripMargin),

    ("tpch_q5",
      (s: SparkSession, dir: String) =>
        // local-supplier-volume shape: a 6-way join through region
        t(s, dir, "region").filter(col("r_name") === "ASIA")
          .join(broadcast(t(s, dir, "nation")), col("r_regionkey") === col("n_regionkey"))
          .join(t(s, dir, "customer"), col("n_nationkey") === col("c_nationkey"))
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .join(t(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey")
              && col("s_nationkey") === col("c_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
            .cast("long")).as("revenue_cents")),
      """SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |            JOIN customer ON n_nationkey = c_nationkey
        |            JOIN orders ON c_custkey = o_custkey
        |            JOIN lineitem ON o_orderkey = l_orderkey
        |            JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin),

    ("tpch_q6",
      (s: SparkSession, dir: String) =>
        // q6 forecasting-revenue shape: pure scan + filter + one global
        // agg — zero joins, the pushdown showcase. revenue is summed in
        // integer basis points (floor(p*d*1e4+0.5)): the per-row product
        // is deterministic, the integer sum is order-independent
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp")
            && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
            && col("l_quantity") < 24)
          .agg(sum(floor(col("l_extendedprice") * col("l_discount") * 10000.0 + 0.5)
            .cast("long")).as("revenue_bp")),
      """SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_bp
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),

    ("tpch_q10",
      (s: SparkSession, dir: String) => {
        // q10 returned-item reporting: per-customer revenue from 'R'
        // lineitems, top 20 — broadcast dim join + cents aggregation +
        // TakeOrderedAndProject, ties to the lowest custkey
        val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"),
            floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
              .cast("long").as("cents"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(sum(col("cents")).as("revenue_cents"))
          .orderBy(col("revenue_cents").desc, col("c_custkey").asc)
          .limit(20)
      },
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |     JOIN lineitem ON l_orderkey = o_orderkey
        |     JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin),

    ("tpch_q18",
      (s: SparkSession, dir: String) => {
        // large-quantity-order report (q18 shape): the HAVING aggregation
        // over lineitem produces a SMALL key set (top ~1% of orders) that
        // broadcast-SEMI-joins orders, and the filtered orders side (now
        // tiny) broadcasts into customer and back into lineitem — the
        // fact table is scanned, never shuffled beyond the first
        // partial-agg; the global top-100 is TakeOrderedAndProject with a
        // deterministic orderkey tiebreak
        val li = t(s, dir, "lineitem")
        val big = li.groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("big_qty"))
          .filter(col("big_qty") > 250.0)
          .select(col("l_orderkey").as("big_orderkey"))
        val bigOrders = t(s, dir, "orders")
          .join(broadcast(big), col("o_orderkey") === col("big_orderkey"), "left_semi")
        val withCust = broadcast(bigOrders)
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        broadcast(withCust)
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"))
          .agg(sum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100)
      },
      // integral-valued quantity sums are order-independent-exact, so
      // both the HAVING cut and sum_qty hash-match across engines
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  sum(l_quantity) AS sum_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |     JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),

    // The remaining TPC-H shapes, adapted to this star schema's reduced
    // columns (no commitdate/receiptdate/shipmode/partsupp/phone): each
    // keeps the ORIGINAL query's plan shape — the thing that matters at
    // 100 TB — with "late shipment" = shipped > N days after the order
    // date standing in for the commit/receipt lateness predicates.

    ("tpch_q4",
      (s: SparkSession, dir: String) =>
        // order-priority checking: EXISTS(late lineitem) == left-semi
        // with the lateness predicate INSIDE the join condition, then a
        // tiny groupBy — orders is never joined 1:N (no fanout+distinct)
        t(s, dir, "orders")
          .join(t(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey")
              && datediff(col("l_shipdate"), col("o_orderdate")) > 60,
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count")),
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
        |  AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60)
        |GROUP BY o_orderpriority""".stripMargin),

    ("tpch_q12",
      (s: SparkSession, dir: String) =>
        // shipping-priority split (q12 shape): join + per-group
        // CASE-conditional counts in ONE aggregation pass
        t(s, dir, "orders")
          .join(t(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey")
              && datediff(col("l_shipdate"), col("o_orderdate")) > 30)
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
              .otherwise(1L)).as("low_line_count")),
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 30
        |GROUP BY l_returnflag""".stripMargin),

    ("tpch_q14",
      (s: SparkSession, dir: String) =>
        // promo-revenue share: date window pushed to the fact scan,
        // broadcast part dimension, conditional/total sums in one agg;
        // revenue as integer cents so the division is the ONLY float op
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-03-01").cast("timestamp"))
          .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO",
              floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
                .cast("long")).otherwise(0L)).as("promo_cents"),
            sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
              .cast("long")).as("total_cents"))
          .withColumn("promo_share",
            Num.r6(lit(100.0) * col("promo_cents").cast("double")
              / col("total_cents").cast("double"))),
      s"""WITH r AS (SELECT p_type,
         |             CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT) AS cents
         |           FROM lineitem JOIN part ON l_partkey = p_partkey
         |           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |             AND l_shipdate < TIMESTAMP '1997-03-01')
         |SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS BIGINT) AS promo_cents,
         |       CAST(sum(cents) AS BIGINT) AS total_cents,
         |       ${Num.r6Sql("100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS DOUBLE) / CAST(sum(cents) AS DOUBLE)")} AS promo_share
         |FROM r""".stripMargin),

    ("tpch_q16",
      (s: SparkSession, dir: String) => {
        // supplier-count-by-part-attrs (q16 shape): the part/supplier
        // relation derives from lineitem (this schema has no partsupp),
        // excluded suppliers are a broadcast ANTI join (q16's NOT IN),
        // then count(DISTINCT suppkey) per part attribute triple
        val ps = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val excl = t(s, dir, "supplier")
          .filter(col("s_name").like("%00003%"))
          .select(col("s_suppkey"))
        ps.join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(t(s, dir, "part")
            .filter(col("p_brand") =!= "Brand#2" && col("p_type") =!= "PROMO"
              && col("p_size").isin(1, 4, 9, 16, 25, 36, 49))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#2' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%00003%')
        |GROUP BY p_brand, p_type, p_size""".stripMargin),

    ("tpch_q17",
      (s: SparkSession, dir: String) => {
        // small-quantity-order revenue (q17 shape): the correlated
        // scalar aggregate — 0.2 * avg(l_quantity) per part — joined
        // back to the fact. The brand filter restricts parts FIRST
        // (broadcast semi-join), so the per-part aggregate runs over
        // the filtered slice only; the tiny (partkey, threshold)
        // result broadcasts back into the same slice. The fact table
        // never shuffles: both joins broadcast the dimension-sized
        // side, and the quantity sums are integral so the avg is
        // partition-order exact
        val pk = t(s, dir, "part").filter(col("p_brand") === "Brand#13")
          .select(col("p_partkey"))
        val li = t(s, dir, "lineitem")
          .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
          .select(col("l_partkey"), col("l_quantity"),
            floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("cents"))
        val thr = li.groupBy(col("l_partkey"))
          .agg(((sum(col("l_quantity")) / count(lit(1)).cast("double")) * 0.2).as("thr"))
          .select(col("l_partkey").as("t_partkey"), col("thr"))
        li.join(broadcast(thr), col("l_partkey") === col("t_partkey"))
          .filter(col("l_quantity") < col("thr"))
          .agg(sum(col("cents")).as("revenue_cents"),
            Num.r6(sum(col("cents")).cast("double") / 7.0 / 100.0).as("avg_yearly"))
      },
      s"""WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
         |li AS (SELECT l_partkey, l_quantity,
         |         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
         |       FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM pk)),
         |thr AS (SELECT l_partkey, (sum(l_quantity) / count(*)) * 0.2 AS thr
         |        FROM li GROUP BY l_partkey)
         |SELECT CAST(sum(cents) AS BIGINT) AS revenue_cents,
         |  ${Num.r6Sql("CAST(sum(cents) AS DOUBLE) / 7.0 / 100.0")} AS avg_yearly
         |FROM li JOIN thr ON li.l_partkey = thr.l_partkey
         |WHERE l_quantity < thr""".stripMargin),

    ("tpch_q20",
      (s: SparkSession, dir: String) => {
        // excess-stock suppliers (q20 shape): per-(supplier, part)
        // scalar aggregates compared against each other, then joined
        // back to the supplier dimension. This schema has no partsupp,
        // so the stock relation derives from lineitem: a supplier
        // qualifies when, for some name-filtered part it ships in
        // volume (total >= 80), over half that lifetime volume shipped
        // recently. Parts filter first (broadcast semi), ONE
        // partial-aggregated shuffle on the compound key builds both
        // sums, and the qualifying suppkey set — supplier-dimension-
        // sized by construction — broadcasts into the semi-join
        val pk = t(s, dir, "part").filter(col("p_name").like("b%"))
          .select(col("p_partkey"))
        val ps = t(s, dir, "lineitem")
          .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity")).as("total_qty"),
            sum(when(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"),
              col("l_quantity")).otherwise(0.0)).as("recent_qty"))
        val excess = ps
          .filter(col("total_qty") >= 80.0 && col("recent_qty") > col("total_qty") * 0.5)
          .select(col("l_suppkey")).distinct()
        t(s, dir, "supplier")
          .join(broadcast(excess), col("s_suppkey") === col("l_suppkey"), "left_semi")
          .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
          .orderBy(col("s_name").asc)
      },
      """WITH pk AS (SELECT p_partkey FROM part WHERE p_name LIKE 'b%'),
        |ps AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS total_qty,
        |         sum(CASE WHEN l_shipdate >= TIMESTAMP '2001-01-01'
        |             THEN l_quantity ELSE 0.0 END) AS recent_qty
        |       FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM pk)
        |       GROUP BY l_partkey, l_suppkey)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM ps
        |                    WHERE total_qty >= 80.0 AND recent_qty > total_qty * 0.5)
        |ORDER BY s_name""".stripMargin),

    ("tpch_q19",
      (s: SparkSession, dir: String) => {
        // disjunctive-predicate revenue (q19 shape): three brand/size/
        // quantity conjunctions OR'd INSIDE the join — Catalyst extracts
        // the common l_partkey = p_partkey equi-key so this plans as a
        // hash join with the disjunction as a residual filter, never a
        // nested loop over the fact table
        val p = broadcast(t(s, dir, "part"))
        t(s, dir, "lineitem")
          .join(p, col("l_partkey") === col("p_partkey")
            && ((col("p_brand") === "Brand#11" && col("p_size").between(1, 15)
                  && col("l_quantity").between(1, 11))
              || (col("p_brand") === "Brand#22" && col("p_size").between(1, 25)
                  && col("l_quantity").between(10, 20))
              || (col("p_brand") === "Brand#15" && col("p_size").between(1, 35)
                  && col("l_quantity").between(20, 30))))
          .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
            .cast("long")).as("revenue_cents"))
      },
      """SELECT CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin),

    ("tpch_q21",
      (s: SparkSession, dir: String) => {
        // suppliers-who-kept-orders-waiting (q21 shape): per lineitem of
        // a finished order, EXISTS(another supplier in the order) AND
        // NOT EXISTS(another supplier shipping LATER) — the last
        // supplier to ship a multi-supplier order. Both correlated
        // subqueries become one semi + one anti join on the order key
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
        val l3 = li.select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"),
          col("l_shipdate").as("d3"))
        // NO broadcast hint on fOrders: status 'F' keeps ~half the orders
        // table — fact-sized, not a dimension. AQE picks the join strategy
        val fOrders = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"))
        li.join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .join(l2, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"),
            "left_semi")
          .join(l3, col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3")
            && col("d3") > col("l_shipdate"), "left_anti")
          .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name").asc)
          .limit(100)
      },
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        |  AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey
        |              AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey
        |                  AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin),

    ("tpch_q22",
      (s: SparkSession, dir: String) => {
        // global-sales-opportunity (q22 shape): rich-but-idle customers —
        // acctbal above the global positive mean (scalar subquery ->
        // broadcast 1-row agg; the mean is computed from INTEGER cents
        // so it is partition-order exact) and no RECENT orders (anti
        // join; this synthetic schema gives every customer at least one
        // lifetime order, so "idle" = nothing since 2000-06-01 — the
        // date filter pushes to the orders scan before the anti join)
        val cust = t(s, dir, "customer")
          .withColumn("bal_cents", floor(col("c_acctbal") * 100.0 + 0.5).cast("long"))
        val avgPos = cust.filter(col("c_acctbal") > 0.0)
          .agg((sum(col("bal_cents")).cast("double") / count(lit(1)).cast("double"))
            .as("avg_cents"))
        val recent = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("2000-06-01").cast("timestamp"))
        cust.crossJoin(broadcast(avgPos))
          .filter(col("bal_cents").cast("double") > col("avg_cents"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("numcust"), sum(col("bal_cents")).as("totacctbal_cents"))
      },
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |             CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents,
        |             c_acctbal
        |           FROM customer),
        |a AS (SELECT CAST(sum(bal_cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_cents
        |      FROM c WHERE c_acctbal > 0.0)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |       CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
        |FROM c, a
        |WHERE CAST(bal_cents AS DOUBLE) > avg_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-06-01')
        |GROUP BY c_nationkey""".stripMargin),

    ("tpch_q7",
      (s: SparkSession, dir: String) => {
        // volume-shipping (q7 shape): revenue between two nations in
        // both directions — lineitem->supplier->n1 and ->orders->
        // customer->n2, the pair disjunction rides IN the join-filter so
        // non-qualifying rows die before the aggregation. Nation is the
        // only broadcast; fact-fact joins stay honest shuffles.
        val (na, nb) = ("NATION_3", "NATION_7")
        val n1 = t(s, dir, "nation").select(col("n_nationkey").as("n1_key"),
          col("n_name").as("supp_nation"))
        val n2 = t(s, dir, "nation").select(col("n_nationkey").as("n2_key"),
          col("n_name").as("cust_nation"))
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
          .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
          .filter((col("supp_nation") === na && col("cust_nation") === nb)
            || (col("supp_nation") === nb && col("cust_nation") === na))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
            .cast("long")).as("revenue_cents"))
      },
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |     JOIN customer ON o_custkey = c_custkey
        |     JOIN supplier ON l_suppkey = s_suppkey
        |     JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |     JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)""".stripMargin),

    ("tpch_q8",
      (s: SparkSession, dir: String) => {
        // market-share (q8 shape): NATION_2's share of ECONOMY-part
        // revenue sold into ASIA, by year. Numerator and denominator
        // are integer-cents sums of the SAME aggregation (conditional
        // sum, one pass); the share division happens once per year row,
        // r6-rounded for the cross-engine hash.
        val asiaCust = t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA").select(col("c_custkey"))
        val suppNation = t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation").select(col("n_nationkey").as("sn_key"),
            col("n_name").as("supp_nation"))), col("s_nationkey") === col("sn_key"))
          .select(col("s_suppkey"), col("supp_nation"))
        val econParts = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
          .select(col("p_partkey"))
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .join(broadcast(econParts), col("l_partkey") === col("p_partkey"))
          .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
          .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
          .withColumn("cents",
            floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
              .cast("long"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(Num.r6(
            sum(when(col("supp_nation") === "NATION_2", col("cents")).otherwise(0L))
              .cast("double")
              / sum(col("cents")).cast("double")).as("mkt_share"))
      },
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  ${graft.Num.r6Sql(
        "CAST(sum(CASE WHEN n1.n_name = 'NATION_2' THEN cents ELSE 0 END) AS DOUBLE)" +
          " / CAST(sum(cents) AS DOUBLE)")} AS mkt_share
         |FROM (SELECT l_orderkey, l_partkey, l_suppkey,
         |        CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT) AS cents
         |      FROM lineitem) l
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND p_type = 'ECONOMY'
         |  AND EXISTS (SELECT 1 FROM customer JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |              JOIN region ON n2.n_regionkey = r_regionkey
         |              WHERE c_custkey = o_custkey AND r_name = 'ASIA')
         |GROUP BY year(o_orderdate)""".stripMargin),

    ("tpch_q13",
      (s: SparkSession, dir: String) => {
        // customer-distribution (q13 shape): LEFT join so zero-order
        // customers survive into the c_count=0 bucket, then a second
        // (tiny) aggregation over the distribution itself.
        val o = t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey"))
        t(s, dir, "customer").select(col("c_custkey"))
          .join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |           AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin),

    ("tpch_q15",
      (s: SparkSession, dir: String) => {
        // top-supplier (q15 shape): quarterly revenue per supplier,
        // keep the max. The max is a broadcast one-row aggregate over
        // the (supplier-sized, already aggregated) revenue relation —
        // the scalar-subquery idiom, no second scan of lineitem.
        val rev = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
            .cast("long")).as("total_cents"))
        val top = rev.agg(max(col("total_cents")).as("max_cents"))
        rev.crossJoin(broadcast(top))
          .filter(col("total_cents") === col("max_cents"))
          .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_cents"))
      },
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_cents
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_cents = (SELECT max(total_cents) FROM rev)""".stripMargin),

    ("tpch_q2",
      (s: SparkSession, dir: String) => {
        // minimum-cost-supplier (q2 shape) over the synthesized
        // partsupp: EUROPE suppliers only, ECONOMY parts only; the
        // per-part minimum cost is computed once on the (already
        // region-filtered) partsupp relation and joined back — the
        // correlated-subquery shape as a self-aggregate + equijoin.
        // All tie rows survive, like the reference query.
        val euroSupp = t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE")
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
        val econ = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
          .select(col("p_partkey"))
        val regional = partsupp(s, dir)
          .join(broadcast(econ), col("ps_partkey") === col("p_partkey"))
          .join(broadcast(euroSupp), col("ps_suppkey") === col("s_suppkey"))
        val minCost = regional.groupBy(col("ps_partkey").as("mk"))
          .agg(min(col("ps_supplycost_cents")).as("min_cents"))
        regional.join(broadcast(minCost),
            col("ps_partkey") === col("mk")
              && col("ps_supplycost_cents") === col("min_cents"))
          .select(col("ps_partkey"), col("s_name"), col("n_name"),
            col("ps_supplycost_cents"))
      },
      s"""WITH $partsuppCte
         |SELECT ps_partkey, s_name, n_name, ps_supplycost_cents
         |FROM ps JOIN part ON ps_partkey = p_partkey
         |     JOIN supplier ON ps_suppkey = s_suppkey
         |     JOIN nation ON s_nationkey = n_nationkey
         |     JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
         |  AND ps_supplycost_cents = (
         |    SELECT min(ps2.ps_supplycost_cents) FROM ps ps2
         |    JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
         |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
         |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
         |    WHERE ps2.ps_partkey = ps.ps_partkey AND r2.r_name = 'EUROPE')""".stripMargin),

    ("tpch_q9",
      (s: SparkSession, dir: String) => {
        // product-type profit (q9 shape): revenue minus supply cost per
        // nation and order year. The (partkey, suppkey) equijoin onto
        // the synthesized partsupp keeps the q9 plan shape (fact ⋈
        // partsupp ⋈ dims); profit stays in integer cents
        val ps = partsupp(s, dir)
          .join(broadcast(t(s, dir, "part").filter(col("p_type") === "PROMO")
            .select(col("p_partkey"))), col("ps_partkey") === col("p_partkey"))
        t(s, dir, "lineitem")
          .join(ps, col("l_partkey") === col("ps_partkey")
            && col("l_suppkey") === col("ps_suppkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(sum(
            floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
              .cast("long")
              - col("ps_supplycost_cents") * col("l_quantity").cast("long"))
            .as("profit_cents"))
      },
      s"""WITH $partsuppCte
         |SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)
         |           - ps_supplycost_cents * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_cents
         |FROM lineitem
         |JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |JOIN part ON ps_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_type = 'PROMO'
         |GROUP BY n_name, year(o_orderdate)""".stripMargin),

    ("tpch_q11",
      (s: SparkSession, dir: String) => {
        // important-stock (q11 shape): per-part inventory value for one
        // nation's suppliers, HAVING value above a fraction of that
        // nation's total — the threshold is a broadcast one-row
        // aggregate over the SAME already-filtered relation, computed
        // without a second partsupp pass
        val natSupp = t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .filter(col("n_name") === "NATION_3").select(col("s_suppkey"))
        val held = partsupp(s, dir)
          .join(broadcast(natSupp), col("ps_suppkey") === col("s_suppkey"))
          .withColumn("value_cents", col("ps_supplycost_cents") * col("ps_availqty"))
        val perPart = held.groupBy(col("ps_partkey"))
          .agg(sum(col("value_cents")).as("part_value_cents"))
        val total = perPart.agg(sum(col("part_value_cents")).as("total_cents"))
        perPart.crossJoin(broadcast(total))
          .filter(col("part_value_cents").cast("double")
            > col("total_cents").cast("double") * 0.001)
          .select(col("ps_partkey"), col("part_value_cents"))
      },
      s"""WITH $partsuppCte,
         |held AS (SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS value_cents
         |         FROM ps JOIN supplier ON ps_suppkey = s_suppkey
         |              JOIN nation ON s_nationkey = n_nationkey
         |         WHERE n_name = 'NATION_3'),
         |pp AS (SELECT ps_partkey, CAST(sum(value_cents) AS BIGINT) AS part_value_cents
         |       FROM held GROUP BY ps_partkey)
         |SELECT ps_partkey, part_value_cents FROM pp
         |WHERE CAST(part_value_cents AS DOUBLE) >
         |      (SELECT CAST(sum(part_value_cents) AS DOUBLE) FROM pp) * 0.001""".stripMargin),

    ("orders_window",
      (s: SparkSession, dir: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderkey"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            row_number().over(w).as("rk"),
            sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")).over(run)
              .as("run_cents"),
            lag(col("o_orderkey"), 1).over(w).as("prev_order"))
      },
      """SELECT o_orderkey, o_custkey,
        |  CAST(row_number() OVER w AS INT) AS rk,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents,
        |  lag(o_orderkey, 1) OVER w AS prev_order
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin),

    ("orders_top_per_cust",
      (s: SparkSession, dir: String) =>
        Reshape.topNPerGroup(
          t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
          Seq("o_custkey"), "o_totalprice", "o_orderkey", n = 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk")),
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |      FROM orders)
        |WHERE rk <= 3""".stripMargin),

    ("dedup_incremental",
      (s: SparkSession, dir: String) => {
        // incremental ingest: the "new batch" (doc_id > 250) is admitted
        // only if its content fingerprint is unseen in the existing
        // corpus — fingerprint anti-join, the streaming-adjacent batch
        // formulation of dedupStream
        import s.implicits._
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
          // a NULL-text row in the NEW batch: its NULL fingerprint must
          // be ADMITTED (never equi-joins the existing side)
          .union(Seq((99991L, Option.empty[String])).toDF("doc_id", "text"))
        val existing = TextAnalysis.fingerprint(
          d.filter(col("doc_id") <= 250), "text").select(col("fingerprint"))
        TextAnalysis.fingerprint(d.filter(col("doc_id") > 250), "text")
          .join(existing, Seq("fingerprint"), "left_anti")
          .select(col("doc_id"), col("fingerprint"))
      },
      // NOT EXISTS with `=`, not NOT IN: a NULL fingerprint (null text)
      // never equi-joins, so Spark's left_anti ADMITS it — NOT IN would
      // return NULL and silently drop the row instead
      s"""WITH docs AS (SELECT doc_id, text FROM documents
         |              UNION ALL SELECT 99991, NULL),
         |fp AS (SELECT doc_id, ${rhSql("text")} AS fingerprint FROM docs)
         |SELECT doc_id, fingerprint FROM fp
         |WHERE doc_id > 250 AND NOT EXISTS
         |  (SELECT 1 FROM fp f2 WHERE f2.doc_id <= 250 AND f2.fingerprint = fp.fingerprint)""".stripMargin),

    ("dedup_incremental_neardup",
      (s: SparkSession, dir: String) => {
        // crawl-ingest near-dup gate: which NEW docs (id > 250) are
        // near-dups of the EXISTING corpus (id <= 250)? The band join
        // never self-joins the existing side. Oracle: the batch pipeline
        // over the union yields the identical cross-side pairs — the
        // equivalence the operator's scaladoc claims
        val d = t(s, dir, "documents")
        Dedup.minhashLshIncremental(
          d.filter(col("doc_id") <= 250), d.filter(col("doc_id") > 250),
          "doc_id", "text",
          n = 3, k = 16, rowsPerBand = 4, threshold = 0.3, maxDocFreq = Some(20))
      },
      s"""WITH $minhashCtes
         |SELECT CASE WHEN d1 > 250 THEN d1 ELSE d2 END AS d_new,
         |       CASE WHEN d1 > 250 THEN d2 ELSE d1 END AS d_old, jaccard
         |FROM mh_pairs WHERE (d1 <= 250) <> (d2 <= 250)""".stripMargin),

    ("profile_skew",
      (s: SparkSession, dir: String) =>
        Profile.keySkew(t(s, dir, "orders"), "o_custkey", topN = 10),
      {
        val share = Num.r6Sql(
          "CAST(cnt AS DOUBLE) / CAST((SELECT count(*) FROM orders) AS DOUBLE)")
        s"""WITH c AS (SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS cnt
           |           FROM orders GROUP BY o_custkey)
           |SELECT key, cnt, $share AS share FROM c
           |ORDER BY cnt DESC, key LIMIT 10""".stripMargin
      }),

    ("profile_orders",
      (s: SparkSession, dir: String) =>
        Profile.summarize(t(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")),
      {
        def one(c: String) =
          s"""SELECT '$c' AS "column", CAST(count($c) AS BIGINT) AS n_nonnull,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  CAST(min($c) AS VARCHAR) AS min_value, CAST(max($c) AS VARCHAR) AS max_value,
             |  CAST(count(*) AS BIGINT) AS n_rows FROM orders""".stripMargin
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
          .map(one).mkString("\nUNION ALL\n")
      }),

    // ---- sources ----------------------------------------------------------
    ("source_xlsx",
      (s: SparkSession, dir: String) => {
        // fixture synthesis (driver-side, like the reference's in-memory
        // workbook buffers): nation rows -> real SpreadsheetML zip ->
        // XlsxSource round-trip; the oracle reads the same rows straight
        // from parquet. All cells surface as strings by XLSX contract.
        val cols = Seq("n_nationkey", "n_name", "n_regionkey")
        val rows = t(s, dir, "nation").orderBy(col("n_nationkey"))
          .select(cols.map(c => col(c).cast("string")): _*)
          .collect().toSeq.map(r => cols.indices.map { i =>
            // a NULL cell would silently become the literal string "null"
            // while the oracle yields SQL NULL — fail loudly instead
            // (XLSX inline strings cannot represent SQL NULL)
            val v = r.get(i)
            require(v != null, s"xlsx fixture: NULL in ${cols(i)} — not representable")
            v.toString
          })
        graft.sources.XlsxSource.readSheet(s,
          graft.sources.SyntheticDocs.tempXlsx("nation", cols, rows), "nation")
      },
      """SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey, n_name,
        |       CAST(n_regionkey AS VARCHAR) AS n_regionkey
        |FROM nation""".stripMargin),

    ("source_xml",
      (s: SparkSession, dir: String) => {
        // fixture synthesis: region rows -> XML -> badgerfish JSON ->
        // struct DataFrame (the working version of the reference's dead
        // xml2json branch, FileResolver.js:87-91); oracle = parquet rows
        val rows = t(s, dir, "nation").orderBy(col("n_nationkey"))
          .select(col("n_nationkey").cast("string"), col("n_name"),
            col("n_regionkey").cast("string"))
          .collect().toSeq.map(r => (
            Seq("key" -> r.getString(0)),
            Seq("name" -> r.getString(1), "region" -> r.getString(2))))
        val json = graft.sources.XmlSource.toBadgerfishJson(
          graft.sources.SyntheticDocs.xmlDoc("nations", "nation", rows))
        import s.implicits._
        s.read.json(Seq(json).toDS())
          .select(explode(col("nations").getField("nation")).as("r"))
          .select(col("r").getField("@key").as("n_nationkey"),
            col("r").getField("name").getField("$").as("n_name"),
            col("r").getField("region").getField("$").as("n_regionkey"))
      },
      """SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey, n_name,
        |       CAST(n_regionkey AS VARCHAR) AS n_regionkey
        |FROM nation""".stripMargin),

    ("source_overlay_xinclude",
      (s: SparkSession, dir: String) => {
        // S6 + S4 under the oracle gate: the base root holds the entry
        // doc and a STALE include target; the overlay root (higher
        // priority) holds the CORRECT target, which itself includes a
        // second level — so overlay precedence AND recursive composition
        // must BOTH work for the round trip to hash-match the parquet
        // rows (a precedence bug yields the stale empty doc and fails)
        val rows = t(s, dir, "nation").orderBy(col("n_nationkey"))
          .select(col("n_nationkey").cast("string"), col("n_name"),
            col("n_regionkey").cast("string"))
          .collect().toSeq.map(r => (
            Seq("key" -> r.getString(0)),
            Seq("name" -> r.getString(1), "region" -> r.getString(2))))
        val correct = graft.sources.SyntheticDocs.xmlDoc("nations", "nation", rows)
        val stale = graft.sources.SyntheticDocs.xmlDoc("nations", "nation", Seq.empty)
        val base = graft.sources.SyntheticDocs.tempDir(Seq(
          "parent.xml" -> """<xi:include href="inner.xml"/>""",
          "inner.xml" -> stale))
        val overlay = graft.sources.SyntheticDocs.tempDir(Seq(
          "inner.xml" -> """<xi:include href="inner2.xml"/>""",
          "inner2.xml" -> correct))
        val resolver = new graft.sources.Sources.FileResolver(Seq(overlay, base))
        val json = graft.sources.XmlSource.toBadgerfishJson(
          resolver.readWithIncludes("parent.xml"))
        import s.implicits._
        s.read.json(Seq(json).toDS())
          .select(explode(col("nations").getField("nation")).as("r"))
          .select(col("r").getField("@key").as("n_nationkey"),
            col("r").getField("name").getField("$").as("n_name"),
            col("r").getField("region").getField("$").as("n_regionkey"))
      },
      """SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey, n_name,
        |       CAST(n_regionkey AS VARCHAR) AS n_regionkey
        |FROM nation""".stripMargin),

    ("source_xslt",
      (s: SparkSession, dir: String) => {
        // S5 under the oracle gate (ref index.js:87-126): a TWO-stage
        // XSLT chain (XML reshape -> text extract) over a per-row XML
        // column; stage order is load-bearing — stage 2's /rec template
        // only matches stage 1's output element, so a mis-ordered or
        // skipped stage cannot hash-match the parquet rows
        val reshape =
          """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
            |<xsl:output method="xml" omit-xml-declaration="yes"/>
            |<xsl:template match="/n">
            |  <rec><id><xsl:value-of select="@k"/></id>
            |  <nm><xsl:value-of select="translate(nm,'ABCDEFGHIJKLMNOPQRSTUVWXYZ','abcdefghijklmnopqrstuvwxyz')"/></nm></rec>
            |</xsl:template>
            |</xsl:stylesheet>""".stripMargin
        val toText =
          """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
            |<xsl:output method="text"/>
            |<xsl:template match="/rec"><xsl:value-of select="concat(nm,'|',id)"/></xsl:template>
            |</xsl:stylesheet>""".stripMargin
        val xml = t(s, dir, "nation")
          .select(col("n_nationkey").cast("long").as("id"),
            format_string("<n k=\"%d\"><nm>%s</nm></n>",
              col("n_nationkey").cast("long"), col("n_name")).as("x"))
        graft.sources.Xslt.pipeline(xml, "x", Seq(reshape, toText), outCol = "piped")
          .select(substring_index(col("piped"), "|", 1).as("nm"),
            substring_index(col("piped"), "|", -1).cast("bigint").as("id"))
      },
      "SELECT lower(n_name) AS nm, CAST(n_nationkey AS BIGINT) AS id FROM nation"),

    ("source_json_props",
      (s: SparkSession, dir: String) =>
        events(s, dir).select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")),
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin),

    ("events_window_agg",
      (s: SparkSession, dir: String) =>
        events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), min(col("value")).as("min_value"),
            max(col("value")).as("max_value")),
      """SELECT date_trunc('hour', make_timestamp(epoch_ns(ts) // 1000)) AS hour, event_type,
        |       CAST(count(*) AS BIGINT) AS n, min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2""".stripMargin),

    ("events_sessionize",
      (s: SparkSession, dir: String) =>
        graft.streaming.EventStream.sessionizeBatch(
          events(s, dir).select(col("user_id"), col("ts")), gapMinutes = 10),
      """WITH e AS (SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
        |x AS (SELECT user_id, ts,
        |        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |               OR epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) // 1000000 > 600
        |             THEN 1 ELSE 0 END AS brk
        |      FROM e),
        |s AS (SELECT user_id, ts,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM x)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin),

    ("events_funnel",
      (s: SparkSession, dir: String) =>
        graft.streaming.EventStream.funnel(events(s, dir),
          "user_id", "event_type", "ts", Seq("view", "click", "purchase")),
      """WITH e AS (SELECT user_id, event_type,
        |             make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
        |s0 AS (SELECT user_id, min(ts) AS anchor FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (SELECT e.user_id, min(e.ts) AS anchor FROM e
        |       JOIN s0 ON e.user_id = s0.user_id
        |       WHERE event_type = 'click' AND e.ts > s0.anchor GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS anchor FROM e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE event_type = 'purchase' AND e.ts > s1.anchor GROUP BY e.user_id)
        |SELECT 'view' AS step, CAST(0 AS BIGINT) AS step_idx,
        |       CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users
        |UNION ALL SELECT 'click', 1, (SELECT count(*) FROM s1)
        |UNION ALL SELECT 'purchase', 2, (SELECT count(*) FROM s2)""".stripMargin),

    ("events_range_join",
      (s: SparkSession, dir: String) => {
        // points-in-intervals with NO equi key: all events against the
        // session windows of users 1-3, via the bucketed range join
        val e = events(s, dir)
        val intervals = graft.streaming.EventStream.sessionizeBatch(
          e.filter(col("user_id") <= 3).select(col("user_id"), col("ts")),
          gapMinutes = 10)
          .select(col("session_start"), col("session_end"))
        RangeJoin.bucketed(e.select(col("event_id"), col("ts")), intervals,
            "ts", "session_start", "session_end", bucketSecs = 600)
          .groupBy(col("session_start"), col("session_end"))
          .agg(count(lit(1)).as("n_in_window"))
      },
      """WITH e AS (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
        |x AS (SELECT user_id, ts,
        |        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |               OR epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) // 1000000 > 600
        |             THEN 1 ELSE 0 END AS brk
        |      FROM e WHERE user_id <= 3),
        |st AS (SELECT user_id, ts,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |       FROM x),
        |iv AS (SELECT min(ts) AS session_start, max(ts) AS session_end
        |       FROM st GROUP BY user_id, sid)
        |SELECT iv.session_start, iv.session_end, CAST(count(*) AS BIGINT) AS n_in_window
        |FROM e JOIN iv ON e.ts BETWEEN iv.session_start AND iv.session_end
        |GROUP BY 1, 2""".stripMargin),

    ("events_quantiles",
      (s: SparkSession, dir: String) =>
        // exact sort-based percentiles (linear interpolation at
        // (n-1)*p, the quantile_cont definition both engines share);
        // approx_percentile/t-digest sketches are NOT cross-engine
        // reproducible, so the exact form is the oracle-checkable one
        events(s, dir)
          .groupBy(col("event_type"))
          .agg(
            graft.Num.r6(percentile(col("value"), lit(0.5))).as("p50"),
            graft.Num.r6(percentile(col("value"), lit(0.95))).as("p95"),
            count(lit(1)).as("n")),
      s"""SELECT event_type,
         |  ${Num.r6Sql("quantile_cont(value, 0.5)")} AS p50,
         |  ${Num.r6Sql("quantile_cont(value, 0.95)")} AS p95,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM events GROUP BY event_type""".stripMargin),

    ("events_pivot",
      (s: SparkSession, dir: String) =>
        Reshape.pivotCounts(events(s, dir), "user_id", "event_type",
          Seq("click", "view", "purchase", "signup", "error")),
      """SELECT user_id,
        |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
        |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error
        |FROM events GROUP BY user_id""".stripMargin),

    ("orders_rollup",
      (s: SparkSession, dir: String) =>
        // price totals as deterministic integer cents — a raw double sum
        // is partition-order dependent (same discipline as tpch_q1)
        t(s, dir, "orders")
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")).as("total_cents")),
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin),

    ("orders_cube",
      (s: SparkSession, dir: String) =>
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n")),
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin),

    ("join_salted",
      (s: SparkSession, dir: String) =>
        // the oracle is the UNSALTED join: salting must be invisible in
        // the results, only in the physical distribution
        Reshape.saltedJoin(t(s, dir, "lineitem"), t(s, dir, "orders"),
            "l_orderkey", "o_orderkey", nSalts = 8)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("qty")),
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(l_quantity) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin),

    ("load_merge",
      (s: SparkSession, dir: String) => {
        val existing = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        // updates: every 10th customer rebalanced, plus brand-new rows
        val updates = existing.filter(col("c_custkey") % 10 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 1000.0)
          .unionByName(existing.filter(col("c_custkey") <= 3)
            .select((col("c_custkey") + 900000).as("c_custkey"),
              concat(lit("New#"), col("c_name")).as("c_name"), col("c_acctbal")))
        Load.merge(existing, updates, "c_custkey")
      },
      """WITH existing AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |updates AS (
        |  SELECT c_custkey, c_name, c_acctbal + 1000.0 AS c_acctbal
        |  FROM existing WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey + 900000, 'New#' || c_name, c_acctbal
        |  FROM existing WHERE c_custkey <= 3)
        |SELECT * FROM existing e
        |WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = e.c_custkey)
        |UNION ALL SELECT * FROM updates""".stripMargin),

    ("events_asof_join",
      (s: SparkSession, dir: String) => {
        val e = events(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        // enforce AsOfJoin's unique-(key,time) right-side precondition:
        // same-instant click ties resolve to the max event id (max_by
        // keeps the payload from that same row) — deterministic in both
        // engines regardless of partition order
        val clicks = e.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("cid"),
            max_by(col("value"), col("event_id")).as("cval"))
        AsOfJoin.asOf(purchases, clicks, "user_id", "ts",
          Seq("cid" -> "click_id", "cval" -> "click_value"))
      },
      """WITH e AS (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
        |                  event_type, value FROM events),
        |p AS (SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, max(event_id) AS click_id,
        |             arg_max(value, event_id) AS click_value
        |      FROM e WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT p.event_id, p.user_id, p.ts, p.value, c.click_id, c.click_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin),

    ("events_asof_bucketed",
      (s: SparkSession, dir: String) => {
        // the hot-key-safe variant MUST give byte-identical answers to
        // asOf — same DuckDB ASOF oracle; ~71-minute power-of-two time
        // buckets (exact integer shift, no float boundary) bound every
        // window partition (per-(key,bucket), seeded carry-forward)
        val e = events(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val clicks = e.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("cid"),
            max_by(col("value"), col("event_id")).as("cval"))
        AsOfJoin.asOfBucketed(purchases, clicks, "user_id", "ts",
          Seq("cid" -> "click_id", "cval" -> "click_value"),
          bucketOf = ts => shiftright(unix_micros(ts), 32))
      },
      """WITH e AS (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
        |                  event_type, value FROM events),
        |p AS (SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, max(event_id) AS click_id,
        |             arg_max(value, event_id) AS click_value
        |      FROM e WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT p.event_id, p.user_id, p.ts, p.value, c.click_id, c.click_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin),

    // ---- dedup family -----------------------------------------------------
    ("dedup_exact",
      (s: SparkSession, dir: String) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        Dedup.exact(d.union(d.select(col("doc_id") + 10000, col("text"))), "doc_id", "text")
      },
      """WITH dup AS (SELECT doc_id, text FROM documents
        |             UNION ALL SELECT doc_id + 10000, text FROM documents)
        |SELECT text, CAST(min(doc_id) AS BIGINT) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
        |FROM dup GROUP BY text""".stripMargin),

    ("dedup_exact_hash",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        // duplicate the corpus under shifted ids so dup groups exist, and
        // add two NULL-text rows so the null-handling path is EXERCISED,
        // not just written: they must land in one keeper group
        val nulls = Seq((20001L, Option.empty[String]), (20002L, Option.empty[String]))
          .toDF("doc_id", "text")
        Dedup.exactByFingerprint(
          d.union(d.select(col("doc_id") + 10000, col("text"))).union(nulls),
          "doc_id", "text")
      },
      // IS NOT DISTINCT FROM mirrors the Spark side's explicit null-text
      // group (exactByFingerprint routes NULL texts into one keeper
      // group; a plain `=` join would silently drop them)
      """WITH dup AS (SELECT doc_id, text FROM documents
        |             UNION ALL SELECT doc_id + 10000, text FROM documents
        |             UNION ALL SELECT 20001, NULL
        |             UNION ALL SELECT 20002, NULL),
        |g AS (SELECT text, CAST(min(doc_id) AS BIGINT) AS keep_id,
        |             CAST(count(*) AS BIGINT) AS n_dups FROM dup GROUP BY text)
        |SELECT d.doc_id AS doc, g.keep_id, g.n_dups
        |FROM dup d JOIN g ON d.text IS NOT DISTINCT FROM g.text""".stripMargin),

    ("line_dedup",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // words-as-lines (spaces -> newlines) makes cross-document
        // repeated lines ubiquitous, and a per-doc unique trailing line
        // keeps every document alive so the gate checks reassembly for
        // all 500 docs (not just the few with first-occurrence words);
        // fixture rows pin the within-doc-repeat, fully-deduped-doc and
        // NULL-text paths
        val d = t(s, dir, "documents")
          .select(col("doc_id"),
            concat(translate(col("text"), " ", "\n"),
              lit("\nuid-"), col("doc_id")).as("text"))
          .union(Seq(
            (99991L, Option.empty[String]),
            (99992L, Some("zz_alpha\nzz_beta\nzz_alpha")),
            (99993L, Some("zz_alpha\nzz_beta"))).toDF("doc_id", "text"))
        Dedup.lineDedup(d, "doc_id", "text")
      },
      // global first occurrence per line = row_number over (doc, pos);
      // docs whose every line was seen earlier vanish from the GROUP BY,
      // NULL-text docs re-enter with 0 lines kept — both mirror Spark
      """WITH docs AS (SELECT doc_id, replace(text, ' ', chr(10)) || chr(10) || 'uid-' || doc_id AS text
        |              FROM documents
        |              UNION ALL SELECT 99991, NULL
        |              UNION ALL SELECT 99992, 'zz_alpha' || chr(10) || 'zz_beta' || chr(10) || 'zz_alpha'
        |              UNION ALL SELECT 99993, 'zz_alpha' || chr(10) || 'zz_beta'),
        |lines AS (SELECT doc_id AS doc,
        |            unnest(string_split(text, chr(10))) AS line,
        |            unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos
        |          FROM docs WHERE text IS NOT NULL),
        |keep AS (SELECT doc, pos, line FROM (
        |           SELECT doc, pos, line,
        |                  row_number() OVER (PARTITION BY line ORDER BY doc, pos) AS rn
        |           FROM lines) WHERE rn = 1)
        |SELECT doc, string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
        |       CAST(count(*) AS BIGINT) AS n_lines_kept
        |FROM keep GROUP BY doc
        |UNION ALL
        |SELECT doc_id, NULL, CAST(0 AS BIGINT) FROM docs WHERE text IS NULL""".stripMargin),

    ("dedup_duplicate_spans",
      (s: SparkSession, dir: String) => {
        // the CORE operator over real data: raw documents plus shifted
        // whole-doc copies of every 10th doc (one maximal span per pair
        // at diag -3, derived from the table — not fixture synthesis).
        // The fixture edge battery lives in dedup_duplicate_spans_edges
        // so this query benches the operator, not the fixtures
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val shifted = d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat(lit("spanprefix pad pad "), col("text")).as("text"))
        Dedup.duplicateSpans(d.union(shifted), "doc_id", "text", k = 8)
      },
      // windows via zipped unnests (generate_series positions are
      // 0-based to match Spark's posexplode); dup restriction groups
      // by window TEXT — and so does the Spark side ((h, w) stats
      // keys): hash-only grouping would let a collision merge a
      // flood-capped boilerplate window with a real passage and
      // suppress its spans; islands = p1 - row_number per (d1,d2,diag)
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 10000, 'spanprefix pad pad ' || text
        |    FROM documents WHERE doc_id % 10 = 0),
        |toks AS (SELECT doc_id AS doc, string_split_regex(lower(text), '\s+') AS tk
        |         FROM docs WHERE text IS NOT NULL),
        |wins AS (SELECT doc,
        |           unnest(generate_series(0, len(tk) - 8)) AS pos,
        |           unnest(list_transform(generate_series(0, len(tk) - 8),
        |                    i -> array_to_string(tk[i + 1:i + 8], ' '))) AS w
        |         FROM toks WHERE len(tk) >= 8),
        |stats AS (SELECT w, count(DISTINCT doc) AS nd, count(*) AS n FROM wins GROUP BY w),
        |cand AS (SELECT doc, pos, w FROM wins
        |         WHERE w IN (SELECT w FROM stats WHERE nd > 1 AND n <= 100)),
        |hits AS (SELECT a.doc AS d1, a.pos AS p1, b.doc AS d2, b.pos AS p2,
        |                a.pos - b.pos AS diag
        |         FROM cand a JOIN cand b ON a.w = b.w AND a.doc < b.doc),
        |isl AS (SELECT d1, d2, diag, p1, p2,
        |               p1 - row_number() OVER (PARTITION BY d1, d2, diag ORDER BY p1) AS g
        |        FROM hits)
        |SELECT d1, d2, CAST(min(p1) AS BIGINT) AS start1, CAST(min(p2) AS BIGINT) AS start2,
        |       CAST(count(*) + 7 AS BIGINT) AS n_tokens
        |FROM isl GROUP BY d1, d2, diag, g""".stripMargin),

    ("dedup_duplicate_spans_edges",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // edge battery over a 124-row INLINE relation (sub-second by
        // construction): the same 10-token passage at TWO alignments in
        // one doc (= two spans at distinct diagonals, never merged), a
        // 120-doc boilerplate window (> maxOcc=100 -> flood-capped,
        // zero pairs), a doc shorter than k (no windows) and a NULL
        // text (no rows, no NPE)
        val fixtures = Seq(
          (90001L, Some("alpha beta gamma delta epsilon zeta eta theta iota kappa")),
          (90002L, Some("one two three alpha beta gamma delta epsilon zeta eta theta" +
            " iota kappa four five alpha beta gamma delta epsilon zeta eta theta iota kappa")),
          (90003L, Some("short doc")),
          (90004L, Option.empty[String])).toDF("doc_id", "text")
        val flood = s.range(120).select((col("id") + 80000).as("doc_id"),
          lit("common header boilerplate shared across many docs exactly").as("text"))
        Dedup.duplicateSpans(fixtures.union(flood), "doc_id", "text", k = 8)
      },
      """WITH docs AS (
        |  SELECT 90001 AS doc_id, 'alpha beta gamma delta epsilon zeta eta theta iota kappa' AS text
        |  UNION ALL SELECT 90002, 'one two three alpha beta gamma delta epsilon zeta eta theta iota kappa four five alpha beta gamma delta epsilon zeta eta theta iota kappa'
        |  UNION ALL SELECT 90003, 'short doc'
        |  UNION ALL SELECT 90004, NULL
        |  UNION ALL SELECT 80000 + i, 'common header boilerplate shared across many docs exactly'
        |    FROM generate_series(0, 119) t(i)),
        |toks AS (SELECT doc_id AS doc, string_split_regex(lower(text), '\s+') AS tk
        |         FROM docs WHERE text IS NOT NULL),
        |wins AS (SELECT doc,
        |           unnest(generate_series(0, len(tk) - 8)) AS pos,
        |           unnest(list_transform(generate_series(0, len(tk) - 8),
        |                    i -> array_to_string(tk[i + 1:i + 8], ' '))) AS w
        |         FROM toks WHERE len(tk) >= 8),
        |stats AS (SELECT w, count(DISTINCT doc) AS nd, count(*) AS n FROM wins GROUP BY w),
        |cand AS (SELECT doc, pos, w FROM wins
        |         WHERE w IN (SELECT w FROM stats WHERE nd > 1 AND n <= 100)),
        |hits AS (SELECT a.doc AS d1, a.pos AS p1, b.doc AS d2, b.pos AS p2,
        |                a.pos - b.pos AS diag
        |         FROM cand a JOIN cand b ON a.w = b.w AND a.doc < b.doc),
        |isl AS (SELECT d1, d2, diag, p1, p2,
        |               p1 - row_number() OVER (PARTITION BY d1, d2, diag ORDER BY p1) AS g
        |        FROM hits)
        |SELECT d1, d2, CAST(min(p1) AS BIGINT) AS start1, CAST(min(p2) AS BIGINT) AS start2,
        |       CAST(count(*) + 7 AS BIGINT) AS n_tokens
        |FROM isl GROUP BY d1, d2, diag, g""".stripMargin),

    ("dedup_winnow",
      (s: SparkSession, dir: String) =>
        Dedup.winnowFingerprints(t(s, dir, "documents"), "doc_id", "text",
          k = 5, w = 4),
      s"""WITH ${winnowCtes(5, 4)}
         |SELECT DISTINCT doc, f.pos AS pos, f.h AS h FROM wsel""".stripMargin),

    ("dedup_winnow_pairs",
      (s: SparkSession, dir: String) =>
        Dedup.winnowPairs(t(s, dir, "documents"), "doc_id", "text",
          k = 5, w = 4, minShared = 2L, maxOcc = Some(100L)),
      // stats/cap/join keyed on the (h, h2) hash pair, mirroring the
      // Spark side's collision hardening
      s"""WITH ${winnowCtes(5, 4, confirm = true)},
         |wdh AS (SELECT DISTINCT doc, f.h AS h, f.h2 AS h2 FROM wsel),
         |wok AS (SELECT h, h2 FROM (SELECT h, h2, count(DISTINCT doc) AS nd
         |                           FROM wdh GROUP BY h, h2)
         |        WHERE nd > 1 AND nd <= 100),
         |wc AS (SELECT w.doc, w.h, w.h2 FROM wdh w
         |       JOIN wok o ON w.h = o.h AND w.h2 = o.h2)
         |SELECT a.doc AS d1, b.doc AS d2, CAST(count(*) AS BIGINT) AS n_shared
         |FROM wc a JOIN wc b ON a.h = b.h AND a.h2 = b.h2 AND a.doc < b.doc
         |GROUP BY a.doc, b.doc HAVING count(*) >= 2""".stripMargin),

    ("dedup_ngram_jaccard",
      (s: SparkSession, dir: String) =>
        Dedup.ngramJaccard(t(s, dir, "documents"), "doc_id", "text",
          n = 3, threshold = 0.3, maxDocFreq = Some(20)),
      s"""WITH ${shingleCte(3, 20)},
         |inter AS (SELECT a.doc AS d1, b.doc AS d2, count(*) AS i
         |          FROM sh1 a JOIN sizes s1 ON a.doc = s1.doc
         |               JOIN sh1 b ON a.sh = b.sh JOIN sizes s2 ON b.doc = s2.doc
         |          WHERE a.doc < b.doc
         |            AND CAST(least(s1.sz, s2.sz) AS DOUBLE) >= 0.3 * CAST(greatest(s1.sz, s2.sz) AS DOUBLE)
         |          GROUP BY a.doc, b.doc)
         |${jaccardSql("inter", 0.3)}""".stripMargin),

    ("dedup_minhash_lsh",
      (s: SparkSession, dir: String) =>
        Dedup.minhashLsh(t(s, dir, "documents"), "doc_id", "text",
          n = 3, k = 16, rowsPerBand = 4, threshold = 0.3, maxDocFreq = Some(20)),
      s"WITH $minhashCtes SELECT d1, d2, jaccard FROM mh_pairs"),

    ("dedup_clusters",
      (s: SparkSession, dir: String) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
          n = 3, k = 16, rowsPerBand = 4, threshold = 0.3, maxDocFreq = Some(20))
        Dedup.clusterAssignments(docs, "doc_id", pairs)
      },
      // recursive min-reachable-label walk == the fixpoint the Spark
      // label propagation converges to
      s"""WITH RECURSIVE $minhashCtes,
         |edges AS (SELECT d1 AS src, d2 AS dst FROM mh_pairs
         |          UNION SELECT d2, d1 FROM mh_pairs),
         |walk(node, label) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, w.label FROM edges e JOIN walk w ON w.node = e.dst),
         |cc AS (SELECT node, min(label) AS label FROM walk GROUP BY node)
         |SELECT doc_id AS doc, COALESCE(cc.label, doc_id) AS cluster,
         |       COALESCE(cc.label, doc_id) = doc_id AS is_canonical
         |FROM documents LEFT JOIN cc ON doc_id = cc.node""".stripMargin),

    ("dedup_simhash",
      (s: SparkSession, dir: String) =>
        // 60-bit signature, 6 chunks, hamming <= 4: bands key on 2-chunk
        // combinations (20 bits, Manku-style) so buckets stay tiny at
        // corpus scale; completeness enforced by simhashPairs' require
        Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
          maxHamming = 4, nBits = 60, nChunks = 6)
          .select(col("d1"), col("d2"), col("hamming").cast("long").as("hamming")),
      {
        // bits < 30 sample the base-131 hash; 30..59 the base-137 hash
        // (the rolling hash is < 2^30, so higher bits of one hash would
        // be dead zeros) — mirrors Dedup.simhash exactly
        val sums = (0 until 60).map { b =>
          val src = if (b < 30) s"(h1 >> $b)" else s"(h2 >> ${b - 30})"
          s"sum(CASE WHEN $src % 2 = 1 THEN 1 ELSE -1 END) AS s$b"
        }.mkString(", ")
        val sig = (0 until 60).map(b =>
          s"CASE WHEN s$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
          .mkString(" + ")
        // bands = 2-chunk combinations of 6 chunks of width ceil(60/6)=10,
        // enumerated by the SAME function simhashPairs bands with; band
        // key packs the two 10-bit chunk values into one 20-bit integer
        val combos = Dedup.simhashBandCombos(nChunks = 6, maxHamming = 4)
        val comboVals = combos.zipWithIndex
          .map { case (cs, g) => s"($g, ${cs(0)}, ${cs(1)})" }.mkString(", ")
        s"""WITH tk AS (SELECT doc_id AS doc, unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents),
           |hh AS (SELECT doc, ${rhSql("tok")} AS h1, ${rhSql("tok", 137L)} AS h2 FROM tk),
           |sums AS (SELECT doc, $sums FROM hh GROUP BY doc),
           |sig AS (SELECT doc, $sig AS simhash FROM sums),
           |ch AS (SELECT doc, simhash, g,
           |         ((simhash >> (c1 * 10)) % 1024) + ((simhash >> (c2 * 10)) % 1024) * 1024 AS ck
           |       FROM sig CROSS JOIN (VALUES $comboVals) AS t(g, c1, c2)),
           |cand AS (SELECT DISTINCT l.doc AS d1, r.doc AS d2, l.simhash AS h1, r.simhash AS h2
           |         FROM ch l JOIN ch r ON l.g = r.g AND l.ck = r.ck WHERE l.doc < r.doc)
           |SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
           |FROM cand WHERE bit_count(xor(h1, h2)) <= 4""".stripMargin
      }),

    ("dedup_embedding_lsh",
      (s: SparkSession, dir: String) =>
        Dedup.embeddingNearDup(t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.2, useLsh = true),
      {
        val cos = Num.r6Sql(dotSql("a.v", "b.v"))
        s"""WITH nv AS (SELECT vec_id AS id, ${nvSql("embedding")} AS v FROM embeddings),
           |bk AS (SELECT id, v, ${bucketSql("v", 8)} AS bucket FROM nv)
           |SELECT a.id AS d1, b.id AS d2, $cos AS cos
           |FROM bk a JOIN bk b USING (bucket) WHERE a.id < b.id AND $cos >= 0.2""".stripMargin
      }),

    ("dedup_embedding_exact",
      (s: SparkSession, dir: String) =>
        Dedup.embeddingNearDup(t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.25, useLsh = false),
      {
        val cos = Num.r6Sql(dotSql("a.v", "b.v"))
        s"""WITH nv AS (SELECT vec_id AS id, ${nvSql("embedding")} AS v FROM embeddings)
           |SELECT a.id AS d1, b.id AS d2, $cos AS cos
           |FROM nv a JOIN nv b ON a.id < b.id WHERE $cos >= 0.25""".stripMargin
      }),

    ("dedup_semantic",
      (s: SparkSession, dir: String) =>
        Dedup.semanticNearDup(t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.25, nCentroids = 16, kmeansIters = 2),
      {
        val cos = Num.r6Sql(dotSql("a.cv", "b.cv"))
        // pairs only WITHIN a k-means cell — the SemDeDup candidate rule
        s"""WITH ${ivfAsgCtes(16, 2)}
           |SELECT a.nn_id AS d1, b.nn_id AS d2, $cos AS cos
           |FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.nn_id < b.nn_id
           |WHERE $cos >= 0.25""".stripMargin
      }),

    // ---- similarity search ------------------------------------------------
    ("embedding_quantize",
      (s: SparkSession, dir: String) =>
        Similarity.quantizeInt8(t(s, dir, "embeddings"), "vec_id", "embedding")
          .select(col("id"), col("scale"),
            array_join(col("q").cast("array<string>"), ",").as("q"),
            col("max_err")),
      {
        val scale = "(ma / 127.0)"
        s"""WITH v AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS d FROM embeddings),
           |m AS (SELECT id, d, list_reduce(list_prepend(0.0, list_transform(d, x -> abs(x))), (a, b) -> greatest(a, b)) AS ma FROM v),
           |qv AS (SELECT id, d, ma, CASE WHEN ma = 0 THEN list_transform(d, x -> CAST(0 AS BIGINT))
           |         ELSE list_transform(d, x -> CAST(greatest(-127, least(127, floor(x / $scale + 0.5))) AS BIGINT)) END AS q FROM m)
           |SELECT id, ${Num.r6Sql(scale)} AS scale, array_to_string(q, ',') AS q,
           |       ${Num.r6Sql(s"list_reduce(list_prepend(0.0, list_transform(d, (x, i) -> abs(x - q[i] * $scale))), (a, b) -> greatest(a, b))")} AS max_err
           |FROM qv""".stripMargin
      }),

    ("similarity_topk",
      (s: SparkSession, dir: String) => {
        val e = t(s, dir, "embeddings")
        Similarity.topK(e, e.filter(col("vec_id") < 20), "vec_id", "embedding", k = 5)
      },
      {
        val score = Num.r6Sql(dotSql("c.v", "q.v"))
        s"""WITH nv AS (SELECT vec_id AS id, ${nvSql("embedding")} AS v FROM embeddings),
           |sc AS (SELECT q.id AS query_id, c.id AS nn_id, $score AS score
           |       FROM nv c JOIN nv q ON q.id < 20 AND c.id <> q.id)
           |SELECT query_id, nn_id, score, CAST(rank AS INT) AS rank
           |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, nn_id) AS rank FROM sc)
           |WHERE rank <= 5""".stripMargin
      }),

    ("similarity_topk_lsh",
      (s: SparkSession, dir: String) => {
        val e = t(s, dir, "embeddings")
        // DEFENSIBLE default config: 2 planes x 4 OR-amplified tables,
        // recall@10 = 0.800 measured (AnnRecallSpec pins the 0.75
        // floor at exactly these parameters). The old single-table
        // 8-plane config measured 0.065 on these near-random
        // embeddings — determinism-gating a configuration no user
        // should copy; the single-table CODE path stays covered by
        // AnnRecallSpec's monotonicity test
        Similarity.topKLsh(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
          k = 5, nPlanes = 2, nTables = 4)
      },
      mlshOracleSql(nPlanes = 2, nTables = 4)),

    ("similarity_topk_mlsh",
      (s: SparkSession, dir: String) => {
        val e = t(s, dir, "embeddings")
        // QUALITY config: 2 planes x 12 tables, recall@10 = 0.920
        // measured (AnnRecallSpec pins the 0.9 floor at exactly these
        // parameters) — pins the cross-table candidate UNION, dedup,
        // and rank parity at the config a quality-sensitive user runs
        Similarity.topKLsh(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
          k = 5, nPlanes = 2, nTables = 12)
      },
      mlshOracleSql(nPlanes = 2, nTables = 12)),

    ("similarity_topk_ivf",
      (s: SparkSession, dir: String) => {
        val e = t(s, dir, "embeddings")
        Similarity.topKIvf(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
          k = 5, nCentroids = 16, nProbe = 4, kmeansIters = 2)
      },
      {
        val score = Num.r6Sql(dotSql("a.cv", "p.qv"))
        s"""WITH ${ivfAsgCtes(16, 2)},
           |probes AS (SELECT id AS query_id, v AS qv, cid AS cluster FROM (
           |  SELECT q.id, q.v, c.cid,
           |         row_number() OVER (PARTITION BY q.id ORDER BY ${dotSql("q.v", "c.cv")} DESC, c.cid ASC) AS rn
           |  FROM nv q CROSS JOIN cent c WHERE q.id < 20) WHERE rn <= 4),
           |sc AS (SELECT p.query_id, a.nn_id, $score AS score
           |       FROM asg a JOIN probes p ON a.cluster = p.cluster AND a.nn_id <> p.query_id)
           |SELECT query_id, nn_id, score, CAST(rank AS INT) AS rank
           |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, nn_id) AS rank FROM sc)
           |WHERE rank <= 5""".stripMargin
      }),

    // ---- text analysis ----------------------------------------------------
    ("text_quality",
      (s: SparkSession, dir: String) =>
        TextAnalysis.quality(t(s, dir, "documents"), "text")
          .select(col("doc_id"), col("n_chars_calc"), col("n_tokens"),
            col("avg_token_len"), col("punct_ratio"), col("stopword_ratio"),
            col("quality_score")),
      s"""WITH $textBCte,
         |$qualityCtes
         |SELECT doc_id, n_chars_calc, n_tokens, avg_token_len, punct_ratio,
         |       stopword_ratio, quality_score FROM qual""".stripMargin),

    ("text_repetition",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // degenerate-text fixture rows ride along so the gate PINS their
        // semantics: NULL text (NULL n_tokens + metrics), empty text and
        // whitespace-only text (n_tokens = 0, NULL metrics — an
        // untrimmed split would score them maximally repetitive), and
        // padded text (trim must not create empty-string tokens)
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
          .union(Seq(
            (99991L, Option.empty[String]),
            (99990L, Some("")),
            (99989L, Some(" \t  ")),
            (99988L, Some("  pad pad\t"))).toDF("doc_id", "text"))
        TextAnalysis.repetitionStats(d, "doc_id", "text")
      },
      s"""WITH docs AS (SELECT doc_id, text FROM documents
         |              UNION ALL SELECT 99991, NULL
         |              UNION ALL SELECT 99990, ''
         |              UNION ALL SELECT 99989, ' ' || chr(9) || '  '
         |              UNION ALL SELECT 99988, '  pad pad' || chr(9)),
         |${repetitionCtes("docs")}
         |SELECT doc_id, rep_n_tokens AS n_tokens, top_word_frac,
         |       top_bigram_frac, distinct_frac
         |FROM rep""".stripMargin),

    ("text_langid",
      (s: SparkSession, dir: String) =>
        TextAnalysis.langId(t(s, dir, "documents"), "text")
          .select(col("doc_id"), col("lang_pred")),
      s"""WITH $textBCte,
         |$langCtes
         |SELECT doc_id, lang_pred FROM lang""".stripMargin),

    ("text_tokenstats",
      (s: SparkSession, dir: String) =>
        TextAnalysis.tokenStats(t(s, dir, "documents"), "text")
          .select(col("doc_id"), col("ws_tokens"), col("bpeish_tokens"), col("chars")),
      raw"""SELECT doc_id,
           |  CAST(len(string_split_regex(lower(text), '\s+')) AS INT) AS ws_tokens,
           |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INT) AS bpeish_tokens,
           |  CAST(length(text) AS INT) AS chars
           |FROM documents""".stripMargin),

    ("text_fingerprint",
      (s: SparkSession, dir: String) =>
        TextAnalysis.fingerprint(t(s, dir, "documents"), "text")
          .select(col("doc_id"), col("fingerprint")),
      s"SELECT doc_id, ${rhSql("text")} AS fingerprint FROM documents"),

    ("text_chunk",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // a NULL-text document must survive chunking as one
        // (doc, 0, NULL, NULL) row, not silently vanish
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
          .union(Seq((99991L, Option.empty[String])).toDF("doc_id", "text"))
        TextAnalysis.chunk(d, "doc_id", "text", chunkTokens = 16, stride = 8)
      },
      // the CASE keeps one (doc, 0, NULL, NULL) row for a NULL text,
      // mirroring TextAnalysis.chunk — generate_series(0, NULL) would
      // emit nothing and silently drop the document
      s"""WITH docs AS (SELECT doc_id, text FROM documents
         |              UNION ALL SELECT 99991, NULL),
         |b AS (SELECT doc_id AS doc, string_split_regex(lower(text), '\\s+') AS tk FROM docs),
         |c AS (SELECT doc, unnest(generate_series(0, CASE WHEN tk IS NULL THEN 0 ELSE greatest((len(tk) - 1) // 8, 0) END)) AS chunk_idx, tk FROM b),
         |sl AS (SELECT doc, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |              tk[chunk_idx * 8 + 1 : chunk_idx * 8 + 16] AS ck FROM c)
         |SELECT doc, chunk_idx, array_to_string(ck, ' ') AS chunk_text,
         |       CAST(len(ck) AS BIGINT) AS n_tokens
         |FROM sl""".stripMargin),

    ("text_scrub",
      (s: SparkSession, dir: String) =>
        TextAnalysis.scrub(
          // synthesize pii-shaped content deterministically from real rows
          t(s, dir, "documents").select(col("doc_id"),
            concat(col("text"), lit(" contact user"), col("doc_id"),
              lit("@example.com or https://ex.com/p?id="), col("doc_id"),
              lit(" ref "), col("doc_id")).as("text")), "text")
          .select(col("doc_id"), col("scrubbed")),
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        text || ' contact user' || doc_id || '@example.com or https://ex.com/p?id=' || doc_id || ' ref ' || doc_id,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |      'https?://[^\s]+', '<URL>', 'g'),
        |    '[0-9]+', '<NUM>', 'g') AS scrubbed
        |FROM documents""".stripMargin),

    ("corpus_split",
      (s: SparkSession, dir: String) =>
        TextAnalysis.hashSplit(t(s, dir, "documents"), "text",
          trainPct = 80, valPct = 10)
          .groupBy(col("split")).agg(count(lit(1)).as("n")),
      s"""SELECT CASE WHEN ${rhSql("text")} % 100 < 80 THEN 'train'
         |            WHEN ${rhSql("text")} % 100 < 90 THEN 'val'
         |            ELSE 'test' END AS split, CAST(count(*) AS BIGINT) AS n
         |FROM documents GROUP BY 1""".stripMargin),

    ("corpus_filter_neardup",
      (s: SparkSession, dir: String) =>
        Corpus.trainingFilterNearDup(t(s, dir, "documents"), "doc_id", "text",
          minQuality = 0.5, lang = "en",
          n = 3, k = 16, rowsPerBand = 4, threshold = 0.3, maxDocFreq = Some(20)),
      s"""WITH RECURSIVE $minhashCtes,
         |edges AS (SELECT d1 AS src, d2 AS dst FROM mh_pairs
         |          UNION SELECT d2, d1 FROM mh_pairs),
         |walk(node, label) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, w.label FROM edges e JOIN walk w ON w.node = e.dst),
         |cc AS (SELECT node, min(label) AS label FROM walk GROUP BY node),
         |$textBCte,
         |$qualityCtes,
         |$langCtes
         |SELECT d.doc_id, COALESCE(cc.label, d.doc_id) AS cluster,
         |       lang_pred, quality_score
         |FROM documents d
         |LEFT JOIN cc ON d.doc_id = cc.node
         |JOIN qual ON qual.doc_id = d.doc_id JOIN lang ON lang.doc_id = d.doc_id
         |WHERE COALESCE(cc.label, d.doc_id) = d.doc_id
         |  AND lang_pred = 'en' AND quality_score >= 0.5""".stripMargin),

    ("corpus_sample",
      (s: SparkSession, dir: String) =>
        TextAnalysis.hashSample(t(s, dir, "documents"), "text", pct = 30)
          .select(col("doc_id")),
      s"SELECT doc_id FROM documents WHERE ${rhSql("text")} % 100 < 30"),

    ("corpus_stratified_sample",
      (s: SparkSession, dir: String) => {
        // class-balancing: downsample the dominant language hard (20%),
        // keep unidentified docs at 80% — membership is content-hash
        // stable, never re-rolled
        val lang = TextAnalysis.langId(t(s, dir, "documents"), "text")
        TextAnalysis.stratifiedSample(lang, "lang_pred", "text",
          pcts = Map("en" -> 20, "und" -> 80), defaultPct = 50)
          .select(col("doc_id"), col("lang_pred"))
      },
      s"""WITH $textBCte,
         |$langCtes
         |SELECT l.doc_id, l.lang_pred
         |FROM lang l JOIN documents d ON l.doc_id = d.doc_id
         |WHERE ${rhSql("d.text")} % 100 <
         |  CASE l.lang_pred WHEN 'en' THEN 20 WHEN 'und' THEN 80 ELSE 50 END""".stripMargin),

    ("text_vocab",
      (s: SparkSession, dir: String) =>
        Corpus.vocab(t(s, dir, "documents"), "text", topN = 20),
      s"""WITH toks AS (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token FROM documents),
         |v AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY token)
         |SELECT token, cnt FROM v ORDER BY cnt DESC, token LIMIT 20""".stripMargin),

    ("text_tfidf",
      (s: SparkSession, dir: String) =>
        Corpus.tfIdf(t(s, dir, "documents"), "doc_id", "text"),
      {
        val w = Num.r6Sql(
          "(CAST(cnt AS DOUBLE) / CAST(dlen AS DOUBLE)) * ln(CAST(nd AS DOUBLE) / CAST(df AS DOUBLE))")
        s"""WITH toks AS (SELECT doc_id AS doc, unnest(string_split_regex(lower(text), '\\s+')) AS token FROM documents),
           |tf AS (SELECT doc, token, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY doc, token),
           |dl AS (SELECT doc, sum(cnt) AS dlen FROM tf GROUP BY doc),
           |dfr AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents)
           |SELECT doc, token, cnt, $w AS tf_idf
           |FROM tf JOIN dl USING (doc) JOIN dfr USING (token) CROSS JOIN nn""".stripMargin
      }),

    ("corpus_domain_cap",
      (s: SparkSession, dir: String) => {
        // deterministic URLs synthesized from the id (37 domains) — the
        // web-corpus "no site dominates" admission rule over a salted
        // two-stage rank
        val d = t(s, dir, "documents").select(col("doc_id"),
          concat(lit("https://site"), pmod(col("doc_id"), lit(37)),
            lit(".example.com/p/"), col("doc_id")).as("url"))
        Corpus.domainCap(d, "doc_id", "url", maxPerDomain = 5)
          .select(col("doc_id"), col("domain"), col("rank_in_domain"))
      },
      """WITH u AS (SELECT doc_id,
        |             'https://site' || (doc_id % 37) || '.example.com/p/' || doc_id AS url
        |           FROM documents),
        |d AS (SELECT doc_id, regexp_extract(url, '^https?://([^/]+)', 1) AS domain FROM u),
        |r AS (SELECT doc_id, domain,
        |        row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rank_in_domain
        |      FROM d)
        |SELECT doc_id, domain, CAST(rank_in_domain AS INT) AS rank_in_domain
        |FROM r WHERE rank_in_domain <= 5""".stripMargin),

    ("corpus_decontaminate",
      (s: SparkSession, dir: String) => {
        // the "benchmark" is a corpus subset (every 37th doc), so eval
        // docs are guaranteed contaminated (they match themselves) and
        // near-duplicates of them get caught through shared 8-grams —
        // the standard n range for decontamination is 8-13. A NULL-text
        // row rides along: it must pass the gate with 0 hits, not vanish
        import s.implicits._
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
          .union(Seq((99991L, Option.empty[String])).toDF("doc_id", "text"))
        Corpus.decontaminate(docs, docs.filter(col("doc_id") % 37 === 0),
          "doc_id", "text", n = 8)
      },
      s"""WITH docs AS (SELECT doc_id, text FROM documents
         |              UNION ALL SELECT 99991, NULL),
         |${tokenShingleCte(8, "docs")},
         |h0 AS (SELECT DISTINCT doc, ${rhSql("sh")} AS h FROM sh0),
         |ev AS (SELECT DISTINCT h FROM h0 WHERE doc % 37 = 0),
         |hits AS (SELECT doc, CAST(count(*) AS BIGINT) AS n_hits
         |         FROM h0 JOIN ev USING (h) GROUP BY doc)
         |SELECT doc_id AS doc, COALESCE(n_hits, 0) AS n_hits,
         |       COALESCE(n_hits, 0) < 1 AS keep
         |FROM docs LEFT JOIN hits ON doc_id = hits.doc""".stripMargin),

    ("corpus_decontaminate_report",
      (s: SparkSession, dir: String) => {
        // attribution view over the same %37 benchmark slice as the
        // gate; minShared=2 so the report carries evidence-grade pairs
        // (a single shared 8-gram can be coincidence; two begins to
        // look like leakage). Every eval doc attributes to itself with
        // its full distinct-8-gram count — the self-pair is the
        // sanity row that proves the counting is complete
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        Corpus.decontaminateReport(docs, docs.filter(col("doc_id") % 37 === 0),
          "doc_id", "text", n = 8, minShared = 2L)
      },
      s"""WITH ${tokenShingleCte(8, "documents")},
         |h0 AS (SELECT DISTINCT doc, ${rhSql("sh")} AS h FROM sh0),
         |ev AS (SELECT doc AS eval_doc, h FROM h0 WHERE doc % 37 = 0)
         |SELECT ev.eval_doc, h0.doc AS train_doc,
         |       CAST(count(*) AS BIGINT) AS n_shared
         |FROM h0 JOIN ev USING (h)
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin),

    ("corpus_select_budget",
      (s: SparkSession, dir: String) => {
        // quality-prioritized token-budget cut over the standard scorer;
        // budget 20k bytes is selective at the verify SF and above and
        // exceeds the corpus at sf0.001 (pinning the admit-everything
        // edge); byte counts as the engine-safe token stand-in
        val scored = TextAnalysis.quality(t(s, dir, "documents"), "text")
          .select(col("doc_id"), col("quality_score"),
            octet_length(col("text")).cast("long").as("nb"))
        Corpus.selectByTokenBudget(scored, "doc_id", "quality_score", "nb",
          budget = 20000L, nBins = 1000)
      },
      s"""WITH $textBCte,
         |$qualityCtes,
         |sb_d AS (SELECT q.doc_id, q.quality_score,
         |        greatest(COALESCE(CAST(strlen(dd.text) AS BIGINT), 0), 0) AS n
         |      FROM qual q JOIN documents dd USING (doc_id)),
         |sb_b AS (SELECT doc_id, quality_score, n,
         |        CAST(least(999, greatest(0,
         |          CAST(floor(COALESCE(quality_score, 0.0) * 1000) AS BIGINT))) AS INT) AS bin
         |      FROM sb_d),
         |sb_hist AS (SELECT bin, sum(n) AS toks FROM sb_b GROUP BY bin),
         |sb_cum AS (SELECT bin, toks,
         |          COALESCE(sum(toks) OVER (ORDER BY bin DESC
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
         |        FROM sb_hist),
         |sb_sel AS (SELECT bin, toks, above,
         |          CASE WHEN above + toks <= 20000 THEN 2
         |               WHEN above <= 20000 THEN 1 ELSE 0 END AS cls
         |        FROM sb_cum),
         |sb_bd AS (SELECT bin AS tbin,
         |         CAST(CAST(20000 - above AS HUGEINT) * 1000000 // toks AS BIGINT) AS ppm
         |       FROM sb_sel WHERE cls = 1)
         |SELECT sb_b.doc_id, sb_b.quality_score, sb_b.n AS n_toks, sb_b.bin
         |FROM sb_b JOIN sb_sel ON sb_b.bin = sb_sel.bin
         |LEFT JOIN sb_bd ON sb_b.bin = sb_bd.tbin
         |WHERE sb_sel.cls = 2
         |   OR (sb_sel.cls = 1 AND ${rhSql("CAST(sb_b.doc_id AS VARCHAR)")} % 1000000 < sb_bd.ppm)""".stripMargin),

    ("corpus_gopher",
      (s: SparkSession, dir: String) =>
        Corpus.gopherFilter(t(s, dir, "documents"), "doc_id", "text"),
      s"""WITH $textBCte,
         |$qualityCtes,
         |${repetitionCtes("documents")}
         |SELECT q.doc_id, q.n_tokens, q.avg_token_len, q.stopword_ratio,
         |       r.top_word_frac, r.distinct_frac
         |FROM qual q JOIN rep r ON q.doc_id = r.doc_id
         |WHERE q.n_tokens BETWEEN 40 AND 100000
         |  AND q.avg_token_len BETWEEN 3.0 AND 10.0
         |  AND q.stopword_ratio >= 0.05
         |  AND r.top_word_frac <= 0.2
         |  AND r.distinct_frac >= 0.3""".stripMargin),

    ("corpus_perplexity",
      (s: SparkSession, dir: String) => {
        // CCNet-style: the clean "reference" slice is doc_id % 10 = 0
        // (deterministic), the LM is pruned to 100 bigrams so the
        // backoff path is exercised at every SF, and the whole corpus
        // is scored against it
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val (bg, uni) = Corpus.bigramLm(docs.filter(col("doc_id") % 10 === 0),
          "text", topM = 100)
        Corpus.perplexityScore(docs, "doc_id", "text", bg, uni)
      },
      s"WITH $perplexityCtes SELECT doc_id, ppl FROM ppl"),

    ("corpus_admission_full",
      (s: SparkSession, dir: String) => {
        // the CAPSTONE composite: the full pretraining admission
        // pipeline in ONE DataFrame DAG — near-dup cluster canonicality
        // (MinHash+LSH + connected components) + language gate +
        // quality gate + benchmark decontamination (8-gram overlap vs
        // the doc_id%37 slice) + CCNet perplexity gate (bigram LM on
        // the doc_id%10 reference slice, cut at 4.2). Every stage is
        // individually oracle-gated elsewhere; this query pins their
        // COMPOSITION — join order, gate precedence, and the fact that
        // one DAG can express the whole admission path
        // ONE corpus scan feeds every token consumer: the relation is
        // spread (BEFORE the checkpoint — spread's scan-metadata gate
        // no-ops on in-memory plans), tokenized once, and materialized;
        // near-dup shingling, decontamination 8-grams, the bigram LM
        // and perplexity scoring all read the shared `tk` column
        // instead of re-scanning + re-tokenizing per stage (at 100 TB:
        // N-1 corpus scans saved)
        // the materialization is corpus-sized: localCheckpoint is the
        // local-mode stand-in for cluster storage (persist DISK / a
        // staged write) — same disclosed policy as the minhash family's
        // shingleRelation
        val toked = graft.Partitioning.spread(
            t(s, dir, "documents").select(col("doc_id"), col("text")))
          .withColumn("tk", graft.llm.TextAnalysis.tokens(col("text")))
          .localCheckpoint()
        val (bg, uni) = Corpus.bigramLm(toked.filter(col("doc_id") % 10 === 0),
          "text", topM = 100, tokensCol = Some("tk"))
        val admitted = Corpus.trainingFilterNearDup(toked, "doc_id", "text",
          minQuality = 0.5, lang = "en",
          n = 3, k = 16, rowsPerBand = 4, threshold = 0.3, maxDocFreq = Some(20),
          tokensCol = Some("tk"))
        val clean = Corpus.decontaminate(toked,
          toked.filter(col("doc_id") % 37 === 0), "doc_id", "text", n = 8,
          tokensCol = Some("tk"))
          .filter(col("keep")).select(col("doc").as("doc_id"))
        val scores = Corpus.perplexityScore(toked, "doc_id", "text", bg, uni,
          tokensCol = Some("tk"))
        admitted.join(clean, Seq("doc_id"), "left_semi")
          .join(scores, Seq("doc_id"))
          .filter(col("ppl") <= 4.2)
          .select(col("doc_id"), col("cluster"), col("lang_pred"),
            col("quality_score"), col("ppl"))
      }, {
        val gram8 = (0 until 8).map(j => if (j == 0) "tk2[i]" else s"tk2[i + $j]")
          .mkString(" || ' ' || ")
        s"""WITH RECURSIVE $minhashCtes,
           |edges AS (SELECT d1 AS src, d2 AS dst FROM mh_pairs
           |          UNION SELECT d2, d1 FROM mh_pairs),
           |walk(node, label) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT e.src, w.label FROM edges e JOIN walk w ON w.node = e.dst),
           |cc AS (SELECT node, min(label) AS label FROM walk GROUP BY node),
           |$textBCte,
           |$qualityCtes,
           |$langCtes,
           |dtoks AS (SELECT doc_id AS doc,
           |            string_split_regex(lower(text), '\\s+') AS tk2 FROM documents),
           |dsh0 AS (SELECT DISTINCT doc,
           |           unnest(list_transform(generate_series(1, len(tk2) - 7),
           |             i -> $gram8)) AS sh
           |         FROM dtoks WHERE len(tk2) >= 8),
           |dh0 AS (SELECT DISTINCT doc, ${rhSql("sh")} AS h FROM dsh0),
           |dev AS (SELECT DISTINCT h FROM dh0 WHERE doc % 37 = 0),
           |contaminated AS (SELECT DISTINCT doc FROM dh0 JOIN dev USING (h)),
           |$perplexityCtes
           |SELECT d.doc_id, COALESCE(cc.label, d.doc_id) AS cluster,
           |       lang_pred, quality_score, ppl
           |FROM documents d
           |LEFT JOIN cc ON d.doc_id = cc.node
           |JOIN qual ON qual.doc_id = d.doc_id JOIN lang ON lang.doc_id = d.doc_id
           |JOIN ppl ON ppl.doc_id = d.doc_id
           |WHERE COALESCE(cc.label, d.doc_id) = d.doc_id
           |  AND lang_pred = 'en' AND quality_score >= 0.5
           |  AND d.doc_id NOT IN (SELECT doc FROM contaminated)
           |  AND ppl <= 4.2""".stripMargin
      }),

    ("text_strip_html",
      (s: SparkSession, dir: String) => {
        // fixture: wrap each doc in crawl-shaped HTML — style + script
        // subtrees (content must VANISH, not just lose tags), comments,
        // attributes, entities, a self-closing tag; NULL text rides
        // through as NULL via concat's null propagation
        val d = t(s, dir, "documents").select(col("doc_id"), concat(
          lit("<html><head><style>p { color: red }</style>" +
            "<!-- nav --><script type=\"text/js\">var x = 1 < 2;</script>" +
            "</head><body><p class=\"a\">"),
          col("text"),
          lit("</p><br/>&amp; <b>tail</b>&nbsp;&#39;q&#39;</body></html>"))
          .as("text"))
        TextAnalysis.stripHtml(d, "text").select(col("doc_id"), col("clean"))
      },
      s"""WITH raw AS (SELECT doc_id,
         |    '<html><head><style>p { color: red }</style><!-- nav --><script type="text/js">var x = 1 < 2;</script></head><body><p class="a">'
         |    || text ||
         |    '</p><br/>&amp; <b>tail</b>&nbsp;&#39;q&#39;</body></html>' AS t
         |  FROM documents),
         |s1 AS (SELECT doc_id,
         |    regexp_replace(regexp_replace(regexp_replace(t,
         |      '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g'),
         |      '(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g'),
         |      '(?is)<noscript\\b[^>]*>.*?</noscript\\s*>', ' ', 'g') AS t
         |  FROM raw),
         |s2 AS (SELECT doc_id, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM s1),
         |s3 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM s2),
         |s4 AS (SELECT doc_id,
         |    replace(replace(replace(replace(replace(replace(t,
         |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |      '&#39;', ''''), '&amp;', '&') AS t
         |  FROM s3)
         |SELECT doc_id, trim(regexp_replace(t, '\\s+', ' ', 'g')) AS clean
         |FROM s4""".stripMargin),

    ("text_script_profile",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // documents are ASCII — append fixtures per script block, a
        // digits/punct-only doc (no script chars -> 'none'), a Greek/
        // Latin tie (latin precedence wins) and a NULL text
        val extra = Seq(
          (90101L, "Привет мир это тест кириллицы"),
          (90102L, "你好世界 これは テスト です"),
          (90103L, "مرحبا بالعالم هذا اختبار"),
          (90104L, "αβγ abc"),
          (90105L, "1234 !!! ???"),
          (90106L, null)).toDF("doc_id", "text")
        TextAnalysis.scriptProfile(
          t(s, dir, "documents").select(col("doc_id"), col("text")).union(extra),
          "text")
          .select(col("doc_id") +: col("n_script_chars") +: col("script_pred") +:
            TextAnalysis.scriptBlocks.flatMap(b =>
              Seq(col(s"n_${b._1}"), col(s"ratio_${b._1}"))): _*)
      }, {
        val blocks = TextAnalysis.scriptBlocks
        val counts = blocks.map { case (n, r) =>
          s"CAST(len(regexp_extract_all(text, '[$r]')) AS BIGINT) AS n_$n"
        }.mkString(", ")
        val tot = blocks.map(b => s"n_${b._1}").mkString(" + ")
        val ratios = blocks.map { case (n, _) =>
          s"CASE WHEN n_script_chars > 0 THEN ${graft.Num.r6Sql(
            s"CAST(n_$n AS DOUBLE) / CAST(n_script_chars AS DOUBLE)")} ELSE 0.0 END AS ratio_$n"
        }.mkString(", ")
        val names = blocks.map(_._1)
        val cases = names.map { n =>
          val beats = (s"n_$n > 0" +: names.filterNot(_ == n)
            .map(o => s"n_$n >= n_$o")).mkString(" AND ")
          s"WHEN $beats THEN '$n'"
        }.mkString(" ")
        s"""WITH docs AS (SELECT doc_id, text FROM documents
           |  UNION ALL SELECT 90101, 'Привет мир это тест кириллицы'
           |  UNION ALL SELECT 90102, '你好世界 これは テスト です'
           |  UNION ALL SELECT 90103, 'مرحبا بالعالم هذا اختبار'
           |  UNION ALL SELECT 90104, 'αβγ abc'
           |  UNION ALL SELECT 90105, '1234 !!! ???'
           |  UNION ALL SELECT 90106, NULL),
           |c AS (SELECT doc_id, $counts FROM docs),
           |tt AS (SELECT *, $tot AS n_script_chars FROM c)
           |SELECT doc_id, n_script_chars,
           |       CASE $cases ELSE 'none' END AS script_pred,
           |       ${blocks.map(b => s"n_${b._1}").mkString(", ")}, $ratios
           |FROM tt""".stripMargin
      }),

    ("corpus_url_dedup",
      (s: SparkSession, dir: String) => {
        // deterministic MESSY urls: mixed-case scheme/host, default
        // ports, tracking params, fragments, trailing slashes. The
        // canonical identity is doc_id % 50 (10 domains x 50 paths),
        // while the NOISE branches key on doc_id % 2/3/4 — so the ~10
        // docs behind each canonical key carry DIFFERENT noise, and the
        // group counts are right only if canonicalization collapses all
        // of it
        val d = t(s, dir, "documents").select(col("doc_id"),
          concat(
            when(col("doc_id") % 2 === 0, "HTTPS://Site").otherwise("https://site"),
            pmod(col("doc_id"), lit(10)),
            when(col("doc_id") % 4 === 0, ".Example.COM:443/p/").otherwise(".example.com/p/"),
            pmod(col("doc_id"), lit(50)),
            when(col("doc_id") % 3 === 0, lit("/?utm_source=x&q=1"))
              .when(col("doc_id") % 3 === 1, lit("?q=1&utm_campaign=z#frag"))
              .otherwise(lit("?q=1"))).as("url"))
        Corpus.urlDedup(d, "doc_id", "url")
      },
      // the same regexp chain, step for step ('g' = replace ALL — Spark's
      // regexp_replace default); RE2-compatible patterns only
      """WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://Site' ELSE 'https://site' END)
        |  || (doc_id % 10)
        |  || (CASE WHEN doc_id % 4 = 0 THEN '.Example.COM:443/p/' ELSE '.example.com/p/' END)
        |  || (doc_id % 50)
        |  || (CASE WHEN doc_id % 3 = 0 THEN '/?utm_source=x&q=1'
        |           WHEN doc_id % 3 = 1 THEN '?q=1&utm_campaign=z#frag'
        |           ELSE '?q=1' END) AS url
        |  FROM documents),
        |c1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '', 'g') AS u FROM u),
        |c2 AS (SELECT doc_id, regexp_replace(u, '(utm_[a-z]+|gclid|fbclid)=[^&]*&?', '', 'g') AS u FROM c1),
        |c3 AS (SELECT doc_id, regexp_replace(u, '[?&]+$', '', 'g') AS u FROM c2),
        |c4 AS (SELECT doc_id,
        |         regexp_replace(lower(regexp_extract(u, '^[a-zA-Z]+://[^/?#]*', 0)), ':(80|443)$', '', 'g')
        |         || regexp_replace(u, '^[a-zA-Z]+://[^/?#]*', '', 'g') AS u FROM c3),
        |c5 AS (SELECT doc_id, regexp_replace(u, '/+$', '', 'g') AS canonical_url FROM c4)
        |SELECT canonical_url, CAST(min(doc_id) AS BIGINT) AS keep_id,
        |       CAST(count(*) AS BIGINT) AS n_dups
        |FROM c5 GROUP BY canonical_url""".stripMargin),

    ("corpus_curriculum",
      (s: SparkSession, dir: String) => {
        val scored = TextAnalysis.quality(t(s, dir, "documents"), "text")
          .select(col("doc_id"), col("quality_score"))
        Corpus.curriculumBins(scored, "doc_id", "quality_score", nBins = 4)
      },
      // quantile_cont == Spark percentile (same (n-1)*p interpolation
      // over identical r6-rounded scores); bin = 1 + #cuts strictly below
      s"""WITH $textBCte,
         |$qualityCtes,
         |sc AS (SELECT doc_id, quality_score FROM qual),
         |cuts AS (SELECT quantile_cont(quality_score, [0.25, 0.5, 0.75]) AS c FROM sc)
         |SELECT doc_id, quality_score,
         |  CAST(1 + len(list_filter(c, x -> quality_score > x)) AS INT) AS bin
         |FROM sc, cuts""".stripMargin),

    ("corpus_mix_weighted",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // quality bucket from the standard scorer; the weight table
        // covers a few cells explicitly — including an explicit-zero
        // drop and a full-admission 1e6 cell — and everything else
        // falls to the 250000-ppm default, so the hit, miss, zero and
        // saturate paths are all inside the gate
        val scored = TextAnalysis.quality(t(s, dir, "documents"), "text")
          .select(col("doc_id"), col("source"),
            when(col("quality_score") >= 0.5, "high").otherwise("low").as("bucket"))
        val weights = Seq(
          ("src1", "high", 900000L), ("src1", "low", 100000L),
          ("src2", "high", 600000L), ("src3", "low", 0L),
          ("src4", "high", 1000000L)).toDF("source", "bucket", "weight_ppm")
        Corpus.mixWeightedSample(scored, "doc_id", "source", "bucket", weights,
          defaultPpm = 250000L)
      },
      s"""WITH $textBCte,
         |$qualityCtes,
         |sc AS (SELECT q.doc_id, d.source,
         |         CASE WHEN q.quality_score >= 0.5 THEN 'high' ELSE 'low' END AS bucket
         |       FROM qual q JOIN documents d USING (doc_id)),
         |w(source, bucket, weight_ppm) AS (VALUES
         |  ('src1', 'high', 900000), ('src1', 'low', 100000),
         |  ('src2', 'high', 600000), ('src3', 'low', 0), ('src4', 'high', 1000000)),
         |m AS (SELECT sc.doc_id, sc.source, sc.bucket,
         |        CAST(COALESCE(w.weight_ppm, 250000) AS BIGINT) AS weight_ppm
         |      FROM sc LEFT JOIN w ON sc.source = w.source AND sc.bucket = w.bucket)
         |SELECT doc_id, source, bucket, weight_ppm FROM m
         |WHERE ${rhSql("CAST(doc_id AS VARCHAR)")} % 1000000 < weight_ppm""".stripMargin),

    ("corpus_mix_temperature",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // the sources in testdata are uniform, so the gate synthesizes a
        // SKEWED domain from doc_id: k = floor((sqrt(8*(doc_id%45)+1)-1)/2)
        // gives domains s0..s8 with per-45-block counts 1..9 — integer
        // sqrt inputs whose boundary cases (8j+1 a perfect square) are
        // IEEE-exact in both engines. A NULL-domain fixture row pins the
        // documented exclusion path (unattributed rows have no mixture
        // cell). tau=0.5 upweights the small domains; nTarget=200 is
        // selective at the verify SF and above
        val base = t(s, dir, "documents").select(col("doc_id"),
          concat(lit("s"),
            floor((sqrt(((col("doc_id") % 45) * 8 + 1).cast("double")) - lit(1.0))
              / lit(2.0)).cast("int").cast("string")).as("mix_domain"))
          .union(Seq((99993L, Option.empty[String])).toDF("doc_id", "mix_domain"))
        Corpus.temperatureSample(base, "doc_id", "mix_domain",
          tau = 0.5, nTarget = 200L)
      },
      s"""WITH base AS (
         |  SELECT doc_id, 's' || CAST(CAST(FLOOR((sqrt(CAST((doc_id % 45) * 8 + 1 AS DOUBLE)) - 1) / 2) AS INT) AS VARCHAR) AS mix_domain
         |  FROM documents
         |  UNION ALL SELECT 99993, NULL),
         |attr AS (SELECT * FROM base WHERE mix_domain IS NOT NULL),
         |counts AS (SELECT mix_domain, CAST(count(*) AS BIGINT) AS c
         |           FROM attr GROUP BY mix_domain),
         |tot AS (SELECT sum(pow(c, 0.5)) AS t FROM counts),
         |quotas AS (SELECT mix_domain,
         |             least(c, CAST(floor(${Num.r6Sql("200.0 * " + Num.r6Sql("pow(c, 0.5) / t"))}) AS BIGINT)) AS quota
         |           FROM counts, tot),
         |ranked AS (SELECT a.doc_id, a.mix_domain, q.quota,
         |             row_number() OVER (PARTITION BY a.mix_domain
         |               ORDER BY ${rhSql("CAST(a.doc_id AS VARCHAR)")}, a.doc_id) AS rank_in_mix
         |           FROM attr a JOIN quotas q USING (mix_domain))
         |SELECT doc_id, mix_domain, quota, CAST(rank_in_mix AS INTEGER) AS rank_in_mix
         |FROM ranked WHERE rank_in_mix <= quota""".stripMargin),

    ("corpus_mix_temperature_edges",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // quota-formula edge matrix with LITERAL inputs (the
        // corpus_pack_edges pattern): a dominant domain (cap NOT
        // binding), a cap-binding small domain, a single-doc domain
        // whose share floors its quota to zero (absent from output),
        // and a NULL-domain row (excluded by contract). Counts: a=12,
        // b=4, c=1; tau=0.5, nTarget=6 -> shares ~0.536/0.309/0.155,
        // quotas floor(3.21)=3 / min(4, floor(1.85))=1 / floor(0.92)=0
        val rows = ((1L to 12L).map(i => (i, Option("a")))
          ++ (21L to 24L).map(i => (i, Option("b")))
          ++ Seq((31L, Option("c")), (40L, Option.empty[String])))
        val d = rows.toDF("doc_id", "mix_domain")
        Corpus.temperatureSample(d, "doc_id", "mix_domain",
          tau = 0.5, nTarget = 6L)
      }, {
        val ids = ((1L to 12L).map(i => s"($i, 'a')")
          ++ (21L to 24L).map(i => s"($i, 'b')")
          ++ Seq("(31, 'c')", "(40, NULL)")).mkString(", ")
        s"""WITH base(doc_id, mix_domain) AS (VALUES $ids),
           |attr AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, mix_domain
           |         FROM base WHERE mix_domain IS NOT NULL),
           |counts AS (SELECT mix_domain, CAST(count(*) AS BIGINT) AS c
           |           FROM attr GROUP BY mix_domain),
           |tot AS (SELECT sum(pow(c, 0.5)) AS t FROM counts),
           |quotas AS (SELECT mix_domain,
           |             least(c, CAST(floor(${Num.r6Sql("6.0 * " + Num.r6Sql("pow(c, 0.5) / t"))}) AS BIGINT)) AS quota
           |           FROM counts, tot),
           |ranked AS (SELECT a.doc_id, a.mix_domain, q.quota,
           |             row_number() OVER (PARTITION BY a.mix_domain
           |               ORDER BY ${rhSql("CAST(a.doc_id AS VARCHAR)")}, a.doc_id) AS rank_in_mix
           |           FROM attr a JOIN quotas q USING (mix_domain))
           |SELECT doc_id, mix_domain, quota, CAST(rank_in_mix AS INTEGER) AS rank_in_mix
           |FROM ranked WHERE rank_in_mix <= quota""".stripMargin
      }),

    ("corpus_pack",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // a NULL-text row rides along: octet_length(NULL) is NULL and the
        // operator's documented contract is NULL-packs-as-0 — the gate
        // pins that path, it doesn't just trust the scaladoc.
        // n = UTF-8 BYTE length, not a regex token count: `\s` class
        // membership (\x0B) and string_split_regex edge behavior vary
        // across regex engines and DuckDB releases, while byte length is
        // the same number everywhere — the operator under test packs
        // counts, it doesn't care where they came from
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
          .union(Seq((99991L, Option.empty[String])).toDF("doc_id", "text"))
          .select(col("doc_id"), octet_length(col("text")).cast("long").as("n"))
        Corpus.packSequences(d, "doc_id", "n", capacity = 256, nStreams = 8)
          .orderBy(col("doc"))
      },
      // same rolling-hash stream routing + per-stream running sum over
      // ne = greatest(coalesce(n,0),0) — the operator's NULL/negative
      // clamp; // is DuckDB integer division (Spark side uses `div`);
      // CAST(... AS BIGINT) on the window-sum-derived columns is
      // load-bearing: DuckDB's sum(BIGINT) OVER returns HUGEINT and //
      // preserves it, so uncast output hash-mismatches Spark's BIGINT
      // even when every value is equal (the rounds-8/9 red rows);
      // strlen = DuckDB byte length (octet_length only binds to BLOB);
      // canonical ORDER BY on BOTH sides defuses any order-sensitive
      // comparison downstream
      s"""WITH docs AS (SELECT doc_id, text FROM documents
         |              UNION ALL SELECT 99991, NULL),
         |d AS (SELECT doc_id,
         |        greatest(COALESCE(CAST(strlen(text) AS BIGINT), 0), 0) AS ne
         |      FROM docs),
         |st AS (SELECT doc_id, ne, ${rhSql("CAST(doc_id AS VARCHAR)")} % 8 AS stream FROM d),
         |o AS (SELECT *, COALESCE(sum(ne) OVER (PARTITION BY stream ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset FROM st)
         |SELECT doc_id AS doc, ne AS n_toks, stream,
         |       CAST(start_offset AS BIGINT) AS start_offset,
         |       CAST(start_offset // 256 AS BIGINT) AS seq_first,
         |       CAST(CASE WHEN ne > 0 THEN (start_offset + ne - 1) // 256
         |            ELSE start_offset // 256 END AS BIGINT) AS seq_last
         |FROM o ORDER BY doc""".stripMargin),

    ("corpus_pack_edges",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // operator edge matrix with LITERAL counts — no derived n at
        // all, so no engine pair can disagree about the input: NULL and
        // negative pack as 0 tokens (tape never rewinds), a doc exactly
        // at capacity ends in its own window, capacity+1 straddles two,
        // and a multi-window doc spans proportionally
        val d = Seq(
          (1L, Option(5L)), (2L, Option(0L)), (3L, Option.empty[Long]),
          (4L, Option(-7L)), (5L, Option(256L)), (6L, Option(257L)),
          (7L, Option(1L)), (8L, Option(1000L)), (9L, Option(255L)),
          (10L, Option(512L))).toDF("doc_id", "n")
        Corpus.packSequences(d, "doc_id", "n", capacity = 256, nStreams = 3)
          .orderBy(col("doc"))
      },
      s"""WITH v(doc_id, n) AS (VALUES (1, 5), (2, 0), (3, NULL), (4, -7),
         |  (5, 256), (6, 257), (7, 1), (8, 1000), (9, 255), (10, 512)),
         |d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |        greatest(COALESCE(CAST(n AS BIGINT), 0), 0) AS ne FROM v),
         |st AS (SELECT doc_id, ne, ${rhSql("CAST(doc_id AS VARCHAR)")} % 3 AS stream FROM d),
         |o AS (SELECT *, COALESCE(sum(ne) OVER (PARTITION BY stream ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset FROM st)
         |SELECT doc_id AS doc, ne AS n_toks, stream,
         |       CAST(start_offset AS BIGINT) AS start_offset,
         |       CAST(start_offset // 256 AS BIGINT) AS seq_first,
         |       CAST(CASE WHEN ne > 0 THEN (start_offset + ne - 1) // 256
         |            ELSE start_offset // 256 END AS BIGINT) AS seq_last
         |FROM o ORDER BY doc""".stripMargin),

    ("corpus_pack_segments",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // the writer view over the same pack plumbing as corpus_pack
        // (byte-length counts, NULL fixture row — which must vanish
        // here: zero-token docs occupy no window); integer-only
        // arithmetic, canonical ORDER BY on both sides
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
          .union(Seq((99991L, Option.empty[String])).toDF("doc_id", "text"))
          .select(col("doc_id"), octet_length(col("text")).cast("long").as("n"))
        Corpus.packedSegments(
          Corpus.packSequences(d, "doc_id", "n", capacity = 256, nStreams = 8),
          capacity = 256)
          .orderBy(col("doc"), col("seq"))
      },
      s"""WITH docs AS (SELECT doc_id, text FROM documents
         |              UNION ALL SELECT 99991, NULL),
         |d AS (SELECT doc_id,
         |        greatest(COALESCE(CAST(strlen(text) AS BIGINT), 0), 0) AS ne
         |      FROM docs),
         |st AS (SELECT doc_id, ne, ${rhSql("CAST(doc_id AS VARCHAR)")} % 8 AS stream FROM d),
         |o AS (SELECT *, COALESCE(sum(ne) OVER (PARTITION BY stream ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset FROM st),
         |p AS (SELECT doc_id AS doc, ne AS n_toks, stream,
         |        CAST(start_offset AS BIGINT) AS start_offset,
         |        CAST(start_offset // 256 AS BIGINT) AS seq_first,
         |        CAST((start_offset + ne - 1) // 256 AS BIGINT) AS seq_last
         |      FROM o WHERE ne > 0),
         |seg AS (SELECT stream, unnest(generate_series(seq_first, seq_last)) AS seq,
         |          doc, start_offset, n_toks
         |        FROM p)
         |SELECT stream, seq, doc,
         |       greatest(0, start_offset - seq * 256) AS seg_off,
         |       least((seq + 1) * 256, start_offset + n_toks)
         |         - greatest(seq * 256, start_offset) AS seg_len
         |FROM seg ORDER BY doc, seq""".stripMargin),

    ("corpus_batch_by_length",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // SFT batch assembly over byte-length counts (same engine-safe
        // n as corpus_pack); the NULL fixture row clamps to 0 and must
        // land in bucket 0, position 0 of some batch — not vanish
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
          .union(Seq((99991L, Option.empty[String])).toDF("doc_id", "text"))
          .select(col("doc_id"), octet_length(col("text")).cast("long").as("n"))
        Corpus.batchByLength(d, "doc_id", "n",
          bucketBounds = Seq(128L, 256L, 512L), batchSize = 4, nStreams = 8)
          .orderBy(col("doc"))
      },
      s"""WITH docs AS (SELECT doc_id, text FROM documents
         |              UNION ALL SELECT 99991, NULL),
         |d AS (SELECT doc_id,
         |        COALESCE(CAST(strlen(text) AS BIGINT), 0) AS n FROM docs),
         |b AS (SELECT doc_id, n,
         |        CASE WHEN n < 128 THEN 0 WHEN n < 256 THEN 1
         |             WHEN n < 512 THEN 2 ELSE 3 END AS bucket,
         |        ${rhSql("CAST(doc_id AS VARCHAR)")} % 8 AS stream FROM d),
         |r AS (SELECT *, row_number() OVER (PARTITION BY bucket, stream
         |        ORDER BY doc_id) AS rn FROM b)
         |SELECT doc_id AS doc, n AS n_toks, bucket, stream,
         |       CAST((rn - 1) // 4 AS INT) AS batch_idx,
         |       CAST((rn - 1) % 4 AS INT) AS pos_in_batch
         |FROM r ORDER BY doc""".stripMargin),

    ("corpus_filter",
      (s: SparkSession, dir: String) =>
        Corpus.trainingFilter(t(s, dir, "documents"), "doc_id", "text",
          minQuality = 0.5, lang = "en"),
      s"""WITH $textBCte,
         |$qualityCtes,
         |$langCtes,
         |k AS (SELECT text, CAST(min(doc_id) AS BIGINT) AS keep_id,
         |             CAST(count(*) AS BIGINT) AS n_dups FROM documents GROUP BY text)
         |SELECT d.doc_id, lang_pred, quality_score, n_dups
         |FROM documents d JOIN k ON d.text IS NOT DISTINCT FROM k.text AND d.doc_id = k.keep_id
         |JOIN qual ON qual.doc_id = d.doc_id JOIN lang ON lang.doc_id = d.doc_id
         |WHERE lang_pred = 'en' AND quality_score >= 0.5""".stripMargin),

    // ---- multimodal plumbing ---------------------------------------------
    ("multimodal_features",
      (s: SparkSession, dir: String) =>
        Multimodal.extractFeatures(s,
          Multimodal.attachPayload(withNonAsciiDocs(s, dir), "doc_id", "text")).toDF(),
      {
        // all features read the UTF-8 BYTE list (utf8BytesSql), exactly
        // what Spark's payload holds — ascii()/substr() per CHARACTER
        // would diverge on the non-ASCII fixture rows
        val mean = Num.r6Sql(
          "CASE WHEN len(b) = 0 THEN 0.0 ELSE CAST(list_reduce(b, (a, x) -> a + x) AS DOUBLE) / CAST(len(b) AS DOUBLE) END")
        s"""WITH docs AS (SELECT doc_id, text FROM documents $nonAsciiUnionSql),
           |bd AS (SELECT doc_id, ${utf8BytesSql("text")} AS b FROM docs)
           |SELECT doc_id AS id, CAST(len(b) AS BIGINT) AS n_bytes,
           |  CAST(CASE WHEN len(b) > 0 THEN b[1] ELSE 0 END AS INT) AS width,
           |  CAST(CASE WHEN len(b) > 1 THEN b[2] ELSE 0 END AS INT) AS height,
           |  $mean AS mean_byte
           |FROM bd""".stripMargin
      }),

    ("multimodal_dispatch",
      (s: SparkSession, dir: String) =>
        Multimodal.dispatchFeatures(s,
          Multimodal.attachMixedPayload(withNonAsciiDocs(s, dir), "doc_id", "text")).toDF(),
      {
        // byte-list formulation (utf8BytesSql): Spark reads PAYLOAD
        // BYTES, and the non-ASCII fixture rows would expose any
        // per-character ascii()/strlen() shortcut
        val mean = Num.r6Sql(
          "CASE WHEN len(b) = 0 THEN 0.0 ELSE CAST(list_reduce(b, (a, x) -> a + x) AS DOUBLE) / CAST(len(b) AS DOUBLE) END")
        s"""WITH docs AS (SELECT doc_id, text FROM documents $nonAsciiUnionSql),
           |bd AS (SELECT doc_id, ${utf8BytesSql("text")} AS b FROM docs)
           |SELECT doc_id AS id,
           |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           |  CAST(len(b) AS BIGINT) AS n_bytes,
           |  CASE doc_id % 3
           |    WHEN 0 THEN CAST((CASE WHEN len(b) > 0 THEN b[1] ELSE 0 END)
           |                   * (CASE WHEN len(b) > 1 THEN b[2] ELSE 0 END) AS DOUBLE)
           |    WHEN 1 THEN $mean
           |    ELSE CAST(len(b) AS DOUBLE) END AS feature
           |FROM bd""".stripMargin
      }),

    ("multimodal_frames",
      (s: SparkSession, dir: String) =>
        Multimodal.frameFeatures(Multimodal.sampleFrames(s,
          Multimodal.attachPayload(withNonAsciiDocs(s, dir), "doc_id", "text"),
          frameBytes = 64, stride = 2)).toDF(),
      {
        // frames slice the BYTE list, not the character string: a
        // multi-byte char on a 64-byte boundary splits across frames on
        // the Spark side, and the oracle must split it identically
        val mean = Num.r6Sql(
          "CAST(list_reduce(blk, (a, x) -> a + x) AS DOUBLE) / CAST(len(blk) AS DOUBLE)")
        s"""WITH docs AS (SELECT doc_id, text FROM documents $nonAsciiUnionSql),
           |bd AS (SELECT doc_id, ${utf8BytesSql("text")} AS b FROM docs),
           |f AS (SELECT doc_id, b,
           |        unnest(generate_series(0, CAST((len(b) - 1) // 64 AS INT))) AS fi
           |      FROM bd),
           |blks AS (SELECT doc_id, fi, list_slice(b, fi * 64 + 1, fi * 64 + 64) AS blk
           |         FROM f WHERE fi % 2 = 0)
           |SELECT doc_id AS id, CAST(fi AS INT) AS frame_idx,
           |       CAST(len(blk) AS BIGINT) AS n_bytes, $mean AS mean_byte
           |FROM blks""".stripMargin
      }),

    ("multimodal_decode_png",
      (s: SparkSession, dir: String) => {
        // REAL compressed PNGs (encoded in executors from the id) decoded
        // back through javax.imageio at the codec boundary: width/height
        // come from the actual header, mean_pixel from the actual raster.
        // n_bytes is dropped from the gate (PNG encoder output size is
        // implementation-defined); a spec asserts it is > 0
        val ids = t(s, dir, "documents").filter(col("doc_id") <= 30)
        Multimodal.extractFeatures(s,
          Multimodal.attachPngPayload(s, ids, "doc_id")).toDF()
          .select(col("id"), col("width"), col("height"),
            col("mean_byte").as("mean_pixel"))
      },
      // closed form of the synthesized raster: w=1+id%7, h=1+id%5, pixel
      // (0,0) colored (id,2id,3id)%251, the rest gray g=id%251 ->
      // 3-channel mean = (3g*(wh-1) + r0+g0+b0) / (3wh)
      s"""WITH d AS (SELECT doc_id, 1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h,
         |             doc_id % 251 AS g,
         |             doc_id % 251 + (2 * doc_id) % 251 + (3 * doc_id) % 251 AS c0
         |           FROM documents WHERE doc_id <= 30)
         |SELECT doc_id AS id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |  ${Num.r6Sql("CAST(3 * g * (w * h - 1) + c0 AS DOUBLE) / CAST(3 * w * h AS DOUBLE)")} AS mean_pixel
         |FROM d""".stripMargin),

    ("multimodal_decode_gif",
      (s: SparkSession, dir: String) => {
        // REAL GIFs (JDK-native codec). The synthetic raster has at
        // most two distinct colors, so the palette-indexed encode is
        // LOSSLESS and the gate covers the decoded raster mean exactly,
        // like PNG — a fake-decoder fall-through would read the 'GI'
        // magic as w=71, h=73, never 1..7 x 1..5
        val ids = t(s, dir, "documents").filter(col("doc_id") <= 30)
        Multimodal.extractFeatures(s,
          Multimodal.attachGifPayload(s, ids, "doc_id")).toDF()
          .select(col("id"), col("width"), col("height"),
            col("mean_byte").as("mean_pixel"))
      },
      s"""WITH d AS (SELECT doc_id, 1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h,
         |             doc_id % 251 AS g,
         |             doc_id % 251 + (2 * doc_id) % 251 + (3 * doc_id) % 251 AS c0
         |           FROM documents WHERE doc_id <= 30)
         |SELECT doc_id AS id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |  ${Num.r6Sql("CAST(3 * g * (w * h - 1) + c0 AS DOUBLE) / CAST(3 * w * h AS DOUBLE)")} AS mean_pixel
         |FROM d""".stripMargin),

    ("multimodal_decode_jpeg",
      (s: SparkSession, dir: String) => {
        // REAL JPEGs (JDK-native codec) round-tripped through ImageIO.
        // JPEG headers carry exact dims but the raster is LOSSY, so the
        // hash gate covers id/width/height only — and dims still prove
        // the real decode path ran: a fall-through to the fake decoder
        // would read the FFD8 magic as w=255, h=216, never 1..7 x 1..5.
        // The raster mean is checked with a tolerance bound in
        // DedupSimilaritySpec
        val ids = t(s, dir, "documents").filter(col("doc_id") <= 30)
        Multimodal.extractFeatures(s,
          Multimodal.attachJpegPayload(s, ids, "doc_id")).toDF()
          .select(col("id"), col("width"), col("height"))
      },
      """SELECT doc_id AS id, CAST(1 + doc_id % 7 AS INT) AS width,
        |       CAST(1 + doc_id % 5 AS INT) AS height
        |FROM documents WHERE doc_id <= 30""".stripMargin),

    ("multimodal_decode_wav",
      (s: SparkSession, dir: String) => {
        // REAL RIFF/WAVE PCM (encoded in executors from the id) decoded
        // back through javax.sound.sampled at the codec boundary: sample
        // rate + channels from the parsed format, frame count from the
        // bytes actually read, mean |sample| from the actual PCM — a
        // fall-through to the fake decoder emits sample_rate = 0, never
        // 8000/16000/24000, and frame 0 carries a different sample value
        // than the rest so a header-only "decode" cannot match either.
        // n_bytes is dropped from the gate (container size is
        // writer-defined); a spec asserts it exceeds the 44-byte header
        val ids = t(s, dir, "documents").filter(col("doc_id") <= 40)
        Multimodal.extractAudioFeatures(s,
          Multimodal.attachWavPayload(s, ids, "doc_id")).toDF()
      },
      // closed form of the synthesized PCM: sr = 8000*(1+id%3),
      // ch = 1+id%2, nf = 8+id%25, frame 0 = (id*53)%101-50, the rest
      // (id*37)%101-50; every channel repeats the frame value, so the
      // 1-or-2 channel factor cancels exactly in IEEE division and
      // mean_abs = (|b0| + (nf-1)*|a|) / nf
      s"""WITH d AS (SELECT doc_id, 8000 * (1 + doc_id % 3) AS sr,
         |             1 + doc_id % 2 AS ch, 8 + doc_id % 25 AS nf,
         |             abs((doc_id * 53) % 101 - 50) AS b0,
         |             abs((doc_id * 37) % 101 - 50) AS a
         |           FROM documents WHERE doc_id <= 40)
         |SELECT doc_id AS id, CAST(sr AS INT) AS sample_rate,
         |  CAST(ch AS INT) AS channels, CAST(nf AS BIGINT) AS n_frames,
         |  ${Num.r6Sql("CAST(nf AS DOUBLE) / CAST(sr AS DOUBLE)")} AS duration_sec,
         |  ${Num.r6Sql("CAST(b0 + (nf - 1) * a AS DOUBLE) / CAST(nf AS DOUBLE)")} AS mean_abs
         |FROM d""".stripMargin),

    ("multimodal_resize",
      (s: SparkSession, dir: String) =>
        Multimodal.resizeDims(Multimodal.extractFeatures(s,
          Multimodal.attachPayload(withNonAsciiDocs(s, dir), "doc_id", "text")),
          maxW = 100, maxH = 80).toDF(),
      s"""WITH docs AS (SELECT doc_id, text FROM documents $nonAsciiUnionSql),
         |bd AS (SELECT doc_id, ${utf8BytesSql("text")} AS b FROM docs),
         |d AS (SELECT doc_id AS id,
         |        CAST(CASE WHEN len(b) > 0 THEN b[1] ELSE 0 END AS INT) AS width,
         |        CAST(CASE WHEN len(b) > 1 THEN b[2] ELSE 0 END AS INT) AS height
         |      FROM bd),
         |g AS (SELECT *, greatest(CAST(width AS BIGINT), 1) AS w,
         |        greatest(CAST(height AS BIGINT), 1) AS h FROM d),
         |sc AS (SELECT *, least(1000, least(100 * 1000 // w, 80 * 1000 // h)) AS s FROM g)
         |SELECT id, width, height,
         |       CAST(w * s // 1000 AS INT) AS out_w, CAST(h * s // 1000 AS INT) AS out_h
         |FROM sc""".stripMargin))

  // ------------------------------------------------------------ driver API

  /** Flagship query on sf=0.001: the view chain + double self-join extract
    * composed end-to-end; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val base = viewFlagship(spark, dir)
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    Extract.extract(base, Seq(
      "first_order" -> (Extract.Lookup(orders, "c_custkey", "o_custkey",
        Seq("o_orderkey" -> "first_order")): Extract.Extractor),
      "has_order" -> Extract.ExprField(Seq("first_order"),
        _ => col("first_order").isNotNull)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, f, _) => n -> f }.toMap

  def oracleSql: Map[String, String] =
    registry.map { case (n, _, sql) => n -> sql }.toMap
}
