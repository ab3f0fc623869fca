package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{EtlLeaf, EtlObj, EtlSchema}
import graft.ops._
import graft.llm._
import GateSupport._

/** File/XML/XSLT/JDBC source gates plus event-stream batch twins (windows, sessionize, funnel, as-of, rollup/cube).
  *
  * One registry entry per operator: (name, spark fn, oracle SQL) —
  * composed into [[SparkEntry.queries]]/[[SparkEntry.oracleSql]].
  */
private[graft] object SourceEventGates {
  val all: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
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

    ("source_orc",
      (s: SparkSession, dir: String) => {
        // ORC sink + source round-trip (Spark-native columnar format a
        // lake migration reads alongside parquet): write the nation
        // dimension as ORC to a temp dir, read it back through the ORC
        // reader. Types must survive the round trip exactly (int64 /
        // string) for the hash to match the parquet oracle; the write
        // is the sink test, the read-back is the source test. FIXED
        // per-fixture scratch path (keyed by the dir digest, mode
        // overwrite) — a fresh createTempDirectory per invocation
        // leaked one directory per bench/verify sweep forever.
        val tmp = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_orc_${dirSuffix(dir)}").toString
        val n = t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        n.write.mode("overwrite").orc(tmp)
        // schema pinned on read: an all-empty write leaves no part file
        // to infer from (and production readers pin schemas anyway)
        s.read.schema(n.schema).orc(tmp)
      },
      "SELECT n_nationkey, n_name, n_regionkey FROM nation"),

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

    ("events_decayed_sum",
      (s: SparkSession, dir: String) =>
        // recency-weighted value sums per event type: bucketed
        // exponential decay (weight halves per elapsed halflife) —
        // integer k makes every weight a dyadic rational, so
        // cents·2^(40−k) sums EXACTLY in any order (DECIMAL/HUGEINT)
        // and only the final division touches floats
        graft.streaming.EventStream.decayedSum(
          events(s, dir), "ts", "value", Seq("event_type"), halflifeDays = 7),
      {
        val pow2 = Retrieval.litSql(math.pow(2.0d, 40.0d))
        s"""WITH e AS (SELECT event_type,
           |             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cc,
           |             CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS d
           |           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
           |mx AS (SELECT max(d) AS ref FROM e),
           |n AS (SELECT event_type,
           |        CAST(cc AS HUGEINT) *
           |          (CAST(1 AS BIGINT) << CAST(40 - least(date_diff('day', d, (SELECT ref FROM mx)) // 7, 40) AS INT)) AS num
           |      FROM e),
           |s AS (SELECT event_type, sum(num) AS num FROM n GROUP BY event_type)
           |SELECT event_type,
           |  ${Num.r6Sql(s"CAST(num AS DOUBLE) / $pow2 / 100.0")} AS decayed_sum
           |FROM s""".stripMargin
      }),

    ("events_window_agg",
      (s: SparkSession, dir: String) =>
        events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), min(col("value")).as("min_value"),
            max(col("value")).as("max_value")),
      """SELECT date_trunc('hour', make_timestamp(epoch_ns(ts) // 1000)) AS hour, event_type,
        |       CAST(count(*) AS BIGINT) AS n, min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2""".stripMargin),

    ("events_window_sliding",
      (s: SparkSession, dir: String) =>
        // SLIDING windows (1 h wide, 15 min slide): each event lands in
        // exactly 4 overlapping windows — Spark's window() explodes
        // them; the oracle derives the same 4 epoch-aligned starts
        // arithmetically. Value sums as integer cents (the money
        // idiom), so overlap never compounds float noise
        events(s, dir)
          .select(window(col("ts"), "1 hour", "15 minutes").as("w"),
            col("event_type"), col("value"))
          .groupBy(col("w.start").as("window_start"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("sum_cents")),
      """WITH e AS (SELECT event_type, make_timestamp(epoch_ns(ts) // 1000) AS ts, value
        |           FROM events),
        |w AS (SELECT event_type, value,
        |        make_timestamp(((CAST(floor(epoch(ts) / 900) AS BIGINT) - j.j) * 900) * 1000000) AS window_start
        |      FROM e, generate_series(0, 3) j(j))
        |SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM w GROUP BY window_start, event_type""".stripMargin),

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

    ("load_scd2",
      (s: SparkSession, dir: String) =>
        // SCD2 history build from the event change log: one version row
        // per user_id per event_type CHANGE, validity interval = [this
        // change, next change), open-ended current row — the warehouse
        // twin of load_cdc_apply (which folds to latest state only).
        // Null-safe change detection (IS DISTINCT FROM semantics on
        // both engines); duplicate (key, ts) rows collapse
        // deterministically to the smallest value first
        Load.scd2History(events(s, dir), "user_id", "ts", Seq("event_type")),
      """WITH e AS (SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type
        |           FROM events WHERE ts IS NOT NULL),
        |b AS (SELECT user_id, ts, event_type FROM (
        |        SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |                                     ORDER BY event_type NULLS FIRST) AS rn
        |        FROM e) WHERE rn = 1),
        |ch AS (SELECT user_id, ts, event_type FROM (
        |        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts) AS idx,
        |               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS pv
        |        FROM b) WHERE idx = 1 OR event_type IS DISTINCT FROM pv)
        |SELECT user_id, event_type, ts AS valid_from,
        |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
        |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL AS is_current
        |FROM ch""".stripMargin),

    ("load_scd2_asof",
      (s: SparkSession, dir: String) => {
        // point-in-time lookup against the SCD2 version table — the
        // natural consumer of load_scd2: each fact resolves the version
        // whose validity interval contains its timestamp. Expressed as
        // the AsOfJoin against (user_id, valid_from): for an SCD2 table
        // the last version STARTING at-or-before ts IS the interval
        // match (valid_from ≤ ts < valid_to — intervals partition time
        // per key), and asOf's tie rule (right rows sort before left at
        // equal ts) lands a fact AT a boundary in the NEW version,
        // exactly the half-open contract. The oracle is deliberately
        // the independent formulation — a DuckDB RANGE join on the
        // interval predicate — so the hash match proves the
        // asOf-equals-interval-lookup claim, not just determinism.
        // Probe facts: every event (change-log events land exactly ON
        // version boundaries — the boundary battery) plus early probes
        // shifted 1000 days before any version (LEFT semantics: null
        // version).
        val e = events(s, dir)
        val hist = Load.scd2History(e, "user_id", "ts", Seq("event_type"))
        val facts = e.select(col("event_id").cast("long").as("event_id"),
            col("user_id"), col("ts"))
          .unionByName(e.filter(col("event_id") < 50)
            .select((col("event_id").cast("long") + 1000000L).as("event_id"),
              col("user_id"),
              (col("ts") - expr("INTERVAL 1000 DAYS")).as("ts")))
        AsOfJoin.asOf(facts,
          hist.select(col("user_id"), col("valid_from").as("ts"),
            col("event_type").as("etype_asof")),
          "user_id", "ts", Seq("etype_asof" -> "etype_asof"))
      },
      """WITH e AS (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type
        |           FROM events),
        |en AS (SELECT user_id, ts, event_type FROM e WHERE ts IS NOT NULL),
        |b AS (SELECT user_id, ts, event_type FROM (
        |        SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |                                     ORDER BY event_type NULLS FIRST) AS rn
        |        FROM en) WHERE rn = 1),
        |ch AS (SELECT user_id, ts, event_type FROM (
        |        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts) AS idx,
        |               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS pv
        |        FROM b) WHERE idx = 1 OR event_type IS DISTINCT FROM pv),
        |v AS (SELECT user_id, event_type, ts AS valid_from,
        |             lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
        |      FROM ch),
        |f AS (SELECT CAST(event_id AS BIGINT) AS event_id, user_id, ts FROM e
        |      UNION ALL
        |      SELECT CAST(event_id + 1000000 AS BIGINT), user_id,
        |             ts - INTERVAL 1000 DAY
        |      FROM e WHERE event_id < 50)
        |SELECT f.event_id, f.user_id, f.ts, v.event_type AS etype_asof
        |FROM f LEFT JOIN v ON f.user_id = v.user_id AND v.valid_from <= f.ts
        |                  AND (f.ts < v.valid_to OR v.valid_to IS NULL)""".stripMargin),

    ("load_stream_exactly_once",
      (s: SparkSession, dir: String) => {
        // exactly-once streaming ingest into the bucketed log: the
        // events table arrives as four foreachBatch deliveries with
        // batch 1 RE-DELIVERED (Structured Streaming's at-least-once
        // replay after failure); the commit-log sidecar makes the
        // duplicate a no-op, so the aggregate over the log equals the
        // aggregate over the plain table — which is exactly what the
        // shared-style oracle checks (a doubled batch would shift every
        // count and sum). StreamingSpec drives the same sink from a
        // real MemoryStream with a replayed batch id.
        val table = s"graft_evlog_${dirSuffix(dir)}"
        Bucketing.dropManaged(s, table)
        Bucketing.dropManaged(s, s"${table}_commits")
        val e = events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        val deliver = graft.streaming.BucketedLogSink.sink(table, "user_id", 8)
        deliver(e.filter(pmod(col("event_id"), lit(3)) === 0), 0L)
        deliver(e.filter(pmod(col("event_id"), lit(3)) === 1), 1L)
        deliver(e.filter(pmod(col("event_id"), lit(3)) === 1), 1L) // replayed
        deliver(e.filter(pmod(col("event_id"), lit(3)) === 2), 2L)
        // the append-only log has accumulated one file per (batch,
        // bucket): compact to one file per bucket — a per-bucket local
        // rewrite (forced bucketed scan, no exchange) that must be
        // content-neutral, which the shared oracle then checks
        Bucketing.compactBucketed(s, table, "user_id")
        s.table(table).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("sum_cents"))
      },
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY event_type""".stripMargin),

    ("load_stream_snapshot",
      (s: SparkSession, dir: String) => {
        // reproducible snapshot reads of the ingest log: every appended
        // row is stamped with its batch id, so "the corpus AS OF batch
        // 1" is a narrow filter (parquet min/max stats skip newer batch
        // files) — the training-reproducibility primitive. Three
        // deliveries land, the snapshot reads only the first two; the
        // oracle aggregates exactly those source rows, so a snapshot
        // that leaked batch 2 (or dropped part of batch 1) cannot pass.
        val table = s"graft_evsnap_${dirSuffix(dir)}"
        Bucketing.dropManaged(s, table)
        Bucketing.dropManaged(s, s"${table}_commits")
        val e = events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        val deliver = graft.streaming.BucketedLogSink.sink(table, "user_id", 8)
        deliver(e.filter(pmod(col("event_id"), lit(3)) === 0), 0L)
        deliver(e.filter(pmod(col("event_id"), lit(3)) === 1), 1L)
        deliver(e.filter(pmod(col("event_id"), lit(3)) === 2), 2L)
        graft.streaming.BucketedLogSink.asOf(s, table, 1L)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("sum_cents"))
      },
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events WHERE event_id % 3 IN (0, 1) GROUP BY event_type""".stripMargin),

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

    ("load_cdc_apply",
      (s: SparkSession, dir: String) => {
        // CDC change log replayed onto the customer snapshot: seq 1
        // upserts every 7th key, seq 2 re-upserts every 14th (latest
        // wins over seq 1), seq 3 deletes every 21st (tombstone wins
        // over both), seq 4 re-inserts every 28th (upsert AFTER a
        // delete at %84 — the delete must not win then), plus brand-new
        // keys. Per key only the max-seq change survives, via
        // map-side-partial max_by — no window, no per-key sort.
        val base = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val k = col("c_custkey")
        val changes = base.filter(k % 7 === 0)
          .select(k, lit(1L).as("seq"), lit("U").as("op"), col("c_name"),
            (col("c_acctbal") + 500.0).as("c_acctbal"))
          .unionByName(base.filter(k % 14 === 0)
            .select(k, lit(2L).as("seq"), lit("U").as("op"),
              concat(lit("Upd#"), col("c_name")).as("c_name"),
              (col("c_acctbal") - 250.0).as("c_acctbal")))
          .unionByName(base.filter(k % 21 === 0)
            .select(k, lit(3L).as("seq"), lit("D").as("op"),
              lit(null).cast("string").as("c_name"),
              lit(null).cast("double").as("c_acctbal")))
          .unionByName(base.filter(k % 28 === 0)
            .select(k, lit(4L).as("seq"), lit("U").as("op"),
              concat(lit("Re#"), col("c_name")).as("c_name"),
              lit(1.0).as("c_acctbal")))
          .unionByName(base.filter(k <= 5)
            .select((k + 800000L).as("c_custkey"), lit(1L).as("seq"),
              lit("U").as("op"), concat(lit("New#"), col("c_name")).as("c_name"),
              col("c_acctbal")))
        Load.applyChangeLog(base, changes, "c_custkey", "seq", "op")
      },
      """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |ch AS (
        |  SELECT c_custkey, 1 AS seq, 'U' AS op, c_name,
        |         c_acctbal + 500.0 AS c_acctbal FROM base WHERE c_custkey % 7 = 0
        |  UNION ALL SELECT c_custkey, 2, 'U', 'Upd#' || c_name, c_acctbal - 250.0
        |    FROM base WHERE c_custkey % 14 = 0
        |  UNION ALL SELECT c_custkey, 3, 'D', NULL, NULL
        |    FROM base WHERE c_custkey % 21 = 0
        |  UNION ALL SELECT c_custkey, 4, 'U', 'Re#' || c_name, 1.0
        |    FROM base WHERE c_custkey % 28 = 0
        |  UNION ALL SELECT c_custkey + 800000, 1, 'U', 'New#' || c_name, c_acctbal
        |    FROM base WHERE c_custkey <= 5),
        |latest AS (SELECT c_custkey, op, c_name, c_acctbal FROM (
        |    SELECT ch.*, row_number() OVER (PARTITION BY c_custkey
        |                                    ORDER BY seq DESC) AS rn FROM ch)
        |  WHERE rn = 1)
        |SELECT b.c_custkey, b.c_name, b.c_acctbal FROM base b
        |WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.c_custkey = b.c_custkey)
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal FROM latest WHERE op <> 'D'""".stripMargin),

    ("events_retention",
      (s: SparkSession, dir: String) =>
        // weekly cohort retention matrix over the events stream —
        // cohort = week of first activity, cells = distinct active
        // users at each later week offset
        graft.streaming.EventStream.cohortRetention(events(s, dir), "user_id", "ts"),
      """WITH e AS (SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
        |w AS (SELECT DISTINCT user_id,
        |        CAST(date_trunc('week', ts) AS TIMESTAMP) AS week FROM e),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id)
        |SELECT c.cohort_week,
        |       CAST(date_diff('day', CAST(c.cohort_week AS DATE), CAST(w.week AS DATE)) // 7 AS INT) AS week_offset,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM w JOIN c ON w.user_id = c.user_id
        |GROUP BY c.cohort_week, week_offset""".stripMargin),

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
  )
}
