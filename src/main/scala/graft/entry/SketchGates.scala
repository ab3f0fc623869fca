package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Num
import graft.ops.{Incremental, Layout, Profile, Prune, Sketch}
import GateSupport._

/** Sketch / layout / incremental-maintenance gates — the profiling and
  * physical-design surface of the engine (approximate distinct,
  * frequency estimation, Z-order clustering, mergeable aggregate state,
  * bloom-pruned joins). Every gate's oracle runs the IDENTICAL
  * deterministic arithmetic in DuckDB (md5-derived hashes, exact dyadic
  * sums, the r6 grid), so the driver's hash gate pins the estimators
  * bit-for-bit, not just "approximately".
  */
private[graft] object SketchGates {

  /** The d count-min hash rows as a SQL VALUES list `(i, a, b)`. */
  private def cmPermsSql: String =
    Sketch.cmConstants.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")

  /** CTE chain `{p}sk → {p}es(g, est)` — the per-group HLL estimate of
    * distinct `l_orderkey` over lineitem rows passing `where`, the
    * identical arithmetic as the hll gates (60-bit md5 hash, m=256,
    * ρ-capped dyadic sums, linear-counting branch), r6-rounded.
    */
  private def hllEstCtes(p: String, where: String): String = {
    val alpha = s"CAST(${Sketch.HllAlpha} AS DOUBLE)"
    s"""${p}h AS (SELECT l_returnflag AS g,
       |    CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM lineitem $where),
       |${p}sk AS (SELECT g, (h & 255) AS bucket,
       |         max(least(53 - length(bin(h >> 8)), 40)) AS m_rho
       |       FROM ${p}h GROUP BY g, (h & 255)),
       |${p}ag AS (SELECT g, count(*) AS present,
       |         sum(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << m_rho) AS DOUBLE)) AS sinv
       |       FROM ${p}sk GROUP BY g),
       |${p}es AS (SELECT g,
       |  ${Num.r6Sql("CASE WHEN raw <= 256.0 * 2.5 AND v > 0 THEN 256.0 * ln(256.0 / v) ELSE raw END")} AS est
       |  FROM (SELECT g, $alpha * 256.0 * 256.0 / ((256.0 - present) + sinv) AS raw,
       |               256 - present AS v FROM ${p}ag))""".stripMargin
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(

    ("sketch_hll_distinct",
      (s: SparkSession, dir: String) => {
        // per-group approximate distinct orders per return flag, with
        // the exact count as the in-row witness: at 100 TB the sketch
        // side shuffles ≤ 256 registers per group per partition while
        // count(DISTINCT) shuffles every distinct key
        val li = t(s, dir, "lineitem")
        val est = Sketch.hllDistinct(li, "l_orderkey", Seq("l_returnflag"))
        val exact = li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
        est.join(exact, "l_returnflag")
          .select(col("l_returnflag"), col("est_distinct"), col("exact_distinct"))
      },
      {
        // identical HLL arithmetic: 60-bit md5 hash, m=256 registers,
        // ρ capped at 40 (every 2^-ρ term a dyadic ≥ 2^-40, so the sum
        // is exact and order-independent), integer-shift powers of two
        // (no libm pow), linear-counting branch below 2.5m
        val alpha = s"CAST(${Sketch.HllAlpha} AS DOUBLE)"
        s"""WITH h AS (SELECT l_returnflag AS g,
           |    CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
           |  FROM lineitem),
           |hb AS (SELECT g, (h & 255) AS bucket,
           |         least(53 - length(bin(h >> 8)), 40) AS rho FROM h),
           |sk AS (SELECT g, bucket, max(rho) AS m_rho FROM hb GROUP BY g, bucket),
           |ag AS (SELECT g, count(*) AS present,
           |         sum(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << m_rho) AS DOUBLE)) AS sinv
           |       FROM sk GROUP BY g),
           |es AS (SELECT g, $alpha * 256.0 * 256.0 / ((256.0 - present) + sinv) AS raw,
           |         256 - present AS v FROM ag),
           |ex AS (SELECT l_returnflag AS g, count(DISTINCT l_orderkey) AS exact_distinct
           |       FROM lineitem GROUP BY 1)
           |SELECT es.g AS l_returnflag,
           |  ${Num.r6Sql("CASE WHEN raw <= 256.0 * 2.5 AND v > 0 THEN 256.0 * ln(256.0 / v) ELSE raw END")} AS est_distinct,
           |  CAST(ex.exact_distinct AS BIGINT) AS exact_distinct
           |FROM es JOIN ex ON es.g = ex.g""".stripMargin
      }),

    ("sketch_hll_merged",
      (s: SparkSession, dir: String) => {
        // the MERGE path under the oracle: registers built per "daily
        // batch" (orderkey parity) and combined bucket-wise — register
        // merge is max, idempotent and overlap-safe, so the estimate is
        // BIT-IDENTICAL to the one-shot sketch and the one-shot oracle
        // covers it verbatim (the same pay-off agg_incremental_merge and
        // sketch_quantile_hist pin for their state kinds: re-aggregable
        // across days without raw data)
        val li = t(s, dir, "lineitem")
        val shards = Seq(0, 1).map(p =>
          Sketch.hllRegisters(li.filter(pmod(col("l_orderkey"), lit(2)) === p),
            "l_orderkey", Seq("l_returnflag")))
        Sketch.hllEstimate(Sketch.hllMerge(shards, Seq("l_returnflag")),
          Seq("l_returnflag"))
      },
      {
        val alpha = s"CAST(${Sketch.HllAlpha} AS DOUBLE)"
        s"""WITH h AS (SELECT l_returnflag AS g,
           |    CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
           |  FROM lineitem),
           |hb AS (SELECT g, (h & 255) AS bucket,
           |         least(53 - length(bin(h >> 8)), 40) AS rho FROM h),
           |sk AS (SELECT g, bucket, max(rho) AS m_rho FROM hb GROUP BY g, bucket),
           |ag AS (SELECT g, count(*) AS present,
           |         sum(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << m_rho) AS DOUBLE)) AS sinv
           |       FROM sk GROUP BY g),
           |es AS (SELECT g, $alpha * 256.0 * 256.0 / ((256.0 - present) + sinv) AS raw,
           |         256 - present AS v FROM ag)
           |SELECT es.g AS l_returnflag,
           |  ${Num.r6Sql("CASE WHEN raw <= 256.0 * 2.5 AND v > 0 THEN 256.0 * ln(256.0 / v) ELSE raw END")} AS est_distinct
           |FROM es""".stripMargin
      }),

    ("sketch_quantile_sample",
      (s: SparkSession, dir: String) => {
        // RANK-based quantile sketch — no (lo, hi) a priori, unlike
        // sketch_quantile_hist: per order status, the bottom-64 rows
        // by md5-hash of the (unique) order key form a deterministic
        // uniform sample whose order statistics estimate the
        // o_totalprice quantiles; state is 64 data rows per group,
        // built with the salted two-stage bottom-k (no full-group
        // window anywhere). SketchSpec proves shard-merge ≡ one-shot
        // (the hllMerge discipline) and pins the empirical rank error
        val st = Sketch.quantileSample(t(s, dir, "orders"),
          "o_orderkey", "o_totalprice", Seq("o_orderstatus"), k = 64)
        Sketch.quantileSampleEstimate(st, Seq("o_orderstatus"),
          Seq(0.25d, 0.5d, 0.75d, 0.95d, 1.0d))
      },
      {
        val qSel = Seq(0.25d, 0.5d, 0.75d, 0.95d, 1.0d).map(q =>
          s"""SELECT g AS o_orderstatus, CAST($q AS DOUBLE) AS q, v AS est
             |FROM rk WHERE rk = CAST(ceil(CAST($q AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT)""".stripMargin)
          .mkString("\nUNION ALL ")
        s"""WITH s AS (SELECT o_orderstatus AS g,
           |    CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h,
           |    CAST(o_totalprice AS DOUBLE) AS v
           |  FROM orders WHERE o_totalprice IS NOT NULL),
           |bk AS (SELECT g, h, v FROM (
           |         SELECT g, h, v, row_number() OVER (PARTITION BY g ORDER BY h, v) AS rn
           |         FROM s) WHERE rn <= 64),
           |rk AS (SELECT g, v,
           |         row_number() OVER (PARTITION BY g ORDER BY v, h) AS rk,
           |         count(*) OVER (PARTITION BY g) AS n FROM bk)
           |$qSel""".stripMargin
      }),

    ("sketch_hll_intersect",
      (s: SparkSession, dir: String) => {
        // set-OVERLAP estimation by inclusion–exclusion over mergeable
        // registers — the "how much of shard A's keys are also in B"
        // rate a 100 TB contamination audit asks WITHOUT shipping raw
        // keys (each side is ≤ 256 registers per group). A = even
        // orderkeys, B = multiples of 3 → true overlap = multiples of
        // 6, ~1/6 of keys; the exact intersection rides along as the
        // in-row witness like sketch_hll_distinct's
        val li = t(s, dir, "lineitem")
        val ra = Sketch.hllRegisters(li.filter(pmod(col("l_orderkey"), lit(2)) === 0),
          "l_orderkey", Seq("l_returnflag"))
        val rb = Sketch.hllRegisters(li.filter(pmod(col("l_orderkey"), lit(3)) === 0),
          "l_orderkey", Seq("l_returnflag"))
        val exact = li.filter(pmod(col("l_orderkey"), lit(6)) === 0)
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_orderkey")).as("exact_intersect"))
        Sketch.hllIntersectEstimate(ra, rb, Seq("l_returnflag"))
          .join(exact, Seq("l_returnflag"), "left")
          .select(col("l_returnflag"), col("est_a"), col("est_b"),
            col("est_union"), col("est_intersect"),
            coalesce(col("exact_intersect"), lit(0L)).as("exact_intersect"))
      },
      s"""WITH ${hllEstCtes("a", "WHERE l_orderkey % 2 = 0")},
         |${hllEstCtes("b", "WHERE l_orderkey % 3 = 0")},
         |${hllEstCtes("u", "WHERE l_orderkey % 2 = 0 OR l_orderkey % 3 = 0")},
         |ex AS (SELECT l_returnflag AS g, count(DISTINCT l_orderkey) AS exact_intersect
         |       FROM lineitem WHERE l_orderkey % 6 = 0 GROUP BY 1)
         |SELECT ues.g AS l_returnflag,
         |  COALESCE(aes.est, CAST(0 AS DOUBLE)) AS est_a,
         |  COALESCE(bes.est, CAST(0 AS DOUBLE)) AS est_b,
         |  ues.est AS est_union,
         |  ${Num.r6Sql("greatest(COALESCE(aes.est, CAST(0 AS DOUBLE)) + COALESCE(bes.est, CAST(0 AS DOUBLE)) - ues.est, CAST(0 AS DOUBLE))")} AS est_intersect,
         |  CAST(COALESCE(ex.exact_intersect, 0) AS BIGINT) AS exact_intersect
         |FROM ues LEFT JOIN aes ON ues.g = aes.g
         |         LEFT JOIN bes ON ues.g = bes.g
         |         LEFT JOIN ex ON ues.g = ex.g""".stripMargin),

    ("sketch_countmin_topk",
      (s: SparkSession, dir: String) => {
        // heavy suppliers by estimated lineitem frequency: the counter
        // table is d·w = 2048 rows TOTAL (broadcast on the estimate
        // join) however large lineitem is; exact counts ride along as
        // the witness
        val li = t(s, dir, "lineitem").select(col("l_suppkey"))
        val sk = Sketch.countMinSketch(li, "l_suppkey")
        val keys = t(s, dir, "supplier").select(col("s_suppkey")).distinct()
        val est = Sketch.countMinEstimate(sk, keys, "s_suppkey")
        val exact = li.groupBy(col("l_suppkey").cast("long").as("key"))
          .agg(count(lit(1)).as("exact_cnt"))
        est.join(exact, Seq("key"), "left")
          .select(col("key").as("s_suppkey"), col("est_cnt"),
            coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"))
          .orderBy(col("est_cnt").desc, col("s_suppkey").asc)
          .limit(20)
      },
      s"""WITH perms(i, a, b) AS (VALUES $cmPermsSql),
         |cnt AS (SELECT i, (((a * CAST(l_suppkey AS BIGINT) + b) % ${Sketch.CmP}) % ${Sketch.CmWidth}) AS bucket,
         |          count(*) AS c
         |        FROM lineitem CROSS JOIN perms GROUP BY 1, 2),
         |ks AS (SELECT DISTINCT CAST(s_suppkey AS BIGINT) AS k FROM supplier),
         |est AS (SELECT k, min(COALESCE(c, CAST(0 AS BIGINT))) AS est_cnt
         |        FROM ks CROSS JOIN perms
         |        LEFT JOIN cnt ON cnt.i = perms.i
         |          AND cnt.bucket = (((perms.a * k + perms.b) % ${Sketch.CmP}) % ${Sketch.CmWidth})
         |        GROUP BY k),
         |ex AS (SELECT CAST(l_suppkey AS BIGINT) AS k, count(*) AS exact_cnt
         |       FROM lineitem GROUP BY 1)
         |SELECT est.k AS s_suppkey, CAST(est.est_cnt AS BIGINT) AS est_cnt,
         |  CAST(COALESCE(ex.exact_cnt, 0) AS BIGINT) AS exact_cnt
         |FROM est LEFT JOIN ex ON est.k = ex.k
         |ORDER BY est_cnt DESC, s_suppkey ASC LIMIT 20""".stripMargin),

    ("layout_zorder",
      (s: SparkSession, dir: String) =>
        // the Morton-interleave arithmetic under the oracle (the layout
        // effect itself — per-file bounding boxes — is measured by
        // LayoutSpec; this pins the curve both engines must agree on)
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            Layout.zValue(col("o_custkey"), col("o_orderkey"), 10).as("z"))
          .orderBy(col("z").asc, col("o_orderkey").asc)
          .limit(20),
      s"""SELECT o_orderkey, o_custkey,
         |  ${Layout.zValueSql("o_custkey", "o_orderkey", 10)} AS z
         |FROM orders ORDER BY z ASC, o_orderkey ASC LIMIT 20""".stripMargin),

    ("agg_incremental_merge",
      (s: SparkSession, dir: String) => {
        // two "daily batches" (orderkey parity) aggregated separately,
        // merged WITHOUT rescanning either, finalized with the derived
        // average — equal to the one-shot aggregate by construction;
        // money as integer cents so the merged sum is exact in any order
        val o = t(s, dir, "orders")
          .withColumn("cents", floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
        val batches = Seq(0, 1).map(p =>
          Incremental.aggState(o.filter(pmod(col("o_orderkey"), lit(2)) === p),
            Seq("o_orderstatus"), "cents"))
        Incremental.finalizeState(
          Incremental.mergeStates(batches, Seq("o_orderstatus")),
          Seq("o_orderstatus"))
      },
      s"""SELECT o_orderstatus,
         |  CAST(count(*) AS BIGINT) AS cnt,
         |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_val,
         |  CAST(min(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS min_val,
         |  CAST(max(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS max_val,
         |  ${Num.r6Sql("CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS avg_val
         |FROM orders GROUP BY o_orderstatus""".stripMargin),

    ("join_bloom_pruned",
      (s: SparkSession, dir: String) => {
        // selective dim filter (≈9% of suppliers) → bloom-prune the
        // fact side BEFORE its shuffle, then the exact join discards
        // the false positives: the result is the plain join's (the
        // oracle proves it), the exchange carries ~9% of lineitem
        val sup = t(s, dir, "supplier")
          .filter(col("s_acctbal") >= 9000.0d)
          .select(col("s_suppkey"), col("s_name"))
        val li = t(s, dir, "lineitem").select(col("l_suppkey"), col("l_quantity"))
        val pruned = Prune.bloomSemiFilter(li, col("l_suppkey"), sup, col("s_suppkey"))
        pruned.join(sup, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_suppkey"), col("s_name"))
          .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      },
      """SELECT s_suppkey, s_name,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_acctbal >= 9000.0
        |GROUP BY s_suppkey, s_name""".stripMargin),

    ("sketch_quantile_hist",
      (s: SparkSession, dir: String) => {
        // order-value quantiles per priority from a 256-bin histogram
        // sketch built as TWO "daily" shards (orderkey parity) merged
        // bin-wise — the shuffle carries ≤ 256 counters per group per
        // shard, never values; the merge path is the production shape
        // (per-day states combined without rescanning history)
        val o = t(s, dir, "orders")
          .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        val shards = Seq(0, 1).map(p =>
          Sketch.histogram(o.filter(pmod(col("o_orderkey"), lit(2)) === p),
            "o_totalprice", Seq("o_orderpriority"), lo = 0.0, hi = 600000.0,
            nBins = 256))
        Sketch.histQuantiles(Sketch.histMerge(shards, Seq("o_orderpriority")),
          Seq("o_orderpriority"), lo = 0.0, hi = 600000.0, nBins = 256,
          qs = Seq(0.5, 0.9, 0.99))
      },
      {
        // identical arithmetic: same bin formula, cumulative walk, and
        // ceil-target interpolation; the shard/merge split is invisible
        // (bin-wise sums are associative)
        val per = (q: Double) => {
          val target = s"ceil($q * CAST(n AS DOUBLE))"
          val est = Num.r6Sql(
            s"0.0 + (CAST(bin AS DOUBLE) + ($target - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)) * (600000.0 / 256)")
          s"""SELECT g AS o_orderpriority, CAST($q AS DOUBLE) AS q, $est AS est
             |FROM wn WHERE CAST(cum - cnt AS DOUBLE) < $target
             |         AND CAST(cum AS DOUBLE) >= $target""".stripMargin
        }
        s"""WITH v AS (SELECT o_orderpriority AS g, CAST(o_totalprice AS DOUBLE) AS val
           |           FROM orders WHERE o_totalprice IS NOT NULL),
           |b AS (SELECT g, CAST(least(greatest(floor((val - 0.0) / (600000.0 / 256)), 0.0), 255.0) AS BIGINT) AS bin FROM v),
           |c AS (SELECT g, bin, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY g, bin),
           |wn AS (SELECT g, bin, cnt,
           |         sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum,
           |         sum(cnt) OVER (PARTITION BY g) AS n FROM c)
           |${Seq(0.5, 0.9, 0.99).map(per).mkString("\nUNION ALL\n")}""".stripMargin
      }),

    ("profile_trend",
      (s: SparkSession, dir: String) =>
        // per-return-flag OLS fit of extendedprice against quantity —
        // the drift/trend profiling pass: ONE partial-aggregated
        // groupBy producing six exact-integer moments per group, slope/
        // intercept/r² as identical int→double casts + IEEE ops in both
        // engines (the momentState discipline, two-variable form)
        Profile.linearFit(t(s, dir, "lineitem"),
          "l_quantity", "l_extendedprice", Seq("l_returnflag")),
      {
        val slope = "(covxy / varx)"
        s"""WITH c AS (SELECT l_returnflag AS g,
           |    CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS xc,
           |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS yc
           |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
           |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
           |    sum(CAST(xc AS HUGEINT)) AS sx, sum(CAST(yc AS HUGEINT)) AS sy,
           |    sum(CAST(xc AS HUGEINT) * CAST(yc AS HUGEINT)) AS sxy,
           |    sum(CAST(xc AS HUGEINT) * CAST(xc AS HUGEINT)) AS sxx,
           |    sum(CAST(yc AS HUGEINT) * CAST(yc AS HUGEINT)) AS syy
           |  FROM c GROUP BY g),
           |d AS (SELECT *,
           |    CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) AS varx,
           |    CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE) AS vary,
           |    CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) AS covxy FROM m)
           |SELECT g AS l_returnflag, n,
           |  ${Num.r6Sql(slope)} AS slope,
           |  ${Num.r6Sql(s"(CAST(sy AS DOUBLE) - $slope * CAST(sx AS DOUBLE)) / (100.0 * CAST(n AS DOUBLE))")} AS intercept,
           |  ${Num.r6Sql("CASE WHEN vary > 0 THEN covxy * covxy / (varx * vary) ELSE CAST(0 AS DOUBLE) END")} AS r2
           |FROM d WHERE n >= 2 AND varx > 0""".stripMargin
      }),

    ("profile_anomaly",
      (s: SparkSession, dir: String) =>
        // per-event-type z-score outliers over the events stream: the
        // three-number moment state broadcasts back onto the stream;
        // moments are exact integer (cents/DECIMAL) sums so z is
        // bit-identical across engines and aggregation orders
        Profile.zscoreOutliers(
          events(s, dir).select(col("event_id"), col("event_type"), col("value")),
          "value", Seq("event_type"), threshold = 2.0),
      {
        val z = Num.r6Sql(
          "CAST(CAST(cc AS HUGEINT) * CAST(n AS HUGEINT) - s AS DOUBLE) / sqrt(CAST(varnum AS DOUBLE))")
        s"""WITH e AS (SELECT event_id, event_type, value FROM events
           |           WHERE value IS NOT NULL),
           |c AS (SELECT *, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cc FROM e),
           |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |         sum(CAST(cc AS HUGEINT)) AS s,
           |         sum(CAST(cc AS HUGEINT) * CAST(cc AS HUGEINT)) AS ss
           |       FROM c GROUP BY event_type),
           |st2 AS (SELECT *, CAST(n AS HUGEINT) * ss - s * s AS varnum FROM st),
           |zz AS (SELECT event_id, c.event_type, value, $z AS z
           |       FROM c JOIN st2 ON c.event_type = st2.event_type
           |       WHERE n >= 2 AND varnum > 0)
           |SELECT event_id, event_type, value, z FROM zz WHERE abs(z) >= 2.0""".stripMargin
      }),
  )
}
