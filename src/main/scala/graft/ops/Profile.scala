package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-profiling summary: one output row per profiled column with
  * non-null count, exact distinct count, and min/max (string-rendered).
  * The whole profile is ONE aggregation pass; the per-column layout
  * comes from a `stack` unpivot of the single wide result row, so the
  * input is scanned once no matter how many columns are profiled.
  *
  * Scale note: each exact `count_distinct` adds an expand+shuffle leg
  * to the aggregate. That is the price of exactness — swap in
  * `approx_count_distinct` (HLL) for exploratory profiling at 100 TB,
  * but note sketches are not cross-engine reproducible, so the exact
  * form is what the oracle checks. Min/max of DOUBLE columns is
  * deliberately unsupported here: float-to-string rendering differs
  * between engines.
  */
object Profile {
  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    } :+ count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nonnull`, `${c}__distinct`, `${c}__min`, `${c}__max`").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column, n_nonnull, n_distinct, min_value, max_value)",
      "__total AS n_rows")
  }

  /** Key-skew diagnostic: the `topN` heaviest keys of `keyCol` with
    * their share of all rows — the first question before sizing a
    * shuffle on that key ("does this join need salting?"). One
    * partial-aggregated groupBy; the top-N compiles to
    * `TakeOrderedAndProject` (per-partition top-N, driver merge — no
    * global sort); the row total rides along as a broadcast one-row
    * aggregate, never a separate driver-side `.count()`. Ties broken by
    * key for determinism.
    */
  def keySkew(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    // the row total is sum(cnt) over the counts relation (every row lands
    // in exactly one key group, NULL keys included) — NOT a second scan
    // of the raw table
    val total = counts.agg(sum(col("cnt")).as("__n"))
    // top-N FIRST (TakeOrderedAndProject over the counts), share after:
    // the broadcast total joins topN rows, not every distinct key
    // nulls LAST on the key tie-break: Spark `asc` sorts nulls first but
    // SQL engines' ORDER BY default (the oracle) sorts them last — a
    // null-key group on a cnt tie at the top-N boundary must not diverge
    counts.orderBy(col("cnt").desc, col("key").asc_nulls_last).limit(topN)
      .crossJoin(broadcast(total))
      .withColumn("share",
        graft.Num.r6(col("cnt").cast("double") / col("__n").cast("double")))
      .select(col("key"), col("cnt"), col("share"))
  }

  /** Per-group z-score outlier detection — the statistical data-quality
    * gate (corrupt sensor values, price-feed glitches, spam bursts):
    * flag rows whose value sits `threshold` or more population standard
    * deviations from their group's mean.
    *
    * Determinism discipline: float sums are order-dependent, so the
    * moments are accumulated EXACTLY — values quantize to integer cents
    * (`floor(v·100 + 0.5)`, the engine's money idiom) and both Σc and
    * Σc² aggregate as DECIMAL(38,0) (Spark) / HUGEINT (oracle), which
    * sum exactly in any order. The z-score then reduces to a ratio of
    * two exact integers, `z = (c·n − Σc) / √(n·Σc² − (Σc)²)` (the
    * population-variance numerator, scale-invariant so the cents factor
    * cancels), and casting an exact integer to double is
    * correctly-rounded in both engines — bit-identical z on both sides,
    * r6-rounded on output.
    *
    * Scale shape: one partial-aggregated groupBy producing THREE numbers
    * per group, broadcast back onto the stream (group cardinality is
    * assumed dimension-like); the data is scanned twice but never
    * shuffled on a non-group key. Groups with zero variance or fewer
    * than 2 rows flag nothing (z undefined). NULL values are ignored.
    *
    * @return input columns + `z` (double), outlier rows only
    */
  private val dec = DecimalType(38, 0)

  /** The exact-integer moment state [[zscoreOutliers]] scores against:
    * per group, row count `__n`, Σcents `__s`, Σcents² `__ss` (both
    * DECIMAL(38,0) — exact in any aggregation order), and the
    * population-variance numerator `__varnum = n·Σc² − (Σc)²`. Three
    * numbers per group — broadcastable by construction; the streaming
    * twin ([[graft.streaming.EventStream.anomalyStream]]) calibrates on
    * this same relation.
    */
  def momentState(df: DataFrame, valueCol: String, groupCols: Seq[String]): DataFrame = {
    val cents = floor(col(valueCol) * 100.0d + 0.5d).cast("long")
    df.where(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ cents.as("__c"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sum(col("__c").cast(dec)).as("__s"),
        // square AFTER the decimal cast: cents² overflows long for
        // |value| ≥ ~3.04e7 (silent non-ANSI wrap), while
        // DECIMAL(38,0)·DECIMAL(38,0) is exact to 38 digits — the same
        // cast-before-multiply the oracle's HUGEINT arithmetic does
        sum(col("__c").cast(dec) * col("__c").cast(dec)).as("__ss"))
      .withColumn("__varnum",
        col("__n").cast(dec) * col("__ss") - col("__s") * col("__s"))
  }

  /** Per-group ordinary-least-squares line fit y = slope·x + intercept
    * with r² — the drift/trend detector of a profiling pass ("is price
    * per unit moving", "is latency trending up"), and the closed-form
    * regression a 100 TB pass can afford: ONE partial-aggregated
    * groupBy producing six numbers per group, nothing else.
    *
    * The [[momentState]] determinism discipline, extended to two
    * variables: x and y quantize to integer cents and all five moments
    * (Σx, Σy, Σxy, Σx², Σy²) aggregate as DECIMAL(38,0) — exact in any
    * order (products are taken AFTER the decimal cast; cents² overflows
    * long). The cents scale then cancels out of the slope
    * (cov_c/var_c = 100²cov/100²var), and slope, intercept, and r² are
    * computed by the IDENTICAL sequence of exact-int→double casts and
    * IEEE ops in both engines, r6-rounded on output.
    *
    * Groups need n ≥ 2 and nonzero x-variance (a vertical line has no
    * OLS fit); r² of a zero-y-variance group is reported 0 by the
    * 0/0-guard (the flat line explains nothing of nothing). NULL x or
    * y rows are ignored.
    *
    * @return (groupCols…, n: long, slope, intercept, r2) — r6 doubles
    */
  def linearFit(df: DataFrame, xCol: String, yCol: String,
                groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "linearFit needs at least one group column")
    val xc = floor(col(xCol) * 100.0d + 0.5d).cast("long")
    val yc = floor(col(yCol) * 100.0d + 0.5d).cast("long")
    val m = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(xc.as("__x"), yc.as("__y")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum(col("__x").cast(dec) * col("__y").cast(dec)).as("__sxy"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"),
        sum(col("__y").cast(dec) * col("__y").cast(dec)).as("__syy"))
    val nD = col("__n").cast(dec)
    val varx = (nD * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val vary = (nD * col("__syy") - col("__sy") * col("__sy")).cast("double")
    val covxy = (nD * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val slope = covxy / varx
    val intercept = (col("__sy").cast("double") - slope * col("__sx").cast("double")) /
      (lit(100.0d) * col("__n").cast("double"))
    val r2 = when(vary > 0.0d, covxy * covxy / (varx * vary)).otherwise(lit(0.0d))
    m.where(col("__n") >= 2 && varx > 0.0d)
      .select(groupCols.map(col) ++ Seq(col("__n").as("n"),
        graft.Num.r6(slope).as("slope"),
        graft.Num.r6(intercept).as("intercept"),
        graft.Num.r6(r2).as("r2")): _*)
  }

  def zscoreOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
                     threshold: Double): DataFrame = {
    require(groupCols.nonEmpty, "zscoreOutliers needs at least one group column")
    require(threshold > 0.0d, "threshold must be positive")
    val cents = floor(col(valueCol) * 100.0d + 0.5d).cast("long")
    val stats = momentState(df, valueCol, groupCols)
    val z = (cents.cast(dec) * col("__n").cast(dec) - col("__s")).cast("double") /
      sqrt(col("__varnum").cast("double"))
    df.where(col(valueCol).isNotNull)
      .join(broadcast(stats), groupCols, "inner")
      .where(col("__n") >= 2 && col("__varnum") > 0)
      .withColumn("z", graft.Num.r6(z))
      .where(abs(col("z")) >= threshold)
      .drop("__n", "__s", "__ss", "__varnum")
  }
}
