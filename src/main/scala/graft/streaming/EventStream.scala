package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming over the `events` shape. The reference is purely
  * batch (SURVEY §2.8) — this is the engine's forward-looking stream
  * surface: the SAME aggregation as the batch `events_window_agg` query,
  * expressed over an unbounded source with watermarked tumbling windows,
  * so a user can swap batch for streaming without changing semantics.
  *
  * Scale design: windowed count/min/max aggregates partially on the map
  * side, state is bounded by the watermark (2h of open windows per
  * event_type), and the sink sees one row per (window, type) — no
  * per-event state.
  */
object EventStream {

  /** Recency-weighted (exponentially decayed) value sums per group —
    * the feature-engineering primitive behind "recent activity counts
    * more" signals (host freshness, user engagement, drift-weighted
    * quality): each event's value is weighted by 2^(−k), where
    * k = ⌊Δdays / halflifeDays⌋ from the corpus's most recent event —
    * BUCKETED exponential decay (the weight halves once per full
    * elapsed halflife), which is exactly what makes it cross-engine
    * exact: with integer k, the weight is a dyadic rational, so
    * cents·2^(maxK−k) is an INTEGER, the per-group sum aggregates as
    * DECIMAL(38,0)/HUGEINT exactly in any order, and one final division
    * by 2^maxK·100 is correctly rounded — the same order-independence
    * contract as the z-score moments. k clamps at `maxK` (default 40:
    * weight 2⁻⁴⁰ ≈ 1e-12 — clamped, not zeroed, so ordering by recency
    * never inverts). NULL values/timestamps are ignored. The reference
    * date is the max event date — ONE 1-row broadcast aggregate.
    *
    * @return (groupCols…, decayed_sum: double r6)
    */
  def decayedSum(events: DataFrame, tsCol: String, valueCol: String,
                 groupCols: Seq[String], halflifeDays: Int,
                 maxK: Int = 40): DataFrame = {
    require(groupCols.nonEmpty, "decayedSum needs at least one group column")
    require(halflifeDays >= 1, "halflifeDays must be positive")
    require(maxK >= 1 && maxK <= 62, "maxK must be in [1, 62] (single-long shifts)")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = events
      .where(col(valueCol).isNotNull && col(tsCol).isNotNull)
      .select(groupCols.map(col) :+
        floor(col(valueCol) * 100.0d + 0.5d).cast("long").as("__cc") :+
        to_date(col(tsCol)).as("__d"): _*)
    val ref = base.agg(max(col("__d")).as("__ref"))
    val pow2 = lit(math.pow(2.0d, maxK.toDouble)) // exact: maxK ≤ 62
    base.crossJoin(broadcast(ref))
      .select(groupCols.map(col) :+
        (col("__cc").cast(dec) *
          expr(s"cast(shiftleft(cast(1 as bigint), cast($maxK - " +
            s"least(datediff(__ref, __d) div $halflifeDays, $maxK) as int)) as decimal(38, 0))"))
          .as("__num"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__num")).as("__num"))
      .select(groupCols.map(col) :+
        graft.Num.r6(col("__num").cast("double") / pow2 / lit(100.0d))
          .as("decayed_sum"): _*)
  }

  /** Tumbling 1-hour window counts + value min/max per event type, with a
    * 2-hour watermark for late data. Works on both streaming and batch
    * DataFrames (same plan, Catalyst picks the stateful version under
    * `readStream`).
    */
  def windowCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("min_value"), col("max_value"))

  /** Unbounded parquet-directory source with an explicit schema (streaming
    * scans cannot infer).
    */
  def fromParquetDir(s: SparkSession, dir: String, schema: StructType): DataFrame =
    s.readStream.schema(schema).parquet(dir)

  /** Start the windowed aggregate into an in-memory sink (demo/test
    * harness; production would use a kafka/parquet sink with a
    * checkpoint location).
    */
  def startMemorySink(agg: DataFrame, queryName: String) =
    agg.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .start()

  /** Stream-stream inner join: left rows to same-key right rows that
    * occurred within `withinMinutes` BEFORE (or at) the left row's
    * time. Both sides carry watermarks and the join condition bounds
    * the allowed time skew, so Spark evicts both state stores as the
    * watermark advances — bounded memory on unbounded streams. An
    * unbounded join condition would buffer one side forever; the time
    * bound is what makes stream-stream joins deployable.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame, keyCol: String,
                       leftTs: String, rightTs: String,
                       withinMinutes: Int): DataFrame = {
    val l = left.withWatermark(leftTs, s"$withinMinutes minutes")
    val r = right.withWatermark(rightTs, s"$withinMinutes minutes")
    l.join(r, l(keyCol) === r(keyCol)
      && r(rightTs) <= l(leftTs)
      && r(rightTs) >= l(leftTs) - expr(s"INTERVAL $withinMinutes MINUTES"))
      .drop(r(keyCol))
  }

  /** Streaming exact dedup — the unbounded twin of
    * [[graft.llm.Dedup.exact]]: drop rows whose `keyCols` already
    * appeared within the watermark horizon
    * (`dropDuplicatesWithinWatermark`). State holds one entry per
    * distinct key seen inside the horizon and is evicted as the
    * watermark advances — bounded regardless of stream length, unlike a
    * plain `dropDuplicates` whose state grows forever. Dedup keys are
    * typically a content fingerprint ([[graft.llm.TextAnalysis
    * .fingerprint]]) rather than raw payload, so state entries stay
    * small at 100 TB/day ingest.
    */
  def dedupStream(events: DataFrame, tsCol: String, watermark: String,
                  keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Batch sessionization — the window formulation of the same gap
    * semantics as [[sessionize]]: a session break is an event more than
    * `gap` after its predecessor; session id = running count of breaks.
    * Two windows + one groupBy, all partitioned by the natural user key
    * (map-side partial agg on the final count/min/max). Use this for
    * bounded data; [[sessionize]] for unbounded streams.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val prev = lag(col("ts"), 1).over(w)
    val brk = when(prev.isNull ||
      col("ts").cast("long") - prev.cast("long") > gapMinutes * 60L, 1).otherwise(0)
    events
      .withColumn("_sid", sum(brk).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("_sid"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("_sid")
  }

  /** Weekly cohort retention — the activity-matrix companion to
    * [[funnel]]: users are grouped into cohorts by the week of their
    * FIRST event, and each cell counts how many of a cohort's users were
    * active `week_offset` weeks later (offset 0 = the cohort's own size,
    * by construction the row maximum).
    *
    * Scale shape: the stream first collapses to DISTINCT (user, week)
    * pairs — one shuffle proportional to active user-weeks, after which
    * raw event volume is out of the plan entirely; cohort assignment is
    * a user-keyed min-aggregate and one user-keyed join; the cell count
    * is a plain count (each distinct user-week maps to exactly one
    * (cohort, offset) cell, so no count-distinct expansion is needed).
    * Weeks truncate Monday-aligned (`date_trunc('week')`, the same rule
    * DuckDB applies), offsets by day-difference `/ 7` — integer
    * arithmetic end-to-end, nothing to round.
    *
    * @return (cohort_week: timestamp, week_offset: int, n_users: long)
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weekly = events.select(col(userCol).as("user"),
      date_trunc("week", col(tsCol)).as("week")).distinct()
    val cohort = weekly.groupBy(col("user")).agg(min(col("week")).as("cohort_week"))
    weekly.join(cohort, "user")
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered-funnel analysis — the classic product-analytics shape: how
    * many users performed step 0, then step 1 STRICTLY AFTER their
    * first step 0, then step 2 strictly after that, …. Per user, step
    * i's anchor is the EARLIEST step-i event after the step-(i-1)
    * anchor (min-over-valid, the standard greedy semantics — greedy
    * earliest anchors are optimal here: taking any later valid anchor
    * can only shrink the remaining window for later steps).
    *
    * Scale shape: one user-keyed shuffle per step, each over a relation
    * FILTERED to that step's event type first (the type filter pushes
    * to the scan), and the per-user anchor relation shrinks
    * monotonically down the funnel. No windows over all events, no
    * self-join of the full stream. Steps are config-sized, so the final
    * per-step counts are a union of one-row aggregates.
    *
    * Output: (step, step_idx, n_users) — one row per funnel step.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val anchors = steps.tail.scanLeft(
      events.filter(col(typeCol) === steps.head)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("anchor"))) { (prev, step) =>
      events.filter(col(typeCol) === step)
        .join(prev.withColumnRenamed("anchor", "prev_anchor"), Seq(userCol))
        .filter(col(tsCol) > col("prev_anchor"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("anchor"))
    }
    anchors.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), lit(i.toLong).as("step_idx"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }

  final case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp)
  final case class FunnelState(depth: Int, anchorMicros: Long)
  final case class FunnelProgress(user_id: Long, depth: Int)

  /** Streaming ordered-funnel — the live twin of [[funnel]]: per user
    * the state is TWO numbers (completed depth + the current anchor in
    * micros), bounded by user cardinality regardless of stream length.
    * Within each micro-batch the group's events are processed in
    * event-time order, advancing the funnel greedily exactly like the
    * batch operator's earliest-valid anchors; a row (user, new depth)
    * is emitted whenever a user advances (update-mode output).
    *
    * Contract: equals the batch [[funnel]] under per-user event-time-
    * ordered delivery (asserted in StreamingSpec: per-step user counts
    * from the final stream depths match the batch counts). A step event
    * arriving in a later micro-batch than a LATER-timestamped prior
    * event is judged against the newest anchor — the same
    * single-value-state trade every stateful twin here documents.
    */
  def funnelStream(events: Dataset[FunnelEvent],
                   steps: Seq[String]): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    // floorDiv, not /: getTime truncates toward zero while getNanos is
    // always non-negative, so plain division is non-monotone across the
    // epoch (a -0.5s event would sort AFTER a +0.2s one)
    def micros(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[FunnelEvent], st: GroupState[FunnelState]) => {
          var s = st.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val before = s.depth
          it.toIndexedSeq.sortBy(e => micros(e.ts)).foreach { e =>
            if (s.depth < steps.length && e.event_type == steps(s.depth) &&
                (s.depth == 0 || micros(e.ts) > s.anchorMicros)) {
              s = FunnelState(s.depth + 1, micros(e.ts))
            }
          }
          if (s.depth > before) {
            st.update(s)
            Iterator.single(FunnelProgress(uid, s.depth))
          } else Iterator.empty
        })
  }

  // ------------------------------------------- custom state: streaming as-of

  /** One tick of the merged as-of input: right rows (`isRight = true`)
    * publish `value` at `ts`; left rows ask "latest right value at or
    * before my ts" — [[graft.ops.AsOfJoin.asOf]]'s tagged-union shape as
    * a stream.
    */
  final case class TickEvent(key: Long, ts: Timestamp, isRight: Boolean,
                             id: Long, value: Double)
  final case class CarryState(ts: Long, value: Double)
  final case class Enriched(key: Long, id: Long, ts: Timestamp,
                            asof_value: Option[Double], asof_ts: Option[Timestamp])

  /** Streaming as-of enrichment (`flatMapGroupsWithState`): per key, the
    * state is the LATEST right (ts, value) — one entry of two longs per
    * key, bounded by key cardinality regardless of stream length, no
    * watermark-sized buffer. Within each micro-batch the group's events
    * are processed in (ts, right-before-left, id) order, so same-batch
    * ordering matches the batch join exactly.
    *
    * Contract: exact under per-key event-time-ordered delivery (the
    * keyed-Kafka-partition case) — equivalence with the batch
    * [[graft.ops.AsOfJoin.asOf]] is asserted in StreamingSpec. A LEFT
    * row arriving in a later micro-batch than a right row with LATER
    * event time answers from the newest state (single-value state
    * cannot rewind); full out-of-order exactness needs the batch join
    * over a watermark-complete window instead.
    */
  def asOfStream(events: Dataset[TickEvent]): Dataset[Enriched] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[TickEvent], state: GroupState[CarryState]) =>
          val sorted = it.toArray
            .sortBy(e => (e.ts.getTime, if (e.isRight) 0 else 1, e.id))
          var cur = state.getOption
          val out = List.newBuilder[Enriched]
          sorted.foreach { e =>
            if (e.isRight) {
              if (cur.forall(_.ts <= e.ts.getTime))
                cur = Some(CarryState(e.ts.getTime, e.value))
            } else {
              val m = cur.filter(_.ts <= e.ts.getTime)
              out += Enriched(key, e.id, e.ts,
                m.map(_.value), m.map(s => new Timestamp(s.ts)))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  // ---------------------------------------------- custom state: domain quota

  final case class DocEvent(doc_id: Long, domain: String)
  final case class QuotaState(n: Int)
  final case class Admitted(doc_id: Long, domain: String, rank_in_domain: Int)

  /** Streaming per-domain admission quota — the crawl-ingest twin of
    * [[graft.llm.Corpus.domainCap]]: admit at most `maxPerDomain`
    * documents per domain over the stream's lifetime, assigning each
    * admitted doc its 1-based rank. State per key is ONE int (admitted
    * count) — bounded by domain cardinality, not stream length; a
    * domain at quota costs one counter forever, never a buffer.
    *
    * Within a micro-batch a domain's docs admit in doc_id order;
    * across batches admission is first-arrival. Under per-domain
    * id-ordered delivery (the keyed-crawl-frontier case) this equals
    * the batch [[graft.llm.Corpus.domainCap]] — asserted in
    * StreamingSpec.
    */
  def quotaStream(docs: Dataset[DocEvent], maxPerDomain: Int): Dataset[Admitted] = {
    require(maxPerDomain > 0, "maxPerDomain must be positive")
    quotaStreamImpl(docs, _ => maxPerDomain, byId = true)
  }

  /** Per-domain-quota variant — the crawl-ingest twin of
    * [[graft.llm.Corpus.temperatureSample]]: a PLANNING pass computes
    * each domain's admission quota (e.g. `temperatureSample`'s quota
    * column over yesterday's corpus snapshot), and the stream admits
    * first-arrival against those quotas. The quota table is
    * mixture-plan-sized (domain cardinality of the plan, not the
    * stream) — the same bounded-by-construction argument as the
    * decontamination gate's broadcast hash set. Domains absent from
    * the plan fall to `defaultQuota` (0 = drop unplanned domains, the
    * safe default for a curated mixture).
    *
    * Within a micro-batch a domain's docs admit in
    * (rollingHash(doc_id), doc_id) order — the SAME admission key the
    * batch operator ranks on, so under per-domain hash-ordered
    * delivery the admitted set and ranks equal the batch run's
    * (asserted in StreamingSpec); the id-ordered sibling above keeps
    * doc_id order to match [[graft.llm.Corpus.domainCap]].
    */
  def quotaStream(docs: Dataset[DocEvent], quotas: Map[String, Int],
                  defaultQuota: Int): Dataset[Admitted] = {
    require(defaultQuota >= 0, "defaultQuota must be non-negative")
    require(quotas.values.forall(_ >= 0), "every quota must be non-negative")
    quotaStreamImpl(docs, quotas.getOrElse(_, defaultQuota), byId = false)
  }

  private def quotaStreamImpl(docs: Dataset[DocEvent], quotaOf: String => Int,
                              byId: Boolean): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    // admission key: doc_id for the domainCap twin, (rollingHash, id)
    // for the temperatureSample twin — both total orders
    def key(id: Long): (Long, Long) =
      if (byId) (id, id)
      else (graft.functions.RollingHash.hashId(id), id)
    docs
      .groupByKey(_.domain)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain: String, it: Iterator[DocEvent], state: GroupState[QuotaState]) =>
          val n0 = state.getOption.map(_.n).getOrElse(0)
          val room = quotaOf(domain) - n0
          if (room <= 0) {
            it.foreach(_ => ()) // drain; quota already exhausted
            Iterator.empty
          } else {
            // bounded selection of the `room` smallest admission keys: a
            // size-capped max-heap, NOT a buffer-and-sort of the whole
            // group — a crawler-trap domain can deliver millions of docs
            // in one micro-batch and this operator's contract is
            // O(quota) memory, never O(batch)
            val heap = new scala.collection.mutable.PriorityQueue[(Long, Long)]()(
              Ordering.Tuple2[Long, Long])
            it.foreach { d =>
              val k = key(d.doc_id)
              if (heap.size < room) heap.enqueue(k)
              else if (Ordering.Tuple2[Long, Long].lt(k, heap.head)) {
                heap.dequeue(); heap.enqueue(k)
              }
            }
            val admitted = heap.dequeueAll.reverse // ascending admission keys
            state.update(QuotaState(n0 + admitted.size))
            admitted.iterator.zipWithIndex.map { case ((_, id), i) =>
              Admitted(id, domain, n0 + i + 1)
            }
          }
      }
  }

  // -------------------------------------- stateless: decontamination gate

  final case class DocText(doc_id: Long, text: String)
  final case class Decontaminated(doc_id: Long, n_hits: Long, keep: Boolean)

  /** Streaming decontamination gate — the crawl-ingest twin of
    * [[graft.llm.Corpus.decontaminate]]: each arriving document is
    * checked for word n-gram overlap against a STATIC benchmark set.
    * The benchmark's distinct shingle hashes are collected once and
    * broadcast (benchmark-sized by definition — the same contract the
    * batch operator's broadcast join rests on), so the per-batch work
    * is a NARROW map: tokenize, shingle, hash, count membership. No
    * state, no shuffle, append-mode friendly — the ideal streaming
    * operator shape.
    *
    * Token/shingle/hash arithmetic is the scalar form of the batch
    * column pipeline ([[graft.llm.Dedup.docShinglesHashed]]): same
    * split-lowercase tokens, same n-token space-joined shingles, same
    * [[graft.functions.RollingHash]] static hash — stream-vs-batch
    * equality is asserted in StreamingSpec, so the two forms cannot
    * drift apart silently.
    */
  def decontaminateStream(docs: Dataset[DocText], evalSet: DataFrame,
                          idCol: String, textCol: String, n: Int,
                          minHits: Long = 1L): Dataset[Decontaminated] = {
    import docs.sparkSession.implicits._
    require(n > 0 && minHits > 0, "n and minHits must be positive")
    val evalHashes: Set[Long] =
      graft.llm.Dedup.docShinglesHashed(evalSet, idCol, textCol, n)
        .select(col("h")).distinct().collect().map(_.getLong(0)).toSet
    val bc = docs.sparkSession.sparkContext.broadcast(evalHashes)
    docs.map { d =>
      val hits = shingleHashes(d.text, n).count(bc.value.contains)
      Decontaminated(d.doc_id, hits.toLong, hits < minHits)
    }
  }

  final case class ValueEvent(event_id: Long, g: String, value: Double)
  final case class AnomalyScore(event_id: Long, z: Double, outlier: Boolean)

  /** Streaming z-score anomaly gate — the live twin of
    * [[graft.ops.Profile.zscoreOutliers]]: moments are calibrated in
    * batch ([[graft.ops.Profile.momentState]] — three exact integers
    * per group), collected and broadcast, and each arriving event is
    * scored by a STATELESS narrow map — no shuffle, no state store,
    * append-mode friendly. The scalar arithmetic is the row form of
    * the batch column pipeline: same cents quantization, same
    * `z = (c·n − Σc)/√(n·Σc² − (Σc)²)` ratio of exact integers
    * (BigInt here, DECIMAL(38,0) there — both cast to double
    * correctly-rounded), same r6 — stream-vs-batch equality is
    * asserted in StreamingSpec. Events from groups with n < 2, zero
    * variance, or absent from the calibration emit z = 0, never
    * outliers (the batch operator drops them).
    */
  def anomalyStream(events: Dataset[ValueEvent], stats: DataFrame,
                    groupCol: String, threshold: Double): Dataset[AnomalyScore] = {
    import events.sparkSession.implicits._
    require(threshold > 0.0d, "threshold must be positive")
    val calib: Map[String, (Long, BigInt, BigInt)] = stats
      .select(col(groupCol), col("__n"), col("__s"), col("__varnum"))
      .collect().map { r =>
        r.getString(0) -> ((r.getLong(1),
          BigInt(r.getDecimal(2).toBigInteger),
          BigInt(r.getDecimal(3).toBigInteger)))
      }.toMap
    val bc = events.sparkSession.sparkContext.broadcast(calib)
    events.map { e =>
      bc.value.get(e.g) match {
        case Some((n, s, varnum)) if n >= 2 && varnum > 0 =>
          val c = BigInt(math.floor(e.value * 100.0d + 0.5d).toLong)
          val z = graft.Num.r6((c * n - s).toDouble / math.sqrt(varnum.toDouble))
          AnomalyScore(e.event_id, z, math.abs(z) >= threshold)
        case _ => AnomalyScore(e.event_id, 0.0d, outlier = false)
      }
    }
  }

  final case class ScoredDoc(doc_id: Long, ppl: Option[Double], keep: Boolean)

  /** Streaming perplexity gate — the crawl-ingest twin of
    * [[graft.llm.Corpus.perplexityFilter]]: each arriving document is
    * scored against a STATIC reference LM (train it in batch with
    * [[graft.llm.Corpus.bigramLm]]; the model is topM + ref-vocab
    * bounded by construction, the same broadcastability contract the
    * batch scorer's broadcast joins rest on). Stateless narrow map —
    * no shuffle, no state store, append-mode friendly.
    *
    * The per-bigram arithmetic is the scalar form of the batch column
    * pipeline: same tokens, same C(a,b)/C(a) bigram probability, same
    * ln(0.4) stupid backoff onto the add-one-smoothed unigram, same
    * r6 rounding — stream-vs-batch equality is asserted in
    * StreamingSpec. Docs with fewer than two tokens have no score and
    * are rejected, matching the batch filter's conservative default.
    *
    * SIZE CONTRACT (`maxLmRows`, per table): the LM rides every task as
    * a driver-collected literal map — the right shape for a
    * topM-pruned model, the WRONG shape for a web-scale ref vocab
    * (the unigram table is ref-vocab-sized and unbounded in general).
    * Above the cap this fails LOUDLY at construction instead of
    * OOMing the driver mid-stream. The above-cap path is
    * [[perplexityScoredSink]]: a stateless per-row map cannot
    * re-aggregate per doc after a relational LM join (streaming append
    * mode forbids the groupBy without state), so the join-path twin is
    * a micro-batch delivery — the same escape-hatch shape as the
    * codebook literal/table switch in
    * [[graft.llm.Similarity]] (`maxLiteralBookRows`).
    */
  def perplexityStream(docs: Dataset[DocText], bigrams: DataFrame,
                       unigrams: DataFrame, maxScore: Double,
                       maxLmRows: Int = 1 << 20): Dataset[ScoredDoc] = {
    import docs.sparkSession.implicits._
    require(maxLmRows >= 0, "maxLmRows must be non-negative")
    // limit(cap + 1): the guard never scans past the cap, and the
    // under-cap rows are REUSED as the literal (one collect, not two).
    // cap + 1 saturates instead of overflowing — maxLmRows =
    // Int.MaxValue would wrap negative and limit() would reject it
    val probe = if (maxLmRows == Int.MaxValue) maxLmRows else maxLmRows + 1
    val bgRows = bigrams.limit(probe).collect()
    val uniRows = unigrams.limit(probe).collect()
    val overCap = Seq("bigrams" -> bgRows.length, "unigrams" -> uniRows.length)
      .collect { case (nm, n) if n > maxLmRows => nm }
    require(overCap.isEmpty,
      s"perplexityStream: LM exceeds maxLmRows=$maxLmRows " +
        s"(over-cap table(s): ${overCap.mkString(", ")}) — a literal map " +
        "of this model would ride the driver and every task; prune it " +
        "(bigramLm's topM) or serve through the join path: " +
        "perplexityScoredSink (foreachBatch, LM stays a cluster table)")
    val bg: Map[(String, String), Long] = bgRows
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val uni: Map[String, Long] = uniRows
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = uni.values.sum
    val v = uni.size.toLong
    val sc = docs.sparkSession.sparkContext
    val bcB = sc.broadcast(bg)
    val bcU = sc.broadcast(uni)
    docs.map { d =>
      // batch mirror: bigramLm filters empty tokens, so the stream does too
      val toks = scalarTokens(d.text).filter(_.nonEmpty)
      if (toks.length < 2) ScoredDoc(d.doc_id, None, keep = false)
      else {
        var sum = 0.0
        var n = 0
        toks.sliding(2).foreach { w =>
          val (a, b) = (w(0), w(1))
          bcB.value.get((a, b)) match {
            case Some(cab) =>
              // batch mirror for an inconsistent model (bigram present,
              // its first token absent from unigrams): the batch join
              // makes that term a NULL log-prob which avg() SKIPS —
              // skip it here too instead of throwing mid-stream
              bcU.value.get(a).foreach { ca =>
                sum += math.log(cab.toDouble / ca.toDouble)
                n += 1
              }
            case None =>
              sum += math.log(0.4) +
                math.log((bcU.value.getOrElse(b, 0L) + 1).toDouble / (t + v).toDouble)
              n += 1
          }
        }
        // every term skipped == batch avg() over all NULLs == no score
        if (n == 0) ScoredDoc(d.doc_id, None, keep = false)
        else {
          val ppl = graft.Num.r6(-(sum / n))
          ScoredDoc(d.doc_id, Some(ppl), ppl <= maxScore)
        }
      }
    }
  }

  /** The JOIN-PATH twin of [[perplexityStream]] for LMs above its
    * literal cap: a `foreachBatch` delivery that scores each
    * micro-batch RELATIONALLY against persisted LM tables — the model
    * never leaves the cluster (no driver collect, no task-serialized
    * map; with the broadcast hints off, AQE broadcasts the SMALL
    * micro-batch into the LM join, or falls back to shuffle for a
    * truly huge vocab). Output appends `ScoredDoc`-shaped rows
    * (doc_id, ppl, keep) to `outTable`, exactly once per batch id
    * ([[ExactlyOnce]] — replays are no-ops).
    *
    * Bit-identical to the literal path by construction: the scoring IS
    * [[graft.llm.Corpus.perplexityScore]], the batch pipeline both
    * twins mirror (same tokens, same C(a,b)/C(a), same ln(0.4) stupid
    * backoff, same r6); docs the batch scorer drops (< 2 tokens) or
    * cannot score (all terms skipped on an inconsistent model) come
    * back as ppl = null / keep = false via the left join, matching the
    * stream twin's reject rows. StreamingSpec pins all three equal.
    */
  def perplexityScoredSink(bigramsTable: String, unigramsTable: String,
                           maxScore: Double, outTable: String)
      : (Dataset[DocText], Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    ExactlyOnce.once(spark, s"${outTable}_commits", batchId) {
      val scored = graft.llm.Corpus.perplexityScore(
        batch.toDF(), "doc_id", "text",
        spark.table(bigramsTable), spark.table(unigramsTable),
        broadcastLm = false)
      val out = batch.toDF().select(col("doc_id"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"), col("ppl"),
          coalesce(col("ppl") <= lit(maxScore), lit(false)).as("keep"))
      if (!spark.catalog.tableExists(outTable))
        graft.ops.Bucketing.dropManaged(spark, outTable)
      out.write.mode("append").format("parquet").saveAsTable(outTable)
    }
  }

  /** The ONE scalar mirror of the batch `tokens()` column (lowercase +
    * whitespace split, limit -1 — Spark's `split` keeps trailing empty
    * tokens). Locale.ROOT, not the JVM default: under a Turkish default
    * locale "I".toLowerCase is dotless 'ı' while Spark's lower() gives
    * 'i' — the hashes would silently diverge from the batch operators'.
    * Every stateless stream twin tokenizes through here so the rule
    * cannot fork between operators; NULL text yields no tokens.
    */
  private def scalarTokens(text: String): Array[String] =
    if (text == null) Array.empty[String]
    else text.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)

  /** Scalar mirror of the batch shingle-hash pipeline: tokens
    * ([[scalarTokens]], empties kept like the batch shingle family),
    * n-token space-joined windows, DISTINCT, rolling hash.
    */
  private def shingleHashes(text: String, n: Int): Set[Long] = {
    val toks = scalarTokens(text)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(w =>
      graft.functions.RollingHash.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(w.mkString(" ")), 131L)).toSet
  }

  // ---------------------------------------- custom state: canonical-URL dedup

  final case class UrlKeyed(doc_id: Long, canonical_url: String)
  final case class UrlAdmitted(doc_id: Long, canonical_url: String)

  /** Streaming canonical-URL dedup — the crawl-ingest twin of
    * [[graft.llm.Corpus.urlDedup]]: first-seen admission per canonical
    * URL. Canonicalization reuses the batch operator's COLUMN expression
    * ([[graft.llm.Corpus.canonicalizeUrl]]) as a narrow map on the
    * streaming DataFrame — no scalar re-implementation that could drift.
    *
    * State per canonical key is ONE boolean (seen) — a crawler revisiting
    * a page a million times costs one state entry, never a buffer.
    * Within a micro-batch the keeper is the LOWEST doc id (an O(1)
    * running min, no sort); across batches admission is first-arrival.
    * Under per-key id-ordered delivery this equals the batch operator's
    * min-id keeper rule — asserted in StreamingSpec. The batch
    * operator's `n_dups` has no append-mode analogue (a keeper row is
    * emitted once and cannot be re-counted later), so the streaming
    * output is the admitted (doc_id, canonical_url) rows only.
    */
  def urlDedupStream(docs: DataFrame, idCol: String, urlCol: String): Dataset[UrlAdmitted] = {
    import docs.sparkSession.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        graft.llm.Corpus.canonicalizeUrl(col(urlCol)).as("canonical_url"))
      // null id or url cannot key streaming admission — DROP the row
      // instead of letting the primitive-Long encoder kill the whole
      // query on one bad record (the batch twin emits such rows with a
      // null keeper; a stream has no meaningful state key for them —
      // disclosed batch/stream divergence)
      .filter(col("doc_id").isNotNull && col("canonical_url").isNotNull)
      .as[UrlKeyed]
      .groupByKey(_.canonical_url)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (url: String, it: Iterator[UrlKeyed], state: GroupState[Boolean]) =>
          if (state.exists) {
            it.foreach(_ => ()) // drain; key already admitted
            Iterator.empty
          } else {
            var keep = Long.MaxValue
            it.foreach(d => if (d.doc_id < keep) keep = d.doc_id)
            state.update(true)
            Iterator.single(UrlAdmitted(keep, url))
          }
      }
  }

  // ------------------------------------------ custom state: sequence packing

  final case class PackEvent(doc_id: Long, n_toks: Long)
  final case class PackedDoc(doc_id: Long, n_toks: Long, stream: Long,
                             start_offset: Long, seq_first: Long, seq_last: Long)

  /** Streaming sequence packing — the ingest twin of
    * [[graft.llm.Corpus.packSequences]]: documents route to the same
    * rolling-hash pack streams and extend each stream's token tape as
    * they arrive (doc_id order within a micro-batch). State per stream
    * is ONE long — the tape length — bounded by `nStreams` forever,
    * never by stream length. Memory per (stream, batch) is the group's
    * events (needed for the deterministic in-batch doc_id sort); the
    * micro-batch bounds it.
    *
    * Under per-stream id-ordered delivery this equals the batch
    * [[graft.llm.Corpus.packSequences]] — asserted in StreamingSpec.
    */
  def packStream(docs: Dataset[PackEvent], capacity: Long,
                 nStreams: Int): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    require(capacity > 0 && nStreams > 0, "capacity and nStreams must be positive")
    docs
      .groupByKey(d => graft.functions.RollingHash.hashId(d.doc_id) % nStreams)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (stream: Long, it: Iterator[PackEvent], state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = it.toArray.sortBy(_.doc_id).map { d =>
            // same clamp as the batch op's greatest(coalesce(n,0),0):
            // a negative count must never rewind the tape
            val nt = math.max(d.n_toks, 0L)
            val first = off / capacity
            val last = if (nt > 0) (off + nt - 1) / capacity else first
            val row = PackedDoc(d.doc_id, nt, stream, off, first, last)
            off += nt
            row
          }
          state.update(off)
          out.iterator
      }
  }

  // ----------------------------------------- custom state: length batching

  final case class BatchEvent(doc_id: Long, n_toks: Long)
  final case class BatchedDoc(doc_id: Long, n_toks: Long, bucket: Int,
                              stream: Long, batch_idx: Int, pos_in_batch: Int)

  /** Streaming length-bucketed batch assembly — the ingest twin of
    * [[graft.llm.Corpus.batchByLength]]: arriving docs are routed to
    * (bucket, stream) — bucket from the literal bound list, stream
    * from the id hash, both derived per row with no state — and each
    * (bucket, stream) key assigns batch/position numbers from ONE
    * running counter. State per key is a single long, bounded by
    * nBuckets x nStreams, never by stream length.
    *
    * Within a micro-batch a key's docs are numbered in doc_id order;
    * across batches numbering continues first-arrival. Under per-key
    * id-ordered delivery (global id order suffices — routing is
    * deterministic per row) this equals the batch operator, asserted
    * in StreamingSpec. Negative counts clamp to 0 (bucket 0), same as
    * the batch twin.
    *
    * Memory: the PERSISTENT state per key is one long, but emitting
    * every doc in id order is inherently per-micro-batch O(group) —
    * each (bucket, stream) key buffers and sorts its micro-batch
    * slice in one task before numbering. A hot key pulling a large
    * micro-batch through one buffer is the skew hazard here;
    * `nStreams` is the lever that bounds per-key group size (docs
    * hash uniformly across streams within a bucket), exactly as it
    * bounds the batch twin's window partitions.
    */
  def batchStream(docs: Dataset[BatchEvent], bucketBounds: Seq[Long],
                  batchSize: Int, nStreams: Int): Dataset[BatchedDoc] = {
    import docs.sparkSession.implicits._
    require(bucketBounds.nonEmpty && bucketBounds == bucketBounds.sorted
      && bucketBounds.distinct == bucketBounds && bucketBounds.head > 0,
      "bucketBounds must be positive, strictly increasing")
    require(batchSize > 0 && nStreams > 0, "batchSize and nStreams must be positive")
    docs
      .groupByKey { d =>
        val n = math.max(d.n_toks, 0L)
        val bucket = bucketBounds.indexWhere(n < _) match {
          case -1 => bucketBounds.length
          case i => i
        }
        val stream = graft.functions.RollingHash.hashId(d.doc_id) % nStreams
        (bucket, stream)
      }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), it: Iterator[BatchEvent], state: GroupState[Long]) =>
          var cnt = state.getOption.getOrElse(0L)
          val out = it.toArray.sortBy(_.doc_id).map { d =>
            val row = BatchedDoc(d.doc_id, math.max(d.n_toks, 0L), key._1,
              key._2, (cnt / batchSize).toInt, (cnt % batchSize).toInt)
            cnt += 1
            row
          }
          state.update(cnt)
          out.iterator
      }
  }

  final case class ScoredTokDoc(doc_id: Long, score: Option[Double], n_toks: Long)
  final case class BudgetAdmitted(doc_id: Long, score: Option[Double],
                                  n_toks: Long, bin: Int)

  /** Streaming token-budget admission — the ingest twin of
    * [[graft.llm.Corpus.selectByTokenBudget]] in the batch-calibrate /
    * stream-apply shape: calibrate the histogram cut on a batch corpus
    * ([[graft.llm.Corpus.budgetThreshold]] — nBins-bounded, so always
    * broadcastable), then admit each arriving doc with the scalar form
    * of the batch filter: same IEEE bin arithmetic (NULL scores bin at
    * 0), same rolling-hash ppm draw for the boundary bin, same
    * NULL/negative token clamp. Stateless narrow map — no shuffle, no
    * state store, append-mode friendly; stream-vs-batch equality is
    * asserted in StreamingSpec so the two admission forms cannot
    * silently drift.
    */
  def budgetStream(docs: Dataset[ScoredTokDoc],
                   threshold: graft.llm.Corpus.BudgetThreshold): Dataset[BudgetAdmitted] = {
    import docs.sparkSession.implicits._
    val bc = docs.sparkSession.sparkContext.broadcast(threshold)
    docs.flatMap { d =>
      if (bc.value.admits(d.doc_id, d.score))
        Some(BudgetAdmitted(d.doc_id, d.score, math.max(d.n_toks, 0L),
          graft.llm.Corpus.binOf(d.score, bc.value.nBins)))
      else None
    }
  }

  // --------------------------------------------------- custom state: sessions

  final case class SessionEvent(user_id: Long, ts: Timestamp)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Int)

  /** Gap-based sessionization with custom state
    * (`flatMapGroupsWithState`): per user, consecutive events closer than
    * `gap` belong to one session; a session closes when the gap passes or
    * the event-time watermark moves beyond `last + gap` (timeout).
    *
    * State per key is ONE open session (three longs) — bounded regardless
    * of stream length; completed sessions are emitted append-mode, so the
    * sink never rewrites history. This is the §2.8 capability the
    * reference lacks entirely.
    */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def close(uid: Long, s: SessionState): Session =
      Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.n)

    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(close(uid, _)).toList
            state.remove()
            out.iterator
          } else {
            val times = it.map(_.ts.getTime).toArray.sorted
            var open = state.getOption
            val closed = List.newBuilder[Session]
            times.foreach { t =>
              open match {
                case Some(s) if t - s.last <= gapMs =>
                  open = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed += close(uid, s)
                  open = Some(SessionState(t, t, 1))
                case None =>
                  open = Some(SessionState(t, t, 1))
              }
            }
            open match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.last + gapMs)
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }
}
