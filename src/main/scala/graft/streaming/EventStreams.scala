package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Event-time stream processing over the `events` table shape
  * (event_id, ts(nanos), user_id, event_type, value, props).
  *
  * The reference's only "streaming" is chunked file ingest
  * (insertCSVEdgeStream, FastAccess.hs:323-341); real event-time semantics
  * (watermarks, windows, stateful sessions) are part of this engine's
  * beyond-reference surface. Every transform below is identical for batch
  * and streaming DataFrames unless its doc says otherwise ([[funnel]] is
  * batch-only), so correctness is testable by running the same query both
  * ways.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** `ts` → nanos-since-epoch LONG regardless of the column's physical
    * type — the shape every op in this object (and the gate queries)
    * assumes. The driver's events table has shipped as both
    * TIMESTAMP(NANOS) (reads as LONG under nanosAsLong — passes through)
    * and TIMESTAMP(MICROS) (reads as TIMESTAMP/TIMESTAMP_NTZ — converted
    * here; an NTZ wall time resolves in the session tz, which every graft
    * entry point pins to UTC). Works identically on batch and streaming
    * DataFrames (a narrow projection — no state, no barrier). */
  def normalizeTs(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events.schema(tsCol).dataType match {
      case LongType => events
      case _ => events.withColumn(tsCol,
        unix_micros(col(tsCol).cast("timestamp")) * lit(1000L))
    }

  /** Nanos-long ts → proper event-time timestamp column. */
  def withEventTime(events: DataFrame): DataFrame =
    normalizeTs(events).withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))

  /** Tumbling-window counts per event type with a watermark — works on
    * both batch and streaming inputs. */
  def windowedTypeCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Sliding-window per-user activity. */
  def slidingUserActivity(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), windowLen, slide), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("user_id"), col("n_events"))

  /** Open a streaming read over a parquet directory with the events schema,
    * ts normalized to nanos-long. The schema comes from a one-time batch
    * footer peek (streaming sources need an explicit schema, and pinning
    * [[eventSchema]] breaks when the dir was written with a timestamp-typed
    * ts); files appended later must match the schema of the first peek. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema =
      try spark.read.parquet(dir).schema
      catch {
        // ONLY the empty/missing-dir case falls back to the documented
        // shape (schema inference needs >= 1 footer); any OTHER
        // AnalysisException (corrupt footer, datetime-rebase,
        // schema-merge conflict, access error) rethrows — falling back
        // would resurface later as a confusing schema mismatch far from
        // the root cause
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(c =>
              c.contains("UNABLE_TO_INFER_SCHEMA") || c.contains("PATH_NOT_FOUND")) =>
          eventSchema
      }
    normalizeTs(spark.readStream.schema(schema).parquet(dir))
  }

  /** Streaming exact dedup on a key column: duplicates arriving within the
    * watermark horizon are dropped; state for a key is reclaimed once the
    * watermark passes its event time (bounded state — the requirement for
    * running dedup over an unbounded 100 TB stream; batch exact dedup is
    * [[graft.functions.Dedup.exact]]). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermarkDelay: String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  // ---- stateful sessionization --------------------------------------------

  case class Event(event_id: Long, ts: Long, user_id: Long, event_type: String, value: Double)
  case class Session(user_id: Long, start_ts: Long, end_ts: Long, n_events: Int, n_purchases: Int)
  // public: the streaming state store codegens this class's constructor
  case class SessionState(start: Long, last: Long, n: Int, purchases: Int)

  /** Gap-based BATCH sessionization in gaps-and-islands window form:
    * mark a session break where the gap to the previous event exceeds
    * `gapNanos` (lag), number sessions with a running sum of breaks
    * (conditional cumsum), aggregate per (user, session).
    *
    * This is the 100 TB shape: a sort-based window exchange on user_id —
    * no executor ever holds a whole user's events in memory, so a skewed
    * key (a bot with 10^8 events) streams through the window operator
    * instead of OOMing a flatMapGroupsWithState group buffer. The
    * custom-state path remains [[sessionizeStream]], where per-key state is
    * bounded by the open session, not the user's history.
    */
  def sessionize(events: Dataset[Event], gapNanos: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.toDF()
      .withColumn("__brk",
        when(col("ts") - lag(col("ts"), 1).over(w) > gapNanos, 1).otherwise(0))
      .withColumn("__sid", sum(col("__brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__sid"))
      .agg(
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        count(lit(1)).cast("int").as("n_events"),
        count(when(col("event_type") === "purchase", 1)).cast("int").as("n_purchases"))
      .select(col("user_id"), col("start_ts"), col("end_ts"), col("n_events"), col("n_purchases"))
      .as[Session]
  }

  /** Streaming sessionization: state survives micro-batches; a session is
    * emitted when the gap elapses in EVENT time (watermark-driven timeout),
    * so results are deterministic under any batch slicing. Input must be a
    * STREAMING Dataset[Event]; set the watermark delay ≥ max expected
    * lateness. This is the scale shape for billions of users: state is
    * per-key (HDFS/RocksDB-backed state store), each micro-batch touches
    * only keys with new events or expiring timers.
    *
    * Known limit: an event later than a full gap behind the open session
    * (but inside the watermark) starts a new session instead of splicing a
    * PRIOR one — exact splicing needs a session list per key; size the
    * watermark ≤ gap to rule the case out. */
  def sessionizeStream(events: Dataset[Event], gapNanos: Long,
      watermarkDelay: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val withTime = withEventTime(events.toDF())
      .withWatermark("event_time", watermarkDelay)
      .as[Event]
    withTime.groupByKey(_.user_id).flatMapGroupsWithState[SessionState, Session](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
        if (state.hasTimedOut) {
          // watermark passed last_ts + gap: the session is closed for good
          val s = state.get
          state.remove()
          Iterator.single(Session(user, s.start, s.last, s.n, s.purchases))
        } else {
          val evs = it.toSeq.sortBy(e => (e.ts, e.event_id))
          val closed = scala.collection.mutable.ArrayBuffer[Session]()
          var cur: Option[SessionState] = state.getOption
          for (e <- evs) {
            val p = if (e.event_type == "purchase") 1 else 0
            cur match {
              // |e.ts - s.last| handles LATE (within-watermark) events from a
              // previous micro-batch: bounds extend via min/max so a late
              // merge can never produce end < start or regress the timeout
              case Some(s) if math.abs(e.ts - s.last) <= gapNanos =>
                cur = Some(SessionState(math.min(s.start, e.ts),
                  math.max(s.last, e.ts), s.n + 1, s.purchases + p))
              case Some(s) =>
                closed += Session(user, s.start, s.last, s.n, s.purchases)
                cur = Some(SessionState(e.ts, e.ts, 1, p))
              case None =>
                cur = Some(SessionState(e.ts, e.ts, 1, p))
            }
          }
          cur.foreach { s =>
            state.update(s)
            // fire once the watermark passes session end + gap — CLAMPED
            // to watermark + 1 ms: a within-watermark late batch can leave
            // s.last + gap BEHIND the already-advanced watermark (seen in
            // the wild when a file source lists one logical append
            // mid-write and splits it across two micro-batches: the first
            // slice advances the watermark to its max ts, the second
            // slice's users then re-arm from older events), and Spark
            // REJECTS a past event-time timeout, failing the whole query
            // [FLATMAPGROUPSWITHSTATE_USER_FUNCTION_ERROR]. Unlike the
            // funnel/attribution states (which REAP on a passed deadline
            // — their outcome is already decided), an overdue session
            // still owes its emission, so the earliest legal timeout
            // fires it on the next batch; the emitted row carries
            // s.start/s.last and is byte-identical either way.
            state.setTimeoutTimestamp(math.max(
              s.last / 1000000L + gapNanos / 1000000L,
              state.getCurrentWatermarkMs() + 1L))
          }
          closed.iterator
        }
    }
  }

  /** Ordered-step FUNNEL: per user, the earliest completion of `steps` in
    * order — step k's event must be STRICTLY LATER than the matched step
    * k−1 event. Greedy earliest-per-step matching: if any in-order
    * completion exists, taking the earliest valid event at each step
    * finds one (the standard subsequence-matching argument), so
    * "completed" is exact; the reported timestamps are the earliest
    * completion path. Returns one row per user who reached step 1:
    * (user, t1..tn, n_steps, converted) where n_steps counts the reached
    * prefix (tk is NULL beyond it) and converted = 1 iff all steps
    * completed — within `maxSpanNanos` of t1 when given, measured ON THE
    * EARLIEST PATH (a later, tighter completion does not resurrect a
    * span-failed funnel; exact windowed conversion would need per-window
    * re-matching — document the difference before comparing to such
    * tools). converted is LONG 0/1, not boolean, for cross-engine
    * comparability.
    *
    * BATCH-ONLY — the exception to this object's batch/streaming parity
    * rule: the step chain is stream-stream self-joins plus repeated
    * aggregations, which Structured Streaming rejects at query start.
    * The streaming sibling is [[funnelStream]] (per-user ordered state,
    * emits the CONVERSION stream — the rows this op marks converted=1).
    *
    * Scale shape: steps.size−1 user-keyed left-join + aggregation
    * rounds. Round k joins the (user, t1..tk−1) accumulator — ≤ one row
    * per user — with only the step-k events (filter pushed to the scan),
    * so shuffled rows are |step-k events| + |users| per round and
    * per-user fan-out is bounded by that user's step-k event count. No
    * windows, no driver-side state; each round's aggregate re-keys by
    * user with map-side combine. */
  def funnel(events: DataFrame, steps: Seq[String],
      maxSpanNanos: Option[Long] = None,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    val ev = normalizeTs(events, tsCol)
    var acc = ev.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    for (k <- 2 to steps.size) {
      val stepEv = ev.filter(col(typeCol) === steps(k - 1))
        .select(col(userCol), col(tsCol).as("__ts"))
      val carried = (1 until k).map(i => s"t$i")
      acc = acc.join(stepEv, Seq(userCol), "left")
        .groupBy((userCol +: carried).map(col): _*)
        .agg(min(when(col("__ts") > col(s"t${k - 1}"), col("__ts"))).as(s"t$k"))
    }
    val n = steps.size
    val nSteps = (2 to n).map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    val completed = col(s"t$n").isNotNull
    val converted = maxSpanNanos.fold(completed)(s =>
      completed && col(s"t$n") - col("t1") <= s)
    acc.withColumn("n_steps", nSteps.cast("long"))
      .withColumn("converted", when(converted, 1L).otherwise(0L))
  }

  /** Cohort RETENTION: bucket time at `bucketNanos` (weeks by default),
    * cohort each user by the bucket of their FIRST event, and count
    * distinct active users per (cohort, bucket-offset) — the classic
    * retention triangle behind "what fraction of week-N signups were
    * still active k weeks later". Offset 0 is the cohort's own bucket,
    * so n_users at offset 0 is the cohort size. Emits (cohort,
    * week_offset, n_users); divide by the offset-0 row for rates.
    *
    * Scale shape: one min-aggregation per user (map-side combined), one
    * user-keyed join of events to their cohort, one
    * (cohort, offset)-keyed countDistinct — the distinct expands to
    * (cohort, offset, user) partial-agg rows, bounded by
    * |users|·buckets-active. Linear, no windows, no skew joints beyond
    * the user key itself. */
  def retentionCohorts(events: DataFrame,
      bucketNanos: Long = 7L * 24 * 3600 * 1000000000L,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(bucketNanos > 0, s"retentionCohorts: bucketNanos must be > 0")
    // integer DIV, not `/`: long / long is DOUBLE in Spark, and nanos
    // epochs (~1.7e18) exceed the 2^53 mantissa — the rounded quotient
    // could land events one bucket off. FLOOR semantics, not DIV's
    // truncate-toward-zero: a pre-1970 ts (negative nanos) must land in
    // the bucket BELOW zero like DuckDB's `//` — bucketNanos > 0 is
    // required above, so the remainder is negative exactly when the
    // truncated quotient sits one above the floor.
    val ev = normalizeTs(events, tsCol)
      .select(col(userCol), expr(
        s"(`$tsCol` DIV ${bucketNanos}L) - " +
          s"(CASE WHEN `$tsCol` % ${bucketNanos}L < 0 THEN 1 ELSE 0 END)").as("b"))
    val first = ev.groupBy(col(userCol)).agg(min(col("b")).as("cohort"))
    ev.join(first, userCol)
      .groupBy(col("cohort"), (col("b") - col("cohort")).as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** First-order event-type TRANSITION counts: for every consecutive
    * event pair in each user's (ts, order-col) timeline, count
    * (from_type, to_type) over the whole corpus — the Markov-chain
    * behavior model behind "what follows a view", anomaly scoring and
    * session simulation. Deterministic under ts ties via `orderCol`.
    * Scale shape: ONE sort-based window exchange on the user key (the
    * [[sessionize]] argument: a skewed user streams through the window
    * operator, never a group buffer) + one map-side-combined count over
    * ≤ |event types|² keys. */
  def typeTransitions(events: DataFrame,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", orderCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(orderCol))
    normalizeTs(events, tsCol)
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  // public: the streaming state store codegens these constructors.
  // `done` is the TERMINAL marker: completion or span-expiry is final —
  // without it a later event batch would restart the funnel with a
  // fresh t1 and emit a conversion the batch op never marks.
  case class FunnelPrefix(ts: Seq[Long], done: Boolean)
  case class FunnelConversion(user_id: Long, step_ts: Seq[Long])

  /** STREAMING funnel: emits one row per user the moment their ordered
    * step sequence completes (within `maxSpanNanos` of step 1 when set) —
    * the conversion stream, i.e. exactly the rows [[funnel]] marks
    * converted = 1. Per-user state is the greedy matched-prefix
    * timestamps (≤ steps.size longs — constant-size, unlike a buffered
    * event list). A user's outcome is FINAL on completion or span
    * expiry: the state collapses to a terminal marker (one boolean per
    * decided user) rather than being removed — removal would let later
    * events restart the funnel with a fresh t1 and emit a second
    * conversion the batch op never marks, and a stale re-armed timeout
    * below the advancing watermark would crash the query. The terminal
    * marker (and, without a span bound, an unconverted user's prefix)
    * lives for the stream's lifetime — the memory cost of exactly-once
    * per-user conversion semantics; batch replay is the compaction
    * path.
    *
    * Within each micro-batch events process in (ts, event_id) order, so
    * in-order streams reproduce [[funnel]]'s greedy path exactly under
    * ANY batch slicing (parity-tested). Known limit, the
    * [[sessionizeStream]] class of trade: a CROSS-batch late event that
    * lands before the already-matched prefix end cannot retroactively
    * rebuild a better path — batch replay (the [[funnel]] op) is the
    * compaction/audit step, same contract as the dedup stream's exact
    * batch sibling. */
  def funnelStream(events: Dataset[Event], steps: Seq[String],
      maxSpanNanos: Option[Long] = None,
      watermarkDelay: String = "1 hour"): Dataset[FunnelConversion] = {
    require(steps.nonEmpty, "funnelStream: steps must be non-empty")
    import events.sparkSession.implicits._
    val withTime = withEventTime(events.toDF())
      .withWatermark("event_time", watermarkDelay)
      .as[Event]
    withTime.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelPrefix, FunnelConversion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[FunnelPrefix]) =>
          if (state.hasTimedOut) {
            // watermark passed t1 + span: every remaining event either
            // precedes the watermark (cannot arrive) or lands past the
            // span — the funnel can never convert. TERMINAL, not
            // removed (see the state-machine note in the scaladoc).
            state.update(FunnelPrefix(Seq.empty, done = true))
            Iterator.empty
          } else if (state.getOption.exists(_.done)) {
            Iterator.empty // decided user: later events change nothing
          } else {
            var prefix = state.getOption.map(_.ts).getOrElse(Seq.empty[Long])
            var done = false
            val out = scala.collection.mutable.ArrayBuffer[FunnelConversion]()
            for (e <- it.toSeq.sortBy(e => (e.ts, e.event_id)) if !done) {
              val need = prefix.length
              if (need < steps.size && e.event_type == steps(need) &&
                  (need == 0 || e.ts > prefix.last)) {
                prefix = prefix :+ e.ts
                if (prefix.length == steps.size) {
                  // completed: emit iff within span (the batch op's
                  // converted=1 condition); either way the greedy path
                  // is final — matching [[funnel]], a span-failed
                  // completion is not retried with a later start
                  if (maxSpanNanos.forall(s => prefix.last - prefix.head <= s))
                    out += FunnelConversion(user, prefix)
                  done = true
                }
              }
            }
            if (done) state.update(FunnelPrefix(Seq.empty, done = true))
            else if (prefix.nonEmpty) {
              // ms deadline CEILED: flooring t1 and span separately can
              // land up to 2 ms early and reap state while an on-time
              // final step (ts == t1 + span exactly) is still possible
              val deadlineMs = maxSpanNanos.map(s => (prefix.head + s + 999999L) / 1000000L)
              // a deadline already behind the watermark must NOT be
              // re-armed (Spark rejects it and fails the query — the
              // no-data-for-this-key case, where the timeout never got
              // a firing batch of its own); the funnel is span-expired
              val expired = deadlineMs.exists(_ <= state.getCurrentWatermarkMs())
              state.update(
                if (expired) FunnelPrefix(Seq.empty, done = true)
                else FunnelPrefix(prefix, done = false))
              if (!expired) deadlineMs.foreach(state.setTimeoutTimestamp)
            }
            out.iterator
          }
      }
  }

  /** As-of join: attach to each left row the latest right row of the same
    * key with right time <= left time (inclusive) — the canonical
    * time-series enrichment ("state of X as of this event"). The reference
    * has no analogue; ANSI/DuckDB express it as ASOF JOIN.
    *
    * Spark-first shape: NOT a range join (whose candidate set is
    * |left|×|right| per key before pruning). Both sides are tagged and
    * unioned, then ONE window sorted on (key, time, side) carries each
    * right row's values forward with a running `last(ignoreNulls)`. Cost =
    * one hash exchange on key + one sort — linear in |left|+|right|, skew
    * bounded by the biggest single key, and the right row at exactly the
    * left timestamp is included because the right tag sorts first.
    *
    * Left rows with no prior right row keep NULLs (left-asof semantics);
    * filter on `<prefix><rightTs>` IS NOT NULL for inner-asof. If several
    * right rows share (key, time), the last one in (time, tag) order wins —
    * pre-aggregate the right side to unique (key, time) for deterministic
    * output.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    // all right values ride in ONE struct so the carried forward row is
    // atomic — per-column last() windows would stitch fields from
    // DIFFERENT right rows whenever a value column is null (the struct is
    // non-null per right row even when its fields are null). Null keys are
    // excluded from the right side: NULL = NULL joins nothing in the
    // equi/ASOF semantics this implements.
    // withColumn silently REPLACES an existing column: an input already
    // carrying an internal or output name would corrupt results, so fail
    // loudly instead.
    val reserved = Seq("__t", "__is_l", "__rrow", "__asof") ++ valueCols.map(prefix + _)
    val clash = reserved.filter(left.columns.contains)
    require(clash.isEmpty,
      s"asofJoin: left input already has reserved/output column(s) ${clash.mkString(", ")}")
    val r = right.filter(col(key).isNotNull)
      .select(col(key), col(rightTs).as("__t"),
        struct(valueCols.map(col): _*).as("__rrow"))
      .withColumn("__is_l", lit(0))
    val l = left.withColumn("__t", col(leftTs)).withColumn("__is_l", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__is_l"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = u.withColumn("__asof", last(col("__rrow"), ignoreNulls = true).over(w))
    valueCols.foldLeft(attached)((df, c) =>
        df.withColumn(prefix + c, col("__asof").getField(c)))
      .filter(col("__is_l") === 1)
      .drop("__rrow", "__asof", "__t", "__is_l")
  }

  /** Last-touch attribution: for every `targetType` event, the MOST
    * RECENT strictly-earlier `sourceType` event by the same user within
    * `withinNanos` — the marketing-attribution primitive (click →
    * purchase), and the "which upstream action explains this outcome"
    * query in general. STRICT precedence: a source at exactly the
    * target's timestamp does not attribute (ties sort targets first in
    * the carry-forward window); among same-timestamp sources the
    * highest event_id wins (the (ts, event_id) determinism rule all
    * event ops share).
    *
    * Spark-first shape: the [[asofJoin]] union + one-window
    * carry-forward — one hash exchange on user_id + one sort, linear in
    * |sources|+|targets|, never the |targets|×|sources| per-user join
    * the naive formulation plans. The horizon bound is a post-window
    * filter (the carried source is the globally latest one; if IT is
    * out of horizon, every earlier one is too).
    *
    * Returns one row per target event: (event_id, user_id, ts,
    * source_event_id, source_ts, lag_ns, attributed) — source fields
    * null and attributed = false when no in-horizon source precedes. */
  def attributeLastTouch(events: DataFrame, sourceType: String,
      targetType: String, withinNanos: Long,
      typeCol: String = "event_type", userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(withinNanos > 0, s"attributeLastTouch: withinNanos must be positive, got $withinNanos")
    val e = normalizeTs(events, tsCol)
      .select(col(idCol).as("event_id"), col(userCol).as("user_id"),
        col(tsCol).as("ts"), col(typeCol).as("__type"))
    // __flag: targets 0, sources 1 — at equal ts the target sorts FIRST,
    // so the running last(source) never sees a same-instant source
    val src = e.filter(col("__type") === sourceType)
      .select(col("user_id"), col("ts"), lit(1).as("__flag"),
        struct(col("event_id"), col("ts")).as("__src"),
        lit(null).cast("long").as("event_id"))
    val tgt = e.filter(col("__type") === targetType)
      .select(col("user_id"), col("ts"), lit(0).as("__flag"),
        lit(null).cast("struct<event_id:bigint,ts:bigint>").as("__src"),
        col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("__flag"), col("__src.event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inHorizon = col("__last").isNotNull &&
      col("__last.ts") >= col("ts") - withinNanos
    tgt.unionByName(src)
      .withColumn("__last", last(col("__src"), ignoreNulls = true).over(w))
      .filter(col("__flag") === 0)
      .select(col("event_id"), col("user_id"), col("ts"),
        when(inHorizon, col("__last.event_id")).as("source_event_id"),
        when(inHorizon, col("__last.ts")).as("source_ts"),
        when(inHorizon, col("ts") - col("__last.ts")).as("lag_ns"),
        inHorizon.as("attributed"))
  }

  // public: the streaming state store codegens these constructors
  case class LastSource(src_id: Long, src_ts: Long)
  case class Attribution(event_id: Long, user_id: Long, ts: Long,
      source_event_id: Option[Long], source_ts: Option[Long],
      lag_ns: Option[Long], attributed: Boolean)

  /** STREAMING last-touch attribution: one row per `targetType` event as
    * it arrives, attributed to the latest strictly-earlier `sourceType`
    * event by the same user within `withinNanos` — the streaming twin of
    * [[attributeLastTouch]] (parity-tested under micro-batch slicing).
    * Per-user state is ONE (source_id, source_ts) pair — constant-size —
    * reclaimed by event-time timeout once the watermark passes
    * source_ts + horizon (no future target can attribute to it), so
    * state is bounded by the users active inside one horizon, not the
    * stream's lifetime.
    *
    * Within a micro-batch events process in (ts, target-before-source,
    * event_id) order, reproducing the batch op's strict-precedence and
    * same-ts tie rules under any batch slicing of an in-order stream.
    * Known limit (the [[funnelStream]] class of trade): a CROSS-batch
    * late source older than an already-emitted target cannot
    * retroactively attribute it — batch replay is the audit path. */
  def attributeLastTouchStream(events: Dataset[Event], sourceType: String,
      targetType: String, withinNanos: Long,
      watermarkDelay: String = "1 hour"): Dataset[Attribution] = {
    require(withinNanos > 0,
      s"attributeLastTouchStream: withinNanos must be positive, got $withinNanos")
    import events.sparkSession.implicits._
    val withTime = withEventTime(events.toDF())
      .filter(col("event_type").isin(sourceType, targetType))
      .withWatermark("event_time", watermarkDelay)
      .as[Event]
    withTime.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSource, Attribution](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[LastSource]) =>
          if (state.hasTimedOut) {
            // watermark passed src_ts + horizon: no on-time target can
            // attribute to the stored source — reclaim
            state.remove()
            Iterator.empty
          } else {
            var src = state.getOption
            val out = scala.collection.mutable.ArrayBuffer[Attribution]()
            // targets before sources at equal ts = the batch op's strict
            // precedence (a same-instant source never attributes)
            val ordered = it.toSeq.sortBy(e =>
              (e.ts, if (e.event_type == targetType) 0 else 1, e.event_id))
            for (e <- ordered) {
              if (e.event_type == targetType) {
                val hit = src.filter(s => s.src_ts < e.ts && s.src_ts >= e.ts - withinNanos)
                out += Attribution(e.event_id, user, e.ts,
                  hit.map(_.src_id), hit.map(_.src_ts),
                  hit.map(s => e.ts - s.src_ts), hit.isDefined)
              } else if (src.forall(s =>
                  e.ts > s.src_ts || (e.ts == s.src_ts && e.event_id > s.src_id))) {
                src = Some(LastSource(e.event_id, e.ts))
              }
            }
            src match {
              case Some(s) =>
                // ms deadline CEILED (the funnelStream rule); a deadline
                // already behind the watermark cannot be re-armed —
                // the source is unreachable, reclaim now
                val deadlineMs = (s.src_ts + withinNanos + 999999L) / 1000000L
                if (deadlineMs <= state.getCurrentWatermarkMs()) state.remove()
                else { state.update(s); state.setTimeoutTimestamp(deadlineMs) }
              case None => state.remove()
            }
            out.iterator
          }
      }
  }

  /** Bounded-interval self-join: every ORDERED pair of events sharing
    * `keyCol` at most `withinUs` microseconds apart — burst detection,
    * co-occurrence mining, session-free "what happened together"
    * queries. Ordering is (time, event_id), so each unordered pair
    * emits exactly once and self-pairs never do.
    *
    * Spark-first shape: the naive `a.ts <= b.ts AND b.ts <= a.ts + Δ`
    * formulation has no equi-key, so Catalyst plans a broadcast-
    * nested-loop join — per-key quadratic and driver-bound. Instead
    * both sides bucket time at Δ (`t DIV Δ`): a qualifying pair spans
    * at most ADJACENT buckets, so probing (bucket, bucket+1) — a
    * 2× explode of the left side only — covers every candidate with a
    * plain hash equi-join on (key, bucket), then the exact time window
    * filters locally. Work = 2·|events| shuffle rows + per-(key,
    * bucket-pair) products: bounded by burst density at Δ, never by a
    * key's full history (the LSH banding argument applied to time).
    *
    * All comparisons run on µs-truncated LONGs (`ts DIV 1000`): the
    * parquet nanos survive only inside ts itself, so engines that read
    * TIMESTAMP at µs precision (DuckDB) reproduce the pair set and
    * gaps exactly.
    *
    * The pair OUTPUT is inherently quadratic in a key's burst density
    * (k events inside one Δ window ARE k²/2 pairs) — `maxPerKeyBucket`
    * > 0 drops (key, bucket) groups larger than the cap from both sides
    * (the [[graft.functions.Dedup.minHashCandidates]] maxBucketSize
    * convention: a bot key firing 10⁶ events in one window stops being
    * a job-killer, and the capped semantics are explicit rather than an
    * OOM). 0 = uncapped exact semantics (the gate/oracle setting).
    *
    * Returns (keyCol, event_a, event_b, gap_us), gap_us = b − a in µs.
    */
  def pairsWithin(events: DataFrame, withinUs: Long,
      keyCol: String = "user_id", maxPerKeyBucket: Int = 0): DataFrame = {
    require(withinUs > 0, s"pairsWithin: withinUs must be positive, got $withinUs")
    val raw = events.select(col(keyCol), col("event_id"),
      expr("ts DIV 1000").as("t_us"), expr(s"(ts DIV 1000) DIV $withinUs").as("bkt"))
    val base =
      if (maxPerKeyBucket <= 0) raw
      else raw.join(
        raw.groupBy(col(keyCol), col("bkt")).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxPerKeyBucket).select(col(keyCol), col("bkt")),
        Seq(keyCol, "bkt"), "left_anti")
    val left = base.select(col(keyCol), col("event_id").as("event_a"),
        col("t_us").as("a_us"),
        explode(array(col("bkt"), col("bkt") + 1)).as("jb"))
    val right = base.select(col(keyCol), col("event_id").as("event_b"),
      col("t_us").as("b_us"), col("bkt").as("jb"))
    left.join(right, Seq(keyCol, "jb"))
      .filter((col("b_us") > col("a_us")) ||
        (col("b_us") === col("a_us") && col("event_b") > col("event_a")))
      .filter(col("b_us") - col("a_us") <= withinUs)
      .select(col(keyCol), col("event_a"), col("event_b"),
        (col("b_us") - col("a_us")).as("gap_us"))
  }

  /** Session-level conversion analytics — the report layer over
    * [[sessionize]]: sessions bucketed by event-count band (1 / 2–4 /
    * 5–9 / 10+), each band reporting session count, converted-session
    * count (≥ 1 purchase), conversion rate and mean duration (seconds,
    * from µs-truncated bounds — the s2 oracle precision). The classic
    * engagement-vs-conversion curve as one gate-checkable table.
    *
    * Scale shape: the sessionize window exchange (user-keyed sort, the
    * s2 shape) followed by one ≤ 4-row aggregation. */
  def sessionStats(events: Dataset[Event], gapNanos: Long): DataFrame = {
    // per-bound µs truncation BEFORE the difference: the oracle's
    // MAX(epoch_us) − MIN(epoch_us), not DIV of the ns difference
    val per = sessionize(events, gapNanos).toDF()
      .select(col("n_events"), col("n_purchases"),
        (expr("end_ts DIV 1000") - expr("start_ts DIV 1000")).as("dur_us"))
    per
      .withColumn("len_bucket",
        when(col("n_events") === 1, "1").when(col("n_events") <= 4, "2-4")
          .when(col("n_events") <= 9, "5-9").otherwise("10+"))
      .groupBy(col("len_bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        count(when(col("n_purchases") > 0, 1)).as("n_converted"),
        round(count(when(col("n_purchases") > 0, 1)) /
          count(lit(1)).cast("double"), 6).as("conversion_rate"),
        round(avg(col("dur_us")) / 1000000.0, 6).as("mean_duration_s"))
  }

  /** Streaming twin of [[pairsWithin]]: a genuine STREAM-STREAM interval
    * self-join — the one Structured Streaming join shape the other twins
    * (all single-stream stateful ops) don't exercise. Both sides carry a
    * watermark and the join condition bounds `b_time` inside
    * [a_time, a_time + within], which is what lets Spark derive state
    * eviction: a buffered left row is dropped once the right watermark
    * passes a_time + within (and symmetrically), so state is bounded by
    * the interval × arrival rate, not the stream's history. The exact
    * pairing predicate (µs gap + id tie-break) rides along unchanged, so
    * emitted rows match the batch op row-for-row; the watermark only
    * decides WHEN a pair can no longer appear.
    *
    * Returns the batch schema: (keyCol, event_a, event_b, gap_us). */
  def pairsWithinStream(events: Dataset[Event], withinUs: Long,
      keyCol: String = "user_id",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(withinUs > 0, s"pairsWithinStream: withinUs must be positive, got $withinUs")
    val base = withEventTime(events.toDF())
    val a = base.select(col(keyCol).as("key_a"), col("event_id").as("event_a"),
        expr("ts DIV 1000").as("a_us"), col("event_time").as("a_time"))
      .withWatermark("a_time", watermarkDelay)
    val b = base.select(col(keyCol).as("key_b"), col("event_id").as("event_b"),
        expr("ts DIV 1000").as("b_us"), col("event_time").as("b_time"))
      .withWatermark("b_time", watermarkDelay)
    val spanSecs = withinUs / 1000000.0
    a.join(b,
        col("key_a") === col("key_b") &&
        col("b_time") >= col("a_time") &&
        col("b_time") <= col("a_time") + expr(s"make_dt_interval(0, 0, 0, $spanSecs)") &&
        (col("b_us") > col("a_us") ||
          (col("b_us") === col("a_us") && col("event_b") > col("event_a"))) &&
        col("b_us") - col("a_us") <= withinUs)
      .select(col("key_a").as(keyCol), col("event_a"), col("event_b"),
        (col("b_us") - col("a_us")).as("gap_us"))
  }

  /** Per-type windowed-count anomaly scores: events bucketed into
    * tumbling `bucketNanos` windows, each (event_type, bucket) count
    * z-scored against its own TRAILING history — mean/stddev over the
    * previous `trailing` observed buckets (ROWS BETWEEN trailing
    * PRECEDING AND 1 PRECEDING — the current bucket never scores
    * itself) — and flagged when z ≥ `zThreshold`. The spike-detection
    * monitoring primitive for event pipelines.
    *
    * Returns (event_type, bucket, cnt, zscore rounded 6 dp, anomaly).
    * zscore is NULL (anomaly false) until the trailing frame holds ≥ 2
    * buckets with positive stddev — sample stddev of a single bucket is
    * NaN in Spark but NULL in DuckDB, so the guard is also what makes
    * the op oracle-replicable. Buckets are FLOOR-divided (the
    * [[retentionCohorts]] negative-ts rule). Observed buckets only: a
    * silent bucket is absent, not zero — catching gone-QUIET anomalies
    * needs a calendar spine join (at scale: a broadcast range of
    * buckets), deliberately out of this op's scope.
    *
    * Scale shape: one map-side-combined count to ≤ |types|·|buckets|
    * rows, then one sort window partitioned by type — the exchange is
    * the aggregated series, never the raw events. */
  def windowAnomalies(events: DataFrame,
      bucketNanos: Long = 3600L * 1000000000L, trailing: Int = 6,
      zThreshold: Double = 3.0,
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(bucketNanos > 0, "windowAnomalies: bucketNanos must be > 0")
    require(trailing >= 2, s"windowAnomalies: trailing must be >= 2, got $trailing")
    val ev = normalizeTs(events, tsCol).select(col(typeCol).as("event_type"),
      expr(s"(`$tsCol` DIV ${bucketNanos}L) - " +
        s"(CASE WHEN `$tsCol` % ${bucketNanos}L < 0 THEN 1 ELSE 0 END)").as("bucket"))
    val counts = ev.groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(-trailing, -1)
    val z = (col("cnt") - avg(col("cnt")).over(w)) / stddev_samp(col("cnt")).over(w)
    val zGuarded = when(count(lit(1)).over(w) >= 2 &&
      stddev_samp(col("cnt")).over(w) > 0, z)
    counts.select(col("event_type"), col("bucket"), col("cnt"),
      round(zGuarded, 6).as("zscore"),
      coalesce(zGuarded >= zThreshold, lit(false)).as("anomaly"))
  }

  /** Top-k trending event types per tumbling bucket: per-bucket type
    * counts ranked (count desc, type asc — deterministic), cut at `k`,
    * with each type's share of the bucket's events. The "what's hot
    * right now" report over any categorical column.
    *
    * Scale shape: one map-side-combined (bucket, type) aggregation, a
    * bucket-total window over the AGGREGATED series only (≤ buckets ×
    * |types| rows — the [[windowAnomalies]] rule: windows never touch
    * raw events), rank cut on the same window exchange. */
  def trendingTypes(events: DataFrame, k: Int,
      bucketNanos: Long = 3600L * 1000000000L,
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(k >= 1, s"trendingTypes: k must be >= 1, got $k")
    require(bucketNanos > 0, "trendingTypes: bucketNanos must be > 0")
    val ev = normalizeTs(events, tsCol).select(col(typeCol).as("event_type"),
      expr(s"(`$tsCol` DIV ${bucketNanos}L) - " +
        s"(CASE WHEN `$tsCol` % ${bucketNanos}L < 0 THEN 1 ELSE 0 END)").as("bucket"))
    val counts = ev.groupBy(col("bucket"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val wb = Window.partitionBy(col("bucket"))
    val wr = wb.orderBy(desc("cnt"), col("event_type"))
    counts
      .withColumn("rank", row_number().over(wr))
      .withColumn("share", round(col("cnt") / sum(col("cnt")).over(wb), 6))
      .filter(col("rank") <= k)
      .select(col("bucket"), col("rank").cast("long").as("rank"),
        col("event_type"), col("cnt"), col("share"))
  }

  case class TypeCount(tpe: String, cnt: Long)
  case class TrendingRow(bucket: Long, rank: Long, event_type: String,
    cnt: Long, share: Double)

  /** Streaming twin of [[trendingTypes]]: per-bucket top-k emitted the
    * moment the watermark closes the bucket. State is keyed by BUCKET
    * (the inverse of [[windowAnomaliesStream]]'s per-type keying): a
    * group accumulates its (type → count) map while open and flushes
    * ranked rows on its event-time timeout at bucket end + delay —
    * state per key is |types| counters, reclaimed at flush, so total
    * state is bounded by open-buckets × type cardinality regardless of
    * stream length. Ranks/shares reproduce the batch op exactly
    * ((cnt desc, type) order, share = cnt/total rounded 6 dp half-up,
    * Spark ROUND's mode). */
  def trendingTypesStream(events: Dataset[Event], k: Int,
      bucketNanos: Long = 3600L * 1000000000L,
      watermarkDelay: String = "1 hour"): Dataset[TrendingRow] = {
    require(k >= 1, s"trendingTypesStream: k must be >= 1, got $k")
    require(bucketNanos > 0, "trendingTypesStream: bucketNanos must be > 0")
    import events.sparkSession.implicits._
    def bucketOf(ts: Long): Long =
      ts / bucketNanos - (if (ts % bucketNanos < 0) 1 else 0)
    def endMs(bucket: Long): Long = ((bucket + 1) * bucketNanos + 999999L) / 1000000L
    def flush(bucket: Long, counts: Seq[TypeCount]): Iterator[TrendingRow] = {
      val tot = counts.map(_.cnt).sum.toDouble
      counts.sortBy(tc => (-tc.cnt, tc.tpe)).take(k).zipWithIndex.map {
        case (tc, i) => TrendingRow(bucket, i + 1L, tc.tpe, tc.cnt,
          BigDecimal(tc.cnt / tot).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.iterator
    }
    val withTime = withEventTime(events.toDF())
      .withWatermark("event_time", watermarkDelay)
      .as[Event]
    withTime.groupByKey(e => bucketOf(e.ts))
      .flatMapGroupsWithState[Seq[TypeCount], TrendingRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucket: Long, it: Iterator[Event], state: GroupState[Seq[TypeCount]]) =>
          if (state.hasTimedOut) {
            val out = flush(bucket, state.get)
            state.remove()
            out
          } else {
            val m = scala.collection.mutable.Map(
              state.getOption.getOrElse(Seq.empty).map(tc => tc.tpe -> tc.cnt): _*)
            for (e <- it) m(e.event_type) = m.getOrElse(e.event_type, 0L) + 1
            val counts = m.toSeq.map { case (t, c) => TypeCount(t, c) }
            // the watermark can pass a bucket's end inside the SAME
            // micro-batch that delivered its last events — flush now
            // (the timeout would otherwise never fire for this group)
            if (endMs(bucket) <= state.getCurrentWatermarkMs()) {
              state.remove()
              flush(bucket, counts)
            } else {
              state.update(counts)
              state.setTimeoutTimestamp(endMs(bucket))
              Iterator.empty
            }
          }
      }
  }

  /** Active-user counts per tumbling bucket — the DAU/WAU primitive:
    * (bucket, active_users, n_events), FLOOR-bucketed (the
    * [[retentionCohorts]] rule). One map-side-combined aggregation;
    * `approximate = true` swaps countDistinct for HyperLogLog++
    * `approx_count_distinct` (±rsd) — the 100 TB tier where the
    * per-bucket distinct-user set no longer fits a shuffle: identical
    * plan shape, documented error, exact tier stays the oracle anchor
    * (the t14/t15 convention). */
  def activeUsers(events: DataFrame,
      bucketNanos: Long = 24L * 3600 * 1000000000L,
      approximate: Boolean = false, rsd: Double = 0.05,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(bucketNanos > 0, "activeUsers: bucketNanos must be > 0")
    val ev = normalizeTs(events, tsCol).select(col(userCol).as("u"),
      expr(s"(`$tsCol` DIV ${bucketNanos}L) - " +
        s"(CASE WHEN `$tsCol` % ${bucketNanos}L < 0 THEN 1 ELSE 0 END)").as("bucket"))
    val distinctAgg =
      if (approximate) approx_count_distinct(col("u"), rsd) else countDistinct(col("u"))
    ev.groupBy(col("bucket"))
      .agg(distinctAgg.as("active_users"), count(lit(1)).as("n_events"))
  }

  case class WindowAnomaly(event_type: String, bucket: Long, cnt: Long,
    zscore: Option[Double], anomaly: Boolean)
  case class BucketCount(bucket: Long, cnt: Long)
  case class AnomalyState(open: Seq[BucketCount], hist: Seq[Long])

  /** Streaming twin of [[windowAnomalies]]: one stateful operator keyed
    * by event type — state is the OPEN bucket counts plus the trailing
    * `trailing` CLOSED counts; a bucket closes (scores, emits, joins the
    * history) when the watermark passes its end, driven by an event-time
    * timeout armed at the earliest open bucket's end (the ceil-ms rule
    * [[funnelStream]] uses). Scoring matches the batch op exactly:
    * sample stddev over the previous closed buckets, NULL until ≥ 2
    * history entries with positive σ, 6-dp HALF_UP round — parity is
    * test-pinned against [[windowAnomalies]] on the same events.
    *
    * State per type is ≤ (open buckets within the watermark delay +
    * `trailing`) longs — bounded by wall-clock, not data volume. Events
    * later than an already-closed bucket are DROPPED (their bucket has
    * emitted; the watermark is the contract) — count-parity with batch
    * holds for buckets whose events all precede the watermark, the
    * standard streaming-vs-batch caveat. One framework boundary: an
    * event whose event-time EQUALS the current watermark (including
    * ts = 0 against the initial 0 watermark) is late by Spark's
    * strictly-greater predicate and never reaches the operator. */
  def windowAnomaliesStream(events: Dataset[Event],
      bucketNanos: Long = 3600L * 1000000000L, trailing: Int = 6,
      zThreshold: Double = 3.0,
      watermarkDelay: String = "1 hour"): Dataset[WindowAnomaly] = {
    require(bucketNanos > 0, "windowAnomaliesStream: bucketNanos must be > 0")
    require(trailing >= 2, s"windowAnomaliesStream: trailing must be >= 2, got $trailing")
    import events.sparkSession.implicits._
    def bucketOf(ts: Long): Long = // floor division (the retentionCohorts rule)
      ts / bucketNanos - (if (ts % bucketNanos < 0) 1 else 0)
    def endMs(bucket: Long): Long = ((bucket + 1) * bucketNanos + 999999L) / 1000000L
    def zOf(cnt: Long, hist: Seq[Long]): Option[Double] =
      if (hist.size < 2) None
      else {
        val mu = hist.sum.toDouble / hist.size
        val sd = math.sqrt(hist.map(x => (x - mu) * (x - mu)).sum / (hist.size - 1))
        if (sd > 0)
          Some(BigDecimal((cnt - mu) / sd)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None
      }
    val withTime = withEventTime(events.toDF())
      .withWatermark("event_time", watermarkDelay)
      .as[Event]
    withTime.groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomalyState, WindowAnomaly](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (tpe: String, it: Iterator[Event], state: GroupState[AnomalyState]) =>
          val st = state.getOption.getOrElse(AnomalyState(Seq.empty, Seq.empty))
          val open = scala.collection.mutable.Map(
            st.open.map(b => b.bucket -> b.cnt): _*)
          val wm = state.getCurrentWatermarkMs()
          for (e <- it) {
            val b = bucketOf(e.ts)
            // a bucket whose end is at or behind the watermark has either
            // emitted already or can never score consistently — drop
            if (endMs(b) > wm) open(b) = open.getOrElse(b, 0L) + 1
          }
          // close every open bucket the watermark has passed, in order
          val (closing, staying) = open.toSeq.sortBy(_._1).partition {
            case (b, _) => endMs(b) <= wm
          }
          var hist = st.hist
          val out = closing.map { case (b, cnt) =>
            val z = zOf(cnt, hist)
            hist = (hist :+ cnt).takeRight(trailing)
            WindowAnomaly(tpe, b, cnt, z, z.exists(_ >= zThreshold))
          }
          state.update(AnomalyState(
            staying.map { case (b, c) => BucketCount(b, c) }, hist))
          // re-arm at the earliest still-open bucket end (> wm by the
          // partition above); with no open bucket the history just waits
          staying.headOption.foreach { case (b, _) =>
            state.setTimeoutTimestamp(endMs(b)) }
          out.iterator
      }
  }
}
