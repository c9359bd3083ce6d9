package graft

import graft.functions.Multimodal
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import graft.analytics.GraphAnalytics
import graft.bench.MailGraph
import graft.model.RangeDef
import graft.sources.Loaders
import graft.sources.Loaders.InputEdge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  /** Flattened message of a wrapped-exception chain: the zero-extra-job
    * guards (assert_true/raise_error inside operator plans) surface
    * wrapped in SparkException at action time — assertions walk the
    * whole cause chain for the guard's message. */
  private def chainMsg(t: Throwable): String =
    if (t == null) "" else s"${t.getMessage} | ${chainMsg(t.getCause)}"

  test("streaming windowed counts == batch windowed counts (memory sink)") {
    val batch = EventStreams.windowedTypeCounts(
      spark.read.parquet(s"$sfDir/events.parquet"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    // FileStreamSource needs a directory of files, not a single file
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    java.nio.file.Files.copy(java.nio.file.Path.of(s"$sfDir/events.parquet"),
      java.nio.file.Path.of(s"$dir/events.parquet"))
    val stream = EventStreams.readEventStream(spark, dir)
    val q = EventStreams.windowedTypeCounts(stream)
      .writeStream.outputMode("complete").format("memory").queryName("wincounts").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("wincounts")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stateless text ops run unchanged on a stream (normalize + quality + langId)") {
    import graft.functions.TextAnalysis
    val docsPath = "/root/testdata/sf0.001/documents.parquet"
    def features(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.normalizeText(TextAnalysis.qualityFeatures(df))
        .withColumn("lang_pred", TextAnalysis.langId(col("text")))
        .select("doc_id", "text_norm", "quality_score", "lang_pred")
    val batch = features(spark.read.parquet(docsPath))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_textstream").toString
    java.nio.file.Files.copy(java.nio.file.Path.of(docsPath),
      java.nio.file.Path.of(s"$dir/documents.parquet"))
    val schema = spark.read.parquet(docsPath).schema
    // the same code runs batch and stream: narrow projections (incl. the
    // native graft_nfc expression) impose no stateful operator, so append
    // mode works with no watermark
    val q = features(spark.readStream.schema(schema).parquet(dir))
      .writeStream.outputMode("append").format("memory").queryName("text_norm_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("text_norm_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("sessionize: hand-built gap sessions") {
    val h = 3600L * 1000000000L // 1h in nanos
    val evs = Seq(
      Event(1, 0L, 7L, "view", 0.0), Event(2, h / 2, 7L, "purchase", 1.0),
      Event(3, 3 * h, 7L, "view", 0.0), // gap > 1h → new session
      Event(4, 0L, 8L, "click", 0.0)).toDS()
    val sessions = EventStreams.sessionize(evs, gapNanos = h)
      .collect().map(s => (s.user_id, s.start_ts, s.n_events, s.n_purchases)).toSet
    assert(sessions === Set((7L, 0L, 2, 1), (7L, 3 * h, 1, 0), (8L, 0L, 1, 0)))
  }

  test("sessionize batch path is a window exchange, survives a skewed key") {
    val h = 3600L * 1000000000L
    // one pathological user with 50k events, every one its own session
    // (2h apart, 1h gap) — the gaps-and-islands form streams this through
    // a sort-based window; the old flatMapGroupsWithState path buffered the
    // whole user in one executor's memory
    val evs = (0 until 50000).map(i => Event(i.toLong, i.toLong * 2 * h, 7L, "view", 0.0)) :+
      Event(100000L, h, 8L, "purchase", 1.0)
    val sessions = EventStreams.sessionize(evs.toDS(), gapNanos = h)
    val plan = sessions.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"batch sessionize must be a window plan:\n$plan")
    assert(!plan.contains("FlatMapGroupsWithState"),
      "batch path must not buffer whole users in state")
    assert(sessions.count() === 50001)
    assert(sessions.filter(col("user_id") === 8L).collect()
      .map(s => (s.n_events, s.n_purchases)).toSeq === Seq((1, 1)))
  }

  test("sessionizeStream: state across micro-batches, event-time timeout closure") {
    val h = 3600L * 1000000000L
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_stream").toString
    def push(evs: Seq[Event]): Unit =
      evs.toDF().coalesce(1).write.mode("append").parquet(dir)
    // batch 1: user 7's first session closes WITHIN the batch (gap 1h
    // exceeded at 6h); the 6h event stays open in state. Times start at 1h:
    // ts=0 equals the initial watermark and would be dropped as late.
    push(Seq(Event(1, h, 7L, "view", 0.0), Event(2, h + h / 2, 7L, "purchase", 1.0),
      Event(3, 6 * h, 7L, "view", 0.0)))
    val src = EventStreams.readEventStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val q = EventStreams.sessionizeStream(src, gapNanos = h, watermarkDelay = "1 second")
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("sess_out").collect()
      assert(afterB1.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet ===
        Set((7L, h, 2))) // in-batch closure only; 6h session still open
      // batch 2 advances the watermark past 7h; batch 3's run fires the
      // event-time timeout registered at 7h
      push(Seq(Event(4, 10 * h, 8L, "click", 0.0)))
      q.processAllAvailable()
      push(Seq(Event(5, 11 * h, 8L, "click", 0.0)))
      q.processAllAvailable()
      val sessions = spark.table("sess_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      assert(sessions.contains((7L, 6 * h, 1)), s"timed-out session missing: $sessions")
    } finally q.stop()
  }

  test("retentionCohorts: first-event cohorting, decay, returning users, offset-0 size") {
    val w = 7L * 24 * 3600 * 1000000000L
    // cohort week 0: users 1 (active weeks 0,1,2), 2 (0,1), 3 (0 only —
    // churned), user 3 has TWO events in week 0 (distinct must collapse);
    // cohort week 1: user 4 (1, then SKIPS 2, returns week 3)
    val ev = Seq(
      (1L, 0L, 1L), (2L, w + 1, 1L), (3L, 2 * w + 5, 1L),
      (4L, 10L, 2L), (5L, w + 9, 2L),
      (6L, 20L, 3L), (7L, 30L, 3L),
      (8L, w + 2, 4L), (9L, 3 * w + 7, 4L)
    ).toDF("event_id", "ts", "user_id")
    val out = EventStreams.retentionCohorts(ev, bucketNanos = w)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (0L, 0L) -> 3L, // cohort size: users 1,2,3 (user 3's two events count once)
      (0L, 1L) -> 2L, // users 1,2 retained
      (0L, 2L) -> 1L, // only user 1
      (1L, 0L) -> 1L, // cohort 1 = user 4
      (1L, 2L) -> 1L  // user 4 returns at offset 2 (no offset-1 row: gap weeks emit nothing)
    ))
  }

  test("readEventStream: empty dir falls back to the pinned schema, bad path stays loud") {
    // the narrowed catch must still serve the original purpose (schema
    // inference needs >= 1 footer; an empty landing dir is the normal
    // stream-start state) ...
    val empty = java.nio.file.Files.createTempDirectory("graft_empty_stream").toString
    val src = EventStreams.readEventStream(spark, empty)
    assert(src.isStreaming && src.schema.fieldNames.contains("ts"))
    // ... while anything that is NOT the missing-footer case (here: a
    // readable dir whose parquet footer is garbage) surfaces at the
    // call, not later as a schema mismatch deep in a query
    val bad = java.nio.file.Files.createTempDirectory("graft_bad_stream").toString
    java.nio.file.Files.write(java.nio.file.Path.of(s"$bad/junk.parquet"),
      "not a parquet file".getBytes)
    intercept[Exception] { EventStreams.readEventStream(spark, bad) }
  }

  test("retentionCohorts: pre-1970 ts buckets with FLOOR semantics (DuckDB // parity)") {
    val w = 7L * 24 * 3600 * 1000000000L
    // user 1's first event is half a week BEFORE the epoch: floor lands
    // it in bucket -1 (DuckDB's `//`), truncate-toward-zero (DIV) would
    // land it in bucket 0 and silently merge the cohorts. User 1 returns
    // in bucket 0 → offset 1; an exactly-divisible negative ts (user 2,
    // -w) floors to -1 with no correction.
    val ev = Seq(
      (1L, -w / 2, 1L), (2L, 5L, 1L),
      (3L, -w, 2L)
    ).toDF("event_id", "ts", "user_id")
    val out = EventStreams.retentionCohorts(ev, bucketNanos = w)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (-1L, 0L) -> 2L, // users 1 and 2 both cohort at bucket -1
      (-1L, 1L) -> 1L  // user 1 returns in bucket 0 = offset 1
    ))
  }

  test("typeTransitions: per-user chains, ts ties broken by event_id, cross-user isolation") {
    // user 1: a→b→a (ties at ts=5 ordered by event_id: 2 before 3);
    // user 2: single event — no transition; chains never cross users
    val ev = Seq(
      (1L, 1L, 1L, "a"), (2L, 5L, 1L, "b"), (3L, 5L, 1L, "a"),
      (4L, 9L, 2L, "c")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventStreams.typeTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("a", "b") -> 1L, ("b", "a") -> 1L))
  }

  test("activeUsers: distinct per bucket, floor semantics, approx tier within rsd") {
    val day = 24L * 3600 * 1000000000L
    // day 0: users 1,1,2 (2 distinct, 3 events); day 1: user 3;
    // day -1 (negative ts, floor): user 9
    val ev = Seq((1L, 1000L, 1L), (2L, 2000L, 1L), (3L, 3000L, 2L),
      (4L, day + 5L, 3L), (5L, -day / 2, 9L))
      .toDF("event_id", "ts", "user_id")
    val out = EventStreams.activeUsers(ev, bucketNanos = day).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(0L -> ((2L, 3L)), 1L -> ((1L, 1L)), -1L -> ((1L, 1L))))
    // the HLL++ tier: same schema, counts within the configured rsd on
    // this tiny fixture (exact at these cardinalities in practice)
    val approx = EventStreams.activeUsers(ev, bucketNanos = day, approximate = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((b, (exact, _)) <- out)
      assert(math.abs(approx(b) - exact) <= math.max(1L, (exact * 0.15).toLong))
  }

  test("windowAnomalies: trailing z-score flags the spike, warmup buckets stay null") {
    val h = 3600L * 1000000000L
    // type "a": counts 2,2,2,2,10 over buckets 0..4 — bucket 4 spikes;
    // type "b": constant 3s — stddev 0, never scores
    def burst(tpe: String, bucket: Long, n: Int, base: Long) =
      (0 until n).map(i => (base + i, bucket * h + i * 1000L, 1L, tpe))
    val rows = burst("a", 0, 2, 100) ++ burst("a", 1, 2, 200) ++
      burst("a", 2, 2, 300) ++ burst("a", 3, 2, 400) ++ burst("a", 4, 10, 500) ++
      (0L to 2L).flatMap(b => burst("b", b, 3, 900 + b * 10))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type")
    val out = EventStreams.windowAnomalies(ev, bucketNanos = h,
        trailing = 3, zThreshold = 2.0).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          r.getBoolean(4))).toMap
    // bucket 0 has no history, bucket 1 has one prior bucket → null z;
    // buckets 2-3: constant history → sd = 0 → null z
    assert(out(("a", 0L)) === ((2L, None, false)))
    assert(out(("a", 1L)) === ((2L, None, false)))
    assert(out(("a", 2L)) === ((2L, None, false)))
    assert(out(("a", 3L)) === ((2L, None, false)))
    // bucket 4 vs history {2,2,2}: sd = 0 → still null — so shift: make
    // bucket 3's count differ to give positive sd
    val rows2 = burst("a", 0, 2, 100) ++ burst("a", 1, 2, 200) ++
      burst("a", 2, 4, 300) ++ burst("a", 3, 2, 400) ++ burst("a", 4, 10, 500)
    val out2 = EventStreams.windowAnomalies(rows2.toDF("event_id", "ts", "user_id", "event_type"),
        bucketNanos = h, trailing = 3, zThreshold = 2.0).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          r.getBoolean(4))).toMap
    // bucket 4: history {2,4,2} → mu = 8/3, sd = sqrt(4/3);
    // z = (10 − 8/3)/sqrt(4/3) ≈ 6.3509 → anomaly
    val expZ = (10.0 - 8.0 / 3) / math.sqrt(4.0 / 3)
    assert(out2(("a", 4L))._2.exists(z => math.abs(z - expZ) < 1e-5))
    assert(out2(("a", 4L))._3)
    // bucket 3: history {2,2,4} → z = (2 − 8/3)/sqrt(4/3) < 0 → no flag
    assert(out2(("a", 3L))._2.exists(_ < 0) && !out2(("a", 3L))._3)
    // constant type "b" never scores
    assert(out.collect { case ((t, _), v) if t == "b" => v }
      .forall(v => v._2.isEmpty && !v._3))
  }

  test("windowAnomaliesStream: closed buckets match the batch op across micro-batches") {
    val h = 3600L * 1000000000L
    // (i+1): an event at ts = 0 EXACTLY is dropped by Spark's late-row
    // filter (strictly-greater-than-watermark predicate, initial
    // watermark 0) before it reaches the stateful operator — a
    // framework boundary, noted in the op's scaladoc
    def burst(bucket: Long, n: Int, base: Long): Seq[Event] =
      (0 until n).map(i => Event(base + i, bucket * h + (i + 1) * 1000L, 1L, "a", 0.0))
    // the batch test's discriminating series: 2,2,4,2,10 over buckets 0-4
    val b1 = burst(0, 2, 100) ++ burst(1, 2, 200)
    val b2 = burst(2, 4, 300) ++ burst(3, 2, 400)
    val b3 = burst(4, 10, 500)
    // flush far ahead so the watermark passes bucket 4's end (5h + 1h delay)
    val flush = Seq(Event(999, 10 * h, 9L, "zz", 0.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_anom_stream").toString
    def push(evs: Seq[Event]): Unit =
      evs.toDF().coalesce(1).write.mode("append").parquet(dir)
    push(b1)
    val src = EventStreams.readEventStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val q = EventStreams.windowAnomaliesStream(src, bucketNanos = h,
        trailing = 3, zThreshold = 2.0)
      .writeStream.outputMode("append").format("memory").queryName("anom_out").start()
    try {
      q.processAllAvailable()
      push(b2); q.processAllAvailable()
      push(b3); q.processAllAvailable()
      push(flush); q.processAllAvailable()
      val streamed = spark.table("anom_out").collect()
        .filter(_.getString(0) == "a")
        .map(r => r.getLong(1) -> (r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4))).toMap
      val batch = EventStreams.windowAnomalies((b1 ++ b2 ++ b3).toDF(),
          bucketNanos = h, trailing = 3, zThreshold = 2.0).collect()
        .map(r => r.getLong(1) -> (r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4))).toMap
      assert(streamed.keySet === batch.keySet) // all 5 buckets closed
      for ((b, (cnt, z, an)) <- batch) {
        assert(streamed(b)._1 === cnt, s"bucket $b count")
        assert(streamed(b)._3 === an, s"bucket $b flag")
        (streamed(b)._2, z) match {
          case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-6, s"bucket $b z")
          case (a, b2) => assert(a === b2, s"bucket $b z nullness")
        }
      }
      assert(streamed(4L)._3, "the spike bucket must flag")
    } finally q.stop()
  }

  test("funnelStream: conversions across micro-batches == batch funnel's converted rows") {
    val h = 3600L * 1000000000L
    val steps = Seq("view", "click", "purchase")
    // user 7 completes across THREE batches; user 8 completes but past
    // the span bound (must emit nothing); user 9 never completes
    val b1 = Seq(Event(1, h, 7L, "view", 0.0), Event(2, h, 8L, "view", 0.0),
      Event(3, h, 9L, "view", 0.0))
    val b2 = Seq(Event(4, 2 * h, 7L, "click", 0.0), Event(5, 2 * h, 8L, "click", 0.0))
    val b3 = Seq(Event(6, 3 * h, 7L, "purchase", 0.0), Event(7, 50 * h, 8L, "purchase", 0.0))
    val span = Some(10L * h)
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_stream").toString
    def push(evs: Seq[Event]): Unit =
      evs.toDF().coalesce(1).write.mode("append").parquet(dir)
    push(b1)
    val src = EventStreams.readEventStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val q = EventStreams.funnelStream(src, steps, span)
      .writeStream.outputMode("append").format("memory").queryName("funnel_out").start()
    try {
      q.processAllAvailable()
      push(b2); q.processAllAvailable()
      push(b3); q.processAllAvailable()
      val streamed = spark.table("funnel_out").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
      // batch reference over the union: exactly the converted=1 rows
      val batch = EventStreams.funnel((b1 ++ b2 ++ b3).toDF().drop("value"), steps, span)
        .filter(col("converted") === 1).collect()
        .map(r => (r.getLong(0), Seq(r.getLong(1), r.getLong(2), r.getLong(3)))).toSet
      assert(streamed === batch)
      assert(streamed === Set((7L, Seq(h, 2 * h, 3 * h)))) // 8 span-failed, 9 incomplete
      // decided users are TERMINAL: a fresh full funnel for user 7 (a
      // second conversion the batch op would never emit) and new events
      // for user 9 (whose prefix deadline t1+span=11h is far below the
      // 50h watermark — a naive timeout re-arm would crash the query)
      // must both emit nothing and not fail
      push(Seq(Event(8, 60 * h, 7L, "view", 0.0), Event(9, 61 * h, 7L, "click", 0.0),
        Event(10, 62 * h, 7L, "purchase", 0.0), Event(11, 63 * h, 9L, "click", 0.0)))
      q.processAllAvailable()
      val after = spark.table("funnel_out").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
      assert(after === streamed, "a decided user restarted or a stale timeout re-armed")
    } finally q.stop()
  }

  test("pairsWithinStream: stream-stream interval self-join == batch pairs across micro-batches") {
    val us = 1000000000L // ts nanos → µs is DIV 1000; pairs within 1000 s
    // user 1: a chain spanning batches (1@10s, 2@510s, 3@1510s):
    // (1,2) in-window, (2,3) in-window, (1,3) gap 1500s > 1000s — out.
    // user 2: same-ts tie (4,5) — id tie-break keeps exactly one order.
    // user 3: isolated event, no pairs. Times start ABOVE epoch 0: the
    // initial watermark is epoch 0 and a row AT it is dropped as late.
    def ev(id: Long, secs: Long, u: Long) = Event(id, secs * 1000000000L, u, "e", 0.0)
    val b1 = Seq(ev(1, 10, 1L), ev(4, 100, 2L), ev(5, 100, 2L), ev(9, 200, 3L))
    val b2 = Seq(ev(2, 510, 1L))
    val b3 = Seq(ev(3, 1510, 1L),
      ev(99, 999999, 9L)) // watermark flush far past every interval
    val dir = java.nio.file.Files.createTempDirectory("graft_pairs_stream").toString
    def push(evs: Seq[Event]): Unit =
      evs.toDF().coalesce(1).write.mode("append").parquet(dir)
    push(b1)
    val src = EventStreams.readEventStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val q = EventStreams.pairsWithinStream(src, withinUs = us,
        watermarkDelay = "1 second")
      .writeStream.outputMode("append").format("memory").queryName("pairs_out").start()
    try {
      q.processAllAvailable()
      push(b2); q.processAllAvailable()
      push(b3); q.processAllAvailable()
      val streamed = spark.table("pairs_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = EventStreams.pairsWithin((b1 ++ b2 ++ b3).toDF(), withinUs = us)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed === batch)
      assert(streamed === Set(
        (1L, 1L, 2L, 500000000L), (1L, 2L, 3L, 1000000000L),
        (2L, 4L, 5L, 0L)))
    } finally q.stop()
  }

  test("sessionStats: length bands, conversion rate, µs-truncated mean duration") {
    val g = 3600L * 1000000000L
    def ev(id: Long, t: Long, u: Long, tpe: String) = Event(id, t, u, tpe, 0.0)
    val evs = Seq(
      ev(1, 1500L, 1L, "view"),                        // user 1: lone event → "1"
      ev(2, 0L, 2L, "view"), ev(3, 1000L, 2L, "click"),
      ev(4, 3000L, 2L, "purchase"),                    // user 2: 3 events, converts, dur 3 µs... ns!
      ev(5, 10L, 3L, "view"), ev(6, 2000000L, 3L, "view") // user 3: 2 events, no purchase
    ).toDS()
    val out = EventStreams.sessionStats(evs, gapNanos = g)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // "1": one session, no conversion, duration 0
    assert(out("1") === ((1L, 0L, 0.0, 0.0)))
    // "2-4": two sessions (users 2 and 3), one converted; durations in µs
    // after per-bound truncation: user 2 = 3000 DIV 1000 = 3 µs → 3e-6 s,
    // user 3 = 2000 − 0 = 2000 µs → 2e-3 s; mean = (3e-6 + 2e-3)/2
    val expMean = math.rint(((3.0 + 2000.0) / 2 / 1e6) * 1e6) / 1e6
    assert(out("2-4") === ((2L, 1L, 0.5, expMean)))
  }

  test("trendingTypesStream: buckets flush ranked on watermark close, parity with batch") {
    val h = 3600L * 1000000000L
    // bucket 1: a×3, b×2, c×1 split across two micro-batches; bucket 2:
    // tie x/y; bucket 9: the watermark flush rider
    def ev(id: Long, t: Long, tpe: String) = Event(id, t, 1L, tpe, 0.0)
    val b1 = Seq(ev(1, h + 1, "a"), ev(2, h + 2, "a"), ev(3, h + 3, "b"))
    val b2 = Seq(ev(4, h + 4, "a"), ev(5, h + 5, "b"), ev(6, h + 6, "c"),
      ev(7, 2 * h + 1, "x"), ev(8, 2 * h + 2, "x"), ev(9, 2 * h + 3, "y"), ev(10, 2 * h + 4, "y"))
    val b3 = Seq(ev(99, 9 * h, "z")) // advances the watermark past buckets 1-2
    val dir = java.nio.file.Files.createTempDirectory("graft_trend_stream").toString
    def push(evs: Seq[Event]): Unit =
      evs.toDF().coalesce(1).write.mode("append").parquet(dir)
    push(b1)
    val src = EventStreams.readEventStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val q = EventStreams.trendingTypesStream(src, k = 2, watermarkDelay = "1 second")
      .writeStream.outputMode("append").format("memory").queryName("trend_out").start()
    try {
      q.processAllAvailable()
      push(b2); q.processAllAvailable()
      push(b3); q.processAllAvailable()
      val streamed = spark.table("trend_out")
        .filter(col("bucket").isin(1L, 2L)).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getString(2), r.getLong(3), r.getDouble(4)))).toMap
      val batch = EventStreams.trendingTypes((b1 ++ b2).toDF(), k = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getString(2), r.getLong(3), r.getDouble(4)))).toMap
      assert(streamed === batch)
      // cross-batch accumulation: a counted 3 across b1+b2
      assert(streamed((1L, 1L)) === (("a", 3L, 0.5)))
      assert(streamed((2L, 1L)) === (("x", 2L, 0.5))) // tie → type asc
    } finally q.stop()
  }

  test("trendingTypes: per-bucket rank, deterministic ties, share sums to 1, k cut") {
    // bucket 0: a×3, b×2, c×1 (share 0.5/0.333333/0.166667); bucket 1:
    // x and y tied at 2 — type asc breaks the tie
    val ev = Seq((1L, 1L, "a"), (2L, 2L, "a"), (3L, 3L, "a"), (4L, 4L, "b"),
      (5L, 5L, "b"), (6L, 6L, "c"),
      (7L, 15L, "y"), (8L, 16L, "y"), (9L, 17L, "x"), (10L, 18L, "x"))
      .toDF("event_id", "ts", "event_type").withColumn("user_id", lit(1L))
    val out = EventStreams.trendingTypes(ev, k = 2, bucketNanos = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.size === 4) // k=2 cut: c (rank 3) never emits
    assert(out((0L, 1L)) === (("a", 3L, 0.5)))
    assert(out((0L, 2L)) === (("b", 2L, 0.333333)))
    assert(out((1L, 1L)) === (("x", 2L, 0.5)))  // tie: x before y
    assert(out((1L, 2L)) === (("y", 2L, 0.5)))
  }

  test("attributeLastTouch: strict precedence, horizon bound, same-ts ties, per-user isolation") {
    val ev = Seq(
      // user 1: two clicks then purchase — latest click attributes
      Event(1, 10L, 1L, "click", 0.0), Event(2, 20L, 1L, "click", 0.0),
      Event(3, 25L, 1L, "purchase", 0.0),
      // user 1: later purchase outside the 50ns horizon of click 20
      Event(4, 100L, 1L, "purchase", 0.0),
      // user 2: click at the SAME ts as the purchase — strict < rejects
      Event(5, 30L, 2L, "click", 0.0), Event(6, 30L, 2L, "purchase", 0.0),
      // user 2: two same-ts clicks — the higher event_id wins
      Event(7, 40L, 2L, "click", 0.0), Event(8, 40L, 2L, "click", 0.0),
      Event(9, 45L, 2L, "purchase", 0.0),
      // user 3: purchase with no clicks at all (user 1's must not leak)
      Event(10, 15L, 3L, "purchase", 0.0))
    val out = EventStreams.attributeLastTouch(ev.toDF(), "click", "purchase", 50L)
      .collect().map(r => r.getLong(0) -> ((
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]), r.getBoolean(6)))).toMap
    assert(out.keySet === Set(3L, 4L, 6L, 9L, 10L)) // one row per purchase
    assert(out(3L) === ((Some(2L), Some(5L), true)))   // latest click, lag 5
    assert(out(4L) === ((None, None, false)))          // 80ns > horizon
    assert(out(6L) === ((None, None, false)))          // same-ts click rejected
    assert(out(9L) === ((Some(8L), Some(5L), true)))   // same-ts tie: max id
    assert(out(10L) === ((None, None, false)))         // cross-user isolation
    // one window over one exchange, no per-user join explosion
    val plan = EventStreams.attributeLastTouch(ev.toDF(), "click", "purchase", 50L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.toLowerCase.contains("cartesianproduct"))
  }

  test("attributeLastTouchStream: micro-batch parity with the batch op") {
    val h = 3600L * 1000000000L
    // user 1 click + purchase across batches (attributes), then a second
    // purchase beyond the horizon; user 2 same-ts click/purchase split
    // across batches (strict < must reject); user 3 same-batch pair
    val b1 = Seq(Event(1, h, 1L, "click", 0.0), Event(2, 2 * h, 2L, "click", 0.0))
    val b2 = Seq(Event(3, 2 * h + 1, 1L, "purchase", 0.0),
      Event(4, 2 * h, 2L, "purchase", 0.0))
    val b3 = Seq(Event(5, 20 * h, 1L, "purchase", 0.0),
      Event(6, 10 * h, 3L, "click", 0.0), Event(7, 10 * h + 5, 3L, "purchase", 0.0))
    val within = 5L * h
    val dir = java.nio.file.Files.createTempDirectory("graft_attr_stream").toString
    def push(evs: Seq[Event]): Unit =
      evs.toDF().coalesce(1).write.mode("append").parquet(dir)
    push(b1)
    val src = EventStreams.readEventStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val q = EventStreams.attributeLastTouchStream(src, "click", "purchase", within)
      .writeStream.outputMode("append").format("memory").queryName("attr_out").start()
    try {
      q.processAllAvailable()
      push(b2); q.processAllAvailable()
      push(b3); q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]), r.getBoolean(6))
      val streamed = spark.table("attr_out").collect().map(key).toSet
      val batch = EventStreams.attributeLastTouch(
        (b1 ++ b2 ++ b3).toDF(), "click", "purchase", within).collect().map(key).toSet
      assert(streamed === batch)
      assert(streamed === Set(
        (3L, 1L, 2 * h + 1, Some(1L), Some(h), Some(h + 1), true),
        (4L, 2L, 2 * h, None, None, None, false),       // same-ts, strict
        (5L, 1L, 20 * h, None, None, None, false),      // beyond horizon
        (7L, 3L, 10 * h + 5, Some(6L), Some(10 * h), Some(5L), true)))
    } finally q.stop()
  }

  test("asofJoin: latest right row at-or-before each left row, per key") {
    val trades = Seq((1L, 7L, 100L), (2L, 7L, 200L), (3L, 8L, 150L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq((7L, 50L, 1.0), (7L, 100L, 2.0), (7L, 150L, 3.0), (9L, 10L, 9.0))
      .toDF("sym", "t", "px")
    val j = EventStreams.asofJoin(trades, quotes, "sym", "t", "t", Seq("t", "px"))
      .collect().map(r => (r.getLong(0),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    assert(j === Set(
      (1L, Some(100L), Some(2.0)),  // same-ts quote included (inclusive asof)
      (2L, Some(150L), Some(3.0)),  // latest quote before t=200
      (3L, None, None)))            // sym 8 has no quotes → left-asof nulls
    // one exchange on the key, no range-join explosion
    val plan = EventStreams.asofJoin(trades, quotes, "sym", "t", "t", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.toLowerCase.contains("cartesianproduct"))
  }

  test("funnel: ordered-step matching, strict ordering, span bound, prefix property") {
    // user 1: full in-order funnel view(10) → click(20) → purchase(30)
    // user 2: click BEFORE view — step 2 must not match (strictly later
    //         than t1 required), later click(40) does; no purchase
    // user 3: view and click at the SAME ts — strict > rejects it
    // user 4: full funnel but purchase beyond the span bound
    // user 5: purchase only — no view ⇒ no funnel row at all
    val ev = Seq(
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"), (3L, 30L, 1L, "purchase"),
      (4L, 5L, 2L, "click"), (5L, 10L, 2L, "view"), (6L, 40L, 2L, "click"),
      (7L, 10L, 3L, "view"), (8L, 10L, 3L, "click"),
      (9L, 10L, 4L, "view"), (10L, 20L, 4L, "click"), (11L, 500L, 4L, "purchase"),
      (12L, 10L, 5L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventStreams.funnel(ev, Seq("view", "click", "purchase"),
        maxSpanNanos = Some(100L)).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(out(1L) === ((Some(10L), Some(20L), Some(30L), 3L, 1L)))
    assert(out(2L) === ((Some(10L), Some(40L), None, 2L, 0L)))    // pre-view click skipped
    assert(out(3L) === ((Some(10L), None, None, 1L, 0L)))         // same-ts not strictly later
    assert(out(4L) === ((Some(10L), Some(20L), Some(500L), 3L, 0L))) // completed, span-failed
    // without a span bound user 4 converts
    val noSpan = EventStreams.funnel(ev, Seq("view", "click", "purchase")).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(noSpan(4L) === 1L)
    // single-step funnel: every user with that event, n_steps = converted = 1
    val one = EventStreams.funnel(ev, Seq("purchase")).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(one === Set((1L, 1L, 1L), (4L, 1L, 1L), (5L, 1L, 1L)))
  }

  test("pairsWithin: bucketed range join ≡ naive inequality join; equi-join plan") {
    // ts in NANOS (the events-table shape); Δ = 10 µs = 10,000 ns.
    // Crafted to cross bucket boundaries: 9→11 µs spans buckets 0/1;
    // 11→21 spans 1/2; 9→21 (12 µs apart) must NOT pair; the t=30
    // duplicate pair orders by event_id.
    val ev = Seq((1L, 9000L, 5L), (2L, 11000L, 5L), (3L, 21000L, 5L),
        (4L, 30000L, 5L), (5L, 30000L, 5L), (6L, 9500L, 6L), (7L, 500000L, 6L))
      .toDF("event_id", "ts", "user_id")
    val got = EventStreams.pairsWithin(ev, withinUs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // naive reference: every ordered pair within Δ on µs-truncated time
    val rows = Seq((1L, 9L, 5L), (2L, 11L, 5L), (3L, 21L, 5L),
      (4L, 30L, 5L), (5L, 30L, 5L), (6L, 9L, 6L), (7L, 500L, 6L))
    val want = (for {
      (ia, ta, ka) <- rows; (ib, tb, kb) <- rows
      if ka == kb && (tb > ta || (tb == ta && ib > ia)) && tb - ta <= 10
    } yield (ka, ia, ib, tb - ta)).toSet
    assert(got === want)
    assert(got.contains((5L, 1L, 2L, 2L)) && got.contains((5L, 2L, 3L, 10L)) &&
      got.contains((5L, 4L, 5L, 0L)) && !got.exists(p => p._2 == 1L && p._3 == 3L))
    // the whole point: an EQUI join on (key, bucket) — never a nested loop
    val plan = EventStreams.pairsWithin(ev, withinUs = 10L)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("broadcastnestedloop") && !plan.contains("cartesianproduct"),
      s"range join must bucket into an equi join:\n$plan")
    // burst cap: user 5 has a 3-event bucket (t=9,11 in bkt 0/1… use a
    // dense fixture) — events 4,5 share (user 5, bkt 3); capping at 1
    // drops that bucket's pairs from both sides, everything else survives
    val capped = EventStreams.pairsWithin(ev, withinUs = 10L, maxPerKeyBucket = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(!capped.contains((5L, 4L, 5L, 0L)), "over-cap bucket pairs dropped")
    assert(capped.subsetOf(got), "capping only removes pairs, never invents them")
  }

  test("asofJoin: null right values stay atomic; null keys never match") {
    val left = Seq((1L, java.lang.Long.valueOf(7L), 3L), (2L, null.asInstanceOf[java.lang.Long], 5L))
      .toDF("lid", "k", "t")
    // k=7: (t=1, v=5) then (t=2, v=null) — the as-of row at t>=2 is the
    // t=2 row WITH ITS null v, not a stitch of t=2 and the older v=5
    val right = Seq(
      (java.lang.Long.valueOf(7L), 1L, java.lang.Double.valueOf(5.0)),
      (java.lang.Long.valueOf(7L), 2L, null.asInstanceOf[java.lang.Double]),
      (null.asInstanceOf[java.lang.Long], 1L, java.lang.Double.valueOf(9.0)))
      .toDF("k", "t", "v")
    val out = EventStreams.asofJoin(left, right, "k", "t", "t", Seq("t", "v"))
      .collect().map(r => (r.getLong(0),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    assert(out === Set(
      (1L, Some(2L), None),  // atomic: t=2 row's v is null
      (2L, None, None)))     // null key matches no right row (not even null-key rows)
  }

  test("dedupStream drops within-watermark duplicate keys across micro-batches") {
    val h = 3600L * 1000000000L
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream").toString
    def push(evs: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
    push(Seq((1L, h, 7L, "view", 0.0, ""), (1L, h + 1, 7L, "view", 0.0, ""))) // dup in-batch
    val src = EventStreams.readEventStream(spark, dir)
    val q = EventStreams.dedupStream(src, Seq("event_id"), "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      push(Seq((1L, h + 2, 7L, "view", 0.0, ""), (2L, 2 * h, 8L, "click", 1.0, ""))) // dup next batch
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getLong(0)).toSeq.sorted
      assert(ids === Seq(1L, 2L))
    } finally q.stop()
  }

  test("graph set ops: intersect and except on edge sets") {
    val ranges = Seq(RangeDef(0, 100, 0, Seq(1)))
    val a = Loaders.fromList(spark,
      Seq(InputEdge(0, 1, Seq(1), addReverse = false), InputEdge(1, 2, Seq(1), addReverse = false)), ranges)
    val b = Loaders.fromList(spark,
      Seq(InputEdge(1, 2, Seq(1), addReverse = false), InputEdge(2, 3, Seq(1), addReverse = false)), ranges)
    def pairs(g: graft.model.PropertyGraph) =
      g.edges.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(graft.operators.GraphOps.intersect(a, b)) === Set((1L, 2L)))
    assert(pairs(graft.operators.GraphOps.except(a, b)) === Set((0L, 1L)))
    // union ORs overlay bits when the same edge carries different masks
    // (max would drop bits): {1} ∪ {2} overlays → mask 6 on the shared edge
    val ranges12 = Seq(RangeDef(0, 100, 0, Seq(1, 2)))
    val ov1 = Loaders.fromList(spark, Seq(InputEdge(0, 1, Seq(1), addReverse = false)), ranges12)
    val ov2 = Loaders.fromList(spark, Seq(InputEdge(0, 1, Seq(2), addReverse = false)), ranges12)
    val masks = graft.operators.GraphOps.union(
        ov1.copy(edges = ov1.edges.withColumn("label", lit(1))),
        ov2.copy(edges = ov2.edges.withColumn("label", lit(1))))
      .edges.select("attrMask").collect().map(_.getLong(0)).toSet
    assert(masks === Set(6L))
    // edge cases: empty graph on either side
    val e = graft.model.PropertyGraph.empty(spark, ranges)
    assert(pairs(graft.operators.GraphOps.intersect(a, e)) === Set())
    assert(pairs(graft.operators.GraphOps.except(a, e)) === pairs(a))
    assert(graft.operators.GraphOps.union(e, e).isNull)
  }

  test("streamCSVEdges: files appearing in a dir become graph edges exactly once") {
    val base = java.nio.file.Files.createTempDirectory("graft_csv_stream").toString
    val in = s"$base/in"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(in))
    def pushFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$in/$name"), lines.mkString("\n"))
    pushFile("a.csv", Seq("0,1", "1,2", "garbage_line", "2,3"))
    val q = Loaders.streamCSVEdges(spark, in, sink, ckpt, label = 1, mirror = true)
    try {
      q.processAllAvailable()
      pushFile("b.csv", Seq("3,4"))
      q.processAllAvailable()
      val g = Loaders.loadEdgeLog(spark, sink, Seq(RangeDef(0, 100, 0, Seq(1))))
      assert(g.edges.count() === 8) // 4 valid lines, mirrored
      assert(g.edges.filter(col("dir")).count() === 4)
      assert(!g.edges.columns.contains("__batch"))
    } finally q.stop()
  }

  test("multimodal: deterministic features, resize and frame sampling shapes") {
    val media = Multimodal.typed(Multimodal.synthesize(
      Seq((1L, "hello world this is payload"), (2L, "other payload")).toDF("id", "txt"),
      "id", "txt"))
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.feature.toSeq).toSeq === f2.map(_.feature.toSeq).toSeq)
    assert(f1.forall(_.feature.length === 32))
    assert(f1.forall(f => math.abs(f.feature.sum - 1.0f) < 1e-3)) // normalized histogram
    val resized = Multimodal.resize(media, 8, 8).collect()
    assert(resized.forall(_.media.length === 64))
    val frames = Multimodal.sampleFrames(media, frameBytes = 4, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 === 0))
  }

  test("multimodal: REAL image decode and resize via JDK ImageIO") {
    import graft.functions.Multimodal
    // build real PNGs in-test: uniform colors with known dimensions
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, png(16, 9, 0xFF8040), "image/png", 16, 9, 0),
      Multimodal.MediaRow(2L, png(4, 4, 0x000000), "image/png", 4, 4, 0),
      Multimodal.MediaRow(3L, Array[Byte](1, 2, 3), "corrupt", 0, 0, 0))
    val media = spark.createDataset(rows)
    val info = Multimodal.decodeImages(media).collect().map(i => i.media_id -> i).toMap
    // uniform-color PNG round-trips exactly: dims and channel means exact
    assert(info(1L).width === 16 && info(1L).height === 9 && info(1L).decode_ok)
    assert(info(1L).mean_r === 0xFF.toDouble && info(1L).mean_g === 0x80.toDouble
      && info(1L).mean_b === 0x40.toDouble)
    assert(info(2L).mean_r === 0.0 && info(2L).decode_ok)
    // corrupt payload: explicit decode_ok = false, never a null/dropped row
    assert(!info(3L).decode_ok && info(3L).width === -1)
    // real resize: output decodes to the target dims, uniform color survives
    val resized = Multimodal.resizeImages(media, 8, 8).collect()
      .map(r => r.media_id -> r).toMap
    val r1 = Multimodal.decodeImages(
      spark.createDataset(Seq(resized(1L)))).head()
    assert(r1.width === 8 && r1.height === 8 && r1.decode_ok)
    assert(r1.mean_r === 0xFF.toDouble && r1.mean_g === 0x80.toDouble
      && r1.mean_b === 0x40.toDouble)
    assert(resized(1L).format === "image/png")
    // undecodable rows pass through resize unchanged
    assert(resized(3L).media.toSeq === Seq[Byte](1, 2, 3) && resized(3L).format === "corrupt")
  }

  test("multimodal: perceptual aHash clusters real near-identical images; banded dedup finds them") {
    import graft.functions.Multimodal
    // a structured 64×64 image: left half bright, right half dark — a
    // meaningful aHash (half the bits set); a near-copy with a small
    // blemish; a recompressed JPEG of the same scene; an inverted scene
    def scene(w: Int, h: Int, invert: Boolean, blemish: Boolean, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      val (l, r) = if (invert) (0x101010, 0xF0F0F0) else (0xF0F0F0, 0x101010)
      g.setColor(new java.awt.Color(l)); g.fillRect(0, 0, w / 2, h)
      g.setColor(new java.awt.Color(r)); g.fillRect(w / 2, 0, w - w / 2, h)
      if (blemish) { g.setColor(new java.awt.Color(0x808080)); g.fillRect(2, 2, 3, 3) }
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, scene(64, 64, invert = false, blemish = false, "png"), "image/png", 64, 64, 0),
      Multimodal.MediaRow(2L, scene(64, 64, invert = false, blemish = true, "png"), "image/png", 64, 64, 0),
      Multimodal.MediaRow(3L, scene(64, 64, invert = false, blemish = false, "jpg"), "image/jpeg", 64, 64, 0),
      Multimodal.MediaRow(4L, scene(64, 64, invert = true, blemish = false, "png"), "image/png", 64, 64, 0),
      Multimodal.MediaRow(5L, Array[Byte](9, 9, 9), "corrupt", 0, 0, 0),
      Multimodal.MediaRow(6L, Array[Byte](9, 9, 9), "corrupt", 0, 0, 0))
    val media = spark.createDataset(rows)
    val hashes = Multimodal.perceptualHash(media).collect()
      .map(h => h.media_id -> h).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hashes(1L).source === "image" && hashes(5L).source === "stub")
    // the scene hash is half-set (left bright / right dark), not degenerate
    assert(java.lang.Long.bitCount(hashes(1L).phash) === 32)
    // blemish and JPEG recompression stay perceptually close; the
    // inverted scene is maximally far (~64 bits)
    assert(ham(hashes(1L).phash, hashes(2L).phash) <= 3)
    assert(ham(hashes(1L).phash, hashes(3L).phash) <= 3)
    assert(ham(hashes(1L).phash, hashes(4L).phash) >= 48)
    // identical corrupt payloads: identical stub hash
    assert(hashes(5L).phash === hashes(6L).phash)
    // banded dedup: {1,2,3} pairwise + (5,6); never across to 4
    val pairs = Multimodal.nearDuplicateMedia(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L)), s"got $pairs")
  }

  test("multimodal: cross-modal dedup — either modality matching an earlier doc drops the page") {
    import graft.functions.Multimodal
    // the full keep/drop matrix: text-only dup (2), media-only dup (4),
    // both (5), neither (6); 1 and 3 are the keepers of their families
    val docs = Seq(
      (1L, "shared text"), (2L, "shared text"), (3L, "unique t3"),
      (4L, "unique t4"), (5L, "shared text"), (6L, "unique t6"))
      .toDF("doc_id", "text")
    val payloads = Seq(
      (1L, "unique p1"), (2L, "unique p2"), (3L, "shared payload"),
      (4L, "shared payload"), (5L, "shared payload"), (6L, "unique p6"))
      .toDF("doc_id", "payload")
    val media = Multimodal.typed(Multimodal.synthesize(payloads, "doc_id", "payload"))
    val out = Multimodal.crossModalDedup(docs, media).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((0L, 0L, 1L))) // earliest of the text family: keep
    assert(out(2L) === ((1L, 0L, 0L))) // text matches doc 1 → drop
    assert(out(3L) === ((0L, 0L, 1L))) // earliest of the payload family: keep
    assert(out(4L) === ((0L, 1L, 0L))) // payload matches doc 3 → drop
    assert(out(5L) === ((1L, 1L, 0L))) // both modalities match earlier docs
    assert(out(6L) === ((0L, 0L, 1L))) // unique in both: keep

    // perceptual path: a blemished near-copy (Hamming <= 3, NOT byte-equal)
    // of an earlier image drops the later doc even though its text is unique
    def scene(blemish: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(0xF0F0F0)); g.fillRect(0, 0, 32, 64)
      g.setColor(new java.awt.Color(0x101010)); g.fillRect(32, 0, 32, 64)
      if (blemish) { g.setColor(new java.awt.Color(0x808080)); g.fillRect(2, 2, 3, 3) }
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val imgDocs = Seq((10L, "text a"), (11L, "text b")).toDF("doc_id", "text")
    val imgMedia = spark.createDataset(Seq(
      Multimodal.MediaRow(10L, scene(blemish = false), "image/png", 64, 64, 0),
      Multimodal.MediaRow(11L, scene(blemish = true), "image/png", 64, 64, 0)))
    val out2 = Multimodal.crossModalDedup(imgDocs, imgMedia).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out2(10L) === ((0L, 0L, 1L)))
    assert(out2(11L) === ((0L, 1L, 0L))) // perceptual cross-hash match, no byte equality
  }

  test("multimodal: cross-modal dedup emits ONE row per doc with several media payloads") {
    import graft.functions.Multimodal
    // ADVICE r16: a doc_id with multiple MediaRows used to multiply the
    // final per-doc join. A page is a media-dup iff ANY payload matches
    // an earlier doc — doc 21 carries one unique and one shared payload.
    val docs = Seq((20L, "t20"), (21L, "t21"), (22L, "t22")).toDF("doc_id", "text")
    val payloads = Seq(
      (20L, "shared payload"), (21L, "unique p21a"), (21L, "shared payload"),
      (22L, "unique p22")).toDF("doc_id", "payload")
    val media = Multimodal.typed(Multimodal.synthesize(payloads, "doc_id", "payload"))
    val out = Multimodal.crossModalDedup(docs, media).collect()
    assert(out.length === 3, s"one row per document, got ${out.length}")
    val byId = out.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(byId(20L) === ((0L, 0L, 1L))) // earliest of the payload family
    assert(byId(21L) === ((0L, 1L, 0L))) // ANY payload matching earlier → drop
    assert(byId(22L) === ((0L, 0L, 1L)))
  }

  test("multimodal: audio fingerprint is volume-invariant and contour-discriminating; banded audio dedup") {
    import graft.functions.Multimodal
    // amplitude-modulated tones through the REAL javax.sound write/read
    // path: the fingerprint hashes the loudness CONTOUR (m envelope
    // periods), so a volume change preserves it and a different contour
    // flips ~2m sign bits
    def clip(m: Int, amp: Double): Array[Byte] = {
      val rate = 8000f; val n = 4000
      val data = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val env = 0.55 + 0.45 * math.sin(2 * math.Pi * m * i / n)
        val v = (amp * env * math.sin(2 * math.Pi * 440 * i / rate) * 32767).round.toInt
        data(i * 2) = (v & 0xff).toByte; data(i * 2 + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, clip(m = 2, amp = 0.2), "audio/wav", 0, 0, 0),
      Multimodal.MediaRow(2L, clip(m = 2, amp = 0.35), "audio/wav", 0, 0, 0), // louder, same contour
      Multimodal.MediaRow(3L, clip(m = 5, amp = 0.2), "audio/wav", 0, 0, 0),  // different contour
      Multimodal.MediaRow(4L, Array[Byte](7, 7, 7), "corrupt", 0, 0, 0),
      Multimodal.MediaRow(5L, Array[Byte](7, 7, 7), "corrupt", 0, 0, 0))
    val fps = Multimodal.audioFingerprint(spark.createDataset(rows)).collect()
      .map(h => h.media_id -> h).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fps(1L).source === "audio" && fps(4L).source === "stub")
    // volume scaling flips no sign-of-energy-delta bit
    assert(ham(fps(1L).phash, fps(2L).phash) <= 3,
      s"volume change moved the fingerprint ${ham(fps(1L).phash, fps(2L).phash)} bits")
    // a different loudness contour is far outside the dedup bound
    assert(ham(fps(1L).phash, fps(3L).phash) >= 16)
    // identical corrupt payloads share the stub hash (exact-copy dedup)
    assert(fps(4L).phash === fps(5L).phash)
    val pairs = Multimodal.nearDuplicateAudio(spark.createDataset(rows), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (4L, 5L)), s"got $pairs")
  }

  test("multimodal: REAL WAV decode via javax.sound.sampled (rate/duration/RMS/peak per channel)") {
    import graft.functions.Multimodal
    // build real WAV bytes in-test: 16-bit signed little-endian PCM frames
    // written through AudioSystem (the same JDK path a crawler's payloads
    // would decode back through)
    def wav(rate: Float, channels: Array[Array[Double]]): Array[Byte] = {
      val ch = channels.length; val n = channels(0).length
      val data = new Array[Byte](n * ch * 2)
      for (f <- 0 until n; c <- 0 until ch) {
        val v = math.max(-32768, math.min(32767, (channels(c)(f) * 32767).round.toInt))
        val i = (f * ch + c) * 2
        data(i) = (v & 0xff).toByte; data(i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, ch, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val n = 2000 // 0.25 s at 8 kHz
    val sine = (a: Double) => Array.tabulate(n)(i => a * math.sin(2 * math.Pi * 440 * i / 8000.0))
    val rows = Seq(
      Multimodal.MediaRow(1L, wav(8000f, Array(sine(0.5))), "audio/wav", 0, 0, 250),
      Multimodal.MediaRow(2L, wav(8000f, Array(sine(0.8), sine(0.2))), "audio/wav", 0, 0, 250),
      Multimodal.MediaRow(3L, Array[Byte](9, 9, 9, 9), "corrupt", 0, 0, 0))
    val media = spark.createDataset(rows)
    val info = Multimodal.decodeAudio(media).collect().map(a => a.media_id -> a).toMap
    // mono sine at amplitude 0.5: rate and frame count exact, duration
    // derived, RMS = a/sqrt(2), peak = a (within quantization)
    val m = info(1L)
    assert(m.decode_ok && m.sample_rate === 8000 && m.channels === 1 && m.n_frames === n.toLong)
    assert(math.abs(m.duration_ms - 250.0) < 1e-9)
    assert(math.abs(m.rms(0) - 0.5 / math.sqrt(2)) < 0.005, s"mono rms ${m.rms(0)}")
    assert(math.abs(m.peak(0) - 0.5) < 0.005, s"mono peak ${m.peak(0)}")
    // stereo: per-channel stats must NOT blend — interleaving is honored
    val s = info(2L)
    assert(s.channels === 2)
    assert(math.abs(s.rms(0) - 0.8 / math.sqrt(2)) < 0.005 &&
      math.abs(s.rms(1) - 0.2 / math.sqrt(2)) < 0.005, s"stereo rms ${s.rms.toSeq}")
    assert(math.abs(s.peak(0) - 0.8) < 0.005 && math.abs(s.peak(1) - 0.2) < 0.005)
    // corrupt payload: explicit decode_ok = false row, same contract as images
    assert(!info(3L).decode_ok && info(3L).sample_rate === -1)
    // features route through the REAL audio decode: a silent (all-zero)
    // signal's PCM bytes are all 0x00 → the whole histogram mass sits in
    // bin 0 — the stub would spread a fold of the compressed payload
    val silent = Multimodal.MediaRow(4L, wav(8000f, Array(Array.fill(n)(0.0))), "audio/wav", 0, 0, 250)
    val feat = Multimodal.extractFeatures(spark.createDataset(Seq(silent)), featureDim = 32)
      .head().feature
    assert(math.abs(feat(0) - 1.0f) < 1e-6, s"silence must land in bin 0: ${feat.toSeq}")
    assert(feat.drop(1).forall(_ === 0.0f))
  }

  test("multimodal: REAL AVI/MJPEG frame sampling via RIFF parse + ImageIO decode") {
    import graft.functions.Multimodal
    def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // minimal AVI built by hand: RIFF("AVI " LIST(hdrl avih) LIST(movi 00dc*))
    def u32le(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("ISO-8859-1") ++ u32le(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(typ: String, parts: Array[Byte]*): Array[Byte] =
      chunk("LIST", typ.getBytes("ISO-8859-1") ++ parts.flatten)
    def avi(frames: Seq[Array[Byte]]): Array[Byte] = {
      val body = "AVI ".getBytes("ISO-8859-1") ++
        list("hdrl", chunk("avih", new Array[Byte](56))) ++
        list("movi", frames.map(f => chunk("00dc", f)): _*)
      "RIFF".getBytes("ISO-8859-1") ++ u32le(body.length) ++ body
    }
    // white, red, green, blue, black — 5 MJPEG frames
    val colors = Seq(0xFFFFFF, 0xFF0000, 0x00FF00, 0x0000FF, 0x000000)
    val payload = avi(colors.map(c => jpeg(8, 8, c)))
    val row = Multimodal.MediaRow(1L, payload, "video/avi", 8, 8, 200)
    val frames = Multimodal.sampleFrames(spark.createDataset(Seq(row)), frameBytes = 4, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4), "every stride-th movi chunk")
    // each sampled frame is a complete JPEG the REAL image stage decodes
    val asMedia = frames.map(f =>
      Multimodal.MediaRow(f.frame_idx.toLong, f.frame, "image/jpeg", 8, 8, 0)).toSeq
    val dec = Multimodal.decodeImages(spark.createDataset(asMedia))
      .collect().map(i => i.media_id -> i).toMap
    assert(dec.values.forall(i => i.decode_ok && i.width === 8 && i.height === 8))
    assert(dec(0L).mean_r > 240 && dec(0L).mean_g > 240) // white
    assert(dec(2L).mean_g > 200 && dec(2L).mean_r < 120) // green (JPEG chroma tolerance)
    assert(dec(4L).mean_r < 15 && dec(4L).mean_b < 15)   // black
    // truncated container: the frames before the damage, never an exception
    val cut = Multimodal.MediaRow(2L, payload.take(payload.length - 40), "video/avi", 8, 8, 200)
    val cutFrames = Multimodal.sampleFrames(spark.createDataset(Seq(cut)), 4, 1).collect()
    assert(cutFrames.nonEmpty && cutFrames.length < colors.length)
    // extractFeatures routes the clip through REAL first-frame pixels:
    // a solid-white first frame is luma 255 → histogram mass at bin 31
    val feat = Multimodal.extractFeatures(spark.createDataset(Seq(row)), featureDim = 32).head()
    assert(feat.source === "video")
    assert(feat.feature.slice(30, 32).sum > 0.99f, s"white frame luma: ${feat.feature.toSeq}")
  }

  test("multimodal: extractFeatures source flag separates real decodes from stub fallbacks") {
    import graft.functions.Multimodal
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val good = Multimodal.MediaRow(1L, png(8, 8, 0x336699), "image/png", 8, 8, 0)
    val raw = Multimodal.MediaRow(2L, "opaque payload".getBytes, "fake/raw", 0, 0, 0)
    val byId = Multimodal.extractFeatures(spark.createDataset(Seq(good, raw)))
      .collect().map(f => f.media_id -> f.source).toMap
    assert(byId === Map(1L -> "image", 2L -> "stub"))
    // the decompression-bomb bound: the SAME image over maxPixels is
    // rejected by the bounded decoder and must be FLAGGED as stub-derived
    // (decodeImages flags it decode_ok=false; features say source=stub)
    val bounded = Multimodal.extractFeatures(
      spark.createDataset(Seq(good)), maxPixels = 4).head()
    assert(bounded.source === "stub",
      "an over-bound image must not masquerade as a real-pixel feature")
  }

  test("multimodal: extractFeatures uses real decoded pixels for images, stub only for raw") {
    import graft.functions.Multimodal
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // pure white: luma = 255 exactly → all histogram mass in bin 255 % 32 = 31
    val white = Multimodal.MediaRow(1L, png(8, 8, 0xFFFFFF), "image/png", 8, 8, 0)
    // raw payload: undecodable by both codecs → deterministic stub histogram
    val raw = Multimodal.MediaRow(2L, "not an image".getBytes, "fake/raw", 0, 0, 0)
    val feats = Multimodal.extractFeatures(spark.createDataset(Seq(white, raw)), featureDim = 32)
      .collect().map(f => f.media_id -> f).toMap
    val w = feats(1L).feature
    assert(math.abs(w(31) - 1.0f) < 1e-6, s"white pixels must land in bin 31: ${w.toSeq}")
    assert(w.take(31).forall(_ === 0.0f))
    // the stub path still sums to 1 over min-64 decoded bytes and stays
    // deterministic (the m1 gate's synthetic tier)
    assert(math.abs(feats(2L).feature.sum - 1.0f) < 1e-5)
  }

  test("analytics: components/pagerank/shortest on a two-island graph") {
    val ranges = Seq(RangeDef(0, 100, 0, Seq(1)))
    val g = Loaders.fromList(spark,
      Seq((0, 1), (1, 2), (5, 6)).map { case (s, d) => InputEdge(s, d, Seq(1), addReverse = true) },
      ranges)
    val cc = GraphAnalytics.connectedComponents(g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(0L) === cc(1L) && cc(1L) === cc(2L))
    assert(cc(5L) === cc(6L))
    assert(cc(0L) !== cc(5L))
    val sp = GraphAnalytics.shortestPaths(g, 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sp === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    val reach = GraphAnalytics.reachableFrom(g, Seq(0L)).collect().map(_.getLong(0)).toSet
    assert(reach === Set(1L, 2L))
    val dbl = GraphAnalytics.reachableByDoubling(g, Seq(0L), 1).collect().map(_.getLong(0)).toSet
    assert(dbl === reach)
    // frontier-join plan family ≡ Pregel (the BfsCrossoverProbe scale
    // path, round 16) — same row sets from both plan families; the
    // public reachableFrom/shortestPaths dispatch between them on the
    // measured edge-count crossover, so family agreement here is what
    // makes the dispatch invisible to callers
    val fReach = GraphAnalytics.reachableFromFrontier(g, Seq(0L))
      .collect().map(_.getLong(0)).toSet
    assert(fReach === reach)
    assert(GraphAnalytics.reachableFromPregel(g, Seq(0L))
      .collect().map(_.getLong(0)).toSet === reach)
    val fSp = GraphAnalytics.shortestPathsFrontier(g, 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fSp === sp)
    assert(GraphAnalytics.shortestPathsPregel(g, 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap === sp)
    // long chain: doubling must cover every hop, not just power-of-two depths
    val chain = Loaders.fromList(spark,
      (0 until 37).map(i => InputEdge(i, i + 1, Seq(1), addReverse = false)), ranges)
    val chainReach = GraphAnalytics.reachableByDoubling(chain, Seq(0L), 1)
      .collect().map(_.getLong(0)).toSet
    assert(chainReach === (1 to 37).map(_.toLong).toSet)
    val pr = GraphAnalytics.pageRank(g).collect()
    assert(pr.length === 5 && pr.forall(_.getDouble(1) > 0))
    // isolated explicit node: its own singleton component
    val gIso = Loaders.fromList(spark,
      Seq(InputEdge(0, 1, Seq(1), addReverse = true)), ranges,
      nodes = Seq(graft.model.NodeRow(0, 0), graft.model.NodeRow(1, 0),
        graft.model.NodeRow(42, 0)))
    val ccIso = GraphAnalytics.connectedComponents(gIso).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccIso.contains(42L) && ccIso(42L) === 42L)
  }

  test("analytics: BFS families agree on seeds ABSENT from the graph (ADVICE r16)") {
    val ranges = Seq(RangeDef(0, 100, 0, Seq(1)))
    val g = Loaders.fromList(spark,
      Seq(InputEdge(0, 1, Seq(1), addReverse = false),
        InputEdge(1, 2, Seq(1), addReverse = false)), ranges)
    def spMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // seed 999 exists nowhere: Pregel omits it from its vertex universe;
    // the frontier family used to emit (999, 0) regardless — the same
    // shortestPaths call returned different row sets depending on which
    // side of the edge-count crossover the graph fell
    assert(spMap(GraphAnalytics.shortestPathsFrontier(g, 999L)) ===
      spMap(GraphAnalytics.shortestPathsPregel(g, 999L)))
    assert(spMap(GraphAnalytics.shortestPathsFrontier(g, 999L)).isEmpty)
    assert(GraphAnalytics.reachableFromFrontier(g, Seq(999L)).collect().isEmpty)
    assert(GraphAnalytics.reachableFromPregel(g, Seq(999L)).collect().isEmpty)
    // an EXPLICIT isolated node is in BOTH families' universes: each
    // must emit (42, 0) — the explicit-nodes branch of the seed filter
    val gIso = Loaders.fromList(spark,
      Seq(InputEdge(0, 1, Seq(1), addReverse = false)), ranges,
      nodes = Seq(graft.model.NodeRow(0, 0), graft.model.NodeRow(1, 0),
        graft.model.NodeRow(42, 0)))
    assert(spMap(GraphAnalytics.shortestPathsFrontier(gIso, 42L)) === Map(42L -> 0L))
    assert(spMap(GraphAnalytics.shortestPathsPregel(gIso, 42L)) === Map(42L -> 0L))
  }

  test("streamCSVEdgesNamed: cross-batch name→id dictionary assigns stable dense ids") {
    val root = java.nio.file.Files.createTempDirectory("graft_named").toString
    val inDir = s"$root/in"; new java.io.File(inDir).mkdirs()
    val ranges = Seq(RangeDef(0, 1000, 0, Seq(1)))
    val q = Loaders.streamCSVEdgesNamed(spark, inDir, s"$root/sink", s"$root/ckpt",
      s"$root/dict", "a", "b", label = 1, mirror = false, header = false)
    try {
      // batch 1: alice→bob, bob→carol
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$inDir/b1.csv"),
        "alice,bob\nbob,carol\n")
      q.processAllAvailable()
      val dict1 = spark.read.parquet(s"$root/dict").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // dense ids 0..2, name-ordered within the first block
      assert(dict1 === Map("alice" -> 0L, "bob" -> 1L, "carol" -> 2L))
      // batch 2: overlapping names (bob, carol) + new ones (dave, eve)
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$inDir/b2.csv"),
        "carol,dave\nbob,eve\ndave,alice\n")
      q.processAllAvailable()
      val dict2 = spark.read.parquet(s"$root/dict").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // old names keep their ids; new names extend the dense block
      assert(dict2 === dict1 ++ Map("dave" -> 3L, "eve" -> 4L))
      val (g, dict) = Loaders.loadNamedEdgeLog(spark, s"$root/sink", s"$root/dict", ranges)
      assert(dict.count() === 5)
      val got = g.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((0L, 1L), (1L, 2L), (2L, 3L), (1L, 4L), (3L, 0L)))
    } finally q.stop()
  }

  test("FsLock: concurrent acquisition fails loudly, lock released after body and on exception") {
    val root = java.nio.file.Files.createTempDirectory("graft_lock").toString
    val lock = s"$root/dict.lock"
    // a second writer inside the critical section must fail, not corrupt
    graft.util.FsLock.withLock(spark, lock, "outer") {
      val e = intercept[IllegalStateException] {
        graft.util.FsLock.withLock(spark, lock, "inner") { fail("must not enter") }
      }
      assert(e.getMessage.contains("already held"))
    }
    // released after the body: re-acquisition succeeds
    assert(graft.util.FsLock.withLock(spark, lock, "again") { 7 } === 7)
    // released on exception: the next writer is not blocked by a crashed body
    intercept[RuntimeException] {
      graft.util.FsLock.withLock(spark, lock, "boom") { throw new RuntimeException("boom") }
    }
    assert(graft.util.FsLock.withLock(spark, lock, "after-boom") { 8 } === 8)
  }

  test("streamCSVEdgesNamed: restart from checkpoint keeps the dictionary consistent") {
    val root = java.nio.file.Files.createTempDirectory("graft_named_rs").toString
    val inDir = s"$root/in"; new java.io.File(inDir).mkdirs()
    val ranges = Seq(RangeDef(0, 1000, 0, Seq(1)))
    def start() = Loaders.streamCSVEdgesNamed(spark, inDir, s"$root/sink", s"$root/ckpt",
      s"$root/dict", "a", "b", label = 1, mirror = false, header = false)
    val q1 = start()
    try {
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$inDir/b1.csv"), "x,y\n")
      q1.processAllAvailable()
    } finally q1.stop()
    // restart against the same checkpoint: ids assigned before the stop
    // must survive, new names extend the dense block
    val q2 = start()
    try {
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$inDir/b2.csv"), "y,z\nx,w\n")
      q2.processAllAvailable()
      val dict = spark.read.parquet(s"$root/dict").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(dict === Map("x" -> 0L, "y" -> 1L, "w" -> 2L, "z" -> 3L))
      val edges = Loaders.loadEdgeLog(spark, s"$root/sink", ranges)
        .edges.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(edges === Set((0L, 1L), (1L, 3L), (0L, 2L)))
    } finally q2.stop()
  }

  test("minHashDedupStream: legacy null-signature store rows heal on re-ingest") {
    import graft.functions.Dedup
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft_heal").toString
    val inDir = s"$root/in"; new java.io.File(inDir).mkdirs()
    val sigDir = s"$root/sigs"
    val text = "the quick brown fox jumps over the lazy dog again and again"
    // a store written BEFORE null-text filtering: doc 7 has a null-sig
    // tombstone. It must not block doc 7 from getting a real signature
    // when re-ingested with text (the append anti-join ignores null rows).
    val legacy = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(7L, null))),
      StructType(Seq(StructField("id", LongType), StructField("sig", ArrayType(LongType)))))
    legacy.write.parquet(sigDir)
    Seq(7L -> text, 8L -> text).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$inDir/b1")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*")
    val q = Dedup.minHashDedupStream(stream, sigDir, s"$root/pairs",
      s"$root/ckpt", threshold = 0.8)
    try {
      q.processAllAvailable()
      // healed: doc 7 now has a real signature (the null tombstone remains,
      // benign — null sigs never bucket with the null-free batch side)
      val sigs = spark.read.parquet(sigDir).collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(sigs.exists { case (id, s) => id == 7L && s.isDefined },
        s"doc 7 never healed: $sigs")
      assert(sigs.count(_._1 == 8L) === 1)
      // and 7/8 pair as duplicates despite the tombstone
      val pairs = spark.read.parquet(s"$root/pairs")
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((7L, 8L)))
    } finally q.stop()
  }

  test("minHashDedupStream: new docs near-dup'd against the accumulated corpus per batch") {
    import graft.functions.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_neardup").toString
    val inDir = s"$root/in"; new java.io.File(inDir).mkdirs()
    val text = "the quick brown fox jumps over the lazy dog again and again"
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/$name")
    // batch 1 present before the stream starts: docs 1,2 identical, 10 unrelated
    writeBatch("b1", Seq(1L -> text, 2L -> text,
      10L -> "completely different content with nothing shared at all here"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*")
    val q = Dedup.minHashDedupStream(stream, s"$root/sigs", s"$root/pairs",
      s"$root/ckpt", threshold = 0.8)
    try {
      q.processAllAvailable()
      val p1 = spark.read.parquet(s"$root/pairs")
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(p1 === Set((1L, 2L)))
      // batch 2: doc 3 duplicates the batch-1 text → pairs vs BOTH old docs
      writeBatch("b2", Seq(3L -> text))
      q.processAllAvailable()
      val p2 = spark.read.parquet(s"$root/pairs")
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(p2 === Set((1L, 2L), (1L, 3L), (2L, 3L)))
      // signature store holds each id exactly once
      val ids = spark.read.parquet(s"$root/sigs").select("id")
        .collect().map(_.getLong(0)).sorted
      assert(ids === Array(1L, 2L, 3L, 10L))
    } finally q.stop()
  }

  test("seedSignatureStore: stream dedups its first batch against a fixed reference corpus") {
    import graft.functions.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_seeded").toString
    val inDir = s"$root/in"; new java.io.File(inDir).mkdirs()
    val text = "the quick brown fox jumps over the lazy dog again and again"
    // reference corpus seeded BEFORE any stream batch; seeded TWICE —
    // a retried seeding job must not duplicate store ids (duplicates
    // would multiply every downstream pair through the verdict joins)
    val ref = Seq(100L -> text, 101L -> "totally unrelated reference document body here")
      .toDF("doc_id", "text")
    Dedup.seedSignatureStore(ref, s"$root/sigs")
    Dedup.seedSignatureStore(ref, s"$root/sigs")
    Seq(1L -> text).toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/b1")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val q = Dedup.minHashDedupStream(
      spark.readStream.schema(schema).parquet(s"$inDir/*"),
      s"$root/sigs", s"$root/pairs", s"$root/ckpt", threshold = 0.8)
    try {
      q.processAllAvailable()
      // the very first batch pairs against the seeded reference — the
      // fixed-training-set shape (batch sibling: dedupAgainst)
      val pairs = spark.read.parquet(s"$root/pairs")
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 100L)))
      // reference ids stay in the store exactly once, batch id appended
      val ids = spark.read.parquet(s"$root/sigs").select("id")
        .collect().map(_.getLong(0)).sorted
      assert(ids === Array(1L, 100L, 101L))
    } finally q.stop()
  }

  test("seedSignatureStore: banding-mismatch fails fast; tombstones heal on re-seed") {
    import graft.functions.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_seed_guard").toString
    val ref = Seq(50L -> "some reference text for the guard test corpus")
      .toDF("doc_id", "text")
    Dedup.seedSignatureStore(ref, s"$root/sigs")
    // a different bands×rowsPerBand against the existing store must throw
    // BEFORE appending (shorter sigs would null-pad zip_with and collapse
    // est-jaccard silently)
    intercept[IllegalArgumentException] {
      Dedup.seedSignatureStore(ref, s"$root/sigs", bands = 8, rowsPerBand = 4)
    }
    // legacy null-sig tombstone must not block seeding a real signature
    Seq((60L, null.asInstanceOf[Array[Long]])).toDF("id", "sig")
      .write.mode("append").parquet(s"$root/sigs")
    Dedup.seedSignatureStore(
      Seq(60L -> "now this doc has real text to sign").toDF("doc_id", "text"), s"$root/sigs")
    val sigs60 = spark.read.parquet(s"$root/sigs")
      .filter(col("id") === 60L && col("sig").isNotNull).count()
    assert(sigs60 === 1L)
  }

  test("signature index: partitioned by pmod(bucket,P), store read prunes via partition filters") {
    import graft.functions.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_idx").toString
    val inDir = s"$root/in"; new java.io.File(inDir).mkdirs()
    val sigDir = s"$root/sigs"
    // disjoint texts → disjoint bucket sets → multiple __p partitions
    val ref = (0L until 8L).map(i =>
      i -> s"reference document number $i with its own distinct content body $i $i")
      .toDF("doc_id", "text")
    Dedup.seedSignatureStore(ref, sigDir)
    Seq(100L -> "a new arrival document sharing nothing with the reference set")
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/b1")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val q = Dedup.minHashDedupStream(
      spark.readStream.schema(schema).parquet(s"$inDir/*"),
      sigDir, s"$root/pairs", s"$root/ckpt", threshold = 0.8)
    try q.processAllAvailable() finally q.stop()
    // the index dir is stamped with banding config + P and covers the store
    val idxDir = s"${sigDir}_idx_v2_b16x4_p1024"
    val idx = spark.read.parquet(idxDir)
    assert(idx.count() === 16L * 9, "index must hold bands rows per stored doc")
    // v2 slim layout: NO sig column — index rows are (id, band, bucket)
    // only (the fat layout duplicated each signature bands×)
    assert(idx.columns.toSet === Set("id", "band", "bucket", "__p"))
    // the per-batch read shape: an isin over __p must reach the scan as a
    // PARTITION filter (pruned directory listing, O(touched) I/O), and
    // prune to fewer partition dirs than the store holds
    val somePs = idx.select("__p").distinct().limit(2).collect().map(_.getInt(0)).toSeq
    val allPs = idx.select("__p").distinct().count()
    assert(allPs > 2, s"need >2 partitions for a discriminating prune, got $allPs")
    val pruned = spark.read.parquet(idxDir).filter(col("__p").isin(somePs: _*))
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    assert(scans.head.partitionFilters.nonEmpty,
      s"__p filter not applied as a partition filter:\n${pruned.queryExecution.executedPlan}")
    assert(scans.head.selectedPartitions.partitionCount === somePs.length,
      "partition pruning must list only the touched __p dirs")
    // behavioral: pruned read returns exactly the touched partitions' rows
    assert(pruned.select("__p").distinct().collect().map(_.getInt(0)).toSet === somePs.toSet)
  }

  test("signature index: repairs itself from a legacy flat store (no index dir)") {
    import graft.functions.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_idx_repair").toString
    val inDir = s"$root/in"; new java.io.File(inDir).mkdirs()
    val sigDir = s"$root/sigs"
    val text = "the quick brown fox jumps over the lazy dog again and again"
    // build a store WITH an index, then delete the index — the legacy
    // (pre-index) layout a deployed store would have
    Dedup.seedSignatureStore(
      Seq(100L -> text, 101L -> "totally unrelated reference body").toDF("doc_id", "text"),
      sigDir)
    val idxDir = s"${sigDir}_idx_v2_b16x4_p1024"
    def rm(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).iterator().asScala.foreach(rm)
      java.nio.file.Files.delete(p)
    }
    rm(java.nio.file.Path.of(idxDir))
    // a batch duplicating a reference doc must still pair against it —
    // the stream re-bands the flat store into a fresh index before reading
    Seq(1L -> text).toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/b1")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val q = Dedup.minHashDedupStream(
      spark.readStream.schema(schema).parquet(s"$inDir/*"),
      sigDir, s"$root/pairs", s"$root/ckpt", threshold = 0.8)
    try {
      q.processAllAvailable()
      val pairs = spark.read.parquet(s"$root/pairs")
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 100L)))
      // rebuilt index covers reference + batch docs
      assert(spark.read.parquet(idxDir).select("id").distinct().count() === 3L)
    } finally q.stop()
  }

  test("compactSignatureStore: tombstones and heal-duplicates cleared, index rebuilt, stream unaffected") {
    import graft.functions.Dedup
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val inDir = s"$root/in"; new java.io.File(inDir).mkdirs()
    val sigDir = s"$root/sigs"
    val text = "the quick brown fox jumps over the lazy dog again and again"
    // legacy store: a null-sig tombstone for doc 7, then a heal (7 appended
    // with a real sig) — the store carries 7 twice plus the tombstone
    val legacy = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(7L, null))),
      StructType(Seq(StructField("id", LongType), StructField("sig", ArrayType(LongType)))))
    legacy.write.parquet(sigDir)
    Dedup.seedSignatureStore(Seq(7L -> text, 8L -> "unrelated reference body content here")
      .toDF("doc_id", "text"), sigDir)
    assert(spark.read.parquet(sigDir).count() === 3L) // tombstone + 2 live
    Dedup.compactSignatureStore(spark, sigDir)
    val after = spark.read.parquet(sigDir)
    assert(after.count() === 2L && after.filter(col("sig").isNull).count() === 0L)
    // index rebuilt to exact coverage: bands rows per live id → the O(1)
    // footer check holds again
    val idx = spark.read.parquet(s"${sigDir}_idx_v2_b16x4_p1024")
    assert(idx.count() === 16L * 2)
    // and a stream against the compacted store still pairs correctly
    Seq(1L -> text).toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/b1")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = Dedup.minHashDedupStream(
      spark.readStream.schema(schema).parquet(s"$inDir/*"),
      sigDir, s"$root/pairs", s"$root/ckpt", threshold = 0.8)
    try {
      q.processAllAvailable()
      val pairs = spark.read.parquet(s"$root/pairs")
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 7L)))
    } finally q.stop()
  }

  test("minHashDedupStream: re-ingested id with different text keeps index consistent with store") {
    import graft.functions.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_reingest").toString
    val inDir = s"$root/in"; new java.io.File(inDir).mkdirs()
    val sigDir = s"$root/sigs"
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "an entirely different body of words sharing no shingles with the first"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val q = Dedup.minHashDedupStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(s"$inDir/*"),
      sigDir, s"$root/pairs", s"$root/ckpt", threshold = 0.8)
    try {
      Seq(5L -> textA).toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/b1")
      q.processAllAvailable()
      // doc 5 RE-INGESTED with different text: its new sig hashes to
      // different buckets, which the old id-level-vs-pruned-read guard
      // missed — conflicting band rows accumulated and the index diverged
      // from the store. The store's first signature must win everywhere.
      Seq(5L -> textB).toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/b2")
      q.processAllAvailable()
      val store = spark.read.parquet(sigDir)
      assert(store.filter(col("id") === 5L && col("sig").isNotNull).count() === 1L,
        "re-ingest must not append a second signature")
      val idx = spark.read.parquet(s"${sigDir}_idx_v2_b16x4_p1024").filter(col("id") === 5L)
      assert(idx.count() === 16L, "re-ingest must not append conflicting band rows")
      assert(idx.select("band").distinct().count() === 16L)
      // behavioral: the index still matches the STORED (textA) signature —
      // a new doc with textA pairs with 5, a new doc with textB does not
      Seq(6L -> textA).toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/b3")
      Seq(7L -> textB).toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/b4")
      q.processAllAvailable()
      val pairs = spark.read.parquet(s"$root/pairs")
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((5L, 6L)))
    } finally q.stop()
  }

  test("signature index: half-committed append heals id-granularly (missing band rows re-created)") {
    import graft.functions.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_partial").toString
    val sigDir = s"$root/sigs"
    Dedup.seedSignatureStore(
      Seq(100L -> "the quick brown fox jumps over the lazy dog again and again",
        101L -> "totally unrelated reference body content goes right here")
        .toDF("doc_id", "text"), sigDir)
    val idxDir = s"${sigDir}_idx_v2_b16x4_p1024"
    // simulate a crash mid-append: id 100 keeps only bands 0-7 in the
    // index. An id-level repair would see 100 as "present" and leave its
    // missing band buckets candidate-blind forever.
    val kept = spark.read.parquet(idxDir)
      .filter(!(col("id") === 100L && col("band") >= 8)).localCheckpoint(true)
    def rm(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).iterator().asScala.foreach(rm)
      java.nio.file.Files.delete(p)
    }
    rm(java.nio.file.Path.of(idxDir)) // also removes _coverage → gate mismatch
    kept.repartition(col("__p")).write.partitionBy("__p").parquet(idxDir)
    Dedup.ensureSigIndexCoverage(spark, sigDir, idxDir, 16, 4, 1024, 1024)
    val after = spark.read.parquet(idxDir).filter(col("id") === 100L)
    assert(after.count() === 16L, "repair must re-create exactly the missing band rows")
    assert(after.groupBy("band").count().filter(col("count") > 1).count() === 0L,
      "repair must not duplicate the surviving band rows")
  }

  test("minHashDedupStream: half-committed index append with MATCHING watermarks completes on replay") {
    import graft.functions.Dedup
    // the nastier crash window than the test above: the index append's
    // job commit half-lands (bands 0-7 visible), the store append and
    // stamps never ran — so the watermarks are stale-but-EQUAL and the
    // coverage gate's steady path never re-verifies. The REPLAY itself
    // must complete the missing bands: an id-level skip set would see id
    // 200 as indexed and leave bands 8-15 candidate-blind forever.
    val root = java.nio.file.Files.createTempDirectory("graft_halfidx").toString
    val inDir = s"$root/in"; new java.io.File(inDir).mkdirs()
    val text = "the quick brown fox jumps over the lazy dog again and again"
    Dedup.seedSignatureStore(
      Seq(100L -> "totally unrelated reference document body here").toDF("doc_id", "text"),
      s"$root/sigs")
    val idxDir = s"$root/sigs_idx_v2_b16x4_p1024"
    // source doc 200's exact band rows from a scratch store seeded with
    // the same text (signatures are deterministic), keep only bands 0-7
    Dedup.seedSignatureStore(Seq(200L -> text).toDF("doc_id", "text"), s"$root/scratch")
    spark.read.parquet(s"$root/scratch_idx_v2_b16x4_p1024")
      .filter(col("id") === 200L && col("band") < 8).localCheckpoint(true)
      .repartition(col("__p")).write.mode("append").partitionBy("__p").parquet(idxDir)
    Seq(200L -> text).toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/b1")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val q = Dedup.minHashDedupStream(
      spark.readStream.schema(schema).parquet(s"$inDir/*"),
      s"$root/sigs", s"$root/pairs", s"$root/ckpt", threshold = 0.8)
    try {
      q.processAllAvailable()
      val rows200 = spark.read.parquet(idxDir).filter(col("id") === 200L)
      assert(rows200.select("band").distinct().count() === 16L,
        "replay must complete the half-committed band set")
      assert(rows200.groupBy("band").count().filter(col("count") > 1).count() === 0L,
        "completing the append must not duplicate the surviving band rows")
      assert(spark.read.parquet(s"$root/sigs").filter(col("id") === 200L).count() === 1L)
    } finally q.stop()
  }

  test("coverage gate: steady state reads only the watermark files, no index or store data") {
    import graft.functions.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_gate").toString
    val sigDir = s"$root/sigs"
    Dedup.seedSignatureStore(
      Seq(1L -> "first document body with some words in it",
        2L -> "second document body with different words entirely")
        .toDF("doc_id", "text"), sigDir)
    val idxDir = s"${sigDir}_idx_v2_b16x4_p1024"
    def content(p: String) =
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Path.of(p))).trim
    assert(content(s"$sigDir/_count") === "2" && content(s"$idxDir/_coverage") === "2")
    // delete every DATA file, keeping only the underscore markers: if the
    // gate listed dirs or read footers it would now repair (recreating
    // rows) or fail — the steady path must notice nothing
    def purgeData(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.isDirectory(p)) {
        java.nio.file.Files.list(p).iterator().asScala.toList.foreach(purgeData)
        if (!java.nio.file.Files.list(p).iterator().hasNext) java.nio.file.Files.delete(p)
      } else if (!p.getFileName.toString.startsWith("_")) java.nio.file.Files.delete(p)
    }
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Path.of(idxDir)).iterator().asScala.toList.foreach(purgeData)
    java.nio.file.Files.list(java.nio.file.Path.of(sigDir)).iterator().asScala.toList.foreach(purgeData)
    val base = Dedup.ensureSigIndexCoverage(spark, sigDir, idxDir, 16, 4, 1024, 1024)
    assert(base === 2L)
    val recreated = java.nio.file.Files.walk(java.nio.file.Path.of(idxDir)).iterator().asScala
      .count(p => p.getFileName.toString.endsWith(".parquet"))
    assert(recreated === 0, "steady-state gate must not touch (or repair) index data")
  }

  test("signature store: id-partitioned layout, _layout records the modulus, reads prune") {
    import graft.functions.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_storelayout").toString
    val sigDir = s"$root/sigs"
    Dedup.seedSignatureStore(
      (0L until 8L).map(i => i -> s"document number $i with its own distinct content body $i")
        .toDF("doc_id", "text"), sigDir)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Path.of(s"$sigDir/_layout"))).trim === "1024")
    val store = spark.read.parquet(sigDir)
    assert(store.columns.toSet === Set("id", "sig", "__sp"))
    assert(store.select("__sp").distinct().count() === 8L) // pmod(0..7, 1024)
    val pruned = spark.read.parquet(sigDir).filter(col("__sp").isin(0, 1))
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.head.partitionFilters.nonEmpty,
      s"__sp filter not applied as a partition filter:\n${pruned.queryExecution.executedPlan}")
    assert(scans.head.selectedPartitions.partitionCount === 2,
      "partition pruning must list only the touched __sp dirs")
  }

  test("signature store: missing _layout on a partitioned store fails fast (no silent mis-prune)") {
    import graft.functions.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_layoutguard").toString
    val sigDir = s"$root/sigs"
    val ref = Seq(50L -> "reference body for the layout guard test").toDF("doc_id", "text")
    Dedup.seedSignatureStore(ref, sigDir)
    java.nio.file.Files.delete(java.nio.file.Path.of(s"$sigDir/_layout"))
    // pruned reads would filter __sp with a GUESSED modulus and silently
    // miss rows — the reader must refuse instead
    val e = intercept[IllegalStateException] {
      Dedup.seedSignatureStore(
        Seq(51L -> "another doc that would need a pruned anti-join").toDF("doc_id", "text"),
        sigDir)
    }
    assert(e.getMessage.contains("_layout"))
    // restoring the modulus (a single integer) heals without a rewrite
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$sigDir/_layout"), "1024\n")
    Dedup.seedSignatureStore(
      Seq(51L -> "another doc that would need a pruned anti-join").toDF("doc_id", "text"), sigDir)
    assert(spark.read.parquet(sigDir).count() === 2L)
  }

  test("compaction guard: marker excludes stream batches, seeds and second compactions") {
    import graft.functions.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_guard").toString
    val inDir = s"$root/in"; new java.io.File(inDir).mkdirs()
    val sigDir = s"$root/sigs"
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val ref = Seq(100L -> text).toDF("doc_id", "text")
    Dedup.seedSignatureStore(ref, sigDir)
    val marker = java.nio.file.Path.of(s"$sigDir.compacting")
    java.nio.file.Files.writeString(marker, "pid=test\n")
    intercept[IllegalStateException] { Dedup.seedSignatureStore(ref, sigDir) }
    intercept[IllegalStateException] { Dedup.compactSignatureStore(spark, sigDir) }
    // a stream batch STARTING during compaction fails fast instead of
    // reading a half-swapped store
    Seq(1L -> text).toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/b1")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val q = Dedup.minHashDedupStream(
      spark.readStream.schema(schema).parquet(s"$inDir/*"),
      sigDir, s"$root/pairs", s"$root/ckpt", threshold = 0.8)
    try {
      scala.util.Try(q.processAllAvailable())
      assert(q.exception.isDefined, "stream batch must fail fast on the compaction marker")
    } finally q.stop()
    java.nio.file.Files.delete(marker)
    Dedup.compactSignatureStore(spark, sigDir) // now runs, and cleans its marker up
    assert(!java.nio.file.Files.exists(marker))
  }

  test("compactSignatureStore: banding-config mismatch fails fast, leaving no marker") {
    import graft.functions.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_compact_cfg").toString
    val sigDir = s"$root/sigs"
    Dedup.seedSignatureStore(
      Seq(50L -> "some reference text for the config guard").toDF("doc_id", "text"), sigDir)
    // compacting a 16x4 store as 8x4 would rebuild a wrongly-stamped index
    // from mis-sliced signatures — must throw before touching anything
    intercept[IllegalArgumentException] {
      Dedup.compactSignatureStore(spark, sigDir, bands = 8, rowsPerBand = 4)
    }
    assert(!java.nio.file.Files.exists(java.nio.file.Path.of(s"$sigDir.compacting")),
      "a pre-swap validation failure must not leave the store bricked")
    assert(!java.nio.file.Files.exists(java.nio.file.Path.of(s"${sigDir}_idx_v2_b8x4_p1024")))
  }

  test("legacy flat store: appended flat until compactSignatureStore migrates the layout") {
    import graft.functions.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_legacy").toString
    val inDir = s"$root/in"; new java.io.File(inDir).mkdirs()
    val sigDir = s"$root/sigs"
    val text = "the quick brown fox jumps over the lazy dog again and again"
    // a store written by the pre-partitioned layout: (id, sig) files at the
    // dir root
    graft.functions.Dedup.minHashSignaturesNative(
      Seq(100L -> text).toDF("doc_id", "text")).write.parquet(sigDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    Seq(1L -> text).toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/b1")
    val q = Dedup.minHashDedupStream(
      spark.readStream.schema(schema).parquet(s"$inDir/*"),
      sigDir, s"$root/pairs", s"$root/ckpt", threshold = 0.8)
    try {
      q.processAllAvailable()
      val pairs = spark.read.parquet(s"$root/pairs")
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 100L)))
      // the append respected the legacy layout: no partition dirs yet
      assert(!spark.read.parquet(sigDir).columns.contains("__sp"))
    } finally q.stop()
    Dedup.compactSignatureStore(spark, sigDir)
    assert(spark.read.parquet(sigDir).columns.contains("__sp"), "compact migrates the layout")
    assert(java.nio.file.Files.exists(java.nio.file.Path.of(s"$sigDir/_layout")))
    assert(spark.read.parquet(sigDir).count() === 2L)
  }

  test("minHashDedupStream: restart from checkpoint keeps pairs and store consistent") {
    import graft.functions.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_neardup_rs").toString
    val inDir = s"$root/in"; new java.io.File(inDir).mkdirs()
    val text = "some repeated text that will be duplicated across batches here"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def start() = Dedup.minHashDedupStream(
      spark.readStream.schema(schema).parquet(s"$inDir/*"),
      s"$root/sigs", s"$root/pairs", s"$root/ckpt", threshold = 0.8)
    val q1 = start()
    try {
      Seq(1L -> text, 2L -> "unrelated filler content nothing shared with anything else")
        .toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/b1")
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      Seq(3L -> text).toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/b2")
      q2.processAllAvailable()
      val pairs = spark.read.parquet(s"$root/pairs")
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 3L))) // the post-restart doc pairs with the pre-restart corpus
      val ids = spark.read.parquet(s"$root/sigs").select("id")
        .collect().map(_.getLong(0)).sorted
      assert(ids === Array(1L, 2L, 3L))
    } finally q2.stop()
  }

  test("triangleCounts: hand-computed triangles; duplicates, reversals and self-loops tolerated") {
    // triangles {1,2,3} and {3,4,5}; (5,6) dangles; (2,1) re-states an
    // edge reversed, (3,3) is a self-loop — both must be inert
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 3L),
      (5L, 6L), (2L, 1L), (3L, 3L)).toDF("u", "v")
    val out = GraphAnalytics.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
    // K4 = 4 triangles, 3 per node — the wedge/orientation bookkeeping
    // must not double- or under-count when every wedge closes
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)).toDF("u", "v")
    val k4out = GraphAnalytics.triangleCounts(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k4out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("clusteringCoefficient: triangle closure fraction, degree-1 and tree nodes score 0") {
    // K3 plus a pendant: 1-2-3 triangle, 4 hangs off 3
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val out = GraphAnalytics.clusteringCoefficient(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((2L, 1L, 1.0)))        // both neighbor pairs... 1 wedge, closed
    assert(out(2L) === ((2L, 1L, 1.0)))
    assert(out(3L) === ((3L, 1L, 0.333333)))   // 3 wedges, 1 closed
    assert(out(4L) === ((1L, 0L, 0.0)))        // degree 1: no wedge
  }

  test("edgeSupport: per-edge triangle counts; bridges 0; sum = 3x triangles") {
    // K4 on 1-4 (every edge closes 2 triangles), a bridge 4-5 (support
    // 0), and triangle 5-6-7 (each edge 1); duplicate/reversed edges
    // and self-loops tolerated like triangleCounts
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L), (5L, 7L), (7L, 5L), (6L, 6L)).toDF("u", "v")
    val sup = GraphAnalytics.edgeSupport(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sup.size === 10) // 6 K4 + bridge + 3 triangle edges, deduped
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .foreach(k => assert(sup(k) === 2L, s"K4 edge $k"))
    assert(sup((4L, 5L)) === 0L) // the bridge
    Seq((5L, 6L), (6L, 7L), (5L, 7L)).foreach(k => assert(sup(k) === 1L))
    // global invariant: Σ support = 3 × Σ per-node triangles / 3·... =
    // 3 × total triangles (K4 has 4, the triangle 1)
    assert(sup.values.sum === 3L * 5)
    val triTotal = GraphAnalytics.triangleCounts(e).agg(sum("n_triangles"))
      .collect().head.getLong(0)
    assert(sup.values.sum === triTotal) // Σ node-credits == Σ edge-credits
  }

  test("adamicAdar: witness degrees weight the support; bridges 0") {
    // K4 on 1-4 + bridge 4-5 + triangle 5-6-7 (the edgeSupport fixture).
    // Degrees: 1,2,3 → 3; 4 → 4; 5 → 3; 6,7 → 2.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L), (5L, 7L)).toDF("u", "v")
    val out = GraphAnalytics.adamicAdar(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // edge (1,2): witnesses 3 (deg 3) and 4 (deg 4)
    assert(out((1L, 2L)) === ((2L, r6(1 / math.log(3) + 1 / math.log(4)))))
    // edge (3,4): witnesses 1, 2 (both deg 3)
    assert(out((3L, 4L)) === ((2L, r6(2 / math.log(3)))))
    // triangle edge (6,7): witness 5 (deg 3)
    assert(out((6L, 7L)) === ((1L, r6(1 / math.log(3)))))
    // the bridge closes nothing
    assert(out((4L, 5L)) === ((0L, 0.0)))
    // support column agrees with edgeSupport everywhere
    val sup = GraphAnalytics.edgeSupport(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.view.mapValues(_._1).toMap === sup)
  }

  test("harmonicCloseness: exact harmonic on a path when all vertices seed; depth bound; component isolation") {
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // path 1-2-3-4-5 plus the isolated pair 8-9
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L)).toDF("u", "v")
    // nSeeds >= |V|: every vertex is a pivot -> exact bounded harmonic
    val out = GraphAnalytics.harmonicCloseness(e, nSeeds = 10, maxDepth = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 8L, 9L))
    assert(out(1L) === ((4L, r6(1 + 0.5 + 1.0 / 3 + 0.25))))
    assert(out(2L) === ((4L, r6(1 + 1 + 0.5 + 1.0 / 3))))
    assert(out(3L) === ((4L, 3.0)))                  // 2×1 + 2×0.5
    assert(out(8L) === ((1L, 1.0)))                  // isolated pair
    // depth bound: at maxDepth=2 node 1 only reaches 2 and 3
    val bounded = GraphAnalytics.harmonicCloseness(e, nSeeds = 10, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(bounded(1L) === ((2L, 1.5)))
    // fewer seeds than vertices: output stays a subset of the full sums
    val sampled = GraphAnalytics.harmonicCloseness(e, nSeeds = 3, maxDepth = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    sampled.foreach { case (id, h) => assert(h <= out(id)._2 + 1e-9, s"node $id oversum") }
  }

  test("eccentricitySampled: exact ecc on a path when all vertices seed; depth bound; loop-only ids dropped") {
    // path 1-2-3-4-5 plus the isolated pair 8-9 and a self-loop-only
    // node (7,7) — hand eccentricities at maxDepth=4: 1↦4, 2↦3, 3↦2,
    // 4↦3, 5↦4, 8/9↦1. (round 13, advisor find: the op had no test.)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L), (7L, 7L)).toDF("u", "v")
    val out = GraphAnalytics.eccentricitySampled(e, nSeeds = 10, maxDepth = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // canonicalEdges drops self-loops, so a loop-only id is not a vertex
    // at all (it cannot surface as an isolated (0,0) seed — absence IS
    // the contract)
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 8L, 9L))
    assert(out(1L) === ((4L, 4L))) // reaches 2,3,4,5
    assert(out(2L) === ((3L, 4L)))
    assert(out(3L) === ((2L, 4L)))
    assert(out(5L) === ((4L, 4L)))
    assert(out(8L) === ((1L, 1L))) // isolated pair: ecc 1, reaches 9 only
    // depth bound truncates: seed 1 at maxDepth=2 sees only 2 and 3
    val bounded = GraphAnalytics.eccentricitySampled(e, nSeeds = 10, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(bounded(1L) === ((2L, 2L)))
    // fewer seeds than vertices: a subset of the full rows, same values
    val sampled = GraphAnalytics.eccentricitySampled(e, nSeeds = 3, maxDepth = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(sampled.size === 3)
    sampled.foreach { case (id, v) => assert(v === out(id), s"seed $id drifted") }
    // argument guards
    intercept[IllegalArgumentException] { GraphAnalytics.eccentricitySampled(e, 0, 4) }
    intercept[IllegalArgumentException] { GraphAnalytics.eccentricitySampled(e, 3, 0) }
  }

  test("degreeAssortativity: star is maximally disassortative, balanced cycle undefined-free") {
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // star 0-{1..4}: every edge joins deg-4 to deg-1 twice (mirrored) →
    // hand Pearson over pairs {(4,1)×4, (1,4)×4} = -1
    val star = (1L to 4L).map(i => (0L, i)).toDF("u", "v")
    val s = GraphAnalytics.degreeAssortativity(star).head()
    assert(r6(s.getDouble(0)) === -1.0)
    // 4-cycle: all degrees 2 → zero variance → corr NULL (not NaN/crash)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("u", "v")
    assert(GraphAnalytics.degreeAssortativity(cyc).head().isNullAt(0))
    // mixed: K3 + pendant — hand-computed via the same Pearson the
    // oracle uses. degrees: 1,2 → 2; 3 → 3; 4 → 1
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val pairs = Seq((2, 2), (2, 2), (2, 3), (3, 2), (2, 3), (3, 2), (3, 1), (1, 3))
    val n = pairs.size.toDouble
    val mx = pairs.map(_._1).sum / n; val my = pairs.map(_._2).sum / n
    val cov = pairs.map { case (a, b) => (a - mx) * (b - my) }.sum
    val sx = math.sqrt(pairs.map { case (a, _) => (a - mx) * (a - mx) }.sum)
    val sy = math.sqrt(pairs.map { case (_, b) => (b - my) * (b - my) }.sum)
    assert(r6(GraphAnalytics.degreeAssortativity(g).head().getDouble(0)) ===
      r6(cov / (sx * sy)))
  }

  test("bipartiteProject: shared-left weights, canonical orientation, degree cap") {
    // left 10: {1,2,3}; left 20: {2,3}; left 30: {3,4}; left 40: {1,2,3,4,5}
    val e = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 2L), (20L, 3L),
      (30L, 3L), (30L, 4L), (40L, 1L), (40L, 2L), (40L, 3L), (40L, 4L), (40L, 5L))
      .toDF("l", "r")
    val p = GraphAnalytics.bipartiteProject(e)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(p((2L, 3L)) === 3L) // shared lefts 10, 20, 40
    assert(p((1L, 2L)) === 2L && p((3L, 4L)) === 2L && p((4L, 5L)) === 1L)
    p.keys.foreach { case (u, v) => assert(u < v) }
    // capping left degree at 3 drops the size-5 order 40 entirely
    val capped = GraphAnalytics.bipartiteProject(e, maxLeftDegree = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped((2L, 3L)) === 2L && !capped.contains((4L, 5L)))
  }

  test("weightedSSSP: cheaper long path beats direct edge; horizon bounds; unreached absent") {
    // 1 -(10)- 2; 1 -(1)- 3 -(1)- 4 -(1)- 2: the 3-edge path costs 3 <
    // the direct 10, but needs >= 3 rounds to surface; 9 is unreachable
    val e = Seq((1L, 2L, 10.0), (1L, 3L, 1.0), (3L, 4L, 1.0), (4L, 2L, 1.0),
      (8L, 9L, 1.0)).toDF("u", "v", "w")
    def run(r: Int) = GraphAnalytics.weightedSSSP(e, source = 1L, rounds = r)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val r1 = run(1)
    assert(r1 === Map(1L -> 0.0, 2L -> 10.0, 3L -> 1.0))
    val r2 = run(2)
    assert(r2(2L) === 10.0 && r2(4L) === 2.0) // path not yet through
    val r3 = run(3)
    assert(r3(2L) === 3.0, s"3-edge path must win by round 3, got ${r3(2L)}")
    assert(!r3.contains(8L) && !r3.contains(9L), "other component must not appear")
    // a further round changes nothing (all shortest paths <= 3 edges)
    assert(run(4) === r3)
  }

  test("kTrussEdges: bridge peels at k=3, triangle peels at k=4, K4 survives; cascade needs a round") {
    // K4 on 1-4 + bridge 4-5 + triangle 5-6-7 (the edgeSupport fixture)
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L), (5L, 7L)).toDF("u", "v")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val k4 = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val tri = Set((5L, 6L), (6L, 7L), (5L, 7L))
    // 3-truss: every edge in >= 1 triangle — only the bridge peels
    assert(pairs(GraphAnalytics.kTrussEdges(e, k = 3, iters = 3)) === (k4 ++ tri))
    // 4-truss: the triangle's edges have support 1 — K4 alone survives
    assert(pairs(GraphAnalytics.kTrussEdges(e, k = 4, iters = 3)) === k4)
    // 5-truss: K4 edges have support 2 < 3 — everything peels
    assert(pairs(GraphAnalytics.kTrussEdges(e, k = 5, iters = 3)) === Set.empty)
    // cascade: path of triangles sharing edges — (a) one round removes
    // the weak triangle, (b) the SECOND round re-evaluates support in
    // the shrunken graph. Fixture: K4 + pendant triangle (4,8,9): at
    // k=4 round 1 peels (4,8),(4,9),(8,9) (support 1)... already
    // covered; pin instead that iters=1 UNDER-peels when removal
    // cascades: triangle chain 10-11-12, 11-12-13 — at k=4 both
    // triangles peel in round 1 (each edge support <= 2... the shared
    // edge (11,12) has support 2 >= 2) — shared edge survives round 1
    // but its wings are gone, so round 2 must peel it too
    val chain = Seq((10L, 11L), (10L, 12L), (11L, 12L), (11L, 13L), (12L, 13L))
      .toDF("u", "v")
    val r1 = pairs(GraphAnalytics.kTrussEdges(chain, k = 4, iters = 1))
    assert(r1 === Set((11L, 12L)), s"round 1 keeps only the shared edge, got $r1")
    assert(pairs(GraphAnalytics.kTrussEdges(chain, k = 4, iters = 2)) === Set.empty)
  }

  test("kTrussEdges support0: precomputed support == recompute path; coverage guarded") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L), (5L, 7L)).toDF("u", "v")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sup = GraphAnalytics.edgeSupport(e)
    for (k <- Seq(3, 4, 5))
      assert(pairs(GraphAnalytics.kTrussEdges(e, k, iters = 3, support0 = Some(sup)))
        === pairs(GraphAnalytics.kTrussEdges(e, k, iters = 3)),
        s"support0 path must match the recompute path at k=$k")
    // extra rows for non-edges are ignored (the inner join drops them)
    val extra = sup.unionAll(Seq((100L, 200L, 99L)).toDF("a", "b", "support"))
    assert(pairs(GraphAnalytics.kTrussEdges(e, k = 4, iters = 3, support0 = Some(extra)))
      === pairs(GraphAnalytics.kTrussEdges(e, k = 4, iters = 3)))
    // guard failures raise from the codegen'd assert_true inside the seed
    // join (zero-extra-job guard), surfacing wrapped in a SparkException
    // at kTrussEdges' eager localCheckpoint — walk the cause chain
    // a frame that misses a canonical edge fails fast, not silently
    val missing = sup.filter(!(col("a") === 4L && col("b") === 5L))
    val err = intercept[Exception] {
      GraphAnalytics.kTrussEdges(e, k = 4, iters = 3, support0 = Some(missing))
    }
    assert(chainMsg(err).contains("support0"), chainMsg(err))
    // a frame with duplicate (a, b) rows fails fast too — it would
    // otherwise silently duplicate edges in the peel
    val dup = sup.unionAll(sup.limit(1))
    val err2 = intercept[Exception] {
      GraphAnalytics.kTrussEdges(e, k = 4, iters = 3, support0 = Some(dup))
    }
    assert(chainMsg(err2).contains("exactly one"), chainMsg(err2))
  }

  test("clusteringCoefficient triangles0: precomputed triangle counts == recompute path") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val tri = GraphAnalytics.triangleCounts(e)
    val direct = GraphAnalytics.clusteringCoefficient(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val shared = GraphAnalytics.clusteringCoefficient(e, triangles0 = Some(tri)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(shared === direct)
    // wrong-graph guard: a triangles0 node absent from the edge set's
    // vertex set proves a mismatched frame (under-coverage is legitimately
    // unguardable — absence means zero triangles — but THIS direction is
    // checkable, via the zero-extra-job assert_true on the full-outer
    // output join, raising at the caller's first action)
    val alien = tri.unionAll(Seq((999L, 7L)).toDF("node", "n_triangles"))
    val err = intercept[Exception] {
      GraphAnalytics.clusteringCoefficient(e, triangles0 = Some(alien)).collect()
    }
    assert(chainMsg(err).contains("triangles0"), chainMsg(err))
    // duplicate (node) rows raise too — they would otherwise silently
    // duplicate output rows through the full-outer join (the kTrussEdges
    // support0 rule, applied here)
    val dup = tri.unionAll(tri.limit(1))
    val err2 = intercept[Exception] {
      GraphAnalytics.clusteringCoefficient(e, triangles0 = Some(dup)).collect()
    }
    assert(chainMsg(err2).contains("duplicate"), chainMsg(err2))
  }

  test("randomWalks: valid edges, full length, deterministic, seed-sensitive") {
    // K5 clique: every vertex has 4 neighbors, so walks never stall and
    // every step is a genuine 4-way draw
    val e = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)).toDF("u", "v")
    val und = e.collect().flatMap(r =>
      Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0)))).toSet
    def runWalks(seed: Long) = GraphAnalytics.randomWalks(e, nWalks = 5,
      walkLength = 5, seed = seed).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val w = runWalks(42L)
    // 5 walks × 5 steps, one start per vertex (nWalks = |V|)
    assert(w.size === 25)
    assert(w.keys.map(_._1).toSet === Set(1L, 2L, 3L, 4L, 5L))
    // step 0 is the start node; every consecutive pair is a real edge
    for (walk <- 1L to 5L) {
      assert(w((walk, 0)) === walk)
      for (s <- 0 until 4)
        assert(und.contains((w((walk, s)), w((walk, s + 1)))),
          s"walk $walk step $s: ${w((walk, s))} -> ${w((walk, s + 1))} not an edge")
    }
    // deterministic: same seed → identical walks; different seed → different
    assert(runWalks(42L) === w)
    assert(runWalks(7L) !== w)
    // a short graph walk ends when... (undirected graphs never stall: the
    // predecessor is always a neighbor) — single-edge graph just oscillates
    val osc = GraphAnalytics.randomWalks(Seq((1L, 2L)).toDF("u", "v"),
      nWalks = 2, walkLength = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(osc((1L, 0)) === 1L && osc((1L, 1)) === 2L &&
      osc((1L, 2)) === 1L && osc((1L, 3)) === 2L)
  }

  test("jaccardLinks: support over excluded-endpoint union; bridge 0") {
    // the edgeSupport fixture: K4 on 1-4 + bridge 4-5 + triangle 5-6-7.
    // Degrees: 1,2,3 → 3; 4 → 4; 5 → 3; 6,7 → 2.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L), (5L, 7L)).toDF("u", "v")
    val out = GraphAnalytics.jaccardLinks(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // edge (1,2): support 2, union = (3−1)+(3−1)−2 = 2 → 1.0
    assert(out((1L, 2L)) === ((2L, 1.0)))
    // edge (1,4): support 2, union = (3−1)+(4−1)−2 = 3 → 0.666667
    assert(out((1L, 4L)) === ((2L, 0.666667)))
    // triangle edge (6,7): support 1, union = (2−1)+(2−1)−1 = 1 → 1.0
    assert(out((6L, 7L)) === ((1L, 1.0)))
    // the bridge (4,5): support 0, union = 3+2−0 = 5 → 0.0
    assert(out((4L, 5L)) === ((0L, 0.0)))
    // support column agrees with edgeSupport everywhere
    val sup = GraphAnalytics.edgeSupport(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.view.mapValues(_._1).toMap === sup)
    // a degree-1↔degree-1 bridge (empty union) emits 0, not NaN
    val lone = GraphAnalytics.jaccardLinks(Seq((8L, 9L)).toDF("u", "v")).collect()
    assert(lone.length === 1 && lone.head.getLong(2) === 0L
      && lone.head.getDouble(3) === 0.0)
  }

  test("modularity: per-community q matches the hand computation") {
    // two triangles bridged at 3-5 (the LPA fixture) with the perfect
    // assignment: m = 7, each community e_c = 3, d_c = 7 →
    // q_c = 3/7 − (7/14)² = 0.178571 each, Q = 0.357142
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (5L, 6L), (6L, 7L), (5L, 7L), (3L, 5L)).toDF("u", "v")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (5L, 20L), (6L, 20L), (7L, 20L)).toDF("id", "label")
    val out = GraphAnalytics.modularity(e, labels).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val qc = math.rint((3.0 / 7 - math.pow(7.0 / 14, 2)) * 1e6) / 1e6
    assert(out === Map(10L -> ((3L, 3L, 7L, qc)), 20L -> ((3L, 3L, 7L, qc))))
    // the all-one-community assignment scores 0 (e_c = m, d_c = 2m)
    val one = GraphAnalytics.modularity(e,
        Seq(1L, 2L, 3L, 5L, 6L, 7L).map(_ -> 1L).toDF("id", "label")).collect()
    assert(one.length === 1 && one.head.getDouble(4) === 0.0)
    // a labeled node with no edges: counted in n_nodes, degree 0
    val extra = GraphAnalytics.modularity(e,
      labels.unionAll(Seq((99L, 10L)).toDF("id", "label"))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(extra(10L) === 4L)
  }

  test("kCoreEdges: peeling cascade matches hand computation; fixpoint early-exit") {
    // path 1-2-3-4 plus triangle 5-6-7: 2-core = the triangle only, and
    // reaching it needs TWO peels (the path erodes from both ends)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L), (5L, 7L)).toDF("u", "v")
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tri = Set((5L, 6L), (5L, 7L), (6L, 7L))
    assert(edgeSet(GraphAnalytics.kCoreEdges(e, k = 2, iters = 1))
      === tri ++ Set((2L, 3L)))                 // first peel drops only 1 and 4
    assert(edgeSet(GraphAnalytics.kCoreEdges(e, k = 2, iters = 2)) === tri)
    assert(edgeSet(GraphAnalytics.kCoreEdges(e, k = 2, iters = 50)) === tri) // early exit
    assert(GraphAnalytics.kCoreEdges(e, k = 4, iters = 5).count() === 0L)
  }

  test("pageRankStatic matches a hand-rolled power iteration + rank-sum normalization") {
    // star + chain: 0→1, 0→2, 2→3 (ranges irrelevant to rank)
    val ranges = Seq(RangeDef(0, 100, 0, Seq(1)))
    val g = Loaders.fromList(spark,
      Seq(InputEdge(0, 1, Seq(1), addReverse = false),
        InputEdge(0, 2, Seq(1), addReverse = false),
        InputEdge(2, 3, Seq(1), addReverse = false)), ranges)
    val iters = 3
    // reference model: r₀=1; rᵢ = 0.15 + 0.85·Σ_in rᵢ₋₁/outdeg; scale Σ→|V|
    val edges = Seq(0L -> 1L, 0L -> 2L, 2L -> 3L)
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var r = Seq(0L, 1L, 2L, 3L).map(v => v -> 1.0).toMap
    for (_ <- 1 to iters) {
      val msg = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / outdeg(s) }.sum).toMap
      r = r.keys.map(v => v -> (0.15 + 0.85 * msg.getOrElse(v, 0.0))).toMap
    }
    val scale = r.size / r.values.sum
    val want = r.view.mapValues(x => math.rint(x * scale * 1e6) / 1e6).toMap
    val got = GraphAnalytics.pageRankStatic(g, iters).collect()
      .map(x => x.getLong(0) -> math.rint(x.getDouble(1) * 1e6) / 1e6).toMap
    assert(got === want)
  }

  test("personalizedPageRank matches a hand-rolled seeded power iteration") {
    // star + chain: 0→1, 0→2, 2→3, seeded at 0 — mass flows down the
    // chain but the reset term only refills the SEED
    val ranges = Seq(RangeDef(0, 100, 0, Seq(1)))
    val g = Loaders.fromList(spark,
      Seq(InputEdge(0, 1, Seq(1), addReverse = false),
        InputEdge(0, 2, Seq(1), addReverse = false),
        InputEdge(2, 3, Seq(1), addReverse = false)), ranges)
    val edges = Seq(0L -> 1L, 0L -> 2L, 2L -> 3L)
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val iters = 4
    var r = Seq(0L, 1L, 2L, 3L).map(v => v -> (if (v == 0L) 1.0 else 0.0)).toMap
    for (_ <- 1 to iters) {
      val msg = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / outdeg(s) }.sum).toMap
      r = r.keys.map(v =>
        v -> (0.15 * (if (v == 0L) 1.0 else 0.0) + 0.85 * msg.getOrElse(v, 0.0))).toMap
    }
    val want = r.view.mapValues(x => math.rint(x * 1e6) / 1e6).toMap
    val got = GraphAnalytics.personalizedPageRank(g, source = 0L, numIter = iters).collect()
      .map(x => x.getLong(0) -> math.rint(x.getDouble(1) * 1e6) / 1e6).toMap
    assert(got === want)
    // proximity semantics: the seed outranks its children, children
    // outrank the grandchild; total mass never exceeds the injected 1
    assert(got(0L) > got(2L) && got(2L) > got(3L))
    assert(got.values.sum <= 1.0 + 1e-9)
    // a seed with no edges: everything 0 except the seed's reset mass
    val lone = GraphAnalytics.personalizedPageRank(g, source = 3L, numIter = 2).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(lone(3L) === 0.15 && lone(0L) === 0.0)
  }

  test("betweennessSampled matches hand-computed Brandes on path, star, and diamond") {
    import spark.implicits._
    def bc(edges: Seq[(Long, Long)], nSeeds: Int, maxDepth: Int = 4): Map[Long, Double] =
      GraphAnalytics.betweennessSampled(edges.toDF("u", "v"), nSeeds, maxDepth)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // path 0-1-2-3-4, all 5 sources: ordered-pair interior counts 6/8/6
    val path = bc(Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L), nSeeds = 5)
    assert(path === Map(0L -> 0.0, 1L -> 6.0, 2L -> 8.0, 3L -> 6.0, 4L -> 0.0))
    // star K1,3: the hub carries every ordered leaf pair (6), leaves 0
    val star = bc(Seq(0L -> 1L, 0L -> 2L, 0L -> 3L), nSeeds = 4)
    assert(star === Map(0L -> 6.0, 1L -> 0.0, 2L -> 0.0, 3L -> 0.0))
    // diamond C4 (0-1, 0-2, 1-3, 2-3): every opposite pair has TWO
    // shortest paths, so each node carries 2 ordered pairs × 1/2 = 1.0 —
    // pins the σ-division (path-count splitting), not just path counting
    val diamond = bc(Seq(0L -> 1L, 0L -> 2L, 1L -> 3L, 2L -> 3L), nSeeds = 4)
    assert(diamond === Map(0L -> 1.0, 1L -> 1.0, 2L -> 1.0, 3L -> 1.0))
    // depth bound: on the path with maxDepth=2 only ≤2-hop pairs count —
    // node 2 keeps exactly (1,3) and (3,1)
    val bounded = bc(Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L), nSeeds = 5, maxDepth = 2)
    assert(bounded(2L) === 2.0 && bounded(1L) === 2.0 && bounded(0L) === 0.0)
    // sampling determinism: 2 md5-pivot seeds of the path = a fixed subset
    val sampled = bc(Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L), nSeeds = 2)
    assert(sampled.values.sum > 0.0 && sampled === bc(Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L), nSeeds = 2))
  }

  def sccOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    GraphAnalytics.stronglyConnectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("stronglyConnectedComponents: cycles collapse, DAGs stay apart, chained SCCs span rounds") {
    // directed triangle + tail + self-loop singleton + duplicate edge
    assert(sccOf(Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 2L -> 0L, 2L -> 3L, 3L -> 4L, 5L -> 5L))
      === Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
    // pure DAG (the diamond): every vertex its own component — the
    // directed/undirected distinction a3's CC cannot make
    assert(sccOf(Seq(0L -> 1L, 0L -> 2L, 1L -> 3L, 2L -> 3L))
      === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    // high-id cycle FEEDING a low-id cycle: the first coloring paints all
    // four vertices 21, only {20,21} retires (the class members reaching
    // the pivot), and {0,1} must be recovered by outer round 2 — pins the
    // multi-round path, not just the one-shot happy case
    assert(sccOf(Seq(20L -> 21L, 21L -> 20L, 21L -> 0L, 0L -> 1L, 1L -> 0L))
      === Map(20L -> 21L, 21L -> 21L, 0L -> 1L, 1L -> 1L))
  }

  test("stronglyConnectedComponents: backward-closure cap breach throws, never partial-labels") {
    import spark.implicits._
    // star-out pivot with a long return chain: the forward fixpoint
    // converges in ~2 rounds (the pivot colors every member in one hop),
    // but the backward closure needs chainLen steps — a too-small cap
    // must THROW, not retire a partial SCC and let the orphans trim as
    // singletons (the silent-wrongness mode the guard exists for)
    val chainLen = 20; val pivot = 1000L
    val edges = (1 to chainLen).map(i => (pivot, i.toLong)) ++
      (1 until chainLen).map(i => (i.toLong, (i + 1).toLong)) ++
      Seq((chainLen.toLong, pivot))
    assertThrows[IllegalArgumentException] {
      GraphAnalytics.stronglyConnectedComponents(
        edges.toDF("src", "dst"), maxRounds = 3).collect()
    }
    // with an adequate cap the same graph is ONE component
    val ok = sccOf(edges)
    assert(ok.size === chainLen + 1 && ok.values.toSet === Set(pivot))
  }

  test("condensationLayers: cycles contract, layers = longest cross-SCC chain") {
    import spark.implicits._
    // chain 20→21 into cycle {0,1}, which feeds cycle {10,11}; 5 also
    // feeds {10,11} from layer 0 — the max (not min/any) path must win
    val edges = Seq(20L -> 21L, 21L -> 0L, 0L -> 1L, 1L -> 0L,
      1L -> 10L, 10L -> 11L, 11L -> 10L, 5L -> 10L)
    val got = GraphAnalytics.condensationLayers(edges.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (20L, 20L, 0L), (21L, 21L, 1L), (0L, 1L, 2L), (1L, 1L, 2L),
      (5L, 5L, 0L), (10L, 11L, 3L), (11L, 11L, 3L)))
    // supplied-sccs path: the memo share (a23 → a24) must equal the
    // self-computed run, and an under-covering assignment must raise
    // (the r14 zero-extra-job guard: left-join + assert_true in the arc
    // build, surfacing wrapped at the arcs localCheckpoint)
    val scc = GraphAnalytics.stronglyConnectedComponents(edges.toDF("src", "dst"))
    val shared = GraphAnalytics.condensationLayers(edges.toDF("src", "dst"),
        sccs = Some(scc))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(shared === got)
    val holey = scc.filter(col("id") =!= 5L)
    val err = intercept[Exception] {
      GraphAnalytics.condensationLayers(edges.toDF("src", "dst"), sccs = Some(holey))
    }
    assert(chainMsg(err).contains("does not cover"), chainMsg(err))
  }

  test("stronglyConnectedComponents == brute-force mutual reachability on a deterministic random digraph") {
    val n = 40
    val edges = for {
      a <- 0 until n; b <- 0 until n
      if a != b && (a * 31 + b * 17) % 23 == 0
    } yield (a.toLong, b.toLong)
    val reach = Array.fill(n, n)(false)
    edges.foreach { case (a, b) => reach(a.toInt)(b.toInt) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expect = verts.map { v =>
      v -> verts.filter(u => u == v ||
        (reach(v.toInt)(u.toInt) && reach(u.toInt)(v.toInt))).max
    }.toMap
    assert(sccOf(edges) === expect)
  }

  test("iterative analytics release their per-call edge-relation caches on return") {
    // round-12 ADVICE pin: hits/personalizedPageRank/labelPropagation
    // persist() repartitioned |E| layouts for their iteration and must
    // unpersist them before returning (the results ride eager
    // localCheckpoints) — without the finally-unpersist every DISTINCT
    // input graph left cached blocks resident for the session lifetime.
    // Witness = the CacheManager entry count: persist() registers there
    // (strongly held until unpersist — exactly the leak class), while
    // localCheckpoint RDDs never touch it, so the count is immune to
    // GC/cleaner timing. cachedData is private; read via reflection
    // (pinned to the Spark 4.1 field, cheap to re-point on upgrade).
    def cacheEntryCount(): Int = {
      val cm = spark.sharedState.cacheManager
      val m = cm.getClass.getDeclaredMethods.find(_.getName == "cachedData").get
      m.setAccessible(true)
      m.invoke(cm).asInstanceOf[IndexedSeq[_]].size
    }
    val ranges = Seq(RangeDef(0, 100, 0, Seq(1)))
    val base = cacheEntryCount()
    // three DISTINCT graphs per op — identical plans would dedupe in the
    // cache manager and mask a leak
    for (shift <- 0 to 2) {
      val g = Loaders.fromList(spark,
        Seq(InputEdge(0, 1 + shift, Seq(1), addReverse = false),
          InputEdge(0, 2, Seq(1), addReverse = false),
          InputEdge(2, 3, Seq(1), addReverse = false)), ranges)
      GraphAnalytics.personalizedPageRank(g, source = 0L, numIter = 2).collect()
      GraphAnalytics.hits(g, numIter = 2).collect()
      GraphAnalytics.labelPropagation(g, numIter = 2).collect()
      assert(cacheEntryCount() === base,
        s"graph $shift left persisted layouts registered in the cache manager")
    }
  }

  test("hits matches a hand-rolled L1-normalized mutual recursion") {
    // star + chain: 0→1, 0→2, 2→3 — 0 is a pure hub (no in-edges),
    // 1/3 are pure authorities (no out-edges), 2 is both
    val ranges = Seq(RangeDef(0, 100, 0, Seq(1)))
    val g = Loaders.fromList(spark,
      Seq(InputEdge(0, 1, Seq(1), addReverse = false),
        InputEdge(0, 2, Seq(1), addReverse = false),
        InputEdge(2, 3, Seq(1), addReverse = false)), ranges)
    val edges = Seq(0L -> 1L, 0L -> 2L, 2L -> 3L)
    val verts = Seq(0L, 1L, 2L, 3L)
    val iters = 3
    var hub = verts.map(_ -> 1.0).toMap
    var auth = verts.map(_ -> 0.0).toMap
    for (_ <- 1 to iters) {
      val ra = edges.groupBy(_._2).view.mapValues(_.map(e => hub(e._1)).sum).toMap
      val ta = ra.values.sum
      auth = verts.map(v => v -> ra.getOrElse(v, 0.0) / ta).toMap
      val rh = edges.groupBy(_._1).view.mapValues(_.map(e => auth(e._2)).sum).toMap
      val th = rh.values.sum
      hub = verts.map(v => v -> rh.getOrElse(v, 0.0) / th).toMap
    }
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val got = GraphAnalytics.hits(g, iters).collect()
      .map(x => x.getLong(0) -> (r6(x.getDouble(1)), r6(x.getDouble(2)))).toMap
    assert(got === verts.map(v => v -> (r6(auth(v)), r6(hub(v)))).toMap)
    // role semantics: 0 is the dominant hub and has zero authority;
    // 1/3 have zero hub score; each vector sums to 1 (L1)
    assert(got(0L)._1 === 0.0 && got(0L)._2 > got(2L)._2)
    assert(got(1L)._2 === 0.0 && got(3L)._2 === 0.0)
    // sums of 6-dp-rounded entries: tolerance is rounding granularity × |V|
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 4e-6)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 4e-6)
  }

  test("labelPropagation matches a hand-rolled synchronous plurality vote") {
    // two triangles bridged at 3-5: labels must converge to one community
    // per triangle, with every round's plurality/min-label tie-break
    // reproduced exactly by the reference simulation
    val ranges = Seq(RangeDef(0, 100, 0, Seq(1)))
    val rawEdges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (5L, 6L), (6L, 7L), (5L, 7L), (3L, 5L))
    val g = Loaders.fromList(spark,
      rawEdges.map { case (a, b) => InputEdge(a, b, Seq(1), addReverse = false) }, ranges)
    val und = (rawEdges ++ rawEdges.map(_.swap)).distinct
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def simulate(iters: Int): Map[Long, Long] = {
      var l = nbrs.keys.map(v => v -> v).toMap
      for (_ <- 1 to iters) {
        l = l.map { case (v, cur) =>
          val counts = nbrs(v).groupBy(l).view.mapValues(_.size).toMap
          if (counts.isEmpty) v -> cur
          else v -> counts.toSeq.minBy { case (lbl, c) => (-c, lbl) }._1
        }
      }
      l
    }
    for (iters <- Seq(1, 2, 4)) {
      val got = GraphAnalytics.labelPropagation(g, numIter = iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === simulate(iters), s"at iters=$iters")
    }
    // converged communities = one label per triangle (bridge endpoints
    // stay with their own triangle: each has 2 in-triangle neighbors
    // vs 1 across the bridge)
    val fin = GraphAnalytics.labelPropagation(g, numIter = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(fin(1L), fin(2L), fin(3L)).size === 1)
    assert(Set(fin(5L), fin(6L), fin(7L)).size === 1)
    assert(fin(1L) !== fin(5L))
  }

  test("SIW/QW workloads: incremental ≡ bulk; FN/FA/FS shapes on the mail graph") {
    val path = MailGraph.generate("/tmp/graft_mail_test.txt", edges = 10000, nodes = 1000)
    val bulk = MailGraph.miw(spark, path)
    // SIW: 7 append batches reproduce the bulk row multiset exactly
    val inc = MailGraph.siw(spark, path, chunks = 7)
    assert(inc.edges.count() === 10000)
    assert(inc.edges.groupBy("src", "dst").count()
      .except(bulk.edges.groupBy("src", "dst").count()).isEmpty)
    // FN: per-node neighbour counts == plain groupBy over the edge list
    val fn = MailGraph.qwfn(bulk).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fwd = bulk.edges.groupBy("src").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fn === fwd)
    // FA: distinct edges with EMPLOYEE labels both sides
    val fa = MailGraph.qwfa(bulk)
    assert(fa.count() === bulk.edges.select("src", "dst").distinct().count())
    assert(fa.filter(col("src_label") =!= MailGraph.EMPLOYEE ||
      col("dst_label") =!= MailGraph.EMPLOYEE).isEmpty)
    // FS: dist 0 at the anchor, and every 1-hop neighbour at dist 1
    val fs = MailGraph.qwfs(bulk).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fs(128L) === 0L)
    val oneHop = bulk.edges.filter(col("src") === 128).select("dst")
      .collect().map(_.getLong(0)).filter(_ != 128L)
    assert(oneHop.nonEmpty && oneHop.forall(d => fs(d) === 1L))
  }

  test("ivfIndexStream: streamed vectors are probe-visible; full-probe stays exact; replay is harmless") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_stream").toString
    val dir = s"$base/index"; val in = s"$base/in"; val ckpt = s"$base/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(in))
    val seed = emb.filter(col("vec_id") % 2 === 0)
    val late = emb.filter(col("vec_id") % 2 === 1)
    graft.functions.Similarity.saveIvfIndex(seed, dir, nCentroids = 8)
    // stream the other half in two file-source micro-batches
    late.filter(col("vec_id") < 250).write.parquet(s"$in/b0")
    val src = spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", "64")
      .parquet(s"$in/*")
    val q = graft.functions.Similarity.ivfIndexStream(src, dir, ckpt)
    try {
      q.processAllAvailable()
      late.filter(col("vec_id") >= 250).write.parquet(s"$in/b1")
      q.processAllAvailable()
    } finally q.stop()
    assert(graft.util.MetaFiles.readLong(spark, s"$dir/_streamed") === Some(1L))
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val qs = emb.filter(col("vec_id") < 10)
    // full probe through the grown index ≡ brute force over the UNION
    // corpus — streamed rows are first-class index citizens
    assert(triples(graft.functions.Similarity.ivfTopKIndexed(qs, dir, k = 5, nProbe = 8))
      === triples(graft.functions.Similarity.bruteForceTopK(qs, emb, k = 5)))
    // a replayed batch id is skipped outright (marker), so the corpus
    // does not grow
    val before = spark.read.parquet(s"$dir/corpus").count()
    graft.functions.Similarity.appendToIvfIndex(
      late.filter(col("vec_id") >= 250), dir, batchId = 1L, "vec_id", "embedding")
    assert(spark.read.parquet(s"$dir/corpus").count() === before)
    // a crash-style duplicate (same rows, NEW batch id — marker never
    // written) grows the corpus but not the answer: max-cosine collapse
    // keeps query semantics exactly-once
    graft.functions.Similarity.appendToIvfIndex(
      late.filter(col("vec_id") >= 250), dir, batchId = 99L, "vec_id", "embedding")
    assert(spark.read.parquet(s"$dir/corpus").count() > before)
    assert(triples(graft.functions.Similarity.ivfTopKIndexed(qs, dir, k = 5, nProbe = 8))
      === triples(graft.functions.Similarity.bruteForceTopK(qs, emb, k = 5)))
    // dimension mismatch fails fast instead of silently zip-truncating
    val wrong = Seq((90001L, Array.fill(3)(0.5f))).toDF("vec_id", "embedding")
    intercept[IllegalStateException] {
      graft.functions.Similarity.appendToIvfIndex(wrong, dir, batchId = 100L, "vec_id", "embedding")
    }
  }

  test("MIW/CW: deterministic mail graph, ingest count and 1-hop shape") {
    val path = MailGraph.generate("/tmp/graft_mail_test.txt", edges = 10000, nodes = 1000)
    val g = MailGraph.miw(spark, path)
    assert(g.edges.count() === 10000)
    val cw = MailGraph.cw(g)
    val n = cw.count()
    assert(n > 0 && n < 100) // ~10 out-edges per node at 10k/1k
    // determinism: regenerating produces the same file
    val path2 = MailGraph.generate("/tmp/graft_mail_test2.txt", edges = 10000, nodes = 1000)
    assert(java.nio.file.Files.mismatch(
      java.nio.file.Path.of(path), java.nio.file.Path.of(path2)) === -1L)
  }
}
