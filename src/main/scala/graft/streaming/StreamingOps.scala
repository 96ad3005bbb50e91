package graft.streaming

import graft.api.Collection
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming twins of the engine's batch surface.
  *
  * The reference's ingest is streaming-shaped — append-only inserts with
  * monotone ids and periodic checkpoints (/root/reference/db/db.go:91-97)
  * — which maps onto `foreachBatch` + checkpointing ([[ingest]]). The
  * windowed aggregation twin ([[eventsHourlyStreaming]]) runs the SAME
  * logical plan as `Relational.eventsHourly`, incrementally.
  *
  * Scale: streaming aggregation state is partitioned by group key across
  * executors (RocksDB/HDFS state store on a real cluster); the watermark
  * bounds state so late data older than the horizon is dropped instead of
  * accumulating. `Trigger.AvailableNow` gives exactly-once batch-parity
  * semantics over existing files — which is what makes the operator
  * oracle-checkable.
  */
object StreamingOps {

  private val runId = new java.util.concurrent.atomic.AtomicLong()

  /** Run `f` with stateful-shuffle parallelism pinned to `n`.
    *
    * Stateful streaming parallelism is a first-class knob, not ambient
    * config: every shuffle partition owns state-store instances (a
    * stream-stream join holds FOUR per partition) whose init/commit cost
    * is paid per micro-batch regardless of data volume — measured here,
    * 32 partitions ran the attribution join 2.3x slower than 8 on 100k
    * events. Real deployments size it to key cardinality and it freezes
    * into the checkpoint at first start; these single-process gates size
    * for the test corpus, a cluster raises it. */
  private def withStatePartitions[T](s: SparkSession, n: Int)(f: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Tumbling 1-hour windowed aggregation over `events` executed as a
    * stream (file source → incremental agg → memory sink, AvailableNow).
    * Complete output mode so the memory table equals the batch answer. */
  def eventsHourlyStreaming(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // nanos-as-long workaround, same as the batch reader (Relational.events)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(path).schema
    val name = s"graft_events_hourly_${runId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      // the file stream source requires a DIRECTORY: stream the parent dir
      // with a glob filter selecting just the events file
      val q = graft.operators.Relational.normalizeEventTs(
        s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir))
        .groupBy(unix_timestamp(date_trunc("hour", col("ts")))
          .as("hour_epoch_s"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("hour_epoch_s", "event_type")
  }

  /** [[graft.operators.Mining.eventsOhlc]] built INCREMENTALLY — OHLC
    * candles maintained live over the stream: open/close are
    * min_by/max_by on the packed (in-hour offset ⊕ event_id) key, and
    * argmin-of-argmins merges across micro-batches exactly like
    * min/sum do, so the complete-mode table after AvailableNow equals
    * the one-pass batch bars bit-for-bit (the shared oracle proves
    * it). State is O(types × hours), not O(events). */
  def streamOhlc(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(path).schema
    val name = s"graft_stream_ohlc_${runId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = graft.operators.Relational.normalizeEventTs(
        s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir))
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          col("event_id"),
          round(col("value") * 100).cast("long").as("vq"))
        .withColumn("h", expr("us DIV 3600000000"))
        // same loud pack bound as the batch twin — an oversized id
        // would bleed into the offset bits and silently corrupt
        // open/close
        .withColumn("k",
          (col("us") - col("h") * 3600000000L) * 4194304L +
            when(col("event_id") < 4194304L, col("event_id"))
              .otherwise(raise_error(
                lit("stream_ohlc: event_id >= 2^22"))))
        .groupBy("event_type", "h")
        .agg(min_by(col("vq"), col("k")).as("open"),
          max(col("vq")).as("high"), min(col("vq")).as("low"),
          max_by(col("vq"), col("k")).as("close"),
          count(lit(1)).as("volume"), sum(col("vq")).as("turnover"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("event_type", "h")
  }

  /** The native KMV aggregate ([[graft.expr.KmvDistinctAgg]]) running
    * INSIDE Structured Streaming — a custom TypedImperativeAggregate's
    * serialize/merge path exercised by the streaming state store
    * itself: micro-batch partials merge into state exactly like
    * map-side partials do, so the complete-mode estimates equal the
    * batch sketch's (shared oracle, third formulation of the same
    * truth). State is O(k) longs per group — a live cardinality
    * monitor over an unbounded stream. */
  def streamKmv(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.md5Hash60
    graft.sql.GraftFunctions.register(s)
    val path = s"$dir/events.parquet"
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(path).schema
    val name = s"graft_stream_kmv_${runId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .select(col("event_type"),
          md5Hash60(concat(lit("kmv:"), col("user_id").cast("string")))
            .as("h"))
        .groupBy("event_type")
        .agg(expr("graft_kmv(h, 64)").as("est_distinct"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("event_type")
  }

  /** The [[graft.operators.Relational.quantileSketch]] histogram built
    * INCREMENTALLY — the merge-by-addition contract running live: each
    * micro-batch's partial bin counts merge into streaming state by +,
    * so the complete-mode table after AvailableNow equals the one-pass
    * batch histogram exactly, and the quantile edges read off the
    * ≤50-row result identically. State is O(bins), not O(events) — a
    * quantile monitor over an unbounded stream holds 50 longs. */
  def streamSketch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val path = s"$dir/events.parquet"
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(path).schema
    val name = s"graft_stream_sketch_${runId.incrementAndGet()}"
    val binW = 1000L // $10 bins over value cents
    withStatePartitions(s, 8) {
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .select(expr(s"CAST(round(value * 100) AS BIGINT) DIV $binW")
          .as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("c"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val h = s.table(name)
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(h.agg(sum(col("c")).as("N")))
    def edge(qMicro: Long, nm: String) =
      min(when(col("cum") * lit(1000000L) >= lit(qMicro) * col("N"),
        (col("bin") + 1) * binW)).as(nm)
    cum.agg(edge(500000L, "p50_ub"), edge(950000L, "p95_ub"),
      max(col("N")).as("n"))
  }

  /** Watermarked variant for unbounded sources (used by StreamingSpec via
    * MemoryStream): state for windows older than the 2h horizon is
    * finalized and dropped — late data beyond it is discarded. */
  def eventsHourlyWatermarked(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("value_cents"))

  /** One open session per user held in state. */
  final case class OpenSession(sid: Long, startUs: Long, endUs: Long,
      n: Long)

  /** Typed event row — keeps the watermarked `ts` attribute alive through
    * groupByKey (a .map/.select that drops it would detach the watermark
    * and EventTimeTimeout could not resolve). */
  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp,
      us: Long, event_id: Long)

  /** A closed session — matches the batch `Sessions.sessionizeDF` row
    * shape exactly. */
  final case class ClosedSession(user_id: Long, sid: Long, n_events: Long,
      start_us: Long, end_us: Long)

  /** Stateful streaming sessionization — the flatMapGroupsWithState twin
    * of [[graft.operators.Sessions.sessionizeDF]]. Holds ONE open session
    * per user (bounded state: O(users), not O(events)); emits a session
    * when a new event arrives past the 30-minute gap, and closes the
    * trailing session via event-time timeout once the watermark passes
    * gap-after-last-event. Late events inside the watermark extend the
    * open session at EITHER end (including pulling start_us backward —
    * batch parity); an in-window event more than a gap before the open
    * session closes immediately as its own past session. Already-emitted
    * sessions are never retracted (append mode), so ordinals emitted
    * before such an outlier arrived keep their numbering — the inherent
    * append-stream approximation. Events later than the watermark are
    * dropped by the runtime.
    *
    * Input: a streaming frame with (ts TIMESTAMP watermarkable, user_id
    * LONG, event_id LONG). Output: append-mode closed sessions.
    */
  def sessionizeStateful(events: DataFrame): org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = graft.operators.Sessions.GapUs
    events.withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[SessEvent],
            state: GroupState[OpenSession]) =>
          if (!state.hasTimedOut) {
            val evs = it.map(_.us).toArray.sorted
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            for (us <- evs) {
              cur match {
                // within-gap of the session INTERVAL: extend both ends —
                // a late-but-inside-watermark event earlier than the
                // current start must pull start_us back (batch parity)
                case Some(s) if us >= s.startUs - gapUs &&
                    us <= s.endUs + gapUs =>
                  cur = Some(s.copy(startUs = math.min(s.startUs, us),
                    endUs = math.max(s.endUs, us), n = s.n + 1))
                case Some(s) if us > s.endUs =>
                  closed += ClosedSession(user, s.sid, s.n, s.startUs,
                    s.endUs)
                  cur = Some(OpenSession(s.sid + 1, us, us, 1))
                case Some(s) =>
                  // us < startUs - gap is unreachable while the
                  // watermark delay equals the gap: the runtime drops
                  // rows below the watermark, and watermark >=
                  // maxSeenTs - gap >= startUs - gap (same-batch
                  // earlier events sort first, so they hit the merge
                  // branch before the session exists). Fail loudly if
                  // the delay/gap relationship is ever changed without
                  // revisiting this merge.
                  throw new IllegalStateException(
                    s"event $us predates session ${s.startUs} by more " +
                      "than the gap — watermark delay must equal the gap")
                case None =>
                  cur = Some(OpenSession(1, us, us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close once the watermark passes end-of-gap
              state.setTimeoutTimestamp(s.endUs / 1000 + gapUs / 1000)
            }
            closed.iterator
          } else {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, s.sid, s.n, s.startUs, s.endUs))
          }
      }
  }

  /** One open session per user for the transformWithState twin —
    * carries the registered event-time timer so a superseded timer can
    * be DELETED (tws timers accumulate; GroupState's
    * setTimeoutTimestamp used to overwrite). */
  final case class TwsSession(sid: Long, startUs: Long, endUs: Long,
      n: Long, timerMs: Long)

  /** Spark 4's arbitrary-state API (`transformWithState` +
    * StatefulProcessor over the RocksDB store) running the EXACT
    * session semantics of [[sessionizeStateful]] — same merge rules,
    * same event-time close. The API differences this twin pins down:
    * explicit timer lifecycle (register/delete, not overwrite), state
    * via typed ValueState handles, and expiry callbacks through
    * handleExpiredTimer with a stale-timer guard. Still O(users)
    * state. */
  class SessionProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, SessEvent, ClosedSession] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
      TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var state: ValueState[TwsSession] = _
    private val gapUs = graft.operators.Sessions.GapUs

    override def init(outputMode: OutputMode,
        timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TwsSession]("sess",
        org.apache.spark.sql.Encoders.product[TwsSession], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[SessEvent],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val evs = rows.map(_.us).toArray.sorted
      val prevTimer = if (state.exists) state.get.timerMs else 0L
      var cur: Option[TwsSession] =
        if (state.exists) Some(state.get) else None
      val closed =
        scala.collection.mutable.ArrayBuffer[ClosedSession]()
      for (us <- evs) {
        cur match {
          case Some(s) if us >= s.startUs - gapUs &&
              us <= s.endUs + gapUs =>
            cur = Some(s.copy(startUs = math.min(s.startUs, us),
              endUs = math.max(s.endUs, us), n = s.n + 1))
          case Some(s) if us > s.endUs =>
            closed += ClosedSession(user, s.sid, s.n, s.startUs, s.endUs)
            cur = Some(TwsSession(s.sid + 1, us, us, 1, 0L))
          case Some(s) =>
            throw new IllegalStateException(
              s"event $us predates session ${s.startUs} by more than " +
                "the gap — watermark delay must equal the gap")
          case None => cur = Some(TwsSession(1, us, us, 1, 0L))
        }
      }
      cur.foreach { s =>
        val t = s.endUs / 1000 + gapUs / 1000
        if (t != prevTimer) {
          if (prevTimer > 0) getHandle.deleteTimer(prevTimer)
          getHandle.registerTimer(t)
        }
        state.update(s.copy(timerMs = t))
      }
      closed.iterator
    }

    override def handleExpiredTimer(user: Long,
        timerValues: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClosedSession] =
      // stale-timer guard: only the timer the CURRENT state registered
      // may close it (superseded timers were deleted, but the guard
      // keeps the contract explicit)
      if (state.exists && state.get.timerMs == info.getExpiryTimeInMs) {
        val s = state.get
        state.clear()
        Iterator(ClosedSession(user, s.sid, s.n, s.startUs, s.endUs))
      } else Iterator.empty
  }

  /** [[sessionizeStateful]]'s logic through transformWithState. */
  def sessionizeTws(events: DataFrame)
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** [[streamSessionize]]'s gate twin on the NEW API — identical oracle
    * (watermark-closed batch sessions): two independent stateful
    * runtimes converging on one answer. transformWithState requires
    * the RocksDB state store; the conf flips for this query only and
    * is restored after. */
  def streamSessionizeTws(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(path).schema
    val name = s"graft_stream_sess_tws_${runId.incrementAndGet()}"
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = s.conf.getOption(provKey)
    s.conf.set(provKey, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try withStatePartitions(s, 8) {
      val q = sessionizeTws(
        graft.operators.Relational.normalizeEventTs(
          s.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(dir))
          .select(col("ts"), col("user_id"), col("event_id")))
        .toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      prevProv match {
        case Some(p) => s.conf.set(provKey, p)
        case None => s.conf.unset(provKey)
      }
    }
    s.table(name).orderBy("user_id", "sid")
  }

  /** Watermarked stream-stream inner join — purchase attribution: each
    * view joined to the same user's purchases within the following hour.
    * Both sides carry watermarks and the join condition is time-bounded,
    * so each side's buffered state is evicted once the other side's
    * watermark passes the bound — state is O(events in the horizon), not
    * O(stream). Inner-join rows emit as matches arrive (append mode
    * holds back nothing), so a single AvailableNow pass over the file
    * source must equal the batch join — which is exactly what the DuckDB
    * oracle checks. */
  def streamStreamJoin(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    def src = graft.operators.Relational.normalizeEventTs(
      s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val views = src.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"),
        col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val name = s"graft_ss_join_${runId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = views.join(purchases,
          col("v_user") === col("p_user") &&
            col("p_ts") > col("v_ts") &&
            col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
        .select(col("view_id"), col("purchase_id"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("view_id", "purchase_id")
  }

  /** Watermarked stream-stream LEFT OUTER join — the attribution join
    * with "views that never converted" included: a view with no
    * purchase in its hour emits a NULL-padded row, but only once the
    * join state provably cannot match anymore — i.e. when the global
    * watermark (min of both inputs' max-event-time, minus the 2h delay)
    * has passed the view's one-hour match window. Views inside the
    * final watermark horizon stay unreported (the streaming contract:
    * their matches could still arrive). The DuckDB oracle replicates
    * exactly that semantics: the batch inner join UNION the unmatched
    * views whose window closed under the final watermark, with the
    * engine's floored-millisecond event-time arithmetic. NULLs are
    * coalesced to -1 on both sides so null-ordering differences can't
    * leak into the row order. */
  def streamStreamLeftJoin(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    def src = graft.operators.Relational.normalizeEventTs(
      s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val views = src.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"),
        col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val name = s"graft_ss_left_${runId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = views.join(purchases,
          col("v_user") === col("p_user") &&
            col("p_ts") > col("v_ts") &&
            col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
          "leftOuter")
        .select(col("view_id"),
          coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("view_id", "purchase_id")
  }

  /** Watermarked stream-stream FULL OUTER join (r11) — completes the
    * streaming join matrix beside inner and left: unmatched rows from
    * BOTH sides emit NULL-padded once their state provably cannot
    * match anymore. A view evicts when the global watermark passes its
    * one-hour match window (the left-join rule); a purchase evicts
    * when the watermark passes its own event time — the condition
    * `p_ts > v_ts` means only EARLIER views can match it, so once no
    * view older than p_ts can arrive the purchase is provably
    * unmatched. Rows inside the final watermark horizon stay
    * unreported on both sides (their matches could still arrive). The
    * DuckDB twin replays exactly that: inner matches ∪ watermark-closed
    * unmatched views ∪ watermark-closed unmatched purchases, in the
    * engine's floored-millisecond arithmetic, NULLs coalesced to -1 so
    * null-ordering differences can't leak into row order. */
  def streamStreamFullJoin(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    def src = graft.operators.Relational.normalizeEventTs(
      s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val views = src.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"),
        col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val name = s"graft_ss_full_${runId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = views.join(purchases,
          col("v_user") === col("p_user") &&
            col("p_ts") > col("v_ts") &&
            col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
          "fullOuter")
        .select(coalesce(col("view_id"), lit(-1L)).as("view_id"),
          coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("view_id", "purchase_id")
  }

  /** Streaming exact dedup — the streaming twin of `dedup_exact`:
    * drop re-deliveries of the same content hash, with state bounded by
    * the watermark horizon (duplicates farther apart than the horizon
    * are not deduped — the documented, bounded-state contract;
    * unbounded exact streaming dedup would hold every hash forever). */
  def dedupExactStreaming(docs: DataFrame): DataFrame =
    docs
      .withColumn("h", md5(col("text")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("h")

  /** Streaming ingestion into a collection — the foreachBatch twin of the
    * reference's append+checkpoint insert loop (db/db.go:91-97). Each
    * micro-batch runs the full insert path (embed → id-assign → append →
    * sidecar). The checkpoint tracks processed source files, so normal
    * stop/restart never re-reads a file; like the reference's own
    * crash window (docs appended, index not yet checkpointed,
    * db/db.go:81-97), foreachBatch is at-LEAST-once across a crash that
    * lands between the sink append and the streaming commit — a replayed
    * batch re-appends. Production hardening is a batch-id column +
    * dedup-on-read or a transactional table sink. */
  def ingest(coll: Collection, source: DataFrame,
      checkpointDir: String): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => coll.insertDF(batch) }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** foreachBatch ingestion under the oracle gate: stream
    * documents.parquet into a persisted collection through the
    * checkpointed file source (the reference's append+checkpoint loop,
    * db/db.go:91-97; see [[ingest]] for the crash-replay caveat), then
    * aggregate the collection's metadata. Counts
    * per lang must equal the source table no matter how ingestion was
    * batched. Re-runs are no-ops: the checkpoint remembers processed
    * files, so the collection builds once and later runs only re-read;
    * a stale leftover (row count ≠ source) is dropped and re-ingested. */
  def streamIngest(s: SparkSession, dir: String): DataFrame = {
    import graft.api.KaerSession
    import graft.core.Schema
    val root = graft.core.Scratch.dir("ingest", dir)
    val k = new KaerSession(s, root, graft.embed.HashingEmbedder(64))
    val expected = s.read.parquet(s"$dir/documents.parquet").count()
    var coll = k.createCollection("docs")
    if (coll.rows != 0L && coll.rows != expected) {
      k.dropCollection("docs")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/ckpt"), true)
      coll = k.createCollection("docs")
    }
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    val src = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("text").as(Schema.DocCol),
        to_json(struct(col("lang"))).as(Schema.MetaCol))
    withStatePartitions(s, 8) {
      ingest(coll, src, s"$root/ckpt").awaitTermination()
    }
    coll.df
      .select(get_json_object(col(Schema.MetaCol), "$.lang").as("lang"))
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .orderBy("lang")
  }

  /** Streaming exact dedup under the gate: the distinct
    * (user_id, event_type) key set from a file stream via
    * `dropDuplicates` state. Only the KEY columns are emitted — which
    * physical row survives per key depends on arrival order, the key set
    * does not, and that is what makes a streaming dedup oracle-checkable.
    * (The watermarked, state-bounded variant is spec-verified in
    * StreamingSpec via dropDuplicatesWithinWatermark AND oracle-gated in
    * [[streamDedupBounded]]; this gate runs the unbounded-state form
    * over a finite source with AvailableNow.) */
  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(path).schema
    val name = s"graft_stream_dedup_${runId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
        .select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("user_id", "event_type")
  }

  /** Streaming text-cleaning pipeline under the gate: the corpus
    * operators (the C4-style quality predicate — token floor, digit
    * density, stopword check) run UNCHANGED inside a Structured
    * Streaming pass — per-row expressions are execution-mode-agnostic,
    * which is the point: the same cleaning plan serves the batch corpus
    * build and the incremental top-up of a live crawl. Final per-lang
    * census in complete mode ≡ the batch oracle. */
  def streamTextPipeline(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftRules.register(s) // qualityKeep stopword probe
    val path = s"$dir/documents.parquet"
    val schema = s.read.parquet(path).schema
    val name = s"graft_stream_textpipe_${runId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir)
        .filter(graft.operators.Pipeline.qualityKeep)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("lang")
  }

  /** Stream-STATIC enrichment join under the gate — the most common
    * streaming pattern in production: an unbounded event stream joined
    * to a bounded dimension (here user → nation via customer), then
    * rolled up per nation. Unlike stream-stream joins this is
    * STATELESS: no watermark, no join state — the static side is
    * re-planned each micro-batch and, being dim-sized, BROADCAST to
    * the stream side, so enrichment costs zero shuffle on the stream
    * no matter how long it runs. The per-nation census in complete
    * mode must equal the batch three-table join (the oracle). */
  def streamStaticJoin(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val dim = broadcast(
      s.read.parquet(s"$dir/customer.parquet")
        .join(s.read.parquet(s"$dir/nation.parquet"),
          col("c_nationkey") === col("n_nationkey"))
        .select((col("c_custkey") - 1).as("user_id"), col("n_name")))
    val name = s"graft_stream_static_${runId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
        .select(col("user_id"), col("event_type"))
        .join(dim, "user_id")
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_events"),
          // distinct aggregation is unsupported on streams — the
          // conditional count keeps the rollup deterministic instead
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("n_name")
  }

  /** Streaming anomaly flagging — the production deployment shape of
    * [[graft.operators.Analytics.anomalyEvents]]: reference statistics
    * are trained BATCH-side (per-type n/S1/S2 — the model), broadcast
    * into the stream, and each arriving event evaluates the exact
    * cross-multiplied z² test per micro-batch (stateless — no
    * watermark, no join state; the census aggregation is the only
    * stateful node). Complete-mode census must equal the batch
    * operator's, which is exactly what the shared oracle checks. */
  def streamAnomaly(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val stats = broadcast(
      graft.operators.Relational.events(s, dir)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("vq"))
        .groupBy("event_type").agg(
          count(lit(1)).as("n"), sum(col("vq")).as("s1"),
          sum(col("vq") * col("vq")).as("s2")))
    val name = s"graft_stream_anom_${runId.incrementAndGet()}"
    val dev = d(col("vq")) * d(col("n")) - d(col("s1"))
    val flag = dev * dev > d(lit(9L)) *
      (d(col("n")) * d(col("s2")) - d(col("s1")) * d(col("s1")))
    withStatePartitions(s, 8) {
      val q = graft.operators.Relational.normalizeEventTs(
          s.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(dir))
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("vq"))
        .join(stats, "event_type")
        .withColumn("is_anom", flag)
        .groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum(when(col("is_anom"), 1L).otherwise(0L)).as("n_anomalies"),
          max(when(col("is_anom"), col("vq"))).as("max_anom_vq"),
          sum(when(col("is_anom"), col("vq"))).as("sum_anom_vq"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("event_type")
  }

  /** The Count-Min sketch built INCREMENTALLY — the same
    * merge-by-addition contract [[streamSketch]] proved for the
    * histogram, now for frequencies: each micro-batch's partial cell
    * counts merge into streaming state by +, so the complete-mode cell
    * table after AvailableNow equals the one-pass batch sketch exactly
    * — and therefore so do the point estimates the gate computes from
    * it (shared oracle with the batch `sketch_cms`). State is O(4096
    * cells), not O(tokens): a frequency monitor over an unbounded
    * token stream holds 32 KB. */
  def streamCms(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{md5Hash60, tokens}
    import s.implicits._
    val D = 4
    val W = 1024L
    def buckets(t: org.apache.spark.sql.Column) =
      array((0 until D).map(i =>
        pmod(md5Hash60(concat(lit(s"cms$i:"), t)), lit(W))): _*)
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    val name = s"graft_stream_cms_${runId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .select(explode(tokens(col("text"))).as("t"))
        .select(posexplode(buckets(col("t"))).as(Seq("r", "b")))
        .groupBy("r", "b").agg(count(lit(1)).as("c"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val cells = s.table(name)
    val probes = Seq("join", "hash", "vector", "slow", "zzzmissing")
      .toDF("token")
    val est = probes
      .select(col("token"),
        posexplode(buckets(col("token"))).as(Seq("r", "b")))
      .join(cells, Seq("r", "b"), "left")
      .na.fill(0L, Seq("c"))
      .groupBy("token").agg(min(col("c")).as("cms_estimate"))
    val exact = s.read.parquet(s"$dir/documents.parquet")
      .select(explode(tokens(col("text"))).as("t"))
      .groupBy(col("t").as("token")).agg(count(lit(1)).as("exact"))
    est.join(exact, Seq("token"), "left")
      .na.fill(0L, Seq("exact"))
      .select(col("token"), col("exact"), col("cms_estimate"))
      .orderBy("token")
  }

  /** BOUNDED streaming dedup under the gate — the state-evicting
    * `dropDuplicatesWithinWatermark` form, not unbounded `dropDuplicates`
    * state. The stream is a planted re-delivery scenario: a 48-hour
    * slice of events is written twice (the copy's timestamps shifted
    * +10 minutes — a late duplicate delivery), and `maxFilesPerTrigger=1`
    * forces the copies into SEPARATE micro-batches, so the dedup state
    * must survive a real cross-batch watermark advance. The 50-hour
    * delay strictly exceeds slice-span/2 + shift, so every re-delivered
    * key is still within the horizon whatever order the two files
    * process in — which makes the answer deterministic and equal to
    * batch DISTINCT over the slice (the oracle). At 100 TB the same
    * query holds state only for the horizon, not the stream: state is
    * O(keys per 50 h), evicted by the watermark. */
  def streamDedupBounded(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Relational
    val root = graft.core.Scratch.dir("sdedup", dir)
    val ev = Relational.events(s, dir)
    val minTs = ev.agg(min(col("ts"))).head().getTimestamp(0) // 1 row
    val hi = new java.sql.Timestamp(minTs.getTime + 48L * 3600 * 1000)
    val slice = ev.filter(col("ts") < lit(hi))
      .select(col("event_id"), col("ts"))
    lazy val n = slice.count()
    if (!graft.core.Trust.parquetDir(s, s"$root/orig", n))
      slice.coalesce(1).write.mode("overwrite").parquet(s"$root/orig")
    if (!graft.core.Trust.parquetDir(s, s"$root/redeliver", n))
      slice.withColumn("ts", col("ts") + expr("INTERVAL 10 MINUTES"))
        .coalesce(1).write.mode("overwrite").parquet(s"$root/redeliver")
    val schema = s.read.parquet(s"$root/orig").schema
    val name = s"graft_stream_dedup_bounded_${runId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$root/*")
        .withWatermark("ts", "50 hours")
        .dropDuplicatesWithinWatermark("event_id")
        .select(col("event_id"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("event_id")
  }

  /** Streaming keyed-upsert SINK under the gate — the CDC pattern: a
    * stream of versioned updates folds into a keyed parquet store via
    * foreachBatch + [[graft.operators.Upsert]]. Three production
    * devices, all exercised:
    *  - per-batch COMPACTION (max_by version per key) so one upsert
    *    join runs per micro-batch however many updates a key got;
    *  - whenMatched=newerWins, so the result is independent of
    *    micro-batch ORDER and of at-least-once re-delivery —
    *    maxFilesPerTrigger=1 forces the two update files through
    *    separate batches to prove it;
    *  - tmp-dir + backup-swap on the target store (the Meta.Write
    *    tmp+rename discipline, dir-sized): a reader can observe a
    *    MISSING target for the instant between the two renames (dir
    *    rename is not atomic-exchange on hadoop filesystems) but never
    *    a partially-written one, and a crash mid-swap loses nothing —
    *    the previous store survives as the backup until the new target
    *    is fully in place.
    * Oracle: max-version row per key across all updates — the
    * arrival-order-free answer newerWins guarantees. */
  def streamUpsert(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Upsert
    val root = graft.core.Scratch.dir("supsert", dir)
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val u1 = docs.filter(col("doc_id") < 300)
      .withColumn("ver", lit(1L))
    val u2 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 400)
      .withColumn("ver", lit(2L))
      .withColumn("n_chars", col("n_chars") + 1000)
    lazy val (n1, n2) = (u1.count(), u2.count())
    if (!graft.core.Trust.parquetDir(s, s"$root/u1", n1))
      u1.coalesce(1).write.mode("overwrite").parquet(s"$root/u1")
    if (!graft.core.Trust.parquetDir(s, s"$root/u2", n2))
      u2.coalesce(1).write.mode("overwrite").parquet(s"$root/u2")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // fresh store + checkpoint per run: the gate is about the sink's
    // converged content, not checkpoint resumption (stream_ingest gates
    // that)
    for (p <- Seq("target", "target_tmp", "target_bak", "ckpt"))
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/$p"), true)
    val schema = s.read.parquet(s"$root/u1").schema
    val keyCols = Seq("doc_id")
    val dataCols = Seq("lang", "n_chars", "ver")
    withStatePartitions(s, 8) {
      val q = s.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$root/u*")
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val compacted = batch.groupBy(keyCols.map(col): _*)
            .agg(max_by(struct(dataCols.map(col): _*), col("ver"))
              .as("_r"))
            .select(keyCols.map(col) ++
              dataCols.map(f => col(s"_r.$f").as(f)): _*)
          val tgt = new org.apache.hadoop.fs.Path(s"$root/target")
          val merged =
            if (!fs.exists(tgt)) compacted
            else Upsert.upsert(batch.sparkSession.read.parquet(tgt.toString),
              compacted, keyCols,
              whenMatched = "newerWins", versionCol = Some("ver"))
          val tmp = new org.apache.hadoop.fs.Path(s"$root/target_tmp")
          merged.write.mode("overwrite").parquet(tmp.toString)
          // backup-swap: the old store is RENAMED aside (not deleted)
          // before the new one renames in, and only deleted once the
          // swap completed — a crash at any point leaves a complete
          // store on disk under either name
          val bak = new org.apache.hadoop.fs.Path(s"$root/target_bak")
          fs.delete(bak, true)
          if (fs.exists(tgt))
            require(fs.rename(tgt, bak), s"rename $tgt -> $bak failed")
          require(fs.rename(tmp, tgt), s"rename $tmp -> $tgt failed")
          fs.delete(bak, true)
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(s"$root/target").orderBy("doc_id")
  }

  /** Stateful streaming sessionization under the gate: one AvailableNow
    * pass of the events file through [[sessionizeStateful]]. Sessions
    * whose gap horizon the final watermark passed are closed by
    * event-time timeout (the runtime schedules the extra timer batch
    * after the data batch advances the watermark); each user's TRAILING
    * session near the end of stream-time stays open and unemitted —
    * inherent to append-mode streaming — so the oracle is the batch
    * sessionization restricted to sessions the watermark closed. The
    * closed prefix carries identical per-user ordinals to batch (a
    * user's sessions close strictly in order). State is O(users). */
  def streamSessionize(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(path).schema
    val name = s"graft_stream_sess_${runId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = sessionizeStateful(
        graft.operators.Relational.normalizeEventTs(
          s.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(dir))
          .select(col("ts"), col("user_id"), col("event_id")))
        .toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("user_id", "sid")
  }

  // ms mirrors of the session gap / watermark-delay pair (both 30 min)
  private val GapMs = graft.operators.Sessions.GapUs / 1000

  /** Watermark-closed batch sessions — shared by BOTH stateful
    * runtimes' gates (fmgws and transformWithState). */
  private def sessionizeClosedOracle: String =
      // batch sessionization (verbatim the `sessionize` oracle CTEs)
      // restricted to watermark-closed sessions: timeout fires when
      // end-of-gap (ms) < final watermark = max event ms - delay.
      // Watermark/timeout arithmetic is in FLOORED milliseconds, the
      // engine's event-time unit.
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
         |l AS (
         |  SELECT user_id, us, event_id,
         |    CASE WHEN lag(us) OVER w IS NULL
         |         OR us - lag(us) OVER w > ${graft.operators.Sessions.GapUs}
         |         THEN 1 ELSE 0 END AS ns
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |x AS (
         |  SELECT user_id, us,
         |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
         |  FROM l),
         |sess AS (
         |  SELECT user_id, sid, count(*) AS n_events,
         |    min(us) AS start_us, max(us) AS end_us
         |  FROM x GROUP BY 1, 2),
         |wm AS (SELECT CAST(floor(max(us) / 1000) AS BIGINT) - $GapMs
         |         AS wm_ms FROM e)
         |SELECT user_id, sid, n_events, start_us, end_us
         |FROM sess, wm
         |WHERE CAST(floor(end_us / 1000) AS BIGINT) + $GapMs < wm_ms
         |ORDER BY user_id, sid""".stripMargin

  val oracle: Map[String, String] = Map(
    // the streaming bars answer the SAME query as the batch gate
    "stream_ohlc" -> graft.operators.Mining.oracle("events_ohlc"),
    // third formulation of the KMV truth (window / aggregate / stream)
    "stream_kmv" -> graft.operators.Relational.oracle("sketch_distinct"),
    // identical to the batch anomaly oracle — incremental execution
    // must converge to the batch answer (the events_hourly precedent)
    "stream_anomaly" ->
      graft.operators.Analytics.oracle("anomaly_events"),
    // shared with the batch sketch — incremental ≡ one-pass
    "stream_cms" ->
      graft.operators.TextAnalysis.oracle("sketch_cms"),
    "stream_static_join" ->
      """SELECT n.n_name, count(*) AS n_events,
        |  CAST(sum(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchases
        |FROM events e
        |JOIN customer c ON c.c_custkey = e.user_id + 1
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_upsert" ->
      // max-version row per key across all updates — the arrival-order-
      // free converged store newerWins guarantees
      """WITH updates AS (
        |  SELECT doc_id, lang, n_chars, 1 AS ver FROM documents
        |  WHERE doc_id < 300
        |  UNION ALL
        |  SELECT doc_id, lang, n_chars + 1000 AS n_chars, 2 AS ver
        |  FROM documents WHERE doc_id >= 200 AND doc_id < 400)
        |SELECT doc_id, lang, n_chars, CAST(ver AS BIGINT) AS ver FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY ver DESC) AS rn FROM updates)
        |WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    // the tws twin shares the sessionize oracle verbatim — two
    // stateful runtimes (flatMapGroupsWithState/HDFS store,
    // transformWithState/RocksDB) must converge on one answer
    "stream_sessionize_tws" -> sessionizeClosedOracle,
    "stream_sessionize" -> sessionizeClosedOracle,
    "stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "stream_text_pipeline" ->
      s"""SELECT lang, count(*) AS n,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents
         |WHERE ${graft.operators.Pipeline.sqlKeep}
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "stream_dedup_bounded" ->
      """SELECT DISTINCT event_id FROM events
        |WHERE ts < (SELECT min(ts) + INTERVAL 48 HOUR FROM events)
        |ORDER BY event_id""".stripMargin,
    "stream_ingest" ->
      """SELECT lang, count(*) AS n FROM documents
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // identical to the batch events_hourly oracle — that IS the check:
    // incremental execution must converge to the batch answer.
    "stream_sketch" ->
      """WITH b AS (SELECT CAST(round(value * 100) AS BIGINT) // 1000
        |    AS bin FROM events),
        |h AS (SELECT bin, count(*) AS c FROM b GROUP BY 1),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS N FROM h),
        |cm AS (SELECT bin,
        |    CAST(sum(c) OVER (ORDER BY bin
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM h)
        |SELECT
        |  min(CASE WHEN cum * 1000000 >= 500000 * N
        |    THEN (bin + 1) * 1000 END) AS p50_ub,
        |  min(CASE WHEN cum * 1000000 >= 950000 * N
        |    THEN (bin + 1) * 1000 END) AS p95_ub,
        |  max(N) AS n
        |FROM cm, t""".stripMargin,
    "events_hourly_stream" ->
"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch_s,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "stream_stream_join" ->
      """SELECT v.event_id AS view_id, p.event_id AS purchase_id
        |FROM events v JOIN events p
        |  ON p.user_id = v.user_id
        |  AND v.event_type = 'view' AND p.event_type = 'purchase'
        |  AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
        |ORDER BY view_id, purchase_id""".stripMargin,
    "stream_stream_left" ->
      // inner matches ∪ unmatched views whose 1h window closed under
      // the FINAL global watermark = min(max view ms, max purchase ms)
      // − 2h delay; event-time arithmetic in floored milliseconds (the
      // engine's unit), nulls coalesced to -1
      """WITH v AS (SELECT event_id AS view_id, user_id,
        |    epoch_us(ts) AS vus,
        |    CAST(floor(epoch_us(ts) / 1000) AS BIGINT) AS vms FROM events
        |  WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id,
        |    epoch_us(ts) AS pus,
        |    CAST(floor(epoch_us(ts) / 1000) AS BIGINT) AS pms FROM events
        |  WHERE event_type = 'purchase'),
        |m AS (SELECT v.view_id, p.purchase_id
        |  FROM v JOIN p ON p.user_id = v.user_id
        |    AND p.pus > v.vus AND p.pus <= v.vus + 3600000000),
        |wm AS (SELECT least((SELECT max(vms) FROM v),
        |    (SELECT max(pms) FROM p)) - 7200000 AS wm_ms),
        |unmatched AS (
        |  SELECT v.view_id, CAST(-1 AS BIGINT) AS purchase_id
        |  FROM v, wm
        |  WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.view_id = v.view_id)
        |    AND v.vms + 3600000 < wm.wm_ms)
        |SELECT view_id, purchase_id FROM m
        |UNION ALL SELECT view_id, purchase_id FROM unmatched
        |ORDER BY view_id, purchase_id""".stripMargin,
    "stream_stream_full" ->
      // the left-join device extended to both sides: unmatched views
      // close when the watermark passes their 1h window; unmatched
      // purchases close when it passes their OWN event time (only
      // earlier views can match `p_ts > v_ts`)
      """WITH v AS (SELECT event_id AS view_id, user_id,
        |    epoch_us(ts) AS vus,
        |    CAST(floor(epoch_us(ts) / 1000) AS BIGINT) AS vms FROM events
        |  WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id,
        |    epoch_us(ts) AS pus,
        |    CAST(floor(epoch_us(ts) / 1000) AS BIGINT) AS pms FROM events
        |  WHERE event_type = 'purchase'),
        |m AS (SELECT v.view_id, p.purchase_id
        |  FROM v JOIN p ON p.user_id = v.user_id
        |    AND p.pus > v.vus AND p.pus <= v.vus + 3600000000),
        |wm AS (SELECT least((SELECT max(vms) FROM v),
        |    (SELECT max(pms) FROM p)) - 7200000 AS wm_ms),
        |unmatched_v AS (
        |  SELECT v.view_id, CAST(-1 AS BIGINT) AS purchase_id
        |  FROM v, wm
        |  WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.view_id = v.view_id)
        |    AND v.vms + 3600000 < wm.wm_ms),
        |unmatched_p AS (
        |  SELECT CAST(-1 AS BIGINT) AS view_id, p.purchase_id
        |  FROM p, wm
        |  WHERE NOT EXISTS (SELECT 1 FROM m
        |      WHERE m.purchase_id = p.purchase_id)
        |    AND p.pms < wm.wm_ms)
        |SELECT view_id, purchase_id FROM m
        |UNION ALL SELECT view_id, purchase_id FROM unmatched_v
        |UNION ALL SELECT view_id, purchase_id FROM unmatched_p
        |ORDER BY view_id, purchase_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_ohlc" -> (streamOhlc _),
    "stream_kmv" -> (streamKmv _),
    "events_hourly_stream" -> (eventsHourlyStreaming _),
    "stream_sketch" -> (streamSketch _),
    "stream_stream_join" -> (streamStreamJoin _),
    "stream_static_join" -> (streamStaticJoin _),
    "stream_ingest" -> (streamIngest _),
    "stream_dedup" -> (streamDedup _),
    "stream_text_pipeline" -> (streamTextPipeline _),
    "stream_dedup_bounded" -> (streamDedupBounded _),
    "stream_sessionize" -> (streamSessionize _),
    "stream_sessionize_tws" -> (streamSessionizeTws _),
    "stream_upsert" -> (streamUpsert _),
    "stream_stream_left" -> (streamStreamLeftJoin _),
    "stream_stream_full" -> (streamStreamFullJoin _),
    "stream_anomaly" -> (streamAnomaly _),
    "stream_cms" -> (streamCms _)
  )
}
