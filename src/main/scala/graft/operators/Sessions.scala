package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization — split each user's event stream into sessions at
  * 30-minute inactivity gaps. The canonical stateful operator over the
  * `events` table, in its batch form: one shuffle on `user_id`, a lag +
  * running-sum window to assign session ordinals, then the per-session
  * rollup. The streaming twin
  * ([[graft.streaming.StreamingOps.sessionizeStateful]]) keeps one open
  * session per user in `flatMapGroupsWithState` state and must produce
  * exactly this output once the watermark closes every session
  * (asserted in StreamingSpec).
  *
  * Timestamps are compared and emitted as epoch MICROSECOND longs:
  * exact integer math in both engines, no tz/precision ambiguity.
  */
object Sessions {

  /** Session gap: 30 minutes, in microseconds. */
  val GapUs: Long = 30L * 60 * 1000000

  /** Core plan over any `(user_id: long, us: long, event_id: long)`
    * frame — shared by the registered query and the streaming spec. */
  def sessionizeDF(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val prev = lag(col("us"), 1).over(w)
    val isNew = when(prev.isNull || col("us") - prev > GapUs, 1)
      .otherwise(0)
    ev.withColumn("ns", isNew)
      .withColumn("sid", sum(col("ns"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"))
      .orderBy("user_id", "sid")
  }

  def sessionize(s: SparkSession, dir: String): DataFrame =
    sessionizeDF(Relational.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id")))

  /** Thread assembly — the step that turns sessionized event streams
    * into TRAINING DOCUMENTS: each session's event types re-serialized
    * in exact (ts, event_id) order as one text row, plus size and span.
    * This is the behavioral-corpus shape (user action streams → LLM
    * prompts); at scale it is the same single user_id shuffle as
    * [[sessionize]] — the document is assembled inside the aggregate by
    * sorting the per-session (us, event_id, type) structs, never a
    * second window pass. */
  def assembleThreads(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val prev = lag(col("us"), 1).over(w)
    val isNew = when(prev.isNull || col("us") - prev > GapUs, 1)
      .otherwise(0)
    Relational.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .withColumn("sid", sum(isNew)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("span_us"),
        array_join(transform(
          array_sort(collect_list(struct(
            col("us"), col("event_id"), col("event_type")))),
          x => x("event_type")), " ").as("doc"))
      .orderBy("user_id", "sid")
  }

  /** Interval COVERAGE — concurrent-session counts per 6-hour window,
    * the ops/capacity view of sessionized data ("how many sessions were
    * active when"). The interval×window overlap join is computed
    * WITHOUT a quadratic interval join: each session explodes to the
    * windows its [start, end] span covers (fan-out bounded by session
    * length ÷ window width — sessions are gap-bounded, so small), then
    * one grouped count per window. The same span-explode blocking that
    * the range/geo joins use, applied to interval coverage. */
  def intervalCoverage(s: SparkSession, dir: String): DataFrame = {
    val W = 6L * 3600 * 1000000 // 6 hours in µs
    sessionize(s, dir)
      .select(explode(sequence(
        expr(s"start_us DIV $W"), expr(s"end_us DIV $W"))).as("b"))
      .groupBy("b")
      .agg(count(lit(1)).as("n_active"))
      .select((col("b") * W).as("window_start_us"), col("n_active"))
      .orderBy("window_start_us")
  }

  /** SFT-style behavioral-corpus build — the composite a fine-tuning
    * data pipeline runs over event streams: [[assembleThreads]]'
    * session documents, quality-gated (≥3 events — singleton sessions
    * carry no sequence signal), then split train/val 90/10 by a salted
    * hash of the (user, session) key — the split is a property of the
    * SESSION (stable under re-runs and corpus growth, same device as
    * split_corpus, and a user's sessions spread across both splits
    * while no session straddles them). One user_id shuffle end to end. */
  def pipelineSft(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.md5Hash60
    assembleThreads(s, dir)
      .filter(col("n_events") >= 3)
      .withColumn("split",
        when(pmod(md5Hash60(concat(lit("sft:"),
          col("user_id").cast("string"), lit(":"),
          col("sid").cast("string"))), lit(100)) < 90, "train")
          .otherwise("val"))
      .select("user_id", "sid", "split", "n_events", "doc")
      .orderBy("user_id", "sid")
  }

  /** The same sessions through Spark's BUILT-IN session_window operator
    * (gap-merging group window) — one groupBy, no lag/running-sum
    * windows. Sessions agree with the lag formulation except for events
    * exactly one gap apart (lag's `> gap` keeps them together,
    * session_window's `< end` splits) — absent from this data and from
    * any µs-resolution stream in practice; the shared oracle is the
    * check. Output drops the ordinal (session_window has none) and keys
    * sessions by start time instead. */
  def sessionizeNative(s: SparkSession, dir: String): DataFrame =
    Relational.events(s, dir)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")

  val oracle: Map[String, String] = Map(
    "sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
         |l AS (
         |  SELECT user_id, us, event_id,
         |    CASE WHEN lag(us) OVER w IS NULL
         |         OR us - lag(us) OVER w > $GapUs THEN 1 ELSE 0 END AS ns
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |x AS (
         |  SELECT user_id, us,
         |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
         |  FROM l)
         |SELECT user_id, sid, count(*) AS n_events,
         |  min(us) AS start_us, max(us) AS end_us
         |FROM x GROUP BY 1, 2 ORDER BY user_id, sid""".stripMargin,
    "assemble_threads" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type
         |  FROM events),
         |l AS (
         |  SELECT user_id, us, event_id, event_type,
         |    CASE WHEN lag(us) OVER w IS NULL
         |         OR us - lag(us) OVER w > $GapUs THEN 1 ELSE 0 END AS ns
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |x AS (
         |  SELECT user_id, us, event_id, event_type,
         |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
         |  FROM l)
         |SELECT user_id, sid, count(*) AS n_events,
         |  max(us) - min(us) AS span_us,
         |  string_agg(event_type, ' ' ORDER BY us, event_id) AS doc
         |FROM x GROUP BY 1, 2 ORDER BY user_id, sid""".stripMargin,
    "interval_coverage" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
         |l AS (
         |  SELECT user_id, us, event_id,
         |    CASE WHEN lag(us) OVER w IS NULL
         |         OR us - lag(us) OVER w > $GapUs THEN 1 ELSE 0 END AS ns
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |x AS (
         |  SELECT user_id, us,
         |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
         |  FROM l),
         |sess AS (
         |  SELECT min(us) AS start_us, max(us) AS end_us
         |  FROM x GROUP BY user_id, sid),
         |cov AS (
         |  SELECT unnest(generate_series(start_us // 21600000000,
         |    end_us // 21600000000)) AS b FROM sess)
         |SELECT b * 21600000000 AS window_start_us,
         |  count(*) AS n_active
         |FROM cov GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipeline_sft" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type
         |  FROM events),
         |l AS (
         |  SELECT user_id, us, event_id, event_type,
         |    CASE WHEN lag(us) OVER w IS NULL
         |         OR us - lag(us) OVER w > $GapUs THEN 1 ELSE 0 END AS ns
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |x AS (
         |  SELECT user_id, us, event_id, event_type,
         |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
         |  FROM l),
         |t AS (
         |  SELECT user_id, sid, count(*) AS n_events,
         |    string_agg(event_type, ' ' ORDER BY us, event_id) AS doc
         |  FROM x GROUP BY 1, 2)
         |SELECT user_id, sid,
         |  CASE WHEN ('0x' || substr(md5('sft:' || user_id || ':' || sid),
         |      1, 15))::BIGINT % 100 < 90
         |    THEN 'train' ELSE 'val' END AS split,
         |  n_events, doc
         |FROM t WHERE n_events >= 3
         |ORDER BY user_id, sid""".stripMargin,
    "sessionize_native" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
         |l AS (
         |  SELECT user_id, us, event_id,
         |    CASE WHEN lag(us) OVER w IS NULL
         |         OR us - lag(us) OVER w > $GapUs THEN 1 ELSE 0 END AS ns
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |x AS (
         |  SELECT user_id, us,
         |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
         |  FROM l)
         |SELECT user_id, min(us) AS start_us, max(us) AS end_us,
         |  count(*) AS n_events
         |FROM x GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sessionize" -> (sessionize _),
    "sessionize_native" -> (sessionizeNative _),
    "assemble_threads" -> (assembleThreads _),
    "interval_coverage" -> (intervalCoverage _),
    "pipeline_sft" -> (pipelineSft _)
  )
}
