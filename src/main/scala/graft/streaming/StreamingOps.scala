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

  /** Tumbling 1-hour windowed aggregation over `events` executed as a
    * stream (file source → incremental agg → memory sink, AvailableNow).
    * Complete output mode so the memory table equals the batch answer. */
  def eventsHourlyStreaming(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // nanos-as-long workaround, same as the batch reader (Relational.events)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(path).schema
    val name = s"graft_events_hourly_${runId.incrementAndGet()}"
    // the file stream source requires a DIRECTORY: stream the parent dir
    // with a glob filter selecting just the events file
    val q = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(unix_timestamp(date_trunc("hour", col("ts")))
        .as("hour_epoch_s"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name).orderBy("hour_epoch_s", "event_type")
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

  /** Streaming ingestion into a collection — the foreachBatch twin of the
    * reference's append+checkpoint insert loop (db/db.go:91-97). Each
    * micro-batch runs the full insert path (embed → id-assign → append →
    * sidecar); the checkpoint dir gives exactly-once over source files. */
  def ingest(coll: Collection, source: DataFrame,
      checkpointDir: String): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => coll.insertDF(batch) }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  val oracle: Map[String, String] = Map(
    // identical to the batch events_hourly oracle — that IS the check:
    // incremental execution must converge to the batch answer.
    "events_hourly_stream" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch_s,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_hourly_stream" -> (eventsHourlyStreaming _)
  )
}
