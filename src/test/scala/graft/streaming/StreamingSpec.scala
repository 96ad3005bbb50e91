package graft.streaming

import graft.SparkTestBase
import graft.api.{Data, KaerSession}
import graft.core.Schema
import graft.embed.HashingEmbedder
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming behaviors: watermarked windowed aggregation with
  * late-data handling, and exactly-once foreachBatch ingestion into a
  * collection (the reference's append+checkpoint loop, db/db.go:91-97). */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  /** Epoch micros of [[ts]] — for asserting session bounds. */
  private def us(h: Int, m: Int = 0): Long = ts(h, m).getTime * 1000L

  test("watermarked hourly aggregation finalizes windows; drops too-late data") {
    val in = MemoryStream[(Timestamp, String, Double)](spark)
    val agg = StreamingOps.eventsHourlyWatermarked(
      in.toDF().toDF("ts", "event_type", "value"))
    val q = agg.writeStream.format("memory")
      .queryName("wm_test").outputMode("append").start()
    try {
      // hour-1 data, then advance event time far past the 2h watermark
      in.addData((ts(1, 10), "click", 1.0), (ts(1, 20), "click", 2.5))
      q.processAllAvailable()
      in.addData((ts(6, 0), "view", 1.0))
      q.processAllAvailable()
      // hour-1 window is now final and emitted
      val done = spark.table("wm_test").collect()
      assert(done.length == 1)
      val r = done(0)
      assert(r.getAs[Timestamp]("hour") == ts(1))
      assert(r.getAs[Long]("n") == 2L)
      assert(r.getAs[Long]("value_cents") == 350L)
      // an event older than the watermark horizon is dropped silently
      in.addData((ts(0, 30), "late", 9.9))
      q.processAllAvailable()
      assert(spark.table("wm_test").count() == 1)
    } finally q.stop()
  }

  test("foreachBatch ingestion: exactly-once over files, ids stay dense") {
    val inDir = tmpDir("stream-in")
    val ckpt = tmpDir("stream-ckpt")
    val root = tmpDir("stream-coll")
    val k = new KaerSession(spark, root, HashingEmbedder(64))
    val coll = k.createCollection("s")

    def writeBatch(part: Int, docs: Seq[String]): Unit =
      docs.toDF(Schema.DocCol)
        .withColumn(Schema.MetaCol, lit(null).cast("string"))
        .coalesce(1).write.mode("append").parquet(inDir)

    writeBatch(0, Seq("one", "two"))
    val src = spark.readStream
      .schema(s"${Schema.DocCol} STRING, ${Schema.MetaCol} STRING")
      .parquet(inDir)
    StreamingOps.ingest(coll, src, ckpt).awaitTermination()
    assert(coll.count() == 2)

    // second run with the SAME checkpoint: only new files are processed
    writeBatch(1, Seq("three"))
    val src2 = spark.readStream
      .schema(s"${Schema.DocCol} STRING, ${Schema.MetaCol} STRING")
      .parquet(inDir)
    StreamingOps.ingest(coll, src2, ckpt).awaitTermination()
    assert(coll.count() == 3)
    val ids = coll.df.select(Schema.IdCol).collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(1L to 3L), ids.mkString(","))

    // queries over streamed-in data work like batch inserts
    assert(coll.query("one", 1, null).head().getAs[String](Schema.DocCol)
      == "one")
  }

  test("streaming dedup drops re-delivered content within the watermark") {
    val in = MemoryStream[(Timestamp, Long, String)](spark)
    val out = StreamingOps.dedupExactStreaming(
      in.toDF().toDF("ts", "doc_id", "text"))
    val q = out.writeStream.format("memory")
      .queryName("dedup_stream").outputMode("append").start()
    try {
      in.addData((ts(1, 0), 1L, "alpha"), (ts(1, 1), 2L, "beta"))
      q.processAllAvailable()
      // re-delivery of "alpha" (same content, new id) within the horizon
      in.addData((ts(1, 30), 3L, "alpha"), (ts(1, 31), 4L, "gamma"))
      q.processAllAvailable()
      val texts = spark.table("dedup_stream")
        .collect().map(_.getAs[String]("text")).sorted
      assert(texts.sameElements(Array("alpha", "beta", "gamma")),
        texts.mkString(","))
    } finally q.stop()
  }

  test("stateful sessionization equals the batch window plan") {
    val in = MemoryStream[(Timestamp, Long, Long)](spark)
    val out = StreamingOps.sessionizeStateful(
      in.toDF().toDF("ts", "user_id", "event_id"))
    val q = out.writeStream.format("memory")
      .queryName("sess_test").outputMode("append").start()
    try {
      // user 1: two sessions split by a 40-min gap; user 2: one session
      in.addData(
        (ts(1, 0), 1L, 1L), (ts(1, 10), 1L, 2L), (ts(1, 50), 1L, 3L),
        (ts(1, 5), 2L, 4L))
      q.processAllAvailable()
      // advance the watermark far past every session's gap horizon
      in.addData((ts(9, 0), 99L, 5L))
      q.processAllAvailable()
      val got = spark.table("sess_test")
        .filter(col("user_id").isin(1L, 2L))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val batch = graft.operators.Sessions.sessionizeDF(
        Seq((1L, ts(1, 0), 1L), (1L, ts(1, 10), 2L), (1L, ts(1, 50), 3L),
          (2L, ts(1, 5), 4L))
          .toDF("user_id", "tss", "event_id")
          .select(col("user_id"), unix_micros(col("tss")).as("us"),
            col("event_id")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got == batch, s"streaming=$got batch=$batch")
      assert(got.size == 3)
    } finally q.stop()
  }

  test("sessionization: a late in-watermark event pulls the session start back") {
    val in = MemoryStream[(Timestamp, Long, Long)](spark)
    val out = StreamingOps.sessionizeStateful(
      in.toDF().toDF("ts", "user_id", "event_id"))
    val q = out.writeStream.format("memory")
      .queryName("sess_late").outputMode("append").start()
    try {
      // watermark stays at 1:20-30m = 0:50 after batch 1
      in.addData((ts(1, 20), 7L, 1L))
      q.processAllAvailable()
      // late event at 1:00 — inside the watermark, 20min before start
      in.addData((ts(1, 0), 7L, 2L))
      q.processAllAvailable()
      in.addData((ts(9, 0), 99L, 3L)) // close everything
      q.processAllAvailable()
      val r = spark.table("sess_late").filter(col("user_id") === 7L)
        .collect().map(x => (x.getLong(2), x.getLong(3), x.getLong(4)))
      assert(r.length == 1, r.mkString(";"))
      val (n, start, end) = r.head
      assert(n == 2 && start == ts(1, 0).getTime * 1000 &&
        end == ts(1, 20).getTime * 1000, r.head.toString)
    } finally q.stop()
  }

  test("streaming hourly agg equals the batch plan on sf0.001") {
    val stream = StreamingOps.eventsHourlyStreaming(spark, sf0001).collect()
    val batch = graft.operators.Relational.eventsHourly(spark, sf0001).collect()
    assert(stream.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("stateful sessionization runs unchanged on the RocksDB state " +
      "store (the spill-to-disk backend a 100 TB cluster uses)") {
    // the provider is read at query START, so setting it per-test is
    // enough; default-provider coverage comes from every other test
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Timestamp, Long, Long)](spark)
      val out = StreamingOps.sessionizeStateful(
        in.toDF().toDF("ts", "user_id", "event_id"))
      val q = out.writeStream.format("memory")
        .queryName("sess_rocks").outputMode("append").start()
      try {
        in.addData(
          (ts(1, 0), 1L, 1L), (ts(1, 10), 1L, 2L), (ts(1, 50), 1L, 3L),
          (ts(1, 5), 2L, 4L))
        q.processAllAvailable()
        in.addData((ts(9, 0), 99L, 5L))
        q.processAllAvailable()
        val got = spark.table("sess_rocks")
          .filter(col("user_id").isin(1L, 2L))
          .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
        // same 3 closed sessions the default-provider test asserts:
        // user 1 splits on the 40-min gap, user 2 has one session
        assert(got.map(_._1) == Set(1L, 2L) && got.size == 3, got)
      } finally q.stop()
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("transformWithState sessionization: timer re-arm on session " +
      "extension, event-time close, batch parity") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Timestamp, Long, Long)](spark)
      val out = StreamingOps.sessionizeTws(
        in.toDF().toDF("ts", "user_id", "event_id"))
      val q = out.writeStream.format("memory")
        .queryName("sess_tws").outputMode("append").start()
      try {
        // batch 1: open a session; its close timer arms at 1:10+gap
        in.addData((ts(1, 0), 1L, 1L), (ts(1, 10), 1L, 2L))
        q.processAllAvailable()
        // batch 2: extend within the gap — the processor must DELETE
        // the superseded timer and re-arm (a stale fire would close
        // the session early and split it)
        in.addData((ts(1, 35), 1L, 3L))
        q.processAllAvailable()
        // batch 3: a second session after the gap, then advance the
        // watermark far enough to close everything
        in.addData((ts(3, 0), 1L, 4L))
        q.processAllAvailable()
        in.addData((ts(9, 0), 99L, 5L))
        q.processAllAvailable()
        val got = spark.table("sess_tws")
          .filter(col("user_id") === 1L)
          .collect().map(r => (r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
        // ONE first session spanning 1:00-1:35 (3 events — the timer
        // re-arm preserved it) and one second session at 3:00
        assert(got == Set(
          (1L, 3L, us(1, 0), us(1, 35)),
          (2L, 1L, us(3, 0), us(3, 0))), got)
      } finally q.stop()
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
