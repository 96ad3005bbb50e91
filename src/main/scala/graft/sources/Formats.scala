package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet: CSV and JSON lines, each
  * exercised as a full write → read → query round trip so both the sink
  * and the source sides are under the oracle gate (the read back must
  * reproduce the parquet-sourced answer exactly).
  *
  * Schemas are always EXPLICIT on read: schema inference is a sample scan
  * plus a guess — at 100 TB it is a full extra pass that can still guess
  * wrong. Timestamps cross the text formats as epoch integers (lossless,
  * tz-free); money crosses as exact integer cents.
  */
object Formats {

  private def scratch(dir: String, fmt: String): String =
    graft.core.Scratch.dir(s"fmt-$fmt", dir)

  /** supplier → CSV (header) → read with explicit schema → per-nation
    * rollup. */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "csv")
    s.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey"), col("s_nationkey"),
        round(col("s_acctbal") * 100).cast("long").as("acctbal_cents"))
      .write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_nationkey", IntegerType),
      StructField("acctbal_cents", LongType)))
    s.read.schema(schema).option("header", "true").csv(out)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("acctbal_cents")).as("total_cents"))
      .orderBy("s_nationkey")
  }

  /** events → JSON lines (ts as epoch micros) → read with explicit
    * schema → per-type rollup. */
  def jsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "json")
    graft.operators.Relational.events(s, dir)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("value_cents"))
      .write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("ts_us", LongType),
      StructField("value_cents", LongType)))
    s.read.schema(schema).json(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("ts_us")).as("first_us"),
        max(col("ts_us")).as("last_us"),
        sum(col("value_cents")).as("value_cents"))
      .orderBy("event_type")
  }

  /** orders → ORC (columnar, predicate-pushdown-capable — the other
    * first-class columnar format a lakehouse ingests) → read back →
    * per-status rollup. ORC keeps native types, so no epoch/cents
    * transport encoding is needed on the write side; the rollup still
    * aggregates integer cents for oracle parity. */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "orc")
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"))
      .write.mode("overwrite").orc(out)
    s.read.orc(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"),
        min(unix_micros(col("o_orderdate").cast("timestamp"))).as("first_us"))
      .orderBy("o_orderstatus")
  }

  /** Avro container-file round trip — WITHOUT the spark-avro connector
    * (not on this classpath): a distributed sink and source built
    * directly on the public `org.apache.avro` core API, which IS here.
    * Write: `foreachPartition` streams each partition through a
    * `DataFileWriter[GenericRecord]` into one `.avro` container file on
    * the Hadoop filesystem (snappy-coded blocks — the production Avro
    * layout). Read: the file list parallelizes into one task per file,
    * each decoding through `FsInput` + `DataFileReader` — so both sides
    * scale with partition count exactly like a built-in source; schema
    * is EXPLICIT both ways (the record schema is the contract, never
    * inferred). Integers-only payload (cents/epoch-µs), same policy as
    * the other text formats. */
  def avroRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.avro.{Schema => AvroSchema, SchemaBuilder}
    import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumReader,
      GenericDatumWriter, GenericRecord}
    import org.apache.hadoop.fs.Path
    val out = scratch(dir, "avro")
    val schemaJson = SchemaBuilder.record("order").fields()
      .requiredLong("o_orderkey")
      .requiredString("o_orderstatus")
      .requiredLong("total_cents")
      .requiredLong("order_us")
      .endRecord().toString
    // fresh write every run: a stale part file from a previous run with
    // a different partition count would silently survive an "overwrite"
    val rootPath = new Path(out)
    val fs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(rootPath)) fs.delete(rootPath, true)
    fs.mkdirs(rootPath)
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("order_us"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          // executor-side Configuration: defaults resolve from the
          // cluster's core-site on the classpath (file:// locally)
          val conf = new org.apache.hadoop.conf.Configuration()
          val p = new Path(s"$out/part-$pid.avro")
          val schema = new AvroSchema.Parser().parse(schemaJson)
          val w = new DataFileWriter(
            new GenericDatumWriter[GenericRecord](schema))
            .setCodec(CodecFactory.snappyCodec())
          w.create(schema, p.getFileSystem(conf).create(p, true))
          try it.foreach { r =>
            val rec = new GenericData.Record(schema)
            rec.put("o_orderkey", r.getLong(0))
            rec.put("o_orderstatus", r.getString(1))
            rec.put("total_cents", r.getLong(2))
            rec.put("order_us", r.getLong(3))
            w.append(rec)
          } finally w.close()
        }
      }
    val files = fs.listStatus(rootPath).map(_.getPath.toString)
      .filter(_.endsWith(".avro")).sorted
    import s.implicits._
    val decoded = s.sparkContext
      .parallelize(files.toSeq, math.max(files.length, 1))
      .flatMap { f =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val reader = DataFileReader.openReader(
          new org.apache.avro.mapred.FsInput(new Path(f), conf),
          new GenericDatumReader[GenericRecord]())
        try {
          val buf = scala.collection.mutable.ArrayBuffer
            .empty[(Long, String, Long, Long)]
          while (reader.hasNext) {
            val r = reader.next()
            buf += ((r.get("o_orderkey").asInstanceOf[Long],
              r.get("o_orderstatus").toString,
              r.get("total_cents").asInstanceOf[Long],
              r.get("order_us").asInstanceOf[Long]))
          }
          buf
        } finally reader.close()
      }
      .toDF("o_orderkey", "o_orderstatus", "total_cents", "order_us")
    decoded.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("total_cents")).as("total_cents"),
        min(col("order_us")).as("first_us"))
      .orderBy("o_orderstatus")
  }

  /** Schema evolution across parquet batches — the append-a-column
    * reality of any long-lived feed: batch 1 writes (doc_id, lang),
    * batch 2 adds n_chars; a `mergeSchema` read unions the footers and
    * back-fills the missing column with nulls. The gate rolls the
    * merged read up per lang so the null back-fill is visible in the
    * counts. At scale `mergeSchema` costs a footer pass per file —
    * production pins the superset schema in a catalog and reads with
    * it explicitly (same plan, no footer sweep); the null-fill
    * semantics under test are identical. */
  def schemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "evo")
    val d = s.read.parquet(s"$dir/documents.parquet")
    d.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"))
      .write.mode("overwrite").parquet(s"$out/b=1")
    d.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/b=2")
    s.read.option("mergeSchema", "true")
      .parquet(s"$out/b=1", s"$out/b=2")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        count(col("n_chars")).as("n_with_chars"),
        sum(col("n_chars")).as("chars_sum"))
      .orderBy("lang")
  }

  /** Corrupt-record routing — the malformed-input reality of any JSONL
    * feed at scale: a deterministic tenth of the lines are truncated
    * (closing brace cut off) before the write, and the PERMISSIVE read
    * routes them into the `columnNameOfCorruptRecord` column instead
    * of failing the job (FAILFAST) or silently dropping them
    * (DROPMALFORMED). The gate rolls up good rows per lang plus a
    * `_corrupt` bucket — the oracle knows by construction which rows
    * were broken, so the count proves no corrupt line was lost OR
    * misparsed. At 100 TB the same pattern quarantines bad lines to a
    * side output for replay instead of poisoning the batch. */
  def jsonlCorrupt(s: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "jsonl")
    val line = to_json(struct(col("doc_id"), col("lang"), col("n_chars")))
    s.read.parquet(s"$dir/documents.parquet")
      .select(when(col("doc_id") % 10 === 0,
          line.substr(lit(1), length(line) - 5))
        .otherwise(line).as("value"))
      .write.mode("overwrite").text(out)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("n_chars", LongType),
      StructField("_bad", StringType)))
    s.read.schema(schema).option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad").json(out)
      .select(when(col("_bad").isNotNull, lit("_corrupt"))
        .otherwise(col("lang")).as("lang"))
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .orderBy("lang")
  }

  /** customer → XML (rowTag "customer") → read with explicit schema →
    * per-segment rollup. Spark 4 ships the XML source natively in
    * spark-sql; like the other text formats the transport is integers
    * only (cents), schema explicit both ways, and the read-back rollup
    * must reproduce the parquet-sourced answer exactly. */
  def xmlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "xml")
    s.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("acctbal_cents"))
      .write.mode("overwrite").format("xml")
      .option("rowTag", "customer").save(out)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_mktsegment", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("acctbal_cents", LongType)))
    s.read.schema(schema).format("xml").option("rowTag", "customer")
      .load(out)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("acctbal_cents")).as("total_cents"))
      .orderBy("c_mktsegment")
  }

  /** Opaque-blob ingest through Spark's `binaryFile` source — the
    * entry point a multimodal corpus actually arrives through (image/
    * audio files on object storage, one row per file with content +
    * metadata, no decode on the driver). The gate plants 40
    * deterministic ASCII payload files (content derivable in SQL, so
    * the md5 digests sit under the oracle hash), scans them with
    * `format("binaryFile")`, and emits (id, length, md5). The fixture
    * dir is keyed by a formula-version string — changing the planted
    * content changes the scratch path, so a stale dir can never serve
    * the gate (the dppJoin fixture-trust advisory, applied here from
    * the start). */
  def binaryFileScan(s: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val NFiles = 40
    def content(id: Int): String = s"payload-$id:" + "ab" * (id % 37)
    val root = graft.core.Scratch.dir("binfiles-payload-v1", dir)
    val fs = new Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(root, "_SUCCESS"))) {
      fs.mkdirs(new Path(root))
      (0 until NFiles).foreach { id =>
        val o = fs.create(new Path(root, s"pay_$id.bin"), true)
        o.write(content(id).getBytes("UTF-8")); o.close()
      }
      fs.create(new Path(root, "_SUCCESS"), true).close()
    }
    s.read.format("binaryFile").option("pathGlobFilter", "*.bin")
      .load(root)
      .select(
        regexp_extract(col("path"), "pay_(\\d+)\\.bin$", 1)
          .cast("long").as("file_id"),
        col("length"),
        md5(col("content")).as("digest"))
      .orderBy("file_id")
  }

  /** DSv2 pushdown gate: query the [[GraftSeqSource]] connector with a
    * PUSHABLE id range (narrows the generated range inside the source),
    * a RESIDUAL predicate on the derived `vq` (correctly stays in
    * Spark), and a pruned projection. The oracle rebuilds the formulas
    * over generate_series — values match only if the source honored
    * the narrowed range exactly (off-by-one in the pushdown arithmetic
    * flips counts). PlanSpec locks PushedFilters + pruned ReadSchema. */
  def dsv2Scan(s: SparkSession, dir: String): DataFrame =
    s.read.format("graftseq")
      .option("rows", 200000).option("slices", 8).load()
      .filter(col("id") >= 150000 && col("id") < 190000 &&
        col("vq") < 50000)
      .groupBy("tag").agg(count(lit(1)).as("n"),
        sum(col("vq")).as("sum_vq"), max(col("bucket")).as("max_bucket"))
      .orderBy("tag")

  val oracle: Map[String, String] = Map(
    "dsv2_scan" ->
      """WITH g AS (SELECT unnest(generate_series(150000, 189999)) AS id),
        |v AS (SELECT id, id % 64 AS bucket,
        |    (id * 2654435761) % 100000 AS vq,
        |    't' || (id % 7) AS tag FROM g)
        |SELECT tag, count(*) AS n, CAST(sum(vq) AS BIGINT) AS sum_vq,
        |  CAST(max(bucket) AS BIGINT) AS max_bucket
        |FROM v WHERE vq < 50000 GROUP BY 1 ORDER BY tag""".stripMargin,
    "xml_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM customer GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "binaryfile_scan" ->
      """WITH ids AS (SELECT unnest(generate_series(0, 39)) AS file_id),
        |c AS (SELECT file_id,
        |  'payload-' || file_id || ':' || repeat('ab', file_id % 37)
        |    AS content FROM ids)
        |SELECT CAST(file_id AS BIGINT) AS file_id,
        |  CAST(length(content) AS BIGINT) AS length,
        |  md5(content) AS digest
        |FROM c ORDER BY file_id""".stripMargin,
    "jsonl_corrupt" ->
      """SELECT CASE WHEN doc_id % 10 = 0 THEN '_corrupt' ELSE lang END
        |  AS lang, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "schema_evolution" ->
      """WITH m AS (
        |  SELECT doc_id, lang, NULL::BIGINT AS n_chars FROM documents
        |  WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, lang, n_chars FROM documents
        |  WHERE doc_id % 2 = 1)
        |SELECT lang, count(*) AS n, count(n_chars) AS n_with_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sum
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin,
    "avro_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS total_cents,
        |  min(epoch_us(o_orderdate)) AS first_us
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "orc_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS total_cents,
        |  min(epoch_us(o_orderdate)) AS first_us
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "csv_roundtrip" ->
      """SELECT s_nationkey, count(*) AS n_suppliers,
        |  CAST(sum(CAST(round(s_acctbal*100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM supplier GROUP BY 1 ORDER BY s_nationkey""".stripMargin,
    "json_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        |  min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
        |    AS value_cents
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "csv_roundtrip" -> (csvRoundtrip _),
    "schema_evolution" -> (schemaEvolution _),
    "jsonl_corrupt" -> (jsonlCorrupt _),
    "json_roundtrip" -> (jsonRoundtrip _),
    "orc_roundtrip" -> (orcRoundtrip _),
    "avro_roundtrip" -> (avroRoundtrip _),
    "xml_roundtrip" -> (xmlRoundtrip _),
    "binaryfile_scan" -> (binaryFileScan _),
    "dsv2_scan" -> (dsv2Scan _)
  )
}
