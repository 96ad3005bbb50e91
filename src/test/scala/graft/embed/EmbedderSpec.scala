package graft.embed

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** The column path and the driver path MUST be bit-equal (the reference's
  * stored-vs-query embedding contract) — including non-ASCII input,
  * truncation at the 512-codepoint cap, and empty/degenerate strings. */
class EmbedderSpec extends SparkTestBase {
  import spark.implicits._

  private val emb = HashingEmbedder(64)

  private val corpus = Seq(
    "hello world",
    "Hello, WORLD! 42",
    "", "   ", "!!!",
    "İstanbul ığüşöç DİYARBAKIR", // Turkish dotted/dotless i
    "naïve café résumé",
    "😀 emoji 🚀 pad", // supplementary chars
    "a" * 511 + "XYZ", // straddles the 512-codepoint cap
    ("tok " * 400).trim, // > 512 chars, many tokens
    "key agg row scan slow fast table value part hash"
  )

  test("column path == driver path, bit-for-bit") {
    val viaColumn = corpus.toDF("t")
      .withColumn("v", emb.embed(col("t")))
      .select("t", "v").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1).toArray).toMap
    corpus.foreach { t =>
      assert(java.util.Arrays.equals(viaColumn(t), emb.embedOne(t)),
        s"diverged on: $t")
    }
  }

  test("dimension and normalization") {
    corpus.foreach { t =>
      val v = emb.embedOne(t)
      assert(v.length == 64)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(n == 0.0 || math.abs(n - 1.0) < 1e-6, s"norm $n for: $t")
    }
  }

  test("tokenless text embeds to the zero vector") {
    assert(emb.embedOne("!!! ???").forall(_ == 0.0f))
  }

  test("truncation: chars past the 512-codepoint cap are ignored") {
    val base = "a" * 512
    assert(java.util.Arrays.equals(
      emb.embedOne(base + " completely different suffix"),
      emb.embedOne(base)))
  }

  test("null-safe column path") {
    val out = Seq((1, Option.empty[String]), (2, Some("x")))
      .toDF("id", "t").withColumn("v", emb.embed(col("t")))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(!out(1).isNullAt(1))
  }

  test("embedder id is stable and dim-scoped") {
    assert(emb.id == "hashing-md5-v1-d64")
    assert(HashingEmbedder(128).id == "hashing-md5-v1-d128")
  }

  // ---- BatchedEmbedder: the reference's ≤96/request + 512-char contract

  test("batched: exactly one request for 96 docs, [96,1] for 97") {
    def batchesFor(n: Int): Seq[Int] = {
      val key = s"b96-$n-${System.nanoTime()}"
      val be = BatchedEmbedder(RecordingTransport(key, 16))
      val df = spark.range(n).selectExpr("concat('doc ', id) as t")
        .coalesce(1) // one partition => batch boundaries are global
      // ONE action: every extra action re-runs the lazy RDD and would
      // re-call the (remote) transport — itself a property worth pinning
      val rows = be.embedDF(df, "t", "v").collect()
      assert(rows.length == n && rows.forall(!_.isNullAt(1)))
      RecordingTransport.recorded(key)
    }
    assert(batchesFor(96) == Seq(96))
    assert(batchesFor(97) == Seq(96, 1))
    assert(batchesFor(200) == Seq(96, 96, 8)) // ragged tail
  }

  test("batched: nulls never reach the transport and embed to null") {
    val key = s"bnull-${System.nanoTime()}"
    val be = BatchedEmbedder(RecordingTransport(key, 16))
    val df = Seq(Some("a"), None, Some("b"), None, Some("c"))
      .zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "t").coalesce(1)
    // collect unsorted then order on the driver: orderBy's range
    // partitioner SAMPLES the RDD, which would re-call the transport
    val out = be.embedDF(df, "t", "v").collect().sortBy(_.getInt(0))
    assert(out.map(_.isNullAt(2)).toSeq ==
      Seq(false, true, false, true, false))
    // the single request carried only the 3 non-null texts
    assert(RecordingTransport.recorded(key) == Seq(3))
  }

  test("batched: custom cap and 512-cp truncation before the transport") {
    val key = s"bcap-${System.nanoTime()}"
    val be = BatchedEmbedder(RecordingTransport(key, 16), maxTexts = 4)
    val long = "a" * 600
    val df = (0 until 10).map(i => s"$long $i").toDF("t").coalesce(1)
    be.embedDF(df, "t", "v").collect()
    assert(RecordingTransport.recorded(key) == Seq(4, 4, 2))
    // every text the transport saw was pre-truncated to <= 512 cps
    assert(RecordingTransport.texts(key).forall(
      t => t.codePointCount(0, t.length) <= 512))
  }

  test("batched: embedOne bit-equal to the batched DF path") {
    val key = s"beq-${System.nanoTime()}"
    val be = BatchedEmbedder(RecordingTransport(key, 64))
    val viaDf = be.embedDF(corpus.toDF("t").coalesce(1), "t", "v")
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1).toArray)
      .toMap
    corpus.foreach { t =>
      assert(java.util.Arrays.equals(viaDf(t), be.embedOne(t)),
        s"diverged on: $t")
    }
  }

  test("batched: kaer collection built through it answers like the hashing path") {
    import graft.api.{Data, KaerSession}
    val docs = (0 until 25).map(i => s"document number $i about topic ${i % 5}")
    val key = s"bkaer-${System.nanoTime()}"
    // fake transport delegates to the hashing embedder, so the two
    // collections must rank identically
    val bRoot = tmpDir("embed-batched")
    val bColl = new KaerSession(spark, bRoot,
      BatchedEmbedder(RecordingTransport(key, 64))).createCollection("c")
    bColl.insert(Data().withDocuments(docs))
    val hRoot = tmpDir("embed-hashing")
    val hColl = new KaerSession(spark, hRoot, HashingEmbedder(64))
      .createCollection("c")
    hColl.insert(Data().withDocuments(docs))
    val q = "document about topic 3"
    val b = bColl.query(q, 5).select("_m_id").collect().map(_.getLong(0))
    val h = hColl.query(q, 5).select("_m_id").collect().map(_.getLong(0))
    assert(b.sameElements(h), s"batched=${b.toSeq} hashing=${h.toSeq}")
    // reopen trust-checks the persisted embedder id
    intercept[IllegalArgumentException] {
      new KaerSession(spark, bRoot, HashingEmbedder(64)).getCollection("c")
    }
  }
}

/** Deterministic fake transport: delegates to [[HashingEmbedder]] (so
  * oracles/rankings are unchanged) while recording every batch it is
  * asked to embed — the contract-assertion half of the reference's Cohere
  * client (db/cohere.go:20-33) without the network. */
object RecordingTransport {
  private val byKey = new scala.collection.concurrent.TrieMap[
    String, scala.collection.mutable.ArrayBuffer[Seq[String]]]()
  private def buf(key: String) =
    byKey.getOrElseUpdate(key, scala.collection.mutable.ArrayBuffer.empty)
  def recorded(key: String): Seq[Int] =
    buf(key).synchronized(buf(key).map(_.size).toSeq)
  def texts(key: String): Seq[String] =
    buf(key).synchronized(buf(key).flatten.toSeq)
}
final case class RecordingTransport(key: String, dim: Int)
    extends EmbedTransport {
  val model = "fake-hashing-v1"
  private lazy val inner = HashingEmbedder(dim)
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    require(texts.nonEmpty && texts.forall(_ != null),
      "contract: non-empty, no nulls")
    val b = RecordingTransport.buf(key)
    b.synchronized(b += texts)
    texts.map(inner.embedOne)
  }
}
