package graft.embed

import java.io.IOException
import java.net.InetSocketAddress

import com.sun.net.httpserver.HttpServer

import graft.SparkTestBase

/** Drives the real `java.net.http` client ([[HttpEmbedTransport]]) against
  * an in-process stub server ([[StubEmbedServer]], shared with the
  * config-boot spec) — the reference's POST-batch contract
  * (/root/reference/db/cohere.go:35-50) without the hosted dependency:
  * batch boundaries (≤96), 512-cp truncation, retry-on-5xx with eventual
  * success AND eventual failure, no-retry-on-4xx, auth header, and
  * response-shape validation.
  */
class HttpTransportSpec extends SparkTestBase {
  import spark.implicits._

  private type StubServer = StubEmbedServer

  private def transport(s: StubServer, dim: Int,
      key: Option[String] = None, retries: Int = 3) =
    HttpEmbedTransport(s.url, "stub-model", dim, apiKey = key,
      maxRetries = retries, retryBaseDelayMs = 1L)

  test("http: end-to-end batched ingest, vectors bit-equal to offline path") {
    val s = new StubEmbedServer(16, expectKey = Some("sekrit"))
    try {
      val be = BatchedEmbedder(transport(s, 16, key = Some("sekrit")))
      val df = spark.range(200).selectExpr("concat('doc ', id) as t")
        .coalesce(1)
      val rows = be.embedDF(df, "t", "v").collect()
      assert(rows.length == 200 && rows.forall(!_.isNullAt(1)))
      // reference batch boundaries: ≤96 per request (cohere.go:10)
      assert(s.batches.toArray(Array.empty[Seq[String]]).map(_.size).toSeq
        == Seq(96, 96, 8))
      val offline = HashingEmbedder(16)
      rows.foreach { r =>
        assert(java.util.Arrays.equals(
          r.getSeq[Float](1).toArray, offline.embedOne(r.getString(0))))
      }
    } finally s.close()
  }

  test("http: texts are 512-cp truncated before they reach the wire") {
    val s = new StubEmbedServer(8)
    try {
      val be = BatchedEmbedder(transport(s, 8))
      val long = "é" * 600 // non-ASCII so cp-counting matters
      be.embedDF(Seq(long, "short").toDF("t").coalesce(1), "t", "v")
        .collect()
      val seen = s.batches.toArray(Array.empty[Seq[String]]).flatten
      assert(seen.forall(t => t.codePointCount(0, t.length) <= 512))
      assert(seen.exists(_.length == 512))
    } finally s.close()
  }

  test("http: 5xx retried with backoff, then succeeds") {
    val s = new StubEmbedServer(8, failFirst = 2)
    try {
      val t = transport(s, 8)
      val v = t.embedBatch(Seq("hello world"))
      assert(v.length == 1 && v.head.length == 8)
      assert(s.requestCount == 3) // 2 × 503 + 1 success
      assert(java.util.Arrays.equals(v.head,
        HashingEmbedder(8).embedOne("hello world")))
    } finally s.close()
  }

  test("http: 5xx exhausts retries and propagates the last failure") {
    val s = new StubEmbedServer(8, alwaysStatus = Some(503))
    try {
      val t = transport(s, 8, retries = 2)
      val e = intercept[IOException] { t.embedBatch(Seq("x")) }
      assert(e.getMessage.contains("after 3 attempts"))
      assert(e.getCause.getMessage.contains("503"))
      assert(s.requestCount == 3)
    } finally s.close()
  }

  test("http: 4xx fails immediately — no retry, status+body in message") {
    val s = new StubEmbedServer(8, alwaysStatus = Some(400))
    try {
      val t = transport(s, 8)
      val e = intercept[IllegalStateException] { t.embedBatch(Seq("x")) }
      assert(e.getMessage.contains("400") &&
        e.getMessage.contains("forced 400"))
      assert(s.requestCount == 1)
    } finally s.close()
  }

  test("http: vector-count mismatch from the server fails loudly") {
    val s = new StubEmbedServer(8, dropVectors = true)
    try {
      val t = transport(s, 8)
      val e = intercept[IllegalArgumentException] {
        t.embedBatch(Seq("a", "b", "c"))
      }
      assert(e.getMessage.contains("2 vectors for 3 texts"))
    } finally s.close()
  }

  test("http: connection refused is retried then propagated as IOException") {
    // bind-then-close to get a port with nothing listening
    val dead = HttpServer.create(new InetSocketAddress(0), 0)
    val port = dead.getAddress.getPort
    dead.stop(0)
    val t = HttpEmbedTransport(s"http://127.0.0.1:$port/embed",
      "stub-model", 8, maxRetries = 1, retryBaseDelayMs = 1L)
    val e = intercept[IOException] { t.embedBatch(Seq("x")) }
    assert(e.getMessage.contains("after 2 attempts"))
  }
}
