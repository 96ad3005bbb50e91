package graft.embed

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Real HTTP [[EmbedTransport]]: POST one batch of texts as JSON, read one
  * vector per text back, in order — the reference's Cohere client shape
  * (/root/reference/db/cohere.go:35-50: `client.Embed(EmbedOptions{Texts,
  * Model})` → `response.Embeddings` → float64→float32) re-expressed over
  * `java.net.http` with no hosted dependency: the endpoint is a plain URL,
  * so tests (and air-gapped deployments) point it at their own server.
  *
  * Wire contract:
  *   - request  `POST endpoint` body `{"texts":[...],"model":"..."}` with
  *     `Content-Type: application/json` and, when an API key is set,
  *     `Authorization: Bearer <key>` — the header Cohere's Go SDK sends
  *     for the reference.
  *   - response `200` body `{"embeddings":[[...],[...]]}`; element counts
  *     must match the request's text count and the declared `dim`
  *     (checked loudly — a silent mismatch would corrupt every stored
  *     vector downstream).
  *
  * Fault policy: 5xx and transport-level `IOException`s are retried up to
  * `maxRetries` times with exponential backoff (the transient-failure
  * classes a hosted embed API actually exhibits); 4xx fails immediately
  * with the status and body in the message (a bad request never heals by
  * retrying). The last failure always propagates — the caller's insert
  * aborts rather than persisting a half-embedded batch, matching the
  * reference's error-out-on-first-batch behavior (cohere.go:26-29).
  *
  * Executor-safety: [[EmbedTransport]]s ride inside `mapPartitions` tasks
  * ([[BatchedEmbedder.embedDF]]), so everything non-serializable
  * (`HttpClient`, `ObjectMapper`) is `@transient lazy` — rebuilt once per
  * executor JVM after deserialization, shared across that executor's
  * batches.
  */
final case class HttpEmbedTransport(
    endpoint: String,
    model: String,
    dim: Int,
    apiKey: Option[String] = None,
    maxRetries: Int = 3,
    requestTimeout: Duration = Duration.ofSeconds(30),
    retryBaseDelayMs: Long = 100L) extends EmbedTransport {
  require(dim > 0, "dim must be positive")
  require(maxRetries >= 0, "maxRetries must be >= 0")

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(requestTimeout)
    .build()
  @transient private lazy val mapper = new ObjectMapper()

  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    val body = requestBody(texts)
    val req = {
      val b = HttpRequest.newBuilder(URI.create(endpoint))
        .timeout(requestTimeout)
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body,
          StandardCharsets.UTF_8))
      apiKey.foreach(k => b.header("Authorization", s"Bearer $k"))
      b.build()
    }

    var attempt = 0
    var lastFailure: Throwable = null
    while (attempt <= maxRetries) {
      if (attempt > 0) {
        // full backoff before every retry: base * 2^(attempt-1)
        Thread.sleep(retryBaseDelayMs << (attempt - 1))
      }
      try {
        val resp = client.send(req,
          HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
        resp.statusCode() match {
          case 200 =>
            return parseResponse(resp.body(), texts.size)
          case s if s >= 500 => // transient server-side — retry
            lastFailure = new IOException(
              s"embed endpoint $endpoint returned $s: ${trim(resp.body())}")
          case s => // 4xx (and anything else non-retryable) — fail now
            throw new IllegalStateException(
              s"embed endpoint $endpoint rejected the request ($s): " +
                trim(resp.body()))
        }
      } catch {
        case e: IOException => lastFailure = e // connect/read failure
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
      }
      attempt += 1
    }
    throw new IOException(
      s"embed request to $endpoint failed after ${maxRetries + 1} attempts",
      lastFailure)
  }

  /** `{"texts":[...],"model":"..."}` — jackson handles escaping. */
  private def requestBody(texts: Seq[String]): String = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("texts")
    texts.foreach(arr.add)
    root.put("model", model)
    mapper.writeValueAsString(root)
  }

  /** Parse `{"embeddings":[[...],...]}`, validating count and dim. */
  private def parseResponse(body: String, expected: Int)
      : Seq[Array[Float]] = {
    val root =
      try mapper.readTree(body)
      catch {
        case e: Exception => throw new IOException(
          s"embed endpoint $endpoint returned unparseable JSON: " +
            trim(body), e)
      }
    val embs = root.get("embeddings")
    require(embs != null && embs.isArray,
      s"embed response from $endpoint has no 'embeddings' array: " +
        trim(body))
    require(embs.size() == expected,
      s"embed endpoint $endpoint returned ${embs.size()} vectors for " +
        s"$expected texts")
    (0 until expected).map { i =>
      val v: JsonNode = embs.get(i)
      require(v.isArray && v.size() == dim,
        s"embed vector $i has ${v.size()} dims, expected $dim")
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) {
        // float64 on the wire → float32 stored, the reference's
        // Convert2Float32 (cohere.go:66-71)
        out(j) = v.get(j).asDouble().toFloat
        j += 1
      }
      out
    }
  }

  private def trim(s: String): String =
    if (s == null) "" else if (s.length <= 200) s else s.take(200) + "..."
}
