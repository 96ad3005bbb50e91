package graft.embed

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Stub embed server shared by the transport and config-boot specs:
  * validates the wire request (method, content type, model, optional
  * bearer token), embeds via [[HashingEmbedder]] so vectors are
  * comparable to the offline path, and records every batch.
  * `failFirst` requests are answered 503 (transient); `alwaysStatus`
  * short-circuits every request with a fixed status; `dropVectors`
  * returns one vector too few (shape-violation probe).
  */
final class StubEmbedServer(
    dim: Int,
    expectKey: Option[String] = None,
    failFirst: Int = 0,
    alwaysStatus: Option[Int] = None,
    dropVectors: Boolean = false,
    model: String = "stub-model") extends AutoCloseable {
  private val mapper = new ObjectMapper()
  private val inner = HashingEmbedder(dim)
  private val requests = new AtomicInteger(0)
  val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]

  private val server = HttpServer.create(new InetSocketAddress(0), 0)
  server.createContext("/embed", (ex: HttpExchange) => {
    val n = requests.incrementAndGet()
    try {
      val bodyBytes = ex.getRequestBody.readAllBytes()
      alwaysStatus match {
        case Some(s) => respond(ex, s, s"""{"message":"forced $s"}""")
        case None if n <= failFirst =>
          respond(ex, 503, """{"message":"transient"}""")
        case None =>
          assert(ex.getRequestMethod == "POST")
          assert(ex.getRequestHeaders.getFirst("Content-Type")
            .startsWith("application/json"))
          expectKey.foreach { k =>
            assert(ex.getRequestHeaders.getFirst("Authorization") ==
              s"Bearer $k")
          }
          val req = mapper.readTree(
            new String(bodyBytes, StandardCharsets.UTF_8))
          assert(req.get("model").asText() == model)
          val texts = (0 until req.get("texts").size())
            .map(req.get("texts").get(_).asText())
          batches.add(texts)
          val root = mapper.createObjectNode()
          val arr = root.putArray("embeddings")
          val out = if (dropVectors) texts.dropRight(1) else texts
          out.foreach { t =>
            val v = arr.addArray()
            inner.embedOne(t).foreach(f => v.add(f.toDouble))
          }
          respond(ex, 200, mapper.writeValueAsString(root))
      }
    } catch {
      case e: Throwable =>
        respond(ex, 400, s"""{"message":"${e.getMessage}"}""")
    }
  })
  server.start()

  private def respond(ex: HttpExchange, status: Int, body: String)
      : Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  def url: String =
    s"http://127.0.0.1:${server.getAddress.getPort}/embed"
  def requestCount: Int = requests.get()
  def close(): Unit = server.stop(0)
}
