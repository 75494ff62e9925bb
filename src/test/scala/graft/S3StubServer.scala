package graft

import java.net.InetSocketAddress
import java.nio.file.{FileAlreadyExistsException, Files, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-sandbox S3-style conditional-PUT endpoint (the container has no
  * egress and no MinIO binary, so the smallest REAL server wins): a JDK
  * HttpServer on loopback that implements exactly the object-store verb
  * the commit protocol needs — `PUT /<url-encoded key>` with
  * `If-None-Match: *` → 200 created / 412 an object already exists /
  * 400 when the precondition header is missing (a commit MUST never
  * turn into an unconditional overwrite).
  *
  * What this buys over `LocalConditionalStore`: the race is arbitrated
  * in ANOTHER thread pool behind a real HTTP round trip — request
  * serialization, concurrent handler execution, and the client's
  * status-code mapping are all exercised — while the bucket's backing
  * store is the local filesystem at the decoded key (temp write + atomic
  * link(2) publish, the same appear-complete-or-not-at-all visibility an
  * object store gives), so Snapshots' plain-file readers observe commits
  * exactly as they would on a FUSE-mounted bucket. Bound to 127.0.0.1
  * and writing only under the test tables' temp dirs — a test fixture,
  * not a service.
  */
object S3StubServer {

  /** Started on first use; daemon executor dies with the JVM. */
  lazy val endpoint: String = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => handle(x))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(
      8,
      (r: Runnable) => {
        val t = new Thread(r, "s3stub"); t.setDaemon(true); t
      }))
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  private def handle(x: HttpExchange): Unit =
    try {
      val body = x.getRequestBody.readAllBytes()
      if (x.getRequestMethod != "PUT") respond(x, 405, "method not allowed")
      else if (!Option(x.getRequestHeaders.getFirst("If-None-Match"))
          .contains("*"))
        respond(x, 400, "missing If-None-Match: * (unconditional " +
          "overwrite refused)")
      else {
        // Decode EXACTLY ONCE, from the RAW (still-encoded) path — the
        // round-11 version decoded twice (getRequestURI.getPath already
        // percent-decodes, then URLDecoder ran again), which silently
        // remapped keys containing '+' and 500'd on keys containing '%'.
        // And decode with PURE RFC-3986 semantics: URLDecoder alone
        // applies form semantics ('+' on the wire becomes a space),
        // which real S3's path decoding does not — the paired client
        // happens to send '+' as %2B, so that divergence would only
        // bite a future client, the same symmetric-bug shape one layer
        // down. Protecting raw '+' before URLDecoder leaves only the
        // %XX escapes for it to decode.
        // Keys are bucket-relative on the wire (the real S3 shape); this
        // fixture's bucket root is the filesystem root, so the decoded
        // key re-roots under '/'.
        val key = "/" + java.net.URLDecoder.decode(
          x.getRequestURI.getRawPath.stripPrefix("/").replace("+", "%2B"),
          "UTF-8")
        val target = Paths.get(key)
        // Publish-then-appear: complete temp object, then link(2) — the
        // kernel arbitrates concurrent handlers exactly once per key.
        val tmp = target.getParent.resolve(
          s".s3put-${java.util.UUID.randomUUID().toString.take(8)}")
        Files.write(tmp, body)
        try {
          try { Files.createLink(target, tmp); respond(x, 200, "created") }
          catch {
            case _: FileAlreadyExistsException =>
              respond(x, 412, "PreconditionFailed: object exists")
          }
        } finally Files.deleteIfExists(tmp)
      }
    } catch {
      case e: Throwable => respond(x, 500, s"${e.getClass.getName}: ${e.getMessage}")
    } finally x.close()

  private def respond(x: HttpExchange, code: Int, msg: String): Unit = {
    val bytes = msg.getBytes("UTF-8")
    x.sendResponseHeaders(code, bytes.length)
    x.getResponseBody.write(bytes)
  }
}
