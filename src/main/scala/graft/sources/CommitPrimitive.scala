package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path}

/** The SINGLE storage primitive the snapshot table's transactionality
  * rests on: publish a complete record at a path iff nothing exists
  * there, atomically — the compare-and-swap every lakehouse commit
  * protocol reduces to. Everything else Snapshots does with storage is
  * plain immutable-file reads and writes of attempt-unique names (no
  * atomicity needed); ONLY the manifest publish goes through this trait,
  * so porting the table to a new backend is exactly one implementation:
  *
  *  - local FS / NFS-with-link-semantics / HDFS: [[PosixLinkCommit]]
  *    below (hard link create-if-absent, EEXIST = lost race);
  *  - S3: conditional PUT with `If-None-Match: *` (supported since 2024)
  *    or a DynamoDB log entry (the pre-conditional-PUT Delta recipe);
  *  - GCS/Azure: `if-generation-match: 0` / `If-None-Match: *`;
  *  - a catalog service: INSERT of the (table, version) row, unique-key
  *    violation = lost race.
  *
  * Contract: returns true iff THIS call created `target` (the caller
  * committed); false iff the create was refused because a record already
  * exists — or may exist: a SPURIOUS false (backend timeout retried
  * after the competitor won, test double) is safe, because every caller
  * re-reads the latest version and retries or conflicts. It must NEVER
  * return true without `target` durably holding `content`, and a reader
  * must never observe a partially-written `target` (publish-then-appear,
  * not appear-then-fill).
  */
trait CommitPrimitive {
  /** Atomically create `target` holding `content` iff absent. */
  def createIfAbsent(target: Path, content: String): Boolean

  /** Backend tag for errors/logs. */
  def name: String
}

/** POSIX implementation: write the complete record to an attempt-unique
  * temp file in the target's directory, then hard-link it to `target` —
  * link(2) fails with EEXIST atomically (the local-FS form of an
  * object-store conditional PUT), and the temp is fully written before
  * the link, so the record appears complete or not at all.
  */
object PosixLinkCommit extends CommitPrimitive {
  override def name: String = "posix-link"

  override def createIfAbsent(target: Path, content: String): Boolean = {
    val tmp = target.getParent.resolve(
      s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.writeString(tmp, content)
    try {
      try { Files.createLink(target, tmp); true }
      catch { case _: FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }
}

/** The single call an object store answers for the commit protocol: an
  * atomic store-iff-absent of one complete object. Real backends are one
  * HTTP verb each — S3 `PUT` with `If-None-Match: *` (HTTP 412 = lost
  * race), GCS `ifGenerationMatch=0`, Azure `If-None-Match: *`, or a
  * catalog `INSERT` whose unique-key violation is the lost race. The
  * store may return a SPURIOUS false (a timed-out PUT retried after the
  * competitor won); [[CommitPrimitive]]'s contract already absorbs that.
  */
trait ConditionalStore {
  def name: String

  /** Atomically store `content` at `key` iff no object exists there;
    * true iff THIS call stored it.
    */
  def putIfAbsent(key: String, content: String): Boolean
}

/** Object-store commit: the manifest CAS delegated to a
  * [[ConditionalStore]] conditional PUT. This class and
  * [[PosixLinkCommit]] differ ONLY in who arbitrates the race — link(2)
  * vs the store's conditional write; every layer above the trait (blind
  * retry, rebase, read-modify-write conflict, bounded exhaustion) is
  * backend-agnostic, which SnapshotsConcurrencySpec certifies by running
  * its race matrix through BOTH backends.
  */
final class ObjectStoreCommit(store: ConditionalStore)
    extends CommitPrimitive {
  override def name: String = s"object-store(${store.name})"

  override def createIfAbsent(target: Path, content: String): Boolean =
    store.putIfAbsent(target.toString, content)
}

/** A REAL object-store client for the commit protocol: the conditional
  * PUT as an actual HTTP round trip — `PUT <endpoint>/<url-encoded key>`
  * with `If-None-Match: *`, the exact verb S3 has answered since 2024
  * (and MinIO, GCS's `If-None-Match: *` XML-API equivalent, Azure Blob)
  * — so the race is arbitrated SERVER-side by a different process, not
  * by this JVM's memory or filesystem. Response mapping follows the S3
  * contract: 200/201 = this call created the object; 412
  * (PreconditionFailed) = an object already exists — lost race; 409
  * (ConditionalRequestConflict) = another conditional writer is mid-PUT
  * on the same key — reported as a loss, which is safe because
  * [[CommitPrimitive]]'s contract absorbs spurious falses (the caller
  * re-reads and retries). Anything else (5xx, timeout) throws: an
  * UNKNOWN outcome must surface as an error, never be guessed into a
  * true/false.
  *
  * SnapshotsConcurrencySpec runs the full race matrix through this
  * client against an in-sandbox conditional-PUT server (its `S3StubServer`)
  * as the third backend next to link(2) and the in-memory double.
  */
final class HttpConditionalStore(endpoint: String) extends ConditionalStore {
  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()

  override def name: String = s"http(${endpoint})"

  /** PERCENT-encode each path segment — not form-encode the whole key.
    * URLEncoder alone is application/x-www-form-urlencoded: it turns a
    * space into '+', so against a real S3 (which percent-decodes the path
    * exactly once, with no form semantics) a key containing a space would
    * land under a literal-'+' key and a key containing '+' would survive
    * only if the server ALSO applied form decoding — the symmetric-bug
    * trap this file shipped with in round 11. The fix is the standard
    * one: form-encode the segment, then rewrite '+' → "%20" so the result
    * is pure RFC-3986 percent-encoding ('/' separators preserved, so the
    * object key keeps its path structure on the wire).
    */
  private def encodePath(key: String): String =
    key.split("/", -1).map(seg =>
      java.net.URLEncoder.encode(seg, "UTF-8").replace("+", "%20"))
      .mkString("/")

  override def putIfAbsent(key: String, content: String): Boolean = {
    // Keys travel BUCKET-RELATIVE, the real S3 shape: the fixture's
    // bucket root is the filesystem root, so the object key is the
    // absolute path minus its leading '/' (a leading '/' in the request
    // path would also read as a '//' authority marker to URI parsers —
    // the JDK's HttpServer rejects such request lines outright).
    require(key.startsWith("/"),
      s"object-store keys are absolute filesystem paths, got: $key")
    val uri = java.net.URI.create(
      endpoint + "/" + encodePath(key.stripPrefix("/")))
    val req = java.net.http.HttpRequest.newBuilder(uri)
      .timeout(java.time.Duration.ofSeconds(30))
      .header("If-None-Match", "*")
      .PUT(java.net.http.HttpRequest.BodyPublishers.ofString(
        content, java.nio.charset.StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 | 201 => true
      case 412 | 409 => false
      case c => throw new java.io.IOException(
        s"conditional PUT $uri: HTTP $c ${resp.body()}")
    }
  }
}

/** Local stand-in for an S3-style bucket: the conditional decision is one
  * ConcurrentHashMap reservation (the linearization point a real store
  * provides server-side); the winner then materializes the object for
  * readers as a temp-write + ATOMIC_MOVE, so a manifest appears complete
  * or not at all (publish-then-appear, same visibility law object stores
  * give a conditional PUT). Objects created outside this store (a table
  * committed under [[PosixLinkCommit]], or a previous process) are
  * honored by an existence probe before the reservation — first write
  * wins across backends, as on a real bucket.
  */
object LocalConditionalStore extends ConditionalStore {
  private val reserved =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  override def name: String = "local-stub"

  override def putIfAbsent(key: String, content: String): Boolean = {
    val target = java.nio.file.Paths.get(key)
    if (Files.exists(target)) return false
    if (!reserved.add(key)) return false
    try {
      val tmp = target.getParent.resolve(
        s".put-${java.util.UUID.randomUUID().toString.take(8)}")
      Files.writeString(tmp, content)
      Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      true
    } catch { case e: Throwable =>
      // A failed PUT must not burn the key into permanent spurious
      // losses — release the reservation so a retry can still commit.
      reserved.remove(key)
      throw e
    }
  }
}
