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
