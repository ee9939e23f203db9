package graft.streaming

import java.nio.file.{FileAlreadyExistsException, Files, Path}
import java.util.UUID

/** The ONE storage primitive [[TxTable]]'s transaction log needs:
  * atomic put-if-absent of a small immutable object. Extracted as a
  * seam (VERDICT r15 task #4) because the default implementation's
  * atomicity is a FILESYSTEM property that object stores do not share —
  * the same reason Delta Lake ships pluggable LogStores.
  *
  * Contract:
  *   - Exactly one of any set of concurrent `putIfAbsent` calls for the
  *     same `target` succeeds — across processes and hosts, not just
  *     threads. Losers throw [[FileAlreadyExistsException]]; TxTable's
  *     optimistic-concurrency loop treats that as "re-read the new
  *     snapshot, rebase, retry at the next version", so a store that
  *     ever lets two writers both "win" one version silently corrupts
  *     the serializable history.
  *   - A reader never observes a partial object: `target` either does
  *     not exist or holds all of `bytes`. (Commit/checkpoint payloads
  *     additionally carry an eof trailer, but that detects LATER damage
  *     — bit rot, truncation at rest — not a sloppy publish.)
  *   - A FAILED call must leave no visible `target` (staging residue
  *     that readers skip, e.g. dot-prefixed temp files, is acceptable;
  *     a visible half-object is not).
  *
  * Deployment matrix:
  *   - POSIX local/NFSv4/HDFS-style filesystems: [[HardLinkLogStore]]
  *     (the default) — hard-link creation is atomic and fails on an
  *     existing target; this is the same rename/link trick Delta uses
  *     on HDFS.
  *   - S3-class object stores: neither rename nor link exists, and a
  *     plain PUT is last-writer-wins. Implement this trait over a
  *     conditional PUT (S3 `If-None-Match: *`, GCS precondition
  *     `ifGenerationMatch=0`, ABFS `If-None-Match`) or an external
  *     arbiter table with conditional writes (the Delta
  *     S3DynamoDBLogStore shape). TxTableLogStoreSpec's scripted
  *     conditional-put fake pins exactly the behavior such an
  *     implementation must provide.
  */
trait LogStore {

  /** Publish `bytes` at `target` iff nothing exists there, atomically.
    * @throws FileAlreadyExistsException when `target` already exists —
    *         the OCC "lost the race" signal, NOT an error state.
    */
  def putIfAbsent(target: Path, bytes: Array[Byte]): Unit
}

/** Default [[LogStore]]: stage to a dot-prefixed temp file in the
  * target's directory (readers filter dot-files), then atomically
  * hard-link to the target name. Atomic and race-safe on POSIX and
  * HDFS-semantics filesystems; NOT correct on S3-class object stores
  * (see the [[LogStore]] deployment matrix).
  */
object HardLinkLogStore extends LogStore {
  override def putIfAbsent(target: Path, bytes: Array[Byte]): Unit = {
    val dir = target.getParent
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp-${UUID.randomUUID()}")
    Files.write(tmp, bytes)
    try Files.createLink(target, tmp)
    finally { Files.deleteIfExists(tmp); () }
  }
}
