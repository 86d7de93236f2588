package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Writer LEASE for an on-disk store directory (r15 verdict #2): turns
  * the shard store's "single-writer" docstring convention into a checked
  * invariant. Every mutating store verb
  * ([[graft.operators.SequencePacking]]'s export/append/retract/compact/
  * recertify) runs under [[withLease]]; a second concurrent writer —
  * another job's append racing a takedown from a different driver — fails
  * LOUDLY at acquisition instead of silently interleaving pending
  * markers, ledger rows, and manifest splices.
  *
  * Mechanics: one `_writer.lock` file at the store root (underscore
  * prefix — invisible to every parquet read, which all target
  * subdirectories anyway), holding `owner|expiresAtEpochMs|verb`.
  * Acquisition is `CREATE_NEW` — atomic on POSIX and HDFS-like stores, so
  * two racers cannot both win. The lease EXPIRES: a holder that crashed
  * mid-verb stops blocking the store after `ttlMs`, and the next writer
  * STEALS the lock loudly (stderr names the dead holder) — the documented
  * recovery for a crashed holder is therefore "wait out the TTL (or
  * delete the lock after confirming the holder is dead), then re-run;
  * the verbs' own crash-window machinery heals the half-applied state".
  *
  * Scope and honesty: the lease defends the VERBS' mutation windows
  * against each other. It is advisory against writers that bypass the
  * verb API, and on stores without atomic create (plain object stores)
  * it degrades to best-effort — route this seam to the deployment's lock
  * service there, the same way [[CommitProtocol]] routes the swap.
  */
object StoreLease {

  val LockFileName = "_writer.lock"

  /** Default lease lifetime. Long enough for any single verb at the
    * engine's scale rehearsal sizes ×100; short enough that a crashed
    * holder does not block a day's maintenance window.
    */
  val DefaultTtlMs: Long = 15L * 60L * 1000L

  private def lockPath(storePath: String): Path =
    Paths.get(storePath, LockFileName)

  /** Run `f` (one store verb) holding the store's writer lease.
    * Loud `IllegalStateException` when another writer holds a live lease;
    * loud steal (stderr) when the held lease is expired. After `f`, the
    * release checks the lock still carries THIS acquisition's owner — a
    * verb that outlived its TTL and was stolen from raises instead of
    * returning success, because a second writer may have interleaved
    * (run `recertifyShards` and re-check the store before trusting it).
    */
  def withLease[T](storePath: String, verb: String, ttlMs: Long = DefaultTtlMs)(f: => T): T = {
    require(ttlMs > 0L, s"lease ttl must be positive, got $ttlMs")
    val lock = lockPath(storePath)
    val owner = acquire(lock, verb, ttlMs)
    var failed = false
    try f
    catch { case e: Throwable => failed = true; throw e }
    finally {
      val now = System.currentTimeMillis()
      val held = readHolder(lock)
      held match {
        case Some((o, _, _)) if o == owner =>
          Files.deleteIfExists(lock)
        case other =>
          val msg =
            s"StoreLease: lease on $storePath lost mid-verb '$verb' — this writer's " +
              s"hold (owner $owner) was ${other.fold("released")(h => s"stolen by ${h._1}")} " +
              s"after exceeding its ${ttlMs}ms TTL (now=$now). A second writer may have " +
              "interleaved with this verb's writes: run recertifyShards and re-verify " +
              "the store before trusting it; raise the ttl for verbs this long."
          if (failed) System.err.println(s"[store-lease] $msg")
          else throw new IllegalStateException(msg)
      }
    }
  }

  /** `owner|expiresAtMs|verb` parsed from the lock file; None when absent
    * or torn (a torn read is treated as a live hold by the caller — never
    * steal what can't be read).
    */
  private def readHolder(lock: Path): Option[(String, Long, String)] =
    try {
      val parts = Files.readString(lock).trim.split('|')
      if (parts.length == 3) Some((parts(0), parts(1).toLong, parts(2))) else None
    } catch { case _: Exception => None }

  private def acquire(lock: Path, verb: String, ttlMs: Long): String = {
    Files.createDirectories(lock.toAbsolutePath.getParent)
    val owner =
      s"${ProcessHandle.current().pid()}@${java.net.InetAddress.getLocalHost.getHostName}" +
        s"#${java.lang.Long.toHexString(System.nanoTime())}"
    var attempts = 0
    while (true) {
      attempts += 1
      val content = s"$owner|${System.currentTimeMillis() + ttlMs}|$verb"
      try {
        Files.write(lock, content.getBytes(UTF_8), StandardOpenOption.CREATE_NEW)
        return owner
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val now = System.currentTimeMillis()
          readHolder(lock) match {
            case Some((heldOwner, expiresAt, heldVerb)) if expiresAt >= now =>
              throw new IllegalStateException(
                s"StoreLease: store at ${lock.getParent} is held by writer $heldOwner " +
                  s"(verb '$heldVerb', lease live for another ${expiresAt - now}ms) — " +
                  "a second concurrent writer would interleave ledger rows and manifest " +
                  "splices undetectably, so this verb refuses to start. If the holder " +
                  s"crashed, its lease expires on its own; deleting ${lock.getFileName} " +
                  "by hand is safe ONLY after confirming no writer is running.")
            case held =>
              // expired (or vanished mid-read, or torn past recognition —
              // readHolder's None only reaches here when CREATE_NEW said the
              // file exists, so a torn file counts as a dead holder too):
              // steal LOUDLY; the CREATE_NEW retry arbitrates racing stealers
              require(attempts <= 5,
                s"StoreLease: lost the steal race on $lock $attempts times — " +
                  "live contention; refusing to spin")
              System.err.println(
                s"[store-lease] stealing expired lease on ${lock.getParent}: " +
                  s"${held.fold("unreadable holder")(h => s"holder ${h._1} (verb '${h._3}') expired at ${h._2}")} " +
                  s"(now=$now, stealer=$owner, verb '$verb'). If the dead holder crashed " +
                  "mid-verb, this verb's crash-window machinery heals its debris.")
              Files.deleteIfExists(lock)
          }
      }
    }
    sys.error("unreachable")
  }
}
