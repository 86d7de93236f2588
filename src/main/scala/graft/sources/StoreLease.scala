package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

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
  * subdirectories anyway), holding `owner|expiresAtEpochMs|verb` with
  * `owner = pid@host#nonce`. Acquisition is `CREATE_NEW` — atomic on
  * POSIX and HDFS-like stores — followed by a read-back confirming the
  * hold survived any racing stealer. A holder is DEAD when its lease
  * expired, when its recorded pid verifiably no longer runs on THIS host
  * (crash recovery without waiting out the TTL — a replayed streaming
  * batch must heal immediately, not crash-loop for 15 minutes), or when
  * the lock file is unreadable AND older than the TTL (a writer
  * mid-write has a fresh mtime and is treated as LIVE — never steal what
  * can't be read unless it is too old to still be being written). Steals
  * are arbitrated by an ATOMIC_MOVE of the dead lock to a unique debris
  * name — exactly one racing stealer's rename succeeds — and announced
  * loudly on stderr. The documented recovery for a crashed holder is
  * therefore: same host — automatic; different host — wait out the TTL
  * (or delete the lock by hand after confirming the holder is dead);
  * the verbs' own crash-window machinery heals the half-applied state.
  *
  * Scope and honesty: the lease defends the VERBS' mutation windows
  * against each other on stores with atomic create/rename; a residual
  * hairline window exists between a stealer's liveness re-check and its
  * rename (filesystems have no compare-and-swap), which is why this is
  * an operational guard against concurrent-writer MISTAKES, not a
  * distributed lock service. It is advisory against writers that bypass
  * the verb API, and on stores without atomic create it degrades to
  * best-effort — route this seam to the deployment's lock service there,
  * the same way [[CommitProtocol]] routes the swap.
  */
object StoreLease {

  val LockFileName = "_writer.lock"

  /** Default lease lifetime. Long enough for any single verb at the
    * engine's scale rehearsal sizes ×100; short enough that a crashed
    * REMOTE holder (same-host crashes steal immediately via the pid
    * liveness check) does not block a day's maintenance window.
    */
  val DefaultTtlMs: Long = 15L * 60L * 1000L

  private def lockPath(storePath: String): Path =
    Paths.get(storePath, LockFileName)

  /** Run `f` (one store verb) holding the store's writer lease.
    * Loud `IllegalStateException` when another writer holds a live lease;
    * loud steal (stderr) when the held lease is dead. After `f`, the
    * release deletes the lock ONLY if it still carries THIS acquisition's
    * owner AND is unexpired — an expired own lock is left in place (a
    * stealer may be acting on it) and the verb raises instead of
    * returning success, because once the TTL lapsed a second writer may
    * have interleaved (run `recertifyShards` and re-check the store
    * before trusting it; raise the ttl for verbs this long).
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
        case Some((o, expiresAt, _)) if o == owner && expiresAt >= now =>
          Files.deleteIfExists(lock)
        case other =>
          val what = other match {
            case Some((o, _, _)) if o == owner =>
              // ours but EXPIRED: leave the file — deleting it here could
              // erase a racing stealer's claim mid-steal, and the lapse
              // itself must be reported either way
              "EXPIRED while held (left in place for stealers)"
            case Some((o, _, _)) => s"stolen by $o"
            case None => "released/unreadable"
          }
          val msg =
            s"StoreLease: lease on $storePath lost mid-verb '$verb' — this writer's " +
              s"hold (owner $owner) is $what after exceeding its ${ttlMs}ms TTL " +
              s"(now=$now). A second writer may have interleaved with this verb's " +
              "writes: run recertifyShards and re-verify the store before trusting " +
              "it; raise the ttl for verbs this long."
          if (failed) System.err.println(s"[store-lease] $msg")
          else throw new IllegalStateException(msg)
      }
    }
  }

  /** `owner|expiresAtMs|verb` parsed from the lock file; None when absent
    * or torn. Torn files are stealable only via the mtime rule in
    * [[acquire]].
    */
  private def readHolder(lock: Path): Option[(String, Long, String)] =
    try {
      val parts = Files.readString(lock).trim.split('|')
      if (parts.length == 3) Some((parts(0), parts(1).toLong, parts(2))) else None
    } catch { case _: Exception => None }

  /** True when `owner` (pid@host#nonce) names a pid on THIS host that
    * verifiably no longer runs — the crashed-holder fast path. A foreign
    * host or an unparseable owner is never "dead" by this check (the TTL
    * handles those).
    */
  private def holderDeadOnThisHost(owner: String): Boolean = {
    val at = owner.indexOf('@')
    val hash = owner.indexOf('#')
    if (at <= 0 || hash <= at) return false
    val host = owner.substring(at + 1, hash)
    if (host != localHost) return false
    try {
      val pid = owner.substring(0, at).toLong
      ProcessHandle.of(pid).isEmpty
    } catch { case _: NumberFormatException => false }
  }

  private lazy val localHost: String = java.net.InetAddress.getLocalHost.getHostName

  private def acquire(lock: Path, verb: String, ttlMs: Long): String = {
    Files.createDirectories(lock.toAbsolutePath.getParent)
    val owner =
      s"${ProcessHandle.current().pid()}@$localHost" +
        s"#${java.lang.Long.toHexString(System.nanoTime())}"
    var attempts = 0
    while (attempts < 8) {
      attempts += 1
      val content = s"$owner|${System.currentTimeMillis() + ttlMs}|$verb"
      val won =
        try {
          Files.write(lock, content.getBytes(UTF_8), StandardOpenOption.CREATE_NEW)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      if (won) {
        // confirm the hold survived: a racer acting on a stale expired
        // read could have clobbered the fresh lock between our create and
        // now — re-read and only claim the lease if it still names us
        if (readHolder(lock).exists(_._1 == owner)) return owner
        // else fall through: live contention, retry the loop
      } else {
        val now = System.currentTimeMillis()
        val held = readHolder(lock)
        held match {
          case Some((heldOwner, expiresAt, heldVerb))
              if expiresAt >= now && !holderDeadOnThisHost(heldOwner) =>
            throw new IllegalStateException(
              s"StoreLease: store at ${lock.getParent} is held by writer $heldOwner " +
                s"(verb '$heldVerb', lease live for another ${expiresAt - now}ms) — " +
                "a second concurrent writer would interleave ledger rows and manifest " +
                "splices undetectably, so this verb refuses to start. If the holder " +
                s"crashed, its lease expires on its own; deleting ${lock.getFileName} " +
                "by hand is safe ONLY after confirming no writer is running.")
          case None if mtimeWithin(lock, ttlMs, now) =>
            // torn but FRESH: a writer is likely mid-create — a live hold
            throw new IllegalStateException(
              s"StoreLease: store at ${lock.getParent} holds an unreadable but " +
                "recently-written lock — treating it as a LIVE writer mid-acquire. " +
                "Retry; if it persists past the ttl it becomes stealable.")
          case _ =>
            // DEAD holder: expired lease, a verifiably-dead same-host pid,
            // or a torn file older than the ttl. Steal via ATOMIC_MOVE to
            // a unique debris name — exactly one racing stealer's rename
            // succeeds; losers loop and re-evaluate the fresh lock.
            // Re-read first: if the state changed since `held`, act on the
            // new state next iteration instead of renaming a fresh lock.
            if (readHolder(lock) == held) {
              val aside = lock.resolveSibling(
                s".${lock.getFileName}_stolen_${java.lang.Long.toHexString(System.nanoTime())}")
              try {
                Files.move(lock, aside, StandardCopyOption.ATOMIC_MOVE)
                System.err.println(
                  s"[store-lease] stole dead lease on ${lock.getParent}: " +
                    s"${held.fold("unreadable stale holder")(h =>
                      s"holder ${h._1} (verb '${h._3}', expiry ${h._2}, " +
                        s"${if (holderDeadOnThisHost(h._1)) "pid dead on this host" else "expired"})")} " +
                    s"(now=$now, stealer=$owner, verb '$verb'). If the dead holder " +
                    "crashed mid-verb, this verb's crash-window machinery heals its debris.")
                Files.deleteIfExists(aside)
              } catch { case _: java.nio.file.NoSuchFileException => () } // another stealer won
            }
        }
      }
    }
    throw new IllegalStateException(
      s"StoreLease: lost the acquisition race on $lock 8 times — live contention; " +
        "refusing to spin (a second writer is actively working this store)")
  }

  /** True when the lock's mtime is younger than `ttlMs` — i.e. it could
    * still be being written. A vanished file reads as "not fresh" (the
    * caller loops and re-evaluates).
    */
  private def mtimeWithin(lock: Path, ttlMs: Long, now: Long): Boolean =
    try Files.getLastModifiedTime(lock).toMillis > now - ttlMs
    catch { case _: Exception => false }
}
