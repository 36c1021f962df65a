package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** One-writer-per-path guard — the Spark-side translation of the
  * reference's upload locking (`bde_CreateUpload`,
  * `sql/02-bde_control_functions.sql.in:270`, takes an advisory lock per
  * job; `bde_ReleaseExpiredLocks`, `:165`, breaks locks whose session
  * died).
  *
  * PG advisory locks don't exist on a filesystem, so the lock is an atomic
  * `create(..., overwrite=false)` of a marker file carrying
  * `owner|epochMillis`. HDFS and local filesystems give this
  * create-if-absent atomicity; an S3-backed production deployment would
  * swap in a conditional-put or a coordination service — the API is the
  * same. Locks older than `ttlMs` are considered abandoned (zombie job)
  * and may be broken by the next acquirer, mirroring the expired-lock
  * release.
  */
object JobLock {

  private def lockPath(dir: String) = new Path(dir, "_graft_lock")

  /** Try to take the lock; returns true on success. A stale lock (older
    * than `ttlMs`) is broken and re-acquired.
    */
  def acquire(dir: String, owner: String, ttlMs: Long,
              conf: Configuration = new Configuration()): Boolean = {
    val p = lockPath(dir)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(new Path(dir))
    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false)
        out.write(s"$owner|${System.currentTimeMillis()}"
          .getBytes(StandardCharsets.UTF_8))
        out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (tryCreate()) true
    else holder(dir, conf) match {
      case Some((_, ts)) if System.currentTimeMillis() - ts > ttlMs =>
        // Zombie: break by RENAMING the stale marker (atomic), not by
        // check-then-delete — two acquirers can both observe the zombie,
        // but only one rename succeeds, so only one breaker proceeds and
        // nobody can delete a freshly re-acquired lock out from under its
        // owner.
        val tomb = new Path(dir,
          s"_graft_lock_broken_${java.util.UUID.randomUUID()}")
        if (fs.rename(p, tomb)) { fs.delete(tomb, false); tryCreate() }
        else false
      case None => tryCreate() // released between the attempts
      case _ => false
    }
  }

  /** Current (owner, epochMillis), if locked. */
  def holder(dir: String,
             conf: Configuration = new Configuration()): Option[(String, Long)] = {
    val p = lockPath(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val txt = new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          StandardCharsets.UTF_8)
        val i = txt.lastIndexOf('|')
        Some((txt.substring(0, i), txt.substring(i + 1).trim.toLong))
      } finally in.close()
    }
  }

  /** Release the lock if held by `owner`; returns true if released. */
  def release(dir: String, owner: String,
              conf: Configuration = new Configuration()): Boolean =
    holder(dir, conf) match {
      case Some((o, _)) if o == owner =>
        val p = lockPath(dir); p.getFileSystem(conf).delete(p, false)
      case _ => false
    }

  /** Run `f` under the lock; throws if another live owner holds it. */
  def withLock[T](dir: String, owner: String, ttlMs: Long = 3600000L,
                  conf: Configuration = new Configuration())(f: => T): T = {
    if (!acquire(dir, owner, ttlMs, conf))
      throw new IllegalStateException(
        s"$dir is locked by ${holder(dir, conf).map(_._1).getOrElse("?")}")
    try f finally release(dir, owner, conf)
  }
}
