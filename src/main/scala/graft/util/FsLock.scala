package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Mutual exclusion via an exclusive-create lock file on the Hadoop
  * filesystem that owns the path — the cheap enforcement of a
  * single-writer contract (used by the streaming name→id dictionary's
  * max(id)+append block assignment, Loaders.streamCSVEdgesNamed).
  *
  * Honest limits: `FileSystem.create(overwrite=false)` is atomic on HDFS
  * (namenode-arbitrated); Hadoop's LOCAL wrapper implements it as
  * check-then-create, so on a local filesystem two writers racing within
  * microseconds could both pass — adequate for the single-host
  * test/driver environment this guards, where concurrent writers are
  * misconfiguration, not throughput. Object stores without conditional
  * writes make it best-effort only — at production scale a table
  * format's commit protocol replaces this. A crashed holder leaves the
  * lock behind by design (fail loud, point at the file) rather than
  * auto-expiring: a TTL that guesses wrong re-admits the
  * overlapping-id-block corruption the lock exists to prevent. */
object FsLock {
  def withLock[T](spark: SparkSession, lockPath: String, what: String)(body: => T): T = {
    val p = new Path(lockPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out =
      try fs.create(p, /*overwrite=*/ false)
      catch {
        case e: java.io.IOException =>
          throw new IllegalStateException(
            s"$what: lock $lockPath is already held — a concurrent writer would read the same " +
              s"max(id) and assign overlapping id blocks (single-writer contract). If the " +
              s"holder crashed, delete the lock file and restart.", e)
      }
    try {
      out.writeBytes(s"pid=${ProcessHandle.current().pid()} epochMs=${System.currentTimeMillis()}\n")
      out.close()
      body
    } finally scala.util.Try(fs.delete(p, false))
  }
}
