package graft.util

import org.apache.spark.sql.SparkSession

/** Bounded per-(session, key) memoization for expensive shared artifacts
  * (the gate graph, the parsed mail corpus, the near-dup pair set). Keyed
  * by `applicationId` — unique per SparkContext, unlike `hashCode`, so a
  * stopped context's entry can never be handed to a new context that
  * happens to collide.
  *
  * Originally unbounded ("keys are a handful of per-process fixtures"),
  * but several users key on a data DIRECTORY — in a long-lived session
  * touching many dirs that is user-data-dependent growth, the same
  * unbounded-cache pattern fixed for GraphAnalytics.toGraphX. So:
  *
  *  - LRU-bounded at `maxEntries`; eviction calls `onEvict` (unpersist for
  *    DataFrame/graph caches; no-op for scalar caches), Try-guarded — an
  *    entry whose SparkContext already stopped must not throw from inside
  *    a NEW session's insert;
  *  - entries from OTHER applications are purged on insert (their context
  *    is gone in sequential-session test JVMs), and the purge ALSO calls
  *    `onEvict` (ADVICE r18): for cached DataFrames the Try guard absorbs
  *    the dead-context unpersist, but DISK-backed entries (the triangle-set
  *    parquet, the staged stream chunks) hold artifacts that outlive the
  *    context and leak across sequential sessions unless eviction
  *    releases them;
  *  - eviction drops the cached handle only, never correctness: builders
  *    are pure, a late caller just rebuilds.
  */
final class SessionCache[T](maxEntries: Int = 16, onEvict: T => Unit = (_: T) => ()) {
  private val map = new java.util.LinkedHashMap[String, T](16, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, T]): Boolean = {
      val evict = size() > maxEntries
      if (evict) scala.util.Try(onEvict(e.getValue))
      evict
    }
  }
  def apply(spark: SparkSession, key: String)(build: => T): T = {
    val appPrefix = s"${spark.sparkContext.applicationId}|"
    val k = appPrefix + key
    map.synchronized(Option(map.get(k))).getOrElse {
      val v = build // built OUTSIDE the lock: builders run Spark jobs
      map.synchronized {
        val it = map.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (!e.getKey.startsWith(appPrefix)) {
            scala.util.Try(onEvict(e.getValue)); it.remove()
          }
        }
        Option(map.get(k)) match {
          case Some(prior) => scala.util.Try(onEvict(v)); prior // concurrent winner keeps
          case None => map.put(k, v); v
        }
      }
    }
  }
}
