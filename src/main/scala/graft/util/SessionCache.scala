package graft.util

import org.apache.spark.sql.SparkSession

/** One-per-(session, key) memoization for expensive shared artifacts (the
  * gate graph, the parsed mail corpus, the near-dup pair set). Keyed by
  * `applicationId` — unique per SparkContext, unlike `hashCode`, so a
  * stopped context's entry can never be handed to a new context that
  * happens to collide. Unbounded by design: keys are a handful of
  * per-process fixtures, not user data.
  */
final class SessionCache[T] {
  private val map = scala.collection.concurrent.TrieMap[String, T]()
  def apply(spark: SparkSession, key: String)(build: => T): T =
    map.getOrElseUpdate(s"${spark.sparkContext.applicationId}|$key", build)
}
