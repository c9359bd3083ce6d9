package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-joins for hot keys.
  *
  * A shuffle join sends every row of one key to ONE reducer; a key holding
  * 1% of a 100 TB input puts 1 TB on a single task. Salting spreads it:
  * each left row gets a salt in [0, buckets), the right side is replicated
  * once per salt value, and the join runs on (key, salt) — the hot key's
  * rows land on `buckets` reducers at the cost of a `buckets`-fold
  * replication of the (smaller) right side. AQE's runtime skew-join covers
  * sort-merge joins automatically; this utility is for when that cannot
  * kick in (custom partitionings, non-SMJ paths, or skew known up front).
  */
object Skew {

  /** Inner equi-join on `key`, resilient to skew in the LEFT key
    * distribution. Join multiplicity is preserved: each left row carries
    * exactly one salt, so it meets each matching right row exactly once
    * (in that salt's replica).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // withColumn would silently replace a pre-existing __salt
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedJoin: inputs must not already have a __salt column")
    // salt from spread bits of the row id: uniform enough to split a hot
    // key, and the JOIN RESULT is salt-independent either way
    val l = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets.toLong)))
    val r = right.withColumn("__salt",
      explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
