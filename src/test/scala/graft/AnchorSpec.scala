package graft

import org.scalatest.funsuite.AnyFunSuite

/** Anchor-maintenance hygiene (VERDICT r13 #7): the bench's absolute
  * noise-adjudication rider ([[graft.Bench]]) only fires for queries with
  * a committed steady-state anchor in [[graft.bench.SteadyState]]. A gate
  * shipped without an anchor silently opts out of adjudication — e17's
  * round-13 cold-corpus demo showed exactly that failure mode (the rider
  * needed the anchor to contest a 12.75 s first-touch line). This spec
  * makes the omission build-breaking in both directions: every
  * `SparkEntry.queries` key must carry an anchor, and every anchor must
  * name a live query (a stale anchor for a renamed gate would anchor
  * nothing while looking maintained).
  */
class AnchorSpec extends AnyFunSuite {
  test("every SparkEntry.queries key has a committed SteadyState anchor") {
    val missing = SparkEntry.queries.keySet -- graft.bench.SteadyState.sec.keySet
    assert(missing.isEmpty,
      s"gates without a steady-state anchor (measure with an isolated " +
        s"SPARK_GRAFT_REPEAT=2 run and commit to SteadyState.sec): " +
        missing.toSeq.sorted.mkString(", "))
  }

  test("every SteadyState anchor names a live query") {
    val stale = graft.bench.SteadyState.sec.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"anchors for queries that no longer exist (remove or rename): " +
        stale.toSeq.sorted.mkString(", "))
  }

  test("anchors are positive and plausibly coarse") {
    val bad = graft.bench.SteadyState.sec.filter { case (_, s) => s <= 0.0 || s > 600.0 }
    assert(bad.isEmpty, s"implausible anchors: $bad")
  }

  test("sf1 anchors name live queries and are positive (round 16)") {
    // the sf1 set is allowed to be SPARSE (an anchorless query never
    // flags, like a new gate on the sf0.1 path) but never STALE — and
    // staleness is the failure hygiene exists for, since the sf1 rider
    // runs once a round at most
    val stale = graft.bench.SteadyState.sf1Sec.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"sf1 anchors for queries that no longer exist: ${stale.toSeq.sorted.mkString(", ")}")
    val bad = graft.bench.SteadyState.sf1Sec.filter { case (_, s) => s <= 0.0 || s > 600.0 }
    assert(bad.isEmpty, s"implausible sf1 anchors: $bad")
  }
}
