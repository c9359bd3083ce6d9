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

  test("sf1 anchor-set selection matches an exact token, never a substring (r17)") {
    import graft.bench.SteadyState
    // ADVICE r16: contains("sf1") would adjudicate "sf10"/"mysf1x" dirs
    // against sf1 anchors and could flip a future sf0.1-variant name
    assert(SteadyState.anchorsFor("sf1") eq SteadyState.sf1Sec)
    assert(SteadyState.anchorsFor("graft_sf1_full") eq SteadyState.sf1Sec)
    assert(SteadyState.anchorsFor("sf0.1") eq SteadyState.sec)
    assert(SteadyState.anchorsFor("sf10") eq SteadyState.sec)
    assert(SteadyState.anchorsFor("mysf1x") eq SteadyState.sec)
  }

  test("rerun band is anchor-aware: 2.0x for anchors >= 2 s, 2.5x below, overrides win (r17)") {
    import graft.bench.SteadyState
    // VERDICT r16 #2: the flat 2.5x band let t6 (anchor 4.40, ratio 2.17)
    // and t35 (anchor 3.46, ratio 2.37) ride as ~10 s of load smear
    val big = SteadyState.sec.collect { case (n, a) if a >= 2.0 => n }
    val small = SteadyState.sec.collect {
      case (n, a) if a < 2.0 && !SteadyState.adjMult.contains(n) => n }
    assert(big.nonEmpty && small.nonEmpty, "band test needs both anchor classes")
    big.filterNot(SteadyState.adjMult.contains)
      .foreach(n => assert(SteadyState.multOf(n) === 2.0, n))
    small.foreach(n => assert(SteadyState.multOf(n) === 2.5, n))
    assert(SteadyState.multOf("a22_betweenness") === 1.3) // measured override wins
    assert(SteadyState.multOf("no_such_anchor") === 2.5) // anchorless: wide band
    // the sf1 path applies the same band against sf1 anchors
    val sf1Big = SteadyState.sf1Sec.collect { case (n, a) if a >= 2.0 => n }
    assert(sf1Big.nonEmpty)
    sf1Big.foreach(n => assert(SteadyState.multFor("sf1")(n) === 2.0, n))
  }

  test("exact-tier set names live queries (r17)") {
    // a stale exact-tier entry would silently misreport the scale-tier
    // split; a renamed gate must be renamed here too
    val stale = graft.bench.SteadyState.exactTier -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"exact-tier entries without a live query: $stale")
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
