package graft.config

/** Runtime-overridable scale thresholds — the broadcast-vs-distributed
  * cutovers that decide which physical plan the near-dup family takes.
  *
  * Why system properties and not constants: the >cap fallback paths
  * (blocked DataFrame sweep in [[graft.queries.VectorOps.exactSweepRepPairs]],
  * dedup-first + shuffle attach in [[graft.queries.VectorOps.verifiedRepPairs]]
  * and `TextOps.setSimStages`) are the plans a 1000-executor deploy
  * actually runs, but no locally-affordable corpus naturally crosses
  * the production caps (x100 tops out at exactly 200k reps; the q142
  * x100 probe exceeds this box's spill disk). FuzzBench's fallback
  * phase lowers these knobs on the existing x30 corpora so both
  * fallbacks run, are timed, and are recall-gated every round —
  * instead of staying spec-proven but probe-unexercised.
  *
  * Defaults are the production values; nothing outside the probes
  * should ever set the properties.
  */
object ScaleKnobs {
  val RepsProp = "graft.scale.maxBroadcastReps"
  val SetsProp = "graft.scale.maxBroadcastSets"

  /** Rep-vector broadcast cap (~128 MB of 64-dim vectors). */
  def maxBroadcastReps: Long = longProp(RepsProp, 250000L)

  /** Token-set broadcast-attach row cap (the byte budget is checked
    * separately at the call site from measured set sizes). */
  def maxBroadcastSets: Long = longProp(SetsProp, 200000L)

  private def longProp(name: String, dflt: Long): Long =
    sys.props.get(name).map(_.toLong).getOrElse(dflt)

  /** Run `body` with both caps lowered, restoring prior values after —
    * the FuzzBench fallback phase's scoping helper. */
  def withLoweredCaps[A](reps: Long, sets: Long)(body: => A): A = {
    val prior = Seq(RepsProp, SetsProp).map(p => p -> sys.props.get(p))
    sys.props(RepsProp) = reps.toString
    sys.props(SetsProp) = sets.toString
    try body
    finally prior.foreach {
      case (p, Some(v)) => sys.props(p) = v
      case (p, None) => sys.props -= p
    }
  }
}
