package graft.tools

/** Per-round REALISTIC-corpus regression gate for the text near-dup
  * family — FuzzBench's sibling on the Zipfian `RealisticCorpus`
  * table instead of the 31-token synthetic documents.
  *
  * Why both exist: the synthetic corpus is adversarially DENSE (every
  * shingle shared, lengths uniform), so it stresses raw candidate
  * volume; the realistic corpus has the statistics that make the
  * algorithms' selectivity claims falsifiable — rare-first prefixes
  * must actually be selective, the PPJoin length filter must actually
  * prune, and the planted 8-token boilerplate headers must NOT fan
  * the candidate join out. This gate asserts those claims with two
  * guard families:
  *
  *  - per-query x30/x10 wall ceilings: q19/q114 are ~linear here;
  *    q142's OUTPUT is quadratic in the replication factor by
  *    construction (fuzz mode turns each near-dup cluster into a
  *    factor-sized clique: 3x factor = ~9x pairs), so its ceiling is
  *    the q44-style 12x, with the selectivity claim gated separately;
  *  - the boilerplate-resistance ceiling (ScaleBench's SETSIM audit,
  *    arg 8): candidates-per-true-pair at both factors — the direct
  *    measurement of "shared headers rank last in the canonical
  *    order" — plus an un-gated cross-origin candidate-pair count
  *    (pairs whose members come from different ORIGINAL docs, the
  *    exact population a header fanout would create). Dense-corpus
  *    batteries emit the metrics un-gated; here the ratio FAILS the
  *    round past the ceiling.
  *
  * Usage: runMain graft.tools.RealBench [roundLabel] [srcDir]
  * Writes BENCH_real_<roundLabel>.json (plus ScaleBench's own
  * BENCH_real_x10/x30.json + PLANS_real_*.md); exits nonzero on any
  * guard failure.
  */
object RealBench {
  private val family = Seq("q19_minhash_lsh", "q114_fuzzy_decon", "q142_set_sim_join")
  private val ratioCeil: Map[String, Double] = Map(
    "q19_minhash_lsh" -> 6.0,
    "q114_fuzzy_decon" -> 5.0,
    // output-quadratic under fuzzed replication (cliques grow with the
    // factor: ~9x pairs for 3x data); measured r08 calm ratio 7.4 —
    // 12x means candidate generation itself went super-quadratic
    "q142_set_sim_join" -> 12.0)
  // candidates-per-true-pair ceiling: the candidate stream carries one
  // row per (pair, shared prefix token), and fuzz copies of the same
  // original share ~45-50 RARE shingles in their prefixes — measured
  // 45.8 (x10) and 48.5 (x30), factor-stable, i.e. candidates scale
  // WITH true pairs. What must never happen is candidates WITHOUT
  // pairs behind them: if the 8-token boilerplate headers (30% of
  // docs) entered the rare-first prefixes, unrelated docs would pair
  // up and the ratio would read ~700+. 150 = 3x the measured
  // multiplicity, an order of magnitude under the failure mode.
  private val candPerPairCeil = 150.0

  def main(args: Array[String]): Unit = {
    val fails = run(args)
    if (fails.nonEmpty) {
      fails.foreach(f => System.err.println(s"[realbench] $f"))
      sys.exit(1)
    }
  }

  /** Composable entry (RoundArtifacts chains the per-round gates in
    * one JVM): returns the guard failures instead of exiting. */
  def run(args: Array[String]): Seq[String] = {
    val round = args.lift(0).getOrElse("r0X")
    val srcDir = args.lift(1).getOrElse("/tmp/graft_realistic_src")
    // fingerprint check, not mere existence: a corpus left behind by an
    // OLDER RealisticCorpus version (or a partial write) must not
    // silently feed the gate — the same stale-input class GitStamp
    // closes for artifacts. Regeneration is cheap and deterministic
    // (same args -> byte-identical rows).
    if (!RealisticCorpus.isCurrent(srcDir)) {
      RealisticCorpus.main(Array(srcDir))
    }
    val fam = family.mkString(",")
    val fails = scala.collection.mutable.ArrayBuffer.empty[String]

    def probe(factor: Int): ScaleBench.ScaleResult = {
      val r = ScaleBench.run(Array(srcDir, factor.toString,
        s"/tmp/graft_real_x$factor", s"real_x$factor", fam,
        "documents", "fuzz", candPerPairCeil.toString))
      fails ++= r.guardFails.map(f => s"x$factor $f")
      r
    }

    val r10 = probe(10)
    val r30 = probe(30)
    val t10 = r10.queries.toMap
    val t30 = r30.queries.toMap
    val ratios = family.flatMap { q =>
      (t10.get(q), t30.get(q)) match {
        case (Some(a), Some(b)) if a > 0 && b > 0 =>
          val ratio = b / a
          if (ratio > ratioCeil(q))
            fails += f"RATIO FAIL $q: x30/x10 = $ratio%.2f > ceiling ${ratioCeil(q)}%.1f"
          Some(q -> ratio)
        case _ =>
          fails += s"RATIO FAIL $q: missing or failed at one factor"
          None
      }
    }

    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def fmt(m: Seq[(String, Double)]) =
      m.map { case (k, v) => s""""$k":${r3(v)}""" }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"real_family","round":"$round","x10_total":${r10.total},"x30_total":${r30.total},""" +
        s""""x10":${fmt(family.flatMap(q => t10.get(q).map(q -> _)))},""" +
        s""""x30":${fmt(family.flatMap(q => t30.get(q).map(q -> _)))},""" +
        s""""ratio_x30_x10":${fmt(ratios)},""" +
        s""""cand_per_pair_ceiling":$candPerPairCeil,""" +
        s""""guard_fails":[${fails.map(f => "\"" + f.replace("\"", "'") + "\"").mkString(",")}]${GitStamp.jsonField}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"BENCH_real_$round.json"), json + "\n")
    println(json)
    fails.toSeq
  }
}
