package graft.tools

/** Per-round fuzzed-replication regression gate for the near-dup
  * family — the probe that caught round 5's ENOSPC defect, promoted
  * from a hand-run artifact into one command the round cadence runs
  * and commits (`BENCH_fuzz_r0N.json`).
  *
  * Exact replication flatters dedup (the exact-first collapse absorbs
  * every copy); fuzz mode perturbs each replica so the banding/prefix
  * machinery itself carries the load. This tool runs the family at
  * x10 and x30 on the SAME perturbed corpora (materialized once,
  * `_SUCCESS`-guarded) and gates on the two properties a banding
  * regression would break long before the sf0.1 battery noticed:
  *
  *  - planted-pair recall at every factor. Since round 7 the audited
  *    query (q44, tau=0.30) runs the EXACT DenseSweep kernel, which is
  *    lossless by contract — the floor here is exactly 1.0, matching
  *    ScaleBench's own sweep guard (a 0.94 would mean the margin/
  *    re-verify arithmetic broke, not that banding got unlucky);
  *  - the x30/x10 wall ratio per query under a conservative ceiling —
  *    3x data costing > ~6x wall means candidate generation went
  *    super-quadratic (q142 pre-positional-filter measured ~9x).
  *    q44's ceiling is documented-looser rather than silently
  *    excluded: the sweep visits all rep pairs by design, so its work
  *    grows ~9x for 3x reps (quadratic), and the measured x30/x10
  *    wall is ~2.8 (the exact-verify stage is output-bound).
  *
  * Since round 9 the run ends with a FALLBACK phase: the three
  * cap-guarded queries rerun on the x30 corpus with
  * [[graft.config.ScaleKnobs]] lowered under the corpus size, so the
  * blocked sweep and both dedup-first shuffle-attach fallbacks — the
  * plans a real cluster deploy takes — execute, are timed, and are
  * gated (engagement, output equality, recall, wall ceiling) every
  * round instead of staying spec-proven but probe-unexercised.
  *
  * Usage: runMain graft.tools.FuzzBench [roundLabel] [srcDir]
  * Writes BENCH_fuzz_<roundLabel>.json; exits nonzero on any guard
  * failure (recall floor, throughput floor, ratio ceiling, fallback
  * guard, query error) so a driver/CI invocation fails loudly.
  */
object FuzzBench {
  private val family = Seq("q19_minhash_lsh", "q44_embed_neardup",
    "q114_fuzzy_decon", "q121_neardup_hightau", "q142_set_sim_join")
  // x30/x10 wall ceilings for 3x data: linear-ish families get 6x
  // (2x the ideal 3, under half the known-bad 9.67x regression shape);
  // q44's exact sweep is quadratic in reps BY CONSTRUCTION (3x reps =
  // 9x swept pairs — the scaladoc on DenseSweep measures why nothing
  // sub-quadratic exists at tau=0.30), so its ceiling stays at the
  // theoretical 9x plus headroom = 12x; the measured calm-machine
  // ratio is ~2.8 because the exact-verify stage is output-bound,
  // so a trip of this ceiling still means a real regression.
  // q114's ceiling is pinned to its round-8 stage profile (SCALING.md
  // "Round 8: q114"): candidates grow ~9x per 3x data on this corpus
  // but the verify is candidate-bound at ~3x wall and the measured
  // end-to-end ratio is 1.5 — 5x trips only if verify stops being
  // output-bound, not when the battery runs cold.
  private val ratioCeil: Map[String, Double] =
    family.map(q => q -> (q match {
      case "q44_embed_neardup" => 12.0
      case "q114_fuzzy_decon" => 5.0
      case _ => 6.0
    })).toMap

  def main(args: Array[String]): Unit = {
    val fails = run(args)
    if (fails.nonEmpty) {
      fails.foreach(f => System.err.println(s"[fuzzbench] $f"))
      sys.exit(1)
    }
  }

  /** Composable entry (RoundArtifacts chains the per-round gates in
    * one JVM): returns the guard failures instead of exiting. */
  def run(args: Array[String]): Seq[String] = {
    val round = args.lift(0).getOrElse("r0X")
    val srcDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val fam = family.mkString(",")
    val fails = scala.collection.mutable.ArrayBuffer.empty[String]

    def probe(factor: Int): ScaleBench.ScaleResult = {
      val r = ScaleBench.run(Array(srcDir, factor.toString,
        s"/tmp/graft_fuzz_x$factor", s"fuzz_x$factor", fam,
        "documents,embeddings", "fuzz"))
      fails ++= r.guardFails.map(f => s"x$factor $f")
      r.plantedRecall match {
        // the sweep is lossless: anything under 1.0 is a broken
        // margin/verify, and ScaleBench has already recorded the
        // guardFail — this arm just documents the single contract
        case Some(rec) if rec < 1.0 => ()
        case None => fails += s"x$factor: sweep recall audit did not run"
        case _ => ()
      }
      r
    }

    val r10 = probe(10)
    val r30 = probe(30)
    val t10 = r10.queries.toMap
    val t30 = r30.queries.toMap

    // FALLBACK PROBE (round-9): the >cap code paths — the blocked
    // DataFrame sweep (exactSweepRepPairs above maxBroadcastReps),
    // verifiedRepPairs' dedup-first + shuffle attach, and setSimJoin's
    // dedup-first + shuffle attach — are the plans a 1000-executor
    // deploy actually takes, yet no locally-affordable corpus crosses
    // the production caps (x100 stops at exactly 200k reps; q142's
    // fuzz-x100 exceeds this box's spill disk). So: rerun the three
    // cap-guarded queries on the SAME x30 corpus with the caps lowered
    // under them, and gate four properties every round:
    //  (1) ENGAGED — the corpus provably crosses the lowered caps
    //      (sweep-audit rep count / distinct-text count > cap), so the
    //      probe cannot silently re-test the broadcast path;
    //  (2) EQUAL — per-query output row counts match the primary x30
    //      run row-for-row-count (the paths are spec-proven equal;
    //      this re-proves it at probe scale each round);
    //  (3) RECALL — the sweep audit's planted pairs come back at
    //      exactly 1.0 through the BLOCKED sweep;
    //  (4) WALL — fallback/primary ratio per query under a ceiling
    //      (the fallback may pay shuffle/join machinery the broadcast
    //      path skips, but an order-of-magnitude cliff would mean the
    //      distributed plan is not actually deployable).
    val fbRepsCap = 50000L
    val fbSetsCap = 50000L
    val fbFamily = Seq("q44_embed_neardup", "q121_neardup_hightau", "q142_set_sim_join")
    val fbCeil: Map[String, Double] = Map(
      // tiled kernel vs broadcast kernel: same float arithmetic, the
      // extra cost is the block-pair shuffle — measured r09 ratio
      // ~1.6x (14.2 s tiled vs ~9 s broadcast for 1.8 B pairs; the
      // row-at-a-time DataFrame sweep this replaced measured ~30x)
      "q44_embed_neardup" -> 4.0,
      // banded candidates are selective at tau=0.9, so dedup-first +
      // shuffle attach pays ~the same stream twice — measured ~1.9x
      "q121_neardup_hightau" -> 6.0,
      // dedup-first + shuffled set attaches: the deduped 45M-pair
      // stream shuffles once per attach side and the second shuffle
      // carries set_a (the unavoidable distributed-join cost the
      // broadcast path skips) — measured r09 ratio ~7x calm
      "q142_set_sim_join" -> 12.0)
    val rfb = graft.config.ScaleKnobs.withLoweredCaps(fbRepsCap, fbSetsCap) {
      ScaleBench.run(Array(srcDir, "30", "/tmp/graft_fuzz_x30", "fuzz_fb_x30",
        fbFamily.mkString(","), "documents,embeddings", "fuzz"))
    }
    fails ++= rfb.guardFails.map(f => s"fallback $f")
    val tfb = rfb.queries.toMap
    // (1) engagement: reps from the sweep audit; distinct text sets
    // counted directly on the materialized corpus
    rfb.sweepReps match {
      case Some(n) if n > fbRepsCap => ()
      case Some(n) => fails += s"FALLBACK NOT ENGAGED: $n reps <= lowered cap $fbRepsCap"
      case None => fails += "FALLBACK: sweep audit did not report a rep count"
    }
    val nSets = {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.ui.enabled", "false").getOrCreate()
      try s.read.parquet("/tmp/graft_fuzz_x30/documents.parquet")
        .select(org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("text"))).distinct().count()
      finally s.stop()
    }
    if (nSets <= fbSetsCap)
      fails += s"FALLBACK NOT ENGAGED: $nSets distinct text sets <= lowered cap $fbSetsCap"
    // (2) output equality vs the primary x30 run
    val rowsEqual = fbFamily.map { q =>
      val eq = (r30.rowCounts.get(q), rfb.rowCounts.get(q)) match {
        case (Some(a), Some(b)) if a == b => true
        case (Some(a), Some(b)) =>
          fails += s"FALLBACK OUTPUT MISMATCH $q: primary $a rows != fallback $b rows"
          false
        case _ =>
          fails += s"FALLBACK OUTPUT MISMATCH $q: a row count is missing"
          false
      }
      q -> eq
    }
    // (3) recall through the blocked sweep
    if (!rfb.plantedRecall.exists(_ >= 1.0))
      fails += s"FALLBACK RECALL FAIL: blocked-sweep planted recall ${rfb.plantedRecall.getOrElse(-1.0)} < 1.0"
    // (4) wall ceilings vs the primary run
    val fbRatios = fbFamily.flatMap { q =>
      (t30.get(q), tfb.get(q)) match {
        case (Some(a), Some(b)) if a > 0 && b > 0 =>
          val ratio = b / a
          if (ratio > fbCeil(q))
            fails += f"FALLBACK WALL FAIL $q: fallback/primary = $ratio%.2f > ceiling ${fbCeil(q)}%.1f"
          Some(q -> ratio)
        case _ =>
          fails += s"FALLBACK WALL FAIL $q: missing or failed at one side"
          None
      }
    }
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

    // Locale.ROOT: a comma-decimal default locale would emit "0,123"
    // and corrupt the committed JSON artifact
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def fmt(m: Seq[(String, Double)]) =
      m.map { case (k, v) => s""""$k":${r3(v)}""" }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"fuzz_family","round":"$round","x10_total":${r10.total},"x30_total":${r30.total},""" +
        s""""x10":${fmt(family.flatMap(q => t10.get(q).map(q -> _)))},""" +
        s""""x30":${fmt(family.flatMap(q => t30.get(q).map(q -> _)))},""" +
        s""""ratio_x30_x10":${fmt(ratios)},""" +
        s""""planted_recall":{"x10":${r10.plantedRecall.getOrElse(-1.0)},"x30":${r30.plantedRecall.getOrElse(-1.0)}},""" +
        s""""fallback":{"reps_cap":$fbRepsCap,"sets_cap":$fbSetsCap,""" +
        s""""engaged":{"sweep_reps":${rfb.sweepReps.getOrElse(-1L)},"distinct_sets":$nSets},""" +
        s""""x30":${fmt(fbFamily.flatMap(q => tfb.get(q).map(q -> _)))},""" +
        s""""ratio_vs_primary":${fmt(fbRatios)},""" +
        s""""rows_equal":${rowsEqual.forall(_._2)},""" +
        s""""blocked_sweep_recall":${rfb.plantedRecall.getOrElse(-1.0)}},""" +
        s""""guard_fails":[${fails.map(f => "\"" + f.replace("\"", "'") + "\"").mkString(",")}]${GitStamp.jsonField}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"BENCH_fuzz_$round.json"), json + "\n")
    println(json)
    fails.toSeq
  }
}
