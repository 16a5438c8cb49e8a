package graft.tools

import graft.queries.RealMarc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-round scale walls for the realistic-MARC family (round 9):
  * the q187/q188/q189/q191 cores re-run at x10 (30k auths / 150k
  * bibs) and x30 (90k auths / 450k bibs) of the gate corpus.
  *
  * Two properties make these walls meaningful rather than mere
  * timings:
  *  - **The skew DEEPENS with scale**: head/mid tier sizes stay fixed
  *    while the bib count grows, so at x30 each of the 20 head auths
  *    carries ~11,250 bibs (vs ~375 at the gate size). A resolve or
  *    cascade plan that degraded under attachment skew — a shuffled
  *    join with a hot key, a per-attached-record loop — would show as
  *    a super-linear ratio; the broadcast-map resolve and the narrow
  *    cascade transform are skew-immune by construction and the
  *    ratios pin that.
  *  - **Every timed run is verified in the same pass**: each wall's
  *    output cardinality is checked against an independent relational
  *    replay on the generator tables (join + regexp / groupBy), so a
  *    fast-but-wrong plan cannot pass. The replay runs OUTSIDE the
  *    timer.
  *
  * Ceilings: measured medians on this rig (local[32], sf-independent
  * generated corpus) x ~4 headroom for host variance; ratio ceilings
  * allow the ~3x data growth plus index-build log factors but fail a
  * quadratic blow-up.
  *
  * Usage:
  *   runMain graft.tools.RealMarcBench [roundLabel]  — the gated
  *     x10/x30 cadence; writes BENCH_realmarc_<roundLabel>.json,
  *     exits nonzero on any wall/ratio/verification failure.
  *   runMain graft.tools.RealMarcBench probe [factor] — the
  *     out-of-cadence scale probe (x100 analog of the text family's):
  *     verified walls at one factor, written to
  *     BENCH_realmarc_x<factor>.json, verification-gated but not
  *     ceiling-gated; document the numbers in SCALING.md. factor ≤ 133
  *     keeps nBibs·factor under the generator's 2e6
  *     quadratic-seed bound.
  */
object RealMarcBench {

  /** (wall name, x10 ceiling sec, x30 ceiling sec, x30/x10 ratio
    * ceiling). Measured after the x1 warmup pass: x10 all ≤ 1.6 s,
    * x30 all ≤ 3.4 s (local[32]). */
  private val gates: Seq[(String, Double, Double, Double)] = Seq(
    ("resolve", 6.0, 12.0, 6.0),
    ("dsl_search", 8.0, 15.0, 6.0),
    ("browse", 10.0, 18.0, 6.0),
    ("cascade", 8.0, 15.0, 6.0),
    // every-auth re-heading through the over-cap joined dataflow
    // (q201 core); measured r11: x10 2.9 s, x30 3.9 s (ratio 1.37)
    ("bulk_cascade", 11.0, 16.0, 6.0))

  def main(args: Array[String]): Unit = {
    val fails =
      if (args.headOption.contains("probe")) probe(args.lift(1).map(_.toInt).getOrElse(100))
      else run(args)
    if (fails.nonEmpty) {
      fails.foreach(f => System.err.println(s"[realmarcbench] $f"))
      sys.exit(1)
    }
  }

  private def session(): SparkSession = {
    val s = SparkSession.getActiveSession.getOrElse(
      SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    graft.Bench.silenceTeardownNoise()
    s
  }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** One factor's verified walls: (times by wall name, verification
    * failures). Corpus construction and the relational replays run
    * OUTSIDE the timers. */
  private def wallsAt(spark: SparkSession, factor: Int): (Map[String, Double], Seq[String]) = {
    val fails = scala.collection.mutable.ArrayBuffer.empty[String]
    val nA = RealMarc.nAuths * factor
    val nB = RealMarc.nBibs * factor
    val authsR = RealMarc.authsRelN(spark, nA).cache()
    val bibsR = RealMarc.bibsRelN(spark, nA, nB).cache()
    authsR.count(); bibsR.count()
    val auths = RealMarc.marcAuthsFrom(authsR)
    val bibs = RealMarc.marcBibsFrom(bibsR, authsR)

    // --- resolve (q189 core): broadcast-map over deepened skew
    val (resolvedNulls, tResolve) = time {
      import graft.spark.MarcSchema.marcRowEncoder
      val r = graft.spark.MarcContext.resolveLinkedAuto(
        RealMarc.marcBibsStrippedFrom(bibsR)
          .as[graft.spark.MarcRow](marcRowEncoder), auths).toDF()
      val subj = try_element_at(flatten(transform(
        filter(col("datafields"), f => f.getField("tag") === "650"),
        f => transform(f.getField("subfields"), sf => sf.getField("value")))), lit(1))
      r.select(subj.as("s")).where(col("s").isNull).count()
    }
    if (resolvedNulls != 0L)
      fails += s"VERIFY FAIL x$factor resolve: $resolvedNulls unresolved subjects"

    // --- dsl search (q187 core): exact heading + regex at scale
    val (dslRows, tDsl) = time {
      val compiler = new graft.spark.SparkQueryCompiler(spark, bibs, auths)
      compiler.run(
        s"650__a:'${RealMarc.headingOf(RealMarc.targetAuth).toUpperCase}' AND 245__a:/^w3/")
        .count()
    }
    val dslExpect = bibsR
      .join(authsR.where(col("heading") === RealMarc.headingOf(RealMarc.targetAuth))
        .select(col("auth_id").as("m_id")), col("xref") === col("m_id"))
      .where(col("title").rlike("^w3")).count()
    if (dslRows != dslExpect)
      fails += s"VERIFY FAIL x$factor dsl_search: $dslRows rows, replay expects $dslExpect"

    // --- browse (q188 core): browse-index regex resolution (the gate's
    // own subjectField, so the wall measures the gated query shape)
    val (browseRows, tBrowse) = time {
      val compiler = new graft.spark.SparkQueryCompiler(spark,
        RealMarc.subjectField(bibs, "bib"), RealMarc.subjectField(auths, "auth"))
      compiler.run("subject:/w44/").count()
    }
    val browseExpect = bibsR
      .join(authsR.where(col("heading").rlike("w44"))
        .select(col("auth_id").as("m_id")), col("xref") === col("m_id")).count()
    if (browseRows != browseExpect)
      fails += s"VERIFY FAIL x$factor browse: $browseRows rows, replay expects $browseExpect"

    // --- cascade (q191 core): head-auth retag + linked refresh
    val (cascChanged, tCasc) = time {
      val cascaded = graft.spark.AuthOps.cascadeHeadingChange(bibs,
        RealMarc.targetAuth, "150", Seq("a"), "151", Seq("a"))
      val refreshed = graft.spark.AuthOps.refreshLinkedValues(
        cascaded, RealMarc.marcAuthsFrom(authsR, changed = true))
      refreshed.where(exists(col("datafields"), f => f.getField("tag") === "651"))
        .count()
    }
    val cascExpect = bibsR.where(col("xref") === RealMarc.targetAuth).count()
    if (cascChanged != cascExpect)
      fails += s"VERIFY FAIL x$factor cascade: $cascChanged retagged, replay expects $cascExpect"

    // --- bulk cascade (q201 core): EVERY auth re-headed through the
    // over-cap joined dataflow (flag-join attach scan + per-record
    // joined struct changes) — O(1) driver state by construction; a
    // super-linear ratio here would mean the join path regressed to
    // per-auth work
    val (bulkRetagged, tBulk) = time {
      val changes = authsR.select(col("auth_id").cast("long").as("xref"),
        lit("51").as("new_suffix"),
        array().cast("array<string>").as("removed"),
        array().cast("array<string>").as("added"))
      val attached = graft.spark.AuthOps.attachedJoined(bibs, changes)
      graft.spark.AuthOps.cascadeStructJoined(attached, changes)
        .toDF()
        .where(exists(col("datafields"), f => f.getField("tag") === "651"))
        .count()
    }
    if (bulkRetagged != nB)
      fails += s"VERIFY FAIL x$factor bulk_cascade: $bulkRetagged retagged, expected $nB"

    authsR.unpersist(); bibsR.unpersist()
    (Map("resolve" -> tResolve, "dsl_search" -> tDsl,
      "browse" -> tBrowse, "cascade" -> tCasc, "bulk_cascade" -> tBulk), fails.toSeq)
  }

  private def r3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
  private def fmt(m: Seq[(String, Double)]) =
    m.map { case (k, v) => s""""$k":${r3(v)}""" }.mkString("{", ",", "}")
  private def failsJson(fails: Seq[String]) =
    fails.map(f => "\"" + f.replace("\"", "'") + "\"").mkString(",")

  /** Composable entry (RoundArtifacts chains the per-round gates). */
  def run(args: Array[String]): Seq[String] = {
    val round = args.lift(0).getOrElse("r0X")
    val spark = session()
    val fails = scala.collection.mutable.ArrayBuffer.empty[String]

    // untimed x1 warmup: whole-stage codegen + encoder/JIT cost
    // otherwise lands on whichever factor runs first (the first probe
    // read x10 SLOWER than x30 — pure attribution noise). Its TIMES
    // are discarded; its VERIFICATIONS are not (a defect visible only
    // at the gate-scale corpus must not vanish into the warmup)
    val (_, v1) = wallsAt(spark, 1)
    val (t10, v10) = wallsAt(spark, 10)
    val (t30, v30) = wallsAt(spark, 30)
    fails ++= v1; fails ++= v10; fails ++= v30
    val ratios = gates.map { case (name, c10, c30, rCeil) =>
      val (a, b) = (t10(name), t30(name))
      if (a > c10) fails += f"WALL FAIL x10 $name: $a%.2f s > ceiling $c10%.1f s"
      if (b > c30) fails += f"WALL FAIL x30 $name: $b%.2f s > ceiling $c30%.1f s"
      val ratio = b / a
      if (ratio > rCeil) fails += f"RATIO FAIL $name: x30/x10 = $ratio%.2f > ceiling $rCeil%.1f"
      name -> ratio
    }

    val json =
      s"""{"metric":"realmarc_family","round":"$round",""" +
        s""""x10":${fmt(gates.map(g => g._1 -> t10(g._1)))},""" +
        s""""x30":${fmt(gates.map(g => g._1 -> t30(g._1)))},""" +
        s""""ratio_x30_x10":${fmt(ratios)},""" +
        s""""guard_fails":[${failsJson(fails.toSeq)}]${GitStamp.jsonField}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"BENCH_realmarc_$round.json"), json + "\n")
    println(json)
    fails.toSeq
  }

  /** Out-of-cadence verified scale probe at one factor. */
  def probe(factor: Int): Seq[String] = {
    val spark = session()
    val (_, vWarm) = wallsAt(spark, 1) // warmup: times discarded, checks kept
    val (t, vMain) = wallsAt(spark, factor)
    val fails = vWarm ++ vMain
    val json =
      s"""{"metric":"realmarc_probe","factor":$factor,""" +
        s""""walls":${fmt(t.toSeq.sortBy(_._1))},""" +
        s""""guard_fails":[${failsJson(fails)}]${GitStamp.jsonField}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"BENCH_realmarc_x$factor.json"), json + "\n")
    println(json)
    fails
  }
}
