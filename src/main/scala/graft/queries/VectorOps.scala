package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Similarity search over the `embeddings` table (Array[Float], 64-d).
  *
  * q21 is the exact brute-force baseline: broadcast the (small) query
  * set against the corpus, then TWO-PHASE top-k via the bounded
  * [[graft.spark.TopK]] Aggregator — the partial (map-side) aggregate
  * keeps ≤k candidates per query per task, so the shuffle carries
  * O(tasks × queries × k) structs; the full scored corpus never
  * funnels through #queries reducer tasks.
  *
  * q22 is the scale path: hash-derived hyperplane LSH buckets (8-bit
  * signature → candidates share a bucket), so the pairwise work drops
  * from O(N·Q) to per-bucket, with the same bounded top-k per bucket.
  * The hyperplanes are pseudo-random but deterministic (md5-based),
  * which keeps the DuckDB oracle exact.
  *
  * Scores are rounded to 4 decimals before ranking, with vec_id
  * tiebreak, so double-accumulation-order differences between engines
  * cannot flip ranks.
  */
object VectorOps {

  /** The cross-engine determinism contract for every cosine in this
    * file: round to 4 decimals BEFORE ranking/thresholding, so
    * double-accumulation-order differences can never flip a
    * comparison. The oracle mirrors it as ROUND(...,4). Implemented
    * by the codegen'd [[graft.spark.CosSimExpr]] (bit-identical
    * arithmetic to the interpreted HOF composition it replaced —
    * same fold order, same BigDecimal HALF_UP round). */
  private def cosSim(a: Column, b: Column): Column = {
    graft.spark.CosSimExpr.register(SparkSession.active)
    call_function("dlx_cos4", a, b)
  }

  private[graft] def emb(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir).select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  private def topkUdaf(k: Int) = udaf(new graft.spark.TopK(k))

  /** Collision probability of one random hyperplane for a pair at
    * cosine `tau`: 1 − θ/π (Goemans–Williamson). */
  def collisionProb(tau: Double): Double = 1.0 - math.acos(tau) / math.Pi

  /** Banded-LSH calibration — (r planes per band, b bands), the
    * round-3 single-band design's replacement. A single concatenated
    * signature has per-pair collision p^planes, which silently
    * discards at-threshold recall as planes grow; banding restores
    * it: candidate recall = 1 − (1 − p^r)^b.
    *
    * Rule: r is the LARGEST band width whose recall-target band count
    * b(r) = ceil(ln(1/(1−recall)) / p^r) stays ≤ bMax, and b is that
    * count. Larger r always shrinks per-band background collisions
    * (factor (2p)^-r of all pairs), so maximizing r under the band
    * budget is the cost-optimal point; bMax bounds the shuffle/
    * signature multiplier (b·N rows).
    *
    * τ=0.30 (the synthetic gate's knob) ⇒ (r=6, b=51): at this weak
    * threshold random-hyperplane LSH is honestly near brute-force
    * over DISTINCT vectors (background pairs at cos≈0.1–0.5 collide
    * in some band with high probability) — the scale load is carried
    * by the exact-first collapse, which keeps the pair enumeration
    * over corpus-distinct representatives. τ=0.9 (a realistic
    * near-dup sweep) ⇒ (r=21, b=60): 2M buckets per band, background
    * collision ~0.54²¹ ≈ 2e-6 — candidates track true near-dups and
    * the whole pipeline is ~linear. Recall holds at ≥`recall` for
    * pairs AT τ by construction, higher above it. */
  def bandsFor(tau: Double, recall: Double = 0.9, bMax: Int = 64): (Int, Int) = {
    require(tau > 0.0 && tau < 1.0, s"tau=$tau out of (0,1)")
    val p = collisionProb(tau)
    val need = math.log(1.0 / (1.0 - recall))
    val r = (24 to 1 by -1).find(r => math.ceil(need / math.pow(p, r)) <= bMax)
      .getOrElse(1)
    val b = math.max(1, math.ceil(need / math.pow(p, r)).toInt)
    if (r < MinPrunableSignBits) {
      weakTauWarnings.incrementAndGet()
      log.warn(s"bandsFor(tau=$tau): r=$r sign bits < $MinPrunableSignBits — only " +
        s"b*2^r = ${b.toLong << r} possible buckets, so the banded candidate stream " +
        "is near-quadratic in the distinct-vector count REGARDLESS of corpus size " +
        "(expected candidates >= ~n^2/(b*2^r)); a corpus-scale sweep at this tau is " +
        "infeasible by construction — run tau >= ~0.5, or accept output-bound cost")
    }
    (r, b)
  }

  /** τ-floor contract (round-5 verdict: the weak-τ boundary lived only
    * in SCALING.md prose): below `MinPrunableSignBits` sign bits per
    * band the bucket space b·2^r is too small to prune — expected
    * background candidates are ≥ ~n²/(b·2^r), i.e. near-quadratic in
    * the distinct-vector count no matter how the corpus grows. The
    * gate's τ=0.30 lands at r=6 (3264 buckets — measured honest-
    * quadratic in the fuzz probes); production sweeps at τ≥~0.5 get
    * r≥8. [[bandsFor]] logs a structured warning whenever a caller
    * crosses the floor; [[prunableRegime]] is the programmatic probe. */
  val MinPrunableSignBits = 8
  private val log = org.slf4j.LoggerFactory.getLogger("graft.queries.VectorOps")
  /** Count of weak-τ warnings emitted — spec-visible evidence the
    * contract guard fires. */
  val weakTauWarnings = new java.util.concurrent.atomic.AtomicLong

  /** True iff banded LSH at this τ has enough sign bits per band for
    * the bucket space to prune background pairs. */
  def prunableRegime(tau: Double, recall: Double = 0.9, bMax: Int = 64): Boolean = {
    val p = collisionProb(tau)
    val need = math.log(1.0 / (1.0 - recall))
    val r = (24 to 1 by -1).find(r => math.ceil(need / math.pow(p, r)) <= bMax)
      .getOrElse(1)
    r >= MinPrunableSignBits
  }

  /** Theoretical candidate recall of [[bandsFor]]'s (r, b) for a pair
    * at cosine `tau`: 1 − (1 − p^r)^b. */
  def bandedRecallAt(tau: Double, r: Int, b: Int): Double =
    1.0 - math.pow(1.0 - math.pow(collisionProb(tau), r), b)

  /** (vec_id [, extraKeys], band, sig) — one row per (vector, band).
    * Signatures come from the codegen'd [[graft.spark.LshBandSigsExpr]]
    * (deterministic md5 coefficients, global plane index band*r+k, dot
    * folded in array order — bit-identical to the oracle SQL). */
  def bandExplode(vecs: DataFrame, tau: Double, extraKeys: Seq[String] = Nil): DataFrame = {
    graft.spark.LshBandSigsExpr.register(vecs.sparkSession)
    val (r, b) = bandsFor(tau)
    vecs.select((extraKeys :+ "vec_id").map(col) :+
      posexplode(call_function("dlx_lsh_bands", col("v"), lit(b), lit(r)))
        .as(Seq("band", "sig")): _*)
  }

  /** Distinct candidate pairs (ra < rb) whose vectors share at least
    * one band signature (and all `extraKeys`) — union over bands,
    * deduped BEFORE any cosine verification so each candidate is
    * verified exactly once regardless of how many bands it collides
    * in. Input must carry (vec_id, v [, extraKeys]). */
  def bandCandidates(vecs: DataFrame, tau: Double, extraKeys: Seq[String] = Nil): DataFrame = {
    val bands = bandExplode(vecs, tau, extraKeys)
    val keys = extraKeys ++ Seq("band", "sig")
    bands.as("x").join(bands.as("y"),
        keys.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("ra"), col("y.vec_id").as("rb"))
      .distinct()
  }

  /** Verified near-dup rep pairs (ra < rb, cos_sim ≥ τ) WITHOUT
    * materializing the un-deduped candidate stream through a shuffle.
    *
    * At weak thresholds banded LSH barely prunes: τ=0.30 ⇒ r=6 sign
    * bits, only b·2⁶ = 3264 possible buckets, so the per-band
    * candidate stream is near-quadratic in the distinct-vector count —
    * the x30 fuzzed-replication probe measured a 1.6B-row stream whose
    * dedup-FIRST shuffle exhausted local spill disk. Here the
    * (band,sig) self-join shuffles only the band table (|reps|·b
    * rows), candidates stay pipelined inside whole-stage codegen,
    * vectors ride BROADCAST attaches (a rep table is ~0.5 KB/row), the
    * cosine filter runs map-side, and only SURVIVORS — bounded by the
    * true pair output — reach the dedup shuffle. Cosine is
    * deterministic, so verifying a pair once per colliding band and
    * deduping after yields exactly the dedup-first answer.
    *
    * When reps outgrow the broadcast budget (`maxBroadcastReps`, sized
    * for ~128 MB of 64-dim vectors) the plan falls back to dedup-first
    * + shuffle attach: a corpus that large is past the weak-τ regime
    * anyway (production near-dup sweeps run τ≥0.7, where candidates
    * track true pairs and the dedup-first stream is linear-ish). */
  def verifiedRepPairs(vecs0: DataFrame, tau: Double, extraKeys: Seq[String] = Nil,
      maxBroadcastReps: Long = graft.config.ScaleKnobs.maxBroadcastReps,
      knownRepCount: Option[Long] = None): DataFrame = {
    // materialize ONCE: the rep table feeds the band self-join (both
    // legs) and both vector attaches — 4 evaluations of the caller's
    // lineage otherwise (q104's centroid assignment re-ran per leg),
    // and the size probe below rides the checkpointed blocks instead
    // of re-executing the pipeline (round-5 ADVICE)
    val vecs = vecs0.localCheckpoint(true)
    def attach(cands: DataFrame, wrap: DataFrame => DataFrame): DataFrame = cands
      .join(wrap(vecs.select(col("vec_id").as("ra"), col("v").as("va"))), "ra")
      .join(wrap(vecs.select(col("vec_id").as("rb"), col("v").as("vb"))), "rb")
      .select(col("ra"), col("rb"), cosSim(col("va"), col("vb")).as("cos_sim"))
      .where(col("cos_sim") >= tau)
    // clamp: a Long cap above Int.MaxValue must saturate, not wrap
    val cap = math.min(maxBroadcastReps, (Int.MaxValue - 1).toLong)
    val small = knownRepCount.getOrElse(vecs.count()) <= cap
    if (small) {
      val bands = bandExplode(vecs, tau, extraKeys)
      val keys = extraKeys ++ Seq("band", "sig")
      val cands = bands.as("x").join(bands.as("y"),
          keys.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
            col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("ra"), col("y.vec_id").as("rb"))
      attach(cands, broadcast).distinct()
    } else
      // dedup-first + shuffle attach; the hint builds the hash table
      // from the rep table side so the candidate stream is probed, not
      // sorted (round-9 fallback probe: SMJ sorted the stream twice)
      attach(bandCandidates(vecs, tau, extraKeys), _.hint("shuffle_hash"))
  }

  /** EXACT all-pairs near-dup rep pairs (ra < rb, round-4 cos ≥ τ) —
    * the weak-τ replacement for banded candidates (round 7). Lossless:
    * recall is exactly 1.0 and the oracle is ground truth, not a
    * banding replay.
    *
    * Why a sweep, measured not assumed (fuzz-x30, 60k reps, 1.8B
    * pairs, background cosine ~N(0, 1/√64)): banded LSH at
    * bandsFor(0.30)=(r=6,b=51) admitted 995M distinct candidates (55%
    * of all pairs) for 14.35M true pairs and cost 56.9 s; a LOSSLESS
    * triangle-inequality canopy prune over the ~8°-radius fuzz-jitter
    * clusters must admit every pair at cos ≥ cos(arccos τ + 2·8°) =
    * 0.026 — measured 46% of all pairs, no better than the banding;
    * multi-probe LSH cannot reach 0.9 recall sub-quadratically here
    * because per-bit agreement at τ=0.30 is 0.597 vs ~0.54 at the
    * 1σ background (ρ ≈ 0.84). The floor is the sweep, so this takes
    * the sweep with optimal constants: [[graft.spark.DenseSweep]]
    * broadcasts the rep matrix as flat primitive floats and emits
    * margin candidates (τ − 1e-3, unique by construction), and only
    * those — output-bound plus a thin margin band — pay the exact
    * shared-arithmetic verify (dlx_cos4, broadcast vector attach).
    * Measured 71.6 s → kernel path well under the banded 56.9 s.
    *
    * Above `maxBroadcastReps` (the same ~64 MB matrix budget class as
    * verifiedRepPairs) the margin candidates come from
    * [[graft.spark.DenseSweep.tiledMarginPairs]] — the SAME float
    * kernel tiled over block pairs (bit-identical candidate set, no
    * driver collect) — and the exact verify's vector attaches ride
    * shuffled hash joins instead of broadcasts. The round-9 probe
    * measured why the tiling matters: the previous row-at-a-time
    * blocked DataFrame sweep paid ~30× the kernel (275 s vs 9 s for
    * 1.8 B pairs) in per-pair join machinery. Still quadratic — at
    * τ=0.30 the OUTPUT is near-quadratic (measured 0.75% of all pairs
    * at 1σ=0.125 background), so no engine outruns its own output; the
    * τ-floor contract ([[bandsFor]]) stands, now with the sweep as
    * its measured-optimal floor. */
  def exactSweepRepPairs(vecs0: DataFrame, tau: Double,
      maxBroadcastReps: Long = graft.config.ScaleKnobs.maxBroadcastReps,
      knownRepCount: Option[Long] = None): DataFrame = {
    val vecs = vecs0.localCheckpoint(true)
    val cap = math.min(maxBroadcastReps, (Int.MaxValue - 1).toLong)
    val n = knownRepCount.getOrElse(vecs.count())
    val small = n <= cap
    val tm = tau - graft.spark.DenseSweep.MarginSlack
    val cands =
      if (small)
        graft.spark.DenseSweep.marginPairs(vecs.select(col("vec_id"), col("v")), tm)
      else
        graft.spark.DenseSweep.tiledMarginPairs(vecs.select(col("vec_id"), col("v")),
          tm, graft.spark.DenseSweep.blocksFor(n))
    // exact re-verify of the margin candidates (output-bound plus the
    // thin margin band) with the shared double arithmetic; above the
    // cap the attach builds a hash table from the rep table instead of
    // sorting the candidate stream through an SMJ
    def wrap(df: DataFrame): DataFrame = if (small) broadcast(df) else df.hint("shuffle_hash")
    cands
      .join(wrap(vecs.select(col("vec_id").as("ra"), col("v").as("va"))), "ra")
      .join(wrap(vecs.select(col("vec_id").as("rb"), col("v").as("vb"))), "rb")
      .select(col("ra"), col("rb"), cosSim(col("va"), col("vb")).as("cos_sim"))
      .where(col("cos_sim") >= tau)
  }

  /** Deterministic planted near-pairs for recall audits: `k` pairs
    * (2k unit vectors, ids idFrom+2i / idFrom+2i+1), pair i at cosine
    * spread evenly across [lo, hi] — the at-threshold band the
    * single-band design provably missed. Construction: u from md5
    * doubles, w = cosθ·u + sinθ·(orthonormalized second hash vector),
    * so cos(u, w) = cosθ up to fp. Driver-side rows (2k ≤ hundreds). */
  def plantedPairs(s: SparkSession, idFrom: Long, k: Int,
      lo: Double = 0.31, hi: Double = 0.49, dims: Int = 64,
      seed: String = "p"): DataFrame = {
    def md5hex8(str: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(str.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    def hashVec(seed: String): Array[Double] =
      Array.tabulate(dims)(d => (md5hex8(s"${seed}_$d") % 1000).toDouble / 1000.0 - 0.5)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val rows = (0 until k).flatMap { i =>
      val c = if (k == 1) lo else lo + (hi - lo) * i / (k - 1)
      val u = unit(hashVec(s"${seed}a_$i"))
      val x = hashVec(s"${seed}b_$i")
      val proj = u.lazyZip(x).map(_ * _).sum
      val o = unit(x.lazyZip(u).map((xi, ui) => xi - proj * ui).toArray)
      val w = u.lazyZip(o).map((ui, oi) => c * ui + math.sqrt(1 - c * c) * oi).toSeq
      Seq((idFrom + 2L * i, u.toSeq), (idFrom + 2L * i + 1, w.toSeq))
    }
    import s.implicits._
    rows.toDF("vec_id", "v")
  }

  /** Exact-first collapse: one representative per distinct vector
    * value. Identical vectors share every band signature and cos 1.0,
    * so enumerating pairs over representatives and expanding through
    * the membership preserves the pair set exactly while a duplicate-
    * heavy corpus stops paying C(group, 2) band-join edges per group.
    * Returns (members: vec_id→rep_id, reps: rep vec_id + v). */
  def repCollapse(all: DataFrame): (DataFrame, DataFrame) = {
    // rep assignment rides ONE window over a scalar hash of the
    // vector — grouping and then re-JOINING on the 512-byte array
    // column itself would sort vectors through a shuffle (the q114
    // shingle-array lesson; at an x100 probe's 6M rows that join is
    // pure key-width overhead). The hash serialization normalizes
    // -0.0 to 0.0 elementwise so hash equality matches Spark's own
    // float-normalized grouping semantics; Double.toString is
    // injective on the rest (NaNs all print "NaN", collapsing
    // canonically like Spark's key normalization does).
    val gh = md5(concat_ws("\u0001",
      transform(col("v"), x => when(x === 0.0d, 0.0d).otherwise(x)).cast("array<string>")))
    val withRep = all.withColumn("rep_id", min(col("vec_id")).over(
      org.apache.spark.sql.expressions.Window.partitionBy(gh)))
    val members = withRep.select(col("vec_id"), col("rep_id"))
    val reps = withRep.where(col("vec_id") === col("rep_id"))
      .select(col("vec_id"), col("v"))
    (members, reps)
  }

  /** [[repCollapse]] gated on a cheap duplicate-multiplicity probe
    * (round-5 verdict: the collapse is answer-identical either way —
    * identical vectors share every band signature and verify at cos
    * 1.0 — but on a dup-light corpus the groupBy+join buys nothing
    * and cost the sf0.1 battery ~1.5× on q104). One map-side agg
    * (count + approx-distinct over a 64-bit vector hash) decides:
    * collapse only when exact duplicates exceed ~10% of rows. The
    * probe's ±2% HLL error cannot flip correctness, only which of two
    * equivalent plans runs.
    *
    * Also returns the rep-table row count this probe already paid for
    * (exact n uncollapsed, HLL-approximate d collapsed), so callers
    * can thread it into [[verifiedRepPairs]]'s broadcast-budget
    * decision instead of funding a second count job — safe because
    * that cap also only picks between two answer-identical plans. */
  def repCollapseIfDup(all: DataFrame): (DataFrame, DataFrame, Long) = {
    val r = all.agg(count(lit(1)), approx_count_distinct(xxhash64(col("v")))).head()
    val (n, d) = (r.getLong(0), r.getLong(1))
    if (d < n - n / 10) { val (m, reps) = repCollapse(all); (m, reps, d) }
    else (all.select(col("vec_id"), col("vec_id").as("rep_id")),
      all.select(col("vec_id"), col("v")), n)
  }

  /** explode a TopK result column into (payload struct, 1-based rank). */
  private def explodeRanked(df: DataFrame, groupCols: Seq[String]): DataFrame =
    df.select(groupCols.map(col) :+ posexplode(col("top")).as(Seq("pos", "c")): _*)
      .withColumn("rank", (col("pos") + 1).cast("int")).drop("pos")

  /** Brute-force cosine top-5 neighbors for query vectors vec_id < 10. */
  def q21AnnBrute(s: SparkSession, dir: String): DataFrame =
    annBrute(emb(s, dir))

  /** Core of q21 over any (vec_id, v) corpus — also gated on the
    * realistic clustered embeddings (q184). */
  def annBrute(corpus: DataFrame): DataFrame = {
    val queries = broadcast(corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv")))
    val scored = corpus.join(queries, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosSim(col("qv"), col("v")).as("cos_sim"))
    val grouped = scored.groupBy("query_id")
      .agg(topkUdaf(5)(col("cos_sim"), col("neighbor_id"), lit("")).as("top"))
    explodeRanked(grouped, Seq("query_id"))
      .select(col("query_id"), col("c.id").as("neighbor_id"),
        col("c.score").as("cos_sim"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** Banded-LSH ANN: the 10 query vectors' band signatures are tiny
    * (10·b rows) and BROADCAST, so the corpus streams past them with
    * no shuffle of its own; candidates = union over bands, deduped,
    * then exact cosine + bounded top-3. Calibrated at τ=0.40 (the
    * synthetic corpus' true-neighbor range tops out ~0.44). */
  def q22AnnLsh(s: SparkSession, dir: String, tau: Double = 0.40): DataFrame = {
    val corpus = emb(s, dir)
    val corpusBands = bandExplode(corpus, tau)
    val queryBands = broadcast(
      bandExplode(corpus.where(col("vec_id") < 10), tau)
        .select(col("vec_id").as("query_id"), col("band"), col("sig")))
    val cands = corpusBands.join(queryBands, Seq("band", "sig"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val queries = broadcast(corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv")))
    val scored = cands
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("v")), "neighbor_id")
      .join(queries, "query_id")
      .select(col("query_id"), col("neighbor_id"), cosSim(col("qv"), col("v")).as("cos_sim"))
    val grouped = scored.groupBy("query_id")
      .agg(topkUdaf(3)(col("cos_sim"), col("neighbor_id"), lit("")).as("top"))
    explodeRanked(grouped, Seq("query_id"))
      .select(col("query_id"), col("c.id").as("neighbor_id"),
        col("c.score").as("cos_sim"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** Embedding-cosine near-dup pairs at a WEAK threshold: exact-first
    * collapse to distinct representatives, an exact all-pairs sweep
    * over the reps ([[exactSweepRepPairs]] — lossless, recall 1.0, no
    * banding), then expansion through the membership (identical-vector
    * groups yield their intra pairs at cos 1.0; rep edges fan out to
    * member cross pairs). The output is GROUND TRUTH — every pair with
    * round-4 cosine ≥ τ — and so is the oracle. τ=0.30 is the weak-τ
    * regime where no candidate scheme prunes (see exactSweepRepPairs'
    * measurements); a realistic near-dup sweep at τ≥0.7 should use the
    * banded [[verifiedRepPairs]] (q121's path), where candidates track
    * true pairs and the pipeline is ~linear. */
  def q44EmbedNearDup(s: SparkSession, dir: String, tau: Double = 0.30): DataFrame = {
    require(tau <= 1.0, s"tau=$tau: exact duplicates must qualify as near-dups")
    val all = emb(s, dir)
    val (members, reps, nReps) = repCollapseIfDup(all)
    val repPairs = exactSweepRepPairs(reps, tau, knownRepCount = Some(nReps))
    val ma = members.select(col("vec_id").as("ida"), col("rep_id").as("ra"))
    val mb = members.select(col("vec_id").as("idb"), col("rep_id").as("rb"))
    val cross = repPairs.join(ma, "ra").join(mb, "rb")
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"), col("cos_sim"))
    // intra-group pairs: identical vectors, cos exactly 1.0 after the
    // 4-decimal round (sqrt(s)·sqrt(s) deviates from s by ≤ a few ulp)
    val intra = members.as("m1").join(members.as("m2"),
        col("m1.rep_id") === col("m2.rep_id") && col("m1.vec_id") < col("m2.vec_id"))
      .select(col("m1.vec_id").as("doc_a"), col("m2.vec_id").as("doc_b"),
        lit(1.0d).as("cos_sim"))
    cross.unionByName(intra).orderBy("doc_a", "doc_b")
  }

  /** IVF (inverted-file) ANN — the centroid-cell scale path: 16
    * deterministic centroids (first corpus vectors), every corpus
    * vector assigned to its arg-max-cosine cell with the bounded TopK
    * aggregator (k=1; no window over the corpus), queries probe their
    * 2 nearest cells, and candidates are ONLY the probed cells'
    * members — scan cost drops to nProbe/nCells of the corpus. Exact
    * cosine + bounded top-3 on the candidates. */
  def q45AnnIvf(s: SparkSession, dir: String): DataFrame = {
    def cosC(a: Column, b: Column) = cosSim(a, b)
    val corpus = emb(s, dir)
    val cents = broadcast(corpus.where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("v").as("cv")))
    val assigned = corpus.crossJoin(cents)
      .select(col("vec_id"), cosC(col("v"), col("cv")).as("c"), col("cid"))
      .groupBy("vec_id")
      .agg(topkUdaf(1)(col("c"), col("cid"), lit("")).as("top"))
      .select(col("vec_id"), element_at(col("top"), 1).getField("id").as("cell"))
      .join(corpus, "vec_id")
    val probes = corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .crossJoin(cents)
      .select(col("query_id"), cosC(col("qv"), col("cv")).as("c"), col("cid"))
      .groupBy("query_id")
      .agg(topkUdaf(2)(col("c"), col("cid"), lit("")).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t.id").as("cell"))
    val queries = broadcast(corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv")))
    val scored = broadcast(probes).join(assigned, "cell")
      .where(col("vec_id") =!= col("query_id"))
      .join(queries, col("query_id") === col("q_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosC(col("qv"), col("v")).as("cos_sim"))
    val grouped = scored.groupBy("query_id")
      .agg(topkUdaf(3)(col("cos_sim"), col("neighbor_id"), lit("")).as("top"))
    explodeRanked(grouped, Seq("query_id"))
      .select(col("query_id"), col("c.id").as("neighbor_id"),
        col("c.score").as("cos_sim"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** k-NN label vote: majority label among the 5 nearest neighbors of
    * each query vector (embedding-cosine classification). */
  def q23KnnClassify(s: SparkSession, dir: String): DataFrame =
    knnClassify(emb(s, dir))

  /** Core of q23 over any (vec_id, label, v) corpus — also gated on
    * the realistic clustered embeddings (q185), where the labels ARE
    * cluster ids and the vote measures real class structure. */
  def knnClassify(corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queries = broadcast(corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("label").as("true_label")))
    val scored = corpus.join(queries, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("true_label"), col("label"),
        cosSim(col("qv"), col("v")).as("cos_sim"),
        col("vec_id"))
    // bounded top-5 per query (two-phase; label rides in the tag slot),
    // then vote over the ≤5 survivors — the vote window's input is
    // queries×k rows, not the corpus
    val grouped = scored.groupBy("query_id", "true_label")
      .agg(topkUdaf(5)(col("cos_sim"), col("vec_id"), col("label")).as("top"))
    explodeRanked(grouped, Seq("query_id", "true_label"))
      .groupBy(col("query_id"), col("true_label"), col("c.tag").as("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vote_rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("votes").desc, col("label"))))
      .where(col("vote_rank") === 1)
      .select(col("query_id"), col("true_label"), col("label").as("predicted_label"), col("votes"))
      .orderBy("query_id")
  }

  /** K-means centroid UPDATE (the other half of a Lloyd iteration —
    * q71 is the assignment step): dimension means of each cluster's
    * members. Distributed double sums are accumulation-order
    * dependent, which is why q71 left the update un-oracled; this
    * operator makes the update itself deterministic by summing
    * FIXED-POINT values — floor(x·10⁴) as long — so the shuffle-order-
    * independent integer sum divides to the same double everywhere
    * (quantized accumulation, standard practice for reproducible
    * large-scale training). One posexplode + one hash agg on
    * (centroid, dim): 8×64 result rows, no window, corpus streamed
    * once past the assignment join. */
  def kmeansUpdate(corpus: DataFrame, assign: DataFrame): DataFrame =
    corpus.join(assign, Seq("vec_id"))
      .select(col("centroid_id"),
        posexplode(transform(col("v"), x => floor(x * 10000d).cast("long")))
          .as(Seq("dim", "qx")))
      .groupBy("centroid_id", "dim")
      .agg(sum(col("qx")).as("sq"), count(lit(1)).as("n"))
      .select(col("centroid_id"), col("dim").cast("long").as("dim"),
        (col("sq").cast("double") / col("n").cast("double") / lit(10000d)).as("mean"),
        col("n"))
      .orderBy("centroid_id", "dim")

  def q95KmeansUpdate(s: SparkSession, dir: String): DataFrame = {
    val corpus = emb(s, dir)
    val assign = q71KmeansAssign(s, dir).select("vec_id", "centroid_id")
    kmeansUpdate(corpus, assign)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    * scoped to k-means clusters. Every vector is assigned to its
    * max-cosine centroid (the q71 Lloyd step — broadcast seeds,
    * bounded top-1); near-dup EDGES come from the exact-sweep rep-pair
    * kernel (the gate's τ=0.30 is below the banding prunability floor,
    * where banded candidates are near-quadratic anyway — q44's
    * measured regime split; at τ≥~0.5 a production sweep would take
    * [[verifiedRepPairs]]'s banded path with centroid as an extra
    * key), filtered to same-centroid pairs (the paper's semantic
    * scoping); edges become components via min-label propagation, and
    * each component elects ONE keeper — the member with the LOWEST
    * cosine to its centroid (the paper's election: keep the least
    * prototypical example, tiebreak vec_id). Output is a per-document
    * verdict, not just the pair list q44 emits.
    *
    * 100 TB shape: one broadcast assignment pass (N·k cosines, k
    * fixed), exact-first rep collapse, the output-bound sweep kernel
    * over reps (tiled + shuffled past the rep cap) — bounded CC
    * iterations on the edge set, one hash agg for the election. No
    * windows over the corpus. */
  def q104SemDedup(s: SparkSession, dir: String, tau: Double = 0.30): DataFrame =
    semDedup(emb(s, dir), tau)

  /** semDedup's load-bearing intermediates exposed for plan pinning
    * (the setSimStages discipline): the final executed plan hides the
    * sweep kernel behind exactSweepRepPairs' localCheckpoint, so
    * ExplainCheck pins `edges` directly — and because this is a pure
    * extraction, the pinned stage IS the gated query's stage. */
  private[graft] case class SemDedupStages(members: DataFrame, g: DataFrame,
      edges: DataFrame, gPlan: DataFrame)

  private[graft] def semDedupStages(all: DataFrame, tau: Double): SemDedupStages = {
    // exact-first collapse below relies on cos(x, x) = 1.0 >= tau
    require(tau <= 1.0, s"tau=$tau: exact duplicates must qualify as near-dups")
    // Exact-first collapse — the q61 idiom lifted to vectors: identical
    // embeddings share every band signature, centroid cosine, and
    // (cos = 1.0 >= tau) always one component, whose min-id member is
    // the group's own min vec_id. So enumerating pairs over ONE
    // representative per distinct vector preserves components, labels,
    // and the keeper election bit-for-bit, while a duplicate-heavy
    // corpus (the realistic case) stops paying C(groupSize, 2) pair
    // edges per group: the x100 probe corpus (100 exact copies of
    // each vector) collapses from 9.9M intra-group edges to zero
    // before the band join even runs.
    val (members, reps, nReps) = repCollapseIfDup(all)
    val cents = broadcast(all.where(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv")))
    val assigned = reps.crossJoin(cents)
      .select(col("vec_id"), col("centroid_id"),
        cosSim(col("cv"), col("v")).as("cos_c"))
      .groupBy("vec_id")
      .agg(topkUdaf(1)(col("cos_c"), col("centroid_id"), lit("")).as("top"))
      .select(col("vec_id"),
        element_at(col("top"), 1).getField("id").as("centroid_id"),
        element_at(col("top"), 1).getField("score").as("cos_centroid"))
    // gPlan = the assignment lineage (ExplainCheck pins the bounded
    // top-1 aggregate + centroid broadcast there — the lazy checkpoint
    // hides both from every downstream plan); g = the checkpointed
    // frame that feeds the sweep AND two centroid attaches
    val gPlan = reps.join(assigned, "vec_id")
      .select("vec_id", "v", "centroid_id", "cos_centroid")
    val g = gPlan.localCheckpoint(false)
    // Rep pairs via the exact sweep (round-10): the gate's τ=0.30 sits
    // below the banding prunability floor (bandsFor: r=6 < 8 sign
    // bits), where banded candidates are near-quadratic ANYWAY — the
    // round-10 profile measured 300k admitted candidates for 230k true
    // pairs on the 2000-vector realistic corpus, i.e. the banding paid
    // signature+join machinery to prune 24%. q44 already takes the
    // sweep in this regime; semDedup now matches, and the oracle is
    // ground truth (every same-centroid pair at round-4 cos ≥ τ)
    // instead of a banding replay. The paper's semantic scoping
    // (edges never cross centroid cells) applies as a broadcast
    // attach + equality filter on the output-bound pair stream.
    // no broadcast hint on the attaches: the checkpointed two-long-col
    // assignment frame is size-known, so AQE broadcasts it while the
    // dimension fits and shuffles past the rep cap (the same regime
    // split exactSweepRepPairs makes internally)
    val repPairs = exactSweepRepPairs(g.select(col("vec_id"), col("v")), tau,
      knownRepCount = Some(nReps))
    val edges = repPairs
      .join(g.select(col("vec_id").as("ra"), col("centroid_id").as("ca")), "ra")
      .join(g.select(col("vec_id").as("rb"), col("centroid_id").as("cb")), "rb")
      .where(col("ca") === col("cb"))
      .select(col("ra").as("doc_a"), col("rb").as("doc_b"))
    SemDedupStages(members, g, edges, gPlan)
  }

  /** Core of q104 over any (vec_id, v) corpus (centroids = vec_id < 8)
    * — also gated on the realistic clustered embeddings (q183). */
  def semDedup(all: DataFrame, tau: Double): DataFrame = {
    val st = semDedupStages(all, tau)
    val (members, g, edges) = (st.members, st.g, st.edges)
    val comp = TextOps.connectedComponents(edges)
    val repLab = g.join(comp, g("vec_id") === comp("node"), "left")
      .select(g("vec_id").as("rep_id"), col("centroid_id"), col("cos_centroid"),
        coalesce(col("label"), g("vec_id")).as("component"))
    val labelled = members.join(repLab, "rep_id")
      .select(col("vec_id"), col("centroid_id"), col("cos_centroid"), col("component"))
    val keepers = labelled.groupBy("component")
      .agg(min(struct(col("cos_centroid"), col("vec_id"))).as("m"))
      .select(col("component"), col("m.vec_id").as("keep_id"))
    labelled.join(keepers, "component")
      .select(col("vec_id"), col("centroid_id"), col("cos_centroid"), col("component"),
        when(col("vec_id") === col("keep_id"), "keep").otherwise("drop").as("verdict"))
      .orderBy("vec_id")
  }

  /** MMR diversified re-ranking (Carbonell & Goldstein 1998; the
    * standard retrieval diversifier in RAG stacks): greedily select
    * `outK` of the `poolK` most relevant candidates, each pick
    * maximizing λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s). λ is passed as
    * a RATIONAL (num/den) and the objective is cross-multiplied into
    * integer arithmetic over the quantized (×10⁴) cosines —
    * den·score = num·rel_q − (den−num)·max_sim_q — so the greedy
    * trajectory is bit-reproducible on any engine (ties break on
    * cand_id). The gate runs λ = 1/2.
    *
    * 100 TB shape: the corpus is touched ONCE, by the same two-phase
    * bounded TopK as q21 (map-side ≤poolK candidates per query per
    * task); everything after operates on queries × poolK rows —
    * pairwise sims are poolK²/2 per query via a query-keyed equi-join,
    * and the greedy runs per query row over arrays of ≤poolK structs.
    * No window, no corpus sort, no cartesian. */
  private def mmrGreedy(outK: Int, num: Long, den: Long) =
    udf((cands: Seq[org.apache.spark.sql.Row], pairsIn: Seq[org.apache.spark.sql.Row]) => {
      val rel = cands.map(r => r.getLong(0) -> r.getLong(1)).toMap
      // null when the pool has a single member (no pairwise-sim rows)
      val pairs = Option(pairsIn).getOrElse(Seq.empty)
      val sim = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
      pairs.foreach { r =>
        val (a, b, sq) = (r.getLong(0), r.getLong(1), r.getLong(2))
        sim((a, b)) = sq; sim((b, a)) = sq
      }
      val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val remaining = scala.collection.mutable.SortedSet(rel.keys.toSeq: _*)
      while (selected.size < outK && remaining.nonEmpty) {
        val scoredRem = remaining.toSeq.map { c =>
          val s =
            if (selected.isEmpty) num * rel(c)
            else num * rel(c) -
              (den - num) * selected.map(p => sim.getOrElse((c, p._1), 0L)).max
          (c, s)
        }
        val pick = scoredRem.minBy { case (c, s) => (-s, c) }
        selected += pick
        remaining -= pick._1
      }
      selected.zipWithIndex.map { case ((c, s), i) => (i + 1, c, rel(c), s) }
    })

  def q108MmrRerank(s: SparkSession, dir: String, poolK: Int = 12, outK: Int = 5,
      lambdaNum: Long = 1L, lambdaDen: Long = 2L): DataFrame = {
    val corpus = emb(s, dir)
    val queries = broadcast(corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv")))
    val scored = corpus.join(queries, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        cosSim(col("qv"), col("v")).as("rel"))
    val pool = scored.groupBy("query_id")
      .agg(topkUdaf(poolK)(col("rel"), col("cand_id"), lit("")).as("top"))
    val cand = explodeRanked(pool, Seq("query_id"))
      .select(col("query_id"), col("c.id").as("cand_id"),
        round(col("c.score") * 10000d).cast("long").as("rel_q"))
    val pv = cand.join(corpus.select(col("vec_id").as("cand_id"), col("v")), "cand_id")
    val a = pv.select(col("query_id"), col("cand_id").as("a_id"), col("v").as("va"))
    val b = pv.select(col("query_id"), col("cand_id").as("b_id"), col("v").as("vb"))
    val sims = a.join(b, Seq("query_id")).where(col("a_id") < col("b_id"))
      .select(col("query_id"), col("a_id"), col("b_id"),
        round(cosSim(col("va"), col("vb"))
          * 10000d).cast("long").as("sim_q"))
    val cagg = pv.groupBy("query_id")
      .agg(collect_list(struct(col("cand_id"), col("rel_q"))).as("cands"))
    val pagg = sims.groupBy("query_id")
      .agg(collect_list(struct(col("a_id"), col("b_id"), col("sim_q"))).as("pairs"))
    cagg.join(pagg, Seq("query_id"), "left")
      .select(col("query_id"),
        explode(mmrGreedy(outK, lambdaNum, lambdaDen)(col("cands"), col("pairs"))).as("r"))
      .select(col("query_id"), col("r._1").as("rank"), col("r._2").as("cand_id"),
        col("r._3").as("rel_q"), col("r._4").as("mmr_q"))
      .orderBy("query_id", "rank")
  }

  /** Product-quantization ANN (Jégou et al. 2011): compress each
    * 64-d vector to m=4 sub-codes from per-subspace codebooks, then
    * answer top-k by asymmetric distance (query-to-centroid lookup
    * tables) — the memory-bound scale path for 100 TB embedding
    * stores, where the corpus is scanned as 4-byte codes instead of
    * 256-byte vectors. Determinism: all arithmetic is fixed-point
    * (floor(x·10⁴) longs, exact in both engines); codebooks are the
    * sub-vectors of the `codes` lowest vec_ids (the deterministic
    * seeding q71/q95 use); argmin ties break on code id.
    *
    * Scale shape: the codebook (codes × 64 quantized values) and the
    * per-query ADC tables (queries × m × codes longs) are BOUNDED BY
    * CONSTRUCTION, so both ride to executors as literals — encoding
    * and scoring are MAP-ONLY over the corpus (the plan has no join
    * and no corpus-wide shuffle), and the only exchange is the
    * bounded two-phase TopK per query, exactly q21's shape. */
  def pqAnn(embDf: DataFrame, m: Int = 4, codes: Int = 16,
            nQueries: Int = 10, k: Int = 5, dim: Int = 64): DataFrame = {
    val sub = dim / m
    val qv = transform(col("embedding"), x => floor(x.cast("double") * 10000).cast("long"))
    val base = embDf.select(col("vec_id"), qv.as("qv"))

    // codebook: [subspace][code][dim] — bounded collect (codes rows)
    val cbVecs: Seq[(Long, Seq[Long])] = base.where(col("vec_id") < codes)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSeq
    val cb: Seq[Seq[Seq[Long]]] =
      (0 until m).map(j => cbVecs.map(_._2.slice(j * sub, j * sub + sub)))
    val cbLit = typedLit(cb)

    def sqdist(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)

    // encode: nearest sub-centroid per subspace, ties to lowest code
    val codeCols = (0 until m).map { j =>
      val sv = slice(col("qv"), j * sub + 1, sub)
      array_min(transform(sequence(lit(0), lit(codes - 1)), c =>
        struct(
          sqdist(sv, element_at(element_at(cbLit, j + 1), c + 1)).as("dist"),
          c.as("code")))).getField("code")
    }
    val encoded = base.select(col("vec_id"), array(codeCols: _*).as("codes"))

    // ADC tables: per query, per subspace, distance to each centroid —
    // bounded collect (nQueries × m × codes longs), shipped as a literal
    val queryRows = base.where(col("vec_id") < nQueries).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSeq
    val qids: Seq[Long] = queryRows.map(_._1)
    val tab: Seq[Seq[Seq[Long]]] = queryRows.map { case (_, v) =>
      (0 until m).map { j =>
        val qsv = v.slice(j * sub, j * sub + sub)
        cb(j).map(cent => qsv.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
    }
    val tabLit = typedLit(tab)
    val qidLit = typedLit(qids)

    // score map-only: explode the bounded query axis, sum m lookups
    val adc = (0 until m)
      .map(j => element_at(element_at(element_at(tabLit, col("qi") + 1), j + 1),
        element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    val topk = topkUdaf(k)
    encoded
      .select(col("vec_id"), col("codes"),
        explode(sequence(lit(0), lit(nQueries - 1))).as("qi"))
      .select(col("vec_id"), element_at(qidLit, col("qi") + 1).as("query_id"),
        adc.as("pq_dist"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy("query_id")
      .agg(topk((-col("pq_dist")).cast("double"), col("vec_id"), lit("")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "c")))
      .select(col("query_id"), col("c.id").as("neighbor_id"),
        (-col("c.score")).cast("long").as("pq_dist"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  def q113PqAnn(s: SparkSession, dir: String): DataFrame =
    pqAnn(embeddingsFanned(s, dir).select("vec_id", "embedding"))

  /** IVF-PQ — the production ANN composition (Jégou et al. 2011 §IV):
    * a coarse quantizer routes each vector to its nearest of `nCells`
    * centroids, PQ codes are learned on the RESIDUAL (vector minus
    * its cell centroid), and a query scans only its `nProbe` nearest
    * cells, scoring candidates by asymmetric distance against an ADC
    * table built from the query's residual in each probed cell.
    * q45 (IVF) and q113 (PQ) are the two halves; this is the
    * composition a real vector store ships.
    *
    * Everything is fixed-point integer (floor(x·10⁴), the q113/q95
    * idiom) with deterministic tie-breaks (dist, then id), so the
    * DuckDB oracle replays the exact pipeline. Coarse centroids =
    * first nCells vectors; PQ codebook = residuals of the first
    * `codes` vectors — bounded driver collects shipped as literals.
    *
    * 100 TB shape: assignment, residual, and encoding are MAP-ONLY
    * column expressions (centroids + codebook are literals); scoring
    * explodes the bounded (query × probe) axis and filters to probed
    * cells — the corpus is scanned once, candidates are
    * nProbe/nCells of it, and the bounded TopK keeps ≤k per query
    * per task. No join, no window, no corpus sort. */
  def ivfPqAnn(embDf: DataFrame, nCells: Int = 8, m: Int = 4, codes: Int = 16,
      nProbe: Int = 2, nQueries: Int = 10, k: Int = 3, dim: Int = 64): DataFrame = {
    val sub = dim / m
    val qvCol = transform(col("embedding"), x => floor(x.cast("double") * 10000).cast("long"))
    val base = embDf.select(col("vec_id"), qvCol.as("qv"))

    def l2(a: Seq[Long], b: Seq[Long]): Long =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    def sqdist(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)

    // bounded driver collects: centroids, codebook sources, queries
    val centArr: Seq[Seq[Long]] = base.where(col("vec_id") < nCells)
      .orderBy("vec_id").collect().map(_.getSeq[Long](1).toSeq).toSeq
    def cellOf(v: Seq[Long]): Int =
      centArr.zipWithIndex.map { case (cv, cid) => (l2(v, cv), cid) }.min._2
    def residual(v: Seq[Long]): Seq[Long] =
      v.lazyZip(centArr(cellOf(v))).map(_ - _)
    val cbRows = base.where(col("vec_id") < codes).orderBy("vec_id").collect()
      .map(_.getSeq[Long](1).toSeq).toSeq
    // codebook[subspace][code] = residual subvector of the code-th vector
    val cb: Seq[Seq[Seq[Long]]] = (0 until m).map { j =>
      cbRows.map(v => residual(v).slice(j * sub, j * sub + sub))
    }
    val centLit = typedLit(centArr)
    val cbLit = typedLit(cb)

    // map-only: cell assignment, residual, per-subspace encoding
    val cellCol = array_min(transform(sequence(lit(0), lit(nCells - 1)), c =>
      struct(sqdist(col("qv"), element_at(centLit, c + 1)).as("dist"),
        c.as("cid")))).getField("cid")
    val withCell = base.select(col("vec_id"), col("qv"), cellCol.as("cell"))
    val rvCol = zip_with(col("qv"), element_at(centLit, col("cell") + 1), (x, c) => x - c)
    val withRes = withCell.select(col("vec_id"), col("cell"), rvCol.as("rv"))
    val codeCols = (0 until m).map { j =>
      val sv = slice(col("rv"), j * sub + 1, sub)
      array_min(transform(sequence(lit(0), lit(codes - 1)), c =>
        struct(sqdist(sv, element_at(element_at(cbLit, j + 1), c + 1)).as("dist"),
          c.as("code")))).getField("code")
    }
    val encoded = withRes.select(col("vec_id"), col("cell"), array(codeCols: _*).as("codes"))

    // driver: per-query probed cells + ADC tables tab[qi][p][j][code]
    val queryRows = base.where(col("vec_id") < nQueries).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSeq
    val probes: Seq[Seq[Int]] = queryRows.map { case (_, v) =>
      centArr.zipWithIndex.map { case (cv, cid) => (l2(v, cv), cid) }
        .sorted.take(nProbe).map(_._2)
    }
    val tab: Seq[Seq[Seq[Seq[Long]]]] = queryRows.zip(probes).map { case ((_, v), ps) =>
      ps.map { cell =>
        val rv = v.lazyZip(centArr(cell)).map(_ - _).toSeq
        (0 until m).map(j => cb(j).map(cent => l2(rv.slice(j * sub, j * sub + sub), cent)))
      }
    }
    val qidLit = typedLit(queryRows.map(_._1))
    val probeCellLit = typedLit(probes.map(_.map(_.toLong)))
    val tabLit = typedLit(tab)

    val adc = (0 until m).map(j =>
      element_at(element_at(element_at(element_at(tabLit, col("qi") + 1),
        col("p") + 1), j + 1), element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    val topk = topkUdaf(k)
    encoded
      .select(col("vec_id"), col("cell"), col("codes"),
        explode(sequence(lit(0), lit(nQueries - 1))).as("qi"))
      .select(col("vec_id"), col("cell"), col("codes"), col("qi"),
        explode(sequence(lit(0), lit(nProbe - 1))).as("p"))
      // IVF: only vectors in a probed cell are ever scored
      .where(col("cell").cast("long") ===
        element_at(element_at(probeCellLit, col("qi") + 1), col("p") + 1))
      .select(col("vec_id"),
        element_at(qidLit, col("qi") + 1).as("query_id"), adc.as("pq_dist"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy("query_id")
      .agg(topk((-col("pq_dist")).cast("double"), col("vec_id"), lit("")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "c")))
      .select(col("query_id"), col("c.id").as("neighbor_id"),
        (-col("c.score")).cast("long").as("pq_dist"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  def q117IvfPq(s: SparkSession, dir: String): DataFrame =
    ivfPqAnn(embeddingsFanned(s, dir).select("vec_id", "embedding"))

  /** Near-dup at the REALISTIC sweep threshold — gates the
    * bandsFor(0.9) calibration point (r=21, b=60; 2M buckets per
    * band) that q44's synthetic τ=0.30 never exercises. The corpus
    * is doubled with exact replicas (vec_id + 100000), so the true
    * pair set is non-empty (every replica pair at cos 1.0 ≥ 0.9,
    * plus any original pairs ≥ 0.9) and the whole banded + collapsed
    * + expanded pipeline runs end-to-end under the oracle at the
    * parameters a production near-dup sweep uses. */
  def q121NeardupHighTau(s: SparkSession, dir: String): DataFrame =
    // NOT fanned (round 14, measured): the banded-signature map work
    // here is cheaper than the repartition it would ride —
    // same-window A/B 1.43 s plain vs 1.95 s fanned
    neardupHighTau(emb(s, dir).select(col("vec_id"), col("v")))

  /** Core of q121 over any (vec_id, v) corpus — also gated on the
    * realistic clustered embeddings (q182). */
  def neardupHighTau(orig: DataFrame): DataFrame = {
    val tau = 0.9
    require(tau <= 1.0)
    val all = orig.unionByName(
      orig.select((col("vec_id") + 100000L).as("vec_id"), col("v")))
    val (members, reps, nReps) = repCollapseIfDup(all)
    val repPairs = verifiedRepPairs(reps, tau, knownRepCount = Some(nReps))
    val ma = members.select(col("vec_id").as("ida"), col("rep_id").as("ra"))
    val mb = members.select(col("vec_id").as("idb"), col("rep_id").as("rb"))
    val cross = repPairs.join(ma, "ra").join(mb, "rb")
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"), col("cos_sim"))
    val intra = members.as("m1").join(members.as("m2"),
        col("m1.rep_id") === col("m2.rep_id") && col("m1.vec_id") < col("m2.vec_id"))
      .select(col("m1.vec_id").as("doc_a"), col("m2.vec_id").as("doc_b"),
        lit(1.0d).as("cos_sim"))
    cross.unionByName(intra).orderBy("doc_a", "doc_b")
  }

  /** Contrastive-pair mining for embedding training: per query vector,
    * the hardest POSITIVE (most-similar same-label neighbor) and the
    * hardest NEGATIVE (most-similar different-label neighbor — the
    * pairs that actually move a contrastive loss). One broadcast of
    * the tiny query set, one corpus stream, and per-class argmax as a
    * single `max_by` aggregate — no per-query sort, no top-k state
    * beyond one (ordkey, id) pair. Determinism: similarity quantizes
    * to 4-dp fixed point and orders by the (cos, -neighbor_id) STRUCT
    * (max cos, then min id — lexicographic struct comparison, no
    * id-range precondition). At 100 TB the corpus
    * side swaps for any of the gated ANN structures (q22/q45/q113)
    * unchanged — the mining aggregate is structure-agnostic. */
  def q153HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val corpus = emb(s, dir)
    val qset = broadcast(corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("v").as("qv")))
    val scored = corpus.join(qset, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qlabel"), col("label"),
        col("vec_id").as("neighbor_id"),
        round(cosSim(col("qv"), col("v")) * 10000).cast("long").as("cosq"))
      .withColumn("ordkey", struct(col("cosq"), (-col("neighbor_id")).as("nid")))
    val pos = scored.where(col("label") === col("qlabel")).groupBy("query_id")
      .agg(max_by(col("neighbor_id"), col("ordkey")).as("pos_id"),
        max("cosq").as("pos_cosq"))
    val neg = scored.where(col("label") =!= col("qlabel")).groupBy("query_id")
      .agg(max_by(col("neighbor_id"), col("ordkey")).as("neg_id"),
        max("cosq").as("neg_cosq"))
    pos.join(neg, "query_id").orderBy("query_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q153_hard_negatives" -> (q153HardNegatives _),
    "q113_pq_ann" -> ((s, d) => q113PqAnn(s, d)),
    "q117_ivf_pq" -> ((s, d) => q117IvfPq(s, d)),
    "q121_neardup_hightau" -> (q121NeardupHighTau _),
    "q21_ann_brute" -> (q21AnnBrute _),
    "q22_ann_lsh" -> ((s, d) => q22AnnLsh(s, d)),
    "q23_knn_classify" -> (q23KnnClassify _),
    "q44_embed_neardup" -> ((s, d) => q44EmbedNearDup(s, d)),
    "q45_ann_ivf" -> (q45AnnIvf _),
    "q71_kmeans_assign" -> (q71KmeansAssign _),
    "q95_kmeans_update" -> (q95KmeansUpdate _),
    "q104_semdedup" -> ((s, d) => q104SemDedup(s, d)),
    "q108_mmr_rerank" -> ((s, d) => q108MmrRerank(s, d)),
    "q200_hybrid_rrf" -> (q200HybridRrf _))

  /** Hybrid retrieval with Reciprocal-Rank Fusion (Cormack et al.
    * 2009, the standard lexical+vector fusion in RAG stacks): per
    * query, a BM25 lexical ranking (TextOps.bm25 — one scan + hash
    * aggs) and a cosine vector ranking (broadcast query side, exact
    * scores) each keep their top 20; fusion scores every candidate
    * 1/(60+rank) per leg it appears in (missing leg contributes 0 —
    * the canonical RRF form) and the top 5 fused per query ship.
    *
    * Determinism across engines: ranks derive from the gated BM25
    * doubles (one pivoted row per (doc, term) — no accumulation-order
    * freedom) and the round-4 cosine; the RRF sum is TWO terms in a
    * fixed scalar expression, so IEEE addition is order-free.
    *
    * 100 TB shape: the corpus is touched once per leg (lexical: tf
    * hash agg; vector: broadcast-query scan — swap in the IVF/PQ
    * candidates for the gated brute scan unchanged); every window is
    * partitioned by query_id over ≤ top-k rows, never the corpus. */
  def q200HybridRrf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queryTerms = Seq(0L -> Seq("hash", "join", "merge"),
      1L -> Seq("filter", "scan"), 2L -> Seq("stream", "window", "batch"))
    val docs = documents(s, dir)
    val lex = queryTerms.map { case (qid, ts) =>
      TextOps.bm25(docs, ts).withColumn("query_id", lit(qid)) }
      .reduce(_ unionByName _)
    val wLex = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    val lexRank = lex.where(col("doc_id") =!= col("query_id"))
      .withColumn("r", row_number().over(wLex)).where(col("r") <= 20)
      .select(col("query_id"), col("doc_id"), col("r").as("lex_rank"))
    val corpus = emb(s, dir)
    val queries = broadcast(corpus
      .where(col("vec_id").isin(queryTerms.map(_._1): _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv")))
    val vscored = corpus.crossJoin(queries)
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        cosSim(col("qv"), col("v")).as("cos"))
    val wVec = Window.partitionBy("query_id").orderBy(col("cos").desc, col("doc_id"))
    val vecRank = vscored.withColumn("r", row_number().over(wVec)).where(col("r") <= 20)
      .select(col("query_id"), col("doc_id"), col("r").as("vec_rank"))
    val fused = lexRank.join(vecRank, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60.0) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("vec_rank")), lit(0.0)))
    val wF = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(wF)).where(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("rrf"))
      .orderBy("query_id", "rank")
  }

  private val cosSql =
    """ROUND(list_sum(list_transform(q.qv, (x,i) -> x * c.v[i])) /
      |(SQRT(list_sum(list_transform(q.qv, (x,i) -> x * q.qv[i]))) *
      | SQRT(list_sum(list_transform(c.v, (x,i) -> x * c.v[i])))), 4)""".stripMargin

  /** SQL twin of the banded signatures: CTEs `coefl`/`sigbit`/`sig`
    * over an existing `e(vec_id, v)`. Same md5 coefficient rule and
    * GLOBAL plane index as [[graft.spark.LshPlanes]], same sequential
    * list fold for the sign dot products, and (r, b) interpolated from
    * the SAME [[bandsFor]] call the Spark side makes — the two engines
    * cannot drift. `sig` has (vec_id, j band index, sg signature). */
  private def bandSigSql(tau: Double): String = {
    val (r, b) = bandsFor(tau)
    // one row per (vec, band) — NOT per (vec, bit): the old
    // e CROSS JOIN coefl intermediate was |corpus| x b·r rows (5M at
    // q182's doubled realistic corpus) and drove the oracle's peak RSS
    // to 5.3 GB, squarely in this sandbox's allocation-flake zone; the
    // band-granular form computes the same r dot products inside one
    // list_transform against a single nested coefficient row (~5 MB)
    // and peaks an order of magnitude lower. Output is value-identical:
    // bit k of band j reads coefficient row pl = j·r + k, ascending.
    s"""coefl AS (
       |  SELECT p.range AS pl, list_transform(range(0, 64), d ->
       |    CAST(CAST(('0x' || substr(md5(CAST(p.range AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 8)) AS UBIGINT) % 1000 AS DOUBLE)/1000 - 0.5) AS cl
       |  FROM range(0, ${b * r}) p),
       |coefm AS MATERIALIZED (SELECT list(cl ORDER BY pl) AS cls FROM coefl),
       |sig AS (
       |  SELECT e.vec_id, jj.range AS j,
       |    list_aggregate(list_transform(range(0, $r), k ->
       |      CASE WHEN list_sum(list_transform(e.v,
       |        (x,i) -> x * m.cls[CAST(jj.range * $r + k AS BIGINT) + 1][i])) > 0
       |      THEN '1' ELSE '0' END), 'string_agg', '') AS sg
       |  FROM e CROSS JOIN range(0, $b) jj CROSS JOIN coefm m)""".stripMargin
  }

  /** Connected components as UNROLLED min-label propagation — the
    * non-recursive oracle formulation for DuckDB (replacing the
    * `WITH RECURSIVE walk` whose node×label closure table is quadratic
    * in component size and blew DuckDB's memory on the realistic
    * clustered corpus, q183). Emits CTEs `l0..l$steps`, `l_last`
    * (alias of the last step) and `conv` (count of labels that would
    * still move on one MORE step). The CALLER must gate on
    * `(SELECT bad FROM conv) = 0` so an under-unrolled run fails
    * loudly, never silently: min labels reach everything within
    * `steps` hops on these corpora (near-clique cluster cores,
    * 2-node planted chains), and if a future corpus ever needs more,
    * the gate hash-mismatches instead of shipping wrong components.
    * `edgesRel` must hold BOTH directions of every edge (a, b). */
  private[queries] def ccUnrolledSql(edgesRel: String, steps: Int = 12): String = {
    // AS MATERIALIZED is load-bearing: each step references its
    // predecessor twice, and DuckDB's default CTE inlining would
    // duplicate the whole upstream pipeline per reference — 2^steps
    // copies by the last step (measured: the un-materialized form ran
    // for minutes; materialized, the full chain is sub-second)
    val l0 = s"l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM $edgesRel),"
    val ls = (1 to steps + 1).map { t =>
      s"""l$t AS MATERIALIZED (
         |  SELECT n.node, MIN(n.label) AS label FROM (
         |    SELECT node, label FROM l${t - 1}
         |    UNION ALL
         |    SELECT e$t.a AS node, l.label FROM $edgesRel e$t JOIN l${t - 1} l ON l.node = e$t.b
         |  ) n GROUP BY n.node),""".stripMargin
    }.mkString("\n")
    s"""$l0
       |$ls
       |l_last AS (SELECT node, label FROM l$steps),
       |conv AS (
       |  SELECT COUNT(*) AS bad FROM l$steps x JOIN l${steps + 1} y
       |  ON x.node = y.node AND x.label <> y.label),""".stripMargin
  }

  /** K-means centroid assignment (the Lloyd assignment step): every
    * vector goes to its max-cosine centroid among the 8 broadcast
    * seeds (vec_id < 8). Same two-phase bounded-aggregate shape as
    * q21 with k=1 — no window, the corpus streams once. The centroid
    * UPDATE (dimension means) is deliberately not oracle-compared:
    * distributed double sums are accumulation-order dependent;
    * assignment is the deterministic, comparable step. */
  def q71KmeansAssign(s: SparkSession, dir: String): DataFrame = {
    val corpus = emb(s, dir)
    val cents = broadcast(corpus.where(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv")))
    val scored = corpus.crossJoin(cents)
      .select(col("vec_id"), col("centroid_id"),
        cosSim(col("cv"), col("v")).as("cos_sim"))
    val grouped = scored.groupBy("vec_id")
      .agg(topkUdaf(1)(col("cos_sim"), col("centroid_id"), lit("")).as("top"))
    explodeRanked(grouped, Seq("vec_id"))
      .select(col("vec_id"), col("c.id").as("centroid_id"), col("c.score").as("cos_sim"))
      .orderBy("vec_id")
  }

  val oracle: Map[String, String] = Map(
    // RRF hybrid: the q87 BM25 CTEs generalized to three query term
    // sets (per-leg FIXED-ORDER pivot addition — the reduceLeft chain
    // the Spark side folds, so no double-accumulation freedom), the
    // exact-cosine vector leg, ROW_NUMBER ranks capped at 20, and the
    // two-term RRF sum (IEEE addition of two scalars is order-free)
    "q200_hybrid_rrf" -> {
      val qts = Seq(0 -> Seq("hash", "join", "merge"),
        1 -> Seq("filter", "scan"), 2 -> Seq("stream", "window", "batch"))
      val allTerms = qts.flatMap(_._2).distinct.map(t => s"'$t'").mkString(", ")
      def sumCase(t: String) =
        s"SUM(CASE WHEN term = '$t' THEN tscore ELSE CAST(0.0 AS DOUBLE) END)"
      val lexLegs = qts.map { case (q, ts) =>
        val in = ts.map(t => s"'$t'").mkString(", ")
        val pivot = ts.map(sumCase).reduceLeft((a, b) => s"($a + $b)")
        s"""  SELECT CAST($q AS BIGINT) AS query_id, doc_id, $pivot AS score
           |  FROM scored WHERE term IN ($in) GROUP BY doc_id""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |docs AS (
        |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, w FROM d),
        |tf AS (
        |  SELECT doc_id, dl, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, dl, unnest(w) AS t FROM docs)
        |  WHERE t IN ($allTerms)
        |  GROUP BY 1, 2, 3),
        |stats AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
        |  FROM docs),
        |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT doc_id, term,
        |    ((CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
        |    ((CAST(tf AS DOUBLE) * 2.2) /
        |     (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))) AS tscore
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
        |lex AS (
        |$lexLegs),
        |lexrank AS (
        |  SELECT query_id, doc_id, CAST(rn AS INT) AS lex_rank FROM (
        |    SELECT query_id, doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
        |    FROM lex WHERE doc_id <> query_id) WHERE rn <= 20),
        |e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (0, 1, 2)),
        |vscored AS (
        |  SELECT q.query_id, c.vec_id AS doc_id, $cosSql AS cos
        |  FROM e c CROSS JOIN q WHERE c.vec_id <> q.query_id),
        |vrank AS (
        |  SELECT query_id, doc_id, CAST(rn AS INT) AS vec_rank FROM (
        |    SELECT query_id, doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rn
        |    FROM vscored) WHERE rn <= 20),
        |fused AS (
        |  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
        |         COALESCE(l.doc_id, v.doc_id) AS doc_id,
        |         COALESCE(1.0 / (60.0 + l.lex_rank), 0.0) +
        |         COALESCE(1.0 / (60.0 + v.vec_rank), 0.0) AS rrf
        |  FROM lexrank l FULL OUTER JOIN vrank v
        |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, rrf FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank
        |  FROM fused)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },
    // IVF-PQ replay: same fixed-point quantization, first-8 coarse
    // centroids (argmin L2, tie -> lower cid), residual PQ codebook
    // from the first 16 vectors, 2-cell probes, per-(query, cell)
    // ADC tables, rank by (pq_dist, neighbor_id) — all integer
    "q117_ivf_pq" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS cid, qv AS cv FROM e WHERE vec_id < 8),
        |asg0 AS (
        |  SELECT e.vec_id, c.cid,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      d -> (e.qv[d] - c.cv[d]) * (e.qv[d] - c.cv[d]))) AS BIGINT) AS dist
        |  FROM e CROSS JOIN cents c),
        |asg AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM asg0) WHERE rn = 1),
        |res AS (
        |  SELECT e.vec_id, a.cell,
        |    list_transform(range(1, 65), d -> e.qv[d] - c.cv[d]) AS rv
        |  FROM e JOIN asg a USING (vec_id) JOIN cents c ON c.cid = a.cell),
        |sub AS (
        |  SELECT vec_id, cell, CAST(j AS BIGINT) AS j,
        |         rv[CAST(j * 16 + 1 AS INT):CAST(j * 16 + 16 AS INT)] AS sv
        |  FROM res, UNNEST(range(0, 4)) AS t(j)),
        |cbsub AS (SELECT vec_id AS code, j, sv AS cvv FROM sub WHERE vec_id < 16),
        |enc0 AS (
        |  SELECT s.vec_id, s.j, c.code,
        |    CAST(list_sum(list_transform(range(1, 17),
        |      d -> (s.sv[d] - c.cvv[d]) * (s.sv[d] - c.cvv[d]))) AS BIGINT) AS dist
        |  FROM sub s JOIN cbsub c ON s.j = c.j),
        |enc AS (
        |  SELECT vec_id, j, code FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY dist, code) AS rn
        |    FROM enc0) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cid AS cell FROM (
        |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM asg0 WHERE vec_id < 10) WHERE rn <= 2),
        |qres AS (
        |  SELECT p.query_id, p.cell,
        |    list_transform(range(1, 65), d -> e.qv[d] - c.cv[d]) AS rv
        |  FROM probes p JOIN e ON e.vec_id = p.query_id JOIN cents c ON c.cid = p.cell),
        |qsub AS (
        |  SELECT query_id, cell, CAST(j AS BIGINT) AS j,
        |         rv[CAST(j * 16 + 1 AS INT):CAST(j * 16 + 16 AS INT)] AS sv
        |  FROM qres, UNNEST(range(0, 4)) AS t(j)),
        |tab AS (
        |  SELECT q.query_id, q.cell, q.j, c.code,
        |    CAST(list_sum(list_transform(range(1, 17),
        |      d -> (q.sv[d] - c.cvv[d]) * (q.sv[d] - c.cvv[d]))) AS BIGINT) AS pdist
        |  FROM qsub q JOIN cbsub c ON q.j = c.j),
        |adc AS (
        |  SELECT t.query_id, x.vec_id AS neighbor_id,
        |    CAST(SUM(t.pdist) AS BIGINT) AS pq_dist
        |  FROM enc x JOIN asg a ON a.vec_id = x.vec_id
        |  JOIN tab t ON t.cell = a.cell AND t.j = x.j AND t.code = x.code
        |  WHERE x.vec_id <> t.query_id GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY pq_dist, neighbor_id) AS rank FROM adc)
        |SELECT query_id, neighbor_id, pq_dist, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    // fixed-point PQ replay: same floor(x·10⁴) quantization, same
    // first-16 codebook, same argmin tie-break (dist, code), same
    // ADC sum — all integer, so the hash matches exactly
    "q113_pq_ann" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |sub AS (
        |  SELECT vec_id, CAST(j AS BIGINT) AS j,
        |         qv[CAST(j * 16 + 1 AS INT):CAST(j * 16 + 16 AS INT)] AS sv
        |  FROM e, UNNEST(range(0, 4)) AS t(j)),
        |cbsub AS (SELECT vec_id AS code, j, sv AS cv FROM sub WHERE vec_id < 16),
        |enc0 AS (
        |  SELECT s.vec_id, s.j, c.code,
        |    CAST(list_sum(list_transform(range(1, 17),
        |      d -> (s.sv[d] - c.cv[d]) * (s.sv[d] - c.cv[d]))) AS BIGINT) AS dist
        |  FROM sub s JOIN cbsub c ON s.j = c.j),
        |enc AS (
        |  SELECT vec_id, j, code FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY dist, code) AS rn
        |    FROM enc0) WHERE rn = 1),
        |tab AS (
        |  SELECT q.vec_id AS query_id, q.j, c.code,
        |    CAST(list_sum(list_transform(range(1, 17),
        |      d -> (q.sv[d] - c.cv[d]) * (q.sv[d] - c.cv[d]))) AS BIGINT) AS pdist
        |  FROM sub q JOIN cbsub c ON q.j = c.j WHERE q.vec_id < 10),
        |adc AS (
        |  SELECT t.query_id, x.vec_id AS neighbor_id,
        |    CAST(SUM(t.pdist) AS BIGINT) AS pq_dist
        |  FROM enc x JOIN tab t ON x.j = t.j AND x.code = t.code
        |  WHERE x.vec_id <> t.query_id GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY pq_dist, neighbor_id) AS rank FROM adc)
        |SELECT query_id, neighbor_id, pq_dist, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // λ = 1/2 cross-multiplied: mmr_q = rel_q − max sim_q (first pick
    // = rel_q). Greedy unrolled to the gate's outK = 5 steps; every
    // comparison is integer, ties break on cand_id — the exact
    // trajectory the Spark-side greedy walks.
    "q108_mmr_rerank" ->
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS cand_id, $cosSql AS rel
        |  FROM e c CROSS JOIN q WHERE c.vec_id <> q.query_id),
        |pool AS (
        |  SELECT query_id, cand_id, CAST(ROUND(rel * 10000) AS BIGINT) AS rel_q FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rn
        |    FROM scored) WHERE rn <= 12),
        |pv AS (SELECT p.query_id, p.cand_id, p.rel_q, e.v
        |       FROM pool p JOIN e ON e.vec_id = p.cand_id),
        |pr AS (
        |  SELECT a.query_id, a.cand_id AS a_id, b.cand_id AS b_id,
        |    CAST(ROUND(ROUND(list_sum(list_transform(a.v, (x,i) -> x * b.v[i])) /
        |      (SQRT(list_sum(list_transform(a.v, (x,i) -> x * a.v[i]))) *
        |       SQRT(list_sum(list_transform(b.v, (x,i) -> x * b.v[i])))), 4) * 10000)
        |      AS BIGINT) AS sim_q
        |  FROM pv a JOIN pv b ON a.query_id = b.query_id AND a.cand_id < b.cand_id),
        |simf AS (SELECT query_id, a_id, b_id, sim_q FROM pr
        |         UNION ALL SELECT query_id, b_id, a_id, sim_q FROM pr),
        |sel1 AS (
        |  SELECT query_id, cand_id, rel_q, rel_q AS mmr_q FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel_q DESC, cand_id) AS rn
        |    FROM pv) WHERE rn = 1),
        |prev2 AS (SELECT query_id, cand_id FROM sel1),
        |r2 AS (
        |  SELECT p.query_id, p.cand_id, p.rel_q, p.rel_q - MAX(f.sim_q) AS mmr_q
        |  FROM pv p
        |  JOIN simf f ON f.query_id = p.query_id AND f.a_id = p.cand_id
        |  JOIN prev2 s ON s.query_id = p.query_id AND s.cand_id = f.b_id
        |  LEFT JOIN prev2 x ON x.query_id = p.query_id AND x.cand_id = p.cand_id
        |  WHERE x.cand_id IS NULL
        |  GROUP BY p.query_id, p.cand_id, p.rel_q),
        |sel2 AS (SELECT query_id, cand_id, rel_q, mmr_q FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY mmr_q DESC, cand_id) AS rn
        |  FROM r2) WHERE rn = 1),
        |prev3 AS (SELECT query_id, cand_id FROM sel1
        |          UNION ALL SELECT query_id, cand_id FROM sel2),
        |r3 AS (
        |  SELECT p.query_id, p.cand_id, p.rel_q, p.rel_q - MAX(f.sim_q) AS mmr_q
        |  FROM pv p
        |  JOIN simf f ON f.query_id = p.query_id AND f.a_id = p.cand_id
        |  JOIN prev3 s ON s.query_id = p.query_id AND s.cand_id = f.b_id
        |  LEFT JOIN prev3 x ON x.query_id = p.query_id AND x.cand_id = p.cand_id
        |  WHERE x.cand_id IS NULL
        |  GROUP BY p.query_id, p.cand_id, p.rel_q),
        |sel3 AS (SELECT query_id, cand_id, rel_q, mmr_q FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY mmr_q DESC, cand_id) AS rn
        |  FROM r3) WHERE rn = 1),
        |prev4 AS (SELECT query_id, cand_id FROM prev3
        |          UNION ALL SELECT query_id, cand_id FROM sel3),
        |r4 AS (
        |  SELECT p.query_id, p.cand_id, p.rel_q, p.rel_q - MAX(f.sim_q) AS mmr_q
        |  FROM pv p
        |  JOIN simf f ON f.query_id = p.query_id AND f.a_id = p.cand_id
        |  JOIN prev4 s ON s.query_id = p.query_id AND s.cand_id = f.b_id
        |  LEFT JOIN prev4 x ON x.query_id = p.query_id AND x.cand_id = p.cand_id
        |  WHERE x.cand_id IS NULL
        |  GROUP BY p.query_id, p.cand_id, p.rel_q),
        |sel4 AS (SELECT query_id, cand_id, rel_q, mmr_q FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY mmr_q DESC, cand_id) AS rn
        |  FROM r4) WHERE rn = 1),
        |prev5 AS (SELECT query_id, cand_id FROM prev4
        |          UNION ALL SELECT query_id, cand_id FROM sel4),
        |r5 AS (
        |  SELECT p.query_id, p.cand_id, p.rel_q, p.rel_q - MAX(f.sim_q) AS mmr_q
        |  FROM pv p
        |  JOIN simf f ON f.query_id = p.query_id AND f.a_id = p.cand_id
        |  JOIN prev5 s ON s.query_id = p.query_id AND s.cand_id = f.b_id
        |  LEFT JOIN prev5 x ON x.query_id = p.query_id AND x.cand_id = p.cand_id
        |  WHERE x.cand_id IS NULL
        |  GROUP BY p.query_id, p.cand_id, p.rel_q),
        |sel5 AS (SELECT query_id, cand_id, rel_q, mmr_q FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY mmr_q DESC, cand_id) AS rn
        |  FROM r5) WHERE rn = 1)
        |SELECT query_id, CAST(1 AS INT) AS rank, cand_id, rel_q, mmr_q FROM sel1
        |UNION ALL SELECT query_id, CAST(2 AS INT), cand_id, rel_q, mmr_q FROM sel2
        |UNION ALL SELECT query_id, CAST(3 AS INT), cand_id, rel_q, mmr_q FROM sel3
        |UNION ALL SELECT query_id, CAST(4 AS INT), cand_id, rel_q, mmr_q FROM sel4
        |UNION ALL SELECT query_id, CAST(5 AS INT), cand_id, rel_q, mmr_q FROM sel5
        |ORDER BY query_id, rank""".stripMargin,
    "q104_semdedup" ->
      // connected components WITHOUT a recursive CTE (round-9): the
      // old `WITH RECURSIVE walk` enumerated node x reachable-label
      // pairs — quadratic in component size on the realistic clustered
      // corpus's near-clique cores, and the proximate cause of q183's
      // DuckDB out-of-memory flakes. The unrolled min-label
      // propagation below is linear per step (|nodes| + |edges| rows),
      // and the convergence check makes an under-unrolled run FAIL
      // LOUDLY (comp empties -> every component coalesces to vec_id ->
      // hash mismatch) instead of silently wrong.
      // Edges are GROUND TRUTH (round-10, matching the Spark sweep
      // swap): every same-centroid pair at round-4 cos >= tau — no
      // banding replay (the weak-tau regime where banding prunes
      // nothing; measured 4.8 s over the full 2000-vector corpus).
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
        |centcos AS (
        |  SELECT c.vec_id, q.centroid_id,
        |    ROUND(list_sum(list_transform(q.cv, (x,i) -> x * c.v[i])) /
        |      (SQRT(list_sum(list_transform(q.cv, (x,i) -> x * q.cv[i]))) *
        |       SQRT(list_sum(list_transform(c.v, (x,i) -> x * c.v[i])))), 4) AS cos_c
        |  FROM e c CROSS JOIN cents q),
        |asg AS (
        |  SELECT vec_id, centroid_id, cos_c AS cos_centroid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, centroid_id) AS rn
        |    FROM centcos) WHERE rn = 1),
        |pairs AS MATERIALIZED (
        |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  JOIN asg aa ON aa.vec_id = a.vec_id
        |  JOIN asg ab ON ab.vec_id = b.vec_id AND ab.centroid_id = aa.centroid_id
        |  WHERE ROUND(list_sum(list_transform(a.v, (x,i) -> x * b.v[i])) /
        |      (SQRT(list_sum(list_transform(a.v, (x,i) -> x * a.v[i]))) *
        |       SQRT(list_sum(list_transform(b.v, (x,i) -> x * b.v[i])))), 4) >= 0.30),
        |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |${ccUnrolledSql("edges")}
        |comp AS (SELECT node, label AS component FROM l_last
        |         WHERE (SELECT bad FROM conv) = 0),
        |lab AS (
        |  SELECT a.vec_id, a.centroid_id, a.cos_centroid,
        |         COALESCE(c.component, a.vec_id) AS component
        |  FROM asg a LEFT JOIN comp c ON c.node = a.vec_id),
        |keeper AS (
        |  SELECT component, vec_id AS keep_id FROM (
        |    SELECT component, vec_id,
        |      ROW_NUMBER() OVER (PARTITION BY component ORDER BY cos_centroid, vec_id) AS rn
        |    FROM lab) WHERE rn = 1)
        |SELECT l.vec_id, l.centroid_id, l.cos_centroid, l.component,
        |       CASE WHEN l.vec_id = k.keep_id THEN 'keep' ELSE 'drop' END AS verdict
        |FROM lab l JOIN keeper k USING (component)
        |ORDER BY l.vec_id""".stripMargin,
    "q95_kmeans_update" ->
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS centroid_id, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT c.vec_id, q.centroid_id, $cosSql AS cos_sim
        |  FROM e c CROSS JOIN q),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, centroid_id) AS rn
        |  FROM scored),
        |assign AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1),
        |qx AS (
        |  SELECT a.centroid_id,
        |    UNNEST(list_transform(e.v, (x, i) ->
        |      {'dim': CAST(i - 1 AS BIGINT),
        |       'qx': CAST(FLOOR(x * 10000) AS BIGINT)})) AS s
        |  FROM e JOIN assign a USING (vec_id))
        |SELECT centroid_id, s.dim AS dim,
        |       CAST(SUM(s.qx) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 10000.0 AS mean,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM qx GROUP BY centroid_id, s.dim
        |ORDER BY centroid_id, dim""".stripMargin,
    "q71_kmeans_assign" ->
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS centroid_id, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT c.vec_id, q.centroid_id, $cosSql AS cos_sim
        |  FROM e c CROSS JOIN q),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, centroid_id) AS rn
        |  FROM scored)
        |SELECT vec_id, centroid_id, cos_sim FROM ranked WHERE rn = 1
        |ORDER BY vec_id""".stripMargin,
    "q153_hard_negatives" ->
      s"""WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, q.qlabel, c.label, c.vec_id AS neighbor_id,
        |         CAST(ROUND($cosSql * 10000) AS BIGINT) AS cosq
        |  FROM e c CROSS JOIN q WHERE c.vec_id <> q.query_id),
        |sk AS (SELECT *, cosq * 10000000000 + (10000000000 - neighbor_id) AS ordkey FROM scored),
        |pos AS (SELECT query_id, arg_max(neighbor_id, ordkey) AS pos_id, MAX(cosq) AS pos_cosq
        |        FROM sk WHERE label = qlabel GROUP BY 1),
        |neg AS (SELECT query_id, arg_max(neighbor_id, ordkey) AS neg_id, MAX(cosq) AS neg_cosq
        |        FROM sk WHERE label <> qlabel GROUP BY 1)
        |SELECT query_id, pos_id, pos_cosq, neg_id, neg_cosq
        |FROM pos JOIN neg USING (query_id) ORDER BY query_id""".stripMargin,
    "q21_ann_brute" ->
      s"""WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id, $cosSql AS cos_sim
        |  FROM e c CROSS JOIN q WHERE c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q22_ann_lsh" ->
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |${bandSigSql(0.40)},
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
        |  FROM sig a JOIN sig b ON a.j = b.j AND a.sg = b.sg
        |  WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id),
        |scored AS (
        |  SELECT cd.query_id, cd.neighbor_id, $cosSql AS cos_sim
        |  FROM cand cd
        |  JOIN (SELECT vec_id, v AS qv FROM e) q ON q.vec_id = cd.query_id
        |  JOIN e c ON c.vec_id = cd.neighbor_id),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank FROM ranked
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "q45_ann_ivf" ->
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |centcos AS (
        |  SELECT ev.vec_id, c.cid,
        |    ROUND(list_sum(list_transform(ev.v, (x,i) -> x * c.cv[i])) /
        |      (SQRT(list_sum(list_transform(ev.v, (x,i) -> x * ev.v[i]))) *
        |       SQRT(list_sum(list_transform(c.cv, (x,i) -> x * c.cv[i])))), 4) AS cc
        |  FROM e ev CROSS JOIN cents c),
        |asg AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid) AS rn
        |    FROM centcos) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cid AS cell FROM (
        |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid) AS rn
        |    FROM centcos WHERE vec_id < 10) WHERE rn <= 2),
        |scored AS (
        |  SELECT p.query_id, c.vec_id AS neighbor_id, $cosSql AS cos_sim
        |  FROM probes p
        |  JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.query_id
        |  JOIN (SELECT vec_id, v AS qv FROM e) q ON q.vec_id = p.query_id
        |  JOIN e c ON c.vec_id = a.vec_id),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank FROM ranked
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    // the τ=0.9 calibration point: same banded replay as q44 but at
    // bandsFor(0.9) = (r=21, b=60) over the replica-doubled corpus
    "q121_neardup_hightau" ->
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |  FROM embeddings),
        |${bandSigSql(0.9)},
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
        |  FROM sig a JOIN sig b ON a.j = b.j AND a.sg = b.sg AND a.vec_id < b.vec_id),
        |pairs AS (
        |  SELECT cd.doc_a, cd.doc_b,
        |    ROUND(list_sum(list_transform(a.v, (x,i) -> x * b.v[i])) /
        |      (SQRT(list_sum(list_transform(a.v, (x,i) -> x * a.v[i]))) *
        |       SQRT(list_sum(list_transform(b.v, (x,i) -> x * b.v[i])))), 4) AS cos_sim
        |  FROM cand cd JOIN e a ON a.vec_id = cd.doc_a JOIN e b ON b.vec_id = cd.doc_b)
        |SELECT doc_a, doc_b, cos_sim FROM pairs WHERE cos_sim >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,
    // GROUND TRUTH (round 7): q44's sweep is exact and lossless, so
    // the oracle is the plain all-pairs answer — no banding replay
    "q44_embed_neardup" ->
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
        |    ROUND(list_sum(list_transform(a.v, (x,i) -> x * b.v[i])) /
        |      (SQRT(list_sum(list_transform(a.v, (x,i) -> x * a.v[i]))) *
        |       SQRT(list_sum(list_transform(b.v, (x,i) -> x * b.v[i])))), 4) AS cos_sim
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT doc_a, doc_b, cos_sim FROM pairs WHERE cos_sim >= 0.30
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q23_knn_classify" ->
      s"""WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv, label AS true_label FROM e WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, q.true_label, c.label, c.vec_id, $cosSql AS cos_sim
        |  FROM e c CROSS JOIN q WHERE c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank
        |  FROM scored),
        |votes AS (
        |  SELECT query_id, true_label, label, COUNT(*) AS votes FROM ranked
        |  WHERE rank <= 5 GROUP BY 1, 2, 3),
        |winner AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS vote_rank
        |  FROM votes)
        |SELECT query_id, true_label, label AS predicted_label, votes FROM winner
        |WHERE vote_rank = 1 ORDER BY query_id""".stripMargin)
}
