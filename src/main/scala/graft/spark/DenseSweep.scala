package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset}

/** Margin-candidate kernel for EXACT dense all-pairs cosine sweeps
  * (the weak-τ near-dup regime, q44's τ=0.30).
  *
  * Why a kernel at all: at τ=0.30 on a 64-dim corpus whose background
  * pairwise cosine is ~N(0, 1/√d), NO candidate scheme prunes —
  * measured on the fuzz-x30 probe (60k vectors, 1.8B pairs):
  * banded LSH at bandsFor(0.30)=(r=6,b=51) admits 995M distinct
  * candidates (55% of all pairs) for 14.35M true pairs; a lossless
  * triangle-inequality canopy bound over the ~8°-radius jitter
  * clusters admits cos ≥ 0.026, i.e. 46% of all pairs (measured CDF);
  * a row-pair BroadcastNestedLoopJoin visits all pairs at ~0.64 µs
  * each (71.6 s). The information-theoretic floor is the sweep itself,
  * so the win is constants: a flat primitive-float matrix broadcast
  * (~260 B/vector) and a tight dot-product loop that HotSpot
  * auto-vectorizes — no per-pair row machinery, no band-row inflation,
  * no candidate dedup shuffle.
  *
  * Losslessness contract: callers pass `tauMargin = τ − slack` with
  * slack ≥ 1e-3 and re-verify survivors with the exact shared
  * arithmetic ([[CosSimExpr]], double fold + HALF_UP round-4). The
  * float path's total error is bounded well under the slack: unit-
  * normalized 64-dim float dot accumulates ≤ ~64 ulp ≈ 4e-6 absolute,
  * plus ≤ ~1e-6 from the float normalization — so every pair whose
  * EXACT rounded cosine reaches τ (raw ≥ τ − 5e-5 can round up) also
  * clears τ − 1e-3 in the kernel. Emitted pairs are unique by
  * construction (each unordered pair is visited once via the sorted-id
  * upper bound), so downstream needs no distinct.
  *
  * Scale shape: one executor-side broadcast of the rep matrix (caller
  * enforces the row cap) and one linear pass over the stream side —
  * n·|matrix| dots, embarrassingly parallel over stream partitions.
  * Above the broadcast cap, use the blocked DataFrame sweep
  * (VectorOps.exactSweepRepPairs' fallback), not this kernel. */
object DenseSweep {

  /** Float margin slack the kernel's callers must subtract from τ —
    * two orders above the measured float-vs-double error bound. */
  val MarginSlack = 1e-3

  private def normalized(v: Seq[Double]): Array[Float] = {
    var s = 0.0d
    v.foreach(x => s += x * x)
    val n = math.sqrt(s)
    val out = new Array[Float](v.length)
    var i = 0
    v.foreach { x => out(i) = if (n == 0.0d) 0f else (x / n).toFloat; i += 1 }
    out
  }

  /** Candidate pairs (ra < rb) whose float cosine clears `tauMargin`,
    * over `reps` = (vec_id: bigint, v: array<double>). Collects the
    * matrix driver-side — the caller MUST have capped the row count
    * (VectorOps.exactSweepRepPairs gates on maxBroadcastReps). */
  def marginPairs(reps: DataFrame, tauMargin: Double): DataFrame = {
    val spark = reps.sparkSession
    import spark.implicits._
    val rows: Dataset[(Long, Seq[Double])] =
      reps.selectExpr("vec_id", "v").as[(Long, Seq[Double])]
    val local = rows.collect().map { case (id, v) => (id, normalized(v)) }
      .sortBy(_._1)
    val n = local.length
    val dims = if (n == 0) 0 else local(0)._2.length
    val ids = local.map(_._1)
    val mat = new Array[Float](n * dims)
    var i = 0
    while (i < n) {
      // fail loudly on ragged input: a short vector would misalign the
      // flat matrix (arraycopy AIOOBE at best, silently truncated dot
      // products at worst)
      require(local(i)._2.length == dims,
        s"dlx dense sweep: vector ${local(i)._1} has ${local(i)._2.length} dims, expected $dims")
      System.arraycopy(local(i)._2, 0, mat, i * dims, dims)
      i += 1
    }
    val bc = spark.sparkContext.broadcast((ids, mat))
    val d = dims
    val tm = tauMargin.toFloat
    rows.mapPartitions { it =>
      val (bIds, bMat) = bc.value
      it.flatMap { case (id, vSeq) =>
        val a = normalized(vSeq)
        require(a.length == d,
          s"dlx dense sweep: vector $id has ${a.length} dims, expected $d")
        // ids are sorted ascending: sweep only j with id_j > id so each
        // unordered pair is visited exactly once across the whole job
        val pos = java.util.Arrays.binarySearch(bIds, id)
        var j = if (pos >= 0) pos + 1 else -pos - 1
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        while (j < bIds.length) {
          val base = j * d
          var s = 0f
          var k = 0
          while (k < d) { s += a(k) * bMat(base + k); k += 1 }
          if (s >= tm) out += ((id, bIds(j)))
          j += 1
        }
        out.iterator
      }
    }.toDF("ra", "rb")
  }
}
