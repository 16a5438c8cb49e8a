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
  * Above the broadcast cap, use [[tiledMarginPairs]] — the SAME float
  * arithmetic tiled over block pairs, no driver collect. */
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

  /** [[marginPairs]] above the broadcast cap: the rep set is hashed
    * into `nBlocks` blocks, each block packed into ONE row carrying a
    * flat primitive-float matrix, and every unordered block pair
    * (i ≤ j) runs the same tight dot loop over its tile — a
    * distributed tiled GEMM, not a row-at-a-time join (the round-9
    * probe measured the DataFrame blocked sweep at ~30× the kernel:
    * 275 s vs 9 s for 1.8 B pairs, all of it per-pair row machinery).
    *
    * Float arithmetic is IDENTICAL to the broadcast kernel (same
    * normalization, same k-ascending accumulation), so the candidate
    * set — and after the caller's exact re-verify, the output — is
    * bit-equal to the kernel path's.
    *
    * Scale shape: each block row is ~(n/nBlocks)·(8+4·dims) bytes and
    * is shuffled to nBlocks block-pair tasks — total traffic
    * n·rowBytes·nBlocks, the standard O(√P)-reads-per-tile GEMM
    * trade; task count nBlocks·(nBlocks+1)/2 keeps every executor
    * busy. No driver materialization anywhere. */
  def tiledMarginPairs(reps: DataFrame, tauMargin: Double, nBlocks: Int): DataFrame = {
    require(nBlocks >= 1, s"nBlocks=$nBlocks")
    val spark = reps.sparkSession
    import spark.implicits._
    val nb = nBlocks
    val rows: Dataset[(Long, Seq[Double])] =
      reps.selectExpr("vec_id", "v").as[(Long, Seq[Double])]
    // mix before mod: replica ids arrive as origin + r·span (highly
    // structured), a plain mod would stripe them into few blocks
    def blockOf(id: Long): Int =
      java.lang.Math.floorMod(id * -7046029254386353131L, nb.toLong).toInt
    val packed: Dataset[(Int, Array[Long], Array[Float])] = rows
      .groupByKey { case (id, _) => blockOf(id) }
      .mapGroups { (bk, it) =>
        val buf = it.toArray.sortBy(_._1)
        val d = if (buf.isEmpty) 0 else buf(0)._2.length
        val ids = new Array[Long](buf.length)
        val mat = new Array[Float](buf.length * d)
        var i = 0
        while (i < buf.length) {
          val (id, v) = buf(i)
          require(v.length == d,
            s"dlx dense sweep: vector $id has ${v.length} dims, expected $d")
          ids(i) = id
          System.arraycopy(normalized(v), 0, mat, i * d, d)
          i += 1
        }
        (bk, ids, mat)
      }
    val tm = tauMargin.toFloat
    packed.as("A").joinWith(packed.as("B"), $"A._1" <= $"B._1")
      .flatMap { case ((ba, idsA, matA), (bb, idsB, matB)) =>
        val d = if (idsA.isEmpty) 0 else matA.length / idsA.length
        val same = ba == bb
        // ids are sorted within a block, so the same-block upper
        // triangle emits each unordered pair once; cross blocks every
        // (a, b) is one pair, ordered by min/max. The j/k loops stay
        // bare while loops — iterator machinery per pair would cost as
        // much as the 64-FMA dot it wraps.
        idsA.indices.iterator.flatMap { i =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          val bi = i * d
          var j = if (same) i + 1 else 0
          while (j < idsB.length) {
            var acc = 0f
            var k = 0
            val bj = j * d
            while (k < d) { acc += matA(bi + k) * matB(bj + k); k += 1 }
            if (acc >= tm) {
              val a = idsA(i); val b = idsB(j)
              out += ((math.min(a, b), math.max(a, b)))
            }
            j += 1
          }
          out.iterator
        }
      }.toDF("ra", "rb")
  }

  /** Block count for [[tiledMarginPairs]]: ~25k vectors per tile side
    * (a ~13 MB packed row at 64 dims), floored at 16 so the block-pair
    * grid (≥136 tasks) keeps a 32-way executor pool busy. */
  def blocksFor(n: Long): Int =
    math.max(16L, (n + 24999L) / 25000L).toInt
}
