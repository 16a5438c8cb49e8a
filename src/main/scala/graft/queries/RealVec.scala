package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Realistic-embedding gates: the vector near-dup/ANN family re-gated
  * on a CLUSTERED corpus both engines generate independently — the
  * [[RealCorpus]] discipline applied to vectors.
  *
  * Why: the shipped embeddings table is isotropic noise, and the whole
  * weak-τ analysis (DenseSweep's scaladoc) is explicitly
  * Gaussian-specific — background pairwise cosine ~N(0, 1/√d). Real
  * embedding corpora are the opposite: cluster-structured (topical
  * mass at moderate cosine) with genuine near-duplicates riding far
  * above the cluster level. Banding selectivity, rep collapse and
  * top-k neighborhoods all behave differently there; these gates
  * measure the operators against that shape with DuckDB ground truth.
  *
  * Cross-engine determinism: integer MINSTD LCG draws only, then ONE
  * division by 1000.0 at the end — both engines perform the identical
  * correctly-rounded IEEE double division on identical integers, so
  * every downstream cosine (the shared round-4 arithmetic) matches
  * bit-for-bit, exactly as it already does for the parquet corpus.
  *
  * Corpus shape (2000 vectors, 16 dims):
  *  - 40 cluster centers with Zipf-ish sizes (35% of vectors in 4
  *    giant clusters, 35% across 16, 30% across 20) — components
  *    uniform in [−1.0, 1.0];
  *  - per-vector noise uniform in [−0.7, 0.7] per component → mean
  *    within-cluster cosine ≈ ‖C‖²/(‖C‖²+‖N‖²) ≈ 0.67 with a real
  *    spread (center norms vary by cluster, 16-dim fluctuation is
  *    wide): the τ=0.30 semdedup bar sits below the cluster mass and
  *    the τ=0.9 near-dup bar lands INSIDE the distribution's upper
  *    tail — measured, q182 emits ~80k pairs, so banding at τ=0.9 is
  *    exercised against dense cluster cores, not just isolated
  *    planted pairs (the hard realistic case);
  *  - planted near-duplicates: vec_id % 7 == 3 reuses its
  *    predecessor's cluster AND noise with a ±0.02 jitter → cosine
  *    ≈ 0.9997, far above everything else;
  *  - label = the cluster id, so k-NN/classification gates see real
  *    class structure.
  *
  * Oracles are spliced ([[RealCorpus.spliced]] pattern): the generated
  * `embeddings` CTE goes in front of the SAME oracle bodies the
  * synthetic twins commit. */
object RealVec {

  val nVecs = 2000L
  val dims = 16

  private val M = 2147483647L
  private val A = 48271L

  private def rnd(doc: String, i: String, salt: Int): String = {
    val seed = s"((($doc) * 1000003 + ($i) * 10007 + ${salt * 7919L}) % $M)"
    s"(($A * (($A * $seed) % $M)) % $M)"
  }

  /** Zipf-ish cluster id ∈ [1, 40] for base vector `b`. */
  private def clusterExpr(b: String): String = {
    val r = rnd(b, "0", 8)
    val r2 = s"(($A * $r) % $M)"
    s"(CASE WHEN ($r % 1000) < 350 THEN 1 + ($r2 % 4) " +
      s"WHEN ($r % 1000) < 700 THEN 5 + ($r2 % 16) " +
      s"ELSE 21 + ($r2 % 20) END)"
  }

  private def corpusSelect(rangeSrc: String, seqTo: String, xform: String,
      strT: String): String = {
    // j runs 1..dims inside the lambda; draws use j directly (the
    // doc-level draws above use i=0, so no seed collision)
    val center = s"(${rnd("c * 131", "j", 9)} % 2001) - 1000"
    val noise = s"(${rnd("b", "j", 10)} % 1401) - 700"
    val jitter = s"(CASE WHEN vec_id % 7 = 3 THEN (${rnd("vec_id", "j", 11)} % 41) - 20 ELSE 0 END)"
    // CAST ... AS DOUBLE before the division: Spark parses the 1000.0
    // literal as DECIMAL, and a decimal-typed embedding array reaches
    // the cosine kernel as garbage (measured: NaN cosines) — the cast
    // pins both engines to the identical int→double + double-division
    // path (exact for these 3-decimal integers)
    s"""SELECT vec_id, embedding, label FROM (
       |  SELECT vec_id,
       |    $xform($seqTo, j -> CAST((($center) + ($noise) + ($jitter)) AS DOUBLE) / 1000.0) AS embedding,
       |    'c' || CAST(c AS $strT) AS label
       |  FROM (
       |    SELECT vec_id, b, ${clusterExpr("b")} AS c
       |    FROM (
       |      SELECT vec_id, CASE WHEN vec_id % 7 = 3 THEN vec_id - 1 ELSE vec_id END AS b
       |      FROM ($rangeSrc) ids
       |    ) based
       |  ) clustered
       |) vecs""".stripMargin
  }

  def sparkSql: String = corpusSelect(
    rangeSrc = s"SELECT id AS vec_id FROM range(0, $nVecs)",
    seqTo = s"sequence(CAST(1 AS BIGINT), CAST($dims AS BIGINT))",
    xform = "transform",
    strT = "STRING")

  def duckSql: String = corpusSelect(
    rangeSrc = s"SELECT range AS vec_id FROM range(0, $nVecs)",
    seqTo = s"range(1, $dims + 1)",
    xform = "list_transform",
    strT = "VARCHAR")

  /** The generated corpus in the shape the vector cores take:
    * (vec_id, label, v: array<double>). */
  def vecs(s: SparkSession): DataFrame =
    s.sql(sparkSql).select(col("vec_id"), col("label"), col("embedding").as("v"))

  /** Splice the generated corpus in front of an oracle reading FROM
    * embeddings. The oracle bodies cast embedding elements to DOUBLE —
    * a no-op here (the CTE already emits doubles), value-identical. */
  def spliced(baseOracle: String): String =
    RealCorpus.spliceCte("embeddings", duckSql, baseOracle)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // FULL corpus (round-9: the subset is gone — re-measured, the
    // banding-replay oracle over the doubled 2000-vector corpus costs
    // 25.9 s in DuckDB, affordable): ~80k true pairs through the dense
    // cluster cores, upper-tail cluster pairs and planted dups all in
    "q182_real_vec_neardup" -> ((s, _) =>
      VectorOps.neardupHighTau(vecs(s).select(col("vec_id"), col("v")))),
    // FULL corpus (round-9: the subset is gone here too — q104's
    // oracle replaced its recursive component walk, whose node×label
    // closure was quadratic in component size and OOM-flaked DuckDB,
    // with unrolled materialized min-label propagation; the full-2000
    // oracle now measures 2.6 s where the 600-subset recursive form
    // took 7-34 s and sometimes died)
    "q183_real_vec_semdedup" -> ((s, _) => VectorOps.semDedup(vecs(s), 0.30)),
    "q184_real_vec_ann" -> ((s, _) => VectorOps.annBrute(vecs(s))),
    "q185_real_vec_knn" -> ((s, _) => VectorOps.knnClassify(vecs(s))))

  val oracle: Map[String, String] = Map(
    "q182_real_vec_neardup" -> spliced(VectorOps.oracle("q121_neardup_hightau")),
    "q183_real_vec_semdedup" -> spliced(VectorOps.oracle("q104_semdedup")),
    "q184_real_vec_ann" -> spliced(VectorOps.oracle("q21_ann_brute")),
    "q185_real_vec_knn" -> spliced(VectorOps.oracle("q23_knn_classify")))
}
