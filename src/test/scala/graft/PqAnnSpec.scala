package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.VectorOps

/** Hand-computed product-quantization case for q113: encoding picks
  * the nearest sub-centroid per subspace, asymmetric distance sums
  * the per-subspace lookup tables, and ties break on neighbor id. */
class PqAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("PQ encode + ADC ranking on a 4-d corpus with 2x2 codebook") {
    // codebook = v0, v1 (codes=2); subspaces: dims (0,1) and (2,3)
    val vecs = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)),
      (1L, Seq(1f, 1f, 1f, 1f)),
      (2L, Seq(0.25f, 0f, 0f, 0f)),   // encodes to (c0, c0)
      (3L, Seq(0.75f, 1f, 1f, 1f)))   // encodes to (c1, c1)
      .toDF("vec_id", "embedding")
    val out = VectorOps.pqAnn(vecs, m = 2, codes = 2, nQueries = 2, k = 3, dim = 4)
      .as[(Long, Long, Long, Int)].collect().toSeq

    // ADC from q0: v2 -> (c0,c0) -> 0; v1/v3 -> (c1,c1) -> 2*(1e4^2+1e4^2)
    val far = 2L * 2L * 10000L * 10000L
    assert(out.filter(_._1 == 0L) ==
      Seq((0L, 2L, 0L, 1), (0L, 1L, far, 2), (0L, 3L, far, 3)))
    // ADC from q1: v3 -> (c1,c1) -> 0; v0/v2 -> (c0,c0) -> far
    assert(out.filter(_._1 == 1L) ==
      Seq((1L, 3L, 0L, 1), (1L, 0L, far, 2), (1L, 2L, far, 3)))
  }
}
