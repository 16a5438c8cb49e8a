package graft

import graft.queries.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch properties (q124): the estimate is an upper bound
  * that never undercounts, is exact when the grid is collision-free,
  * and overcounts deterministically when rows collide. */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("CMS never undercounts and is exact at ample width") {
    val d = docs(
      1L -> "a b a b a b",
      2L -> "a b c d",
      3L -> "c d c d e f")
    val out = TextOps.countMinSketch(d, width = 4096L, depth = 4, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    for ((g, est, exact, over) <- out) {
      assert(est >= exact, s"$g undercounted: $est < $exact")
      assert(over == est - exact)
    }
    // bigram "a b" appears 3 (doc1) + 1 (doc2) = 4 times
    val ab = out.find(_._1 == "a b").get
    assert(ab._3 == 4L)
    // at width 4096 with ~8 distinct grams collisions are absent
    assert(out.forall(_._4 == 0L), "ample width must be collision-free")
  }

  test("CMS at width 1 degenerates to the total bigram volume") {
    val d = docs(1L -> "a b c", 2L -> "a b")
    // every cell collides: estimate = total bigram instances (3)
    val out = TextOps.countMinSketch(d, width = 1L, depth = 2, topK = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.nonEmpty)
    assert(out.forall(_._2 == 3L), s"degenerate sketch must report the stream volume: ${out.toSeq}")
  }

  test("CMS probe order is the strict (count desc, gram asc) total order") {
    val d = docs(1L -> "x y x y z w", 2L -> "z w p q")
    val out = TextOps.countMinSketch(d, width = 4096L, depth = 4, topK = 2)
      .collect().map(_.getString(0)).toSeq
    // counts: "x y"=2, "y x"=1, "z w"=2, "w z"? no... bigrams doc1: x y, y x, x y, y z, z w; doc2: z w, w p, p q
    // top2 by (count desc, gram asc): "x y"(2), "z w"(2) -> sorted output by gram
    assert(out.sorted == Seq("x y", "z w").sorted)
  }
}
