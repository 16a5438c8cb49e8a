package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TextOps

/** Interval semantics of the q112 duplicated-span reporter: window
  * size, overlap/adjacency merging, and the shorter-than-k boundary. */
class DupSpansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def spans(docs: (Long, String)*) =
    TextOps.dupSpans(docs.toSeq.toDF("doc_id", "text"), k = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("exact duplicate docs cover the full token range") {
    val out = spans(1L -> "a b c d e", 2L -> "a b c d e")
    // every 3-gram duplicated -> one span per doc over tokens 0..4
    assert(out == Seq((1L, 0L, 4L, 5L, 3L), (2L, 0L, 4L, 5L, 3L)))
  }

  test("disjoint duplicated windows stay separate spans; gap breaks merge") {
    // docs share "x y z" (pos 0) and "p q r" (pos 6) with a unique gap
    val out = spans(
      1L -> "x y z g1 g2 g3 p q r",
      2L -> "x y z h1 h2 h3 p q r")
    assert(out.filter(_._1 == 1L) == Seq((1L, 0L, 2L, 3L, 1L), (1L, 6L, 8L, 3L, 1L)))
  }

  test("adjacent windows merge into one maximal span") {
    // "a b c d" shared -> windows at pos 0 and 1 overlap -> one span 0..3
    val out = spans(1L -> "a b c d u1", 2L -> "v1 a b c d")
    assert(out == Seq((1L, 0L, 3L, 4L, 2L), (2L, 1L, 4L, 4L, 2L)))
  }

  test("within-doc repetition counts as duplication") {
    val out = spans(1L -> "m n o f1 f2 f3 m n o")
    assert(out == Seq((1L, 0L, 2L, 3L, 1L), (1L, 6L, 8L, 3L, 1L)))
  }

  test("docs shorter than k contribute no windows") {
    assert(spans(1L -> "a b", 2L -> "a b").isEmpty)
  }
}
