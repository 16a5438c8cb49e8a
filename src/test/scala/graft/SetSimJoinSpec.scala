package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TextOps

/** Losslessness and threshold semantics of the q142 prefix-filtered
  * set-similarity join: the prefix equi-join must produce EVERY pair
  * the naive all-pairs join would (the DuckDB gate re-checks this at
  * corpus scale), and the integer cross-multiplied verify must sit
  * exactly on the τ boundary. */
class SetSimJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pairs(docs: (Long, String)*): Seq[(Long, Long)] =
    TextOps.setSimJoin(docs.toSeq.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("near-duplicates with one token changed cross tau=1/2 on shingle sets") {
    // 12 tokens -> 10 shingles each; one substitution breaks 3 shingles:
    // inter=7, sizes 10/10 -> 3*7=21 >= 20 — just over the boundary
    val base = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11"
    val mut = "t0 t1 t2 t3 t4 X t6 t7 t8 t9 t10 t11"
    assert(pairs(1L -> base, 2L -> mut) == Seq((1L, 2L)))
  }

  test("a pair exactly on the tau boundary is kept, one shingle under is dropped") {
    // identical 6-shingle docs except: doc 3 shares 4 of 6 with doc 1
    // (3*4=12 >= 12 keep); doc 4 shares 3 of 6 (9 < 12 drop)
    val a = "a b c d e f g h"                // shingles: 6
    val keep = "a b c d e f X Y"             // shares "a b c".."d e f" = 4
    val out = pairs(1L -> a, 3L -> keep)
    assert(out == Seq((1L, 3L)))
    val drop = "a b c d e X Y Z"             // shares 3 of 6
    assert(pairs(1L -> a, 4L -> drop).isEmpty)
  }

  test("dissimilar docs never pair even when sharing a rare token") {
    val out = pairs(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha one two three four five six seven")
    assert(out.isEmpty)
  }

  test("prefix filter is lossless vs the in-memory naive join on a random-ish corpus") {
    // deterministic pseudo-corpus: 30 docs over a 12-token vocabulary —
    // dense enough that many pairs cross tau
    val docs = (0 until 30).map { i =>
      val toks = (0 until 10).map(j => s"w${(i * 7 + j * j) % 12}")
      (i.toLong, toks.mkString(" "))
    }
    val got = pairs(docs: _*).toSet
    // naive reference in plain Scala on the same shingle definition
    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val want = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = shingles(ta); sb = shingles(tb)
      inter = (sa & sb).size
      if 3 * inter >= sa.size + sb.size
    } yield (ia, ib)).toSet
    assert(got == want)
  }

  test("broadcast-attach verify and shuffle-attach fallback produce identical pairs") {
    // same pseudo-corpus; maxBroadcastSets = 0 forces the shuffle
    // attach (the >broadcast-budget path), which must agree with the
    // default broadcast-verify path row for row
    val docs = (0 until 30).map { i =>
      val toks = (0 until 10).map(j => s"w${(i * 7 + j * j) % 12}")
      (i.toLong, toks.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    def run(cap: Long) = TextOps.setSimJoin(df, maxBroadcastSets = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(200000L) == run(0L))
  }
}
