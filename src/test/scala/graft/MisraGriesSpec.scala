package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.spark.{MGBuffer, MisraGriesAgg}

/** The Misra-Gries contract heavyHitters (q111) relies on: after any
  * partitioning of the stream into per-partition updates followed by
  * arbitrary-order merges, the summary's key set contains EVERY item
  * with true count > n/(k+1). Counter values are lower bounds only. */
class MisraGriesSpec extends AnyFunSuite {

  /** deterministic sampling (no scalatest-scalacheck bridge in the
    * offline cache): fixed seeds, 200 cases */
  private def forAll[A](g: Gen[A])(check: A => Unit): Unit = {
    val params = Gen.Parameters.default
    (1 to 200).foreach { i =>
      check(g.pureApply(params, org.scalacheck.rng.Seed(i.toLong), 100))
    }
  }

  private def sketch(k: Int, parts: Seq[Seq[String]]): MGBuffer = {
    val partials = parts.map { p =>
      val b = new MGBuffer(k); p.foreach(b.add); b
    }
    val out = new MGBuffer(k)
    partials.foreach(out.mergeIn)
    out
  }

  test("key set is complete above n/(k+1) for any split and any skew") {
    val genCase: Gen[(List[String], Int, Int)] = for {
      vocab <- Gen.chooseNum(2, 40)
      len <- Gen.chooseNum(1, 400)
      // Zipf-ish skew: low ids drawn far more often
      s <- Gen.listOfN(len,
        Gen.chooseNum(0, vocab - 1).flatMap(i => Gen.chooseNum(0, i).map(j => s"w$j")))
      k <- Gen.chooseNum(1, 12)
      nParts <- Gen.chooseNum(1, 7)
    } yield (s, k, nParts)
    forAll(genCase) { case (stream, k, nParts) =>
      val parts = stream.grouped(math.max(1, stream.size / nParts + 1)).toSeq
      val out = sketch(k, parts)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      val n = stream.size.toLong
      val theta = n / (k + 1) + 1
      val heavy = exact.filter(_._2 >= theta).keys.toSet
      assert(out.n == n)
      assert(heavy.subsetOf(out.keysSorted.toSet),
        s"missing heavy hitters: ${heavy.diff(out.keysSorted.toSet)} (k=$k, n=$n)")
    }
  }

  test("bounded: summary never exceeds k counters") {
    val stream = (0 until 500).map(i => s"t${i % 37}")
    val buf = new MGBuffer(5)
    stream.foreach(buf.add)
    assert(buf.counts.size <= 5)
    val rev = new MGBuffer(5)
    stream.reverse.foreach(rev.add)
    buf.mergeIn(rev)
    assert(buf.counts.size <= 5)
    assert(buf.n == 1000L)
  }

  test("shuffle serialization round-trips grams containing spaces") {
    val agg = MisraGriesAgg(org.apache.spark.sql.catalyst.expressions.Literal("x"), 4)
    val b = new MGBuffer(4)
    Seq("a b", "a b", "c d").foreach(b.add)
    val rt = agg.deserialize(agg.serialize(b))
    assert(rt.n == 3L)
    assert(rt.keysSorted == Vector("a b", "c d"))
    assert(rt.counts.get("a b") == 2L)
  }
}
