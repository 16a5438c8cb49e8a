package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.spark.{MGSummary, MisraGries}

/** The Misra-Gries contract heavyHitters (q111) relies on: after any
  * partitioning of the stream into per-partition reduces followed by
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

  private def sketch(k: Int, parts: Seq[Seq[String]]): MGSummary = {
    val mg = new MisraGries(k)
    parts.map(_.foldLeft(mg.zero)(mg.reduce)).foldLeft(mg.zero)(mg.merge)
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
      val mg = new MisraGries(k)
      val out = mg.finish(sketch(k, parts))
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      val n = stream.size.toLong
      val theta = n / (k + 1) + 1
      val heavy = exact.filter(_._2 >= theta).keys.toSet
      assert(out.n == n)
      assert(heavy.subsetOf(out.grams.toSet),
        s"missing heavy hitters: ${heavy.diff(out.grams.toSet)} (k=$k, n=$n)")
    }
  }

  test("bounded: summary never exceeds k counters") {
    val stream = (0 until 500).map(i => s"t${i % 37}")
    val mg = new MisraGries(5)
    val buf = stream.foldLeft(mg.zero)(mg.reduce)
    assert(buf.grams.size <= 5)
    val merged = mg.merge(buf, stream.reverse.foldLeft(mg.zero)(mg.reduce))
    assert(merged.grams.size <= 5)
    assert(merged.n == 1000L)
  }

  test("in-band counter encoding survives grams containing spaces") {
    val mg = new MisraGries(4)
    val buf = Seq("a b", "a b", "c d").foldLeft(mg.zero)(mg.reduce)
    assert(mg.finish(buf).grams == Vector("a b", "c d"))
  }
}
