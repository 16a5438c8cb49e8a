package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** SortedIntersectSize (the codegen'd merge-walk behind q142's
  * verify) must count exactly what size(array_intersect) counts on
  * sorted duplicate-free long arrays — checked property-style over a
  * seeded random corpus plus the edge shapes a merge walk can get
  * wrong (empty sides, disjoint ranges, full containment, single
  * overlaps at both ends). */
class SortedIntersectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def viaExpr(rows: Seq[(Seq[Long], Seq[Long])]): Seq[Long] = {
    graft.spark.SortedIntersectSize.register(spark)
    rows.toDF("a", "b")
      .select(call_function("dlx_sorted_inter", col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
  }

  private def viaBuiltin(rows: Seq[(Seq[Long], Seq[Long])]): Seq[Long] =
    rows.toDF("a", "b")
      .select(size(array_intersect(col("a"), col("b"))).cast("long"))
      .collect().map(_.getLong(0)).toSeq

  test("edge shapes match size(array_intersect)") {
    val cases: Seq[(Seq[Long], Seq[Long])] = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L, 3L)),
      (Seq(1L, 2L, 3L), Seq.empty[Long]),
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),          // disjoint
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),          // identical
      (Seq(1L, 5L, 9L), Seq(5L)),                  // containment
      (Seq(1L, 9L), Seq(1L, 2L, 8L, 9L)),          // overlap at both ends
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)),
      (Seq(2L, 4L, 6L, 8L), Seq(1L, 3L, 5L, 7L, 9L))) // interleaved, empty inter
    assert(viaExpr(cases) == viaBuiltin(cases))
  }

  test("seeded random sorted-distinct arrays match size(array_intersect)") {
    val rnd = new scala.util.Random(42)
    val cases = (0 until 200).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (arr(), arr())
    }
    assert(viaExpr(cases) == viaBuiltin(cases))
  }

  test("a null array ELEMENT throws loudly instead of reading as 0") {
    graft.spark.SortedIntersectSize.register(spark)
    // analysis accepts the widened containsNull flag (plumbing declares
    // it even for non-null values), so an actual null slot must fail at
    // runtime — getLong would otherwise silently read it as 0 and the
    // intersect count would be wrong, not an error
    val e = intercept[Exception] {
      spark.sql("SELECT dlx_sorted_inter(array(1L, cast(null as bigint), 3L), array(1L, 2L, 3L))")
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("null array element"))),
      s"expected the loud null-element failure, got: $e")
  }

  test("non-array<bigint> inputs fail analysis, not at runtime") {
    graft.spark.SortedIntersectSize.register(spark)
    def analyze(aType: String): Unit =
      spark.sql(s"SELECT dlx_sorted_inter(cast(array() as $aType), " +
        "cast(array() as array<bigint>))").queryExecution.analyzed
    analyze("array<bigint>") // well-typed: analysis succeeds
    for (bad <- Seq("array<int>", "array<string>", "array<double>")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](analyze(bad))
      assert(e.getMessage.contains("dlx_sorted_inter"), s"wrong error for $bad: $e")
    }
    // a non-array scalar must also be rejected at analysis
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT dlx_sorted_inter(1, cast(array() as array<bigint>))")
        .queryExecution.analyzed)
    assert(e.getMessage.contains("dlx_sorted_inter"))
  }
}
