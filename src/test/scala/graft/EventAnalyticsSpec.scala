package graft

import graft.queries.Relational
import org.scalatest.funsuite.AnyFunSuite

/** Funnel (q127) edge semantics: step order matters, windows are
  * inclusive of the boundary, and a qualified click is required (a
  * purchase after a view alone never converts). */
class EventAnalyticsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def run(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    Relational.funnel(rows.toDF("event_id", "user_id", "ts_s", "event_type"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_conversions"), r.getAs[Long]("first_conversion_s"))))
      .toMap
  }

  test("full in-window chain converts; the boundary second still counts") {
    val out = run(
      (1L, 1L, 1000L, "view"),
      (2L, 1L, 1000L + 1800L, "click"),    // exactly at the window edge
      (3L, 1L, 1000L + 3600L, "purchase")) // exactly 1800 after the click
    assert(out(1L) == ((1L, 4600L)))
  }

  test("a purchase without a qualified click never converts") {
    val out = run(
      (1L, 2L, 1000L, "view"),
      (2L, 2L, 1200L, "purchase"),          // no click at all
      (3L, 3L, 1000L, "click"),             // click with no preceding view
      (4L, 3L, 1100L, "purchase"))
    assert(out(2L) == ((0L, -1L)) && out(3L) == ((0L, -1L)))
  }

  test("an out-of-window step breaks the chain") {
    val out = run(
      (1L, 4L, 1000L, "view"),
      (2L, 4L, 1000L + 1801L, "click"),     // view too old -> unqualified
      (3L, 4L, 1000L + 1900L, "purchase"))
    assert(out(4L) == ((0L, -1L)))
    val out2 = run(
      (1L, 5L, 1000L, "view"),
      (2L, 5L, 1100L, "click"),
      (3L, 5L, 1100L + 1801L, "purchase"))  // click too old
    assert(out2(5L) == ((0L, -1L)))
  }

  test("steps must appear in order within the same user") {
    val out = run(
      (1L, 6L, 1000L, "click"),             // click precedes the view
      (2L, 6L, 1100L, "view"),
      (3L, 6L, 1200L, "purchase"))
    assert(out(6L) == ((0L, -1L)))
    // a later qualified click rescues the funnel
    val out2 = run(
      (1L, 7L, 1000L, "click"),
      (2L, 7L, 1100L, "view"),
      (3L, 7L, 1200L, "click"),
      (4L, 7L, 1300L, "purchase"))
    assert(out2(7L) == ((1L, 1300L)))
  }
}
