package graft.spark

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries summary: surviving counter entries (encoded
  * "count gram", split at the first space — the count itself never
  * contains one) plus the true stream length `n`. Counter VALUES are
  * partition-order dependent lower bounds; the KEY SET is the
  * guarantee — it contains every item with true count > n/(k+1). */
final case class MGSummary(grams: Seq[String], n: Long)

/** Bounded-memory heavy-hitter sketch (Misra-Gries, k counters) as a
  * typed Aggregator — the "find frequent n-grams without shuffling
  * every distinct n-gram" primitive for a 100 TB corpus. The partial
  * (map-side) aggregate holds at most k counters per task, so the
  * shuffle carries O(mapTasks × k) entries instead of the full
  * distinct-gram cardinality; the merge uses the Agarwal et al.
  * (Mergeable Summaries, PODS 2012) rule — sum counters, then
  * subtract the (k+1)-th largest value and drop non-positives —
  * which preserves the N/(k+1) error bound, so the FINAL key set is
  * guaranteed to contain every gram with true count > n/(k+1)
  * regardless of partitioning. Callers re-count the surviving keys
  * exactly (one filtered aggregation) and threshold at
  * floor(n/(k+1)) + 1, making the end-to-end answer exact and
  * partition-order independent.
  */
final class MisraGries(k: Int) extends Aggregator[String, MGSummary, MGSummary] {

  override def zero: MGSummary = MGSummary(Vector.empty, 0L)

  override def reduce(b: MGSummary, gram: String): MGSummary = {
    val m = toMap(b)
    val updated =
      if (m.contains(gram)) m.updated(gram, m(gram) + 1L)
      else if (m.size < k) m.updated(gram, 1L)
      else m.collect { case (g, c) if c > 1L => (g, c - 1L) } // decrement-all
    fromMap(updated, b.n + 1L)
  }

  override def merge(x: MGSummary, y: MGSummary): MGSummary = {
    val mx = toMap(x)
    val my = toMap(y)
    val combined = mx ++ my.map { case (g, c) => g -> (mx.getOrElse(g, 0L) + c) }
    val trimmed =
      if (combined.size <= k) combined
      else {
        val d = combined.values.toSeq.sortBy(-_).apply(k) // (k+1)-th largest
        combined.collect { case (g, c) if c > d => (g, c - d) }
      }
    fromMap(trimmed, x.n + y.n)
  }

  override def finish(b: MGSummary): MGSummary =
    MGSummary(toMap(b).keys.toVector.sorted, b.n)

  private def toMap(b: MGSummary): Map[String, Long] =
    b.grams.iterator.map { s =>
      val i = s.indexOf(' ')
      s.substring(i + 1) -> s.substring(0, i).toLong
    }.toMap

  private def fromMap(m: Map[String, Long], n: Long): MGSummary =
    MGSummary(m.iterator.map { case (g, c) => s"$c $g" }.toVector, n)

  override def bufferEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
  override def outputEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
}
