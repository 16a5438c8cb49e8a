package graft.spark

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate: `tag` carries an optional payload (e.g. the
  * neighbor's label for k-NN voting); ordering is (score desc, id asc)
  * — the deterministic tiebreak the oracle replays. */
final case class ScoredCand(score: Double, id: Long, tag: String)

/** Bounded top-k as a typed Aggregator — the two-phase top-k that
  * makes global top-k safe at 100 TB: the partial (map-side) aggregate
  * keeps at most k candidates per group per task, so the shuffle
  * carries O(mapTasks × groups × k) tiny structs instead of every
  * scored corpus row funneling through #groups reducer tasks (the
  * `row_number().over(partitionBy(query_id))` anti-pattern this
  * replaces). Runs as ObjectHashAggregate with partial merge.
  */
final class TopK(k: Int) extends Aggregator[ScoredCand, Seq[ScoredCand], Seq[ScoredCand]] {

  private def trim(s: Seq[ScoredCand]): Seq[ScoredCand] =
    s.sortBy(c => (-c.score, c.id)).take(k)

  override def zero: Seq[ScoredCand] = Vector.empty

  override def reduce(b: Seq[ScoredCand], a: ScoredCand): Seq[ScoredCand] =
    trim(b :+ a)

  override def merge(x: Seq[ScoredCand], y: Seq[ScoredCand]): Seq[ScoredCand] =
    trim(x ++ y)

  override def finish(b: Seq[ScoredCand]): Seq[ScoredCand] =
    b.sortBy(c => (-c.score, c.id))

  override def bufferEncoder: Encoder[Seq[ScoredCand]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredCand]]()

  override def outputEncoder: Encoder[Seq[ScoredCand]] = bufferEncoder
}
