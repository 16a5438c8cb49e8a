package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global `row_number()` WITHOUT the single-partition funnel.
  *
  * `row_number().over(Window.orderBy(...))` is the one Spark idiom
  * that silently serializes: an empty partition spec forces an
  * `Exchange SinglePartition`, so the ENTIRE input moves through one
  * task no matter how the upstream was partitioned. Fine at thousands
  * of rows, a scale-killer on a corpus-sized frame.
  *
  * This is the classic two-pass global rank instead (the same shape
  * `RDD.zipWithIndex` uses, kept in the DataFrame world so the key
  * expressions stay codegen'd):
  *
  *  1. range-partition the input on the sort keys (order-preserving
  *     across partition ids) and PIN the partition ids as data — the
  *     range sampler is non-deterministic across re-computation, so
  *     the frame is locally checkpointed once and both downstream
  *     jobs see the same partitioning;
  *  2. collect per-partition row counts — bounded by the partition
  *     count, never the data — and prefix-sum them into offsets;
  *  3. rank locally per partition (`Window.partitionBy(pid)`, ~equal
  *     range-partitioned slices, spillable) and add the broadcast
  *     offset.
  *
  * Total movement: one range shuffle + one pid-hash shuffle of the
  * ranked rows, both across all partitions; the only driver-side data
  * is one (pid, count) row per partition.
  */
object ScalableRank {

  /** Append `rankCol` = 1-based global rank of each row under `keys`
    * (pass explicit `.asc`/`.desc`/nulls orderings as needed; ties
    * broken by whatever key order makes the total order unique —
    * callers should include a unique tiebreak key for determinism).
    */
  def withGlobalRank(df: DataFrame, rankCol: String, keys: Seq[Column],
      numPartitions: Int = 0): DataFrame = {
    require(keys.nonEmpty, "withGlobalRank needs at least one sort key")
    val n = math.max(1, if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions)
    val parted = df
      .repartitionByRange(n, keys: _*)
      .withColumn("__pid", spark_partition_id())
      // LAZY checkpoint: the counts job right below computes EVERY
      // partition, which materializes the checkpoint as a side effect
      // — an eager checkpoint paid a whole extra pass for the same
      // pinning guarantee (the range sampler is only non-deterministic
      // across SEPARATE materializations; after the first full job the
      // blocks are fixed). Measured on q172's ~20k-row matched set:
      // one fewer job per rank call.
      .localCheckpoint(false)
    // per-partition counts: ≤ n rows on the driver, independent of data size
    val counts = parted.groupBy("__pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets: Map[Int, Long] =
      counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }.toMap
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L))
    val w = Window.partitionBy("__pid").orderBy(keys: _*)
    parted
      .withColumn(rankCol, (row_number().over(w).cast("long") + offCol))
      .drop("__pid")
  }
}
