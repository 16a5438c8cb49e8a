package graft.spark

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra-Gries state: at most k counters plus the true stream
  * length `n`. Counter VALUES are partition-order dependent lower
  * bounds; the KEY SET is the guarantee — after any partitioning into
  * per-partition streams followed by arbitrary-order merges it
  * contains every item with true count > n/(k+1).
  *
  * All mutation is in place on a plain HashMap: `add` is O(1)
  * amortized (the decrement-all branch touches k counters, but each
  * decrement consumes one unit of inserted count mass, so total
  * decrement work over a stream of n inputs is ≤ n). This class IS
  * the aggregation buffer — it lives as a Java object between rows
  * (TypedImperativeAggregate) and is serialized only at shuffle
  * boundaries, not per input row.
  */
final class MGBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long](k * 2)
  var n: Long = 0L

  def add(gram: String): Unit = {
    n += 1L
    val c = counts.get(gram)
    if (c != 0L || counts.containsKey(gram)) counts.put(gram, c + 1L)
    else if (counts.size < k) counts.put(gram, 1L)
    else { // decrement-all; drop zeros
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > 1L) e.setValue(e.getValue - 1L) else it.remove()
      }
    }
  }

  /** Agarwal et al. (Mergeable Summaries, PODS 2012) rule: sum
    * counters, then subtract the (k+1)-th largest value and drop
    * non-positives — preserves the n/(k+1) completeness bound
    * regardless of merge order. */
  def mergeIn(other: MGBuffer): Unit = {
    n += other.n
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.merge(e.getKey, e.getValue, (a: Long, b: Long) => a + b)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val d = vals(vals.length - 1 - k) // (k+1)-th largest
      val ci = counts.entrySet().iterator()
      while (ci.hasNext) {
        val e = ci.next()
        if (e.getValue > d) e.setValue(e.getValue - d) else ci.remove()
      }
    }
  }

  def keysSorted: Vector[String] = {
    val arr = counts.keySet().toArray(new Array[String](counts.size))
    java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]])
    arr.toVector
  }
}

/** Bounded-memory heavy-hitter sketch (Misra-Gries, k counters) as a
  * native TypedImperativeAggregate — the "find frequent n-grams
  * without shuffling every distinct n-gram" primitive for a 100 TB
  * corpus. The partial (map-side) aggregate holds at most k counters
  * per task, so the shuffle carries O(mapTasks × k) entries instead
  * of the full distinct-gram cardinality. Callers re-count the
  * surviving keys exactly (one filtered aggregation) and threshold at
  * floor(n/(k+1)) + 1, making the end-to-end answer exact and
  * partition-order independent.
  *
  * Why TypedImperativeAggregate and not a typed Aggregator: a
  * product-encoded Aggregator buffer round-trips object↔row on EVERY
  * update — O(k) parse/format per input gram, which measured ~1000×
  * the useful work at k=768. Here the buffer is a live MGBuffer
  * object held by ObjectHashAggregateExec; serialize/deserialize run
  * only at spill and shuffle boundaries.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(b: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: MGBuffer, o: MGBuffer): MGBuffer = { b.mergeIn(o); b }

  /** Output shape matches the previous Aggregator's MGSummary struct
    * (`grams` sorted, `n`) so q111's downstream code is unchanged. */
  override def eval(b: MGBuffer): Any =
    InternalRow(
      new GenericArrayData(b.keysSorted.map(UTF8String.fromString).toArray[Any]),
      b.n)

  override def serialize(b: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeLong(b.n)
    out.writeInt(b.counts.size)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val gb = e.getKey.getBytes("UTF-8")
      out.writeInt(gb.length)
      out.write(gb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new MGBuffer(in.readInt())
    b.n = in.readLong()
    var m = in.readInt()
    while (m > 0) {
      val gb = new Array[Byte](in.readInt())
      in.readFully(gb)
      b.counts.put(new String(gb, "UTF-8"), in.readLong())
      m -= 1
    }
    b
  }

  override def dataType: DataType = StructType(Seq(
    StructField("grams", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "dlx_mg_sketch"
}

object MisraGriesAgg {
  /** Register as a SQL function (same bridge as CollationNormalizeExpr:
    * Column-side code uses call_function, no internal Column<->
    * Expression plumbing). k arrives as a literal second argument. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dlx_mg_sketch",
      args => MisraGriesAgg(args.head,
        args(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
  }
}
