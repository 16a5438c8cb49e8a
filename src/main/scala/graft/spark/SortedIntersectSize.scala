package graft.spark

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** |A ∩ B| for two SORTED array<bigint> columns of distinct elements,
  * as a single merge walk — no per-row hash set, no boxing.
  *
  * Built-in `size(array_intersect(a, b))` allocates a generic
  * OpenHashSet[Any] and boxes every element PER ROW; on a similarity
  * join's verify stream (fuzz-x30: 49.5M candidate pairs × ~56-element
  * sets) that generic path measured ~50 s of the query's wall. The
  * merge walk does the same count in O(|A|+|B|) primitive long
  * compares inside whole-stage codegen. Callers must supply arrays
  * that are sorted ascending and duplicate-free (setSimJoin builds
  * them with sort_array over per-doc distinct token ids) — for such
  * inputs the count is bit-for-bit `size(array_intersect)`. */
object SortedIntersectOps {
  /** Throws on a null element instead of silently reading it as 0
    * (getLong's unsafe-row behavior) — checkInputDataTypes accepts the
    * widened containsNull FLAG because plumbing declares it even for
    * all-non-null values, so the loud-failure contract moves here. The
    * bitmap probe is one extra word load per element against the walk's
    * compare+branch; each element is touched at most once per row. */
  def interSize(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j))
        throw new IllegalArgumentException(
          "dlx_sorted_inter: null array element (inputs must be sorted, distinct, non-null)")
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  // registered session-wide as SQL function dlx_sorted_inter, so
  // analysis must reject anything but array<bigint> on both sides —
  // the merge walk calls getLong and would return garbage or throw at
  // runtime otherwise. (The sorted-ascending/distinct precondition is
  // a value-level contract the type system can't see; callers build
  // the arrays with sort_array over distinct ids.)
  override def checkInputDataTypes(): TypeCheckResult = {
    val want = ArrayType(LongType)
    // containsNull is deliberately NOT rejected: every real builder
    // (sort_array(collect_list(..)), typed literals) is element-non-
    // null, but join/coalesce/checkpoint plumbing widens the DECLARED
    // flag to true, so a strict check would reject the production
    // pipeline over a flag that carries no information here. An actual
    // null slot fails LOUDLY at runtime (interSize throws), matching
    // the fail-fast contract of the unsorted/non-distinct cases.
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two $want arguments (sorted ascending, distinct), " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectOps.interSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.spark.SortedIntersectOps.interSize($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dlx_sorted_inter"
}

object SortedIntersectSize {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dlx_sorted_inter", args => SortedIntersectSize(args(0), args(1)), "built-in")
  }
}
