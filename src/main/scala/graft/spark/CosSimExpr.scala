package graft.spark

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native 4-decimal cosine similarity over two array<double> columns.
  *
  * Replaces the interpreted `round(aggregate(zip_with(a, b, _*_), 0.0,
  * _+_) / (sqrt(...)·sqrt(...)), 4)` composition: higher-order
  * functions are CodegenFallback, so on a candidate-pair verify of
  * millions of rows the per-element lambda interpretation dominated
  * the query. Arithmetic here is BIT-IDENTICAL to that composition
  * (and to the DuckDB oracle's sequential list_sum fold): dot products
  * fold dimensions in array order, norms are sqrt of the self-dot,
  * and rounding replays Spark Round's BigDecimal.valueOf(...)
  * .setScale(4, HALF_UP) on the quotient. */
object CosSimOps {
  def cos4(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dab = 0.0d; var daa = 0.0d; var dbb = 0.0d
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    val raw = dab / (math.sqrt(daa) * math.sqrt(dbb))
    if (java.lang.Double.isNaN(raw) || java.lang.Double.isInfinite(raw)) raw
    else java.math.BigDecimal.valueOf(raw)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}

case class CosSimExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosSimOps.cos4(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.spark.CosSimOps.cos4($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosSimExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dlx_cos4"
}

object CosSimExpr {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dlx_cos4", args => CosSimExpr(args(0), args(1)), "built-in")
  }
}
