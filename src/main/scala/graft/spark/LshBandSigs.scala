package graft.spark

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic banded random-hyperplane signatures.
  *
  * Plane coefficients use the same md5 derivation the single-band
  * design used (and the DuckDB oracle replays in SQL): for GLOBAL
  * plane index p and dimension d,
  *   coeff = (hex2long(md5("p_d")[0,8)) % 1000)/1000 - 0.5.
  * Band j owns planes [j*r, (j+1)*r); its signature is the r sign
  * bits of v·plane concatenated in plane order. The dot product folds
  * dimensions in array order — bit-identical to the oracle's
  * list_sum(list_transform(...)) sequential fold, so a sign can never
  * differ between engines.
  *
  * The coefficient matrix is built lazily per (bands, r, dims) and
  * memoized PER JVM — executors derive it locally from the md5 rule
  * (nothing is shipped), and the expression itself carries only the
  * two small ints, keeping the plan free of b*r*64 literals.
  */
object LshPlanes {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def md5hex8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  def matrix(bands: Int, r: Int, dims: Int): Array[Array[Double]] =
    cache.computeIfAbsent((bands, r, dims), { _ =>
      Array.tabulate(bands * r) { p =>
        Array.tabulate(dims) { d =>
          (md5hex8(s"${p}_$d") % 1000).toDouble / 1000.0 - 0.5
        }
      }
    })

  /** All b band signatures of one vector, as array<string>. */
  def bandSignatures(v: ArrayData, bands: Int, r: Int): GenericArrayData = {
    val dims = v.numElements()
    val m = matrix(bands, r, dims)
    val out = new Array[Any](bands)
    var j = 0
    while (j < bands) {
      val sb = new java.lang.StringBuilder(r)
      var k = 0
      while (k < r) {
        val plane = m(j * r + k)
        var acc = 0.0d
        var d = 0
        while (d < dims) { acc += v.getDouble(d) * plane(d); d += 1 }
        sb.append(if (acc > 0) '1' else '0')
        k += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `dlx_lsh_bands(v, bands, r)` → array<string> of the b band
  * signatures of an array<double> vector. Codegen'd: one static call
  * per row, no per-element lambda interpretation. */
case class LshBandSigsExpr(child: Expression, bands: Int, r: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    LshPlanes.bandSignatures(input.asInstanceOf[ArrayData], bands, r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.spark.LshPlanes.bandSignatures($c, $bands, $r)")

  override protected def withNewChildInternal(newChild: Expression): LshBandSigsExpr =
    copy(child = newChild)

  override def prettyName: String = "dlx_lsh_bands"
}

object LshBandSigsExpr {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dlx_lsh_bands",
      args => LshBandSigsExpr(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue()),
      "built-in")
  }
}
