package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: EXACT fixed-point dot product of a float
  * vector column against a LITERAL double centroid — Σᵢ
  * halfUp(xᵢ·centᵢ·scale) accumulated in 64-bit integers, where
  * halfUp(y) rounds half away from zero (`y ≥ 0 ? ⌊y+0.5⌋ : ⌈y−0.5⌉` —
  * exactly BigDecimal HALF_UP at scale 0 for |y| < 2^52, including
  * exact halves, since +0.5 is exact there). The per-element product
  * chain `x * c * scale` is plain IEEE arithmetic spelled identically
  * in the DuckDB oracle (`round(v.x * c.c * 1e12, 0)`), so both
  * engines land on the SAME lattice integer with no shortest-repr
  * subtleties, and the integer sum is order-free.
  *
  * Why an expression and not the `aggregate(zip_with(...))` HOF chain:
  * higher-order functions evaluate their lambdas interpreted
  * (CodegenFallback-grade cost per element); with k centroids × dims
  * elements per row this dominated x134's runtime. This emits one
  * tight primitive loop per centroid inside whole-stage codegen — the
  * DotProduct precedent applied to the fixed-point policy.
  *
  * Scale safety (documented at the call sites): |x·c| ≤ 1 and dims ≤
  * 64 keeps |Σ| ≤ 6.4e13 ≪ 2^63. */
case class LatticeDot(child: Expression, cent: Array[Double],
    scale: Double) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lattice_dot"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.catalogString}")
  }

  private lazy val childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), cent.length)
    var s = 0L
    var i = 0
    while (i < n) {
      val xi = if (childIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val y = xi * cent(i) * scale
      s += (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("cent", cent, "double[]")
    val get = if (childIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $centRef.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $y = ((double) $a.$get($i)) * $centRef[$i] * $scale;
         |  $s += (long) ($y >= 0
         |    ? java.lang.Math.floor($y + 0.5)
         |    : java.lang.Math.ceil($y - 0.5));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LatticeDot =
    copy(child = newChild)
}

object LatticeDot {
  import org.apache.spark.sql.GraftBridge
  def dot(vec: Column, cent: Array[Double], scale: Double): Column =
    GraftBridge.column(LatticeDot(GraftBridge.expression(vec), cent, scale))
}
