package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-stage-codegen'd Σ xᵢ·yᵢ over `array<float|double>` columns.
  *
  * The composable form (`VectorOps.dot` = `aggregate(zip_with(...))`)
  * allocates an intermediate array and walks lambda-bound expressions per
  * element in interpreted mode; this native expression compiles to a tight
  * primitive loop inside the generated code — the hot kernel of recall
  * scoring (J7/M1) and ANN search. Accumulation order and widening match
  * `VectorOps.dot` exactly (sequential fold, elements widened to double
  * before multiply), so results are bit-identical and oracle-safe.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) match {
      case FloatType | DoubleType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def get(a: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += get(a, i, ta) * get(b, i, tb); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(et: DataType, arr: String, i: String): String = et match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (${getter(elemType(left), a, i)}) * (${getter(elemType(right), b, i)});
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity: Σxy, Σx², Σy² accumulated in ONE pass over the
  * arrays (the 3-dot-product composition walks them three times), then
  * xy / (√x² · √y²) with NaN (zero vector) normalized to 0. Accumulation
  * order per sum matches [[DotProduct]] exactly, so results are
  * bit-identical to the composed form. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) match {
      case FloatType | DoubleType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    def get(x: ArrayData, i: Int, et: DataType): Double = et match {
      case FloatType => x.getFloat(i).toDouble
      case _ => x.getDouble(i)
    }
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, ta); val y = get(b, i, tb)
      xy += x * y; xx += x * x; yy += y * y
      i += 1
    }
    val c = xy / (math.sqrt(xx) * math.sqrt(yy))
    if (java.lang.Double.isNaN(c)) 0.0 else c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(et: DataType, arr: String, i: String): String = et match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val xy = ctx.freshName("xy"); val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $xy = 0.0, $xx = 0.0, $yy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(elemType(left), a, i)};
         |  double $y = ${getter(elemType(right), b, i)};
         |  $xy += $x * $y; $xx += $x * $x; $yy += $y * $y;
         |}
         |double $c = $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
         |${ev.value} = java.lang.Double.isNaN($c) ? 0.0 : $c;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the native expressions. */
object GraftFunctions {
  import org.apache.spark.sql.graftshim.GraftSqlShim

  /** Register SQL names (`graft_dot`, `graft_cosine`) in the session's
    * function registry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftSqlShim.registerFunction(spark, "graft_dot",
      exprs => DotProduct(exprs.head, exprs(1)))
    GraftSqlShim.registerFunction(spark, "graft_cosine",
      exprs => CosineSim(exprs.head, exprs(1)))
  }

  def dot(x: Column, y: Column): Column =
    GraftSqlShim.column(
      DotProduct(GraftSqlShim.expression(x), GraftSqlShim.expression(y)))

  /** Single-pass fused cosine (see [[CosineSim]]): bit-identical to the
    * 3-dot composition, one array walk instead of three, NaN (zero
    * vector) → 0 so a zero embedding can't lead a descending top-k. */
  def cosine(x: Column, y: Column): Column =
    GraftSqlShim.column(
      CosineSim(GraftSqlShim.expression(x), GraftSqlShim.expression(y)))
}
