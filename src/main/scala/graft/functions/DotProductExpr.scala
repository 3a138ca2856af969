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

/** Column-API surface for the native expressions. */
object GraftFunctions {
  import org.apache.spark.sql.graftshim.GraftSqlShim

  /** Register SQL names (`graft_dot`) in the session's function registry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftSqlShim.registerFunction(spark, "graft_dot",
      exprs => DotProduct(exprs.head, exprs(1)))

  def dot(x: Column, y: Column): Column =
    GraftSqlShim.column(
      DotProduct(GraftSqlShim.expression(x), GraftSqlShim.expression(y)))

  /** Cosine via three fused dot products — identical arithmetic to
    * `VectorOps.cosine` (sequential double folds, sqrt of sums). A zero
    * vector yields 0/0 = NaN, and NaN sorts as the LARGEST double in a
    * descending rank — every top-k list would lead with the zero vector —
    * so NaN is normalized to 0 (similarity of a zero vector is 0). */
  def cosine(x: Column, y: Column): Column = {
    import org.apache.spark.sql.functions.{lit, nanvl, sqrt}
    nanvl(dot(x, y) / (sqrt(dot(x, x)) * sqrt(dot(y, y))), lit(0.0))
  }
}
