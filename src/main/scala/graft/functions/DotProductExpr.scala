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
  * scoring (J7/M1) and ANN search. Semantics match `VectorOps.dot`
  * exactly, including edges: sequential fold, elements widened to double
  * before multiply, and NULL out on length mismatch or a null element
  * (`zip_with` pads the shorter side with nulls and `null * x` poisons the
  * fold) — so results are bit-identical and oracle-safe on ANY input, not
  * just well-formed embeddings.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null is produced on length mismatch / null elements even when the
  // array columns themselves are non-nullable
  override def nullable: Boolean = true

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
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += get(a, i, ta) * get(b, i, tb)
      i += 1
    }
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
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += (${getter(elemType(left), a, i)}) * (${getter(elemType(right), b, i)});
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
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
  * order per sum and the null edges (length mismatch / null element →
  * NULL) match [[DotProduct]] / the composed form exactly, so results are
  * bit-identical. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

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
    val n = a.numElements()
    if (n != b.numElements()) return null
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
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
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $xy = 0.0, $xx = 0.0, $yy = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = ${getter(elemType(left), a, i)};
         |    double $y = ${getter(elemType(right), b, i)};
         |    $xy += $x * $y; $xx += $x * $x; $yy += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    double $c = $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
         |    ${ev.value} = java.lang.Double.isNaN($c) ? 0.0 : $c;
         |  }
         |}
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

  /** Register SQL names (`graft_dot`, `graft_cosine`, `graft_quality`) in
    * the session's function registry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftSqlShim.registerFunction(spark, "graft_dot",
      exprs => DotProduct(exprs.head, exprs(1)))
    GraftSqlShim.registerFunction(spark, "graft_cosine",
      exprs => CosineSim(exprs.head, exprs(1)))
    GraftSqlShim.registerFunction(spark, "graft_quality",
      exprs => GraftSqlShim.eagerExpression(
        TextFunctions.hashedClassifierScore(GraftSqlShim.column(exprs.head))))
    GraftSqlShim.registerFunction(spark, "graft_topk", {
      case Seq(e, org.apache.spark.sql.catalyst.expressions.IntegerLiteral(k)) =>
        TopKLargest(e, k)
      case other => throw new IllegalArgumentException(
        s"graft_topk expects (expr, int literal), got ${other.size} args")
    })
    GraftSqlShim.registerFunction(spark, "graft_kmv", {
      case Seq(e, org.apache.spark.sql.catalyst.expressions.IntegerLiteral(k)) =>
        KmvSmallest(e, k)
      case other => throw new IllegalArgumentException(
        s"graft_kmv expects (hash, int literal), got ${other.size} args")
    })
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
