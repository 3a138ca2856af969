package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-estimate probe into a serialized count-min sketch — the read
  * half Spark never shipped: `count_min_sketch(...)` (Cormode &
  * Muthukrishnan 2005) aggregates a corpus into a KB-sized binary in one
  * pass with map-side merge, but SQL offers no function to query it.
  * `CmsEstimate(sketch, item)` returns the sketch's estimated occurrence
  * count of `item`, with the classic one-sided guarantee: estimate ≥
  * true count, and ≤ true count + eps·N with probability `confidence`.
  *
  * Hash parity with the writer (`CountMinSketchAgg.update`): strings are
  * added as `addBinary(utf8Bytes)`, integral types via `addLong` — the
  * probe mirrors both paths exactly, so estimates are the same numbers
  * the aggregating executors computed.
  *
  * Why it matters at 100 TB: token/id frequency against a full corpus
  * becomes one broadcastable KB instead of a billion-row count table —
  * build the sketch once, probe any later candidate set with a broadcast
  * join, no second pass over the corpus. The probe side is by design a
  * SMALL frame (candidates), so this expression stays interpreted
  * (CodegenFallback) and memoizes deserialization: the sketch column is
  * the same aggregate scalar on every row, so after the first row each
  * probe pays one KB-sized `Arrays.equals` and a hash, not a rebuild.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val itemOk = right.dataType match {
      case StringType | ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (left.dataType == BinaryType && itemOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects (binary sketch, string|integral item), got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if ((cachedBytes ne bytes) &&
        (cachedSketch == null || !java.util.Arrays.equals(cachedBytes, bytes))) {
      cachedSketch = CountMinSketch.readFrom(bytes)
      cachedBytes = bytes
    }
    item match {
      case s: UTF8String => cachedSketch.estimateCount(s.getBytes)
      case n: java.lang.Number => cachedSketch.estimateCount(
        java.lang.Long.valueOf(n.longValue()))
      case other => cachedSketch.estimateCount(other)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SketchFunctions {
  /** Column form: estimated count of `item` in `sketch` (a
    * `count_min_sketch(...)` binary). */
  def cmsEstimate(sketch: Column, item: Column): Column =
    GraftSqlShim.column(CmsEstimate(
      GraftSqlShim.expression(sketch), GraftSqlShim.expression(item)))
}
