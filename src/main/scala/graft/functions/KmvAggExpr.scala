package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded KMV buffer: the k SMALLEST DISTINCT long values seen so far.
  * Max-heap (head = largest kept = the one a smaller newcomer evicts)
  * plus a hash set for O(1) dedup — a duplicate hash must not occupy two
  * of the k slots or the density estimate skews low. */
final class KmvBuffer(val k: Int) {
  val heap = new mutable.PriorityQueue[Long]()
  private val members = new mutable.HashSet[Long]()

  def offer(v: Long): Unit =
    if (!members.contains(v)) {
      if (heap.size < k) { heap.enqueue(v); members.add(v) }
      else if (v < heap.head) {
        members.remove(heap.dequeue()); heap.enqueue(v); members.add(v)
      }
    }

  def sortedAsc: Array[Long] = { val a = heap.toArray; java.util.Arrays.sort(a); a }
}

/** KMV (k-minimum-values) distinct sketch as a native aggregate: keeps
  * the k smallest distinct values of a uniform 64-bit hash column and
  * evaluates to them sorted ascending (`array<bigint>`).
  *
  * Why it exists next to HLL (`a14`): HLL estimates ONE set's
  * cardinality and can merge by union only — it cannot estimate an
  * INTERSECTION (audience overlap), which is the question recsys
  * segment analysis actually asks. KMV sketches are closed under both:
  * union = k smallest of the merged arrays, and the Jaccard fraction of
  * shared values in the union sketch is an unbiased overlap estimator
  * (Beyer et al., SIGMOD'07, "On synopses for distinct-value estimation
  * under multiset operations"). Estimator arithmetic lives in
  * [[KmvAgg.estimateDistinct]] / [[KmvAgg.overlap]] as plain column
  * expressions over the ≤k-element arrays.
  *
  * Scale: aggregation state is ≤k longs per group per task regardless of
  * input size — the raw (possibly 100 TB) value stream is never
  * shuffled, only serialized k-arrays merge across partitions; the same
  * posture as `TopKLargest`, whose codec this reuses in simplified
  * long-only form. Reference analogue: the overlap ratios behind the
  * train/test leakage checks around the user hold-out split
  * (`deploy_datapipeline/data_processing/split_users.py:22-32`).
  */
case class KmvSmallest(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    else if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmv expects a BIGINT hash column, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.offer(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    other.heap.foreach(buffer.offer)
    buffer
  }

  override def eval(buffer: KmvBuffer): Any =
    new GenericArrayData(buffer.sortedAsc)

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.heap.size)
    buffer.heap.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buffer = new KmvBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { buffer.offer(in.readLong()); i += 1 }
    buffer
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSmallest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSmallest =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSmallest =
    copy(child = newChild)
}

object KmvAgg {
  import org.apache.spark.sql.graftshim.GraftSqlShim

  /** Aggregate a BIGINT hash column to its k smallest distinct values,
    * ascending. Hash inputs with [[hash64]] first. */
  def kmv(of: Column, k: Int): Column =
    GraftSqlShim.column(
      KmvSmallest(GraftSqlShim.expression(of), k).toAggregateExpression())

  /** Sign-cleared xxhash64 — uniform over [0, 2⁶³), the domain the
    * density estimator below assumes. */
  def hash64(c: Column): Column =
    xxhash64(c).bitwiseAND(lit(Long.MaxValue))

  private val Domain = math.pow(2.0, 63)

  /** Distinct-count estimate from one KMV sketch array (ascending,
    * ≤k values): exact size while the sketch is unsaturated (it then
    * holds EVERY distinct hash), else (k−1)/u(m_k) where m_k is the
    * largest kept hash and u normalizes to (0,1]. */
  def estimateDistinct(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (element_at(sketch, k).cast("double") / lit(Domain)))

  /** (est_a, est_b, est_overlap) column triple for two KMV sketches of
    * the same k: the union sketch is the k smallest of the merged
    * arrays; the fraction of its values present in BOTH input sketches
    * estimates the Jaccard similarity, scaled by the union estimate. */
  def overlap(sa: Column, sb: Column, k: Int): (Column, Column, Column) = {
    val union = slice(array_sort(array_union(sa, sb)), 1, k)
    val shared = size(array_intersect(array_intersect(union, sa), sb))
    val jac = when(size(union) > 0,
      shared.cast("double") / size(union)).otherwise(lit(0.0))
    (estimateDistinct(sa, k), estimateDistinct(sb, k),
      jac * estimateDistinct(union, k))
  }
}
