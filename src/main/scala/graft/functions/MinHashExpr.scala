package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature kernels.
  *
  * The composed HOF forms (`transform(seeds, seed => aggregate(shingles,
  * MaxValue, least(acc, xxhash64(s, seed))))`) are interpreted per element
  * per seed — numHashes full passes over the shingle array, re-hashing the
  * whole string each time. These expressions make one pass: the string is
  * xxhash'd ONCE per shingle and the per-seed values derive from cheap
  * integer mixes (exactly how Spark's own `xxhash64(s, seed)` folds a
  * trailing int column into an accumulated hash), or, for the
  * engine-portable md5 variant, the digest loop runs on reused
  * MessageDigest state with no per-element Catalyst allocations.
  *
  * Values are BIT-IDENTICAL to the composed forms (pinned by
  * LlmOpsSpec): `MinHashSig(k)` = `xxhash64(shingle, k)` =
  * `XXH64.hashInt(k, XXH64.hashUTF8String(shingle, 42))`, and
  * `MinHashSigMd5` reproduces `array_min(transform(shingles,
  * s => md5(concat(lit(s"$k§"), s))))` including null/empty edges — so
  * the DuckDB oracle for the portable variant is unaffected.
  *
  * CodegenFallback is deliberate: per-row work is O(shingles × seeds)
  * hashes, so the fallback's row-boxing overhead is noise (unlike
  * [[DotProduct]], whose per-row work is a single short loop).
  */
private[graft] trait MinHashKernel extends UnaryExpression {
  def numHashes: Int

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"expects array<string> shingles, got ${t.catalogString}")
  }
}

/** xxhash64-seeded MinHash signature: `sig[k] = min over shingles of
  * xxhash64(shingle, k)`; empty input folds to Long.MaxValue per position
  * (callers use `sig[0] == Long.MaxValue` as the degenerate-doc filter). */
case class MinHashSig(child: Expression, numHashes: Int)
    extends MinHashKernel with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // null shingle: Spark's hash expressions skip null children, leaving
      // the accumulated seed (42) — mirror that so values stay identical
      val base = if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var k = 0
      while (k < numHashes) {
        val h = XXH64.hashInt(k, base)
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Engine-portable MinHash signature: `sig[k] = min over shingles of
  * md5(concat("<k>§", shingle))` as lowercase hex (hex-string min ==
  * unsigned digest min — the nibble→char map is monotonic). Null shingles
  * are skipped (`md5(concat(p, null))` is null and `array_min` ignores
  * nulls); an empty/all-null input yields all-null signature positions,
  * matching the composed form's `array_min(empty) = null`. */
case class MinHashSigMd5(child: Expression, numHashes: Int)
    extends MinHashKernel with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  @transient private lazy val prefixes: Array[Array[Byte]] =
    (0 until numHashes).map(i => s"$i§".getBytes("UTF-8")).toArray

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[Array[Byte]](numHashes)
    if (n > 0) {
      val md = MessageDigest.getInstance("MD5")
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val sBytes = arr.getUTF8String(i).getBytes
          var k = 0
          while (k < numHashes) {
            md.reset()
            md.update(prefixes(k))
            md.update(sBytes)
            val d = md.digest()
            if (mins(k) == null ||
                java.util.Arrays.compareUnsigned(d, mins(k)) < 0) mins(k) = d
            k += 1
          }
        }
        i += 1
      }
    }
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) {
      if (mins(k) != null) out(k) = hex(mins(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFunctions {
  def minHash(shingles: Column, numHashes: Int): Column =
    GraftSqlShim.column(
      MinHashSig(GraftSqlShim.expression(shingles), numHashes))

  def minHashMd5(shingles: Column, numHashes: Int): Column =
    GraftSqlShim.column(
      MinHashSigMd5(GraftSqlShim.expression(shingles), numHashes))
}
