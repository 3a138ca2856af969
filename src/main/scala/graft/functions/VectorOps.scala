package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dense-vector column operators over `array<float|double>` embeddings
  * (reference: matmul recall `eval_online/main/lightgcn.py:32-45`, mean-pool
  * user features `ranknet/utils.py:102-126`).
  *
  * All pure higher-order-function expressions — whole-stage-codegen'd, no
  * UDF serialization, no MLlib Vector boxing in the hot path.
  */
object VectorOps {

  /** Σ xᵢ·yᵢ. Inputs are cast to double; `aggregate` folds sequentially so
    * the result is bit-deterministic for a given array order. */
  def dot(x: Column, y: Column): Column =
    aggregate(
      zip_with(x.cast("array<double>"), y.cast("array<double>"), (a, b) => a * b),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(x: Column): Column =
    sqrt(aggregate(x.cast("array<double>"), lit(0.0), (acc, v) => acc + v * v))

  /** NaN (zero-vector 0/0) normalized to 0 — see GraftFunctions.cosine. */
  def cosine(x: Column, y: Column): Column =
    nanvl(dot(x, y) / (l2Norm(x) * l2Norm(y)), lit(0.0))

  /** Element-wise sum of two vectors (used by the SpMM propagation loop). */
  def vecAdd(x: Column, y: Column): Column =
    zip_with(x, y, (a, b) => a + b)

  def vecScale(x: Column, s: Column): Column =
    transform(x, v => v * s)

  /** Per-vector affine int8 quantization — the standard storage reduction
    * for 100 TB embedding tables (4 B float → 1 B code + 2 scalars/row).
    * Codes: `floor((x - mn)/scale + 0.5)` with `scale = (mx - mn)/255`
    * (explicit floor(+0.5), not `round`, so half-even-rounding engines
    * replicate it exactly); a constant vector (scale 0) maps to all-zero
    * codes. Returns struct(codes array<double> of 0..255 ints, mn, scale) —
    * `dequantize` inverts to `code·scale + mn`. */
  def quantizeInt8(x: Column): Column = {
    val v = x.cast("array<double>")
    val mn = array_min(v)
    val scale = (array_max(v) - mn) / lit(255.0)
    struct(
      when(scale > 0,
          transform(v, e => floor((e - mn) / scale + lit(0.5))))
        .otherwise(transform(v, _ => lit(0.0))).as("codes"),
      mn.as("mn"), scale.as("scale"))
  }

  /** Inverse of [[quantizeInt8]]: `code·scale + mn` per element. */
  def dequantize(q: Column): Column =
    transform(q.getField("codes"),
      c => c * q.getField("scale") + q.getField("mn"))

  /** Group-wise mean-pool of a vector column: posexplode → per-dimension
    * avg → reassemble. One shuffle on (groupCols, dim) then one on
    * groupCols; at scale this beats collecting whole vectors per group
    * because the shuffle rows are scalars.
    *
    * Output: groupCols + `outCol: array<double>` (ordered by dimension).
    */
  def meanPool(df: DataFrame, groupCols: Seq[String], vec: Column,
      outCol: String): DataFrame = {
    val g = groupCols.map(col)
    df.select(g :+ posexplode(vec.cast("array<double>")).as(Seq("__pos", "__v")): _*)
      .groupBy(g :+ col("__pos"): _*)
      .agg(avg(col("__v")).as("__avg"))
      .groupBy(g: _*)
      .agg(array_sort(collect_list(struct(col("__pos"), col("__avg")))).as("__pairs"))
      .withColumn(outCol, transform(col("__pairs"), p => p.getField("__avg")))
      .drop("__pairs")
  }
}
