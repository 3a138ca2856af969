package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J2: id → dense-index dictionary (deterministic StringIndexer), the
  * standard two-level zipWithIndex lowering.
  *
  * A naive `row_number().over(Window.orderBy(key))` funnels the whole
  * distinct-key set through ONE partition (`Exchange SinglePartition`) —
  * the one plan shape that cannot scale past a single executor. Instead:
  *
  *  1. range-repartition + sort the distinct keys (ascending ranges land in
  *     ascending partition ids — the global order is preserved);
  *  2. local rank per partition (window keyed by `spark_partition_id()` —
  *     parallel across the range partitions);
  *  3. per-partition counts → prefix-sum offsets (one row per PARTITION,
  *     bounded by the cluster's partition count, never by data — the only
  *     single-partition window runs over those ≤ numPartitions rows);
  *  4. broadcast the offsets back and add.
  *
  * Index assignment is identical to the single-partition form:
  * `dense_idx = rank_in_ascending_key_order - 1` (reference
  * `lightgcn/utils.py:56-66` builds the same dict from sorted unique ids).
  */
object DictIndex {

  /** Returns `(key, idxCol)` with dense 0-based indexes in ascending key
    * order. `df` may contain duplicates — keys are made distinct first. */
  def denseIds(df: DataFrame, key: String, idxCol: String,
      numPartitions: Int = 0): DataFrame = {
    val keys0 = df.select(col(key)).distinct()
    val keys = (if (numPartitions > 0)
        keys0.repartitionByRange(numPartitions, col(key))
      else keys0.repartitionByRange(col(key)))
      .sortWithinPartitions(col(key))
      .withColumn("__pid", spark_partition_id())
    val offsets = keys.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .withColumn("__off",
        coalesce(sum(col("__c")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val localW = Window.partitionBy(col("__pid")).orderBy(col(key))
    keys.withColumn("__lrn", row_number().over(localW))
      .join(broadcast(offsets), Seq("__pid"))
      .select(col(key),
        (col("__off") + col("__lrn") - 1).cast("long").as(idxCol))
  }
}
