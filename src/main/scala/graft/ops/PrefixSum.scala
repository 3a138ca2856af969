package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum (parallel scan) — the generalization of
  * [[DictIndex.denseIds]] from counting to summing: each row gets the
  * cumulative total of `value` over all rows BEFORE it in the global
  * `order`. A naive `sum().over(Window.orderBy(...))` funnels the whole
  * table through one partition; this is the standard two-level lowering:
  *
  *  1. range-repartition + local sort on the order key (ascending ranges
  *     land in ascending partition ids, preserving global order);
  *  2. local running sum per partition (parallel);
  *  3. per-partition totals → offsets (≤ numPartitions rows — the only
  *     single-partition step is bounded by cluster width, not data);
  *  4. broadcast offsets back and add.
  *
  * The cumulative-range form ([lo, hi) per row) is what multinomial
  * samplers consume: a uniform draw in [0, total) selects the row whose
  * range contains it ([[Sampling.weightedNegatives]]).
  */
object PrefixSum {

  /** Adds `loCol` (exclusive prefix sum — total of all earlier rows) and
    * `hiCol` (= lo + value) in ascending `order`. `value` must be a
    * non-negative integral column (long ranges stay exact; doubles would
    * accumulate order-dependent error across engines).
    *
    * `order` must be a UNIQUE key: rows tying on it have an arbitrary
    * relative order in the partition-local running-sum window, so their
    * lo/hi assignments could differ across runs. Every current caller
    * passes a key column; append a tiebreaker (e.g. the row id) before
    * calling if yours isn't. */
  def ranges(df: DataFrame, order: Seq[String], value: Column,
      loCol: String, hiCol: String, numPartitions: Int = 0): DataFrame = {
    val oc = order.map(col)
    val part = (if (numPartitions > 0)
        df.repartitionByRange(numPartitions, oc: _*)
      else df.repartitionByRange(oc: _*))
      .sortWithinPartitions(oc: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast("long"))
    val offsets = part.groupBy(col("__pid")).agg(sum(col("__v")).as("__c"))
      .withColumn("__off",
        coalesce(sum(col("__c")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val localW = Window.partitionBy(col("__pid")).orderBy(oc: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    part
      .withColumn("__lcum", coalesce(sum(col("__v")).over(localW), lit(0L)))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(loCol, (col("__off") + col("__lcum")).cast("long"))
      .withColumn(hiCol, (col(loCol) + col("__v")).cast("long"))
      .drop("__pid", "__v", "__lcum", "__off")
  }
}
