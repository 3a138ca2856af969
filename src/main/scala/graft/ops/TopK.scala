package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-K operators (reference: `torch.topk` / `sorted(desc)[:n]` sites,
  * `eval_online/main/inference.py:72-104`, `model_service/models.py:55-210`).
  *
  * Per-group top-k lowers to a rank window — Spark executes it as a single
  * shuffle on the group key with a partial sort; AQE splits skewed groups.
  * Global top-k uses `orderBy().limit(k)` which Spark plans as
  * `TakeOrderedAndProject` (per-partition heap + driver merge of k·P rows,
  * no global sort — the right plan at 100 TB).
  */
object TopK {

  /** Keep the top `k` rows per group, ranked by `order` (include explicit
    * tie-break columns in `order` for deterministic results).
    */
  def perGroup(df: DataFrame, group: Seq[Column], order: Seq[Column], k: Int,
      rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(group: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w))
      .where(col(rankCol) <= k)
  }

  /** Global top-k → `TakeOrderedAndProject`. */
  def global(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Per-group top-k as a NATIVE AGGREGATE (`TopKLargest`, a
    * `TypedImperativeAggregate` with a k-capped heap) instead of a rank
    * window. Both forms shuffle O(groups·k·tasks) rows (Spark 4 inserts
    * a partial `WindowGroupLimit` for rank filters), but the window form
    * must SORT its input on (group, order) on both sides of the shuffle;
    * the aggregate takes unsorted input through heap updates —
    * O(n log k), O(1) compares once saturated — with no sort at either
    * end. Prefer it at scale whenever only the top rows are consumed
    * and the extra columns fit in the ranking struct.
    *
    * `order` columns rank lexicographically DESCENDING (negate a numeric
    * column to flip it: e.g. `Seq(score, -id)` for ascending-id
    * tie-break); `payload` columns ride along after them (and settle any
    * remaining ties, keeping the result deterministic). Output: one row
    * per kept input row, `rank` = 1-based position within the group.
    */
  def perGroupAgg(df: DataFrame, group: Seq[Column], order: Seq[Column],
      payload: Seq[Column], k: Int, rankCol: String = "rank"): DataFrame = {
    val tops = df.groupBy(group: _*)
      .agg(graft.functions.TopKAgg.topK(struct(order ++ payload: _*), k).as("__top"))
    tops.select(group ++ Seq(posexplode(col("__top")).as(Seq("__i", "__s"))): _*)
      .withColumn(rankCol, (col("__i") + 1).cast("long"))
      .select(group ++ Seq(col(rankCol), col("__s.*")): _*)
      .drop("__i")
  }
}
