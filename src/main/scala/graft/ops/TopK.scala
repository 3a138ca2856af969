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
}
