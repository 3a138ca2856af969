package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-window training-sample generation.
  *
  * Re-expresses the reference's per-user python loop
  * (`generate_training_data.py:115-178`): for each user's time-ordered
  * interaction sequence, emit (history-prefix, candidate) pairs starting at
  * `minHistory`, striding by `stride`, with the history capped to the last
  * `maxHistory` items.
  *
  * Scale design: one window over (user, ts) — a single shuffle; the
  * bounded `rowsBetween(-maxHistory, -1)` frame keeps per-row state at
  * O(maxHistory) instead of materializing unbounded prefixes, so memory is
  * flat no matter how long a power-user's sequence is.
  */
object PrefixWindow {

  /** Emit one sample row per kept position.
    *
    * Output columns: all of `df`'s, plus `idx` (1-based position within the
    * user's sequence) and `history` (array of the previous ≤ maxHistory
    * item values, oldest→newest).
    */
  def samples(
      df: DataFrame,
      user: String,
      ts: String,
      item: Column,
      minHistory: Int,
      stride: Int,
      maxHistory: Int,
      tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val ord = (col(ts) +: tieBreak)
    val w = Window.partitionBy(col(user)).orderBy(ord: _*)
    val frame = w.rowsBetween(-maxHistory.toLong, -1L)
    df.withColumn("idx", row_number().over(w))
      .withColumn("history", collect_list(item).over(frame))
      .where(col("idx") > minHistory &&
        (col("idx") - minHistory - 1) % stride === 0)
  }

  /** Per-entity rolling-window features — the standard real-time feature
    * bank build (recency, frequency, short-horizon aggregates) every
    * ranker consumes alongside embeddings: inter-event gap and the
    * last-`lastN`-rows running count / sum / mean of `value`, per entity
    * in event-time order.
    *
    * One shuffle (the entity window); the `rowsBetween(-(lastN−1), 0)`
    * frame keeps per-row state O(lastN) — flat memory at any entity
    * activity. The rolling mean is ROUNDED (6 dp): a bounded frame sums
    * ≤ lastN doubles whose accumulation order is engine-internal
    * (segment-tree vs streaming), and 6 dp absorbs the ulp gap — same
    * contract as the other float-emitting operators.
    * `tieBreak` must complete a total order or lag/frames are
    * nondeterministic. Output: input keys + (gap, roll_n, roll_sum,
    * roll_mean). */
  def rollingFeatures(df: DataFrame, entity: String, ts: String,
      value: String, lastN: Int,
      tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col(ts) +: tieBreak: _*)
    val frame = w.rowsBetween(-(lastN.toLong - 1), 0L)
    df.withColumn("gap", col(ts) - lag(col(ts), 1).over(w))
      .withColumn("roll_n", count(col(value)).over(frame))
      .withColumn("roll_sum", round(sum(col(value)).over(frame), 6))
      .withColumn("roll_mean", round(avg(col(value)).over(frame), 6))
  }

  /** Pad a sequence column to exactly `len` entries with `padValue`,
    * appending, and expose the true length (reference `din/utils.py:74-92`).
    * Returns (padded, length) columns.
    */
  def padded(seq: Column, len: Int, padValue: Column): (Column, Column) = {
    val n = least(size(seq), lit(len))
    val padded = concat(
      slice(seq, 1, len),
      array_repeat(padValue, (lit(len) - n).cast("int")))
    (padded, n)
  }
}
