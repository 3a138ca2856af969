package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucket-local i<j pair generation — the shared quadratic step behind
  * every pair-family operator (near-dup banding, shingle intersection,
  * winnowing overlap, PMI co-occurrence, item-CF baskets, swing user
  * pairs).
  *
  * Input: a frame with a SORTED member-array column (any element type —
  * the hot-bucket cap upstream bounds its length) plus optional carry
  * columns; output: the carries plus one `p` struct column holding every
  * i<j element pair as fields `p.<a>` / `p.<b>`.
  *
  * TWO-level explode by construction: first the anchor index, then that
  * anchor's ≤|members| partners. The obvious single-level
  * `explode(flatten(transform(sequence…)))` materializes ALL
  * C(|members|, 2) pair structs in ONE row before the explode — at the
  * 10k member cap d7 carried before round 8 that is ~50 million structs (GBs) in
  * a single row, the executor OOM the round-8 100× ScaleSmoke run caught
  * on `d7_dup_clusters`. With the two-level form no intermediate row
  * ever holds more than |members| structs, so per-row memory stays
  * O(cap) at any corpus scale while the emitted pair set is identical
  * (same sorted order, same i<j coverage). */
object PairGen {

  /** Explode `ms` (a pre-sorted array column of `members`) into all i<j
    * pairs as a `p` struct with fields `a`/`b`; `carry` columns (by
    * name) ride along unchanged. Rows with fewer than 2 members emit
    * nothing. */
  def pairs(members: DataFrame, ms: String, a: String, b: String,
      carry: String*): DataFrame = {
    val keep = carry.map(col)
    members
      .where(size(col(ms)) >= 2)
      .select((keep :+ col(ms).as("__ms") :+
        explode(sequence(lit(0), size(col(ms)) - 2)).as("__pi")): _*)
      .select((keep :+ explode(transform(
        slice(col("__ms"), col("__pi") + 2,
          size(col("__ms")) - col("__pi") - 1),
        e => struct(element_at(col("__ms"), col("__pi") + 1).as(a),
          e.as(b)))).as("p")): _*)
  }
}
