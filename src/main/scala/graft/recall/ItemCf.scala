package graft.recall

import graft.ops.TopK
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-item co-occurrence collaborative filtering — the classic
  * neighborhood recall source ("users who took X also took Y";
  * Sarwar et al., WWW 2001) that graph/neural recall stacks like the
  * reference's LightGCN sit on top of (`lightgcn/model.py` learns what
  * this counts directly). One co-occurrence table serves both a recall
  * stage (per-item neighbor lists) and feature engineering (co-count /
  * cosine as ranker inputs).
  *
  * Scale posture: the only quadratic step — within-basket pair
  * generation — is bucket-local over each basket's collected member
  * list, with hyperactive baskets capped by a spillable window count
  * BEFORE the non-spillable `collect_list` (the d4/t16 inverted-index
  * shape; a 10k-item basket would otherwise emit 5·10⁷ pairs from one
  * task). Everything else is plain keyed aggregation: candidate cost is
  * O(maxBasket × baskets), never O(items²).
  */
object ItemCf {

  /** Undirected co-occurrence pairs with cosine normalization:
    * `co / sqrt(deg_a · deg_b)` where deg = number of baskets containing
    * the item (cosine over binary basket-membership vectors — rounded to
    * 6 dp for cross-engine-stable downstream ranking). */
  def cooccurrence(baskets: DataFrame, basket: String, item: String,
      maxBasket: Int = 1000, minCo: Long = 1L): DataFrame = {
    val ui = baskets.select(col(basket).as("__b"), col(item).as("__i"))
      .distinct()
    val deg = ui.groupBy(col("__i")).agg(count(lit(1)).as("__deg"))
    val members = ui
      .withColumn("__bc", count(lit(1)).over(Window.partitionBy(col("__b"))))
      .where(col("__bc") <= maxBasket)
      .groupBy(col("__b"))
      .agg(sort_array(collect_list(col("__i"))).as("ms"))
      .where(size(col("ms")) >= 2)
    val pairs = members.select(explode(flatten(
        transform(sequence(lit(0), size(col("ms")) - 2), i =>
          transform(sequence(i + 1, size(col("ms")) - 1), j =>
            struct(element_at(col("ms"), i + 1).as("item_a"),
              element_at(col("ms"), j + 1).as("item_b")))))).as("p"))
      .groupBy(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .agg(count(lit(1)).as("co"))
      .where(col("co") >= minCo)
    pairs
      .join(deg.select(col("__i").as("item_a"), col("__deg").as("__da")),
        "item_a")
      .join(deg.select(col("__i").as("item_b"), col("__deg").as("__db")),
        "item_b")
      .select(col("item_a"), col("item_b"), col("co"),
        round(col("co") / sqrt(col("__da").cast("double") * col("__db")), 6)
          .as("cosine"))
  }

  /** Per-item top-k neighbor lists from [[cooccurrence]] output: each
    * undirected pair serves both endpoints, ranked by (cosine desc,
    * neighbor) — the recall-stage lookup table. */
  def topKNeighbors(co: DataFrame, k: Int): DataFrame = {
    val sym = co.select(col("item_a").as("item"),
        col("item_b").as("neighbor"), col("co"), col("cosine"))
      .unionByName(co.select(col("item_b").as("item"),
        col("item_a").as("neighbor"), col("co"), col("cosine")))
    TopK.perGroup(sym, Seq(col("item")),
      Seq(col("cosine").desc, col("neighbor")), k)
  }
}
