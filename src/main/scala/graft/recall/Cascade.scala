package graft.recall

import graft.functions.{Features, VectorOps}
import graft.ops.TopK
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The 3-stage recommendation cascade as a DataFrame pipeline
  * (reference `model_service/models.py:181-211`,
  * `eval_online/main/inference.py:78-106`): recall (embedding dot-product
  * top-N) ▷ rank (pluggable scorer, top-M) ▷ re-rank (pluggable scorer,
  * top-K). Stage boundaries are plain DataFrames so external neural scorers
  * (DIN / RankNet, kept external per charter) drop in as
  * `DataFrame => DataFrame` transforms; the built-in stub scorer is a
  * seeded deterministic hash score standing in for the reference's own
  * random-score stub (`models.py:126-130`).
  */
object Cascade {

  type Scorer = DataFrame => DataFrame // must add/replace column "score"

  /** Deterministic stub scorer (stands in for an external model service). */
  def stubScorer(scoreOf: String*): Scorer = df =>
    df.withColumn("score",
      Features.stableHash01(concat_ws("§", scoreOf.map(col): _*), 1000000))

  /** Portable stub scorer: a Knuth/LCG modular mix of two id columns,
    * bit-replicable in ANSI SQL (`(a*2654435761 + b*40503) % 1000000`) so a
    * cascade wired with it can be hash-checked end-to-end against an
    * external oracle. Same contract as [[stubScorer]]; ids must stay below
    * ~2^32 so the ANSI-mode multiply cannot overflow Long.
    */
  def mixScorer(aCol: String, bCol: String): Scorer = df =>
    df.withColumn("score",
      pmod(col(aCol) * lit(2654435761L) + col(bCol) * lit(40503L),
        lit(1000000L)))

  /** Stage 1 — recall: per-user dot-product top-N against the item
    * embedding table, excluding items already in the user's history
    * (reference `models.py:61,83`). `users`: (user_id, user_emb, history
    * array<item id>); `items`: (item_id, item_emb).
    *
    * PRECONDITION: `items` must fit in a broadcast (the reference serves
    * ~5,000 items; anything up to a few million rows × small embedding is
    * fine). For an item corpus past the broadcast threshold, recall must
    * switch to an ANN index instead of the exhaustive crossJoin — the
    * `SimSearch.lshTopK` / `ivfTopK` paths are the drop-in scale escape. */
  def recall(users: DataFrame, items: DataFrame, n: Int): DataFrame = {
    val scored = users.crossJoin(broadcast(items))
      .where(!array_contains(col("history"), col("item_id")))
      .withColumn("recall_score", graft.functions.GraftFunctions.dot(col("user_emb"), col("item_emb")))
    TopK.perGroup(scored, Seq(col("user_id")),
      Seq(col("recall_score").desc, col("item_id")), n, "recall_rank")
      .select(col("user_id"), col("item_id"), col("recall_score"))
  }

  /** Stages 2/3 — score with `scorer`, keep top `k` per user. */
  def rankStage(candidates: DataFrame, scorer: Scorer, k: Int,
      rankCol: String): DataFrame =
    TopK.perGroup(scorer(candidates), Seq(col("user_id")),
      Seq(col("score").desc, col("item_id")), k, rankCol)
      .drop("score")

  /** Full cascade: recall(n1) ▷ rank(n2) ▷ rerank(n3). */
  def recommend(users: DataFrame, items: DataFrame,
      ranker: Scorer, reranker: Scorer,
      n1: Int = 100, n2: Int = 50, n3: Int = 10): DataFrame = {
    val recalled = recall(users, items, n1)
    val ranked = rankStage(recalled, ranker, n2, "rank_stage")
    rankStage(ranked.drop("rank_stage"), reranker, n3, "final_rank")
      .select(col("user_id"), col("item_id"), col("final_rank"))
  }
}
