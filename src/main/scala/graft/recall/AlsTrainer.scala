package graft.recall

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Charter substitution for LightGCN *training* (G4): BPR/Adam training
  * stays external; the Spark-native stand-in is implicit-feedback ALS,
  * which produces artifacts with the exact shape the reference exports —
  * `(id, emb array<float>)` user/item embedding tables
  * (`lightgcn/train.py:104-147`, `utils.py:233-276`) — so the recall stage
  * (`Cascade.recall` / SimSearch) consumes either interchangeably.
  */
object AlsTrainer {

  /** Train and return (userEmbeddings, itemEmbeddings), each
    * `(id int, emb array<float>)`. */
  def train(interactions: DataFrame, user: String, item: String,
      weight: String, rank: Int = 16, maxIter: Int = 5,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    val als = new ALS()
      .setUserCol(user).setItemCol(item).setRatingCol(weight)
      .setImplicitPrefs(true) // interactions are feedback, not ratings
      .setRank(rank).setMaxIter(maxIter).setSeed(seed)
      .setColdStartStrategy("drop")
    val model = als.fit(interactions)
    val u = model.userFactors.select(col("id"), col("features").as("emb"))
    val i = model.itemFactors.select(col("id"), col("features").as("emb"))
    (u, i)
  }
}
