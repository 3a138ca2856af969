package graft

import org.apache.spark.sql.types._

/** The reference's data contracts as typed Spark schemas (SURVEY §1).
  *
  * Case classes give `Dataset[T]` encoders for the core entities; the
  * `StructType`s are the explicit scan schemas — at 100 TB a
  * schema-inferring JSON/CSV scan is an extra full pass, so every source
  * read declares its schema (the reference's one Spark usage does the
  * same: `spark_stream/consumer.py:24-28`).
  */
object Schemas {

  /** One Amazon-Books 5-core review line (`Books_5.json`; fields consumed
    * by `generate_training_data.py:90-96`). */
  case class Review(reviewerID: String, asin: String, overall: Double,
      unixReviewTime: Long)

  val reviewSchema: StructType = StructType(Seq(
    StructField("reviewerID", StringType),
    StructField("asin", StringType),
    StructField("overall", DoubleType),
    StructField("unixReviewTime", LongType)))

  /** Item metadata line (`meta_Books.json`; `generate_training_data.py:
    * 48-75`). `price` arrives dirty ("$1,299.00") and is cleansed by
    * `Features.cleansePrice`. */
  case class ItemMeta(asin: String, categories: Seq[Seq[String]],
      brand: Option[String], price: Option[String])

  val itemMetaSchema: StructType = StructType(Seq(
    StructField("asin", StringType),
    StructField("categories", ArrayType(ArrayType(StringType))),
    StructField("brand", StringType),
    StructField("price", StringType)))

  /** Hold-out behavior row (`excluded_users_behavior.csv` contract,
    * `data_processing/README.md`). */
  case class Behavior(user_id: String, item_id: String, timestamp: Long)

  /** Training sample (`train_data.csv`: history is `|`-joined at the CSV
    * boundary only — `generate_training_data.py:172`). */
  case class TrainSample(user_id: String, history_items: String,
      candidate_item: String, label: Int)

  /** Kafka payload (`consumer.py:24-28`) — also `BehaviorIngest.eventSchema`. */
  case class KafkaEvent(user_id: String, history_items: Seq[String],
      timestamp: Long)
}
