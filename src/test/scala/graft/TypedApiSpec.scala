package graft

import graft.Schemas.{Behavior, KafkaEvent, Review}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §1.3 contract: the core entities are usable as typed
  * `Dataset[T]` with compile-time field checks, interoperating with the
  * DataFrame operators. */
class TypedApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Dataset[Review] round-trips through typed and untyped transforms") {
    val ds = Seq(
      Review("U1", "B1", 5.0, 100L),
      Review("U1", "B2", 2.0, 200L),
      Review("U2", "B1", 4.0, 300L)).toDS()
    val positives = ds.filter(_.overall >= 4.0)
    assert(positives.count() == 2)
    // typed → untyped → typed: groupBy on the typed column names
    val perUser = positives.groupBy($"reviewerID")
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(perUser == Map("U1" -> 1L, "U2" -> 1L))
    // typed map with encoder inference
    val behaviors = ds.map(r => Behavior(r.reviewerID, r.asin, r.unixReviewTime))
    assert(behaviors.filter(_.timestamp > 150L).count() == 2)
  }

  test("Dataset[KafkaEvent] matches the streaming parse schema") {
    val parsed = streaming.BehaviorIngest.parse(
      Seq("""{"user_id":"u1","history_items":["a"],"timestamp":7}""").toDF("value"))
    val ev = parsed.as[KafkaEvent].head()
    assert(ev == KafkaEvent("u1", Seq("a"), 7L))
    // schema declared by the case class encoder ≡ the explicit StructType
    // (modulo nullability: the encoder marks primitive Long non-nullable)
    val enc = Seq.empty[KafkaEvent].toDS().schema.map(f => (f.name, f.dataType))
    val decl = streaming.BehaviorIngest.eventSchema.map(f => (f.name, f.dataType))
    assert(enc == decl)
  }
}
