package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral-analytics operators over event streams: ordered funnel
  * completion and cohort retention — the two standard product-analytics
  * queries a recommendation platform runs beside its serving metrics
  * (reference surfaces raw behavior events at
  * `deploy_datapipeline/data_pipeline/kafka_stream/producer.py:63-80`;
  * these are the canonical downstream
  * aggregations over that log).
  *
  * Both lower to shuffles keyed on the user id only — at 100 TB the event
  * log is hash-partitioned by user, every stage below reuses that one
  * partitioning (Catalyst collapses the chained groupBy/join on the same
  * key into a single exchange), and nothing is ever collected or
  * windowed over a data-sized single partition.
  */
object Behavior {

  /** Ordered funnel: for each entity, the earliest timestamp of step 1,
    * then the earliest step-2 event STRICTLY AFTER it, then the earliest
    * step-3 after that, etc. — the sequential-conversion semantics
    * product analytics means by "funnel" (an out-of-order purchase does
    * not count).
    *
    * Input: `events(key, tsCol, typeCol)`; `steps` is the ordered list of
    * event-type values. Output: one row per entity that completed step 1,
    * with `t_<step>` (nullable long) per step and `depth` = number of
    * consecutive steps completed.
    *
    * Lowering: one conditional aggregation per step, each keyed on the
    * entity — step N's aggregate filters on `ts > t_{N-1}` via a join
    * back to the running result. All joins/groupBys share the entity-key
    * partitioning, so the whole funnel is one logical shuffle of the
    * event log plus K small same-key joins (K = steps, typically 3-5).
    */
  def funnel(events: DataFrame, key: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val head = events.filter(col(typeCol) === steps.head)
      .groupBy(col(key)).agg(min(col(tsCol)).as(s"t_${steps.head}"))
    steps.tail.zipWithIndex.foldLeft(head) { case (acc, (step, i)) =>
      val prev = s"t_${steps(i)}"
      val hit = events.filter(col(typeCol) === step)
        .select(col(key), col(tsCol).as("__ts"))
        .join(acc.select(col(key), col(prev)), Seq(key))
        .filter(col("__ts") > col(prev))
        .groupBy(col(key)).agg(min(col("__ts")).as(s"t_$step"))
      acc.join(hit.select(col(key), col(s"t_$step")), Seq(key), "left")
    }.withColumn("depth",
      steps.map(s => when(col(s"t_$s").isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast("long"))
  }

  /** Cohort retention: assign each entity to the cohort of its FIRST
    * event (floor of first-ts / `bucket`), then count distinct entities
    * active per (cohort, offset) where offset = event-bucket − cohort
    * bucket. The classic triangular retention matrix.
    *
    * `tsCol` must be an integral epoch column; `bucket` its period in the
    * same unit (e.g. 7·86400·10⁹ for weekly nanos). Two shuffles on the
    * entity key (first-event + join back) and one on (cohort, offset) —
    * the distinct-count reduces on the composite key, so no cohort ever
    * concentrates on one reducer. */
  def retention(events: DataFrame, key: String, tsCol: String,
      bucket: Long): DataFrame = {
    // exact integer bucketing: (c - c mod bucket) is a multiple of the
    // bucket ≤ 2^53, so the double division yields the integer quotient
    // exactly — float `/` straight on epoch-µs values could round a
    // boundary timestamp into the wrong week
    val b: Column => Column =
      c => ((c - pmod(c, lit(bucket))) / lit(bucket)).cast("long")
    val first = events.groupBy(col(key))
      .agg(b(min(col(tsCol))).as("cohort"))
    events.select(col(key), b(col(tsCol)).as("__b"))
      .join(first, Seq(key))
      .groupBy(col("cohort"), (col("__b") - col("cohort")).as("offset"))
      .agg(countDistinct(col(key)).as("n_active"))
  }

  /** First-order Markov transition matrix over each key's time-ordered
    * event stream (lead window, ties on `tieCol`), pre-ranked to the
    * top-k next states per source state by exact-count probability
    * (p desc, state-name tiebreak). The state-space matrix is tiny
    * (|types|²) regardless of log size, so callers broadcast it — the
    * batch m14 recommendation query and the streaming
    * [[graft.streaming.BehaviorIngest.nextEventPredictions]] serving
    * path share this one training step. */
  def transitionTopK(events: DataFrame, key: String, tsCol: String,
      tieCol: String, typeCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__next", lead(col(typeCol), 1).over(byKey))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n") * lit(1.0) /
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("from_type"))
          .orderBy(col("p").desc, col("to_type"))))
      .where(col("rank") <= k)
      .select(col("from_type"), col("to_type"), col("p"), col("rank"))
  }
}
