package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * All engine operators are `DataFrame => DataFrame` functions; these helpers
  * only bind a scale-factor directory to named tables. Schemas are fixed by
  * the driver (FIXTURES.md §1) so we read without inference — at 100 TB a
  * schema-inferring scan is a full extra pass over the data.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  /** `events.ts` arrives as epoch-nanos BIGINT regardless of how the
    * driver generated the file: early fixtures wrote parquet
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — the
    * legacy conf reads it as a lossless long), later regenerations write
    * TIMESTAMP(MICROS) (a real timestamp column, normalized back to
    * ns-longs here). Every event-time operator downstream treats `ts` as
    * a monotonic epoch-ns long and converts to TimestampType only where
    * windowing needs it; the DuckDB oracles' `epoch_ns(ts)` yields the
    * same integers for both encodings. Callers run with
    * `spark.sql.session.timeZone=UTC`, so the NTZ→timestamp cast below
    * is instant-preserving. */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts",
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts").cast("timestamp")) *
          1000L)
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
