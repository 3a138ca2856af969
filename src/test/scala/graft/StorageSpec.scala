package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout evidence for the 100 TB design (SURVEY §4): bucketed +
  * sorted-within-partition tables make the hot join/as-of paths
  * shuffle-free. */
class StorageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("co-bucketed tables join with zero shuffle") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ev = Tables.events(spark, TestSpark.sf)
      // the in-memory catalog forgets tables between sessions but the
      // managed location survives — clear both
      spark.sql("DROP TABLE IF EXISTS ev_left")
      spark.sql("DROP TABLE IF EXISTS ev_right")
      Seq("ev_left", "ev_right").foreach { t =>
        val d = new java.io.File(s"/tmp/graft-warehouse/$t")
        if (d.exists()) {
          java.nio.file.Files.walk(d.toPath).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.delete(p))
        }
      }
      ev.select($"user_id", $"event_id", $"ts").write
        .bucketBy(8, "user_id").sortBy("user_id", "ts")
        .mode("overwrite").saveAsTable("ev_left")
      ev.groupBy($"user_id").agg(count(lit(1)).as("n")).write
        .bucketBy(8, "user_id")
        .mode("overwrite").saveAsTable("ev_right")

      val joined = spark.table("ev_left").join(spark.table("ev_right"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(joined.count() == ev.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    }
  }

  test("ORC round-trip preserves the events table (alternate columnar source)") {
    val dir = java.nio.file.Files.createTempDirectory("orc_out").toString
    val ev = Tables.events(spark, TestSpark.sf)
      .select($"event_id", $"user_id", $"ts", $"event_type", $"value")
    ev.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == ev.schema)
    assert(back.as[(Long, Long, Long, String, Double)].collect().toSet ==
      ev.as[(Long, Long, Long, String, Double)].collect().toSet)
  }

  test("bucketed+sorted layout serves per-user aggregation without exchange") {
    val agg = spark.table("ev_left").groupBy($"user_id")
      .agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"groupBy on the bucket key should reuse bucketing:\n$plan")
    assert(agg.count() > 0)
  }
}
