package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for hotspot queries (not part of the driver contract).
  *
  * Current target: does the basket-distinct shuffle actually get REUSED
  * at runtime (AQE stage reuse) after the explicit null-drop
  * canonicalization in ItemCf? Counts "(reuse)"-marked query stages and
  * lineitem scans in the FINAL adaptive plan of m9. (PLANS.md round 8.)
  */
object DebugBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = SparkEntry.queries("d17_canonicalize")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val reuse = plan.linesIterator.count(l =>
      l.contains("(reuse)") || l.contains("ReusedQueryStage") ||
        l.contains("ReusedExchange"))
    val scans = plan.linesIterator.count(_.contains("documents.parquet"))
    val stages = plan.linesIterator.count(_.contains("ShuffleQueryStage"))
    println(s"[debug] reuse-marked=$reuse lineitemScans=$scans shuffleStages=$stages")
    plan.linesIterator.filter(l => l.contains("ShuffleQueryStage"))
      .foreach(l => println(s"[debug] ${l.trim.take(100)}"))
    spark.stop()
  }
}
