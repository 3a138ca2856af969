package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for hotspot queries (not part of the driver contract):
  * runs one registry query (args(0), default d17_canonicalize) and counts
  * reuse-marked stages, table scans (args(1) substring, default
  * documents.parquet) and shuffle stages in the FINAL adaptive plan —
  * the AQE stage-reuse probe behind the round-8 shuffle-dedup A/Bs.
  */
object DebugBench {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("d17_canonicalize")
    val scanTable = if (args.length > 1) args(1) else "documents.parquet"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = SparkEntry.queries(query)(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val reuse = plan.linesIterator.count(l =>
      l.contains("(reuse)") || l.contains("ReusedQueryStage") ||
        l.contains("ReusedExchange"))
    val scans = plan.linesIterator.count(_.contains(scanTable))
    val stages = plan.linesIterator.count(_.contains("ShuffleQueryStage"))
    println(s"[debug] query=$query reuse-marked=$reuse " +
      s"scans($scanTable)=$scans shuffleStages=$stages")
    plan.linesIterator.filter(l => l.contains("ShuffleQueryStage"))
      .foreach(l => println(s"[debug] ${l.trim.take(100)}"))
    spark.stop()
  }
}
