package graft

import org.apache.spark.sql.SparkSession

/** Prints a shuffle/join/scan audit of every SparkEntry query plan — the
  * "would this survive 100×" review loop. Run:
  * `sbt "runMain graft.PlanAudit [queryName]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      // let AQE re-coalesce partitions INSIDE cached plans: the CC/pagerank
      // fixpoints act on small persisted frames each round, and without this
      // every round pays full-width task dispatch on bench hardware
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      val singleParts = "Exchange SinglePartition".r.findAllIn(plan).size
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      val cart = "CartesianProduct".r.findAllIn(plan).size
      val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).size
      println(f"[plan] $name%-22s shuf=$shuffles single=$singleParts bhj=$bhj smj=$smj bnlj=$bnlj cart=$cart pushedFilters=$pushed")
      if (args.nonEmpty) println(plan)
    }
    spark.stop()
  }
}
