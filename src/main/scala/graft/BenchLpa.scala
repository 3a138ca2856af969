package graft

import graft.ops.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the two per-round LPA majority plans on g10's exact
  * graph — `twophase` (count per (node, label) + `max(struct)` argmax:
  * two exchanges, both codegen hash aggs) vs `fused` (one exchange into
  * `mode(__lbl, deterministic = true)`: an ObjectHashAggregate with
  * per-node map state). Run each variant in its OWN invocation (sbt
  * forks a fresh JVM) so neither inherits the other's codegen cache or
  * block litter; also prints an equivalence count on the first run.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.BenchLpa fused|twophase`
  * — conclusions recorded in PLANS.md ("g10 fused-argmax A/B"). */
object BenchLpa {
  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("twophase")
    require(variant == "fused" || variant == "twophase",
      s"variant must be fused|twophase, got $variant")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // g10's exact pair graph (SparkEntry.g10LabelProp)
    val p = spark.sparkContext.defaultParallelism
    def pairs() = {
      val ui = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
        .repartition(p, col("b"), col("i")).distinct()
      ui.as("x").join(ui.as("y"), "b")
        .where(col("x.i") < col("y.i"))
        .select(col("x.i").as("pa"), col("y.i").as("pb"))
        .repartition(p, col("pa"), col("pb")).distinct()
    }
    def quiesce(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    val fused = variant == "fused"
    def run(): Unit =
      Graph.labelPropagation(pairs(), "pa", "pb", rounds = 3,
        edgesDistinct = true, fusedArgmax = fused).count(): Unit
    val cold = time(run()); quiesce()
    val w1 = time(run()); quiesce()
    val w2 = time(run()); quiesce()
    println(f"[benchlpa] $variant cold=$cold%.2f warm=$w1%.2f/$w2%.2f")
  }
}
