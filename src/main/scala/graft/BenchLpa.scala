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
    // round-14 variance drill-down variants: "pairs" times ONLY the
    // pair-generation prefix (common to both LPA plans), "pin" times
    // pairs + the symmetrize/Iterate.pin materialization — together
    // they localize which stage carries g10's run-to-run spread
    require(Seq("fused", "twophase", "pairs", "pin").contains(variant),
      s"variant must be fused|twophase|pairs|pin, got $variant")
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
    def run(): Unit = variant match {
      case "pairs" => pairs().count(): Unit
      case "pin" =>
        // the symmetrize + pin labelPropagation builds internally
        val e = pairs()
        val sym = graft.ops.Iterate.pin(
          e.select(explode(array(
              struct(col("pa").as("__n"), col("pb").as("__m")),
              struct(col("pb").as("__n"), col("pa").as("__m")))).as("__e"))
            .select(col("__e.__n"), col("__e.__m")), col("__m"))
        sym.count()
        graft.ops.Iterate.unpin(sym)
      case _ =>
        Graph.labelPropagation(pairs(), "pa", "pb", rounds = 3,
          edgesDistinct = true, fusedArgmax = fused).count(): Unit
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    // per-run GC and Janino-compile deltas: a slow run self-reports
    // whether it was a GC episode, a codegen-recompile storm, or
    // neither (pure stage-execution jitter)
    import scala.jdk.CollectionConverters._
    def gcMs(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def janino(): Long = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
    def timed(): String = {
      val g0 = gcMs(); val j0 = janino()
      val w = time(run()); quiesce()
      f"$w%.2f(gc=${gcMs() - g0}ms,jan=${janino() - j0})"
    }
    val cold = timed()
    val warms = (1 to reps).map(_ => timed())
    println(s"[benchlpa] $variant cold=$cold warm=" +
      warms.mkString("/"))
  }
}
