package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time selected queries (cold + 2 warm runs each) — the
  * per-query drill-down companion to [[Bench]].
  *
  * Usage: `runMain graft.BenchOne q1_agg d2_minhash_pairs` (env
  * `SPARK_GRAFT_SF_DIR`, `SPARK_GRAFT_CPUS` as in Bench). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      // let AQE re-coalesce partitions INSIDE cached plans: the CC/pagerank
      // fixpoints act on small persisted frames each round, and without this
      // every round pays full-width task dispatch on bench hardware
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      // match Bench's codegen-cache sizing so pins are comparable
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      // match Bench's AQE coalesce floor so BenchOne pins are comparable
      // to in-suite numbers; SPARK_GRAFT_AQE=0 disables AQE entirely
      // (variance-diagnosis knob — AQE's runtime coalesce decisions are
      // the usual nondeterminism suspect on small iterative shuffles)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "1m"))
      .config("spark.sql.adaptive.enabled",
        if (sys.env.get("SPARK_GRAFT_AQE").contains("0")) "false"
        else "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOGLVL", "WARN"))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    // per-run GC attribution (the g10-variance drill-down, round 14):
    // each timing prints the collection time spent INSIDE it, so a slow
    // run self-reports whether it was a GC episode or a plan/stage cost
    import scala.jdk.CollectionConverters._
    def gcMs(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    // SPARK_GRAFT_REPS: warm repetitions per query (default 2).
    // SPARK_GRAFT_QUIESCE=1: Bench's between-query quiesce AFTER EVERY
    // RUN (drop caches + persistent RDDs + System.gc) — isolates each
    // timing from accumulated snapshot blocks of the previous one.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val quiesce = sys.env.get("SPARK_GRAFT_QUIESCE").contains("1")
    def quiesceNow(): Unit = if (quiesce) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      def run(): (Double, Long) = {
        val g0 = gcMs()
        val t = time { fn(spark, sfDir).count(): Unit }
        val g = gcMs() - g0
        quiesceNow()
        (t, g)
      }
      val (cold, gCold) = run()
      val warms = (1 to reps).map(_ => run())
      val wStr = warms.map { case (t, g) => f"$t%.2f(gc=${g}ms)" }
        .mkString("/")
      println(f"[benchone] $name cold=$cold%.2f(gc=${gCold}ms) warm=$wStr")
      // SPARK_GRAFT_SHOW=1: also print the result rows (evidence runs —
      // e.g. the sim14 recall curve at a ScaleSmoke corpus)
      if (sys.env.get("SPARK_GRAFT_SHOW").contains("1"))
        fn(spark, sfDir).show(200, truncate = false)
    }
    spark.stop()
  }
}
