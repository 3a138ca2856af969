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
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOGLVL", "WARN"))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val cold = time { fn(spark, sfDir).count(): Unit }
      val w1 = time { fn(spark, sfDir).count(): Unit }
      val w2 = time { fn(spark, sfDir).count(): Unit }
      println(f"[benchone] $name cold=$cold%.2f warm=$w1%.2f/$w2%.2f")
      // SPARK_GRAFT_SHOW=1: also print the result rows (evidence runs —
      // e.g. the sim14 recall curve at a ScaleSmoke corpus)
      if (sys.env.get("SPARK_GRAFT_SHOW").contains("1"))
        fn(spark, sfDir).show(200, truncate = false)
    }
    spark.stop()
  }
}
