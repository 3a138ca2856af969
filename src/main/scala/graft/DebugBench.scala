package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch profiler for hotspot queries (not part of the driver contract).
  *
  * Current target: pin the STATIC edge frame of the graph fixpoints as
  * a persisted (partitioning-preserving) InMemoryRelation instead of a
  * localCheckpoint LogicalRDD (which reports UnknownPartitioning and so
  * reshuffles the big side every round). Variants: plain persist, and
  * sortWithinPartitions-then-persist (does InMemoryTableScan also report
  * the ordering, killing the per-round SMJ Sort?). Broadcast disabled to
  * simulate the 100x regime. (PLANS.md round 8.)
  */
object DebugBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = Tables.lineitem(spark, dir)
    val edges = li.select(col("l_orderkey").as("src"),
      col("l_partkey").as("dst")).distinct()
    val p = spark.sparkContext.defaultParallelism

    def symRaw = edges.select(explode(array(
        struct(col("src").as("__n"), col("dst").as("__m")),
        struct(col("dst").as("__n"), col("src").as("__m")))).as("__e"))
      .select(col("__e.__n"), col("__e.__m"))

    def threeRounds(sym: org.apache.spark.sql.DataFrame): Long = {
      var labels = sym.select(col("__n")).distinct()
        .select(col("__n"), col("__n").as("__lbl"))
      var out = 0L
      for (_ <- 1 to 3) {
        val freq = sym
          .join(labels.select(col("__n").as("__m"), col("__lbl")), "__m")
          .groupBy(col("__n"), col("__lbl")).agg(count(lit(1)).as("__c"))
        labels = freq.groupBy(col("__n"))
          .agg(max(struct(col("__c"), negate(col("__lbl")))).as("__t"))
          .select(col("__n"), negate(col("__t").getField("col2")).as("__lbl"))
        out = labels.count()
      }
      out
    }

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }
    def quiesce(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }

    // plan shape of the sorted-pin variant
    val symSorted = symRaw.repartition(p, col("__m"))
      .sortWithinPartitions(col("__m"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    symSorted.count();
    {
      val labels = symSorted.select(col("__n")).distinct()
        .select(col("__n").as("__m"), col("__n").as("__lbl"))
      val freq = symSorted.join(labels, "__m")
        .groupBy(col("__n"), col("__lbl")).agg(count(lit(1)).as("__c"))
      println(s"[debug] ==== sorted pin round plan ====")
      freq.queryExecution.executedPlan.toString.linesIterator
        .takeWhile(l => !l.contains("== Initial Plan =="))
        .filter(l => Seq("Exchange", "InMemoryTableScan", "Scan",
          "SortMergeJoin", "ShuffledHashJoin", "Sort ").exists(l.contains))
        .foreach(l => println(s"[debug] ${l.take(120)}"))
    }
    symSorted.unpersist(); quiesce()

    for (rep <- 1 to 2) {
      quiesce()
      time(s"A localCheckpoint 3 rounds #$rep") {
        val sym = graft.ops.Iterate.snapshot(
          symRaw.repartition(p, col("__m")))
        val r = threeRounds(sym); graft.ops.Iterate.release(sym); r
      }
      quiesce()
      time(s"B pin 3 rounds             #$rep") {
        val sym = symRaw.repartition(p, col("__m"))
          .persist(StorageLevel.MEMORY_AND_DISK_SER)
        sym.count()
        val r = threeRounds(sym); sym.unpersist(); r
      }
      quiesce()
      time(s"C sorted pin 3 rounds      #$rep") {
        val sym = symRaw.repartition(p, col("__m"))
          .sortWithinPartitions(col("__m"))
          .persist(StorageLevel.MEMORY_AND_DISK_SER)
        sym.count()
        val r = threeRounds(sym); sym.unpersist(); r
      }
    }
    spark.stop()
  }
}
