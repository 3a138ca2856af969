package graft

import graft.ops.{Graph, Iterate, TopK}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for hotspot queries (not part of the driver contract).
  *
  * Current target: the g10_label_prop cost decomposition (round-8 task 1)
  * — stage-by-stage timings plus loop variants, so the PLANS.md table can
  * name where the seconds go instead of guessing.
  */
object DebugBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // RDD ids that must survive quiesce (pinned snapshots shared across
    // variants — localCheckpoint lineage is truncated, unpersist kills them)
    val keep = scala.collection.mutable.Set.empty[Int]
    def quiesce(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => keep.contains(r.id))
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }

    // ---- stage decomposition of g10 ----
    val ui = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
      .distinct()
    time("ui distinct (warm2)") { ui.count(); ui.count() }
    println(s"[debug]   |ui| = ${ui.count()}")
    val pairs = ui.as("x").join(ui.as("y"), "b")
      .where(col("x.i") < col("y.i"))
      .select(col("x.i").as("pa"), col("y.i").as("pb"))
      .distinct()
    time("pairs build (warm2)") { pairs.count(); pairs.count() }
    println(s"[debug]   |pairs| = ${pairs.count()}")

    // pin the pair input so loop variants time ONLY the loop
    val pin = Iterate.snapshot(pairs)
    pin.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => keep += l.rdd.id
      case _ => ()
    }
    println(s"[debug]   |pin| = ${pin.count()}")
    // drill into ui: is the cost the scan or the distinct?
    val liRaw = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    time("lineitem 2-col scan (warm2)") { liRaw.count(); liRaw.count() }
    println(s"[debug]   lineitem partitions = ${liRaw.rdd.getNumPartitions}")
    println(s"[debug]   ui post-AQE partitions = ${ui.rdd.getNumPartitions}")
    // hypothesis: AQE coalesces the small shuffle to ~1 partition and the
    // final hash agg runs single-threaded
    val uiWide = liRaw.repartition(32, col("l_orderkey"), col("l_partkey"))
      .distinct()
    time("ui distinct repart32 (warm2)") { uiWide.count(); uiWide.count() }
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    time("ui distinct noAQEcoalesce (warm2)") { ui.count(); ui.count() }
    time("pairs build noAQEcoalesce (warm2)") { pairs.count(); pairs.count() }
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // alternative pair build: one shuffle, basket-local pair explode
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
      .groupBy(col("b")).agg(array_sort(collect_set(col("i"))).as("items"))
    val pairsB = baskets.select(explode(col("items")).as("pa"), col("items"))
      .select(col("pa"), explode(col("items")).as("pb"))
      .where(col("pa") < col("pb")).distinct()
    time("pairs via baskets (warm2)") { pairsB.count(); pairsB.count() }
    println(s"[debug]   |pairsB| = ${pairsB.count()}")

    val symD = pin.select(explode(array(
        struct(col("pa").as("__n"), col("pb").as("__m")),
        struct(col("pb").as("__n"), col("pa").as("__m")))).as("__e"))
      .select(col("__e.__n"), col("__e.__m")).distinct()
    time("symmetrize+distinct (warm2)") { symD.count(); symD.count() }
    val symND = pin.select(explode(array(
        struct(col("pa").as("__n"), col("pb").as("__m")),
        struct(col("pb").as("__n"), col("pa").as("__m")))).as("__e"))
      .select(col("__e.__n"), col("__e.__m"))
    time("symmetrize no-distinct (warm2)") { symND.count(); symND.count() }
    println(s"[debug]   |symD|=${symD.count()} |symND|=${symND.count()}")

    // ---- loop variants, all over the SAME pinned pairs ----
    // V1: production labelPropagation (window top-1, per-round snapshot,
    //     distinct on sym)
    def v1(): Long = Graph.labelPropagation(pin, "pa", "pb", 3).count()
    // V2: no distinct on sym (input is distinct pa<pb pairs -> sym is
    //     duplicate-free by construction; the distinct is a pure shuffle)
    def lpVariant(distinctSym: Boolean, snapshotRounds: Boolean,
        aggTop1: Boolean): Long = {
      val symRaw = pin.select(explode(array(
          struct(col("pa").as("__n"), col("pb").as("__m")),
          struct(col("pb").as("__n"), col("pa").as("__m")))).as("__e"))
        .select(col("__e.__n"), col("__e.__m"))
      val sym = Iterate.snapshot(
        if (distinctSym) symRaw.distinct() else symRaw)
      var labels = sym.select(col("__n")).distinct()
        .select(col("__n"), col("__n").as("__lbl"))
      for (i <- 1 to 3) {
        val freq = sym
          .join(labels.select(col("__n").as("__m"), col("__lbl")), "__m")
          .groupBy(col("__n"), col("__lbl")).agg(count(lit(1)).as("__c"))
        val prev = labels
        val next =
          if (aggTop1)
            freq.groupBy(col("__n"))
              .agg(max(struct(col("__c"), negate(col("__lbl")))).as("__t"))
              .select(col("__n"), negate(col("__t").getField("col2")).as("__lbl"))
          else
            TopK.perGroup(freq, Seq(col("__n")),
                Seq(col("__c").desc, col("__lbl").asc), 1)
              .select(col("__n"), col("__lbl"))
        labels = if (snapshotRounds) Iterate.snapshot(next) else next
        if (snapshotRounds && i > 1) Iterate.release(prev)
      }
      val n = labels.count()
      Iterate.release(sym)
      n
    }

    for (rep <- 1 to 2) {
      quiesce(); time(s"V1 production loop #$rep")(v1())
      quiesce(); time(s"V2 no-distinct #$rep")(lpVariant(false, true, false))
      quiesce(); time(s"V3 no-snapshot #$rep")(lpVariant(true, false, false))
      quiesce(); time(s"V4 agg-top1 #$rep")(lpVariant(true, true, true))
      quiesce(); time(s"V5 all-three #$rep")(lpVariant(false, false, true))
    }

    // V6: candidate full g10 — parallelism-floored distincts (defeat AQE
    // small-shuffle coalescing), no sym distinct (input already distinct
    // pa<pb), hash-agg top-1, single final snapshot
    def v6full(verbose: Boolean = false): Long = {
      def t[T](l: String)(f: => T): T =
        if (!verbose) f else time("  v6 " + l)(f)
      val p = spark.sparkContext.defaultParallelism
      val ui6 = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
        .repartition(p, col("b"), col("i")).distinct()
      val pairs6 = ui6.as("x").join(ui6.as("y"), "b")
        .where(col("x.i") < col("y.i"))
        .select(col("x.i").as("pa"), col("y.i").as("pb"))
        .repartition(p, col("pa"), col("pb")).distinct()
      val sym = t("snapshot(sym)")(Iterate.snapshot(pairs6.select(explode(array(
          struct(col("pa").as("__n"), col("pb").as("__m")),
          struct(col("pb").as("__n"), col("pa").as("__m")))).as("__e"))
        .select(col("__e.__n"), col("__e.__m"))))
      var labels = sym.select(col("__n")).distinct()
        .select(col("__n"), col("__n").as("__lbl"))
      for (_ <- 1 to 3) {
        val freq = sym
          .join(labels.select(col("__n").as("__m"), col("__lbl")), "__m")
          .groupBy(col("__n"), col("__lbl")).agg(count(lit(1)).as("__c"))
        labels = freq.groupBy(col("__n"))
          .agg(max(struct(col("__c"), negate(col("__lbl")))).as("__t"))
          .select(col("__n"), negate(col("__t").getField("col2")).as("__lbl"))
      }
      val fin = t("snapshot(final)")(Iterate.snapshot(labels))
      Iterate.release(sym)
      val n = t("count(final)")(fin.count())
      Iterate.release(fin)
      n
    }
    for (rep <- 1 to 4) {
      quiesce(); time(s"V6 full candidate #$rep")(v6full(verbose = rep >= 3))
    }
    // V7: like V6 but sym pre-partitioned by the join key __m before the
    // snapshot (LogicalRDD preserves outputPartitioning -> per-round join
    // shuffles only the labels side), optional broadcast of labels
    def v7full(bcast: Boolean, verbose: Boolean): Long = {
      def t[T](l: String)(f: => T): T =
        if (!verbose) f else time("  v7 " + l)(f)
      val p = spark.sparkContext.defaultParallelism
      val ui6 = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
        .repartition(p, col("b"), col("i")).distinct()
      val pairs6 = ui6.as("x").join(ui6.as("y"), "b")
        .where(col("x.i") < col("y.i"))
        .select(col("x.i").as("pa"), col("y.i").as("pb"))
        .repartition(p, col("pa"), col("pb")).distinct()
      val sym = t("snapshot(sym)")(Iterate.snapshot(pairs6.select(explode(array(
          struct(col("pa").as("__n"), col("pb").as("__m")),
          struct(col("pb").as("__n"), col("pa").as("__m")))).as("__e"))
        .select(col("__e.__n"), col("__e.__m"))
        .repartition(p, col("__m"))))
      var labels = sym.select(col("__n")).distinct()
        .select(col("__n"), col("__n").as("__lbl"))
      for (_ <- 1 to 3) {
        val lab = labels.select(col("__n").as("__m"), col("__lbl"))
        val freq = sym
          .join(if (bcast) broadcast(lab) else lab, "__m")
          .groupBy(col("__n"), col("__lbl")).agg(count(lit(1)).as("__c"))
        labels = freq.groupBy(col("__n"))
          .agg(max(struct(col("__c"), negate(col("__lbl")))).as("__t"))
          .select(col("__n"), negate(col("__t").getField("col2")).as("__lbl"))
      }
      val fin = t("snapshot(final)")(Iterate.snapshot(labels))
      Iterate.release(sym)
      val n = t("count(final)")(fin.count())
      Iterate.release(fin)
      n
    }
    for (rep <- 1 to 3) {
      quiesce(); time(s"V7 copart #$rep")(v7full(false, rep >= 2))
    }
    for (rep <- 1 to 3) {
      quiesce(); time(s"V7 bcast #$rep")(v7full(true, rep >= 2))
    }

    // V8: V7-copart, but WITHOUT the ui.distinct() — the final pairs
    // distinct already dedups, and the fixture has ~65 dup (order,item)
    // rows, so the inner distinct is a pure extra shuffle+agg
    def v8full(verbose: Boolean): Long = {
      def t[T](l: String)(f: => T): T =
        if (!verbose) f else time("  v8 " + l)(f)
      val p = spark.sparkContext.defaultParallelism
      val ui8 = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
      val pairs8 = ui8.as("x").join(ui8.as("y"), "b")
        .where(col("x.i") < col("y.i"))
        .select(col("x.i").as("pa"), col("y.i").as("pb"))
        .repartition(p, col("pa"), col("pb")).distinct()
      val sym = t("snapshot(sym)")(Iterate.snapshot(pairs8.select(explode(array(
          struct(col("pa").as("__n"), col("pb").as("__m")),
          struct(col("pb").as("__n"), col("pa").as("__m")))).as("__e"))
        .select(col("__e.__n"), col("__e.__m"))
        .repartition(p, col("__m"))))
      var labels = sym.select(col("__n")).distinct()
        .select(col("__n"), col("__n").as("__lbl"))
      for (_ <- 1 to 3) {
        val freq = sym
          .join(labels.select(col("__n").as("__m"), col("__lbl")), "__m")
          .groupBy(col("__n"), col("__lbl")).agg(count(lit(1)).as("__c"))
        labels = freq.groupBy(col("__n"))
          .agg(max(struct(col("__c"), negate(col("__lbl")))).as("__t"))
          .select(col("__n"), negate(col("__t").getField("col2")).as("__lbl"))
      }
      val fin = t("snapshot(final)")(Iterate.snapshot(labels))
      Iterate.release(sym)
      val n = t("count(final)")(fin.count())
      Iterate.release(fin)
      n
    }
    for (rep <- 1 to 4) {
      quiesce(); time(s"V8 no-ui-distinct #$rep")(v8full(rep >= 3))
    }

    // full query end to end for reference
    quiesce()
    time("g10 full (cold)")(
      SparkEntry.queries("g10_label_prop")(spark, dir).count())
    time("g10 full (warm)")(
      SparkEntry.queries("g10_label_prop")(spark, dir).count())
    spark.stop()
  }
}
