package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query seconds.
  *
  * Protocol mirrors the reference's benchmark methodology
  * (`serve-model/benchmark_baseline.py:10-35`: warm-up then timed
  * iterations): each query executes twice and the SECOND (steady-state)
  * time is reported — the first run pays one-off codegen compilation and
  * page-cache faults that say nothing about the plan. `cold_s` carries the
  * first-run total for reference.
  */
object Bench {

  /** PIDs of this JVM plus its ancestor chain (the sbt launcher that
    * forked us) — the only Java processes that are NOT contamination. */
  private def selfAndAncestors(): Set[Long] = {
    def ppid(pid: Long): Option[Long] =
      try {
        val stat = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/proc/$pid/stat")))
        // field 4 after the parenthesized comm (which may contain spaces)
        Some(stat.substring(stat.lastIndexOf(')') + 2).split(" ")(1).toLong)
      } catch { case _: Throwable => None }
    val self = ProcessHandle.current().pid()
    Iterator.iterate(Option(self))(p => p.flatMap(ppid).filter(_ > 1))
      .takeWhile(_.isDefined).take(32).flatten.toSet
  }

  /** First other Java process (a concurrent sbt/test/bench JVM) running
    * on this host, as "pid:cmdline-head", or None: round-3/4 post-mortems
    * traced every in-run "regression" ≥2× to exactly this, so the JSON
    * self-reports the offender. Matching on the "/java" executable path
    * (not the bare substring) keeps shell wrappers whose argument text
    * merely mentions java out of the verdict. */
  private def otherJvm(): Option[String] = {
    val mine = selfAndAncestors()
    try {
      val procs = new java.io.File("/proc").listFiles()
      if (procs == null) return None
      procs.iterator.filter(f => f.getName.forall(_.isDigit) &&
          !mine.contains(f.getName.toLong))
        .flatMap { f =>
          try {
            val argv = new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(s"/proc/${f.getName}/cmdline")))
              .split('\u0000')
            if (argv.headOption.exists(a =>
                a.endsWith("/java") || a == "java"))
              Some(s"${f.getName}:${argv.take(3).mkString(" ").take(80)}")
            else None
          } catch { case _: Throwable => None }
        }.nextOption()
    } catch { case _: Throwable => None }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core (the driver contract is local[32] on this
    // machine); SPARK_GRAFT_CPUS narrows it for local experiments
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      // let AQE re-coalesce partitions INSIDE cached plans: the CC/pagerank
      // fixpoints act on small persisted frames each round, and without this
      // every round pays full-width task dispatch on bench hardware
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var contendedBy = otherJvm()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try f catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      // quiesce between queries: collect the previous query's garbage so
      // its old-gen pressure doesn't bill the next timing (isolated
      // BenchOne runs measured 2-3x lower than late-bench in-run numbers
      // for the heavy queries before this; the plan didn't change)
      System.gc()
      if (contendedBy.isEmpty) contendedBy = otherJvm()
      val cold = time { fn(spark, sfDir).count(): Unit }
      // two timed steady-state runs, best-of-2 reported: run-to-run noise
      // on a shared machine is additive (scheduler, page cache, GC), so
      // the minimum is the least-biased estimate of the plan's cost
      val warm = if (cold < 0) -1.0 else {
        val w1 = time { fn(spark, sfDir).count(): Unit }
        val w2 = time { fn(spark, sfDir).count(): Unit }
        if (w1 < 0 || w2 < 0) -1.0 else math.min(w1, w2)
      }
      name -> (cold, warm)
    }
    // failed queries stay visible as -1 per-query but must NOT shrink the
    // aggregate: sum only successful timings and report the failure count
    val ok = results.values.filter(_._2 >= 0)
    val total = ok.map(_._2).sum
    val coldTotal = ok.map(_._1).sum
    val nFailed = results.values.count(_._2 < 0)
    // Full per-query detail first, one line each, for humans and logs —
    // these lines sit ABOVE the contract line so they can never push it
    // out of a tail-capped capture.
    results.foreach { case (k, (c, w)) =>
      println(f"BENCHQ $k%-24s warm=$w%.3f cold=$c%.3f")
    }
    // The driver captures only the LAST 2000 characters of output, and
    // sbt appends its own ~80-char "[success] ..." line after ours — so
    // the contract JSON line must stay under ~1850 chars END TO END or
    // its head is cut mid-line and nothing parses (rounds 1-3 all lost
    // their totals this way). Headline totals lead the line; the
    // per-query map lists queries slowest-first at 3 dp and is trimmed
    // to the budget, with the trimmed remainder summarized explicitly
    // ("omitted_n"/"omitted_s") — no silent truncation.
    def r3(d: Double): Double = math.rint(d * 1000) / 1000
    if (contendedBy.isEmpty) contendedBy = otherJvm()
    // name the offender so a flagged run is diagnosable from the JSON
    // alone (round-5: the flag once latched with no offender recorded,
    // which was unfalsifiable)
    val contention = contendedBy match {
      case Some(who) => s""","contended":true,"contended_by":${
        "\"" + who.replace("\\", "\\\\").replace("\"", "\\\"") + "\""}"""
      case None => s""","contended":false"""
    }
    val header = s""""metric":"total_warm","value":${r3(total)},"unit":"sec"""" +
      s""","cold_s":${r3(coldTotal)},"failed":$nFailed$contention""" +
      s""","sf":"$sfDir""""
    val slowestFirst = results.toSeq.sortBy { case (_, (_, w)) => -w }
    val budget = 1750 - header.length - 60 // 60 = braces + omitted fields
    // stop at the FIRST entry that doesn't fit: skipping it but admitting
    // a later shorter-named one would make drop(kept) mislabel what was
    // actually omitted
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    var kept = 0
    var full = false
    slowestFirst.foreach { case (k, (_, w)) =>
      if (!full) {
        val e = s"\"$k\":${r3(w)}"
        if (used + e.length + 1 <= budget) { entries += e; used += e.length + 1; kept += 1 }
        else full = true
      }
    }
    val omitted = slowestFirst.drop(kept)
    val omittedS = r3(omitted.map(_._2._2).filter(_ >= 0).sum)
    println(s"""{$header,"queries":${entries.mkString("{", ",", "}")}""" +
      s""","omitted_n":${omitted.length},"omitted_s":$omittedS}""")
    spark.stop()
  }
}
