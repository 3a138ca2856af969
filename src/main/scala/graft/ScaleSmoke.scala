package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-growth evidence harness (round-6 verdict item 4).
  *
  * The container has no sf1 fixtures, so the "capped plans grow
  * ~linearly" claims for the heaviest query families were argument,
  * not measurement. This main synthesizes a ~KxX corpus from sf0.1 by
  * unioning K key-shifted copies of each input table (keys shifted by
  * `max(key)+1` per copy, so key cardinality AND row count both scale
  * by K while per-key group sizes — basket width, doc length, node
  * degree — stay constant: the growth model of "more users, more
  * docs, more items", which is how a real corpus reaches 100 TB), then
  * times the heavy families at 1x and Kx on the same JVM.
  *
  * Families measured (the three the round-5 verdict named, plus the
  * banded-dedup representative):
  *   - item-CF baskets: g6_item_cf (lineitem co-occurrence)
  *   - BM25 / token pipeline: t22_bm25, t24_bpe_segment (documents)
  *   - k-core edges: g12_kcore (orders ⋈ lineitem co-purchase graph)
  *   - banded near-dup: d5_minhash_portable (documents; MinHash+LSH)
  *   - event-time analytics: w6_sessionize, w12_funnel (events)
  *   - vector families: d6_embedding_dedup, sim5_ivf_portable
  *     (embeddings; each copy's vectors are ROTATED by the copy index
  *     so cross-copy pairs aren't exact duplicates — rotation preserves
  *     norms and within-copy structure, so bucket sizes stay constant
  *     instead of every LSH bucket collecting K identical vectors)
  *
  * Expected: warm-time ratio ≈ K for linear plans (every family caps
  * its quadratic stage per-bucket, so doubling buckets doubles work).
  * A super-linear ratio here is a scale bug no sf0.1 bench can see.
  *
  * Usage: runMain graft.ScaleSmoke [sfDir] [workDir] [factor] [fam,fam]
  * [modes]
  * (4th arg: comma-separated family subset — the ~100x promotion runs
  * only the heaviest families; the full list at 100x would take hours
  * for no extra evidence. 5th arg, comma-separated: "perturb" =
  * constant-dup-density documents — see the synth comment; "reuse" =
  * skip synthesis when workDir already holds a corpus from an earlier
  * run with the SAME factor/modes — the caller asserts that match.)
  */
object ScaleSmoke {
  private val families = Seq(
    "g6_item_cf", "t22_bm25", "t24_bpe_segment", "g12_kcore",
    "d5_minhash_portable", "w6_sessionize", "w12_funnel",
    "d6_embedding_dedup", "sim5_ivf_portable",
    // round-6 third-session heavies: blocked fuzzy join (customer),
    // cross-set leakage dedup (documents), wedge-machinery cc (orders
    // ⋈ lineitem), threshold sweep (documents), growth accounting
    // (events)
    "j16_fuzzy_join", "d16_split_leakage", "g15_clustering_coeff",
    "d21_threshold_sweep", "w30_growth_accounting",
    // round-8: the iterative-fixpoint family — convergence-dependent
    // cost (rounds × per-round shuffle) is exactly what a same-JVM
    // ratio can expose and a single-scale bench cannot
    "d7_dup_clusters", "g10_label_prop", "g5_pagerank",
    // round-8: the auto-width embedding near-dup — the variant whose
    // bucket capacity survives growth (run at 1000x, only:embeddings)
    "d22_embedding_dedup_auto",
    // round-9: the simhash twin of d22 (run at 1000x,
    // only:documents + perturb — constant dup density)
    "d24_simhash_auto")

  def main(args: Array[String]): Unit = {
    // scale runs are the spill producers — reclaim earlier orphans first
    // (the round-11 ENOSPC episode was exactly their accumulation)
    SpillJanitor.sweep()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_scale"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val modes: Set[String] =
      if (args.length > 4) args(4).split(",").toSet else Set.empty
    // "only:embeddings+documents" — synthesize just those tables (the
    // vector families need a 1000x embeddings corpus, which would be
    // pointless to buy with a 600M-row lineitem synth). '+' or ';'
    // separate tables; prefer '+' — sbt -batch splits its command
    // string on ';', silently truncating the list (bit round 9)
    val onlyTables: Set[String] = modes.collectFirst {
      case m if m.startsWith("only:") =>
        m.stripPrefix("only:").split("[;+]").toSet
    }.getOrElse(Set.empty)
    def want(t: String): Boolean = onlyTables.isEmpty || onlyTables(t)
    val reuseProbe =
      if (onlyTables.isEmpty) "orders" else onlyTables.toSeq.sorted.head
    val reuse = modes("reuse") &&
      new java.io.File(s"$workDir/$reuseProbe.parquet").exists()

    // --- synthesize the scaled corpus ---------------------------------
    if (!reuse) {
    val copies = spark.range(factor).select(col("id").as("__copy"))
    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1L

    def scaleTable(name: String, keyCols: Map[String, Long]): Unit =
      if (want(name)) {
        val df = Tables.table(spark, sfDir, name)
        val shifted = keyCols.foldLeft(df.crossJoin(broadcast(copies))) {
          case (acc, (c, s)) =>
            acc.withColumn(c, col(c) + col("__copy") * s)
        }.drop("__copy")
        shifted.repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$workDir/$name.parquet")
      }

    val t0 = System.nanoTime()
    // events may carry parquet TIMESTAMP(NANOS) in older fixtures —
    // the same legacy conf Tables.events sets lets the raw copy read
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ord = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val ev = Tables.table(spark, sfDir, "events")
    val emb = Tables.embeddings(spark, sfDir)
    val okStride = stride(ord, "o_orderkey")
    val ckStride = stride(ord, "o_custkey")
    val pkStride = stride(li, "l_partkey")
    val dStride = stride(docs, "doc_id")
    val eStride = stride(ev, "event_id")
    val uStride = stride(ev, "user_id")
    val vStride = stride(emb, "vec_id")
    // l_suppkey shifts with its own stride and supplier scales with it:
    // without this the bipartite supplier—part families (g5) would grow
    // supplier degree K× (hub growth) instead of adding K× more
    // same-degree suppliers — the wrong scale model AND a missing table
    val skStride = stride(
      Tables.supplier(spark, sfDir).select(col("s_suppkey").cast("long")
        .as("s_suppkey")), "s_suppkey")
    scaleTable("supplier", Map("s_suppkey" -> skStride))
    scaleTable("orders", Map("o_orderkey" -> okStride, "o_custkey" -> ckStride))
    scaleTable("lineitem", Map("l_orderkey" -> okStride,
      "l_partkey" -> pkStride, "l_suppkey" -> skStride))
    // documents: verbatim copies by default — each doc gains K-1 exact
    // duplicates, the cap-stress model the committed d5/t22 rows use
    // (text has no lossless rotation). 5th arg "perturb" instead
    // suffixes every token with the copy index (a bijection per copy):
    // within-copy near-dup structure is identical to 1× and cross-copy
    // similarity is exactly zero — CONSTANT dup density, the growth
    // model for exact-pair families (d7) whose work is inherently
    // Θ(K²·|shingles|) under verbatim copies (every doc then really has
    // K-1 near-dups — a corpus property, not an engine property).
    val perturbDocs = modes("perturb")
    if (perturbDocs && want("documents")) {
      Tables.documents(spark, sfDir).crossJoin(broadcast(copies))
        .withColumn("doc_id", col("doc_id") + col("__copy") * dStride)
        .withColumn("text", when(col("__copy") === 0, col("text"))
          .otherwise(array_join(transform(split(col("text"), "\\s+"),
            t => concat(t, lit("§"), col("__copy"))), " ")))
        .drop("__copy")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$workDir/documents.parquet")
    } else if (!perturbDocs) scaleTable("documents", Map("doc_id" -> dStride))
    scaleTable("events", Map("event_id" -> eStride, "user_id" -> uStride))
    // customer: shift the key AND rewrite the name to embed it, so the
    // j16 trigram blocks keep their shape (K identical name copies
    // would collapse into one block and undercount the fuzzy join)
    if (want("customer")) Tables.customer(spark, sfDir)
      .crossJoin(broadcast(copies))
      .withColumn("c_custkey", col("c_custkey") + col("__copy") * ckStride)
      .withColumn("c_name",
        format_string("Customer#%09d", col("c_custkey")))
      .drop("__copy")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$workDir/customer.parquet")
    // embeddings, two growth regimes:
    //  - default (iid-like): shift the id AND rotate the vector by the
    //    copy index — copies are mutually near-orthogonal, the WORST
    //    case for cell-pruned ANN (sim16's shrunken-fraction regime);
    //  - mode "cluster": each copy = base vector + a small
    //    deterministic per-(vec, copy, dim) perturbation — copies of
    //    one base form a tight cosine cluster (|base| clusters of K
    //    members at factor K), the regime real embedding corpora live
    //    in, where a query's true neighbors share its cells and the
    //    recall-targeted probe policy (sim17/sim18) should hold its
    //    target at small nProbe. Amplitude ±0.05 per dim keeps
    //    within-cluster cosine ≈0.999 while cross-base similarity
    //    stays at the iid baseline.
    if (want("embeddings")) {
      val shifted = emb.crossJoin(broadcast(copies))
        .withColumn("vec_id", col("vec_id") + col("__copy") * vStride)
      val grown =
        if (modes("cluster"))
          shifted.withColumn("embedding",
            when(col("__copy") === 0, col("embedding")).otherwise(expr(
              "transform(embedding, (x, i) -> cast(x + " +
                "(pmod(xxhash64(vec_id, __copy, i), 1000) / 1000.0" +
                " - 0.5) * 0.1 as float))")))
        else shifted
          // rotate by __copy mod dim — at factors above the vector
          // width a raw __copy offset would make slice()'s length
          // negative (ANSI error; hit at the r8 100x promotion)
          .withColumn("__rot", expr("cast(__copy % size(embedding) as int)"))
          .withColumn("embedding", expr(
            "concat(slice(embedding, __rot + 1, size(embedding) - __rot), " +
              "slice(embedding, 1, __rot))"))
          .drop("__rot")
      grown.drop("__copy")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$workDir/embeddings.parquet")
    }
    println(f"SCALESMOKE synth ${factor}x done in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    for (t <- Seq("orders", "lineitem", "documents", "events",
        "embeddings").filter(want)) {
      val n1 = Tables.table(spark, sfDir, t).count()
      val nK = Tables.table(spark, workDir, t).count()
      println(s"SCALESMOKE rows $t 1x=$n1 ${factor}x=$nK")
    }
    } else println(s"SCALESMOKE reusing existing corpus at $workDir")

    // --- time each family at both scales (same JVM, warm best-of-2) ---
    def timeOnce(f: => Unit): Double = {
      val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
    }
    def warm(name: String, dir: String): (Double, Long) = {
      val fn = SparkEntry.queries(name)
      var n = 0L
      System.gc()
      timeOnce { n = fn(spark, dir).count() } // cold, discarded
      (math.min(
        timeOnce { n = fn(spark, dir).count() },
        timeOnce { n = fn(spark, dir).count() }), n)
    }
    val fams = if (args.length > 3) args(3).split(",").toSeq else families
    val rows = fams.map { q =>
      val (w1, n1) = warm(q, sfDir)
      val (wK, nK) = warm(q, workDir)
      // result-row counts make SILENT capacity loss visible in the same
      // table that defends runtime: a flat-runtime family whose Kx row
      // count collapses to zero is the d6-at-1000x wall, not a win
      println(f"SCALESMOKE $q%-18s 1x=$w1%7.2f s ($n1%d rows)  ${factor}x=$wK%7.2f s ($nK%d rows)  ratio=${wK / w1}%5.2f (linear=$factor)")
      (q, w1, wK, n1, nK)
    }
    val json = rows.map { case (q, w1, wK, n1, nK) =>
      f""""$q":{"w1":$w1%.2f,"wK":$wK%.2f,"ratio":${wK / w1}%.2f,"rows1":$n1%d,"rowsK":$nK%d}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_smoke","factor":$factor,"families":$json}""")
    spark.stop()
  }
}
