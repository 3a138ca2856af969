package graft

import graft.llmops.{Dedup, SimSearch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence main (round 14, not part of the driver contract):
  * the documented md5-sample audit contract exercised on a 100×
  * corpus — the proof that the policy/audit family's quadratic-by-
  * design exact side stays OPERABLE at cluster scale.
  *
  * The registered d38-d42 queries audit an md5 half-sample of the
  * sf-fixture corpus; their scaladocs state that at 100 TB the caller
  * audits a deterministic md5 SAMPLE of fixed mass instead (recall and
  * detection are per-pair properties, so a sampled estimate is
  * unbiased). This main runs exactly that contract against the
  * ScaleSmoke 100× corpus: the sample predicate tightens from
  * `md5 < "8"` (8/16) to a 2-hex-digit prefix (k/256) so the AUDITED
  * mass stays ≈ the 1× fixture's, while the corpus behind it is 100×.
  * Expected: wall ≈ the registered query's 1× cost (the audit never
  * touches the unsampled rows — Catalyst pushes the md5 filter to the
  * scan), decision output stays ONE row, and the serving-layout inputs
  * (the auto width basis for the SimHash family) come from the FULL
  * corpus count via `precountedN` — the audited layout is the serving
  * layout, not a sample-sized one.
  *
  * Usage: runMain graft.MaintScale [workDir] [docPrefix] [embPrefix]
  *   workDir   — a ScaleSmoke output dir (documents+embeddings)
  *   docPrefix — 2-hex-digit md5 ceiling for documents ("02" = 2/256)
  *   embPrefix — same for embeddings ("02")
  */
object MaintScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100n")
    val docCeil = if (args.length > 1) args(1) else "02"
    val embCeil = if (args.length > 2) args(2) else "02"
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

    val docs = Tables.documents(spark, dir)
    val embs = Tables.embeddings(spark, dir)
    val nDocs = docs.count()
    val nEmbs = embs.count()
    val dS = docs.where(
      substring(md5(col("doc_id").cast("string")), 1, 2) < docCeil)
    val eS = embs.where(
      substring(md5(col("vec_id").cast("string")), 1, 2) < embCeil)
    println(s"[maintscale] corpus docs=$nDocs embs=$nEmbs " +
      s"sampled docs=${dS.count()} embs=${eS.count()}")

    def timed(name: String)(f: => DataFrame): Unit = {
      def once(): (Double, Long, String) = {
        val t0 = System.nanoTime()
        val rows = f.collect()
        val t = (System.nanoTime() - t0) / 1e9
        (t, rows.length.toLong,
          rows.headOption.map(_.toSeq.take(6).mkString(",")).getOrElse(""))
      }
      once() // cold discarded
      val (w1, n, head) = once()
      val (w2, _, _) = once()
      println(f"[maintscale] $name%-14s warm=${math.min(w1, w2)}%7.2f s " +
        f"rows=$n head=[$head]")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }

    // d38: SimHash recall audit — serving layout width from the FULL
    // corpus count (precountedN), detection measured on the sample
    timed("d38_sampled") {
      Dedup.simHashPlanAudit(dS, "doc_id", "text", maxHamming = 12,
        precountedN = Some(nDocs))
    }
    // d39/d40: sign-LSH replan ACT/KEEP — explicit serving layouts,
    // exact-cosine evidence from the sample
    timed("d39_sampled") {
      SimSearch.signReplanIfUndershot(eS, "vec_id", "embedding",
        dim = 64, nBits = 16, bands = 2, minCosinePct = 40,
        targetDetectPct = 80)
    }
    timed("d40_sampled") {
      SimSearch.signReplanIfUndershot(eS, "vec_id", "embedding",
        dim = 64, nBits = 16, bands = 8, minCosinePct = 40,
        targetDetectPct = 80)
    }
    // d41/d42: SimHash width ACT/KEEP — width basis = full corpus
    timed("d41_sampled") {
      Dedup.simHashWidenIfUndershot(dS, "doc_id", "text",
        maxHamming = 3, targetDetectPct = 99, maxBucket = 1,
        precountedN = Some(nDocs))
    }
    timed("d42_sampled") {
      Dedup.simHashWidenIfUndershot(dS, "doc_id", "text",
        maxHamming = 3, targetDetectPct = 99,
        precountedN = Some(nDocs))
    }
    spark.stop()
  }
}
