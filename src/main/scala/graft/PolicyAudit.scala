package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llmops.SimSearch

/** Scale-evidence main for the sim17/sim18 probe policy (round 10, not
  * part of the driver contract): runs [[SimSearch.autoNProbeHoldoutAudit]]
  * with a statistically meaningful calibration on a grown corpus.
  *
  * Why it exists: the registered sim18 is fixture-shaped — 5 calibration
  * and 5 holdout queries. At a 100× corpus that sample is too small to
  * see the structural fact that the auto-sized index is FINER than the
  * corpus's clusters (autoCells(200k, 64) = 3,125 cells over 2,000
  * clusters of 100 ⇒ ~1.6 md5-sampled centroids land INSIDE each
  * cluster, members split across them, and the recall-correct depth is
  * 2–4); a 5-query calibration picks depth 1 by luck and the holdout
  * audit then catches it (meets_target = 0) — the audit doing its job,
  * but weak evidence about the POLICY. This main holds out the copy-0
  * originals (each keeps its perturbed copies in the corpus under
  * ScaleSmoke's `cluster` mode): calibrate on the first `calibN`,
  * audit on the next `holdN` — hundreds of truth rows on each side.
  *
  * Usage: runMain graft.PolicyAudit [corpusDir] [calibN] [holdN] [pct]
  */
object PolicyAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_embc100")
    val calibN = if (args.length > 1) args(1).toInt else 500
    val holdN = if (args.length > 2) args(2).toInt else 500
    val pct = if (args.length > 3) args(3).toInt else 80
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, dir)
    val calib = emb.where(col("vec_id") < calibN)
    val hold = emb.where(col("vec_id") >= calibN &&
      col("vec_id") < calibN + holdN)
    val corpus = emb.where(col("vec_id") >= calibN + holdN)
    val t0 = System.nanoTime()
    val row = SimSearch.autoNProbeHoldoutAudit(calib, hold, corpus,
      "vec_id", "embedding", "vec_id", "embedding",
      k = 5, targetCellSize = 64L, recallPctTarget = pct).head()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"POLICYAUDIT dir=$dir calib=$calibN holdout=$holdN " +
      f"target=$pct%% -> n_probe=${row.getLong(0)} " +
      f"hits=${row.getLong(1)}/${row.getLong(2)} " +
      f"recall_pct=${row.getLong(3)} meets=${row.getLong(4)} " +
      f"wall=$wall%.1f s")
    spark.stop()
  }
}
