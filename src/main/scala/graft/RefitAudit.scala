package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llmops.SimSearch

/** Scale-evidence main for the sim22 re-fit policy (round 11, not part
  * of the driver contract): runs [[SimSearch.refitIfDrifted]] on a
  * grown corpus and prints the DECISION (the registered sim22 row
  * carries it as columns, but ScaleSmoke's row-count line only shows
  * the serving cell count — this makes the flags themselves part of
  * the committed evidence, under both embedding growth regimes).
  *
  * Fit/incoming split mirrors sim22: vec_id % 5 partitions the corpus
  * into an 80% fit snapshot and a 20% "arrived later" batch. Under
  * ScaleSmoke's default rotate growth the incoming slice is
  * distributionally identical to fit (drift should NOT fire — a
  * correct no-op is evidence too); under `cluster` growth the copies
  * sit in tight cosine clusters and per-cell loads concentrate, the
  * regime where the skew trigger becomes live.
  *
  * Usage: runMain graft.RefitAudit [corpusDir] [skewFactor]
  * [driftMilli] [minCellN]
  */
object RefitAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_emb100")
    val skewFactor = if (args.length > 1) args(1).toInt else 3
    val driftMilli = if (args.length > 2) args(2).toInt else 20
    val minCellN = if (args.length > 3) args(3).toLong else 5L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, dir).where(col("vec_id") >= 10)
    val fit = emb.where(col("vec_id") % 5 =!= 0)
    val inc = emb.where(col("vec_id") % 5 === 0)
    val t0 = System.nanoTime()
    val out = SimSearch.refitIfDrifted(fit, inc, "vec_id", "embedding",
      targetCellSize = 64L, skewFactor = skewFactor,
      driftMilli = driftMilli, minCellN = minCellN)
    val head = out.head()
    val nRows = out.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"REFITAUDIT dir=$dir skewFactor=$skewFactor " +
      f"driftMilli=$driftMilli minCellN=$minCellN -> " +
      f"refit=${head.getLong(0)} skew=${head.getLong(1)} " +
      f"drift=${head.getLong(2)} n_cells=${head.getLong(3)} " +
      f"serving_rows=$nRows wall=$wall%.1f s")
    spark.stop()
  }
}
