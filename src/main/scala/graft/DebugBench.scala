package graft

import graft.llmops.SimSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for hotspot queries (not part of the driver contract).
  *
  * Current target: the d22 auto-width banding at the 1000x embeddings
  * corpus — bucket-size distribution (is the 570 s cost pair volume from
  * the corpus's verbatim-dup degeneracy, sign-pattern skew hitting the
  * maxBucket cap, or both?) and the output pair counts of the fixed-width
  * d6 vs auto-width d22 at that scale. (PLANS.md round 8.)
  */
object DebugBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale1000e")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val width = SimSearch.autoWidth(n, 50L)
    println(s"[debug] n=$n autoWidth=$width (4 bands x $width bits)")

    // replicate lshPairs' band keys (same portablePlane convention)
    val v = emb.select(col("vec_id").as("__id"),
      col("embedding").cast("array<double>").as("__v"))
    def bandKeys(w: Int) = (0 until 4).map { j =>
      val bits = (0 until w).map { k =>
        val plane = array(SimSearch.portablePlane(j * w + k, 64).map(lit): _*)
        val proj = graft.functions.GraftFunctions.dot(col("__v"), plane)
        when(proj >= 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
      }
      struct(lit(j).as("band"), bits.reduce(_.bitwiseOR(_)).as("key"))
    }
    for (w <- Seq(4, width)) {
      val buckets = v.select(explode(array(bandKeys(w): _*)).as("bk"))
        .groupBy(col("bk")).agg(count(lit(1)).as("c"))
      val stats = buckets.agg(
        count(lit(1)).as("nBuckets"),
        expr("percentile_approx(c, array(0.5, 0.9, 0.99), 10000)").as("p"),
        max(col("c")).as("max"),
        sum(when(col("c") > 2000, col("c")).otherwise(0L))
          .as("rowsCappedOut"),
        sum(when(col("c") <= 2000,
          (col("c") * (col("c") - 1) / 2).cast("long")).otherwise(0L))
          .as("candidatePairs")).head()
      println(s"[debug] width=$w buckets=${stats.getLong(0)} " +
        s"p50/p90/p99=${stats.getSeq[Long](1).mkString("/")} " +
        s"max=${stats.getLong(2)} rowsCappedOut=${stats.getLong(3)} " +
        s"candidatePairs=${stats.getLong(4)}")
    }
    val d6n = time("d6 fixed-width pair count")(
      SparkEntry.queries("d6_embedding_dedup")(spark, dir).count())
    println(s"[debug] d6 pairs=$d6n")
    val d22n = time("d22 auto-width pair count")(
      SparkEntry.queries("d22_embedding_dedup_auto")(spark, dir).count())
    println(s"[debug] d22 pairs=$d22n")
    spark.stop()
  }
}
