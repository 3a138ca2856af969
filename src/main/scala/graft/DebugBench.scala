package graft

import graft.llmops.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for hotspot queries (not part of the driver contract).
  *
  * Current target: cost share of the md5-portable signatures inside the
  * d-family heavies — is a cheaper portable minhash family (one md5 per
  * shingle + arithmetic seed mixes) worth the oracle churn? (PLANS.md
  * round 8.)
  */
object DebugBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    def quiesce(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    val docs = Tables.documents(spark, dir)

    // stage shares of the portable minhash pipeline (d2 params):
    // shipped native mix kernel vs its composed-HOF spec vs xxhash prod
    val shingled = docs.select(col("doc_id"),
      array_distinct(TextFunctions.shingles(col("text"), 3)).as("sh"))
    val sigNative = docs.select(col("doc_id"),
      Dedup.minHashSigPortable(col("text"), 3, 16).as("sig"))
    val sigXx = docs.select(col("doc_id"),
      Dedup.minHashSig(col("text"), 3, 16).as("sig"))
    val sigHof = docs.select(col("doc_id"),
      Dedup.minHashSigPortableHof(col("text"), 3, 16).as("sig"))

    for (rep <- 1 to 3) {
      quiesce(); time(s"shingle only          #$rep")(shingled.select(sum(size(col("sh")))).collect())
      quiesce(); time(s"sig mix native (ship) #$rep")(sigNative.select(min(element_at(col("sig"), 1))).collect())
      quiesce(); time(s"sig xxhash (prod)     #$rep")(sigXx.select(min(element_at(col("sig"), 1))).collect())
      quiesce(); time(s"sig mix HOF (spec)    #$rep")(sigHof.select(min(element_at(col("sig"), 1))).collect())
      quiesce(); time(s"d2 full               #$rep")(
        SparkEntry.queries("d2_minhash_pairs")(spark, dir).count())
      quiesce(); time(s"sim32 portable sig    #$rep")(
        docs.select(Dedup.simHash32Portable(col("text")).as("g")).select(min(col("g"))).collect())
      quiesce(); time(s"d3 full               #$rep")(
        SparkEntry.queries("d3_simhash")(spark, dir).count())
    }
    spark.stop()
  }
}
