package graft

import graft.llmops.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler for hotspot queries (not part of the driver contract).
  *
  * Current target: back-fill the d2/d3 banding A/B tables the round-7
  * scaladoc asserts (PLANS.md round 8) — band-width choice for the
  * portable SimHash pipeline, and bucket-local pair generation vs the
  * self-join + pre-count form, for both simhash and minhash variants.
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

    // ---- A: SimHash band width (d3 ships bands=2 → 16-bit keys) ------
    def simBL(bands: Int): Long =
      Dedup.simHashPairsPortable(docs, "doc_id", "text",
        maxHamming = 1, bands = bands, maxBucket = 1000).count()

    // ---- B: self-join + window pre-count form (the rejected shape) ---
    def simSelfJoin(bands: Int): Long = {
      val width = 32 / bands
      val mask = (1L << width) - 1
      val sig = docs
        .where(size(TextFunctions.tokens(col("text"))) > 0)
        .select(col("doc_id").as("doc"),
          Dedup.simHash32Portable(col("text")).as("sig"))
      val banded = sig.select(col("doc"), col("sig"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("sig"), b * width).bitwiseAND(mask)
              .as("key"))): _*)).as("bk"))
        .select(col("doc"), col("sig"), col("bk.band"), col("bk.key"))
      val capped = banded.withColumn("__bc",
          count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
        .where(col("__bc") <= 1000)
      capped.as("l").join(capped.as("r"),
          col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
            col("l.doc") < col("r.doc"))
        .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"),
          bit_count(col("l.sig").bitwiseXOR(col("r.sig")))
            .cast("long").as("hamming"))
        .where(col("hamming") <= 1)
        .distinct()
        .count()
    }

    // ---- C: MinHash (d2 params: 16 hashes, 8 bands × 2 rows) ---------
    def mhBL(): Long =
      Dedup.minHashPairsPortable(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 8, minJaccard = 0.2).count()

    def mhSelfJoin(): Long = {
      val rows = 2 // 16 hashes / 8 bands
      val sig = docs
        .select(col("doc_id").as("doc"),
          Dedup.minHashSigPortable(col("text"), 3, 16).as("sig"))
        .where(size(col("sig")) > 0 && col("sig")(0).isNotNull)
      val banded = sig.select(col("doc"), col("sig"),
        explode(array((0 until 8).map(b =>
          struct(lit(b).as("band"),
            Dedup.bandKeyPortable(col("sig"), b, rows)
              .as("key"))): _*)).as("bk"))
        .select(col("doc"), col("sig"), col("bk.band"), col("bk.key"))
      val capped = banded.withColumn("__bc",
          count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
        .where(col("__bc") <= 200)
      capped.as("l").join(capped.as("r"),
          col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
            col("l.doc") < col("r.doc"))
        .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"),
          (size(filter(zip_with(col("l.sig"), col("r.sig"),
            (x, y) => x === y), v => v)).cast("double") / 16)
            .as("est_jaccard"))
        .where(col("est_jaccard") >= 0.2)
        .distinct()
        .count()
    }

    for (rep <- 1 to 3) {
      quiesce(); time(s"sim bucket-local bands=2 (16-bit) #$rep")(simBL(2))
      quiesce(); time(s"sim bucket-local bands=4 (8-bit)  #$rep")(simBL(4))
      quiesce(); time(s"sim self-join    bands=2 (16-bit) #$rep")(simSelfJoin(2))
      quiesce(); time(s"sim self-join    bands=4 (8-bit)  #$rep")(simSelfJoin(4))
      quiesce(); time(s"mh  bucket-local 8x2 (d2 params)  #$rep")(mhBL())
      quiesce(); time(s"mh  self-join    8x2 (d2 params)  #$rep")(mhSelfJoin())
    }
    spark.stop()
  }
}
