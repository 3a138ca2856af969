package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler for hotspot queries (not part of the driver contract). */
object DebugBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      // let AQE re-coalesce partitions INSIDE cached plans: the CC/pagerank
      // fixpoints act on small persisted frames each round, and without this
      // every round pays full-width task dispatch on bench hardware
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    val sets = docs.select(col("doc_id").as("doc"),
      array_distinct(TextFunctions.shingles(col("text"), 3)).as("sh"))
    time("tokenize+shingle")(sets.count())
    val inv = sets.select(col("doc"), explode(col("sh")).as("shingle"))
    time("inverted index")(inv.count())
    val capped = inv.withColumn("__b",
        count(lit(1)).over(Window.partitionBy(col("shingle"))))
      .where(col("__b") <= 10000).drop("__b")
    time("capped")(capped.count())
    val l = capped.as("l"); val r = capped.as("r")
    val inter = l.join(r,
        col("l.shingle") === col("r.shingle") && col("l.doc") < col("r.doc"))
      .groupBy(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    time("pair join+group")(inter.count())
    time("full d4")(SparkEntry.queries("d4_ngram_jaccard")(spark, dir).count())
    time("full d2")(SparkEntry.queries("d2_minhash_pairs")(spark, dir).count())

    // native codegen'd dot product vs higher-order-function form
    val emb = Tables.embeddings(spark, dir)
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("x"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("y")))
    import graft.functions.{GraftFunctions, VectorOps}
    time("dot HOF warm")(pairs.select(
      sum(VectorOps.dot(col("x"), col("y")))).collect())
    time("dot HOF")(pairs.select(
      sum(VectorOps.dot(col("x"), col("y")))).collect())
    time("dot native warm")(pairs.select(
      sum(graft.functions.GraftFunctions.dot(col("x"), col("y")))).collect())
    time("dot native")(pairs.select(
      sum(GraftFunctions.dot(col("x"), col("y")))).collect())
    spark.stop()
  }
}
