package graft

import graft.ops.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the two SpMM propagation plans by embedding width —
  * [[Graph.propagate]] (two shuffles of (id, dim, value) scalar rows)
  * vs [[Graph.propagateVec]] (one shuffle of whole `array<double>`
  * rows into the spillable `vec_sum` aggregate). Nodes get a synthetic
  * deterministic width-W embedding derived from `s_acctbal`, so the
  * same graph is propagated at every width.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.BenchSpmm [widths...]`
  * (default widths 1 8 64). Prints one line per (width, plan, run);
  * crossover conclusions are recorded in PLANS.md. */
object BenchSpmm {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val widths = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 8, 64)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey").as("src"), col("l_partkey").as("dst")).distinct()
    val norm = Graph.normalizeEdges(edges, "src", "dst")
      .persist()
    norm.count()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    widths.foreach { w =>
      val nodes = Tables.supplier(spark, sfDir)
        .select(col("s_suppkey").as("id"),
          array((0 until w).map(i =>
            col("s_acctbal") * lit(1.0 + i * 0.01)): _*).as("emb"))
      def scalarRun(): Unit =
        Graph.propagate(norm, nodes, "src", "dst", "id", "emb")
          .count(): Unit
      def vecRun(): Unit =
        Graph.propagateVec(norm, nodes, "src", "dst", "id", "emb")
          .count(): Unit
      scalarRun(); vecRun() // warm both code paths once
      (1 to 3).foreach { r =>
        val ts = time(scalarRun())
        val tv = time(vecRun())
        println(f"[spmm] width=$w%-3d run=$r scalar=$ts%.2f vec=$tv%.2f")
      }
    }
    spark.stop()
  }
}
