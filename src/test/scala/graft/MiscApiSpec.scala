package graft

import graft.functions.TextFunctions
import graft.llmops.Dedup
import graft.ops.{Sampling, Skew}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Coverage for the remaining public API surface not exercised by the
  * oracle queries. */
class MiscApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("subwordCount splits words, digits and punctuation") {
    val df = Seq("Hello, world! 42 tokens-here").toDF("t")
    // chunks: hello, world, 42, tokens, here = 5; punct: , ! - = 3
    assert(df.select(TextFunctions.subwordCount($"t")).as[Int].head() == 8)
  }

  test("simHashPairs finds near-identical docs, skips unrelated ones") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the warm sun today"),
      (2L, "the quick brown fox jumps over the lazy dog in the warm sun tonight"),
      (3L, "completely different words about catalyst plans and shuffle exchanges"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 8)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("skewReport surfaces the hottest keys with shares") {
    val df = (Seq.fill(60)(1L) ++ Seq.fill(30)(2L) ++ Seq.fill(10)(3L)).toDF("k")
    val rep = Skew.skewReport(df, $"k", topN = 2)
      .as[(Long, Long, Double)].collect()
    assert(rep.map(r => (r._1, r._2)).toSeq == Seq((1L, 60L), (2L, 30L)))
    assert(math.abs(rep.head._3 - 0.6) < 1e-9)
  }

  test("stratifiedByActivity (xxhash64 variant) keeps hi stratum at a higher rate") {
    val counts = Tables.events(spark, "/root/testdata/sf0.01")
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
    val kept = Sampling.stratifiedByActivity(counts, "user_id", "n",
      hiThreshold = 70, hiRate = 0.5, loRate = 0.1)
    val k = kept.count(); val total = counts.count()
    assert(k > 0 && k < total)
    // deterministic across invocations
    assert(Sampling.stratifiedByActivity(counts, "user_id", "n", 70, 0.5, 0.1)
      .count() == k)
  }
}
