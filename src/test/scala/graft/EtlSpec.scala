package graft

import graft.etl.Etl
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden/property tests of the §3.3 ETL chain over a synthetic
  * Books-shaped corpus (FIXTURES.md §2 contracts). */
class EtlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 6 users × up to 12 interactions; ratings skewed high; one power user
  private lazy val reviews = {
    val rows = for {
      u <- 1 to 6
      n = if (u == 1) 12 else 5 + u
      i <- 1 to n
    } yield (f"U$u%03d", f"B${(u * 7 + i * 13) % 40}%03d",
      ((u + i) % 5 + 1).toDouble, 1600000000L + u * 1000L + i * 86400L)
    rows.toDF("reviewerID", "asin", "overall", "unixReviewTime")
  }

  private lazy val meta = Seq(
    ("B001", Seq(Seq("Books", "Fiction", "Mystery")), Some("AcmePress"), Some("$12.34")),
    ("B002", Seq(Seq("Books", "SciFi")), Some("Orbit"), Some("$1,299.00")),
    ("B003", Seq(Seq("Books")), None, Some("")),
    ("B004", Seq.empty[Seq[String]], Some("NoPrice"), None),
    ("B005", Seq(Seq("Books", "History")), Some("Peri"), Some("7.5"))
  ).toDF("asin", "categories", "brand", "price")

  test("splitUsers: disjoint, exhaustive, deterministic") {
    val (inc, exc) = Etl.splitUsers(reviews)
    val (inc2, exc2) = Etl.splitUsers(reviews)
    assert(inc.as[String].collect().toSet == inc2.as[String].collect().toSet)
    assert(inc.count() + exc.count() == 6)
    assert(inc.join(exc, "user_id").count() == 0)
  }

  test("excludedBehaviors: only excluded users, sorted, full projection") {
    val (_, exc) = Etl.splitUsers(reviews)
    val beh = Etl.excludedBehaviors(reviews, exc)
    assert(beh.columns.toSeq == Seq("user_id", "item_id", "timestamp"))
    val users = beh.select("user_id").distinct().as[String].collect().toSet
    assert(users == exc.as[String].collect().toSet)
    val perUser = beh.as[(String, String, Long)].collect().groupBy(_._1)
    perUser.values.foreach { rows =>
      assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq)
    }
  }

  test("lightGcnData: positives only, excluded dropped, deduped") {
    val (_, exc) = Etl.splitUsers(reviews)
    val g = Etl.lightGcnData(reviews, exc)
    val excSet = exc.as[String].collect().toSet
    val rows = g.as[(String, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSet.intersect(excSet).isEmpty)
    assert(rows.length == rows.toSet.size)
    val positives = reviews.where($"overall" >= 4)
      .select($"reviewerID", $"asin").as[(String, String)].collect().toSet
    rows.foreach(r => assert(positives.contains(r)))
  }

  test("itemFeatures: hashed features in [0,1], dirty prices cleansed, nulls safe") {
    val f = Etl.itemFeatures(meta).as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(f.size == 5)
    f.values.foreach { case (c, b, p) =>
      assert(c >= 0 && c < 1 && b >= 0 && b < 1 && p >= 0 && p <= 1)
    }
    // min-max over parseable prices {12.34, 1299.0, 7.5}: min→0, max→1
    assert(f("B005")._3 == 0.0) // 7.5 is min
    assert(f("B002")._3 == 1.0) // 1299.0 (comma cleansed) is max
    assert(f("B003")._3 == 0.0) // unparseable "" → null → 0.0
    assert(f("B004")._3 == 0.0) // missing → null → 0.0
  }

  test("CSV boundary round-trips the reference's artifact contracts (S7/S9/G5)") {
    val dir = java.nio.file.Files.createTempDirectory("etl_csv").toString
    // train_data.csv contract: pipe-joined history, explicit schema read
    val (_, exc) = Etl.splitUsers(reviews)
    val td = Etl.trainingData(reviews, exc, minHistory = 2, stride = 1,
      maxHistory = 3, negPerPos = 1)
    td.write.mode("overwrite").option("header", "true").csv(s"$dir/train")
    val back = spark.read.option("header", "true")
      .schema("user_id STRING, history_items STRING, candidate_item STRING, label INT")
      .csv(s"$dir/train")
    assert(back.as[(String, String, String, Int)].collect().toSet ==
      td.as[(String, String, String, Int)].collect().toSet)
    // wide embedding CSV contract (emb_0..emb_{d-1})
    val emb = Tables.embeddings(spark, TestSpark.sf).limit(20)
      .select($"vec_id".cast("string").as("item_id"), $"embedding")
    graft.recall.EmbeddingIO.writeWideCsv(emb, "item_id", "embedding", 64, s"$dir/emb")
    val embBack = graft.recall.EmbeddingIO.readWideCsv(spark, s"$dir/emb", "item_id", 64)
    val orig = emb.select($"item_id", $"embedding".cast("array<double>"))
      .as[(String, Seq[Double])].collect().toMap
    val got = embBack.as[(String, Seq[Double])].collect().toMap
    assert(got.keySet == orig.keySet && got.keySet.size == 20)
    got.foreach { case (k, v) =>
      v.lazyZip(orig(k)).foreach((a, b) => assert(math.abs(a - b) < 1e-12))
    }
  }

  test("trainingData: prefix histories, positive labels rating≥4, negatives never positives") {
    val (_, exc) = Etl.splitUsers(reviews)
    val td = Etl.trainingData(reviews, exc,
      minHistory = 2, stride = 1, maxHistory = 3, negPerPos = 2)
    val rows = td.as[(String, String, String, Int)].collect()
    assert(rows.nonEmpty)
    val posByUser = reviews.select($"reviewerID", $"asin")
      .as[(String, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { case (u, hist, cand, label) =>
      val h = hist.split("\\|").filter(_.nonEmpty)
      assert(h.length <= 3 && h.nonEmpty)
      h.foreach(item => assert(posByUser(u).contains(item)))
      if (label == 0) assert(!posByUser(u).contains(cand), s"neg $cand in positives of $u")
      else assert(posByUser(u).contains(cand))
    }
    // both labels present; ordering-determinism across runs
    assert(rows.map(_._4).toSet == Set(0, 1))
    val rows2 = Etl.trainingData(reviews, exc,
      minHistory = 2, stride = 1, maxHistory = 3, negPerPos = 2)
      .as[(String, String, String, Int)].collect()
    assert(rows.toSet == rows2.toSet)
  }
}
