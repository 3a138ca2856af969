package graft

import graft.streaming.BehaviorIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Top-level object so executor-side deserialization resolves back to this
  * JVM singleton (an inner object would be cloned and its writes lost). */
object CountingKV extends BehaviorIngest.KVStore {
  val puts = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  override def put(k: String, v: String): Unit = puts.add(k)
}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("IndexMonitor.cellDriftStream: stream ≡ batch, drift joins the fit baseline") {
    implicit val sql = spark.sqlContext
    import graft.streaming.IndexMonitor
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val fit = Seq((0L, 10L, 0.9), (1L, 5L, 0.8))
      .toDF("cell", "n_fit", "mean_cos_fit")
    // two event-time windows; rows 1/2/4 are cell-0-ish, row 3 cell 1
    val rows = Seq(
      (1L, Seq(0.9f, 0.1f), 10L), (2L, Seq(0.8f, 0.2f), 20L),
      (3L, Seq(0.1f, 0.9f), 70L), (4L, Seq(1.0f, 0.0f), 75L))
    def prep(df: org.apache.spark.sql.DataFrame) =
      df.toDF("id", "emb", "sec")
        .withColumn("ts", timestamp_seconds($"sec"))
    val mem = MemoryStream[(Long, Seq[Float], Long)]
    val q = IndexMonitor.cellDriftStream(prep(mem.toDF()), "emb", "ts",
        cents, Some(fit), "1 minute", "2 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("cell_drift").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val cols = Seq("window_start", "window_end", "cell", "n_new",
      "mean_cos_new", "n_fit", "mean_cos_fit", "cos_drift")
    val got = spark.table("cell_drift")
      .selectExpr(cols: _*).collect().map(_.toSeq).toSet
    q.stop()
    val batch = IndexMonitor.cellDriftStream(prep(rows.toDF()), "emb",
        "ts", cents, Some(fit), "1 minute", "2 minutes")
      .selectExpr(cols: _*).collect().map(_.toSeq).toSet
    assert(got == batch, s"stream $got\nbatch $batch")
    // shape: window 0 holds the two cell-0 rows, window 1 one row per
    // cell; every row carries its baseline delta
    assert(batch.size == 3)
    assert(batch.forall(r => r(7) != null), "every cell has a fit baseline")
  }

  test("IndexMonitor.pqDistortionStream: stream ≡ batch, drift joins the 1-row baseline") {
    implicit val sql = spark.sqlContext
    import graft.streaming.IndexMonitor
    // 2 subspaces × 2 centroids over 4-dim vectors
    val cb: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)),
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val fit = Seq((10L, 0.05)).toDF("n_fit", "mean_err_fit")
    // rows split across two 1-minute windows; nonzero reconstruction
    // error so the drift column is informative
    val rows = Seq(
      (1L, Seq(0.9f, 0.1f, 0.8f, 0.2f), 10L),
      (2L, Seq(0.8f, 0.2f, 0.9f, 0.1f), 20L),
      (3L, Seq(0.1f, 0.9f, 0.2f, 0.8f), 70L))
    def prep(df: org.apache.spark.sql.DataFrame) =
      df.toDF("id", "emb", "sec")
        .withColumn("ts", timestamp_seconds($"sec"))
    val mem = MemoryStream[(Long, Seq[Float], Long)]
    val q = IndexMonitor.pqDistortionStream(prep(mem.toDF()), "emb", "ts",
        cb, Some(fit), "1 minute", "2 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("pq_distortion").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val cols = Seq("window_start", "window_end", "n_new", "mean_err_new",
      "n_fit", "mean_err_fit", "err_drift")
    val got = spark.table("pq_distortion")
      .selectExpr(cols: _*).collect().map(_.toSeq).toSet
    q.stop()
    val batch = IndexMonitor.pqDistortionStream(prep(rows.toDF()), "emb",
        "ts", cb, Some(fit), "1 minute", "2 minutes")
      .selectExpr(cols: _*).collect().map(_.toSeq).toSet
    assert(got == batch, s"stream $got\nbatch $batch")
    assert(batch.size == 2, "two event-time windows")
    assert(batch.forall(r => r(6) != null), "every window carries drift")
  }

  test("IndexMonitor.cellDriftStream: UPDATE mode with fitStats — the production shape") {
    // the drift-join path (stream-static join AFTER the windowed
    // aggregation) in the output mode a real monitor runs: update +
    // watermark eviction, across two triggers where the second trigger
    // RE-UPDATES an open window — pins that Spark accepts the
    // post-aggregation join there and re-emits joined rows
    implicit val sql = spark.sqlContext
    import graft.streaming.IndexMonitor
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val fit = Seq((0L, 10L, 0.9), (1L, 5L, 0.8))
      .toDF("cell", "n_fit", "mean_cos_fit")
    def prep(df: org.apache.spark.sql.DataFrame) =
      df.toDF("id", "emb", "sec")
        .withColumn("ts", timestamp_seconds($"sec"))
    val batch1 = Seq((1L, Seq(0.9f, 0.1f), 10L), (2L, Seq(0.8f, 0.2f), 20L))
    val batch2 = Seq((3L, Seq(1.0f, 0.0f), 40L), // window 0 again → update
      (4L, Seq(0.1f, 0.9f), 70L), (5L, Seq(1.0f, 0.0f), 75L))
    val mem = MemoryStream[(Long, Seq[Float], Long)]
    val q = IndexMonitor.cellDriftStream(prep(mem.toDF()), "emb", "ts",
        cents, Some(fit), "1 minute", "2 minutes")
      .writeStream.outputMode("update")
      .format("memory").queryName("cell_drift_upd").start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    val cols = Seq("window_start", "window_end", "cell", "n_new",
      "mean_cos_new", "n_fit", "mean_cos_fit", "cos_drift")
    val emitted = spark.table("cell_drift_upd")
      .selectExpr(cols: _*).collect().map(_.toSeq)
    q.stop()
    val expected = IndexMonitor.cellDriftStream(
        prep((batch1 ++ batch2).toDF()), "emb", "ts",
        cents, Some(fit), "1 minute", "2 minutes")
      .selectExpr(cols: _*).collect().map(_.toSeq).toSet
    // every final (batch-computed) row was emitted, joined columns
    // included, and the update stream covered exactly the final key set
    assert(expected.subsetOf(emitted.toSet),
      s"final rows missing from updates:\n${expected -- emitted.toSet}")
    assert(emitted.map(r => (r(0), r(2))).toSet ==
      expected.map(r => (r(0), r(2))))
    // window 0 / cell 0 was emitted TWICE — n_new 2 then 3 — proving a
    // genuine update re-passed through the stream-static drift join
    val w0c0 = emitted.filter(r => r(2) == 0L &&
      r(0).asInstanceOf[java.sql.Timestamp].getTime == 0L).map(_(3)).toSet
    assert(w0c0 == Set(2L, 3L), s"got $w0c0")
    assert(emitted.forall(r => r(7) != null))
  }

  private val msgs = Seq(
    """{"user_id":"u1","history_items":["i1","i2"],"timestamp":100}""",
    """{"user_id":"u2","history_items":["i3"],"timestamp":200}""",
    """{"user_id":"u1","history_items":["i1","i2","i4"],"timestamp":300}""",
    """not json at all""",
    """{"user_id":null,"history_items":["x"],"timestamp":1}""")

  test("parse applies the reference schema and null guards") {
    val parsed = BehaviorIngest.parse(msgs.toDF("value"))
    val rows = parsed.as[(String, Seq[String], Long)].collect().sortBy(_._3)
    assert(rows.map(_._1).toSeq == Seq("u1", "u2", "u1"))
    assert(rows.head._2 == Seq("i1", "i2"))
  }

  test("profileSink writes versioned user_profile keys executor-side") {
    BehaviorIngest.InMemoryKV.clear()
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(msgs: _*)
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val q = BehaviorIngest.profileSink(
      BehaviorIngest.parse(mem.toDF()), BehaviorIngest.InMemoryKV, ckpt).start()
    q.processAllAvailable(); q.stop()
    val kv = BehaviorIngest.InMemoryKV.data
    assert(kv.get("user_profile:u1:100") == """["i1","i2"]""")
    assert(kv.get("user_profile:u1:300") == """["i1","i2","i4"]""")
    assert(kv.get("user_profile:u2:200") == """["i3"]""")
    assert(kv.size() == 3) // malformed + null rows dropped
  }

  test("latestProfiles keeps the max-timestamp profile per user across batches") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[String]
    val profiles = BehaviorIngest.latestProfiles(
      BehaviorIngest.parse(mem.toDF()))
    val q = profiles.writeStream.outputMode("update")
      .format("memory").queryName("latest_profiles").start()
    mem.addData(msgs(0), msgs(1))
    q.processAllAvailable()
    mem.addData(msgs(2)) // newer u1
    q.processAllAvailable()
    val out = spark.table("latest_profiles")
      .groupBy($"user_id").agg(max($"timestamp").as("ts"))
      .as[(String, Long)].collect().toMap
    q.stop()
    assert(out("u1") == 300L && out("u2") == 200L)
  }

  test("latestProfiles with a TTL drops a stale user's state after the timeout") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[String]
    val profiles = BehaviorIngest.latestProfiles(
      BehaviorIngest.parse(mem.toDF()), ttl = Some("100 milliseconds"))
    val q = profiles.writeStream.outputMode("update")
      .format("memory").queryName("ttl_profiles").start()
    // NOTE: with ProcessingTimeTimeout the engine schedules batches
    // continuously (FlatMapGroupsWithStateExec.shouldRunAnotherBatch is
    // always true), so `processAllAvailable` never latches its no-new-data
    // flag — poll the sink table with a deadline instead. The continuous
    // empty batches are also what FIRES the expired timer between our adds.
    def awaitTs(ts: Long): Boolean = {
      val deadline = System.currentTimeMillis + 20000
      def seen = spark.table("ttl_profiles")
        .where($"user_id" === "u1" && $"timestamp" === ts).count() > 0
      while (!seen && System.currentTimeMillis < deadline) Thread.sleep(50)
      seen
    }
    mem.addData(msgs(2)) // u1 @ ts 300
    assert(awaitTs(300L), "u1@300 never reached the sink")
    Thread.sleep(1000) // >> TTL: u1's timer expires and an empty batch
    // fires it, removing the state (the removal itself emits nothing)
    mem.addData(msgs(0)) // u1 again, with an OLDER timestamp (100)
    // With state dropped, the re-arrival emits ts=100; surviving state
    // would have pinned the max at 300 (the NoTimeout test above).
    val dropped = awaitTs(100L)
    q.stop()
    assert(dropped, "stale state survived the TTL: ts=100 never emitted")
  }

  test("latestProfilesTws (state-v2) matches the keyed-state contract + native TTL") {
    implicit val sql = spark.sqlContext
    // state-v2 requires the RocksDB provider; restore the default after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[String]
      val profiles = BehaviorIngest.latestProfilesTws(
        BehaviorIngest.parse(mem.toDF()),
        ttl = Some(java.time.Duration.ofMillis(500)))
      val q = profiles.writeStream.outputMode("update")
        .format("memory").queryName("tws_profiles").start()
      // NOTE: with a TTL the query runs in ProcessingTime mode, where the
      // engine schedules batches continuously to advance the TTL clock —
      // `processAllAvailable` never latches (same as the
      // ProcessingTimeTimeout test above). Poll the sink with a deadline.
      def rows() = spark.table("tws_profiles")
        .as[(String, Seq[String], Long)].collect().toSeq
      def await(pred: => Boolean): Boolean = {
        val deadline = System.currentTimeMillis + 20000
        while (!pred && System.currentTimeMillis < deadline) Thread.sleep(50)
        pred
      }
      mem.addData(msgs(0), msgs(1)) // u1@100, u2@200
      assert(await(rows().toSet == Set(("u1", Seq("i1", "i2"), 100L),
        ("u2", Seq("i3"), 200L))), s"initial emits missing: ${rows()}")
      mem.addData(msgs(2)) // u1@300 — newer, emitted
      assert(await(rows().count(_._1 == "u1") == 2))
      mem.addData(msgs(0)) // u1@100 again — stale vs live state, dropped
      Thread.sleep(300) // < TTL; give the stale row a chance to (not) leak
      assert(rows().count(_._1 == "u1") == 2, "stale re-arrival leaked through")
      Thread.sleep(800) // > TTL: state expires (checked lazily on read)
      mem.addData(msgs(0)) // state gone -> the re-arrival is a fresh insert
      assert(await(rows().count(r => r._1 == "u1" && r._3 == 100L) == 2),
        "TTL-expired state should re-admit the old profile")
      q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("runningTopK (state-v2) converges to the batch graft_topk answer") {
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch1 = Seq(("u1", "a", 1.0), ("u1", "b", 3.0), ("u2", "x", 5.0))
      val batch2 = Seq(("u1", "c", 2.0), ("u1", "d", 0.5), ("u2", "x", 5.0),
        ("u1", "e", 3.0)) // u2 re-arrival duplicates x (multiset, like the agg)
      val mem = MemoryStream[(String, String, Double)]
      val updates = BehaviorIngest.runningTopK(
        mem.toDF().toDF("user_id", "item_id", "score")
          .as[BehaviorIngest.Scored], k = 3)
      val q = updates.writeStream.outputMode("update")
        .format("memory").queryName("tws_topk").start()
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val snaps = spark.table("tws_topk")
        .as[(String, Seq[String], Seq[Double])].collect().toSeq
      q.stop()
      // both users updated in both batches (u2's duplicate row changes
      // its top-k multiset exactly as the batch aggregate would keep it)
      assert(snaps.count(_._1 == "u1") == 2)
      assert(snaps.count(_._1 == "u2") == 2)
      val finalByUser = snaps.zipWithIndex.groupBy(_._1._1)
        .map { case (u, rs) => u -> rs.maxBy(_._2)._1 }
      // batch twin over ALL rows via the native aggregate
      val expect = (batch1 ++ batch2).toDF("user_id", "item_id", "score")
        .groupBy($"user_id")
        .agg(graft.functions.TopKAgg.topK(struct($"score", $"item_id"), 3).as("t"))
        .select($"user_id", transform($"t", x => x.getField("item_id")).as("items"),
          transform($"t", x => x.getField("score")).as("scores"))
        .as[(String, Seq[String], Seq[Double])].collect()
        .map(r => r._1 -> r).toMap
      assert(finalByUser("u1") == expect("u1"))
      assert(finalByUser("u2") == expect("u2"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("rollingFeaturesStream (state-v2) equals batch rollingFeatures") {
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // per-user event-time order across batches (the streaming contract);
      // batch 1 arrives shuffled WITHIN the batch to exercise the re-sort
      val batch1 = Seq(("u1", 3L, 30L, 6.0), ("u1", 1L, 10L, 2.0),
        ("u2", 4L, 15L, 1.0), ("u1", 2L, 20L, 4.0))
      val batch2 = Seq(("u1", 5L, 45L, 8.0), ("u2", 6L, 90L, 3.0))
      val mem = MemoryStream[(String, Long, Long, Double)]
      val feats = BehaviorIngest.rollingFeaturesStream(
        mem.toDF().toDF("user_id", "event_id", "ts", "value")
          .as[BehaviorIngest.FeatEvent], lastN = 2)
      val q = feats.writeStream.outputMode("append")
        .format("memory").queryName("tws_rollfeat").start()
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val got = spark.table("tws_rollfeat")
        .as[(Long, String, Option[Long], Long, Double, Double)]
        .collect().toSet
      q.stop()
      val expect = graft.ops.PrefixWindow.rollingFeatures(
          (batch1 ++ batch2).toDF("user_id", "event_id", "ts", "value"),
          "user_id", "ts", "value", lastN = 2, tieBreak = Seq($"event_id"))
        .select($"event_id", $"user_id", $"gap", $"roll_n", $"roll_sum",
          $"roll_mean")
        .as[(Long, String, Option[Long], Long, Double, Double)]
        .collect().toSet
      assert(got == expect)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("funnelStream (state-v2) final state equals the batch funnel") {
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // u1 full funnel split across batches; u2 purchases before
      // clicking (depth stalls at 2); u3 views only; u4 clicks with no
      // view (never enters). Batch 1 arrives shuffled within the batch.
      val batch1 = Seq(("u1", 2L, 20L, "click"), ("u1", 1L, 10L, "view"),
        ("u2", 4L, 10L, "view"), ("u2", 5L, 15L, "purchase"),
        ("u4", 9L, 5L, "click"))
      val batch2 = Seq(("u1", 3L, 30L, "purchase"), ("u2", 6L, 20L, "click"),
        ("u3", 7L, 12L, "view"), ("u2", 8L, 25L, "view"))
      val mem = MemoryStream[(String, Long, Long, String)]
      val rows = BehaviorIngest.funnelStream(
        mem.toDF().toDF("user_id", "event_id", "ts", "event_type")
          .as[BehaviorIngest.FunnelEvent])
      val q = rows.writeStream.outputMode("update")
        .format("memory").queryName("tws_funnel").start()
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      // update-mode memory sink keeps every emission: the LAST row per
      // user is the converged funnel state
      val got = spark.table("tws_funnel")
        .withColumn("__r", monotonically_increasing_id())
        .groupBy($"user_id").agg(max_by(
          struct($"t_view", $"t_click", $"t_purchase", $"depth"), $"__r")
          .as("s"))
        .select($"user_id", $"s.*")
        .as[(String, Option[Long], Option[Long], Option[Long], Long)]
        .collect().map(r => r._1 -> r).toMap
      q.stop()
      val batch = graft.ops.Behavior.funnel(
          (batch1 ++ batch2).toDF("user_id", "event_id", "ts", "event_type"),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .select($"user_id", $"t_view", $"t_click", $"t_purchase", $"depth")
        .as[(String, Option[Long], Option[Long], Option[Long], Long)]
        .collect().map(r => r._1 -> r).toMap
      assert(got == batch)
      assert(got("u1")._5 == 3L && got("u2")._5 == 2L &&
        got("u3")._5 == 1L && !got.contains("u4"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("cdcApplySink merges a change feed into the snapshot across batches") {
    implicit val sql = spark.sqlContext
    val tableDir = java.nio.file.Files.createTempDirectory("cdc_tbl").toString
    new java.io.File(tableDir).delete() // sink creates it on first batch
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_ck").toString
    val mem = MemoryStream[(Long, String, Double, Long, Boolean)]
    val q = BehaviorIngest.cdcApplySink(
        mem.toDF().toDF("k", "s", "v", "seq", "del"),
        "k", "seq", "del", tableDir, ckpt)
      .start()
    // batch 1: three inserts (one of them deleted-before-seen → dropped)
    mem.addData((1L, "a", 1.0, 10L, false), (2L, "b", 2.0, 11L, false),
      (9L, "x", 9.0, 12L, true))
    q.processAllAvailable()
    // batch 2: update k1, delete k2, insert k3, and TWO changes for k4
    // in one batch (seq 20 then 21 — latest must win)
    mem.addData((1L, "a2", 1.5, 20L, false), (2L, "b", 2.0, 21L, true),
      (3L, "c", 3.0, 22L, false),
      (4L, "d-old", 4.0, 20L, false), (4L, "d-new", 4.5, 21L, false))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(tableDir)
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a2", 1.5), (3L, "c", 3.0), (4L, "d-new", 4.5)))
  }

  test("partitionedTableSink restates only touched partitions on replay") {
    implicit val sql = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("ptsink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ptsink_ck").toString
    val mem = MemoryStream[String]
    val q = BehaviorIngest.partitionedTableSink(
      BehaviorIngest.parse(mem.toDF()), "user_id", out, ckpt).start()
    mem.addData(msgs(0), msgs(1)) // u1@100, u2@200 → partitions u1, u2
    q.processAllAvailable()
    def rows() = spark.read.parquet(out)
      .select($"user_id", $"timestamp").as[(String, Long)].collect().toSet
    assert(rows() == Set(("u1", 100L), ("u2", 200L)))
    mem.addData(msgs(2)) // u1@300 → dynamic overwrite of partition u1 ONLY
    q.processAllAvailable()
    q.stop()
    // u1's partition was RESTATED (100 replaced by 300); u2 untouched —
    // append mode would have kept both u1 rows
    assert(rows() == Set(("u1", 300L), ("u2", 200L)), rows().toString)
  }

  test("nearDupsPlanned: the band planner drives the streaming dedup") {
    implicit val sql = spark.sqlContext
    // at (16 hashes, j=0.5, target 80%) the plan is (8, 2) — pin that
    // the planned stream equals the explicit-bands stream on the same
    // input (same claims, same matches), i.e. the planner only CHOOSES,
    // the operator semantics are untouched
    assert(graft.llmops.Dedup.bandPlan(16, 0.5, 80) == ((8, 2)))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select($"doc_id".cast("long"), $"text").as[(Long, String)]
      .collect().take(200)
    def run(name: String,
        mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[
          graft.streaming.StreamingDedup.DupCandidate]): Set[(Long, Long, Double)] = {
      val mem = MemoryStream[(Long, String)]
      val q = mk(mem.toDF().toDF("doc_id", "text"))
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      mem.addData(docs: _*); q.processAllAvailable(); q.stop()
      spark.table(name).as[(Long, Long, Double)].collect().toSet
    }
    val planned = run("sdp_planned", df =>
      graft.streaming.StreamingDedup.nearDupsPlanned(df, "doc_id", "text",
        shingleN = 3, numHashes = 16, minJaccard = 0.5,
        targetDetectPct = 80, maxClaimants = 100000))
    val explicit = run("sdp_explicit", df =>
      graft.streaming.StreamingDedup.nearDups(df, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 8, minJaccard = 0.5,
        maxClaimants = 100000))
    assert(planned == explicit,
      s"planned ${planned.size} pairs vs explicit ${explicit.size}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("bandReplanIfUndershot as a foreachBatch maintenance caller: the decision flips mid-stream") {
    implicit val sql = spark.sqlContext
    import graft.llmops.Dedup
    // the policy's operational form — a periodic maintenance job over
    // the ingested-so-far corpus, run per micro-batch via foreachBatch
    // (exactly the caller the scaladoc's quiet-interval gate exists
    // for). Batch 1 ships only an exact-dup pair: the (16, 8) planned
    // layout detects it → KEEP. Batch 2 ships low-overlap docs whose
    // pairs qualify at the j ≥ 0.05 operating point but the banding
    // can't see → the SAME caller now decides REPLAN. Pins that the
    // decision is a pure function of corpus-so-far (no hidden state)
    // and flips exactly when the evidence does.
    val seen = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val corpus = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        corpus ++= batch.as[(Long, String)].collect()
        seen += Dedup.bandReplanIfUndershot(
          corpus.toSeq.toDF("doc_id", "text"), "doc_id", "text",
          shingleN = 3, numHashes = 16, bands = 8, minJaccardPct = 5,
          targetDetectPct = 80).collect().head
        ()
      }.start()
    mem.addData(
      (1L, "alpha beta gamma delta epsilon zeta eta theta kappa lambda"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta kappa lambda"))
    q.processAllAvailable()
    mem.addData(
      (3L, "x y z a1 a2 a3 a4 a5 a6 a7"),
      (4L, "x y z b1 b2 b3 b4 b5 b6 b7"))
    q.processAllAvailable()
    q.stop()
    assert(seen.size == 2)
    assert(seen(0).getLong(0) == 0L, "exact-dup-only corpus must KEEP")
    assert(seen(1).getLong(0) == 1L,
      "the undetected low-j bucket must flip the decision to REPLAN")
    assert(seen(1).getLong(1) == 2L, "remedy is LENGTHEN at 16 hashes")
  }

  test("signReplanIfUndershot as a foreachBatch maintenance caller: the decision flips mid-stream") {
    implicit val sql = spark.sqlContext
    import graft.llmops.SimSearch
    // the sign-LSH twin of the bandReplanIfUndershot caller test:
    // batch 1 ships only spread vectors with no qualifying pair — the
    // quiet-interval gate KEEPs (no evidence, never a vacuous fire).
    // Batch 2 ships a near-collinear family whose c ≈ 0.97 pairs the
    // single-band (16, 1) layout misses → the SAME caller decides
    // REPLAN with the ladder's k = 0 REBAND (16, 8 × 2). Pins that the
    // decision is a pure function of corpus-so-far.
    val seen = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val corpus = scala.collection.mutable.ArrayBuffer[(Long, Seq[Double])]()
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = mem.toDF().toDF("id", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        corpus ++= batch.as[(Long, Seq[Double])].collect()
        seen += SimSearch.signReplanIfUndershot(
          corpus.toSeq.toDF("id", "v"), "id", "v", dim = 4,
          nBits = 16, bands = 1, minCosinePct = 40,
          targetDetectPct = 80).collect().head
        ()
      }.start()
    mem.addData((10L, Seq(1.0, 0.0, 0.0, -1.0)),
      (11L, Seq(0.0, 1.0, -1.0, 0.0)), (12L, Seq(-1.0, 0.0, 0.0, -1.0)))
    q.processAllAvailable()
    mem.addData((0 to 4).map(i =>
      (i.toLong, Seq(1.0, 0.05 * i, 0.03 * i, 1.0))): _*)
    q.processAllAvailable()
    q.stop()
    assert(seen.size == 2)
    assert(seen(0).getLong(0) == 0L && seen(0).getLong(2) == 0L,
      "no qualifying pairs must KEEP via the quiet gate")
    assert(seen(1).getLong(0) == 1L && seen(1).getLong(1) == 1L,
      "the undetected collinear bucket must flip the decision to REBAND")
    assert(seen(1).getLong(9) == 8L, "remedy is 8 bands at 16 bits")
  }

  test("simHashWidenIfUndershot as a foreachBatch maintenance caller: the decision flips mid-stream") {
    implicit val sql = spark.sqlContext
    import graft.llmops.Dedup
    // batch 1: unique docs, no h ≤ 3 pair → quiet KEEP; batch 2: two
    // exact-dup triples under a cap of 1 — every pair's buckets are
    // starved, the SAME caller decides WIDEN (64 → 128)
    val seen = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val corpus = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        corpus ++= batch.as[(Long, String)].collect()
        seen += Dedup.simHashWidenIfUndershot(
          corpus.toSeq.toDF("doc_id", "text"), "doc_id", "text",
          maxHamming = 3, targetDetectPct = 99, maxBucket = 1)
          .collect().head
        ()
      }.start()
    mem.addData(
      (100L, "completely different words about seven red foxes jumping"),
      (101L, "unrelated prose concerning twelve blue whales swimming deep"))
    q.processAllAvailable()
    mem.addData(((0 to 2).map(i => (i.toLong, "alpha beta gamma delta")) ++
      (10 to 12).map(i => (i.toLong, "epsilon zeta eta theta iota"))): _*)
    q.processAllAvailable()
    q.stop()
    assert(seen.size == 2)
    assert(seen(0).getLong(0) == 0L && seen(0).getLong(1) == 0L,
      "no qualifying pairs must KEEP via the quiet gate")
    assert(seen(1).getLong(0) == 1L && seen(1).getLong(7) == 128L,
      "starved dup pairs must flip the decision to WIDEN")
  }

  test("IndexMonitor.recallFloorEachBatch: stream ≡ batch per micro-batch, the floor flips when the index goes stale") {
    implicit val sql = spark.sqlContext
    import graft.llmops.{IndexMaintenance, SimSearch}
    import graft.streaming.IndexMonitor
    // a serving-index snapshot that covers only HALF the corpus — the
    // staleness a continuously-enforced recall floor exists to catch.
    // Batch 1's queries hit the covered half (recall 100% ≥ floor 80
    // → above_floor 1); batch 2's queries' true neighbors live only in
    // the uncovered half (recall 0% → above_floor 0): the SAME caller
    // flips mid-stream, the replan-policy KEEP→ACT discipline applied
    // to the ENFORCE stage. Orthogonal basis vectors make every truth
    // assignment exact — no cosine knife edges.
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)), (2L, Seq(0.0, 1.0, 0.0, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0, 0.0)), (4L, Seq(0.0, 0.0, 0.0, 1.0)))
      .toDF("item_id", "vec")
    val serving = corpus.where($"item_id" <= 2L)
    def approxOf(q: org.apache.spark.sql.DataFrame) =
      SimSearch.bruteForceTopK(q, serving, "qid", "qv",
        "item_id", "vec", k = 1)
    def truthOf(q: org.apache.spark.sql.DataFrame) =
      SimSearch.bruteForceTopK(q, corpus, "qid", "qv",
        "item_id", "vec", k = 1)
        .select($"query_id", $"item_id")
    val keys = Seq("query_id", "item_id")
    val seen = scala.collection.mutable
      .ArrayBuffer[(Long, org.apache.spark.sql.Row)]()
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = IndexMonitor.recallFloorEachBatch(
        mem.toDF().toDF("qid", "qv"), approxOf, truthOf, keys, 80) {
      (bid, row) => seen += ((bid, row)); ()
    }.start()
    val b1 = Seq((10L, Seq(0.9, 0.1, 0.0, 0.0)),
      (11L, Seq(0.1, 0.9, 0.0, 0.0)))
    val b2 = Seq((20L, Seq(0.0, 0.0, 0.9, 0.1)),
      (21L, Seq(0.0, 0.0, 0.1, 0.9)))
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    assert(seen.size == 2)
    assert(seen(0)._2.getLong(0) == 2L && seen(0)._2.getLong(1) == 1L,
      s"covered-half queries must sit above the floor: ${seen(0)}")
    assert(seen(1)._2.getLong(0) == 2L && seen(1)._2.getLong(1) == 0L,
      s"uncovered-half queries must trip the floor: ${seen(1)}")
    // stream ≡ batch: each micro-batch's decision row IS the batch
    // recallFloor over exactly that batch's query slice — no hidden
    // state, no accumulation
    Seq(b1, b2).zipWithIndex.foreach { case (slice, i) =>
      val qs = slice.toDF("qid", "qv")
      val batchRow = IndexMaintenance.recallFloor(
        approxOf(qs), truthOf(qs), keys, 80).head()
      assert(batchRow == seen(i)._2,
        s"batch $i: stream ${seen(i)._2} vs batch $batchRow")
    }
  }

  test("streaming near-dup (state-v2) matches the batch incremental dedup") {
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = Tables.documents(spark, TestSpark.sf)
        .select($"doc_id".cast("long"), $"text").as[(Long, String)].collect()
      val base = docs.filter(_._1 % 2 == 0)
      val incoming = docs.filter(_._1 % 2 == 1)
      val mem = MemoryStream[(Long, String)]
      val out = graft.streaming.StreamingDedup.nearDups(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, minJaccard = 0.2,
        maxClaimants = 100000)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("sdedup").start()
      mem.addData(base: _*); q.processAllAvailable()
      mem.addData(incoming: _*); q.processAllAvailable()
      q.stop()
      val baseIds = base.map(_._1).toSet
      val newIds = incoming.map(_._1).toSet
      // batch-2 docs matched against batch-1 claims; intra-batch matches
      // (new×new, base×base) are out of the cross-set twin's scope
      val got = spark.table("sdedup").as[(Long, Long, Double)].collect()
        .toSet.filter(t => newIds(t._1) && baseIds(t._2))
      val expect = graft.llmops.Dedup.minHashMatchesAgainst(
        Tables.documents(spark, TestSpark.sf).where($"doc_id" % 2 === 1),
        Tables.documents(spark, TestSpark.sf).where($"doc_id" % 2 === 0),
        "doc_id", "text", shingleN = 3, numHashes = 16, bands = 4,
        minJaccard = 0.2, maxBucket = 100000)
        .as[(Long, Long, Double)].collect().toSet
      assert(expect.nonEmpty, "fixture produced no cross-side near-dups")
      assert(got == expect,
        s"stream ${got.size} pairs vs batch ${expect.size}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming near-dup TTL re-baselines: expired claims stop matching") {
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val text = "the quick brown fox jumps over the lazy dog tonight"
      val mem = MemoryStream[(Long, String)]
      val out = graft.streaming.StreamingDedup.nearDups(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, minJaccard = 0.9,
        // wide enough that batch scheduling latency can't eat the window
        ttl = Some(java.time.Duration.ofSeconds(3)))
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("sdedup_ttl").start()
      def rows() = spark.table("sdedup_ttl")
        .as[(Long, Long, Double)].collect().toSeq
      def await(pred: => Boolean): Boolean = {
        val deadline = System.currentTimeMillis + 20000
        while (!pred && System.currentTimeMillis < deadline) Thread.sleep(50)
        pred
      }
      mem.addData((1L, text)) // claims its band buckets
      mem.addData((2L, text)) // identical while claims are live → matches 1
      assert(await(rows().exists(r => r._1 == 2L && r._2 == 1L)),
        s"live claim did not match: ${rows()}")
      Thread.sleep(4500) // > TTL: doc 1 AND doc 2's claims expire
      mem.addData((3L, text)) // buckets empty again → no match, re-claims
      Thread.sleep(800) // give a wrong match a chance to (not) appear
      assert(rows().forall(_._1 != 3L),
        s"doc 3 matched an expired claim: ${rows()}")
      mem.addData((4L, text)) // matches the RE-claimed doc 3, not 1/2
      assert(await(rows().exists(r => r._1 == 4L && r._2 == 3L)),
        s"re-claim did not match: ${rows()}")
      assert(rows().forall(r => r._1 != 4L || r._2 == 3L),
        s"doc 4 matched an expired claim: ${rows()}")
      q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("kafkaSink wires the producer format, topic and payload contract (S4)") {
    val parsed = BehaviorIngest.parse(msgs.toDF("value"))
    // payload contract: key = user id, value = JSON of the full record
    val payload = BehaviorIngest.kafkaPayload(parsed)
    assert(payload.columns.toSeq == Seq("key", "value"))
    val u1Values = payload.where($"key" === "u1")
      .select($"value").as[String].collect().toSeq
    assert(u1Values.size == 2) // both u1 records, keyed by user id
    assert(u1Values.exists(v => v.contains(""""history_items":["i1","i2"]""")
      && v.contains(""""timestamp":100""")))
    assert(u1Values.forall(_.contains(""""user_id":"u1"""")))
    // writer wiring: format + broker/topic options, checked via the
    // writer's own state (no broker in this container to start against)
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[String]
    val w = BehaviorIngest.kafkaSink(BehaviorIngest.parse(mem.toDF()),
      servers = "broker:9092", topic = "user_behavior", checkpoint = "/tmp/ck")
    val fields = w.getClass.getDeclaredFields.map { f =>
      f.setAccessible(true); f.getName -> f.get(w)
    }.toMap
    assert(fields.values.exists(_ == "kafka"), "format not set to kafka")
    val opts = fields.values.collectFirst {
      case m: scala.collection.Map[_, _]
        if m.asInstanceOf[scala.collection.Map[String, String]]
          .exists(_._1.toLowerCase == "topic") =>
        m.asInstanceOf[scala.collection.Map[String, String]]
          .map { case (k, v) => k.toLowerCase -> v }
    }
    assert(opts.isDefined, "no options map with a topic on the writer")
    assert(opts.get("topic") == "user_behavior")
    assert(opts.get("kafka.bootstrap.servers") == "broker:9092")
  }

  test("recoverSwap heals both crash windows of the snapshot commit") {
    def mkTable(dir: java.io.File, marker: String, success: Boolean): Unit = {
      dir.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(dir, "part-00000").toPath, marker)
      if (success)
        java.nio.file.Files.writeString(
          new java.io.File(dir, "_SUCCESS").toPath, "")
    }
    def marker(dir: java.io.File): String =
      java.nio.file.Files.readString(
        new java.io.File(dir, "part-00000").toPath)
    val root = java.nio.file.Files.createTempDirectory("swap").toFile
    // window 1 — crash BETWEEN the two renames: live absent, .old holds
    // the prior snapshot, .next is _SUCCESS-complete (its merge already
    // happened) → roll FORWARD, the replayed batch must see .next
    val t1 = new java.io.File(root, "t1")
    mkTable(new java.io.File(root, "t1.next"), "merged", success = true)
    mkTable(new java.io.File(root, "t1.old"), "prior", success = true)
    BehaviorIngest.recoverSwap(t1.getPath)
    assert(t1.exists() && marker(t1) == "merged")
    // window 2 — live absent but .next incomplete (no _SUCCESS): the
    // merge never finished → roll BACK to the prior snapshot
    val t2 = new java.io.File(root, "t2")
    mkTable(new java.io.File(root, "t2.next"), "torn", success = false)
    mkTable(new java.io.File(root, "t2.old"), "prior", success = true)
    BehaviorIngest.recoverSwap(t2.getPath)
    assert(t2.exists() && marker(t2) == "prior")
    // healthy table: recoverSwap must be a no-op even with stale .next
    val t3 = new java.io.File(root, "t3")
    mkTable(t3, "live", success = true)
    mkTable(new java.io.File(root, "t3.next"), "stale", success = true)
    BehaviorIngest.recoverSwap(t3.getPath)
    assert(marker(t3) == "live")
  }

  // The one gap the container can't close by itself: a real-broker
  // round-trip. Runs only when the driver provides a broker via
  // KAFKA_BOOTSTRAP (and the spark-sql-kafka connector jar); otherwise
  // cancels with a clear reason. Produce goes through the SAME
  // (key, value) payload contract the streaming kafkaSink uses, consume
  // through the S1 source → S2 parse → S3 executor-side profile upsert.
  test("Kafka E2E: produce -> readStream -> profileSink round-trip " +
      "(S1/S3/S4, gated on KAFKA_BOOTSTRAP)") {
    assume(sys.env.contains("KAFKA_BOOTSTRAP"),
      "set KAFKA_BOOTSTRAP=<host:port> to run the real-broker round-trip")
    assume(
      try {
        Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
        true
      } catch { case _: ClassNotFoundException => false },
      "spark-sql-kafka connector jar not on the classpath")
    val servers = sys.env("KAFKA_BOOTSTRAP")
    val topic = s"graft_e2e_${java.util.UUID.randomUUID().toString.take(8)}"
    BehaviorIngest.kafkaPayload(BehaviorIngest.parse(msgs.toDF("value")))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .save()
    BehaviorIngest.InMemoryKV.clear()
    val ckpt = java.nio.file.Files.createTempDirectory("kafka_e2e").toString
    val q = BehaviorIngest.profileSink(
      BehaviorIngest.parse(
        BehaviorIngest.kafkaSource(spark, servers, topic,
          startingOffsets = "earliest")),
      BehaviorIngest.InMemoryKV, ckpt).start()
    try {
      // poll: broker publish→fetch latency is real, processAllAvailable
      // only drains offsets the source has already discovered
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (BehaviorIngest.InMemoryKV.data.size() < 3 &&
          System.nanoTime() < deadline) {
        q.processAllAvailable(); Thread.sleep(200)
      }
    } finally q.stop()
    val kv = BehaviorIngest.InMemoryKV.data
    assert(kv.containsKey("user_profile:u1:100"), s"missing u1:100 in $kv")
    assert(kv.containsKey("user_profile:u2:200"), s"missing u2:200 in $kv")
    assert(kv.containsKey("user_profile:u1:300"), s"missing u1:300 in $kv")
    assert(kv.get("user_profile:u2:200") == """["i3"]""")
  }

  test("observe counters report per-batch ingest metrics (A8)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(msgs: _*)
    val counted = BehaviorIngest.withCounters(
      BehaviorIngest.parse(mem.toDF()))
    val q = counted.writeStream.outputMode("append")
      .format("memory").queryName("obs_out").start()
    q.processAllAvailable()
    val metrics = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("ingest"))).lastOption
    q.stop()
    assert(metrics.isDefined)
    assert(metrics.get.getAs[Long]("events_consumed") == 3L)
    assert(metrics.get.getAs[Long]("items_seen") == 6L)
  }

  test("checkpoint restart resumes offsets without reprocessing (S13)") {
    val dir = java.nio.file.Files.createTempDirectory("stream_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt2").toString
    val puts = CountingKV.puts
    puts.clear()
    def writeFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        lines.mkString("\n").getBytes)
    def run(): Unit = {
      val src = spark.readStream.text(dir)
      val q = BehaviorIngest.profileSink(
        BehaviorIngest.parse(src, "value"), CountingKV, ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    writeFile("a.json", msgs.take(2))
    run()
    assert(puts.size() == 2)
    writeFile("b.json", msgs.drop(2))
    run() // restart from checkpoint: only the new file is processed
    val all = puts.toArray.map(_.toString).toSeq
    assert(all.size == 3, s"reprocessed or lost rows: $all")
    assert(all.distinct.size == 3)
  }

  test("Trigger.AvailableNow drains a file source and terminates (§2.12)") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("avnow_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("avnow_ckpt").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.json"),
      msgs.take(3).mkString("\n").getBytes)
    BehaviorIngest.InMemoryKV.clear()
    val q = BehaviorIngest.profileSink(
        BehaviorIngest.parse(spark.readStream.text(dir), "value"),
        BehaviorIngest.InMemoryKV, ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000), "AvailableNow query did not terminate")
    assert(BehaviorIngest.InMemoryKV.data.size() == 3)
  }

  test("watermarked dedup drops re-delivered (user, ts) events") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[String]
    val q = BehaviorIngest.dedupedEvents(
        BehaviorIngest.parse(mem.toDF()), watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    mem.addData(msgs(0), msgs(0), msgs(1)) // duplicate delivery of msg 0
    q.processAllAvailable()
    mem.addData(msgs(0)) // late re-delivery in a later batch
    q.processAllAvailable()
    val out = spark.table("dedup_out")
      .select($"user_id", $"timestamp").as[(String, Long)].collect()
    q.stop()
    assert(out.length == 2 && out.toSet == Set(("u1", 100L), ("u2", 200L)))
  }

  test("salted join equals plain join on skewed keys (scale tool)") {
    val big = Tables.events(spark, TestSpark.sf)
      .select($"user_id", $"event_id")
    val small = Tables.events(spark, TestSpark.sf)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
    val plain = big.join(small, "user_id")
      .select($"event_id", $"n").as[(Long, Long)].collect().toSet
    val salted = ops.Skew.saltedJoin(big, small, "user_id", 8)
      .select($"event_id", $"n").as[(Long, Long)].collect().toSet
    assert(salted == plain && salted.nonEmpty)
  }

  test("purchaseAttribution stream-stream join equals the batch twin (J6)") {
    implicit val sql = spark.sqlContext
    val ev = Tables.events(spark, TestSpark.sf)
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
    val views = ev.where($"event_type" === "view")
      .select($"user_id", $"ts_t".as("ts"))
    val purchases = ev.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_t".as("ts"))
    val batch = BehaviorIngest.purchaseAttribution(views, purchases)
      .select($"event_id", $"v_ts")
      .as[(Long, java.sql.Timestamp)].collect().toSet
    assert(batch.nonEmpty)

    val vMem = MemoryStream[(Long, java.sql.Timestamp)]
    val pMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    vMem.addData(views.as[(Long, java.sql.Timestamp)].collect().toSeq: _*)
    pMem.addData(purchases.as[(Long, Long, java.sql.Timestamp)].collect().toSeq: _*)
    val q = BehaviorIngest.purchaseAttribution(
        vMem.toDF().toDF("user_id", "ts"),
        pMem.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_out").start()
    q.processAllAvailable()
    val streamed = spark.table("attr_out").select($"event_id", $"v_ts")
      .as[(Long, java.sql.Timestamp)].collect().toSet
    q.stop()
    assert(streamed == batch)
  }

  test("seeded random fan-out is deterministic (X4)") {
    val users = Tables.events(spark, TestSpark.sf).select($"user_id").distinct()
    val a = ops.Sampling.randomFanout(users, 10, 42L).as[Long].collect().toSet
    val b = ops.Sampling.randomFanout(users, 10, 42L).as[Long].collect().toSet
    assert(a == b && a.size == 10)
    val c = ops.Sampling.randomFanout(users, 10, 7L).as[Long].collect().toSet
    assert(a != c)
  }

  test("session_window groups match manual gap-based sessionization") {
    val gapNs = 3600L * 1000 * 1000 * 1000
    val ev = Tables.events(spark, TestSpark.sf)
      .select($"user_id", $"ts")
    val got = ev
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
      .groupBy(session_window($"ts_t", "1 hour"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"n").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val manual = ev.as[(Long, Long)].collect().groupBy(_._1).map { case (u, rows) =>
      val ts = rows.map(_._2).sorted.toSeq
      val sizes = scala.collection.mutable.ArrayBuffer[Long]()
      var cur = 1L
      ts.zip(ts.drop(1)).foreach { case (a, b) =>
        if (b - a >= gapNs) { sizes += cur; cur = 1 } else cur += 1
      }
      sizes += cur
      u -> sizes.sorted.toSeq
    }
    assert(got == manual)
  }

  test("windowedActivity on a stream equals the batch plan") {
    implicit val sql = spark.sqlContext
    val ev = Tables.events(spark, TestSpark.sf)
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
      .select($"user_id", $"ts_t", ($"event_id" % 7).as("item"))
    val batch = BehaviorIngest.windowedActivity(ev, "ts_t", "1 hour", "1 hour",
        itemCol = Some("item"))
      .select($"w_start", $"user_id", $"n_events", $"n_distinct_items")
      .as[(java.sql.Timestamp, Long, Long, Long)].collect().toSet

    val mem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    mem.addData(ev.as[(Long, java.sql.Timestamp, Long)].collect().toSeq: _*)
    val sdf = mem.toDF().toDF("user_id", "ts_t", "item")
    val q = BehaviorIngest.windowedActivity(sdf, "ts_t", "1 hour", "1 hour",
        watermark = "0 seconds", itemCol = Some("item"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("win_counts").start()
    q.processAllAvailable()
    val streamed = spark.table("win_counts")
      .select($"w_start", $"user_id", $"n_events", $"n_distinct_items")
      .as[(java.sql.Timestamp, Long, Long, Long)].collect().toSet
    q.stop()
    assert(streamed == batch)
    // HLL++ is near-exact at these tiny cardinalities (≤ 7 distinct);
    // sanity-pin the estimate against true distinct within ±1
    val exact = ev.groupBy(window($"ts_t", "1 hour"), $"user_id")
      .agg(countDistinct($"item").as("d"))
      .select($"window.start", $"user_id", $"d")
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(batch.forall(t => math.abs(t._4 - exact((t._1, t._2))) <= 1))
  }

  test("streaming next-event predictions equal the batch m14 rows") {
    implicit val sql = spark.sqlContext
    val ev = Tables.events(spark, TestSpark.sf)
      .select($"user_id", $"ts", $"event_id", $"event_type")
    val trans = ops.Behavior.transitionTopK(ev, "user_id", "ts",
      "event_id", "event_type", 3)
    val batch = SparkEntry.queries("m14_markov_next")(spark, TestSpark.sf)
      .as[(Long, String, String, Double, Long)].collect().toSet
    assert(batch.nonEmpty)

    val mem = MemoryStream[(Long, String, Long, Long)]
    mem.addData(ev.select($"user_id", $"event_type", $"ts", $"event_id")
      .as[(Long, String, Long, Long)].collect().toSeq: _*)
    val q = BehaviorIngest.nextEventPredictions(
        mem.toDF().toDF("user_id", "event_type", "ts", "event_id"), trans)
      .writeStream.outputMode("update").format("memory")
      .queryName("next_pred").start()
    q.processAllAvailable()
    val streamed = spark.table("next_pred")
      .select($"user_id", $"cur_type", $"next_type",
        round($"p", 6).as("p"), $"rank".cast("long"))
      .as[(Long, String, String, Double, Long)].collect().toSet
    q.stop()
    assert(streamed == batch)
  }
}
