package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{BehaviorIngest, IndexMonitor, StreamingDedup}

/** Streaming scale-evidence harness (round-9: the state-v2 operators'
  * ScaleSmoke). The batch families carry 1x/10x/100x/1000x rows; the
  * stateful streaming operators — [[StreamingDedup.nearDups]],
  * [[BehaviorIngest.rollingFeaturesStream]],
  * [[BehaviorIngest.funnelStream]] — had none. This main feeds
  * MemoryStream micro-batches at K ∈ {1, 10, 100} × the base key count
  * through each operator on the RocksDB state store and reports, per
  * scale: mean/max per-batch wall latency, rows/s, and the state-store
  * row count from the final query progress — the numbers that bound a
  * production deployment (state growth with keys, per-batch cost with
  * input rate).
  *
  * Data is synthesized deterministically (no Date.now/random — formulas
  * of (user, batch) only), one event per key per batch so input rows
  * scale linearly with K and per-key state stays constant-shaped: the
  * same "more users, more docs" growth model as ScaleSmoke.
  *
  * Usage: runMain graft.StreamScale [baseKeys] [nBatches] [factors]
  */
object StreamScale {
  def main(args: Array[String]): Unit = {
    SpillJanitor.sweep()
    val baseKeys = args.headOption.map(_.toInt).getOrElse(1000)
    val nBatches = if (args.length > 1) args(1).toInt else 5
    val factors = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq
      else Seq(1, 10, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    /** Drive `batches` through `q`'s source by calling `feed` per batch;
      * returns (meanBatchSec, maxBatchSec, stateRows, totalRows). */
    def drive(q: StreamingQuery, feed: Int => Long): (Double, Double, Long, Long) = {
      var total = 0L
      val times = (0 until nBatches).map { b =>
        val n = feed(b)
        total += n
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      val stateRows = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      q.stop()
      (times.sum / times.size, times.max, stateRows, total)
    }

    def report(op: String, k: Int, keys: Int,
        r: (Double, Double, Long, Long)): String = {
      val (mean, max, state, total) = r
      val row = f"STREAMSCALE $op%-14s ${k}x keys=$keys%8d rows=$total%9d " +
        f"batch_mean=$mean%6.2f s batch_max=$max%6.2f s " +
        f"rows_per_s=${total / (mean * nBatches)}%9.0f state_rows=$state%9d"
      println(row)
      f""""$op/${k}x":{"keys":$keys,"rows":$total,"batch_mean":$mean%.2f,"batch_max":$max%.2f,"state_rows":$state}"""
    }

    val out = Seq.newBuilder[String]
    factors.foreach { k =>
      val keys = baseKeys * k

      // --- rollingFeaturesStream: one event per user per batch ---------
      locally {
        val mem = MemoryStream[(String, Long, Long, Double)]
        val q = BehaviorIngest.rollingFeaturesStream(
            mem.toDF().toDF("user_id", "event_id", "ts", "value")
              .as[BehaviorIngest.FeatEvent], lastN = 8)
          .writeStream.outputMode("append")
          .format("noop").queryName(s"ss_roll_$k").start()
        out += report("rolling_feat", k, keys, drive(q, { b =>
          mem.addData((0 until keys).map(u => (s"u$u",
            b.toLong * keys + u, b.toLong * 100 + u % 97,
            ((u * 31 + b * 7) % 1000) / 10.0)))
          keys.toLong
        }))
      }

      // --- funnelStream: view/click/purchase cycling per user ----------
      locally {
        val types = Array("view", "click", "purchase")
        val mem = MemoryStream[(String, Long, Long, String)]
        val q = BehaviorIngest.funnelStream(
            mem.toDF().toDF("user_id", "event_id", "ts", "event_type")
              .as[BehaviorIngest.FunnelEvent])
          .writeStream.outputMode("update")
          .format("noop").queryName(s"ss_funnel_$k").start()
        out += report("funnel", k, keys, drive(q, { b =>
          mem.addData((0 until keys).map(u => (s"u$u",
            b.toLong * keys + u, b.toLong * 100 + u % 89,
            types((u + b) % 3))))
          keys.toLong
        }))
      }

      // --- cellDriftStream: windowed per-cell ingest monitor ----------
      // (64 fit-time centroids; state = per-(window, cell) rollup only,
      // never the stream's volume — the rate should track the O(1)-state
      // ops, not nearDups)
      locally {
        val cents = Seq.tabulate(64)(c =>
          Seq.tabulate(16)(i => ((c * 31 + i * 7) % 100) / 100.0))
        val mem = MemoryStream[(Long, Seq[Float], Long)]
        val src = mem.toDF().toDF("id", "emb", "sec")
          .withColumn("ts", timestamp_seconds(col("sec")))
        val q = IndexMonitor.cellDriftStream(src, "emb", "ts", cents,
            None, "1 minute", "0 seconds")
          .writeStream.outputMode("update").format("noop")
          .queryName(s"ss_drift_$k").start()
        out += report("cell_drift", k, keys, drive(q, { b =>
          mem.addData((0 until keys).map(u => (b.toLong * keys + u,
            Seq.tabulate(16)(i => ((u * 13 + i * 7 + b) % 1000) / 1000.0f),
            b.toLong * 60 + u % 50)))
          keys.toLong
        }))
      }

      // --- cellDriftStream PRODUCTION SHAPE: fitStats joined, update ---
      // mode — the post-aggregation stream-static drift join under
      // watermark eviction (the shape a real monitor deploys; the
      // fitStats-less row above isolates the windowed agg itself). The
      // join is a 64-row broadcast onto the ≤ (windows × cells) rollup,
      // so the rate should be indistinguishable from cell_drift.
      locally {
        val cents = Seq.tabulate(64)(c =>
          Seq.tabulate(16)(i => ((c * 31 + i * 7) % 100) / 100.0))
        val fitStats = spark.createDataFrame(
          (0 until 64).map(c => (c.toLong, 100L + c, 0.9 - c * 0.001)))
          .toDF("cell", "n_fit", "mean_cos_fit")
        val mem = MemoryStream[(Long, Seq[Float], Long)]
        val src = mem.toDF().toDF("id", "emb", "sec")
          .withColumn("ts", timestamp_seconds(col("sec")))
        val q = IndexMonitor.cellDriftStream(src, "emb", "ts", cents,
            Some(fitStats), "1 minute", "0 seconds")
          .writeStream.outputMode("update").format("noop")
          .queryName(s"ss_drift_fit_$k").start()
        out += report("cell_drift_fit", k, keys, drive(q, { b =>
          mem.addData((0 until keys).map(u => (b.toLong * keys + u,
            Seq.tabulate(16)(i => ((u * 13 + i * 7 + b) % 1000) / 1000.0f),
            b.toLong * 60 + u % 50)))
          keys.toLong
        }))
      }

      // --- nearDups: one doc per "family slot" per batch; vocabulary ---
      // scales with K so band buckets keep constant expected occupancy
      // (the d24 growth model), and every 10th doc repeats its family's
      // batch-0 text to keep a constant true-dup density for the
      // match-then-claim path
      def dedupText(slot: Int, b: Int): String =
        (0 until 20).map(j => s"w${(slot * 13 + b * 101 + j * 7) % (50 * k)}")
          .mkString(" ")
      // MemoryStream delivers each addData call as ONE input partition,
      // so a single 100k-row addData serializes the pre-shuffle
      // signature stage onto one core (round-10 decomposition: 9.1 of a
      // 10.2 s batch) — a harness artifact, not an operator property (a
      // production topic is partitioned). A downstream repartition does
      // NOT fix it: the optimizer pushes the signature projection BELOW
      // the shuffle, back onto the single source partition (measured:
      // 3.65 s — exactly the serial md5 cost — with only the post-sig
      // stages parallelized). Feed one addData per chunk instead, the
      // shape a multi-partition source actually delivers.
      def dedupFeed(mem: MemoryStream[(Long, String)])(b: Int): Long = {
        val rows = (0 until keys).map { s =>
          val body =
            if (b > 0 && s % 10 == 0) dedupText(s, 0) else dedupText(s, b)
          (b.toLong * keys + s, body)
        }
        val nChunks = math.min(cpus.toInt, math.max(1, keys / 64))
        rows.grouped((keys + nChunks - 1) / nChunks)
          .foreach(chunk => mem.addData(chunk))
        keys.toLong
      }
      def dedupSrc(mem: MemoryStream[(Long, String)]) =
        mem.toDF().toDF("doc_id", "text")
      locally {
        val mem = MemoryStream[(Long, String)]
        val q = StreamingDedup.nearDups(
            dedupSrc(mem), "doc_id", "text",
            shingleN = 3, numHashes = 16, bands = 4, minJaccard = 0.5)
          .writeStream.outputMode("append")
          .format("noop").queryName(s"ss_dedup_$k").start()
        out += report("near_dups", k, keys, drive(q, dedupFeed(mem)))
      }

      // --- nearDups cost decomposition (round-10 verdict item 4): the —
      // same feed through (a) the stateless prefix only (signature +
      // band explode, no shuffle, no state) and (b) prefix + groupByKey
      // shuffle + a state-v2 processor that touches NO state — so
      // full − (b) = RocksDB get/put + match cost, (b) − (a) = shuffle
      // + transformWithState harness, (a) = MinHash/banding CPU.
      locally {
        val mem = MemoryStream[(Long, String)]
        val q = StreamingDedup.bandRows(
            dedupSrc(mem), "doc_id", "text",
            shingleN = 3, numHashes = 16, bands = 4)
          .writeStream.outputMode("append")
          .format("noop").queryName(s"ss_dedup_sig_$k").start()
        out += report("near_dups_sig", k, keys, drive(q, dedupFeed(mem)))
      }
      locally {
        import org.apache.spark.sql.Encoders
        import org.apache.spark.sql.streaming.{OutputMode => OM, StatefulProcessor, TimeMode, TimerValues}
        val mem = MemoryStream[(Long, String)]
        val noState = new StatefulProcessor[String,
            StreamingDedup.BandRow, StreamingDedup.DupCandidate] {
          override def init(outputMode: OM, timeMode: TimeMode): Unit = ()
          override def handleInputRows(key: String,
              rows: Iterator[StreamingDedup.BandRow],
              tv: TimerValues): Iterator[StreamingDedup.DupCandidate] = {
            rows.foreach(_ => ()) // consume, touch no state
            Iterator.empty
          }
        }
        val q = StreamingDedup.bandRows(
            dedupSrc(mem), "doc_id", "text",
            shingleN = 3, numHashes = 16, bands = 4)
          .groupByKey(_.key)
          .transformWithState(noState, TimeMode.None(), OM.Append(),
            Encoders.product[StreamingDedup.DupCandidate])
          .writeStream.outputMode("append")
          .format("noop").queryName(s"ss_dedup_shuf_$k").start()
        out += report("near_dups_shuf", k, keys, drive(q, dedupFeed(mem)))
      }
    }
    println(s"""{"metric":"stream_scale","base_keys":$baseKeys,"n_batches":$nBatches,"ops":{${out.result().mkString(",")}}}""")
    spark.stop()
  }
}
