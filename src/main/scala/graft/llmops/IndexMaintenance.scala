package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The single operational entry point for approximate-index upkeep —
  * the plan → audit → act → enforce lifecycle that every banded/
  * clustered/quantized index family in this engine shares. Each family
  * implements the same four stages; this facade names them in one
  * place so an operator of a 100 TB deployment can find the whole
  * story without reading five modules:
  *
  * | Family | PLAN (layout math) | AUDIT (measure detection) | ACT (1-row decision) | Streaming face |
  * |---|---|---|---|---|
  * | MinHash-LSH bands | [[Dedup.bandPlan]] / `bandPlanDf` (d31, d33) | detection per Jaccard bucket inside the ACT query (d33) | [[minhashReplan]] (d34 REPLAN / d35 KEEP / d36 REBAND) | foreachBatch caller (StreamingSpec) + [[graft.streaming.StreamingDedup.nearDupsPlanned]] |
  * | Sign-LSH bands | [[SimSearch.signBandPlan]] | [[SimSearch.signBandPlanAudit]] (d37) | [[signReplan]] (d39 REBAND / d40 KEEP) | foreachBatch caller (StreamingSpec) |
  * | SimHash width | 4-lane pigeonhole by construction | recall audit (d38) | [[simhashWiden]] (d41 WIDEN / d42 KEEP) | foreachBatch caller (StreamingSpec) |
  * | IVF cells | [[SimSearch.autoCells]] (sim15) | [[SimSearch.ivfDriftAudit]] (sim19) | [[ivfRefit]] (sim22 REFIT / sim23 KEEP) | [[graft.streaming.IndexMonitor.cellDriftStream]] (sim26 twin) |
  * | PQ codebooks | md5-pull / [[graft.functions.VectorOps.pqTrain]] | distortion compare (v4/v9) | [[pqRefit]] (sim24 REFIT / sim25 KEEP) | [[graft.streaming.IndexMonitor.pqDistortionStream]] |
  *
  * ENFORCE — the stage this facade adds a shared core for — is the
  * recall floor: an integer-math guarantee that the approximate result
  * still covers ≥ floorPct of an oracle-replayable truth set
  * (registered: sim27 LSH, sim28 IVF, sim29 k-means auto-probe, d43
  * fast-MinHash, d44 fast-SimHash; streaming:
  * [[graft.streaming.IndexMonitor.recallFloorEachBatch]]).
  *
  * Shared decision contract (what makes the matrix operable): every
  * ACT method returns a bounded frame (1 row, or ≤ k codebook /
  * ≤ nCells centroid rows) whose first column is the 0/1 act flag,
  * computed by pure integer arithmetic on exact counts — no float
  * knife edges, so a SQL oracle replays the decision bit-exactly and a
  * foreachBatch maintenance caller can branch on `getLong(0)` without
  * parsing. Quiet intervals (no evidence rows) are always KEEP — a
  * maintenance job that fires on silence is a defect (the r11 vacuous
  * `0 ≥ 0` class). Acting never costs more than fitting did: replan
  * remedies are driver-side ladder math; refits re-pull only the
  * ≤ 4096 index-source ROWS.
  *
  * These methods DELEGATE to the family modules (no behavior change —
  * the registered queries and their oracles are the ground truth);
  * they exist so the operational surface is one import. */
object IndexMaintenance {

  /** MinHash-LSH band family ACT: replan the (numHashes, bands) layout
    * when any Jaccard bucket of exact pairs undershoots the detection
    * target. Delegates to [[Dedup.bandReplanIfUndershot]] (d34/d35/d36;
    * ladder: [[Dedup.bandReplanLadder]]). */
  def minhashReplan(docs: DataFrame, id: String, text: String,
      shingleN: Int, numHashes: Int, bands: Int, minJaccardPct: Int,
      targetDetectPct: Int, maxBucket: Int = 1000,
      maxDoublings: Int = 6): DataFrame =
    Dedup.bandReplanIfUndershot(docs, id, text, shingleN, numHashes,
      bands, minJaccardPct, targetDetectPct, maxBucket, maxDoublings)

  /** Sign-LSH band family ACT: reband/widen the (nBits, bands) layout
    * when any cosine bucket of exact pairs undershoots. Delegates to
    * [[SimSearch.signReplanIfUndershot]] (d39/d40; ladder:
    * [[SimSearch.signReplanLadder]]). */
  def signReplan(embs: DataFrame, id: String, vec: String, dim: Int,
      nBits: Int, bands: Int, minCosinePct: Int, targetDetectPct: Int,
      maxBucket: Int = 2000, maxDoublings: Int = 6): DataFrame =
    SimSearch.signReplanIfUndershot(embs, id, vec, dim, nBits, bands,
      minCosinePct, targetDetectPct, maxBucket, maxDoublings)

  /** SimHash width family ACT: mandate the 128-bit fingerprint when
    * the 64-bit layout's capped buckets eat pigeonhole-qualifying
    * pairs. Delegates to [[Dedup.simHashWidenIfUndershot]] (d41/d42). */
  def simhashWiden(docs: DataFrame, id: String, text: String,
      maxHamming: Int = 3, targetDetectPct: Int = 99,
      targetBucketSize: Long = 50L, maxBucket: Int = 1000,
      precountedN: Option[Long] = None): DataFrame =
    Dedup.simHashWidenIfUndershot(docs, id, text, maxHamming,
      targetDetectPct, targetBucketSize, maxBucket, precountedN)

  /** IVF cell family ACT: refit the serving centroids on incoming-load
    * skew or assignment-cosine drift. Delegates to
    * [[SimSearch.refitIfDrifted]] (sim22/sim23). */
  def ivfRefit(fit: DataFrame, incoming: DataFrame, id: String,
      vec: String, targetCellSize: Long, skewFactor: Int = 4,
      driftMilli: Int = 50, minCellN: Long = 5L): DataFrame =
    SimSearch.refitIfDrifted(fit, incoming, id, vec, targetCellSize,
      skewFactor, driftMilli, minCellN)

  /** PQ codebook family ACT: re-pull the codebook source when the
    * incoming side quantizes ≥ ratioPct/100 worse than the fit side.
    * Delegates to [[SimSearch.pqRefitIfDistorted]] (sim24/sim25). */
  def pqRefit(fit: DataFrame, incoming: DataFrame, id: String,
      vec: String, dim: Int, m: Int, k: Int,
      ratioPct: Int = 150): DataFrame =
    SimSearch.pqRefitIfDistorted(fit, incoming, id, vec, dim, m, k,
      ratioPct)

  /** ENFORCE: one-row recall floor of an approximate result against an
    * oracle-replayable truth set — `(n_truth, above_floor)` with
    * above_floor = 1 iff `|approx ∩ truth| · 100 ≥ floorPct ·
    * |n_truth|`. Integer comparison on exact counts — no float knife
    * edge; set the floor well below the measured recall so only a real
    * regression flips it (registered floors: sim27 10%, sim28 60%,
    * sim29 80%, d43 80%, d44 40%).
    *
    * One left join, one aggregate — the truth subplan (often a brute
    * top-k or an inverted-index join) is evaluated ONCE; a count+semi
    * pair would run it twice (Catalyst does not CSE across joins). */
  def recallFloor(approx: DataFrame, truth: DataFrame,
      keys: Seq[String], floorPct: Int): DataFrame = {
    require(floorPct >= 0 && floorPct <= 100,
      s"floorPct is a percent, got $floorPct")
    truth.join(approx.select(keys.map(col): _*).distinct()
        .withColumn("__hit", lit(1)), keys, "left")
      .agg(count(lit(1)).as("n_truth"), count(col("__hit")).as("__h"))
      .select(col("n_truth"),
        when(col("__h") * 100 >= lit(floorPct.toLong) * col("n_truth"),
          1L).otherwise(0L).as("above_floor"))
  }
}
