package graft.recall

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

/** Executor-side batch forward passes for the reference's two neural
  * rankers — DIN (`eval_online/main/din.py:5-129`) and RankNet
  * (`eval_online/main/ranknet.py:5-105`) — in eval mode (dropout =
  * identity, BatchNorm1d on running statistics).
  *
  * Weights are broadcast once per job; scoring runs inside
  * [[ExternalScorer.batched]] (the reference's `/infer_batch/` boundary,
  * `serve-system/inference.py:30-48`), so the driver never touches a row
  * and the only non-codegen region is the model kernel itself — exactly
  * the shape a JNI/ONNX runtime would occupy in production.
  *
  * Every arithmetic step is written in a fixed, portable evaluation order
  * (ascending-index sequential sums, explicit parenthesization) so the
  * same forward can be replicated bit-for-bit in ANSI SQL for the DuckDB
  * oracle (`m5_din_forward` / `m6_ranknet_forward` / `m7_neural_cascade`):
  *   - Linear: y_o = (Σ_i w_oi · x_i) + b_o, i ascending
  *   - BatchNorm eval: y = g·(x − m) / sqrt(v + eps) + β
  *   - Attention: s_t = w_v · relu(W_q q + W_k k_t); stable softmax
  *     (max-subtracted) over the REAL history length — identical to the
  *     reference's mask-to−1e9 form because exp(−1e9 − m) underflows to
  *     exactly 0.0
  *   - Output: sigmoid for DIN (din.py:129), raw score for RankNet
  *     (ranknet.py:58)
  */
object NeuralForward {

  /** Dense layer, weights row-major `[out][in]`, bias `[out]`. */
  final case class Linear(w: Array[Array[Double]], b: Array[Double]) {
    def out: Int = w.length
    def in: Int = if (w.isEmpty) 0 else w(0).length
  }

  /** BatchNorm1d in eval mode: y = gamma·(x−mean)/sqrt(var+eps)+beta. */
  final case class BatchNorm(gamma: Array[Double], beta: Array[Double],
      mean: Array[Double], variance: Array[Double], eps: Double = 1e-5)

  /** One MLP block: Linear → BatchNorm → ReLU (→ Dropout = identity). */
  final case class MlpBlock(lin: Linear, bn: BatchNorm)

  /** DIN parameter set (din.py:66-88): shared item-embedding Linear,
    * bias-free attention projections, MLP trunk, scalar output head. */
  final case class DinWeights(itemEmbed: Linear,
      wQuery: Array[Array[Double]], wKey: Array[Array[Double]],
      wValue: Array[Double], mlp: Seq[MlpBlock], outLayer: Linear)

  /** RankNet parameter set (ranknet.py:10-32). */
  final case class RankNetWeights(userEmbed: Linear, itemEmbed: Linear,
      mlp: Seq[MlpBlock], outLayer: Linear)

  // ---- kernel arithmetic (fixed evaluation order) ----

  /** y = Wx + b, sequential ascending-index sums. */
  def matvec(l: Linear, x: Array[Double]): Array[Double] = {
    val y = new Array[Double](l.out)
    var o = 0
    while (o < l.out) {
      val row = l.w(o)
      var acc = 0.0
      var i = 0
      while (i < row.length) { acc += row(i) * x(i); i += 1 }
      y(o) = acc + l.b(o)
      o += 1
    }
    y
  }

  /** y = Wx (bias-free attention projections, din.py:16-18). */
  def matvecNoBias(w: Array[Array[Double]], x: Array[Double]): Array[Double] = {
    val y = new Array[Double](w.length)
    var o = 0
    while (o < w.length) {
      val row = w(o)
      var acc = 0.0
      var i = 0
      while (i < row.length) { acc += row(i) * x(i); i += 1 }
      y(o) = acc
      o += 1
    }
    y
  }

  private def bnRelu(bn: BatchNorm, x: Array[Double]): Array[Double] = {
    val y = new Array[Double](x.length)
    var i = 0
    while (i < x.length) {
      val v = (bn.gamma(i) * (x(i) - bn.mean(i))) /
        math.sqrt(bn.variance(i) + bn.eps) + bn.beta(i)
      y(i) = if (v > 0.0) v else 0.0
      i += 1
    }
    y
  }

  private def runMlp(blocks: Seq[MlpBlock], x0: Array[Double]): Array[Double] =
    blocks.foldLeft(x0)((x, blk) => bnRelu(blk.bn, matvec(blk.lin, x)))

  /** DIN forward (din.py:91-129) over a variable-length real history —
    * identical arithmetic to the padded+masked reference because masked
    * positions contribute exp(−1e9−max) = 0 to the softmax and 0 to the
    * masked average. Returns sigmoid(logit). */
  def dinForward(wts: DinWeights, candFeat: Array[Double],
      histFeats: Array[Array[Double]]): Double = {
    val candEmb = matvec(wts.itemEmbed, candFeat)
    val n = histFeats.length
    require(n > 0, "DIN needs a non-empty history (reference divides by keys_length)")
    val histEmb = new Array[Array[Double]](n)
    var t = 0
    while (t < n) { histEmb(t) = matvec(wts.itemEmbed, histFeats(t)); t += 1 }
    // attention scores s_t = w_v · relu(W_q·cand + W_k·hist_t)  (din.py:39-46)
    val qh = matvecNoBias(wts.wQuery, candEmb)
    val scores = new Array[Double](n)
    t = 0
    while (t < n) {
      val kh = matvecNoBias(wts.wKey, histEmb(t))
      var acc = 0.0
      var a = 0
      while (a < qh.length) {
        val h = qh(a) + kh(a)
        if (h > 0.0) acc += wts.wValue(a) * h
        a += 1
      }
      scores(t) = acc
      t += 1
    }
    // stable softmax over the real length (din.py:54)
    var mx = scores(0)
    t = 1
    while (t < n) { if (scores(t) > mx) mx = scores(t); t += 1 }
    var wsum = 0.0
    val ex = new Array[Double](n)
    t = 0
    while (t < n) { ex(t) = math.exp(scores(t) - mx); wsum += ex(t); t += 1 }
    // interest = Σ_t a_t·hist_t; avg = (Σ_t hist_t)/n  (din.py:57,116-118)
    val e = wts.itemEmbed.out
    val interest = new Array[Double](e)
    val avg = new Array[Double](e)
    t = 0
    while (t < n) {
      val at = ex(t) / wsum
      var d = 0
      while (d < e) {
        interest(d) += at * histEmb(t)(d)
        avg(d) += histEmb(t)(d)
        d += 1
      }
      t += 1
    }
    var d = 0
    while (d < e) { avg(d) /= n.toDouble; d += 1 }
    // concat [interest | candidate | avg-history]  (din.py:121)
    val x0 = new Array[Double](3 * e)
    System.arraycopy(interest, 0, x0, 0, e)
    System.arraycopy(candEmb, 0, x0, e, e)
    System.arraycopy(avg, 0, x0, 2 * e, e)
    val logit = matvec(wts.outLayer, runMlp(wts.mlp, x0))(0)
    1.0 / (1.0 + math.exp(-logit))
  }

  /** RankNet forward (ranknet.py:34-58): concat embeds → MLP → raw score
    * (no sigmoid — it's a pairwise-margin ranker). */
  def rankNetForward(wts: RankNetWeights, userFeat: Array[Double],
      itemFeat: Array[Double]): Double = {
    val ue = matvec(wts.userEmbed, userFeat)
    val ie = matvec(wts.itemEmbed, itemFeat)
    val x0 = new Array[Double](ue.length + ie.length)
    System.arraycopy(ue, 0, x0, 0, ue.length)
    System.arraycopy(ie, 0, x0, ue.length, ie.length)
    matvec(wts.outLayer, runMlp(wts.mlp, x0))(0)
  }

  // ---- portable fixture weights ----
  // Pure-integer formulas over 1-based (layer-tag, out, in) indices, then
  // one double division — replicable exactly in any SQL engine, so the
  // DuckDB oracle can regenerate the identical parameter set with
  // generate_series + the same modular expressions.

  def fxW(tag: Int, o: Int, i: Int): Double = ((o * 31 + i * 17 + tag * 7) % 19 - 9) / 20.0
  def fxB(tag: Int, o: Int): Double = ((o * 13 + tag * 5) % 11 - 5) / 20.0
  def fxGamma(tag: Int, o: Int): Double = 1.0 + ((o * 3 + tag) % 5) / 10.0
  def fxBeta(tag: Int, o: Int): Double = ((o * 7 + tag) % 9 - 4) / 10.0
  def fxMean(tag: Int, o: Int): Double = ((o * 11 + tag) % 7 - 3) / 10.0
  def fxVar(tag: Int, o: Int): Double = 1.0 + ((o * 5 + tag) % 4) / 10.0

  def fixtureLinear(tag: Int, out: Int, in: Int): Linear = Linear(
    Array.tabulate(out, in)((o, i) => fxW(tag, o + 1, i + 1)),
    Array.tabulate(out)(o => fxB(tag, o + 1)))

  def fixtureMatrix(tag: Int, out: Int, in: Int): Array[Array[Double]] =
    Array.tabulate(out, in)((o, i) => fxW(tag, o + 1, i + 1))

  def fixtureBn(tag: Int, n: Int): BatchNorm = BatchNorm(
    Array.tabulate(n)(o => fxGamma(tag, o + 1)),
    Array.tabulate(n)(o => fxBeta(tag, o + 1)),
    Array.tabulate(n)(o => fxMean(tag, o + 1)),
    Array.tabulate(n)(o => fxVar(tag, o + 1)))

  /** Deterministic DIN fixture: featDim→embDim embed, attDim attention,
    * `hidden` MLP trunk. Layer tags 1-9 keep every parameter distinct. */
  def fixtureDin(featDim: Int = 8, embDim: Int = 4, attDim: Int = 3,
      hidden: Seq[Int] = Seq(4, 3)): DinWeights = {
    val dims = (3 * embDim) +: hidden
    val blocks = hidden.indices.map { k =>
      MlpBlock(fixtureLinear(5 + 2 * k, dims(k + 1), dims(k)),
        fixtureBn(6 + 2 * k, dims(k + 1)))
    }
    DinWeights(
      itemEmbed = fixtureLinear(1, embDim, featDim),
      wQuery = fixtureMatrix(2, attDim, embDim),
      wKey = fixtureMatrix(3, attDim, embDim),
      wValue = Array.tabulate(attDim)(a => fxW(4, 1, a + 1)),
      mlp = blocks,
      outLayer = fixtureLinear(9, 1, hidden.last))
  }

  /** Deterministic RankNet fixture, layer tags 11-17. */
  def fixtureRankNet(userDim: Int = 8, itemDim: Int = 8, embDim: Int = 4,
      hidden: Seq[Int] = Seq(4, 3)): RankNetWeights = {
    val dims = (2 * embDim) +: hidden
    val blocks = hidden.indices.map { k =>
      MlpBlock(fixtureLinear(13 + 2 * k, dims(k + 1), dims(k)),
        fixtureBn(14 + 2 * k, dims(k + 1)))
    }
    RankNetWeights(
      userEmbed = fixtureLinear(11, embDim, userDim),
      itemEmbed = fixtureLinear(12, embDim, itemDim),
      mlp = blocks,
      outLayer = fixtureLinear(17, 1, hidden.last))
  }

  // ---- cascade Scorer factories ----

  /** DIN as a cascade stage-2 `Scorer`: joins the (broadcast) candidate
    * feature and per-user history-feature tables onto the candidate rows,
    * then scores executor-side in batches with the weights broadcast via
    * the SparkContext (one deserialize per executor, not per task). */
  def dinScorer(items: DataFrame, hists: DataFrame, wts: DinWeights,
      batchSize: Int = 256): Cascade.Scorer = df => {
    val joined = df.join(broadcast(items), "item_id")
      .join(broadcast(hists), "user_id")
    val bc = joined.sparkSession.sparkContext.broadcast(wts)
    val scored = ExternalScorer.batched(batchSize) { batch =>
      batch.map { r =>
        val cand = r.getSeq[Double](r.fieldIndex("feat")).toArray
        val hist = r.getSeq[scala.collection.Seq[Double]](r.fieldIndex("hist"))
          .map(_.toArray).toArray
        dinForward(bc.value, cand, hist)
      }
    }(joined)
    scored.drop("feat", "hist")
  }

  /** RankNet as a cascade stage-3 `Scorer`: joins broadcast per-user and
    * per-item feature vectors, scores in executor-side batches. */
  def rankNetScorer(userFeats: DataFrame, items: DataFrame,
      wts: RankNetWeights, batchSize: Int = 256): Cascade.Scorer = df => {
    val joined = df.join(broadcast(items), "item_id")
      .join(broadcast(userFeats), "user_id")
    val bc = joined.sparkSession.sparkContext.broadcast(wts)
    val scored = ExternalScorer.batched(batchSize) { batch =>
      batch.map { r =>
        val uf = r.getSeq[Double](r.fieldIndex("ufeat")).toArray
        val fi = r.getSeq[Double](r.fieldIndex("feat")).toArray
        rankNetForward(bc.value, uf, fi)
      }
    }(joined)
    scored.drop("feat", "ufeat")
  }
}
