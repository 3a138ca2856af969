package graft

import graft.recall.NeuralForward
import graft.recall.NeuralForward._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DIN / RankNet eval-mode kernels (NeuralForward) three ways:
  * hand-derived scalar cases, bit-exact agreement with an independent
  * functional re-implementation (different code path, same fixed
  * evaluation order), and structural invariants from the reference
  * semantics (din.py / ranknet.py). */
class NeuralForwardSpec extends AnyFunSuite {

  // ---- independent functional re-implementation ----
  private def linF(l: Linear)(x: Seq[Double]): Seq[Double] =
    l.w.toSeq.zip(l.b.toSeq).map { case (row, b) =>
      row.toSeq.zip(x).map { case (a, c) => a * c }.sum + b
    }
  private def matF(w: Array[Array[Double]])(x: Seq[Double]): Seq[Double] =
    w.toSeq.map(row => row.toSeq.zip(x).map { case (a, b) => a * b }.sum)
  private def mlpF(blocks: Seq[MlpBlock], x0: Seq[Double]): Seq[Double] =
    blocks.foldLeft(x0) { (x, blk) =>
      val y = linF(blk.lin)(x)
      y.indices.map { i =>
        val v = blk.bn.gamma(i) * (y(i) - blk.bn.mean(i)) /
          math.sqrt(blk.bn.variance(i) + blk.bn.eps) + blk.bn.beta(i)
        math.max(v, 0.0)
      }
    }

  private def dinRef(w: DinWeights, cand: Seq[Double],
      hist: Seq[Seq[Double]]): Double = {
    val ce = linF(w.itemEmbed)(cand)
    val he = hist.map(linF(w.itemEmbed))
    val qh = matF(w.wQuery)(ce)
    val s = he.map { k =>
      val kh = matF(w.wKey)(k)
      qh.zip(kh).map { case (a, b) => math.max(a + b, 0.0) }
        .zip(w.wValue.toSeq).map { case (h, v) => v * h }.sum
    }
    val m = s.max
    val ex = s.map(x => math.exp(x - m))
    val wsum = ex.sum
    val at = ex.map(_ / wsum)
    val e = w.itemEmbed.out
    val interest = (0 until e).map(d =>
      at.zip(he).map { case (a, h) => a * h(d) }.sum)
    val avg = (0 until e).map(d => he.map(_(d)).sum / hist.length.toDouble)
    val logit = linF(w.outLayer)(mlpF(w.mlp, interest ++ ce ++ avg)).head
    1.0 / (1.0 + math.exp(-logit))
  }

  private def rankNetRef(w: RankNetWeights, uf: Seq[Double],
      itf: Seq[Double]): Double =
    linF(w.outLayer)(
      mlpF(w.mlp, linF(w.userEmbed)(uf) ++ linF(w.itemEmbed)(itf))).head

  // ---- hand-derived scalar DIN (all dims = 1, weights chosen so the
  // MLP becomes the affine map x ⟼ 2·interest + 8) ----
  test("DIN forward matches a hand-derived scalar case") {
    val idBn = BatchNorm(Array(2.0), Array(1.0), Array(1.0), Array(0.99999))
    val w = DinWeights(
      itemEmbed = Linear(Array(Array(2.0)), Array(0.5)), // emb(x) = 2x + 0.5
      wQuery = Array(Array(0.5)), wKey = Array(Array(0.25)),
      wValue = Array(1.0),
      mlp = Seq(MlpBlock(Linear(Array(Array(1.0, 1.0, 1.0)), Array(0.0)), idBn)),
      outLayer = Linear(Array(Array(1.0)), Array(-1.0)))
    // cand=1 → candEmb=2.5; hist=(0.5,1.5) → histEmb=(1.5,3.5)
    // scores: s0=relu(1.25+0.375)=1.625, s1=relu(1.25+0.875)=2.125
    // softmax: a1 = 1/(1+e^{-0.5}), a0 = 1−a1
    // interest = 1.5a0 + 3.5a1; mlp: bn(2x−1)∘sum ⇒ 2(interest+5)−1
    // logit = 2·interest + 8; score = σ(logit)
    val a1 = 1.0 / (1.0 + math.exp(-0.5))
    val interest = 1.5 * (1 - a1) + 3.5 * a1
    val expected = 1.0 / (1.0 + math.exp(-(2 * interest + 8)))
    val got = dinForward(w, Array(1.0), Array(Array(0.5), Array(1.5)))
    assert(math.abs(got - expected) < 1e-12, s"got $got expected $expected")
  }

  test("RankNet forward matches a hand-derived scalar case exactly") {
    val idBn = BatchNorm(Array(1.0), Array(0.0), Array(0.0), Array(0.99999))
    val w = RankNetWeights(
      userEmbed = Linear(Array(Array(1.0)), Array(0.0)),
      itemEmbed = Linear(Array(Array(3.0)), Array(-1.0)),
      mlp = Seq(MlpBlock(Linear(Array(Array(1.0, 2.0)), Array(0.5)), idBn)),
      outLayer = Linear(Array(Array(2.0)), Array(0.25)))
    // ue=2, ie=2 → lin = 2 + 4 + 0.5 = 6.5 → bn/relu id → 2·6.5 + 0.25
    assert(rankNetForward(w, Array(2.0), Array(1.0)) == 13.25)
  }

  test("fixture kernels agree bit-exactly with the independent functional form") {
    val din = fixtureDin()
    val rn = fixtureRankNet()
    val feats: Seq[Seq[Double]] = (0 until 6).map(k =>
      (1 to 8).map(i => ((k * 7 + i * 3) % 11 - 5) / 4.0))
    for (c <- 0 until 3) {
      val cand = feats(c)
      val hist = feats.drop(c).take(3)
      assert(dinForward(din, cand.toArray, hist.map(_.toArray).toArray)
        == dinRef(din, cand, hist))
      assert(rankNetForward(rn, cand.toArray, feats(c + 1).toArray)
        == rankNetRef(rn, cand, feats(c + 1)))
    }
  }

  test("DIN semantics: single-history attention collapses to that item") {
    // with |hist| = 1 the softmax weight is exactly 1, so interest == avg
    // == histEmb and the score equals the ref pipeline on that basis
    val din = fixtureDin()
    val cand = Array.tabulate(8)(i => (i + 1) / 10.0)
    val h = Array.tabulate(8)(i => (8 - i) / 10.0)
    val one = dinForward(din, cand, Array(h))
    assert(one == dinRef(din, cand.toSeq, Seq(h.toSeq)))
    assert(one > 0.0 && one < 1.0)
    // duplicated history item: softmax splits evenly, weighted sums are
    // mathematically identical — allow only float-assoc noise
    val two = dinForward(din, cand, Array(h, h))
    assert(math.abs(two - one) < 1e-12)
  }

  test("fixture weights are the portable modular formulas (SQL parity)") {
    // spot-check the exact values the DuckDB oracle regenerates with
    // generate_series: tag=1 (DIN item embed), 1-based (o,i)
    assert(fxW(1, 1, 1) == ((31 + 17 + 7) % 19 - 9) / 20.0)
    assert(fxW(1, 4, 8) == ((4 * 31 + 8 * 17 + 7) % 19 - 9) / 20.0)
    assert(fxB(9, 1) == ((13 + 45) % 11 - 5) / 20.0)
    assert(fxGamma(6, 3) == 1.0 + ((9 + 6) % 5) / 10.0)
    assert(fxVar(8, 2) == 1.0 + ((10 + 8) % 4) / 10.0)
    val din = fixtureDin()
    assert(din.itemEmbed.w(0)(0) == fxW(1, 1, 1))
    assert(din.mlp.map(b => (b.lin.out, b.lin.in)) == Seq((4, 12), (3, 4)))
    assert(din.outLayer.in == 3)
  }
}
