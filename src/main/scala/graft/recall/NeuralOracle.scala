package graft.recall

import graft.recall.NeuralForward._

/** Generates the DuckDB oracle SQL for the DIN / RankNet eval-mode forward
  * passes (`eval_online/main/din.py:91-129`, `ranknet.py:34-58`) from the
  * SAME fixture weights the Spark-side scorers broadcast
  * ([[NeuralForward.fixtureDin]] / [[NeuralForward.fixtureRankNet]]), so
  * there is a single source of truth for the parameters.
  *
  * The SQL mirrors the kernel's fixed evaluation order step for step
  * (ascending-index sequential sums via `list_sum(list_transform(...))`,
  * identical parenthesization), which makes the replica bit-exact against
  * the same C-libm arithmetic — validated at full double precision. The
  * only cross-engine wobble left is JVM `Math.exp` vs C `exp` (≤1 ulp), so
  * registered queries round final scores to 6 dp.
  *
  * Weight literals are emitted as `CAST([...] AS DOUBLE[][])` — without
  * the cast DuckDB types a numeric list literal DECIMAL and computes in
  * decimal arithmetic, which is NOT IEEE double math.
  */
object NeuralOracle {

  private def lit1(v: Array[Double]): String =
    v.mkString("[", ",", "]")
  private def lit2(m: Array[Array[Double]]): String =
    m.map(lit1).mkString("[", ",", "]")
  private def d1(name: String, v: Array[Double]): String =
    s"CAST(${lit1(v)} AS DOUBLE[]) AS $name"
  private def d2(name: String, m: Array[Array[Double]]): String =
    s"CAST(${lit2(m)} AS DOUBLE[][]) AS $name"

  /** y = Wx + b as a list expression (sequential ascending-index sum —
    * same order as [[NeuralForward.matvec]]). */
  private def matvec(w: String, b: String, x: String, out: Int, in: Int) =
    s"list_transform(generate_series(1,$out), o -> " +
      s"list_sum(list_transform(generate_series(1,$in), i -> $w[o][i] * $x[i])) + $b[o])"

  private def matvecNb(w: String, x: String, out: Int, in: Int) =
    s"list_transform(generate_series(1,$out), o -> " +
      s"list_sum(list_transform(generate_series(1,$in), i -> $w[o][i] * $x[i])))"

  /** BatchNorm-eval + ReLU, parenthesized exactly like the kernel:
    * greatest((g·(x−m)) / sqrt(v+eps) + β, 0). */
  private def bnRelu(g: String, be: String, m: String, v: String,
      x: String, n: Int, eps: Double) =
    s"list_transform(generate_series(1,$n), i -> " +
      s"greatest(($g[i] * ($x[i] - $m[i])) / sqrt($v[i] + $eps) + $be[i], 0.0))"

  /** DIN forward as a prefixed CTE chain. `pairsCte` must yield columns
    * (user_id, item_id, cand DOUBLE[featDim], hist DOUBLE[][]); the final
    * CTE `<p>score` yields (user_id, item_id, score). Splice into a WITH
    * clause and select from `<p>score`. */
  def dinCtes(wts: DinWeights, pairsCte: String, p: String): String = {
    val e = wts.itemEmbed.out // embedding dim
    val a = wts.wValue.length // attention dim
    val f = wts.itemEmbed.in  // feature dim
    val h0 = wts.mlp.head
    val h1 = wts.mlp(1)
    require(wts.mlp.length == 2, "oracle generator assumes the 2-block fixture trunk")
    val wtsCols = Seq(
      d2("w1", wts.itemEmbed.w), d1("b1", wts.itemEmbed.b),
      d2("wq", wts.wQuery), d2("wk", wts.wKey), d1("wv", wts.wValue),
      d2("w5", h0.lin.w), d1("b5", h0.lin.b),
      d1("g6", h0.bn.gamma), d1("be6", h0.bn.beta),
      d1("m6", h0.bn.mean), d1("v6", h0.bn.variance),
      d2("w7", h1.lin.w), d1("b7", h1.lin.b),
      d1("g8", h1.bn.gamma), d1("be8", h1.bn.beta),
      d1("m8", h1.bn.mean), d1("v8", h1.bn.variance),
      d2("w9", wts.outLayer.w), d1("b9", wts.outLayer.b)
    ).mkString(", ")
    // attention score per history item t (din.py:39-46): masked relu is
    // exact because adding wv·0 is adding 0.0
    val kh = matvecNb("wk", "he", a, e)
    val scoreT = s"list_transform(hist_emb, he -> " +
      s"list_sum(list_transform(generate_series(1,$a), aa -> " +
      s"wv[aa] * greatest(qh[aa] + ($kh)[aa], 0.0))))"
    val interest = s"list_transform(generate_series(1,$e), d -> " +
      "list_sum(list_transform(generate_series(1, len(hist_emb)), t -> " +
      "(exps[t] / wsum) * hist_emb[t][d])))"
    val avgH = s"list_transform(generate_series(1,$e), d -> " +
      "list_sum(list_transform(generate_series(1, len(hist_emb)), t -> " +
      "hist_emb[t][d])) / CAST(len(hist_emb) AS DOUBLE))"
    s"""${p}wts AS (SELECT $wtsCols),
       |${p}pairs AS ($pairsCte),
       |${p}e1 AS (SELECT user_id, item_id,
       |    ${matvec("w1", "b1", "cand", e, f)} AS cand_emb,
       |    list_transform(hist, h -> ${matvec("w1", "b1", "h", e, f)}) AS hist_emb
       |  FROM ${p}pairs CROSS JOIN ${p}wts),
       |${p}a1 AS (SELECT *, ${matvecNb("wq", "cand_emb", a, e)} AS qh
       |  FROM ${p}e1 CROSS JOIN ${p}wts),
       |${p}s1 AS (SELECT *, $scoreT AS scores FROM ${p}a1),
       |${p}x1 AS (SELECT *, list_transform(scores, s -> exp(s - list_max(scores))) AS exps
       |  FROM ${p}s1),
       |${p}x2 AS (SELECT *, list_sum(exps) AS wsum FROM ${p}x1),
       |${p}c1 AS (SELECT user_id, item_id,
       |    ($interest) || cand_emb || ($avgH) AS x0 FROM ${p}x2),
       |${p}m1 AS (SELECT user_id, item_id,
       |    ${bnRelu("g6", "be6", "m6", "v6", s"(${matvec("w5", "b5", "x0", h0.lin.out, 3 * e)})", h0.lin.out, h0.bn.eps)} AS z1
       |  FROM ${p}c1 CROSS JOIN ${p}wts),
       |${p}m2 AS (SELECT user_id, item_id,
       |    ${bnRelu("g8", "be8", "m8", "v8", s"(${matvec("w7", "b7", "z1", h1.lin.out, h1.lin.in)})", h1.lin.out, h1.bn.eps)} AS z2
       |  FROM ${p}m1 CROSS JOIN ${p}wts),
       |${p}score AS (SELECT user_id, item_id,
       |    1.0 / (1.0 + exp(-((${matvec("w9", "b9", "z2", 1, wts.outLayer.in)})[1]))) AS score
       |  FROM ${p}m2 CROSS JOIN ${p}wts)""".stripMargin
  }

  /** RankNet forward as a prefixed CTE chain. `pairsCte` must yield
    * (user_id, item_id, uf DOUBLE[], itf DOUBLE[]); final CTE `<p>score`
    * yields (user_id, item_id, score) — raw score, no sigmoid
    * (ranknet.py:58). */
  def rankNetCtes(wts: RankNetWeights, pairsCte: String, p: String): String = {
    val e = wts.userEmbed.out
    val h0 = wts.mlp.head
    val h1 = wts.mlp(1)
    require(wts.mlp.length == 2, "oracle generator assumes the 2-block fixture trunk")
    val wtsCols = Seq(
      d2("w11", wts.userEmbed.w), d1("b11", wts.userEmbed.b),
      d2("w12", wts.itemEmbed.w), d1("b12", wts.itemEmbed.b),
      d2("w13", h0.lin.w), d1("b13", h0.lin.b),
      d1("g14", h0.bn.gamma), d1("be14", h0.bn.beta),
      d1("m14", h0.bn.mean), d1("v14", h0.bn.variance),
      d2("w15", h1.lin.w), d1("b15", h1.lin.b),
      d1("g16", h1.bn.gamma), d1("be16", h1.bn.beta),
      d1("m16", h1.bn.mean), d1("v16", h1.bn.variance),
      d2("w17", wts.outLayer.w), d1("b17", wts.outLayer.b)
    ).mkString(", ")
    s"""${p}wts AS (SELECT $wtsCols),
       |${p}pairs AS ($pairsCte),
       |${p}e1 AS (SELECT user_id, item_id,
       |    (${matvec("w11", "b11", "uf", e, wts.userEmbed.in)}) ||
       |    (${matvec("w12", "b12", "itf", e, wts.itemEmbed.in)}) AS x0
       |  FROM ${p}pairs CROSS JOIN ${p}wts),
       |${p}m1 AS (SELECT user_id, item_id,
       |    ${bnRelu("g14", "be14", "m14", "v14", s"(${matvec("w13", "b13", "x0", h0.lin.out, 2 * e)})", h0.lin.out, h0.bn.eps)} AS z1
       |  FROM ${p}e1 CROSS JOIN ${p}wts),
       |${p}m2 AS (SELECT user_id, item_id,
       |    ${bnRelu("g16", "be16", "m16", "v16", s"(${matvec("w15", "b15", "z1", h1.lin.out, h1.lin.in)})", h1.lin.out, h1.bn.eps)} AS z2
       |  FROM ${p}m1 CROSS JOIN ${p}wts),
       |${p}score AS (SELECT user_id, item_id,
       |    (${matvec("w17", "b17", "z2", 1, wts.outLayer.in)})[1] AS score
       |  FROM ${p}m2 CROSS JOIN ${p}wts)""".stripMargin
  }
}
