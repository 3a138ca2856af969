package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering scalar operators (reference
  * `generate_training_data.py:27-78`).
  */
object Features {

  /** Stable categorical hash feature in [0, 1).
    *
    * The reference uses Python `hash(s) % 100 / 100`
    * (`generate_training_data.py:54-61`) which is salted per process
    * (PYTHONHASHSEED) and therefore NOT reproducible across runs; we define
    * the canonical form as xxhash64 — deterministic, distributed-safe,
    * codegen'd (SURVEY §7.4.1 documents the divergence).
    */
  def stableHash01(c: Column, buckets: Int = 100): Column =
    pmod(xxhash64(c), lit(buckets.toLong)).cast("double") / buckets

  /** Cleanse a dirty price string ("$1,299.00 ") and cast, yielding null on
    * unparseable input (the reference's skip-on-ValueError,
    * `generate_training_data.py:35-41`). try_cast ≙ `float()` + except.
    */
  def cleansePrice(c: Column): Column = {
    val cleaned = trim(regexp_replace(c, "[$,]", ""))
    when(cleaned.rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)$"), cleaned.cast("double"))
  }

  /** Min-max scale `valueCol` into [0,1] over the whole frame — the
    * reference's two-pass MinMaxScaler (`generate_training_data.py:27-45`).
    * Pass 1 is a 2-double scalar aggregate broadcast to pass 2 (no shuffle
    * of the main table).
    */
  def minMaxScale(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val stats = df.agg(
      min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"))
    df.crossJoin(broadcast(stats))
      .withColumn(outCol,
        when(col("__mx") === col("__mn"), lit(0.0))
          .otherwise((col(valueCol) - col("__mn")) / (col("__mx") - col("__mn"))))
      .drop("__mn", "__mx")
  }

  /** Last element of a category path (reference `path[-1]`,
    * `generate_training_data.py:55`); null on empty/missing paths (ANSI
    * mode makes plain `element_at` error out instead). */
  def lastCategory(path: Column): Column = try_element_at(path, lit(-1))

  /** Exponentially-decayed sum of a time-ordered value window (newest
    * last, as `collect_list` over an ordered frame emits): newest value
    * weighs 1, each step back decays by (1-alpha) — the recency-weighted
    * user-activity feature behind "recent interest" scores (the
    * continuous counterpart of the reference's last-50-items history
    * cap, `behavior_lookup.py:34`). Pure HOF expression tree: reverse →
    * per-index decay weight → fold; codegen'd, no UDF, and bounded by
    * the caller's window frame so weights never underflow. */
  def decayedSum(values: Column, alpha: Double): Column =
    aggregate(
      zip_with(reverse(values),
        sequence(lit(0), size(values) - 1),
        (v, j) => v * pow(lit(1.0 - alpha), j.cast("double"))),
      lit(0.0), (acc, x) => acc + x)

  /** Smoothed target (mean) encoding table (Micci-Barreca, SIGKDD
    * Explorations 2001): per category,
    * `enc = (sum(target) + m · prior) / (n + m)` where `prior` is the
    * global target mean and `m` the smoothing pseudo-count — rare
    * categories shrink toward the prior instead of memorizing noise.
    * Returns the encoding TABLE (category, n, enc) rather than the
    * joined-back frame: the table is what a training pipeline persists
    * (computed on the train split only, then joined to train AND eval —
    * joining inside would invite leakage by recomputation). One keyed
    * aggregate + a broadcast single-row prior; the join-back the caller
    * does is a broadcast join for any real cardinality. Deterministic
    * sum order via 6-dp rounding. */
  def targetEncode(df: DataFrame, category: String, target: String,
      m: Double = 20.0): DataFrame = {
    val prior = df.agg(avg(col(target)).as("__prior"))
    df.groupBy(col(category))
      .agg(count(lit(1)).as("n"), sum(col(target)).as("__sum"))
      .crossJoin(broadcast(prior))
      .select(col(category), col("n"),
        round((col("__sum") + lit(m) * col("__prior")) /
          (col("n") + lit(m)), 6).as("enc"),
        round(col("__prior"), 6).as("prior"))
  }

  /** Equi-depth (quantile) binning: exact interpolated `nBins`-quantile
    * boundaries of `valueCol` (Spark `percentile` ≙ DuckDB
    * `quantile_cont`), then each row is assigned the 1-based bin whose
    * upper boundary first reaches its value — the feature discretizer a
    * GBDT/embedding pipeline runs before hashing continuous features.
    * The boundary aggregate is one small job whose result broadcasts;
    * assignment is a pure expression scan (no shuffle, no sort of the
    * data itself), so the op is a single pass at any scale — unlike an
    * `ntile` lowering, which would force a global sort. Interior
    * boundaries only: values below b(1) fall in bin 1 via the filter
    * semantics, at-or-above the last interior boundary in bin nBins. */
  def quantileBins(df: DataFrame, valueCol: String, nBins: Int,
      outCol: String): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val qs = (1 until nBins).map(_.toDouble / nBins)
    val bounds = df.agg(
      percentile(col(valueCol), array(qs.map(lit): _*)).as("__bounds"))
    df.crossJoin(broadcast(bounds))
      .withColumn(outCol,
        size(filter(col("__bounds"), b => b <= col(valueCol))) + 1)
      .drop("__bounds")
  }
}
