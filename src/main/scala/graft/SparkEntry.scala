package graft

import graft.functions.{Features, TextFunctions, VectorOps}
import graft.llmops.{Dedup, SimSearch, TextAnalysis}
import graft.ops.{AsOf, PrefixWindow, Sampling, TopK}
import graft.recall.Cascade
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB oracle in `oracleSql` (same column
  * names, deterministic values; ordering-sensitive ops carry explicit
  * tie-breaks).
  */
object SparkEntry {

  /** Flagship: full 3-stage cascade (recall ▷ rank ▷ rerank) over the
    * sf0.001 embeddings, deterministic stub scorers for the external-model
    * stages. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val users = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("user_id"), col("embedding").as("user_emb"),
        array(lit(100L), lit(101L)).as("history"))
    val items = emb.where(col("vec_id") >= 20)
      .select(col("vec_id").as("item_id"), col("embedding").as("item_emb"))
    Cascade.recommend(users, items,
      Cascade.stubScorer("user_id", "item_id"),
      Cascade.stubScorer("item_id", "user_id"),
      n1 = 50, n2 = 20, n3 = 10)
  }

  private type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- queries

  /** A1/A4/A6-style headline aggregation (TPC-H Q1 shape) — hash-agg with
    * map-side partials; sums rounded so IEEE accumulation order can't flip
    * the oracle hash. */
  private val q1Agg: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** P1/P2: projection + predicate, pushed to the parquet scan. */
  private val p1ProjectFilter: Q = (s, dir) =>
    Tables.orders(s, dir)
      .where(col("o_totalprice") > 100000 && col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** J1/J2: star-schema broadcast lookup join chain. */
  private val j1StarJoin: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val n = broadcast(Tables.nation(s, dir))
    val r = broadcast(Tables.region(s, dir))
    c.join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
  }

  /** J3: as-of join — for each purchase event, the most recent non-purchase
    * event of the same user at or before it (union + running-last lowering,
    * single shuffle — SURVEY §2.3 J3). */
  private val j3AsOf: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val queries = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("query_id"), col("ts"))
    val behaviors = ev.where(col("event_type") =!= "purchase")
    AsOf.lastAsOf(queries, behaviors, "user_id", "ts", "ts",
      payload = col("event_id"), outCol = "beh_id", tieBreak = col("event_id"))
      .select(col("query_id"), col("beh_id"))
  }

  /** A3/W1: per-user time-ordered history (group → sorted list),
    * pipe-joined per the reference's CSV contract. */
  private val a3UserHistory: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        concat_ws("|",
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id")))),
            p => p.getField("event_id").cast("string"))).as("history"),
        count(lit(1)).as("n_events"))

  /** W2/W3: prefix-window training samples with bounded last-5 history,
    * stride 2, min history 3 (reference `generate_training_data.py:115-178`
    * shape). */
  private val w2PrefixSamples: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    PrefixWindow.samples(ev, "user_id", "ts", col("event_id"),
        minHistory = 3, stride = 2, maxHistory = 5,
        tieBreak = Seq(col("event_id")))
      .select(col("user_id"), col("idx").cast("long").as("idx"),
        col("event_id").as("candidate"),
        concat_ws("|", transform(col("history"), _.cast("string"))).as("history"))
  }

  /** W4: top-k per group with deterministic tie-break. */
  private val w4TopkPerGroup: Q = (s, dir) =>
    TopK.perGroup(Tables.orders(s, dir), Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rank").cast("long").as("rank"))

  /** J8/SO2: anti join — customers with no orders. */
  private val j8AntiJoin: Q = (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
          .where(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** A6: two-pass min-max scaling (scalar-aggregate broadcast, no shuffle
    * of the fact table). */
  private val a6MinMax: Q = (s, dir) =>
    Features.minMaxScale(Tables.orders(s, dir), "o_totalprice", "scaled")
      .select(col("o_orderkey"), round(col("scaled"), 9).as("scaled"))

  /** LLM-D1: exact dedup groups by content digest. */
  private val d1ExactDedup: Q = (s, dir) =>
    Dedup.exact(Tables.documents(s, dir), "doc_id", "text")

  /** LLM-T: token statistics + fingerprint (codegen'd expressions only). */
  private val t3TokenStats: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
    d.select(
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
      round(TextFunctions.punctRatio(col("text")), 6).as("punct_ratio"),
      TextFunctions.fingerprint(col("text")).as("fingerprint"))
  }

  /** LLM-S1 / M1 / J7: brute-force cosine top-k similarity search
    * (broadcast query set, codegen'd fused dot product). */
  private val m1CosineTopk: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    SimSearch.bruteForceTopK(
        emb.where(col("vec_id") < 10), emb.where(col("vec_id") >= 10),
        "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("item_id"),
        round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
  }

  def queries: Map[String, Q] = Map(
    "q1_agg" -> q1Agg,
    "p1_project_filter" -> p1ProjectFilter,
    "j1_star_join" -> j1StarJoin,
    "j3_asof" -> j3AsOf,
    "a3_user_history" -> a3UserHistory,
    "w2_prefix_samples" -> w2PrefixSamples,
    "w4_topk_per_group" -> w4TopkPerGroup,
    "j8_anti_join" -> j8AntiJoin,
    "a6_minmax" -> a6MinMax,
    "d1_exact_dedup" -> d1ExactDedup,
    "t3_token_stats" -> t3TokenStats,
    "m1_cosine_topk" -> m1CosineTopk,
  )

  // ------------------------------------------------------------ oracle SQL

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "p1_project_filter" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice > 100000 AND o_orderstatus = 'O'""".stripMargin,
    "j1_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "j3_asof" ->
      """SELECT q.event_id AS query_id,
        |  (SELECT b.event_id FROM events b
        |   WHERE b.user_id = q.user_id AND b.event_type <> 'purchase'
        |     AND b.ts <= q.ts
        |   ORDER BY b.ts DESC, b.event_id DESC LIMIT 1) AS beh_id
        |FROM events q WHERE q.event_type = 'purchase'""".stripMargin,
    "a3_user_history" ->
      """SELECT user_id,
        |  array_to_string(list(event_id ORDER BY ts, event_id), '|') AS history,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id""".stripMargin,
    "w2_prefix_samples" ->
      """SELECT user_id, idx, event_id AS candidate,
        |  array_to_string(h, '|') AS history
        |FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx,
        |    list(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS h
        |  FROM events)
        |WHERE idx > 3 AND (idx - 4) % 2 = 0""".stripMargin,
    "w4_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders)
        |WHERE rank <= 3""".stripMargin,
    "j8_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,
    "a6_minmax" ->
      """SELECT o_orderkey,
        |  round((o_totalprice - mn) / (mx - mn), 9) AS scaled
        |FROM orders,
        |  (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders)""".stripMargin,
    "d1_exact_dedup" ->
      """SELECT md5(text) AS digest, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "t3_token_stats" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> len(t) > 0)) AS n_tokens,
        |  round(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]'))::DOUBLE
        |    / length(text), 6) AS punct_ratio,
        |  md5(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> len(t) > 0))), ' ')) AS fingerprint
        |FROM documents""".stripMargin,
    "m1_cosine_topk" ->
      """SELECT query_id, item_id, round(cosine, 6) AS cosine, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS item_id,
        |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])) AS cosine,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |        CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 10 AND c.vec_id >= 10)
        |WHERE rank <= 5""".stripMargin,
  )
}
