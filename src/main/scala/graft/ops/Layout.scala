package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: space-filling-curve clustering for
  * multi-dimensional scan pruning (the Delta/Iceberg `OPTIMIZE ZORDER BY`
  * idea, built from plain Spark primitives).
  *
  * Why it matters at 100 TB: parquet min/max pruning only skips files for
  * predicates on the SORT column. Sorting by `zValue16(x, y)` clusters
  * rows so that file-level min/max ranges stay tight on BOTH x and y —
  * a selective predicate on either column prunes most files. Pure
  * expression tree (shift/and/or), whole-stage codegen'd, no UDF.
  */
object Layout {

  /** Morton (Z-order) interleave of the low 16 bits of two non-negative
    * integral columns: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1, yielding a 32-bit curve index as a long. Callers cap inputs
    * into [0, 2^16) first (`pmod`, bucketing, or dictionary ids); the
    * usual recipe for skewed/continuous dimensions is range-bucketing
    * each to ~2^16 quantile ranks and interleaving the ranks.
    */
  def zValue16(x: Column, y: Column): Column = {
    val terms = (0 until 16).flatMap { i =>
      Seq(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write-side clustering: range-partition on the z-value (so files own
    * contiguous curve segments) and sort within partitions (so row groups
    * within a file stay tight too). Follow with `.write.parquet(...)`.
    */
  def clusterByZ(df: DataFrame, x: Column, y: Column,
      numPartitions: Int): DataFrame = {
    val z = zValue16(x, y)
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }

  /** Small-file compaction — the maintenance pass every streaming or
    * fine-grained-ingest table needs (each micro-batch/task writes its
    * own file; a month of 1-minute batches is 43k files, and at 100 TB
    * the NameNode/listing and per-file open costs dominate scans long
    * before the bytes do). Sizes the rewrite from the directory's actual
    * bytes: ceil(totalBytes / targetBytes) output files, round-robin
    * repartitioned so they come out even. Returns the file count
    * written. */
  def compact(spark: org.apache.spark.sql.SparkSession, inputDir: String,
      outDir: String, targetBytes: Long): Int = {
    val in = new org.apache.hadoop.fs.Path(inputDir)
    val fs = in.getFileSystem(spark.sessionState.newHadoopConf())
    val totalBytes = fs.getContentSummary(in).getLength
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inputDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  /** Hive-style partitioned table write — the layout that turns a join
    * key or filter column into DIRECTORY structure, so selective reads
    * skip whole partitions. With a selective dimension join on the
    * partition column, Spark inserts dynamic partition pruning (DPP): a
    * runtime subquery collects the dim side's join-key values and the
    * fact scan reads ONLY those partitions — at 100 TB the difference
    * between scanning a day and scanning a decade. OpsSpec pins the
    * `dynamicpruningexpression` in the scan's PartitionFilters. */
  def writePartitioned(df: DataFrame, table: String,
      partCol: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .partitionBy(partCol).saveAsTable(table)
  }

  /** Bucketed (pre-shuffled) table write — the storage-layout half of a
    * co-located join. Rows are hash-assigned to `nBuckets` buckets on
    * `bucketCol` (Spark's bucket id = pmod(murmur3(col), n), the same
    * hash family `repartition` uses — which is why the explicit
    * `repartition` below aligns one in-memory partition per bucket and
    * each task writes exactly one bucket file) and sorted by `bucketCol`
    * within each bucket.
    *
    * Why it matters at 100 TB: two fact tables bucketed the same way on
    * their join key sort-merge-join with ZERO Exchange on either side —
    * the dominant cost of a big join (shuffling both inputs over the
    * network) is paid once at write time and amortized over every
    * subsequent join, and the single-file-per-bucket layout lets the
    * reader trust the on-disk sort so no per-task sort is needed either
    * (sorted-scan reporting is opt-in since Spark 3.0 via
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` because it is
    * only safe with ≤1 file per bucket — the invariant the pre-write
    * `repartition` here guarantees). The same bucket metadata serves
    * `groupBy(bucketCol)` aggregations shuffle-free.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit = {
    val spark = df.sparkSession
    // make the write idempotent across JVMs: a managed-table dir left by
    // a PREVIOUS session is invisible to this session's in-memory
    // catalog, and CREATE refuses a location that already exists
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    df.repartition(nBuckets, df(bucketCol))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** CDC merge (MERGE INTO semantics on plain parquet): apply a change
    * set to a base snapshot — matched keys take the change row
    * (full-row image, last-writer-wins), unmatched change rows insert,
    * and rows whose change has `deleted` true are dropped. `changes`
    * must share the base schema and carry AT MOST ONE row per key —
    * compact a multi-change log with the s12 latest-wins reduction
    * first, exactly like a lakehouse MERGE pre-aggregates its source.
    *
    * One shuffle per side on the merge key; against a bucketed base
    * ([[writeBucketed]]) the base-side exchange disappears and the
    * nightly 100 TB upsert runs as a sort-merge join co-located at
    * write time. `provenance` optionally appends a column recording
    * which side each surviving row came from. */
  def mergeUpsert(base: DataFrame, changes: DataFrame, key: Seq[String],
      deleted: Column, provenance: Option[String] = None): DataFrame = {
    val cols = base.columns.toSeq
    val b = base.select(cols.map(c => col(c).as("__b_" + c)): _*)
    val c = changes.withColumn("__del", coalesce(deleted, lit(false)))
      .select(cols.map(cn => col(cn).as("__c_" + cn)) :+ col("__del"): _*)
    val merged = b.join(c,
        key.map(k => col("__b_" + k) === col("__c_" + k)).reduce(_ && _),
        "full_outer")
      .where(col("__del").isNull || !col("__del"))
    // a change row is present iff __del survived the outer join (it is
    // coalesced non-null on every change row); per-column coalesce would
    // instead resurrect the stale base value when a change legitimately
    // sets a column to NULL, breaking full-row-image semantics
    val fromChange = col("__del").isNotNull
    val out = merged.select(cols.map(cn =>
      when(fromChange, col("__c_" + cn)).otherwise(col("__b_" + cn)).as(cn)): _*)
    provenance match {
      case None => out
      case Some(p) => merged.select(cols.map(cn =>
        when(fromChange, col("__c_" + cn)).otherwise(col("__b_" + cn)).as(cn)) :+
        when(fromChange, lit("changes")).otherwise(lit("base")).as(p): _*)
    }
  }

  /** Snapshot diff — the inverse of [[mergeUpsert]]: given two
    * snapshots of the same keyed table, emit one row per key whose
    * state differs, tagged `added` / `removed` / `changed`, plus the
    * sorted list of columns whose values differ (null-safe compare,
    * so NULL→value and value→NULL both count as a change). This is the
    * change-data-capture primitive a lakehouse derives incrementally
    * and a plain table must compute: audit "what did last night's load
    * touch", build a changes feed for [[mergeUpsert]] replication, or
    * regression-test a pipeline rewrite by diffing old vs new output.
    *
    * One full-outer sort-merge join keyed on `key` — a single shuffle
    * per side at any scale (bucketed snapshots co-locate it away), and
    * the unchanged majority is filtered BEFORE any wide output is
    * built, so a 100 TB diff with 0.1% churn emits 0.1% of rows.
    * Output columns: the key columns, `change`, `changed_cols`. */
  def snapshotDiff(base: DataFrame, next: DataFrame,
      key: Seq[String]): DataFrame = {
    val cols = base.columns.toSeq
    val vals = cols.filterNot(key.contains)
    val b = base.select(cols.map(c => col(c).as("__b_" + c)): _*)
    val n = next.select(cols.map(c => col(c).as("__n_" + c)): _*)
    // presence flags must be key-derived: a value column can be
    // legitimately NULL on a present row
    val inBase = key.map(k => col("__b_" + k).isNotNull).reduce(_ && _)
    val inNext = key.map(k => col("__n_" + k).isNotNull).reduce(_ && _)
    val diffs = vals.map(c =>
      when(!(col("__b_" + c) <=> col("__n_" + c)), lit(c)))
    b.join(n, key.map(k => col("__b_" + k) === col("__n_" + k))
        .reduce(_ && _), "full_outer")
      .withColumn("change",
        when(!inBase, lit("added"))
          .when(!inNext, lit("removed"))
          .when(diffs.map(_.isNotNull).reduce(_ || _), lit("changed")))
      .where(col("change").isNotNull)
      .select(key.map(k =>
          coalesce(col("__b_" + k), col("__n_" + k)).as(k)) ++ Seq(
        col("change"),
        when(col("change") === "changed", array_sort(
          filter(array(diffs: _*), c => c.isNotNull)))
          .otherwise(array().cast("array<string>")).as("changed_cols")): _*)
  }
}
