package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide invariants over [[SparkEntry.queries]].
  *
  * The driver's oracle harness loads both the Spark parquet and the DuckDB
  * result into pandas and `sort_values` across every column before hashing.
  * pandas cannot sort (or hash) numpy-array cells, so an oracle-compared
  * query whose output carries a top-level array/map/struct column crashes
  * the harness — the round-6 `l5_snapshot_diff` red row. The repo
  * convention (set by `a3_user_history`) is to stringify such columns with
  * `concat_ws` at the registry boundary and keep the structured form in
  * the library API. This spec pins that convention for every
  * oracle-compared query so the class of break can't recur.
  */
class RegistrySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("oracle-compared queries emit no top-level array/map/struct columns") {
    // .get, not .apply: an oracleSql key without a registered query must
    // be reported by the dedicated missing-key test below, not crash here
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      SparkEntry.queries.get(name).toSeq.flatMap { q =>
      val schema = q(spark, sf).schema
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }}
    assert(offenders.isEmpty,
      s"\nstringify these with concat_ws (the a3 convention):\n  " +
        offenders.mkString("\n  "))
  }

  test("every oracleSql key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }
}
