package graft.recall

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType, StringType}

/** Embedding-table import/export in the reference's artifact formats
  * (G5, `lightgcn/train.py:104-147`, `lightgcn/utils.py:233-276`):
  * engine-internal storage is parquet `(id, emb array<float>)`; the CSV
  * boundary uses the reference's WIDE layout `id, emb_0..emb_{d-1}`.
  */
object EmbeddingIO {

  /** `(id, emb array)` → wide columns `id, emb_0..emb_{dim-1}`. */
  def toWide(emb: DataFrame, id: String, vec: String, dim: Int): DataFrame =
    emb.select(col(id) +: (0 until dim).map(i =>
      element_at(col(vec), i + 1).cast("double").as(s"emb_$i")): _*)

  /** Wide columns back to `(id, emb array<double>)`. */
  def fromWide(wide: DataFrame, id: String): DataFrame = {
    val dims = wide.columns.filter(_.startsWith("emb_"))
      .map(_.stripPrefix("emb_").toInt).sorted
    wide.select(col(id),
      array(dims.map(i => col(s"emb_$i")): _*).as("emb"))
  }

  /** Write the reference's CSV artifact (header, wide layout). */
  def writeWideCsv(emb: DataFrame, id: String, vec: String, dim: Int,
      path: String): Unit =
    toWide(emb, id, vec, dim).write.mode("overwrite")
      .option("header", "true").csv(path)

  /** Read it back with an explicit schema — never infer at scale. */
  def readWideCsv(spark: SparkSession, path: String, idName: String,
      dim: Int): DataFrame = {
    val schema = StructType(
      StructField(idName, StringType) +:
        (0 until dim).map(i => StructField(s"emb_$i", DoubleType)))
    fromWide(spark.read.option("header", "true").schema(schema).csv(path), idName)
  }
}
