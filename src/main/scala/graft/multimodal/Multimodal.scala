package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (charter extension).
  *
  * Media assets travel as opaque `binary` columns plus typed metadata — the
  * lakehouse-standard layout for image/audio/video at 100 TB (content in the
  * row, never on the driver; partition by content hash so decode fans out
  * evenly). Image and audio decode run REAL JDK codecs in
  * [[RealCodecs]] (PNG via ImageIO, RIFF/WAV PCM16 parsed from the byte
  * layout) — the registry's mm1/mm3/mm4/mm5/mm6/mm7 all run real
  * encode→decode paths since round 9. The one remaining stand-in is
  * VIDEO ([[sampleFrames]]): the JDK ships no video codec and the
  * container has no media libraries, so the per-frame decode is a
  * digest over the content bytes, clearly marked below; the
  * explode/metadata plumbing around it is the real contract.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = false),
    StructField("width", IntegerType), // image/video metadata
    StructField("height", IntegerType),
    StructField("duration_ms", LongType))) // audio/video metadata

  /** Wrap any table into asset rows by treating a string column as the raw
    * payload — gives the fixture tables a binary column to exercise the
    * pipeline with. */
  def assetsFromText(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id).cast("long").as("asset_id"),
      lit("image").as("media_type"),
      encode(col(text), "UTF-8").as("content"),
      (length(col(text)) % 640 + 1).cast("int").as("width"),
      (length(col(text)) % 480 + 1).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /** Metadata-only resize annotation (pushdown-friendly width/height
    * rewrite without touching content). The REAL pixel path — decode →
    * nearest-neighbor resample → re-encode — is
    * [[RealCodecs.imageResizeRoundtrip]] (registry query mm7). */
  def resize(assets: DataFrame, w: Int, h: Int): DataFrame =
    assets.withColumn("width", lit(w)).withColumn("height", lit(h))

  /** Frame-sample stub for video: emit one row per sampled frame index at
    * `fps`; content decode is faked, the explode+binary plumbing is real. */
  def sampleFrames(assets: DataFrame, everyMs: Long): DataFrame =
    assets.where(col("duration_ms").isNotNull)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))
      .select(col("asset_id"), col("frame_ms"),
        xxhash64(col("content"), col("frame_ms")).as("frame_digest"))

  /** Engine-portable twin of [[sampleFrames]]: the per-frame digest is
    * md5 over `content || ':' || frame_ms` (bytes identical to the SQL
    * string concat when content is UTF-8 text), so the whole
    * video→frame-row expansion is replicable in the DuckDB oracle.
    * Same explode plumbing; xxhash64 stays the production digest. */
  def sampleFramesPortable(assets: DataFrame, everyMs: Long): DataFrame =
    assets.where(col("duration_ms").isNotNull)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))
      .select(col("asset_id"), col("frame_ms"),
        substring(md5(concat(col("content"),
          encode(concat(lit(":"), col("frame_ms").cast("string")), "UTF-8"))),
          1, 16).as("frame_digest"))

  /** Give the text fixture a video shape: duration derived from content
    * length (deterministic, oracle-replicable). */
  def videoAssetsFromText(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id).cast("long").as("asset_id"),
      lit("video").as("media_type"),
      encode(col(text), "UTF-8").as("content"),
      lit(640).as("width"), lit(480).as("height"),
      length(col(text)).cast("long").as("duration_ms"))

}
