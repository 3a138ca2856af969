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
  * evenly). The decode kernels themselves are STUBBED (no image/audio libs
  * in this container, marked DETERMINISTIC-FAKE below); everything Spark
  * cares about — schema, batching, partitioning, the mapPartitions
  * contract — is real and tested.
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

  private val featDim = 8

  /** DETERMINISTIC-FAKE decode: a real implementation would JNI/FFI into an
    * image codec here; the fake derives `featDim` floats from a per-byte
    * position mix `((byte·2654435761 + pos·40503) mod 1000)/1000` summed
    * into slot `pos mod featDim` (double accumulate, float at the end).
    * Position-independent by design — unlike a rolling hash it is
    * replicable in ANSI SQL, so the whole binary→feature path is
    * oracle-checkable end-to-end. The mapPartitions shape
    * (iterator→iterator, batched, no driver traffic) is the real contract.
    */
  private def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Double](featDim)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      acc(i % featDim) += ((b * 2654435761L + i.toLong * 40503L) % 1000L) / 1000.0
      i += 1
    }
    acc.map(_.toFloat)
  }

  /** Decode + feature-extract: binary content → fixed-dim feature vector.
    * Runs partition-parallel; the per-partition loop is the batch boundary
    * an external codec would amortize setup over. */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("media_type", StringType),
      StructField("feature", ArrayType(FloatType))))
    val enc = RowEncoder.encoderFor(outSchema)
    assets.select(col("asset_id"), col("media_type"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), r.getString(1),
            fakeDecode(r.getAs[Array[Byte]](2)).toSeq)
        }
      }(enc)
  }

  /** 60-bit parity perceptual hash (DETERMINISTIC-FAKE decode, real
    * mapPartitions plumbing): bit j = parity of the summed position-mix
    * over content bytes at positions ≡ j (mod 60). Integer arithmetic
    * end-to-end, so the hash is bit-exact replicable in ANSI SQL — a
    * float pHash could never be oracle-compared across engines. The
    * property a real pHash would share: a k-byte tail edit/truncation
    * touches ≤ k slots ⇒ Hamming distance ≤ k, so banded matching finds
    * re-encoded variants. 60 bits (not 64) keeps the hash and every
    * band value positive in both engines' signed BIGINTs. */
  private val phashBits = 60

  private def fakePHash(bytes: Array[Byte]): Long = {
    val par = new Array[Long](phashBits)
    var i = 0
    while (i < bytes.length) {
      par(i % phashBits) +=
        ((bytes(i) & 0xff) * 2654435761L + i.toLong * 40503L) % 1000L
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < phashBits) { h |= (par(j) & 1L) << j; j += 1 }
    h
  }

  /** Content → perceptual fingerprint, one row per asset. Same
    * iterator→iterator batching contract as [[extractFeatures]]. */
  def mediaPHash(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("phash", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    assets.select(col("asset_id"), col("content"))
      .mapPartitions { rows =>
        rows.map(r => Row(r.getLong(0), fakePHash(r.getAs[Array[Byte]](1))))
      }(enc)
  }

  /** Resize stub: metadata-only transform (real impl would re-encode
    * content); demonstrates pushdown-friendly metadata handling. */
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

  /** Audio analysis-window segmentation — the MFCC/fbank front-end shape:
    * overlapping windows of `winMs` every `hopMs` (hop < width ⇒ overlap),
    * one row per window with its byte-span summary over the content. The
    * per-window "energy" is the DETERMINISTIC-FAKE decode (mean of the
    * windowed bytes) — a real codec would FFT here; the explode + slice
    * plumbing and the (start, len) windowing contract are the real part.
    * Windows start while `start + win ≤ duration` (trailing partial
    * window dropped, like every framing front-end); assets shorter than
    * one window emit nothing. */
  def audioWindows(assets: DataFrame, winMs: Long, hopMs: Long): DataFrame = {
    require(winMs > 0 && hopMs > 0, s"window/hop must be positive")
    assets.where(col("duration_ms").isNotNull &&
        col("duration_ms") >= winMs)
      // decode to the sample array ONCE per asset, before the window
      // explode — slicing per window must not re-run the decode
      // (O(len) once vs O(len·windows) if placed after the explode)
      .withColumn("__samples", split(decode(col("content"), "UTF-8"), ""))
      .withColumn("win_start",
        explode(sequence(lit(0L), col("duration_ms") - winMs, lit(hopMs))))
      // 1 unit ≙ 1 sample in the text-backed fixture: window = slice
      .select(col("asset_id"), col("win_start"),
        round(aggregate(
          transform(slice(col("__samples"),
            (col("win_start") + 1).cast("int"), lit(winMs.toInt)),
            c => ascii(c).cast("double")),
          lit(0.0), (acc, v) => acc + v) / winMs.toDouble, 6).as("energy"))
  }
}
