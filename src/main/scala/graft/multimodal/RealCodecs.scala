package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL multimodal codecs — no stubs. The container has no external
  * imaging/audio libraries, but the JDK itself ships two genuine codecs:
  * `javax.imageio` (PNG/JPEG/BMP/GIF) and the RIFF/WAVE PCM container
  * (a public byte layout, parsed directly below). This module runs real
  * encode → real decode on executors, in the same iterator→iterator
  * `mapPartitions` batch shape as [[Multimodal]] (reference multimodal
  * surface: the stubbed kernels documented at `Multimodal.scala`; this
  * closes the "real codecs" gap for the two formats the JDK covers).
  *
  * The trick that keeps a REAL codec oracle-checkable: both PNG and
  * PCM16 WAV are LOSSLESS, and the synthetic pixels/samples derive from
  * integer formulas of (asset id, position). So decode(encode(x)) == x
  * byte-for-byte, the extracted statistics are exact integer sums, and
  * DuckDB replays the FORMULA relationally — any codec bug (stride,
  * channel order, endianness, header math) breaks the hash compare.
  * The oracle validates the full Spark-side encode→decode→aggregate
  * path without needing a PNG/WAV implementation of its own.
  *
  * Scale posture: codecs run partition-parallel on executor-local bytes
  * (no driver traffic, no shuffle added by the codec itself); one
  * ImageIO reader/writer per row is the worst case — at 100 TB the
  * per-partition loop amortizes codec setup exactly like the stub's
  * contract documents.
  */
object RealCodecs {

  // ---------- PNG (javax.imageio — a real, lossless image codec) ------

  /** Synthetic image geometry: small enough that the oracle's relational
    * replay (|assets| × w × h rows) stays cheap at every fixture SF. */
  val imgW = 16
  val imgH = 16

  /** Deterministic RGB at (x, y) for `id` — the formula both engines
    * compute. Int-exact, channel values 0..255. */
  private def rgbAt(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((id * 31 + x * 7 + y * 13) % 256).toInt,
    ((id * 17 + x * 11 + y * 3) % 256).toInt,
    ((id * 29 + x * 5 + y * 19) % 256).toInt)

  /** Render the deterministic pattern and ENCODE it as real PNG bytes.
    * `perturb` renders the "re-encoded variant" for the near-dup family
    * (mm4): pixel (0,0)'s red channel shifts by +8 (mod 256) — a
    * one-block edit whose aHash lands within a few bits of the
    * original's, the property a perceptual-hash dedup exists to catch. */
  def encodePng(id: Long, perturb: Boolean = false): Array[Byte] = {
    val img = new BufferedImage(imgW, imgH, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < imgH) {
      var x = 0
      while (x < imgW) {
        val (r0, g, b) = rgbAt(id, x, y)
        val r = if (perturb && x == 0 && y == 0) (r0 + 8) % 256 else r0
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** DECODE PNG bytes and reduce to exact per-channel pixel sums.
    * Returns (width, height, sumR, sumG, sumB) — integer-exact, so the
    * downstream means are reproducible doubles in both engines. */
  def decodePngSums(bytes: Array[Byte]): (Int, Int, Long, Long, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    (img.getWidth, img.getHeight, sr, sg, sb)
  }

  /** ids → real PNG encode → real PNG decode → per-image channel means.
    * One mapPartitions pass: the encoded bytes never leave the executor
    * (the 100 TB posture — content stays in the partition). */
  def imageCodecRoundtrip(ids: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("width", LongType), StructField("height", LongType),
      StructField("png_bytes", LongType),
      StructField("mean_r", DoubleType), StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val enc = RowEncoder.encoderFor(outSchema)
    ids.select(col(idCol).cast("long").as("id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val png = encodePng(id)
          val (w, h, sr, sg, sb) = decodePngSums(png)
          val n = (w * h).toDouble
          Row(id, w.toLong, h.toLong, png.length.toLong,
            sr / n, sg / n, sb / n)
        }
      }(enc)
      // png_bytes (the real compressed size) is decode-path-only
      // evidence the codec actually ran; it is NOT oracle-replicable
      // (zlib), so the query layer drops it and keeps a >0 check in the
      // spec. Means are exact rationals with denominator 256.
  }

  /** REAL image feature extraction (mm1): encode → ImageIO decode →
    * 2×2 quadrant-pooled grayscale sums — the pooled-patch feature shape
    * of an image front-end, integer-exact (gray = r+g+b, 0..765, summed
    * over each 8×8 quadrant) so DuckDB replays the formula per (x, y)
    * and any decode bug (stride, channel order) breaks the hash.
    * Output: (asset_id, media_type, feat_dim, f0..f3) with f_j the sum
    * over quadrant j = (y div 8)·2 + (x div 8). */
  def imageQuadFeatures(ids: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("media_type", StringType),
      StructField("feat_dim", LongType),
      StructField("f0", LongType), StructField("f1", LongType),
      StructField("f2", LongType), StructField("f3", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    ids.select(col(idCol).cast("long").as("id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val img = ImageIO.read(new ByteArrayInputStream(encodePng(id)))
          val q = new Array[Long](4)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              q((y / 8) * 2 + (x / 8)) +=
                ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
              x += 1
            }
            y += 1
          }
          Row(id, "image", 4L, q(0), q(1), q(2), q(3))
        }
      }(enc)
  }

  /** REAL perceptual hashing (mm4): for each id, render + PNG-encode +
    * decode BOTH the original and the perturbed variant, and compute the
    * classical average-hash over the decoded pixels — 8×8 grid of 2×2
    * pixel blocks, bit j set iff 64·blockGraySum_j > totalGraySum
    * (integer cross-multiply, no division, ties → 0). Returned as two
    * non-negative 32-bit halves [lo = blocks 0..31, hi = 32..63], the
    * d24 layout, so 4×16-bit disjoint bands give pigeonhole-exact
    * matching through Hamming 3 with no sign-extension in any engine.
    * Output: (asset_id = 2·id + variant, lo, hi). */
  def imageAHashes(ids: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("lo", LongType), StructField("hi", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    ids.select(col(idCol).cast("long").as("id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          Seq(false, true).map { perturb =>
            val img = ImageIO.read(
              new ByteArrayInputStream(encodePng(id, perturb)))
            val blocks = new Array[Long](64)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val p = img.getRGB(x, y)
                blocks((y / 2) * 8 + (x / 2)) +=
                  ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                x += 1
              }
              y += 1
            }
            val total = blocks.sum
            var lo = 0L
            var hi = 0L
            var j = 0
            while (j < 64) {
              if (64L * blocks(j) > total) {
                if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
              }
              j += 1
            }
            Row(2 * id + (if (perturb) 1L else 0L), lo, hi)
          }
        }
      }(enc)
  }

  /** REAL image resize (mm7): PNG encode → ImageIO decode →
    * nearest-neighbor downsample at integer coordinates (out(x,y) =
    * in(x·W/outW, y·H/outH) — floor division, the one resampling rule
    * an oracle can replay exactly; Graphics2D's filtered scalers are
    * real too but not bit-replayable) → RE-encode the resized image as
    * PNG → decode AGAIN → per-channel sums. Two full codec roundtrips
    * per row: a header/stride/palette bug in either direction shifts
    * the sums and breaks the hash. Output: (asset_id, width, height,
    * sum_r, sum_g, sum_b) of the RESIZED image. */
  def imageResizeRoundtrip(ids: DataFrame, idCol: String,
      outW: Int, outH: Int): DataFrame = {
    require(outW >= 1 && outH >= 1, "output dims must be positive")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("width", LongType), StructField("height", LongType),
      StructField("sum_r", LongType), StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    ids.select(col(idCol).cast("long").as("id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val src = ImageIO.read(new ByteArrayInputStream(encodePng(id)))
          val dst = new BufferedImage(outW, outH, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < outH) {
            var x = 0
            while (x < outW) {
              dst.setRGB(x, y,
                src.getRGB(x * src.getWidth / outW, y * src.getHeight / outH))
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(dst, "png", bos)
          val back = ImageIO.read(new ByteArrayInputStream(bos.toByteArray))
          var (sr, sg, sb) = (0L, 0L, 0L)
          var yy = 0
          while (yy < back.getHeight) {
            var xx = 0
            while (xx < back.getWidth) {
              val p = back.getRGB(xx, yy)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              xx += 1
            }
            yy += 1
          }
          Row(id, back.getWidth.toLong, back.getHeight.toLong, sr, sg, sb)
        }
      }(enc)
  }

  // ---------- WAV / RIFF PCM16 (public container, parsed directly) ----

  /** Synthetic audio geometry (50 ms @ 16 kHz mono PCM16). */
  val wavSamples = 800
  val wavRate = 16000

  /** Deterministic PCM16 sample at position `t` for `id` — full-range
    * integer "noise", exact in both engines' BIGINTs. */
  private def sampleAt(id: Long, t: Int): Int =
    (((id * 7919 + t.toLong * 104729) % 65536) - 32768).toInt

  private def putLE(b: Array[Byte], off: Int, v: Int, n: Int): Unit = {
    var i = 0
    while (i < n) { b(off + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
  }
  private def getLE(b: Array[Byte], off: Int, n: Int): Int = {
    var v = 0; var i = 0
    while (i < n) { v |= (b(off + i) & 0xff) << (8 * i); i += 1 }
    v
  }

  /** ENCODE: a complete RIFF/WAVE file — 44-byte canonical header
    * (RIFF size, fmt chunk: PCM, mono, rate, byte-rate, block-align,
    * 16 bit; data chunk) + little-endian samples. */
  def encodeWav(id: Long): Array[Byte] = {
    val dataLen = wavSamples * 2
    val b = new Array[Byte](44 + dataLen)
    "RIFF".getBytes.copyToArray(b, 0)
    putLE(b, 4, 36 + dataLen, 4)
    "WAVE".getBytes.copyToArray(b, 8)
    "fmt ".getBytes.copyToArray(b, 12)
    putLE(b, 16, 16, 4)       // fmt chunk size
    putLE(b, 20, 1, 2)        // PCM
    putLE(b, 22, 1, 2)        // mono
    putLE(b, 24, wavRate, 4)
    putLE(b, 28, wavRate * 2, 4) // byte rate
    putLE(b, 32, 2, 2)        // block align
    putLE(b, 34, 16, 2)       // bits per sample
    "data".getBytes.copyToArray(b, 36)
    putLE(b, 40, dataLen, 4)
    var t = 0
    while (t < wavSamples) {
      putLE(b, 44 + t * 2, sampleAt(id, t) & 0xffff, 2)
      t += 1
    }
    b
  }

  /** DECODE: validate the RIFF/WAVE/fmt/data magics, read the format
    * fields from the header (not assumed), and reduce the PCM16 samples
    * to (rate, nSamples, Σs², max|s|) — all integer-exact. */
  def decodeWavStats(bytes: Array[Byte]): (Int, Int, Long, Int) = {
    require(new String(bytes, 0, 4) == "RIFF" &&
      new String(bytes, 8, 4) == "WAVE" &&
      new String(bytes, 12, 4) == "fmt " &&
      new String(bytes, 36, 4) == "data", "not a canonical WAV")
    require(getLE(bytes, 20, 2) == 1 && getLE(bytes, 34, 2) == 16,
      "not PCM16")
    val rate = getLE(bytes, 24, 4)
    val dataLen = getLE(bytes, 40, 4)
    val n = dataLen / 2
    var sumSq = 0L; var peak = 0
    var t = 0
    while (t < n) {
      val s = getLE(bytes, 44 + t * 2, 2).toShort.toInt // sign-extend
      sumSq += s.toLong * s
      if (math.abs(s) > peak) peak = math.abs(s)
      t += 1
    }
    (rate, n, sumSq, peak)
  }

  /** REAL audio analysis-window segmentation (mm3): WAV encode → header
    * parse + PCM16 decode → overlapping windows of `winSamples` every
    * `hopSamples` over the DECODED samples, one row per window with its
    * integer energy Σs² — the MFCC/fbank framing front-end over a real
    * codec path (a real front-end would FFT the window; the framing
    * contract and the decode are the real parts, and the integer energy
    * is what DuckDB can replay from the sample formula). Windows start
    * while start + win ≤ nSamples (trailing partial dropped, standard
    * framing); the window loop runs inside the same mapPartitions pass
    * as the decode, so samples never leave the executor row.
    * Output: (asset_id, win_start, energy). */
  def audioWindowEnergy(ids: DataFrame, idCol: String,
      winSamples: Int, hopSamples: Int): DataFrame = {
    require(winSamples > 0 && hopSamples > 0, "window/hop must be positive")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("win_start", LongType),
      StructField("energy", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    ids.select(col(idCol).cast("long").as("id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = encodeWav(id)
          require(new String(bytes, 0, 4) == "RIFF" &&
            new String(bytes, 36, 4) == "data", "not a canonical WAV")
          val n = getLE(bytes, 40, 4) / 2
          val s = new Array[Int](n)
          var t = 0
          while (t < n) {
            s(t) = getLE(bytes, 44 + t * 2, 2).toShort.toInt
            t += 1
          }
          (0 to n - winSamples by hopSamples).map { start =>
            var e = 0L
            var i = start
            while (i < start + winSamples) {
              e += s(i).toLong * s(i)
              i += 1
            }
            Row(id, start.toLong, e)
          }
        }
      }(enc)
  }

  /** ids → real WAV encode → real header-parse + PCM decode → per-asset
    * RMS and peak. Same executor-local contract as the image path. */
  def audioCodecRoundtrip(ids: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("sample_rate", LongType),
      StructField("n_samples", LongType),
      StructField("rms", DoubleType),
      StructField("peak", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    ids.select(col(idCol).cast("long").as("id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (rate, n, sumSq, peak) = decodeWavStats(encodeWav(id))
          Row(id, rate.toLong, n.toLong,
            math.sqrt(sumSq.toDouble / n), peak.toLong)
        }
      }(enc)
  }
}
