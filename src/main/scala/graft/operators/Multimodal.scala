package graft.operators

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** A decoded still image: real dimensions and format from the byte stream,
  * plus raster witnesses — corner pixels as rrggbb hex and the whole-raster
  * channel sum — that only an actual pixel decode can produce. */
final case class ImageDecoded(id: Long, format: String, width: Long, height: Long,
                              px00: String, pxc: String, px_sum: Long)

/** One decoded animation frame (GIF): per-frame dimensions + pixel witness. */
final case class FrameDecoded(id: Long, frame_idx: Long, width: Long, height: Long,
                              px: String)

/** A resized image re-encoded as PNG — real pixels, decodable downstream. */
final case class ResizedImage(id: Long, width: Long, height: Long, payload: Array[Byte])

/** A 64-bit perceptual difference hash (dHash) of a decoded raster. */
final case class DHashed(id: Long, dhash: Long)

/** Decoded PCM audio: container header fields + the exact sample sum. */
final case class WavDecoded(id: Long, sample_rate: Long, channels: Long, bits: Long,
                            n_frames: Long, sample_sum: Long)

/** Per-frame audio features over decoded PCM: energy (exact integer sum of
  * squares) and zero-crossing count — the classic cheap speech/music/silence
  * signals a pipeline computes right after decode. */
final case class WavFrameFeatures(id: Long, frame_idx: Long, n_samples: Long,
                                  sum_sq: Long, n_zero_cross: Long)

/** A 64-bit audio fingerprint: sign-of-delta over the PCM energy envelope. */
final case class WavHashed(id: Long, whash: Long)

/** A synthesized media payload (real encoded bytes). */
final case class MediaPayload(id: Long, payload: Array[Byte])

/**
 * Multimodal columns: image/audio payloads as opaque `binary` columns with
 * REAL codec passes over them — PNG/GIF decode, pixel-level resize, animation
 * frame extraction, and WAV PCM decode — using only the JDK's built-in codecs
 * (`javax.imageio`, `javax.sound.sampled`), no external dependencies, fully
 * headless. Video remains out of reach in this environment (the JDK ships no
 * video codec); everything else here runs real bytes end to end.
 *
 * Correctness story: the synth* generators render deterministic media whose
 * pixel/sample values are closed-form functions of the row id, so a DuckDB
 * oracle can compute the EXPECTED decode output (dimensions, corner pixels,
 * whole-raster checksums, sample sums) from the id alone — while the Spark
 * side must round-trip actual encoded bytes through the codec to produce the
 * same values. PNG is lossless and WAV is uncompressed PCM, so round trips
 * are exact; GIF frames are written against an explicit palette containing
 * exactly the frame color, so they round-trip exactly too.
 *
 * Scale notes: payload bytes never leave the executors (no driver collect);
 * every codec pass is a narrow `mapPartitions` (zero shuffle) with the codec
 * invoked per row inside the partition iterator — the same integration shape
 * a JNI/FFI decoder (video, EXIF, resampling libraries) slots into. Metadata
 * -only queries prune the payload column at the parquet scan, so
 * `SELECT meta FROM media` never reads the blobs.
 */
object Multimodal {

  // These images are tiny and in-memory end to end: never let ImageIO spool
  // its streams through java.io.tmpdir (the default FILE cache costs a temp
  // file per encode/decode — a hidden per-row disk IO — and fails the whole
  // task on transient /tmp trouble, observed as sf1 bench crashes). Runs once
  // per JVM when the object first loads on an executor.
  ImageIO.setUseCache(false)

  /** Attach a binary payload column. In production this is the raw media blob
    * column of the table; here we derive bytes from a string column so the
    * byte-level plumbing is exercisable on the text testdata. */
  def withPayload(df: DataFrame, src: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, encode(col(src), "UTF-8"))

  /** Byte-level metadata, no decode: size, content hash, leading-bytes magic.
    * Pure expressions — runs inside the scan stage. */
  def extractMeta(df: DataFrame, key: String, payloadCol: String = "payload"): DataFrame =
    df.select(
      col(key).as("id"),
      length(col(payloadCol)).cast("long").as("n_bytes"),
      lower(hex(substring(col(payloadCol), 1, 4))).as("magic"),
      md5(col(payloadCol)).as("content_md5"))

  // ---------------------------------------------------------------------
  // Deterministic synthetic media (the oracle-checkable fixtures)
  // ---------------------------------------------------------------------

  /** Gradient pixel of the synthetic image for row `id`: channels are
    * closed-form in (id, x, y) so an SQL oracle can recompute any pixel. */
  @inline private def gradPixel(id: Long, x: Int, y: Int): Int = {
    val r = ((id + x) % 256).toInt
    val g = ((id + y) % 256).toInt
    val b = ((id + x + y) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  private def hex6(rgb: Int): String = f"${rgb & 0xffffff}%06x"

  /** Render the id-derived gradient as a real PNG: width = 4 + id%13,
    * height = 3 + id%11, pixel(x,y) = ((id+x)%256, (id+y)%256, (id+x+y)%256).
    * PNG is lossless, so a decode must read back exactly these values. */
  def synthPng(df: DataFrame, key: String): Dataset[MediaPayload] =
    df.select(col(key).cast("long")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (4 + id % 13).toInt
        val h = (3 + id % 11).toInt
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, gradPixel(id, x, y)); x += 1 }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(img, "png", bos)
        MediaPayload(id, bos.toByteArray)
      }
    }(Encoders.product[MediaPayload])

  /** Render an id-derived animated GIF: 1 + id%4 frames of 5×4 solid color
    * ((id+f)%256, (id+2f)%256, (id+3f)%256) for frame f. Each frame carries
    * an explicit 1-bit palette holding exactly its color, so GIF's palette
    * quantization is a no-op and the round trip is exact. */
  def synthGif(df: DataFrame, key: String): Dataset[MediaPayload] =
    df.select(col(key).cast("long")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val nf = (1 + id % 4).toInt
        val bos = new ByteArrayOutputStream()
        val ios = ImageIO.createImageOutputStream(bos)
        val wr = ImageIO.getImageWritersByFormatName("gif").next()
        try {
          wr.setOutput(ios)
          wr.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val rc = ((id + f) % 256).toByte
            val gc = ((id + 2L * f) % 256).toByte
            val bc = ((id + 3L * f) % 256).toByte
            val icm = new IndexColorModel(1, 2,
              Array(rc, 0.toByte), Array(gc, 0.toByte), Array(bc, 0.toByte))
            val fr = new BufferedImage(5, 4, BufferedImage.TYPE_BYTE_BINARY, icm)
            wr.writeToSequence(new IIOImage(fr, null, null), null)
            f += 1
          }
          wr.endWriteSequence()
        } finally { wr.dispose(); ios.close() }
        MediaPayload(id, bos.toByteArray)
      }
    }(Encoders.product[MediaPayload])

  /** Render id-derived 16-bit mono PCM as a real WAV container:
    * 100 + id%50 samples at 8 kHz, sample i = (id·31 + i·17) % 20001 − 10000.
    * WAV PCM is uncompressed — decode reads back the exact samples. */
  def synthWav(df: DataFrame, key: String): Dataset[MediaPayload] =
    df.select(col(key).cast("long")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val ns = (100 + id % 50).toInt
        val pcm = new Array[Byte](ns * 2)
        var i = 0
        while (i < ns) {
          val s = ((id * 31 + i * 17L) % 20001 - 10000).toShort
          pcm(2 * i) = (s & 255).toByte
          pcm(2 * i + 1) = ((s >> 8) & 255).toByte
          i += 1
        }
        val fmt = new AudioFormat(8000f, 16, 1, true, false)
        val bos = new ByteArrayOutputStream()
        AudioSystem.write(
          new AudioInputStream(new ByteArrayInputStream(pcm), fmt, ns.toLong),
          AudioFileFormat.Type.WAVE, bos)
        MediaPayload(id, bos.toByteArray)
      }
    }(Encoders.product[MediaPayload])

  // ---------------------------------------------------------------------
  // Real decode passes
  // ---------------------------------------------------------------------

  /** Channel sum + corner pixels of a decoded raster — the witnesses an SQL
    * oracle recomputes in closed form from the generator. */
  private def rasterWitness(id: Long, img: BufferedImage, format: String): ImageDecoded = {
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sum += ((p >> 16) & 255) + ((p >> 8) & 255) + (p & 255)
        x += 1
      }
      y += 1
    }
    ImageDecoded(id, format, w.toLong, h.toLong,
      hex6(img.getRGB(0, 0)), hex6(img.getRGB(w - 1, h - 1)), sum)
  }

  /**
   * REAL image decode over a binary payload column via `javax.imageio`:
   * format name from the registered reader that claims the byte stream
   * (PNG/JPEG/GIF/BMP ship with the JDK), true dimensions, and pixel-level
   * witnesses (corner pixels, whole-raster channel sum) from the decoded
   * raster. Undecodable payloads yield a (id, "unreadable", 0, 0, "", "", 0)
   * row instead of failing the task — corrupt blobs are a fact of life in a
   * crawled corpus; downstream filters on `format`.
   */
  def decodeImage(df: DataFrame, key: String,
                  payloadCol: String = "payload"): Dataset[ImageDecoded] =
    df.select(col(key).cast("long"), col(payloadCol)).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        try {
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) ImageDecoded(id, "unreadable", 0L, 0L, "", "", 0L)
          else {
            val rd = readers.next()
            try {
              rd.setInput(iis)
              rasterWitness(id, rd.read(0), rd.getFormatName.toLowerCase)
            } finally rd.dispose()
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            ImageDecoded(id, "unreadable", 0L, 0L, "", "", 0L)
        }
      }
    }(Encoders.product[ImageDecoded])

  /**
   * REAL animation frame extraction: decode every frame of a GIF payload —
   * `ImageReader.getNumImages` walks the actual byte stream — and emit one
   * row per frame with its decoded dimensions and top-left pixel. The flat
   * (id, frame_idx) output is the shape a downstream frame-sampling join
   * (`frame_idx % k = 0`) or a per-frame featurizer consumes.
   */
  def decodeFrames(df: DataFrame, key: String,
                   payloadCol: String = "payload"): Dataset[FrameDecoded] =
    df.select(col(key).cast("long"), col(payloadCol)).flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      try {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Seq.empty[FrameDecoded]
        else {
          val rd = readers.next()
          try {
            rd.setInput(iis)
            val n = rd.getNumImages(true)
            (0 until n).map { f =>
              val img = rd.read(f)
              FrameDecoded(id, f.toLong, img.getWidth.toLong, img.getHeight.toLong,
                hex6(img.getRGB(0, 0)))
            }
          } finally rd.dispose()
        }
      } catch { case scala.util.control.NonFatal(_) => Seq.empty[FrameDecoded] }
    }(Encoders.product[FrameDecoded])

  /**
   * REAL pixel resize: decode the payload, resample to `targetW`×`targetH`
   * by nearest neighbor — dst(x,y) = src(⌊x·w/targetW⌋, ⌊y·h/targetH⌋), the
   * one resampling kernel that is bit-deterministic and SQL-recomputable
   * (area-average/bilinear round differently across runtimes) — and
   * re-encode as PNG, so the output payload is itself decodable downstream.
   * Undecodable inputs are dropped (countable via [[decodeImage]]).
   */
  def resizeImage(df: DataFrame, key: String, targetW: Int, targetH: Int,
                  payloadCol: String = "payload"): Dataset[ResizedImage] = {
    require(targetW > 0 && targetH > 0, s"bad target ${targetW}x$targetH")
    df.select(col(key).cast("long"), col(payloadCol)).flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      try {
        val src = ImageIO.read(new ByteArrayInputStream(bytes))
        if (src == null) None
        else {
          val w = src.getWidth
          val h = src.getHeight
          val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < targetH) {
            val sy = y * h / targetH
            var x = 0
            while (x < targetW) {
              dst.setRGB(x, y, src.getRGB(x * w / targetW, sy))
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(dst, "png", bos)
          Some(ResizedImage(id, targetW.toLong, targetH.toLong, bos.toByteArray))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }(Encoders.product[ResizedImage])
  }

  /**
   * 64-bit perceptual DIFFERENCE HASH (dHash) of each image payload — the
   * standard cheap image near-dup signature: decode, downsample the raster
   * to a 9×8 grayscale grid by nearest neighbor (the one bit-deterministic,
   * SQL-recomputable kernel — the [[resizeImage]] rule), and set bit
   * `y·8 + x` iff gray(x+1, y) > gray(x, y). Gray is the integer BT.601
   * luma `299·r + 587·g + 114·b` (×1000, no division — exact in both
   * engines). Visually similar images differ in few bits, so near-dup pairs
   * come from Hamming banding over this hash
   * ([[graft.operators.Dedup.hammingPairs64]]) — wiring the multimodal
   * decode path into the same dedup lifecycle as the text families.
   * Undecodable payloads are dropped (countable via [[decodeImage]]).
   *
   * Deterministic pixel math end to end, so on the synth gradient fixture
   * the hash is oracle-recomputable in closed form from the id alone
   * (`mm_dhash_docs` hash-verifies it, the mm_decode witness style).
   */
  def dHash(df: DataFrame, key: String,
            payloadCol: String = "payload"): Dataset[DHashed] =
    df.select(col(key).cast("long"), col(payloadCol)).flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      try {
        val src = ImageIO.read(new ByteArrayInputStream(bytes))
        if (src == null) None
        else {
          val w = src.getWidth
          val h = src.getHeight
          var hash = 0L
          var y = 0
          while (y < 8) {
            val sy = y * h / 8
            var gPrev = 0L
            var x = 0
            while (x < 9) {
              val p = src.getRGB(x * w / 9, sy)
              val g = 299L * ((p >> 16) & 255) + 587L * ((p >> 8) & 255) +
                114L * (p & 255)
              if (x > 0 && g > gPrev) hash |= 1L << (y * 8 + (x - 1))
              gPrev = g
              x += 1
            }
            y += 1
          }
          Some(DHashed(id, hash))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }(Encoders.product[DHashed])

  /**
   * REAL audio decode via `javax.sound.sampled`: parse the WAV container
   * header (sample rate, channels, bit depth, frame count) and fold the
   * decoded 16-bit little-endian PCM samples into an exact sum — the audio
   * analogue of [[decodeImage]]'s raster checksum. Unparseable payloads
   * yield an all-zero row with sample_rate 0 (filter on it downstream).
   */
  /**
   * REAL audio FEATURE extraction: decode the WAV PCM and fold each
   * `frameSize`-sample frame into (energy = Σ s², zero crossings = sign
   * flips between consecutive samples within the frame) — the step after
   * [[decodeWav]] that a speech/music/silence gate consumes. Both features
   * are exact integer arithmetic, so the oracle recomputes them in closed
   * form from the synth formula. A sample is "non-negative" for crossing
   * purposes when s >= 0. Unparseable payloads emit nothing.
   */
  def wavFrameFeatures(df: DataFrame, key: String, frameSize: Int,
                       payloadCol: String = "payload"): Dataset[WavFrameFeatures] = {
    require(frameSize > 0, s"frameSize must be positive, got $frameSize")
    df.select(col(key).cast("long"), col(payloadCol)).flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      try {
        val ain = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        try {
          val pcm = ain.readAllBytes()
          val ns = pcm.length / 2
          val nf = (ns + frameSize - 1) / frameSize
          (0 until nf).map { f =>
            val lo = f * frameSize
            val hi = math.min(lo + frameSize, ns)
            var sumSq = 0L
            var zc = 0L
            var prevNonNeg = false
            var i = lo
            while (i < hi) {
              val s = ((pcm(2 * i) & 255) | (pcm(2 * i + 1) << 8)).toShort
              sumSq += s.toLong * s.toLong
              val nonNeg = s >= 0
              if (i > lo && nonNeg != prevNonNeg) zc += 1
              prevNonNeg = nonNeg
              i += 1
            }
            WavFrameFeatures(id, f.toLong, (hi - lo).toLong, sumSq, zc)
          }
        } finally ain.close()
      } catch { case scala.util.control.NonFatal(_) => Seq.empty[WavFrameFeatures] }
    }(Encoders.product[WavFrameFeatures])
  }

  /**
   * 64-bit audio fingerprint — the [[dHash]] recipe applied to the decoded
   * PCM's energy envelope: the samples split into 65 segments by the
   * nearest-neighbor boundary rule (segment j covers samples
   * [j·ns/65, (j+1)·ns/65), integer division — the [[resizeImage]] kernel in
   * one dimension), each segment folds to an exact integer energy Σ s², and
   * bit j (0..63) is set iff energy(j+1) > energy(j). Sign-of-delta over an
   * energy envelope is robust to gain changes (scaling all samples scales
   * every segment energy by the same factor, preserving each comparison), the
   * property an audio near-dup signature needs. Similar clips differ in few
   * bits, so near-dup pairs come from the SAME 64-bit Hamming banding as
   * images and text SimHash ([[graft.operators.Dedup.hammingPairs64]]) —
   * completing the image/audio symmetry of the dedup lifecycle.
   *
   * Deterministic integer math end to end, so on the [[synthWav]] fixture the
   * hash is oracle-recomputable in closed form from the id alone
   * (`mm_wav_hash_docs`). Unparseable payloads emit nothing (countable via
   * [[decodeWav]]'s sample_rate=0 rows).
   */
  def wavHash(df: DataFrame, key: String,
              payloadCol: String = "payload"): Dataset[WavHashed] =
    df.select(col(key).cast("long"), col(payloadCol)).flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      try {
        val ain = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        try {
          val pcm = ain.readAllBytes()
          val ns = pcm.length / 2
          val energies = new Array[Long](65)
          var j = 0
          while (j < 65) {
            var e = 0L
            var i = j * ns / 65
            val hi = (j + 1) * ns / 65
            while (i < hi) {
              val s = ((pcm(2 * i) & 255) | (pcm(2 * i + 1) << 8)).toShort
              e += s.toLong * s
              i += 1
            }
            energies(j) = e
            j += 1
          }
          var hash = 0L
          var b = 0
          while (b < 64) {
            if (energies(b + 1) > energies(b)) hash |= 1L << b
            b += 1
          }
          Some(WavHashed(id, hash))
        } finally ain.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }(Encoders.product[WavHashed])

  def decodeWav(df: DataFrame, key: String,
                payloadCol: String = "payload"): Dataset[WavDecoded] =
    df.select(col(key).cast("long"), col(payloadCol)).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        try {
          val ain = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
          try {
            val fmt = ain.getFormat
            val pcm = ain.readAllBytes()
            var sum = 0L
            var i = 0
            while (i + 1 < pcm.length) {
              sum += ((pcm(i) & 255) | (pcm(i + 1) << 8)).toShort
              i += 2
            }
            WavDecoded(id, fmt.getSampleRate.toLong, fmt.getChannels.toLong,
              fmt.getSampleSizeInBits.toLong, ain.getFrameLength, sum)
          } finally ain.close()
        } catch {
          case scala.util.control.NonFatal(_) => WavDecoded(id, 0L, 0L, 0L, 0L, 0L)
        }
      }
    }(Encoders.product[WavDecoded])
}
