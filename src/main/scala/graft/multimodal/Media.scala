package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed through batched
  * `mapPartitions` passes (the JVM analog of arrow-batched UDF execution:
  * one partition streams through in fixed-size batches, so a real decoder
  * would amortize model/codec setup per batch, not per row).
  *
  * IMAGE decode is REAL: payloads round-trip through the JDK's PNG codec
  * (`javax.imageio`, see [[Media.decodeImageStats]]). AUDIO decode is
  * REAL too: WAV containers parsed by the JDK's `javax.sound.sampled`
  * codec ([[Media.decodeAudioStats]]). VIDEO decode is REAL as well:
  * Motion-JPEG streams (the classic concatenated-JPEG container) are
  * split at JPEG end-of-image markers and every frame is parsed by the
  * JDK's actual JPEG codec ([[Media.decodeVideoStats]]). Everything
  * Spark-side is likewise real: schemas, encoders, partition batching,
  * frame sampling, resize arithmetic.
  *
  * Scale: payload processing is embarrassingly parallel (narrow map over
  * the scan); keep `spark.sql.files.maxPartitionBytes` sized so one
  * partition of payload bytes fits executor memory, and never collect
  * payloads to the driver.
  */
object Media {

  /** Typed metadata carried beside the opaque payload. */
  case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(media_id: Long, n_bytes: Int, first_byte: Int,
                           checksum: Long, features: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, frame_len: Int, frame_first_byte: Int)

  /** Wrap the documents table as a media corpus: the UTF-8 text bytes stand
    * in for an encoded payload; synthetic-but-deterministic dimensions. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        (col("n_chars") % 512 + 64).cast("int").as("width"),
        (col("n_chars") % 256 + 64).cast("int").as("height"),
        (col("n_chars") * 10).cast("long").as("durationMs")).as("meta"))

  // ---- real image decode (javax.imageio, zero extra dependencies) ------

  /** Deterministic 8-bit gray value for pixel (x, y) of image `id` — the
    * pure function both the PNG generator and the DuckDB oracle compute. */
  def pixelValue(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  /** Encode the deterministic `w`×`h` gray image for `id` as real PNG
    * bytes (lossless, so a decode round-trip recovers every pixel). */
  def encodePng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixelValue(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  case class ImageStats(media_id: Long, img_w: Int, img_h: Int,
                        px_sum: Long, px_min: Int, px_max: Int, corner: Int)

  /** REAL decode path for `kind = "image"`: each payload is parsed by the
    * JDK's PNG codec (`javax.imageio.ImageIO.read`) and reduced to pixel
    * statistics — the codec runs on the executor inside the same batched
    * `mapPartitions` shape as [[extractFeatures]], payloads never reach
    * the driver. This replaces [[decodeStub]] for images; audio/video
    * kinds keep the documented stub (no codecs for them in the JDK). */
  def decodeImageStats(media: Dataset[MediaRow],
                       batchSize: Int = 64): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup point (ImageIO reader reuse, model load, ...)
        batch.iterator.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          val raster = img.getRaster
          val (w, h) = (img.getWidth, img.getHeight)
          var (sum, mn, mx) = (0L, 256, -1)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = raster.getSample(x, y, 0)
              sum += v; if (v < mn) mn = v; if (v > mx) mx = v
              x += 1
            }
            y += 1
          }
          ImageStats(r.media_id, w, h, sum, mn, mx, raster.getSample(0, 0, 0))
        }
      }
    }
  }

  // ---- real audio decode (javax.sound.sampled, zero extra deps) --------

  /** Deterministic 16-bit PCM sample `i` of clip `id` — the pure function
    * both the WAV generator and the DuckDB oracle compute. Range is the
    * full signed-16 span [-32768, 32767]. */
  def sampleValue(id: Long, i: Int): Int =
    ((id * 131 + i.toLong * 17) % 65536 - 32768).toInt

  /** Encode the deterministic `n`-sample clip for `id` as a real WAV file
    * (PCM 16-bit signed little-endian mono @ 8 kHz) via the JDK's
    * `javax.sound.sampled` writer — lossless, so a decode round-trip
    * recovers every sample. */
  def encodeWav(id: Long, n: Int, sampleRate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = sampleValue(id, i)
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1,
      /*signed=*/ true, /*bigEndian=*/ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  case class AudioStats(media_id: Long, n_samples: Int, sample_rate: Int,
                        amp_sum: Long, amp_min: Int, amp_max: Int,
                        first_sample: Int)

  /** REAL decode path for `kind = "audio"`: each payload is parsed by the
    * JDK's WAV codec (`AudioSystem.getAudioInputStream` reads the RIFF
    * header and yields the PCM frames) and reduced to amplitude
    * statistics — executor-side, batched like [[decodeImageStats]],
    * payloads never reach the driver. Handles either endianness as the
    * container declares it. */
  def decodeAudioStats(media: Dataset[MediaRow],
                       batchSize: Int = 64): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup point (codec/resampler reuse at production scale)
        batch.iterator.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"expected 16-bit mono PCM, got $fmt")
          val bytes = try ais.readAllBytes() finally ais.close()
          val n = bytes.length / 2
          var (sum, mn, mx, first) = (0L, Int.MaxValue, Int.MinValue, 0)
          var i = 0
          while (i < n) {
            val v =
              if (fmt.isBigEndian) (bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xFF)
              else (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xFF)
            if (i == 0) first = v
            sum += math.abs(v.toLong); if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          AudioStats(r.media_id, n, fmt.getSampleRate.toInt, sum,
            if (n == 0) 0 else mn, if (n == 0) 0 else mx, first)
        }
      }
    }
  }

  // ---- real video decode (Motion-JPEG via javax.imageio, zero deps) ----

  /** Deterministic gray level of frame `i` of clip `id` — the pure
    * function the MJPEG generator, the decoder's oracle and the DuckDB
    * SQL all compute. */
  def frameLevel(id: Long, i: Int): Int = ((id * 37 + i * 11) % 256).toInt

  /** Encode the deterministic `frames`-frame clip for `id` as a real
    * Motion-JPEG stream: each frame is a uniform-gray `w`×`h` JPEG at
    * quality 1.0, frames concatenated back-to-back — the classic MJPEG
    * container. Uniform gray frames survive JPEG's lossy DCT pipeline
    * EXACTLY (every AC coefficient is zero and the quality-1.0 DC
    * quantization step is 1), so the decode round-trip is bit-faithful —
    * which is what lets a SQL oracle check the real codec path. */
  def encodeMjpeg(id: Long, frames: Int, w: Int = 8, h: Int = 8): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < frames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val level = frameLevel(id, i)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, level); x += 1 }
        y += 1
      }
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        val p = writer.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(1.0f)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { writer.dispose(); ios.close() }
      i += 1
    }
    bos.toByteArray
  }

  /** Split an MJPEG stream into its JPEG frames at end-of-image markers
    * (`FF D9`). Exact for baseline JPEG: byte stuffing guarantees `FF`
    * inside entropy-coded data is always followed by `00` or an RST
    * marker, so `FF D9` occurs only as a frame terminator. */
  def splitMjpegFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var start = 0
    var i = 0
    while (i < payload.length - 1) {
      if (payload(i) == 0xFF.toByte && payload(i + 1) == 0xD9.toByte) {
        out += java.util.Arrays.copyOfRange(payload, start, i + 2)
        start = i + 2
        i += 2
      } else i += 1
    }
    out.toSeq
  }

  case class VideoStats(media_id: Long, n_frames: Int, frame_w: Int,
                        frame_h: Int, level_sum: Long, level_min: Int,
                        level_max: Int, first_level: Int)

  /** REAL decode path for `kind = "video"`: the MJPEG payload is split
    * into frames and EVERY frame is parsed by the JDK's actual JPEG
    * codec (`javax.imageio`), executor-side in the same batched
    * `mapPartitions` shape as [[decodeImageStats]]. The per-frame level
    * is derived from a full raster scan — `level_min`/`level_max` range
    * over every pixel of every frame, so a single mis-decoded pixel
    * anywhere in the clip diverges from the oracle. */
  def decodeVideoStats(media: Dataset[MediaRow],
                       batchSize: Int = 64): Dataset[VideoStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup point (decoder reuse at production scale)
        batch.iterator.map { r =>
          val frames = splitMjpegFrames(r.payload)
          var (sum, mn, mx, first) = (0L, Int.MaxValue, Int.MinValue, -1)
          var (fw, fh) = (0, 0)
          frames.zipWithIndex.foreach { case (bytes, idx) =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            val raster = img.getRaster
            fw = img.getWidth; fh = img.getHeight
            var frameSum = 0L
            var y = 0
            while (y < fh) {
              var x = 0
              while (x < fw) {
                val v = raster.getSample(x, y, 0)
                frameSum += v; if (v < mn) mn = v; if (v > mx) mx = v
                x += 1
              }
              y += 1
            }
            val level = (frameSum / (fw.toLong * fh)).toInt
            if (idx == 0) first = level
            sum += level
          }
          VideoStats(r.media_id, frames.size, fw, fh, sum,
            if (frames.isEmpty) 0 else mn, if (frames.isEmpty) 0 else mx, first)
        }
      }
    }
  }

  /** Deterministic byte-histogram features (`dim` buckets, L1-normalized)
    * — the stand-in embedding for payloads with no semantic model in
    * this container; the decode paths above are the real codecs. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val counts = new Array[Int](dim)
    payload.foreach(b => counts((b & 0xFF) % dim) += 1)
    val n = math.max(payload.length, 1).toFloat
    counts.map(_ / n)
  }

  /** Resize STUB: only the dimension arithmetic (longest side → maxSide,
    * aspect preserved, integer floor) — no pixels to touch here. */
  def resizeDims(width: Int, height: Int, maxSide: Int): (Int, Int) = {
    val longest = math.max(width, height)
    (width * maxSide / longest, height * maxSide / longest)
  }

  /** Frame boundaries for sampling `frames` evenly-sized chunks: frame i
    * covers [i*n/frames, (i+1)*n/frames) — exact cover, no overlap. */
  def frameOffsets(nBytes: Int, frames: Int): Seq[(Int, Int)] =
    (0 until frames).map(i => (i * nBytes / frames, (i + 1) * nBytes / frames))

  /** Batched feature extraction: each partition streams through in
    * `batchSize` groups (decoder setup would happen once per batch). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (codec init, model load)
        batch.iterator.map { r =>
          val p = r.payload
          MediaFeatures(
            media_id = r.media_id,
            n_bytes = p.length,
            first_byte = if (p.isEmpty) -1 else p(0) & 0xFF,
            checksum = p.foldLeft(0L)((acc, b) => acc + (b & 0xFF)),
            features = decodeStub(p, dim))
        }
      }
    }
  }

  case class AudioWindow(media_id: Long, window_idx: Int, n_samples: Int,
                         energy: Long)

  /** Audio-style windowed energy: the payload read as PCM-like 8-bit
    * samples, fixed `windowLen` windows at `hop` stride, energy =
    * Σ (sample−128)² per window. Same executor-side batched shape as
    * [[frameSample]] — a real pipeline decodes compressed audio first
    * (the documented stub); windows never leave the executor. */
  def audioWindows(media: Dataset[MediaRow], windowLen: Int = 256,
                   hop: Int = 128): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val p = r.payload
      val n = p.length
      if (n <= 0) Seq.empty[AudioWindow]
      else (0 until math.max(n - windowLen + 1, 1) by hop).zipWithIndex.map {
        case (st, i) =>
          val end = math.min(st + windowLen, n)
          var e = 0L
          var j = st
          while (j < end) { val v = (p(j) & 0xFF) - 128; e += v.toLong * v; j += 1 }
          AudioWindow(r.media_id, i, end - st, e)
      }
    }
  }

  /** Sample `frames` pseudo-frames per payload (video frame-sample shape):
    * emits offsets/length/first-byte, payload bytes stay on the executor. */
  def frameSample(media: Dataset[MediaRow], frames: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      frameOffsets(r.payload.length, frames).zipWithIndex.map {
        case ((s, e), i) =>
          Frame(r.media_id, i, e - s,
            if (e > s) r.payload(s) & 0xFF else -1)
      }
    }
  }
}
