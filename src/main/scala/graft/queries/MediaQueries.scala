package graft.queries

import graft.core.Tables
import graft.multimodal.Media
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing as oracle-checked queries. The payloads are the
  * documents' UTF-8 bytes (pure ASCII corpus, so DuckDB can replay the
  * byte arithmetic from the text column): feature extraction and frame
  * sampling run through the typed `mapPartitions` path in
  * [[graft.multimodal.Media]], and the oracle recomputes the same
  * integers character-wise.
  */
object MediaQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Batched feature extraction + resize arithmetic over binary payloads.
    "q41_media_features" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val media = Media.fromDocuments(docs).as[Media.MediaRow]
      val feats = Media.extractFeatures(media).drop("features")
      val dims = Media.fromDocuments(docs)
        .select(col("media_id"), col("meta.width").as("w"), col("meta.height").as("h"))
        .select(col("media_id"),
          (col("w") * 128 / greatest(col("w"), col("h"))).cast("int").as("rs_width"),
          (col("h") * 128 / greatest(col("w"), col("h"))).cast("int").as("rs_height"))
      feats.join(dims, "media_id")
    }),

    // Video-style frame sampling: 4 even chunks per payload.
    "q42_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val media = Media.fromDocuments(Tables.load(s, dir, "documents"))
        .as[Media.MediaRow]
      Media.frameSample(media, frames = 4).toDF()
    }),

    // REAL image decode: a deterministic 16×16 gray PNG is generated per
    // doc, decoded back through the JDK's actual PNG codec on the
    // executors, and reduced to pixel stats. The oracle replays the pixel
    // formula directly — if the codec round-trip dropped or shifted one
    // pixel, the hashes would disagree.
    "q70_image_decode" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .map(id => Media.MediaRow(id, "image", Media.encodePng(id, 16, 16),
          Media.MediaMeta("image/png", 16, 16, 0L)))
      Media.decodeImageStats(media).toDF()
    }),

    // REAL audio decode: a deterministic 16-bit PCM WAV clip is generated
    // per doc (256 + doc_id % 256 samples), parsed back through the JDK's
    // actual WAV codec on the executors, and reduced to amplitude stats.
    // The oracle replays the sample formula directly — a one-byte header
    // misparse or endianness slip would flip every hash.
    "q76_audio_decode" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .map(id => Media.MediaRow(id, "audio",
          Media.encodeWav(id, 256 + (id % 256).toInt),
          Media.MediaMeta("audio/wav", 0, 0, 0L)))
      Media.decodeAudioStats(media).toDF()
    }),

    // REAL video decode: a deterministic Motion-JPEG clip (3 + doc_id % 4
    // uniform-gray 8×8 frames, quality-1.0 JPEG — exact round-trip) is
    // generated per doc, split at JPEG EOI markers and every frame parsed
    // back through the JDK's actual JPEG codec on the executors. The
    // oracle replays the frame-level formula directly — a marker-scan
    // slip, a dropped frame, or one mis-decoded pixel flips the hash.
    "q100_video_decode" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .map(id => Media.MediaRow(id, "video",
          Media.encodeMjpeg(id, 3 + (id % 4).toInt),
          Media.MediaMeta("video/x-motion-jpeg", 8, 8, 0L)))
      Media.decodeVideoStats(media).toDF()
    }),

    // Audio-style windowed energy: 256-sample windows, 128 hop.
    "q67_audio_windows" -> ((s, dir) => {
      import s.implicits._
      val media = Media.fromDocuments(Tables.load(s, dir, "documents"))
        .as[Media.MediaRow]
      Media.audioWindows(media, windowLen = 256, hop = 128).toDF()
    }))

  val oracles: Map[String, String] = Map(
    "q41_media_features" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
        |  CAST(n_chars % 512 + 64 AS INT) AS w, CAST(n_chars % 256 + 64 AS INT) AS h
        |FROM documents)
        |SELECT media_id, CAST(length(text) AS INT) AS n_bytes,
        | CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
        | CAST(list_sum(list_transform(range(1, length(text) + 1),
        |   i -> ascii(substr(text, i, 1)))) AS BIGINT) AS checksum,
        | CAST(w * 128 // greatest(w, h) AS INT) AS rs_width,
        | CAST(h * 128 // greatest(w, h) AS INT) AS rs_height
        |FROM m""".stripMargin,
    "q42_frame_sample" ->
      """WITH f AS (SELECT doc_id AS media_id, text, length(text) AS n,
        |  unnest([0, 1, 2, 3]) AS frame_idx FROM documents)
        |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
        | CAST(((frame_idx + 1) * n // 4) - (frame_idx * n // 4) AS INT) AS frame_len,
        | CAST(CASE WHEN ((frame_idx + 1) * n // 4) > (frame_idx * n // 4)
        |      THEN ascii(substr(text, (frame_idx * n // 4) + 1, 1))
        |      ELSE -1 END AS INT) AS frame_first_byte
        |FROM f""".stripMargin,
    "q70_image_decode" ->
      """WITH px AS (SELECT doc_id AS media_id,
        |  list_transform(range(0, 256),
        |    i -> (doc_id * 31 + (i % 16) * 7 + (i // 16) * 13) % 256) AS ps
        |FROM documents)
        |SELECT media_id, CAST(16 AS INT) AS img_w, CAST(16 AS INT) AS img_h,
        | CAST(list_sum(ps) AS BIGINT) AS px_sum,
        | CAST(list_min(ps) AS INT) AS px_min,
        | CAST(list_max(ps) AS INT) AS px_max,
        | CAST(media_id * 31 % 256 AS INT) AS corner
        |FROM px""".stripMargin,
    "q76_audio_decode" ->
      """WITH s AS (SELECT doc_id AS media_id, 256 + doc_id % 256 AS n,
        |  list_transform(range(0, 256 + doc_id % 256),
        |    i -> (doc_id * 131 + i * 17) % 65536 - 32768) AS vs
        |FROM documents)
        |SELECT media_id, CAST(n AS INT) AS n_samples,
        | CAST(8000 AS INT) AS sample_rate,
        | CAST(list_sum(list_transform(vs, v -> abs(v))) AS BIGINT) AS amp_sum,
        | CAST(list_min(vs) AS INT) AS amp_min,
        | CAST(list_max(vs) AS INT) AS amp_max,
        | CAST(media_id * 131 % 65536 - 32768 AS INT) AS first_sample
        |FROM s""".stripMargin,
    "q100_video_decode" ->
      """WITH v AS (SELECT doc_id AS media_id, 3 + doc_id % 4 AS nf,
        |  list_transform(range(0, 3 + doc_id % 4),
        |    i -> (doc_id * 37 + i * 11) % 256) AS ls
        |FROM documents)
        |SELECT media_id, CAST(nf AS INT) AS n_frames,
        | CAST(8 AS INT) AS frame_w, CAST(8 AS INT) AS frame_h,
        | CAST(list_sum(ls) AS BIGINT) AS level_sum,
        | CAST(list_min(ls) AS INT) AS level_min,
        | CAST(list_max(ls) AS INT) AS level_max,
        | CAST(media_id * 37 % 256 AS INT) AS first_level
        |FROM v""".stripMargin,
    "q67_audio_windows" ->
      """WITH d AS (SELECT doc_id AS media_id, text, length(text) AS n
        |           FROM documents WHERE length(text) > 0),
        |w AS (SELECT media_id, text, n,
        |        unnest(range(0, greatest(n - 255, 1), 128)) AS st
        |      FROM d)
        |SELECT media_id, CAST(st // 128 AS INT) AS window_idx,
        | CAST(least(st + 256, n) - st AS INT) AS n_samples,
        | CAST(list_sum(list_transform(range(st + 1, least(st + 256, n) + 1),
        |   i -> CAST(ascii(substr(text, i, 1)) - 128 AS BIGINT)
        |        * (ascii(substr(text, i, 1)) - 128))) AS BIGINT) AS energy
        |FROM w""".stripMargin)
}
