package graft.multimodal

import graft.SparkSpec

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private val payload = "hello world".getBytes("UTF-8")
  private def row(id: Long, p: Array[Byte]) =
    Media.MediaRow(id, "image", p, Media.MediaMeta("fake/raw", 100, 50, 1000L))

  test("PNG encode -> real ImageIO decode round-trips every pixel") {
    // direct codec round-trip, no Spark: lossless gray PNG
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Media.encodePng(7L, 16, 16)))
    assert(img.getWidth == 16 && img.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 16)
      assert(img.getRaster.getSample(x, y, 0) == Media.pixelValue(7L, x, y),
        s"pixel ($x,$y) lost in the codec round-trip")

    // distributed path: stats computed from DECODED pixels match the formula
    val media = Seq(3L, 4L).toDS()
      .map(id => Media.MediaRow(id, "image", Media.encodePng(id, 16, 16),
        Media.MediaMeta("image/png", 16, 16, 0L)))
    val stats = Media.decodeImageStats(media).collect().map(s => s.media_id -> s).toMap
    for (id <- Seq(3L, 4L)) {
      val px = for (y <- 0 until 16; x <- 0 until 16) yield Media.pixelValue(id, x, y)
      val s = stats(id)
      assert(s.px_sum == px.map(_.toLong).sum && s.px_min == px.min &&
        s.px_max == px.max && s.corner == Media.pixelValue(id, 0, 0))
    }
  }

  test("WAV encode -> real javax.sound decode round-trips every sample") {
    // direct codec round-trip, no Spark: header + PCM frames survive
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(Media.encodeWav(7L, 300)))
    val fmt = ais.getFormat
    assert(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      fmt.getSampleRate == 8000f)
    val bytes = ais.readAllBytes()
    assert(bytes.length == 600)
    for (i <- 0 until 300) {
      val v =
        if (fmt.isBigEndian) (bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xFF)
        else (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xFF)
      assert(v == Media.sampleValue(7L, i), s"sample $i lost in the codec round-trip")
    }

    // distributed path: stats computed from DECODED samples match the formula
    val media = Seq(3L, 4L).toDS()
      .map(id => Media.MediaRow(id, "audio", Media.encodeWav(id, 300),
        Media.MediaMeta("audio/wav", 0, 0, 0L)))
    val stats = Media.decodeAudioStats(media).collect().map(s => s.media_id -> s).toMap
    for (id <- Seq(3L, 4L)) {
      val vs = (0 until 300).map(Media.sampleValue(id, _))
      val s = stats(id)
      assert(s.n_samples == 300 && s.sample_rate == 8000 &&
        s.amp_sum == vs.map(v => math.abs(v.toLong)).sum &&
        s.amp_min == vs.min && s.amp_max == vs.max &&
        s.first_sample == Media.sampleValue(id, 0))
    }
  }

  test("MJPEG encode -> real JPEG decode round-trips every gray level exactly") {
    // the exactness claim the whole video-oracle rests on: a uniform-gray
    // quality-1.0 JPEG decodes back to the SAME level for ALL 256 levels
    // 37 is odd -> invertible mod 256 (37 * 173 ≡ 1), so id = level * 173
    // gives frameLevel(id, 0) == level for every level
    for (level <- 0 until 256) {
      val id = level.toLong * 173 % 256
      assert(Media.frameLevel(id, 0) == level)
      val bytes = Media.encodeMjpeg(id, 1)
      val frames = Media.splitMjpegFrames(bytes)
      assert(frames.size == 1)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(frames.head))
      assert(img.getWidth == 8 && img.getHeight == 8)
      for (y <- 0 until 8; x <- 0 until 8)
        assert(img.getRaster.getSample(x, y, 0) == level,
          s"level $level pixel ($x,$y) lost in the JPEG round-trip")
    }
  }

  test("MJPEG frame split + distributed decode matches the frame formula") {
    val ids = Seq(3L, 4L, 5L, 6L)
    val media = ids.toDS().map(id =>
      Media.MediaRow(id, "video", Media.encodeMjpeg(id, 3 + (id % 4).toInt),
        Media.MediaMeta("video/x-motion-jpeg", 8, 8, 0L)))
    val stats = Media.decodeVideoStats(media).collect().map(s => s.media_id -> s).toMap
    for (id <- ids) {
      val n = 3 + (id % 4).toInt
      val ls = (0 until n).map(Media.frameLevel(id, _))
      val s = stats(id)
      assert(s.n_frames == n && s.frame_w == 8 && s.frame_h == 8,
        s"clip $id shape: $s")
      assert(s.level_sum == ls.map(_.toLong).sum && s.level_min == ls.min &&
        s.level_max == ls.max && s.first_level == Media.frameLevel(id, 0),
        s"clip $id stats: $s vs levels $ls")
    }
  }

  test("decodeStub is deterministic and normalized") {
    val a = Media.decodeStub(payload, 8)
    val b = Media.decodeStub(payload, 8)
    assert(a.toSeq == b.toSeq)
    assert(math.abs(a.sum - 1.0f) < 1e-5)
    assert(Media.decodeStub(Array.emptyByteArray, 8).toSeq == Seq.fill(8)(0f))
  }

  test("resizeDims preserves aspect, longest side = maxSide") {
    assert(Media.resizeDims(100, 50, 128) == ((128, 64)))
    assert(Media.resizeDims(50, 100, 128) == ((64, 128)))
    assert(Media.resizeDims(64, 64, 128) == ((128, 128)))
  }

  test("frameOffsets exactly tile the payload") {
    for (n <- Seq(0, 1, 7, 11, 100); k <- Seq(1, 3, 4)) {
      val offs = Media.frameOffsets(n, k)
      assert(offs.length == k)
      assert(offs.head._1 == 0 && offs.last._2 == n)
      offs.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 == s2)
        case _ =>
      }
    }
  }

  test("extractFeatures runs batched over partitions and keeps every row") {
    val ds = spark.createDataset(
      (1L to 10L).map(i => row(i, s"payload-$i".getBytes("UTF-8"))))
      .repartition(3)
    val out = Media.extractFeatures(ds, dim = 4, batchSize = 3).collect()
    assert(out.length == 10)
    val one = out.find(_.media_id == 1L).get
    assert(one.n_bytes == 9 && one.first_byte == 'p'.toInt)
    assert(one.checksum == "payload-1".getBytes("UTF-8").map(_ & 0xFF).sum)
    assert(one.features.length == 4)
  }

  test("frameSample emits n frames per row covering the payload") {
    val ds = spark.createDataset(Seq(row(1L, payload)))
    val frames = Media.frameSample(ds, frames = 4).collect().sortBy(_.frame_idx)
    assert(frames.length == 4)
    assert(frames.map(_.frame_len).sum == payload.length)
    assert(frames.head.frame_first_byte == 'h'.toInt)
  }
}
