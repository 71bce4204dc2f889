package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mkMedia(id: Long, kind: String, bytes: Array[Byte],
      w: Option[Int] = None, h: Option[Int] = None,
      dur: Option[Long] = None): MediaRow =
    MediaRow(id, kind, Some(s"mem://$id"), bytes, MediaMeta(w, h, dur, Some("fake")))

  private val media = Seq(
    mkMedia(1, "image", Array.tabulate(256)(_.toByte), w = Some(1920), h = Some(1080)),
    mkMedia(2, "image", Array.tabulate(64)(i => (i * 3).toByte), w = Some(640), h = Some(480)),
    mkMedia(3, "audio", Array.tabulate(1000)(i => (i % 7).toByte), dur = Some(5000L)),
    mkMedia(4, "video", Array.tabulate(4096)(i => (i % 251).toByte),
      w = Some(1280), h = Some(720), dur = Some(60000L)),
    mkMedia(5, "image", Array.emptyByteArray))

  test("decodeFeatures: batched, deterministic, fixed-width, empty payload flagged") {
    val ds = spark.createDataset(media).repartition(3)
    val out1 = decodeFeatures(ds, batchSize = 2).collect().sortBy(_.media_id)
    val out2 = decodeFeatures(ds, batchSize = 64).collect().sortBy(_.media_id)
    assert(out1.length == 5)
    assert(out1.forall(_.features.length == 16))
    // batch size must not affect results (pure per-row semantics)
    assert(out1.zip(out2).forall { case (a, b) =>
      a.media_id == b.media_id && a.features.sameElements(b.features) })
    val empty = out1.find(_.media_id == 5).get
    assert(!empty.ok && empty.n_bytes == 0)
    // histogram features are normalized: sum ≈ 1 for non-empty
    val f1 = out1.find(_.media_id == 1).get
    assert(math.abs(f1.features.sum - 1.0f) < 1e-5)
  }

  test("ImageIoDecoder decodes real PNG and JPEG fixtures through the seam") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO

    def encode(fmt: String, w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"no $fmt writer registered")
      bos.toByteArray
    }
    // solid orange PNG (lossless → exact channel means) + a JPEG gradient
    // (lossy → approximate means) + a corrupt payload (poison pill)
    val png = encode("png", 8, 6)((_, _) => 0xff8020)
    val jpg = encode("jpg", 16, 12)((x, _) => (x * 16) << 16)
    val rows = Seq(
      mkMedia(10, "image", png),
      mkMedia(11, "image", jpg),
      mkMedia(12, "image", Array.tabulate(100)(_.toByte))) // not an image
    val ds = spark.createDataset(rows).repartition(2)
    val out = decodeFeatures(ds, new ImageIoDecoder, batchSize = 2)
      .collect().map(f => f.media_id -> f).toMap

    val p = out(10L)
    assert(p.ok && p.n_bytes == png.length)
    assert(p.features(0) == 8f && p.features(1) == 6f, "decoded dimensions")
    assert(p.features(2) == 0xff.toFloat && p.features(3) == 0x80.toFloat &&
      p.features(4) == 0x20.toFloat, s"exact channel means: ${p.features.toSeq}")
    val j = out(11L)
    assert(j.ok && j.features(0) == 16f && j.features(1) == 12f)
    // gradient mean red = avg(x*16) = 120; JPEG is lossy → loose bound
    assert(math.abs(j.features(2) - 120f) < 16f, s"jpeg red mean ${j.features(2)}")
    assert(!out(12L).ok && out(12L).features.isEmpty,
      "corrupt payload degrades to ok=false, not a task failure")
  }

  test("PcmWavDecoder parses real WAV bytes: stereo, sine RMS, poison pills") {
    // stereo constant: 2 channels, mean exact
    val stereo = encodeWav(44100, 2, Array.fill(400)(8192.toShort))
    // mono sine over full periods: RMS ≈ amp/√2
    val amp = 16384
    val sine = encodeWav(8000, 1,
      Array.tabulate(800)(i => (amp * math.sin(2 * math.Pi * i / 80)).toShort))
    val rows = Seq(
      mkMedia(20, "audio", stereo),
      mkMedia(21, "audio", sine),
      mkMedia(22, "audio", stereo.take(30)),            // truncated header
      mkMedia(23, "audio", Array.tabulate(200)(_.toByte))) // not RIFF
    val out = decodeFeatures(spark.createDataset(rows), new PcmWavDecoder, batchSize = 2)
      .collect().map(f => f.media_id -> f).toMap

    val st = out(20L)
    assert(st.ok && st.features(0) == 44100f && st.features(1) == 2f &&
      st.features(2) == 200f, s"stereo header: ${st.features.toSeq}")
    assert(st.features(3) == (8192.0 / 32768).toFloat, "constant mean exact")
    val sn = out(21L)
    assert(sn.ok && sn.features(2) == 800f)
    val wantRms = amp / 32768.0 / math.sqrt(2)
    assert(math.abs(sn.features(4) - wantRms) < 0.01,
      s"sine RMS ${sn.features(4)} vs $wantRms")
    assert(math.abs(sn.features(3)) < 0.01, "sine mean ~0")
    assert(!out(22L).ok && !out(23L).ok, "malformed payloads degrade to ok=false")
  }

  test("resizePlan preserves aspect ratio and never upscales") {
    val df = spark.createDataset(media).toDF()
    val out = resizePlan(df, maxSide = 512)
      .select(col("media_id"), col("target_width"), col("target_height"))
      .collect().map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
    assert(out(1L) == ((512, 288)))   // 1920x1080 -> 512x288
    assert(out(2L) == ((512, 384)))   // 640x480 -> 512x384
    assert(out(3L) == ((null, null))) // no dims -> null passthrough
  }

  test("sampleFrames: only video, deterministic evenly-spaced offsets") {
    val ds = spark.createDataset(media)
    val frames = sampleFrames(ds, nFrames = 4).collect().sortBy(_.frame_idx)
    assert(frames.forall(_.media_id == 4L))
    assert(frames.map(_.offset_ms).toSeq == Seq(0L, 15000L, 30000L, 45000L))
    assert(frames.map(_.data.length).sum == 4096) // slices cover the payload
  }

  test("AVI/MJPEG: real container parse, frame-accurate sampling, JPEG frames decode") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO

    def jpegFrame(shade: Int): Array[Byte] = {
      val img = new BufferedImage(16, 12, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16) img.setRGB(x, y, shade << 16)
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    // 6 frames of increasing red at 25 fps (40 000 µs per frame)
    val shades = Seq(0, 50, 100, 150, 200, 250)
    val avi = encodeAviMjpeg(16, 12, 40000, shades.map(jpegFrame))
    val rows = Seq(
      mkMedia(20, "video", avi, w = Some(16), h = Some(12)),
      mkMedia(21, "video", avi.take(30)), // truncated container: poison pill
      mkMedia(22, "image", jpegFrame(99))) // not a video: skipped
    val ds = spark.createDataset(rows).repartition(2)

    val frames = sampleFramesMjpeg(ds, nFrames = 3).collect().sortBy(_.frame_idx)
    assert(frames.map(_.media_id).toSet == Set(20L),
      "only the intact video may produce frames")
    // 3 of 6 frames evenly spaced: indexes 0, 2, 4 → 0 ms, 80 ms, 160 ms
    assert(frames.map(_.offset_ms).toSeq == Seq(0L, 80L, 160L))

    // the sampled payloads are REAL standalone JPEGs: decode them and
    // check the red means track the encoded shades (JPEG is lossy →
    // tolerance)
    val feats = new ImageIoDecoder().decodeBatch(
      frames.toSeq.map(f => mkMedia(f.media_id * 10 + f.frame_idx, "image", f.data)))
    assert(feats.forall(_.ok), "every sampled frame must decode as a JPEG")
    val reds = feats.map(_.features(2)) // [w, h, meanR, meanG, meanB]
    assert(feats.forall(f => f.features(0) == 16f && f.features(1) == 12f))
    Seq(0f, 100f, 200f).zip(reds).foreach { case (want, got) =>
      assert(math.abs(want - got) < 12f, s"red mean $got !~ $want")
    }

    // parser contract directly: all 6 frames, µs-per-frame preserved
    val Some((us, parsed)) = parseAviMjpeg(avi)
    assert(us == 40000L && parsed.size == 6)
    assert(parseAviMjpeg(avi.take(30)).isEmpty)
    assert(parseAviMjpeg("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("aHash: scale invariance, noise absorption, poison contract") {
    import Multimodal.aHash
    def png(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = gray(x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // a left-bright/right-dark pattern hashes identically at 8x8,
    // 16x16, and a non-square 24x16 — the downsampling grid sees the
    // same cells (scale invariance is what makes aHash a NEAR-dup key,
    // not an exact-bytes key)
    def split(w: Int, h: Int) = png(w, h, (x, _) => if (x < w / 2) 220 else 40)
    val base = aHash(split(8, 8))
    assert(base.isDefined)
    assert(aHash(split(16, 16)) == base, "2x upscale must not move the hash")
    assert(aHash(split(24, 16)) == base, "non-square resample must agree")
    // photometric noise that never crosses the mean leaves every bit
    assert(aHash(png(8, 8, (x, _) => if (x < 4) 221 else 41)) == base)
    // crossing the mean flips bits — a genuinely different image
    assert(aHash(png(8, 8, (x, _) => if (x < 4) 40 else 220)) != base)
    // poison contract: truncated, empty, and null payloads are None
    assert(aHash(split(8, 8).take(10)).isEmpty)
    assert(aHash(Array.empty[Byte]).isEmpty)
    assert(aHash(null).isEmpty)
    // degenerate constant image: no cell exceeds the mean -> hash 0
    assert(aHash(png(8, 8, (_, _) => 128)) == Some(0L))
  }

  test("eHash: exact gain invariance, noise absorption, poison contract") {
    import Multimodal.{eHash, encodeWav}
    // 64 frames x 16 samples; loud/quiet frame pattern from a bit mask
    def wav(mask: Long, gain: Int, noise: Int = 0): Array[Byte] = {
      val s = new Array[Short](1024)
      var i = 0
      while (i < 1024) {
        val loud = ((mask >>> (i / 16)) & 1L) == 1L
        val amp = if (loud) 2000 * gain + noise else 125 * gain
        s(i) = (if (i % 2 == 0) amp else -amp).toShort
        i += 1
      }
      encodeWav(8000, 1, s)
    }
    val mask = 0xA5C3E17B2D4F6981L
    val base = eHash(wav(mask, gain = 4))
    assert(base.isDefined)
    // the hash IS the loud-frame mask: bit i set iff frame i > mean
    assert(base == Some(mask))
    // uniform gain rescales both sides of the cross-multiplied
    // compare equally — the hash is EXACTLY invariant (the re-encoded
    // louder copy of a clip is the same near-dup key)
    assert(eHash(wav(mask, gain = 5)) == base, "5/4 gain must not move the hash")
    assert(eHash(wav(mask, gain = 12)) == base, "3x gain must not move the hash")
    // loud-frame noise that never crosses the loudness mean is absorbed
    assert(eHash(wav(mask, gain = 4, noise = 3)) == base)
    assert(eHash(wav(mask, gain = 4, noise = -3)) == base)
    // a different envelope is a different key
    assert(eHash(wav(~mask, gain = 4)) != base)
    // poison contract: truncated, empty, null, and sub-64-sample clips
    assert(eHash(wav(mask, 4).take(20)).isEmpty)
    assert(eHash(Array.empty[Byte]).isEmpty)
    assert(eHash(null).isEmpty)
    assert(eHash(encodeWav(8000, 1, Array.fill[Short](63)(100))).isEmpty)
    // degenerate constant clip: no frame exceeds the mean -> hash 0
    assert(eHash(encodeWav(8000, 1, Array.fill[Short](1024)(100))) == Some(0L))
    // multi-channel interleave still parses (envelope over all samples)
    assert(eHash(encodeWav(8000, 2, Array.fill[Short](1024)(100))) == Some(0L))
  }

  test("media struct schema round-trips through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    val df = spark.createDataset(media).toDF()
      .withColumn("media", struct(
        col("kind"), col("uri"), col("data"),
        struct(col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.duration_ms").as("duration_ms"), col("meta.codec").as("codec")).as("meta")))
      .select(col("media_id"), col("media"))
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // parquet round-trip loosens nullability; compare the type shape
    assert(back.schema("media").dataType.catalogString == Multimodal.mediaSchema.catalogString)
    assert(back.count() == 5)
  }
}
