package graft

import org.apache.spark.sql.functions._
import graft.multimodal.BinaryColumns
import graft.operators.Knn

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("binary payload pipeline: schema, determinism, unit-norm features") {
    val feats = BinaryColumns.extractFeatures(BinaryColumns.mediaFromDocuments(spark, sfDir))
    val rows = feats.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.embedding.length == BinaryColumns.FeatureDim))
    // unit norm (stub normalizes)
    rows.take(10).foreach { r =>
      val n = math.sqrt(r.embedding.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
    // deterministic re-run
    val rows2 = BinaryColumns.extractFeatures(BinaryColumns.mediaFromDocuments(spark, sfDir))
      .collect()
    assert(rows.map(_.embedding.toSeq).toSeq == rows2.map(_.embedding.toSeq).toSeq)
    // all three modalities present
    assert(rows.map(_.modality).toSet == Set("image", "audio", "video"))
  }

  test("identical payloads embed identically; different payloads differ") {
    val p1 = "same bytes".getBytes("UTF-8")
    val e1 = BinaryColumns.decodeStub(p1)
    val e2 = BinaryColumns.decodeStub("same bytes".getBytes("UTF-8"))
    val e3 = BinaryColumns.decodeStub("other bytes".getBytes("UTF-8"))
    assert(e1.toSeq == e2.toSeq)
    assert(e1.toSeq != e3.toSeq)
  }

  test("media features flow into the kNN operator (cross-modal search)") {
    val feats = BinaryColumns.mediaFeatures(spark, sfDir)
    val queries = feats.filter($"vec_id" < 3)
    val res = Knn.topK(feats.filter($"modality" === "image"), queries, 5)
    val byQ = res.select($"qid", $"vec_id").as[(Long, Long)].collect().groupBy(_._1)
    assert(byQ.size == 3)
    byQ.values.foreach(v => assert(v.length == 5))
  }

  test("frame sampling stub emits n frames; resize stub is deterministic") {
    val frames = BinaryColumns.sampleFramesStub("vid".getBytes, 4)
    assert(frames.length == 4 && frames.map(_.toSeq).distinct.length == 4)
    assert(BinaryColumns.resizeStub("img".getBytes, 224, 224).toSeq ==
      BinaryColumns.resizeStub("img".getBytes, 224, 224).toSeq)
  }

  test("batched columnar decode == row-at-a-time path, for every batch size and partitioning") {
    val media = BinaryColumns.mediaFromDocuments(spark, sfDir)
    def key(rows: Array[BinaryColumns.MediaFeature]) =
      rows.sortBy(_.media_id).map(r => (r.media_id, r.modality, r.embedding.toSeq)).toSeq
    val want = key(BinaryColumns.extractFeatures(media).collect())
    // batch boundaries must be invisible: degenerate (1), mid-partition
    // splits (7), and bigger-than-partition (10_000) all agree
    Seq(1, 7, 10000).foreach { bs =>
      val got = key(BinaryColumns.extractFeaturesBatched(media, batchSize = bs).collect())
      assert(got == want, s"batchSize=$bs changed results")
    }
    // and so must partitioning (batches never span partitions)
    Seq(1, 3, 17).foreach { np =>
      val got = key(BinaryColumns.extractFeaturesBatched(
        media.repartition(np), batchSize = 7).collect())
      assert(got == want, s"numPartitions=$np changed results")
    }
  }

  private def flatImage(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("ImageIoDecoder: real pixel math — constant images pool to uniform features with the CLIP-normalized sign") {
    import BinaryColumns.ImageIoDecoder
    // white: (1 - mean)/std > 0 per channel → every patch positive and
    // equal → L2-normalized feature is exactly +1/8 everywhere (8x8 grid)
    val white = ImageIoDecoder.decodeImage(flatImage(10, 10, 0xffffff))
    assert(white.length == BinaryColumns.FeatureDim)
    white.foreach(v => assert(math.abs(v - 0.125f) < 1e-6, s"white -> $v"))
    // black: (0 - mean)/std < 0 → -1/8 everywhere
    val black = ImageIoDecoder.decodeImage(flatImage(300, 200, 0x000000))
    black.foreach(v => assert(math.abs(v + 0.125f) < 1e-6, s"black -> $v"))
    // left-black/right-white: after bicubic resize the left patch
    // columns stay negative, the right ones positive
    val img = new java.awt.image.BufferedImage(100, 100,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 100).foreach(y => (0 until 100).foreach(x =>
      img.setRGB(x, y, if (x < 50) 0x000000 else 0xffffff)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val half = ImageIoDecoder.decodeImage(out.toByteArray)
    (0 until 8).foreach { py =>
      assert(half(py * 8 + 0) < 0, "leftmost patch should be dark")
      assert(half(py * 8 + 7) > 0, "rightmost patch should be bright")
    }
    // decode is deterministic
    assert(ImageIoDecoder.decodeImage(flatImage(10, 10, 0x123456)).toSeq ==
      ImageIoDecoder.decodeImage(flatImage(10, 10, 0x123456)).toSeq)
  }

  test("ImageIoDecoder: batch-size and partitioning invariance (the MediaDecoder contract)") {
    val media = BinaryColumns.mediaFromDocuments(spark, sfDir)
    def key(rows: Array[BinaryColumns.MediaFeature]) =
      rows.sortBy(_.media_id).map(r => (r.media_id, r.modality, r.embedding.toSeq)).toSeq
    val want = key(BinaryColumns.extractFeaturesBatched(
      media, BinaryColumns.ImageIoDecoder).collect())
    assert(want.nonEmpty)
    Seq(1, 7, 10000).foreach { bs =>
      val got = key(BinaryColumns.extractFeaturesBatched(
        media, BinaryColumns.ImageIoDecoder, batchSize = bs).collect())
      assert(got == want, s"batchSize=$bs changed ImageIoDecoder results")
    }
    Seq(1, 3, 17).foreach { np =>
      val got = key(BinaryColumns.extractFeaturesBatched(
        media.repartition(np), BinaryColumns.ImageIoDecoder, batchSize = 7).collect())
      assert(got == want, s"numPartitions=$np changed ImageIoDecoder results")
    }
    // image features are REAL pixel math (unit-norm, not the stub's
    // hash fingerprint of the same payload)
    val imgRows = want.filter(_._2 == "image")
    assert(imgRows.nonEmpty)
    val stub = key(BinaryColumns.extractFeaturesBatched(media).collect())
      .filter(_._2 == "image")
    assert(imgRows != stub, "image path still produces stub features")
    imgRows.take(5).foreach { case (_, _, e) =>
      val n = math.sqrt(e.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
  }

  private def sineWav(freqHz: Double, rate: Float, nSamples: Int,
                      channels: Int = 1, amp: Double = 0.8): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2 * channels)
    (0 until nSamples).foreach { i =>
      val v = amp * math.sin(2 * math.Pi * freqHz * i / rate)
      val s = math.max(-32768, math.min(32767, (v * 32767).toInt)).toShort
      (0 until channels).foreach { c =>
        val off = (i * channels + c) * 2
        pcm(off) = (s & 0xff).toByte
        pcm(off + 1) = ((s >> 8) & 0xff).toByte
      }
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("AudioIoDecoder: real signal math — a pure tone concentrates energy in its mel band, at any source rate or channel count") {
    import BinaryColumns.AudioIoDecoder
    def dominantBand(feat: Array[Float]): Int = {
      // average the 8 frames, return the argmax band
      val byBand = (0 until AudioIoDecoder.NBands).map { b =>
        (0 until AudioIoDecoder.NFrames).map(f => feat(f * AudioIoDecoder.NBands + b)).sum
      }
      byBand.indexOf(byBand.max)
    }
    val tone = 500.0
    val expected = math.min(AudioIoDecoder.NBands - 1,
      (AudioIoDecoder.mel(tone) / AudioIoDecoder.mel(AudioIoDecoder.TargetRate / 2) *
        AudioIoDecoder.NBands).toInt)
    val at8k = AudioIoDecoder.decodeAudio(sineWav(tone, 8000f, 1600))
    assert(at8k.length == BinaryColumns.FeatureDim)
    assert(dominantBand(at8k) == expected, s"8k: ${dominantBand(at8k)} != $expected")
    // resample path: same tone sampled at 16 kHz lands in the same band
    val at16k = AudioIoDecoder.decodeAudio(sineWav(tone, 16000f, 3200))
    assert(dominantBand(at16k) == expected, s"16k: ${dominantBand(at16k)}")
    // stereo mixdown: 2-channel tone decodes to the same band
    val stereo = AudioIoDecoder.decodeAudio(sineWav(tone, 8000f, 1600, channels = 2))
    assert(dominantBand(stereo) == expected, s"stereo: ${dominantBand(stereo)}")
    // a much higher tone moves the dominant band up
    val hi = AudioIoDecoder.decodeAudio(sineWav(3500.0, 8000f, 1600))
    assert(dominantBand(hi) > expected, s"hi tone band ${dominantBand(hi)}")
    // deterministic + unit norm
    assert(at8k.toSeq == AudioIoDecoder.decodeAudio(sineWav(tone, 8000f, 1600)).toSeq)
    val n = math.sqrt(at8k.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
  }

  test("JdkDecoder (graded default): batch-size and partitioning invariance; image, audio AND video all on real decode paths") {
    val media = BinaryColumns.mediaFromDocuments(spark, sfDir)
    def key(rows: Array[BinaryColumns.MediaFeature]) =
      rows.sortBy(_.media_id).map(r => (r.media_id, r.modality, r.embedding.toSeq)).toSeq
    val want = key(BinaryColumns.extractFeaturesBatched(
      media, BinaryColumns.JdkDecoder).collect())
    Seq(1, 7, 10000).foreach { bs =>
      val got = key(BinaryColumns.extractFeaturesBatched(
        media, BinaryColumns.JdkDecoder, batchSize = bs).collect())
      assert(got == want, s"batchSize=$bs changed JdkDecoder results")
    }
    Seq(3, 17).foreach { np =>
      val got = key(BinaryColumns.extractFeaturesBatched(
        media.repartition(np), BinaryColumns.JdkDecoder, batchSize = 7).collect())
      assert(got == want, s"numPartitions=$np changed JdkDecoder results")
    }
    val stub = key(BinaryColumns.extractFeaturesBatched(media).collect())
    def m(rows: Seq[(Long, String, Seq[Float])], mod: String) = rows.filter(_._2 == mod)
    assert(m(want, "image") != m(stub, "image"), "image not on the real path")
    assert(m(want, "audio") != m(stub, "audio"), "audio not on the real path")
    assert(m(want, "video") != m(stub, "video"), "video not on the real path")
    // video features are unit-norm real pixel math, not hash fingerprints
    m(want, "video").take(5).foreach { case (_, _, e) =>
      val n = math.sqrt(e.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
  }

  test("AviMjpeg: the hand-built container demuxes to its frames; sampling follows the every-interval rule") {
    val avi = BinaryColumns.makeAvi(42L, nFrames = 8)
    val frames = BinaryColumns.AviMjpeg.frames(avi)
    assert(frames.length == 8)
    // every frame is a decodable JPEG
    frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth == 64 && img.getHeight == 48)
    }
    // interval sampling: 8 frames, budget 4 -> indices 0,2,4,6
    val sampled = BinaryColumns.AviMjpeg.sampleFrames(avi, 4)
    assert(sampled.length == 4)
    assert(sampled.map(_.toSeq) ==
      Seq(0, 2, 4, 6).map(frames(_).toSeq), "sampling is not every-interval")
    // budget >= frame count keeps every frame
    assert(BinaryColumns.AviMjpeg.sampleFrames(avi, 100).length == 8)
    // corrupt/truncated container: no crash, best-effort frames
    val trunc = java.util.Arrays.copyOf(avi, avi.length - 200)
    assert(BinaryColumns.AviMjpeg.frames(trunc).length <= 8)
  }

  test("video decode is real pixel math: a constant-frame AVI pools to its single frame's image feature") {
    import graft.multimodal.BinaryColumns.{AviMjpeg, ImageIoDecoder}
    // hand-build an AVI whose 4 frames are IDENTICAL JPEGs: the mean
    // pool of equal frame features is that feature (up to float sum
    // rounding), which must equal decoding the frame as an image
    val one = BinaryColumns.makeAvi(7L, nFrames = 1)
    val frame = AviMjpeg.frames(one).head
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array(0.toByte) else Array.empty[Byte])
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      Array.fill(4)(chunk("00dc", frame)).reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ movi
    val avi4 = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body

    import spark.implicits._
    val media = Seq(BinaryColumns.MediaRow(1L,
      BinaryColumns.MediaMeta("video", 64, 48, 400L, "mjpeg"), avi4)).toDS()
    val pooled = BinaryColumns.extractFeaturesBatched(
      media, BinaryColumns.JdkDecoder).collect().head.embedding
    val single = ImageIoDecoder.decodeImage(frame)
    assert(pooled.length == single.length)
    pooled.zip(single).foreach { case (p, s) =>
      assert(math.abs(p - s) < 1e-5, s"pooled $p vs single-frame $s")
    }
  }

  test("decoder is pluggable: decode calls arrive as dense same-modality batches") {
    // a probe decoder records every (modality, batch size) it sees and
    // tags rows so dispatch is observable end-to-end
    val media = BinaryColumns.mediaFromDocuments(spark, sfDir).limit(30).repartition(1)
    val probe = new BinaryColumns.MediaDecoder {
      override def name = "probe"
      override def decodeBatch(modality: String,
                               payloads: Array[Array[Byte]]): Array[Array[Float]] = {
        assert(payloads.nonEmpty)
        val tag = modality match {
          case "image" => 1f; case "audio" => 2f; case _ => 3f
        }
        payloads.map(_ => Array.fill(BinaryColumns.FeatureDim)(tag))
      }
    }
    val rows = BinaryColumns.extractFeaturesBatched(media, probe, batchSize = 8).collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val tag = r.modality match { case "image" => 1f; case "audio" => 2f; case _ => 3f }
      if (r.modality == "video")
        // frames pooled then re-normalized: constant vector of 1/√dim
        r.embedding.foreach(x => assert(math.abs(x - 1.0 / math.sqrt(BinaryColumns.FeatureDim)) < 1e-6))
      else
        assert(r.embedding.forall(_ == tag), s"row ${r.media_id} not decoded by $tag batch")
    }
  }
}
