package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "x")

  test("withFakeMedia produces the binary + metadata schema") {
    val m = Multimodal.withFakeMedia(base, "doc_id", "image")
    assert(m.schema("payload").dataType == BinaryType)
    assert(m.schema("meta").dataType.isInstanceOf[StructType])
    val r = m.collect()
    assert(r.length == 3 && r.forall(_.getAs[Array[Byte]]("payload").nonEmpty))
  }

  test("header decoder parses real PNG/JPEG/GIF/BMP structure") {
    val d = new ImageHeaderDecoder
    assert(d.decode(ImageHeaders.pngBytes(640, 480)) == (Some(640), Some(480), "png"))
    assert(d.decode(ImageHeaders.jpegBytes(800, 600)) == (Some(800), Some(600), "jpeg"))
    assert(d.decode(ImageHeaders.gifBytes(320, 200)) == (Some(320), Some(200), "gif"))
    assert(d.decode(ImageHeaders.bmpBytes(1024, 768)) == (Some(1024), Some(768), "bmp"))
    assert(d.decode("not an image at all".getBytes) == (None, None, "unknown"))
  }

  test("decode parses the synthetic payloads' genuine headers, batch-shaped") {
    val m = Multimodal.withFakeMedia(base, "doc_id", "image").repartition(2)
    val d1 = Multimodal.decodeImageMeta(m).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[String]("format"))).toMap
    val d2 = Multimodal.decodeImageMeta(m).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[String]("format"))).toMap
    assert(d1 == d2) // deterministic
    // dimensions round-trip the id formula through real format headers
    assert(d1(1L) == (128, 64, "gif"))  // id%4==1 -> gif
    assert(d1(2L) == (192, 64, "bmp"))  // id%4==2 -> bmp
    assert(d1(3L) == (256, 64, "jpeg")) // id%4==3 -> jpeg
  }

  test("audio modality end-to-end: WAV payloads decode sample rate/channels/duration") {
    val m = Multimodal.withFakeMedia(base, "doc_id", "audio").repartition(2)
    val got = Multimodal.decodeAudioMeta(m).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("sample_rate"), r.getAs[Int]("channels"), r.getAs[Double]("seconds"))).toMap
    // id formula: rate = rates(id%4), channels = 1 + id%2, nSamples = 1000 + (id%100)*100
    assert(got(1L)._1 == 16000 && got(1L)._2 == 2)
    assert(got(2L)._1 == 44100 && got(2L)._2 == 1)
    assert(got(3L)._1 == 48000 && got(3L)._2 == 2)
    // duration = nSamples / rate, independent of channel count
    assert(math.abs(got(2L)._3 - 1200.0 / 44100) < 1e-6)
    // image payloads are not WAVs: audio decode yields nulls, not garbage
    val img = Multimodal.withFakeMedia(base, "doc_id", "image")
    assert(Multimodal.decodeAudioMeta(img).where(col("sample_rate").isNotNull).count() == 0)
  }

  test("WAV header round-trips audio metadata") {
    val d = new ImageHeaderDecoder
    val wav = ImageHeaders.wavBytes(sampleRate = 44100, channels = 2,
      bitsPerSample = 16, nSamples = 44100 * 3)
    val Some((rate, ch, bits, secs)) = d.decodeWav(wav)
    assert(rate == 44100 && ch == 2 && bits == 16 && math.abs(secs - 3.0) < 1e-9)
    assert(d.decodeWav("RIFFnope".getBytes).isEmpty)
  }

  test("pixel tier: full decode agrees with header parse on all four formats") {
    // ids 0..3 rotate png/gif/bmp/jpeg in withFakeMediaPixels
    val four = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val m = Multimodal.withFakeMediaPixels(four, "doc_id", "image").repartition(2)
    val got = Multimodal.decodeImage(m).collect()
      .map(r => r.getAs[String]("format") -> r).toMap
    assert(got.keySet == Set("png", "gif", "bmp", "jpeg"))
    got.values.foreach { r =>
      // decoded raster dims independently equal the byte-parsed header dims
      assert(r.getAs[Int]("px_width") == r.getAs[Int]("width"))
      assert(r.getAs[Int]("px_height") == r.getAs[Int]("height"))
      val mean = r.getAs[Double]("mean_luma")
      assert(mean > 0.0 && mean < 255.0 && !r.isNullAt(r.fieldIndex("std_luma")))
    }
    // lossless formats reproduce the deterministic pattern's exact stats
    Seq("png", "bmp").foreach { f =>
      val r = got(f)
      val id = r.getAs[Long]("media_id")
      val img = ImagePixels.pattern(r.getAs[Int]("width"), r.getAs[Int]("height"), id)
      val (mean, std) = ImagePixels.lumaStats(img)
      assert(math.abs(r.getAs[Double]("mean_luma") - mean) < 1e-9, f)
      assert(math.abs(r.getAs[Double]("std_luma") - std) < 1e-9, f)
    }
    // header-tier payloads (no pixel data) decode to null pixel columns, no throw
    val headerOnly = Multimodal.decodeImage(Multimodal.withFakeMedia(four, "doc_id", "image"))
    assert(headerOnly.where(col("px_width").isNotNull).count() == 0)
    assert(headerOnly.where(col("width").isNotNull).count() == 4)
  }

  test("resize produces a real re-encoded thumbnail, aspect preserved") {
    // id 49: w = 16 + (49%16)*4 = 16+4 = 20... use ids with distinct aspect
    val ids = Seq(17L, 33L, 2L).toDF("doc_id")
    val m = Multimodal.withFakeMediaPixels(ids, "doc_id", "image")
    val before = Multimodal.decodeImage(m).collect()
      .map(r => r.getAs[Long]("media_id") -> (r.getAs[Int]("width"), r.getAs[Int]("height"))).toMap
    val out = Multimodal.decodeImage(Multimodal.resize(m, 16)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val (w0, h0) = before(id)
      // thumbnail payload is a genuine PNG: ImageIO round-trips it and the
      // raster dims equal the recorded width/height
      assert(r.getAs[String]("format") == "png")
      assert(r.getAs[Int]("px_width") == r.getAs[Int]("width"))
      assert(r.getAs[Int]("px_height") == r.getAs[Int]("height"))
      assert(r.getAs[Int]("width") <= 16 && r.getAs[Int]("height") <= 16)
      val expScale = 16.0 / math.max(w0, h0)
      assert(r.getAs[Int]("width") == math.max(1, math.round(w0 * expScale).toInt))
      assert(r.getAs[Int]("height") == math.max(1, math.round(h0 * expScale).toInt))
    }
    // no upscale: a tiny image passes through at original size
    val tiny = Multimodal.decodeImage(Multimodal.resize(m, 4096)).collect()
    tiny.foreach { r =>
      val (w0, h0) = before(r.getAs[Long]("media_id"))
      assert((r.getAs[Int]("width"), r.getAs[Int]("height")) == (w0 -> h0))
    }
  }

  test("video frame sampling extracts real frames from an animated GIF") {
    // id 1: nFrames = 4 + 1%3 = 5, w = 32+8 = 40, h = 24
    val m = Multimodal.withFakeMediaPixels(Seq(1L).toDF("doc_id"), "doc_id", "video")
    val all = Multimodal.sampleFrames(m, 10).collect().sortBy(_.getAs[Int]("frame_idx"))
    assert(all.length == 5 && all.forall(_.getAs[Int]("n_frames") == 5))
    assert(all.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1, 2, 3, 4))
    // each sampled frame is a standalone decodable PNG with the video's dims,
    // and carries the frame's own deterministic pattern (seed = id + idx)
    all.foreach { r =>
      val img = ImagePixels.decode(r.getAs[Array[Byte]]("frame_payload")).get
      assert(img.getWidth == 40 && img.getHeight == 24)
      assert(r.getAs[Int]("frame_width") == 40 && r.getAs[Int]("frame_height") == 24)
    }
    // distinct frames have distinct content
    val lumas = all.map(r =>
      ImagePixels.lumaStats(ImagePixels.decode(r.getAs[Array[Byte]]("frame_payload")).get)._1)
    assert(lumas.distinct.length == lumas.length)
    // evenly-spaced subsample when n < total
    val three = Multimodal.sampleFrames(m, 3).collect().map(_.getAs[Int]("frame_idx")).sorted
    assert(three.toSeq == Seq(0, 1, 3))
    // non-video payloads contribute zero rows
    val img = Multimodal.withFakeMediaPixels(Seq(4L).toDF("doc_id"), "doc_id", "image")
    assert(Multimodal.sampleFrames(img, 3).count() == 0) // id 4 → png, not gif
  }

  test("bounded GIF sampling stops at the last pick yet matches a full decode") {
    // a clip much longer than the sample size: 40 frames, n = 5 picks
    // {0,8,16,24,32} — the bounded path never decodes frames 33..39
    val clip = ImagePixels.animatedGif(24, 16, nFrames = 40, seed = 7L)
    val (total, sampled) = ImagePixels.sampleGifFrames(clip, 5)
    assert(total == 40)
    assert(sampled.map(_._1) == IndexedSeq(0, 8, 16, 24, 32))
    // identical pixels to the decode-everything-then-pick formulation
    val full = ImagePixels.readGifFrames(clip)
    assert(full.length == 40)
    sampled.foreach { case (idx, img) =>
      assert(ImagePixels.lumaStats(img) == ImagePixels.lumaStats(full(idx)),
        s"frame $idx content must match the full decode")
    }
    // n >= total degenerates to every frame, in order
    val (t2, all) = ImagePixels.sampleGifFrames(clip, 64)
    assert(t2 == 40 && all.map(_._1) == (0 until 40))
    // non-GIF bytes: empty, not an exception
    assert(ImagePixels.sampleGifFrames(Array[Byte](1, 2, 3), 4) == ((0, IndexedSeq.empty)))
  }

  test("suggestedScenes holds per-scene multiplicity constant across scale") {
    // gate/bench-sized corpora keep the historical fixed pool (floor)…
    assert(Multimodal.suggestedScenes(500L) == 100)
    assert(Multimodal.suggestedScenes(5000L) == 100)
    // …and past the floor the pool grows with the corpus so copies/scene
    // (and the per-bucket pair join) stay bounded at ~targetCopies
    for (n <- Seq(50000L, 150000L, 5000000L)) {
      val scenes = Multimodal.suggestedScenes(n)
      val copies = n.toDouble / scenes
      assert(copies <= 50.0 + 1e-9, s"n=$n gives $copies copies/scene")
    }
    // 30× the bench corpus = 30× the scenes, NOT 30× the multiplicity
    assert(Multimodal.suggestedScenes(150000L) == 3000)
  }

  test("perceptual dHash finds the same scene across formats, not different scenes") {
    // 8 media ids over 2 scenes: ids {0,2,4,6} render scene 0, {1,3,5,7}
    // scene 1, with formats rotating png/gif/bmp/jpeg by id
    val media = Multimodal.withSharedScenes(
      (0L until 8L).toDF("doc_id"), "doc_id", nScenes = 2)
    val hashed = Multimodal.imageDHash(media)
    val hs = hashed.collect().map(r =>
      r.getAs[Long]("media_id") -> r.getAs[Long]("dhash")).toMap
    assert(hs.size == 8)
    // scene = id % 2, format = id % 4: ids 0 (png) and 4 (bmp) hold the
    // SAME pixels → identical hash; gif (palette-quantized) and jpeg
    // (lossy) of that scene stay within the hamming radius, not equal
    assert(hs(0L) == hs(4L), "png and bmp of the same pixels hash identically")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(5L)) <= 3,
      s"gif vs jpeg of one scene drifted ${java.lang.Long.bitCount(hs(1L) ^ hs(5L))} bits")

    // the pair join: every same-scene pair within hamming 3, and NO
    // cross-scene pair (different patterns differ in many gradient bits)
    val pairs = graft.dedup.Dedup.hammingPairs64(hashed, "media_id", "dhash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.foreach { case (a, b) =>
      assert(a % 2 == b % 2, s"cross-scene pair ($a,$b) must not appear")
    }
    // lossless same-scene pairs are certainly there
    assert(pairs.contains((0L, 4L)))
    assert(pairs.contains((2L, 6L)))

    // brute-force parity: banding finds exactly the ≤3-hamming pairs
    val brute = (for {
      a <- hs.keys; b <- hs.keys if a < b
      if java.lang.Long.bitCount(hs(a) ^ hs(b)) <= 3
    } yield (a, b)).toSet
    assert(pairs == brute)

    // undecodable payloads yield null hashes and silently drop from pairs
    val broken = Multimodal.imageDHash(
      Seq((99L, "image", Array[Byte](1, 2, 3))).toDF("media_id", "kind", "payload"))
    assert(broken.where(col("dhash").isNull).count() == 1)
  }

  test("imageContaminationMatrix: planted eval images caught across formats, clean untouched, brute parity") {
    // Train: 16 media over 3 scenes (scene = id % 3 — deliberately
    // coprime with the id % 4 format rotation, so every scene exists
    // under ALL FOUR encodings); two groups by id parity. Eval probes
    // render scene = id under nScenes = 18: scenes 1 and 2 are planted
    // (present in the train pool), scene 17 is clean (novel pattern).
    val train = Multimodal.withSharedScenes(
        (0L until 16L).toDF("doc_id"), "doc_id", nScenes = 3)
      .withColumn("grp", when(col("media_id") % 2 === 0, "even").otherwise("odd"))
    // probe ids satisfy BOTH id % 19 == planted scene AND id % 4 == 0
    // (PNG — lossless, so it matches the pool's lossless renders
    // exactly; a gif/jpeg probe can drift past the radius vs png/bmp):
    // 20 → scene 1, 40 → scene 2, 36 → scene 17 (clean)
    val probeSets = Seq((20L, "benchA"), (40L, "benchB"), (36L, "benchB"))
      .toDF("media_id", "eval_set")
    val evalMedia = Multimodal.withSharedScenes(probeSets, "media_id", nScenes = 19)
      .join(probeSets, Seq("media_id"))
    def matrix(ev: org.apache.spark.sql.DataFrame) =
      Multimodal.imageContaminationMatrix(
          train, "media_id", "grp", ev, "media_id", "eval_set", maxHamming = 3)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val got = matrix(evalMedia)

    // brute-force parity from the raw hashes
    val th = Multimodal.imageDHash(train).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[String]("grp"),
        r.getAs[Long]("dhash")))
    val eh = Multimodal.imageDHash(evalMedia).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[String]("eval_set"),
        r.getAs[Long]("dhash")))
    val expected = (for {
      (tid, grp, thash) <- th
      (_, set, ehash) <- eh
      if java.lang.Long.bitCount(thash ^ ehash) <= 3
    } yield (set, grp, tid)).distinct
      .groupBy(t => (t._1, t._2)).view.mapValues(_.length.toLong).toMap
    val totals = th.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(got.keySet == expected.keySet, s"got=$got expected=$expected")
    got.foreach { case (k @ (_, grp), (nc, nd, frac)) =>
      assert(nc == expected(k), s"$k: $nc vs ${expected(k)}")
      assert(nd == totals(grp))
      assert(math.abs(frac - nc.toDouble / nd) < 1e-6)
    }
    // planted probes catch cross-format copies — at minimum every
    // LOSSLESS (png/bmp) render of their scene (gif/jpeg renders may
    // quantize past the radius for some scenes; brute parity above is
    // the exactness check). Scene 1's lossless copies are ids 4 (png) /
    // 10 (bmp) — both even; scene 2's are 2, 8, 14 — all even.
    assert(got(("benchA", "even"))._1 >= 2L, got.toString)
    assert(got(("benchB", "even"))._1 >= 3L, got.toString)
    // the clean scene-17 probe contributes NOTHING: dropping it leaves
    // the matrix identical
    val withoutClean = matrix(evalMedia.where(col("media_id") =!= 36L))
    assert(withoutClean == got, s"clean probe changed the matrix:\n$got\nvs\n$withoutClean")
  }

  test("audio fingerprint pairs the same envelope across rates/channels, not scenes") {
    // 8 ids over 2 scenes: scene = id % 2, rate cycles 8k/16k/44.1k/48k,
    // channels alternate — same scene = byte-wise unrelated WAVs
    val media = Multimodal.withSharedAudioScenes(
      (0L until 8L).toDF("doc_id"), "doc_id", nScenes = 2)
    val fp = Multimodal.audioFingerprint(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("afp")).toMap
    assert(fp.size == 8)
    // same scene at different rates/channels stays within the radius
    for (a <- 0L until 8L; b <- (a + 1) until 8L if a % 2 == b % 2)
      assert(java.lang.Long.bitCount(fp(a) ^ fp(b)) <= 3,
        s"ids $a,$b share a scene but drifted ${java.lang.Long.bitCount(fp(a) ^ fp(b))} bits")

    val pairs = graft.dedup.Dedup.hammingPairs64(
      Multimodal.audioFingerprint(media), "media_id", "afp", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.foreach { case (a, b) =>
      assert(a % 2 == b % 2, s"cross-scene audio pair ($a,$b) must not appear")
    }
    // all 6 same-scene pairs per scene × 2 scenes = 12
    assert(pairs.size == 12, pairs.toString)

    // brute-force parity for the banding join
    val brute = (for {
      a <- fp.keys; b <- fp.keys if a < b
      if java.lang.Long.bitCount(fp(a) ^ fp(b)) <= 3
    } yield (a, b)).toSet
    assert(pairs == brute)

    // header-only WAV (no samples) yields a null fingerprint
    val headerOnly = Multimodal.audioFingerprint(
      Multimodal.withFakeMedia((0L until 2L).toDF("doc_id"), "doc_id", "audio"))
    assert(headerOnly.where(col("afp").isNull).count() == 2)
  }

  test("pixel-tier audio: PCM samples are real and RMS matches the sine amplitude") {
    val m = Multimodal.withFakeMediaPixels(base, "doc_id", "audio").repartition(2)
    val got = Multimodal.decodeAudioMeta(m).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("sample_rate"), r.getAs[Int]("channels"), r.getAs[Double]("rms"))).toMap
    // amplitude 0.5 sine → rms ≈ 0.5/√2 ≈ 0.3536 (quantization + partial cycles)
    got.values.foreach { case (_, _, rms) => assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.01) }
    // header-tier WAV (no data bytes) keeps metadata but yields null rms
    val headerOnly = Multimodal.decodeAudioMeta(Multimodal.withFakeMedia(base, "doc_id", "audio"))
    assert(headerOnly.where(col("sample_rate").isNotNull).count() == 3)
    assert(headerOnly.where(col("rms").isNotNull).count() == 0)
  }

  test("sceneChanges flags exactly the cut boundaries of a multi-scene GIF") {
    // 3 scenes × 6 identical frames; n=9 samples every 2nd frame
    // (picks 0,2,..,16), so consecutive pairs straddle the scene edges
    // at 4→6 and 10→12 and sit inside one scene everywhere else
    val gif = ImagePixels.animatedGifScenes(32, 24, framesPerScene = 6, scenes = 3, seed = 5L)
    val df = Seq((1L, gif)).toDF("media_id", "payload")
    val rows = Multimodal.sceneChanges(df, n = 9, maxHamming = 10).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))
    assert(rows.length == 8)
    val cuts = rows.filter(_._4).map(t => (t._1, t._2)).toSet
    assert(cuts == Set((4, 6), (10, 12)), rows.mkString(","))
    // inside a scene the frames are identical -> hamming exactly 0
    rows.filterNot(_._4).foreach { case (_, _, h, _) => assert(h == 0) }
    // undecodable payloads emit nothing rather than failing the stage
    val junk = Seq((2L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    assert(Multimodal.sceneChanges(junk, n = 4).count() == 0)
  }
}
