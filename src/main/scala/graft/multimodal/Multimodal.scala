package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus a typed metadata struct, processed in partition-sized
  * batches.
  *
  * Two payload tiers, both REAL:
  *  - header tier (`withFakeMedia`): payloads are genuine format headers
  *    (PNG sig+IHDR, JPEG SOF, GIF/BMP/RIFF) parsed by
  *    [[ImageHeaderDecoder]] with zero codec involvement — the cheap
  *    metadata-only scan a 100 TB pipeline runs first.
  *  - pixel tier (`withFakeMediaPixels` + [[Multimodal.decodeImage]] /
  *    [[Multimodal.resize]] / [[Multimodal.sampleFrames]]): payloads are
  *    complete encoded files (PNG/GIF/BMP/JPEG via `javax.imageio`,
  *    animated GIF for video, PCM WAV for audio) and the operators do the
  *    full decode — pixels, stats, thumbnail re-encode, frame extraction —
  *    inside `mapPartitions` batches with one decoder init per partition
  *    (the same contract a JNI codec integration needs).
  *
  * Reference analogue: the media columns bacon's observers render
  * (bacon/observers/table.py renders cell payloads; the engine treats them
  * as opaque bytes + metadata, which is exactly the schema here).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType), StructField("n_bytes", LongType))), nullable = false),
  ))

  /** Attach a deterministic synthetic payload to each row — stands in for
    * reading real media bytes from object storage. The bytes ARE valid
    * format headers (kind "audio": RIFF/WAV with rotating sample rates;
    * otherwise PNG/GIF/BMP/JPEG rotating by id, dimensions derived from
    * the id), so the downstream decode exercises real byte parsing.
    * Header-only: cheap enough to fan out over the whole corpus.
    */
  def withFakeMedia(df: DataFrame, idCol: String, kind: String): DataFrame = {
    val src = df.select(col(idCol).cast("long").as("media_id"))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload =
          if (kind == "audio") {
            val rates = Array(8000, 16000, 44100, 48000)
            ImageHeaders.wavBytes(rates((id % 4).toInt), 1 + (id % 2).toInt, 16,
              nSamples = 1000 + (id % 100).toInt * 100)
          } else {
            val w = 64 + (id % 16).toInt * 64
            val h = 64 + ((id / 16) % 16).toInt * 64
            (id % 4) match {
              case 0 => ImageHeaders.pngBytes(w, h)
              case 1 => ImageHeaders.gifBytes(w, h)
              case 2 => ImageHeaders.bmpBytes(w, h)
              case _ => ImageHeaders.jpegBytes(w, h)
            }
          }
        Row(id, kind, payload, Row("synthetic", payload.length.toLong))
      }
    }(encoder)
  }

  /** Pixel-tier payloads: COMPLETE encoded media files, deterministic from
    * the id. kind "image" → full PNG/GIF/BMP/JPEG (rotating by id) of a
    * deterministic RGB pattern; "video" → multi-frame animated GIF;
    * "audio" → PCM WAV with real sine-wave samples. Everything downstream
    * of this is a genuine decode (ImageIO / PCM math), not a stub.
    */
  def withFakeMediaPixels(df: DataFrame, idCol: String, kind: String): DataFrame = {
    val src = df.select(col(idCol).cast("long").as("media_id"))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = kind match {
          case "audio" =>
            val rates = Array(8000, 16000, 44100, 48000)
            ImageHeaders.wavBytesPcm(rates((id % 4).toInt), 1 + (id % 2).toInt,
              nSamples = 1000 + (id % 100).toInt * 100, freqHz = 220.0 + (id % 8) * 110.0,
              amplitude = 0.5)
          case "video" =>
            val w = 32 + (id % 8).toInt * 8
            val h = 24 + ((id / 8) % 8).toInt * 8
            ImagePixels.animatedGif(w, h, nFrames = 4 + (id % 3).toInt, seed = id)
          case _ =>
            val w = 16 + (id % 16).toInt * 4
            val h = 16 + ((id / 16) % 16).toInt * 4
            (id % 4) match {
              case 0 => ImagePixels.encode(ImagePixels.pattern(w, h, id), "png")
              // indexed source: the GIF writer streams the raster instead
              // of running per-image palette quantization
              case 1 => ImagePixels.encode(ImagePixels.patternIndexed(w, h, id), "gif")
              case 2 => ImagePixels.encode(ImagePixels.pattern(w, h, id), "bmp")
              case _ => ImagePixels.encode(ImagePixels.pattern(w, h, id), "jpg")
            }
        }
        Row(id, kind, payload, Row("synthetic", payload.length.toLong))
      }
    }(encoder)
  }

  /** Scale-aware scene-pool size for the shared-scene corpora: holds
    * per-scene multiplicity at ~`targetCopies` re-encodings so the
    * downstream hamming pair join stays LINEAR in the corpus — a fixed
    * pool lets every scene's copy count (and the within-bucket pair
    * join) grow with the data, the same quadratic-by-fixed-structure
    * trap as a fixed LSH plane count (Similarity.suggestedPlanes).
    * Real corpora behave this way too: duplicate-group sizes are
    * bounded; it is the NUMBER of groups that grows with the crawl.
    * The floor keeps gate/bench-sized inputs (≤ minScenes×targetCopies
    * rows) byte-identical to the historical fixed-100 shape.
    */
  def suggestedScenes(n: Long, targetCopies: Int = 50, minScenes: Int = 100): Int =
    math.max(minScenes, (math.max(n, 1L) / targetCopies).toInt)

  /** Pixel-tier corpus with SHARED SCENES: each media id renders scene
    * `id % nScenes`, re-encoded under the id's rotating format — so the
    * same pixels recur across documents as byte-wise-different PNG/GIF/
    * BMP/JPEG payloads. This is the image-dedup test shape: a dedup that
    * only fingerprints bytes sees nothing; a perceptual hash must.
    */
  def withSharedScenes(df: DataFrame, idCol: String, nScenes: Int): DataFrame = {
    require(nScenes > 0, s"nScenes must be positive, got $nScenes")
    val src = df.select(col(idCol).cast("long").as("media_id"))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val scene = id % nScenes
        val (w, h) = (32 + (scene % 4).toInt * 8, 24 + ((scene / 4) % 4).toInt * 8)
        val payload = (id % 4) match {
          case 0 => ImagePixels.encode(ImagePixels.pattern(w, h, scene), "png")
          case 1 => ImagePixels.encode(ImagePixels.patternIndexed(w, h, scene), "gif")
          case 2 => ImagePixels.encode(ImagePixels.pattern(w, h, scene), "bmp")
          case _ => ImagePixels.encode(ImagePixels.pattern(w, h, scene), "jpg")
        }
        Row(id, "image", payload, Row("synthetic", payload.length.toLong))
      }
    }(encoder)
  }

  /** Audio corpus with SHARED SCENES: each media id renders the
    * amplitude envelope of scene `id % nScenes` at a rotating sample
    * rate and channel count — byte-wise unrelated WAVs of the same
    * recording, the input shape for audio dedup.
    */
  def withSharedAudioScenes(df: DataFrame, idCol: String, nScenes: Int): DataFrame = {
    require(nScenes > 0, s"nScenes must be positive, got $nScenes")
    val src = df.select(col(idCol).cast("long").as("media_id"))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    src.mapPartitions { rows =>
      val rates = Array(8000, 16000, 44100, 48000)
      rows.map { r =>
        val id = r.getLong(0)
        val payload = ImageHeaders.wavBytesPcmEnvelope(
          rates((id % 4).toInt), 1 + (id % 2).toInt, durationSec = 0.25,
          freqHz = 440.0, sceneSeed = id % nScenes)
        Row(id, "audio", payload, Row("synthetic", payload.length.toLong))
      }
    }(encoder)
  }

  /** Audio fingerprint column: append the 64-bit energy-envelope hash
    * (null for undecodable/header-only payloads); feed to
    * `Dedup.hammingPairs64` for cross-encoding audio near-dup pairs.
    */
  def audioFingerprint(df0: DataFrame): DataFrame = {
    val df = df0.drop("afp")
    val outSchema = StructType(df.schema.fields :+ StructField("afp", LongType))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val f = ImageHeaders.audioFingerprint64(
          r.get(payloadIdx).asInstanceOf[Array[Byte]]).map(Long.box).orNull
        Row.fromSeq(r.toSeq :+ f)
      }
    }(encoder)
  }

  /** Perceptual hash column: decode each payload and append its 64-bit
    * dHash (null for undecodable bytes). Same mapPartitions batch shape
    * as the other pixel-tier operators; feed the result to
    * `Dedup.hammingPairs64` for cross-format near-duplicate pairs.
    */
  def imageDHash(df0: DataFrame): DataFrame = {
    val df = df0.drop("dhash")
    val outSchema = StructType(df.schema.fields :+ StructField("dhash", LongType))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val d = ImagePixels.decode(r.get(payloadIdx).asInstanceOf[Array[Byte]])
          .map(img => Long.box(ImagePixels.dHash64(img))).orNull
        Row.fromSeq(r.toSeq :+ d)
      }
    }(encoder)
  }

  /** Cross-modal decontamination matrix — the [[graft.dedup.Dedup
    * .contaminationMatrix]] contract for IMAGES: which eval sets'
    * pictures leak into which training-corpus groups, counted per
    * (eval_set, group) with group totals and fractions. Text
    * decontamination cannot see a benchmark screenshot re-encoded as a
    * JPEG; this composes the perceptual tier ([[imageDHash]]) with the
    * banded cross-frame hamming join ([[graft.dedup.Dedup
    * .hammingJoin64]]) so the SAME pixels under byte-wise-unrelated
    * encodings still match.
    *
    * `train` and `evalMedia` are media frames (a `payload` column);
    * `train` additionally carries `groupCol` (source/shard), `evalMedia`
    * carries `evalSetCol` (benchmark name). A train item is
    * contaminated when ANY eval image of the set is within `maxHamming`
    * dHash bits. Groups with zero hits for a set are absent (the d45
    * convention). Scale shape: both sides hash once into slim
    * (id, group/set, hash) rows (localCheckpoint — never re-decode for
    * the join-back), the eval side is benchmark-sized so its banded
    * rows broadcast, and the corpus side never self-joins.
    */
  def imageContaminationMatrix(train: DataFrame, trainIdCol: String,
                               groupCol: String,
                               evalMedia: DataFrame, evalIdCol: String,
                               evalSetCol: String,
                               maxHamming: Int = 3,
                               wide: Boolean = false): DataFrame = {
    val trainH = imageDHash(train)
      .select(col(trainIdCol).as("__tid"), col(groupCol).as("__grp"),
        col("dhash").as("__th"))
      .localCheckpoint(true)
    val evalH = imageDHash(evalMedia)
      .select(col(evalIdCol).as("__eid"), col(evalSetCol).as("__set"),
        col("dhash").as("__eh"))
      .localCheckpoint(true)
    val hits = graft.dedup.Dedup.hammingJoin64(
      trainH, "__tid", "__th", evalH, "__eid", "__eh", maxHamming, wide)
    val contaminated = hits
      .join(trainH.select(col("__tid").as("id1"), col("__grp")), Seq("id1"))
      .join(evalH.select(col("__eid").as("id2"), col("__set")), Seq("id2"))
      .select(col("__set"), col("__grp"), col("id1")).distinct()
      .groupBy(col("__set"), col("__grp"))
      .agg(count(lit(1)).as("n_contaminated"))
    // group totals come from the checkpointed hash frame — one row per
    // train row (imageDHash is 1:1), so counts are identical to counting
    // `train` itself, WITHOUT re-running the train frame's payload
    // pipeline: `train` is typically an opaque render/decode
    // mapPartitions that column pruning cannot reach, so a count
    // against it re-renders every payload (measured on m04: warm task
    // CPU 24.3 → 16.0 s, jobs 24 → 20 from this one line)
    val totals = trainH.groupBy(col("__grp"))
      .agg(count(lit(1)).as("n_docs"))
    contaminated.join(totals, Seq("__grp"))
      .select(col("__set").as(evalSetCol), col("__grp").as(groupCol),
        col("n_contaminated"), col("n_docs"),
        round(col("n_contaminated").cast("double") / col("n_docs"), 6).as("frac"))
  }

  /** Image metadata decode: parses format + dimensions from the payload's
    * real header bytes. Batching contract: iterator-in/iterator-out per
    * partition, decoder state initialized once per partition — exactly
    * what a JNI/codec integration needs for full pixel decode.
    */
  def decodeImageMeta(df0: DataFrame): DataFrame = {
    val df = df0.drop("width", "height", "format")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("format", StringType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    // resolve by index up front: rows inside a fused pipeline may be
    // schema-less GenericRows where name lookup is unsupported
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      // per-partition decoder init happens HERE (once, not per row)
      val decoder = new ImageHeaderDecoder
      rows.map { r =>
        val payload = r.get(payloadIdx).asInstanceOf[Array[Byte]]
        val (w, h, f) = decoder.decode(payload)
        Row.fromSeq(r.toSeq ++ Seq(w.map(Int.box).orNull, h.map(Int.box).orNull, f))
      }
    }(encoder)
  }

  /** FULL image decode: header parse (width/height/format, byte-level) PLUS
    * a real pixel decode via `javax.imageio` — decoded dimensions
    * (px_width/px_height, independently derived from the pixel raster) and
    * first-pass luma statistics (mean_luma/std_luma over BT.601 luma).
    * Undecodable payloads (e.g. header-tier bytes with no pixel data)
    * yield null pixel columns, never an exception — at 100 TB some share
    * of any media corpus is always corrupt.
    */
  def decodeImage(df0: DataFrame): DataFrame = {
    val df = df0.drop("width", "height", "format", "px_width", "px_height",
      "mean_luma", "std_luma")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("format", StringType),
      StructField("px_width", IntegerType), StructField("px_height", IntegerType),
      StructField("mean_luma", DoubleType), StructField("std_luma", DoubleType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      val headerDecoder = new ImageHeaderDecoder
      rows.map { r =>
        val payload = r.get(payloadIdx).asInstanceOf[Array[Byte]]
        val (w, h, f) = headerDecoder.decode(payload)
        val pixelCols = ImagePixels.decode(payload) match {
          case Some(img) =>
            val (mean, std) = ImagePixels.lumaStats(img)
            Seq(Int.box(img.getWidth), Int.box(img.getHeight),
              Double.box(mean), Double.box(std))
          case None => Seq(null, null, null, null)
        }
        Row.fromSeq(r.toSeq ++ Seq(w.map(Int.box).orNull, h.map(Int.box).orNull, f) ++ pixelCols)
      }
    }(encoder)
  }

  /** REAL resize: decodes the payload, scales it to fit within
    * `maxDim`×`maxDim` (aspect-preserving, bilinear, never upscales), and
    * re-encodes the thumbnail as PNG. Output replaces `payload` with the
    * thumbnail bytes and carries the new pixel dimensions; undecodable
    * payloads pass through with null thumbnail columns.
    */
  def resize(df: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    val keep = df.schema.fields.filterNot(f => Set("payload", "width", "height", "format")(f.name))
    val outSchema = StructType(keep ++ Seq(
      StructField("payload", BinaryType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("format", StringType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val keepIdx = keep.map(f => df.schema.fieldIndex(f.name))
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val kept = keepIdx.map(r.get).toSeq
        val outCols = ImagePixels.decode(r.get(payloadIdx).asInstanceOf[Array[Byte]]) match {
          case Some(img) =>
            val thumb = ImagePixels.scaleToFit(img, maxDim)
            Seq(ImagePixels.encode(thumb, "png"),
              Int.box(thumb.getWidth), Int.box(thumb.getHeight), "png")
          case None => Seq(null, null, null, null)
        }
        Row.fromSeq(kept ++ outCols)
      }
    }(encoder)
  }

  /** REAL frame sampling: reads the animated-GIF video payload with the
    * JDK's multi-frame GIF reader, picks up to `n` evenly-spaced frames,
    * and re-encodes each sampled frame as a standalone PNG with its true
    * dimensions. Non-video / undecodable payloads contribute zero rows.
    */
  def sampleFrames(df: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType), StructField("kind", StringType),
      StructField("n_frames", IntegerType), StructField("frame_idx", IntegerType),
      StructField("frame_payload", BinaryType),
      StructField("frame_width", IntegerType), StructField("frame_height", IntegerType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex("media_id")
    val kindIdx = df.schema.fieldIndex("kind")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val kind = r.getString(kindIdx)
        val payload = r.get(payloadIdx).asInstanceOf[Array[Byte]]
        // bounded decode: sequential (GIF delta frames) but stops at the
        // last sampled index, not the end of the clip
        val (total, sampled) = ImagePixels.sampleGifFrames(payload, n)
        sampled.iterator.map { case (idx, img) =>
          Row(id, kind, total, idx, ImagePixels.encode(img, "png"),
            img.getWidth, img.getHeight)
        }
      }
    }(encoder)
  }

  /** Scene-change (cut) detection over a video's sampled frames: the
    * perceptual dHash distance between CONSECUTIVE sampled frames, a cut
    * where it exceeds `maxHamming` — the clip-segmentation step a video
    * training pipeline runs before captioning/embedding whole shots.
    * Output: one row per consecutive frame pair (media_id, from_idx,
    * to_idx, hamming, is_cut); undecodable / single-frame payloads emit
    * nothing.
    *
    * Scale shape: everything — bounded decode, per-frame hash, the
    * consecutive-pair fold — happens inside the row's partition; NO
    * shuffle anywhere (contrast cross-VIDEO dedup, which bands hashes
    * through hammingPairs64). Each frame hashes once.
    */
  def sceneChanges(df: DataFrame, n: Int, maxHamming: Int = 10): DataFrame = {
    require(n >= 2, s"need at least 2 sampled frames, got $n")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType), StructField("from_idx", IntegerType),
      StructField("to_idx", IntegerType), StructField("hamming", IntegerType),
      StructField("is_cut", BooleanType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val payload = r.get(payloadIdx).asInstanceOf[Array[Byte]]
        val (_, sampled) = ImagePixels.sampleGifFrames(payload, n)
        val hashed = sampled.map { case (idx, img) => (idx, ImagePixels.dHash64(img)) }
        hashed.sliding(2).collect {
          case IndexedSeq((i1, h1), (i2, h2)) =>
            val d = java.lang.Long.bitCount(h1 ^ h2)
            Row(id, i1, i2, d, d > maxHamming)
        }
      }
    }(encoder)
  }

  /** Audio (WAV/RIFF) metadata decode + real sample analysis — per-
    * partition batch contract as decodeImageMeta. Header fields come from
    * byte parsing; `rms` is computed from the actual 16-bit PCM samples in
    * the data chunk (null when the payload carries no sample data).
    */
  def decodeAudioMeta(df0: DataFrame): DataFrame = {
    val df = df0.drop("sample_rate", "channels", "bits", "seconds", "rms")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
      StructField("bits", IntegerType), StructField("seconds", DoubleType),
      StructField("rms", DoubleType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      val decoder = new ImageHeaderDecoder
      rows.map { r =>
        val payload = r.get(payloadIdx).asInstanceOf[Array[Byte]]
        val extra = decoder.decodeWav(payload) match {
          case Some((rate, ch, bits, secs)) =>
            val rms = decoder.pcmRms(payload, bits)
            Seq(Int.box(rate), Int.box(ch), Int.box(bits), Double.box(secs),
              rms.map(Double.box).orNull)
          case None => Seq(null, null, null, null, null)
        }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(encoder)
  }
}

/** Real image header construction + parsing — pure byte work on genuine
  * format structure (PNG sig+IHDR, JPEG SOF markers, GIF/BMP headers),
  * zero codec dependencies.
  */
object ImageHeaders {

  /** PNG signature + IHDR chunk (width/height big-endian at 16/20). */
  def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h)
    out.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.putInt(0) // CRC not validated by header parsers
    out.array()
  }

  /** GIF89a header (width/height little-endian u16 at 6/8). */
  def gifBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes("US-ASCII"))
    out.putShort(w.toShort).putShort(h.toShort)
    out.put(0.toByte).put(0.toByte).put(0.toByte)
    out.array()
  }

  /** BMP file header + BITMAPINFOHEADER (width/height LE i32 at 18/22). */
  def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(54).putShort(0).putShort(0).putInt(54) // size, reserved, pixel offset
    out.putInt(40).putInt(w).putInt(h)                 // DIB header
    out.putShort(1).putShort(24)
    out.array()
  }

  /** WAV (RIFF) header: sample rate / channels / bits at fixed offsets in
    * the fmt chunk — the audio modality's metadata, parseable with zero
    * codec dependencies like the image headers. Header-only (declared data
    * length, no sample bytes) — see [[wavBytesPcm]] for the real-PCM tier.
    */
  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * channels * (bitsPerSample / 8)
    val out = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1) // PCM
    out.putShort(channels.toShort).putInt(sampleRate)
    out.putInt(sampleRate * channels * (bitsPerSample / 8))
    out.putShort((channels * (bitsPerSample / 8)).toShort).putShort(bitsPerSample.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    out.array()
  }

  /** Complete 16-bit PCM WAV: the [[wavBytes]] header followed by REAL
    * sine-wave samples (`amplitude` in [0,1] of full scale, identical
    * across channels). RMS of the payload is amplitude/√2 — asserted in
    * the spec, so the sample synthesis and the decode check each other.
    */
  def wavBytesPcm(sampleRate: Int, channels: Int, nSamples: Int,
                  freqHz: Double, amplitude: Double): Array[Byte] = {
    val header = wavBytes(sampleRate, channels, 16, nSamples)
    val out = java.nio.ByteBuffer.allocate(44 + nSamples * channels * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(header)
    val scale = amplitude * Short.MaxValue
    var i = 0
    while (i < nSamples) {
      val s = (math.sin(2.0 * math.Pi * freqHz * i / sampleRate) * scale).toInt.toShort
      var c = 0
      while (c < channels) { out.putShort(s); c += 1 }
      i += 1
    }
    out.array()
  }

  /** Amplitude-envelope WAV: a 16-bit PCM sine whose amplitude steps
    * through 64 deterministic per-scene segments — the audio analogue of
    * the shared-scene image corpus. The ENVELOPE (not the byte stream)
    * is the scene's identity: the same scene rendered at a different
    * sample rate or channel count is a byte-wise unrelated file tracing
    * the same energy curve over time, which is exactly what
    * [[audioFingerprint64]] hashes.
    */
  def wavBytesPcmEnvelope(sampleRate: Int, channels: Int, durationSec: Double,
                          freqHz: Double, sceneSeed: Long): Array[Byte] = {
    val nSamples = math.max((sampleRate * durationSec).toInt, 1)
    val header = wavBytes(sampleRate, channels, 16, nSamples)
    val out = java.nio.ByteBuffer.allocate(44 + nSamples * channels * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(header)
    var i = 0
    while (i < nSamples) {
      val seg = math.min(i.toLong * 64 / nSamples, 63L).toInt
      val amp = segmentAmp(sceneSeed, seg)
      val s = (math.sin(2.0 * math.Pi * freqHz * i / sampleRate) *
        amp * Short.MaxValue).toInt.toShort
      var c = 0
      while (c < channels) { out.putShort(s); c += 1 }
      i += 1
    }
    out.array()
  }

  /** Deterministic per-(scene, segment) amplitude in [0.15, 0.95]. The
    * mix must AVALANCHE (murmur3 finalizer): a linear combination of
    * (seed, seg) makes consecutive segment amplitudes mostly-increasing
    * for EVERY scene, which correlates all fingerprints and collapses
    * cross-scene hamming distances.
    */
  private def segmentAmp(seed: Long, seg: Int): Double = {
    var h = seed * 0x9E3779B97F4A7C15L + seg.toLong * 0xC2B2AE3D27D4EB4FL
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
    val x = (h & 0xFFFFL).toDouble / 65535.0
    0.15 + 0.8 * x
  }

  /** 64-bit audio fingerprint: mean-square energy in 65 equal TIME
    * windows over the PCM run, bit i set iff e(i+1) > e(i) — the same
    * gradient-direction construction as the image dHash, over the energy
    * envelope instead of luma. Windows are fractions of the clip, so the
    * bits survive sample-rate and channel-count changes (re-encodes of
    * the same recording); None for header-only or non-16-bit payloads.
    */
  def audioFingerprint64(b: Array[Byte]): Option[Long] =
    new ImageHeaderDecoder().decodeWav(b).flatMap { case (_, _, bits, _) =>
      val n = if (bits == 16) (b.length - 44) / 2 else 0
      if (n < 65) None
      else {
        val e = new Array[Double](65)
        val cnt = new Array[Int](65)
        var i = 0
        while (i < n) {
          val w = math.min(i.toLong * 65 / n, 64L).toInt
          val off = 44 + i * 2
          val s = (((b(off + 1) & 0xFF) << 8) | (b(off) & 0xFF)).toShort.toDouble / Short.MaxValue
          e(w) += s * s
          cnt(w) += 1
          i += 1
        }
        var out = 0L
        var w = 0
        while (w < 64) {
          if (e(w + 1) / math.max(cnt(w + 1), 1) > e(w) / math.max(cnt(w), 1))
            out |= (1L << w)
          w += 1
        }
        Some(out)
      }
    }

  /** Minimal JPEG: SOI + SOF0 with dimensions (height/width BE at +5/+7). */
  def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(2 + 19)
    out.put(0xFF.toByte).put(0xD8.toByte)                  // SOI
    out.put(0xFF.toByte).put(0xC0.toByte).putShort(17)     // SOF0, length
    out.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    out.put(3.toByte) // components
    out.put(Array.fill(9)(0.toByte))
    out.array()
  }
}

/** Real pixel codec work via the JDK's `javax.imageio` — no external
  * dependencies. Encodes/decodes complete PNG/GIF/BMP/JPEG files, writes
  * and reads multi-frame animated GIFs (the video stand-in), scales
  * rasters, and computes first-pass pixel statistics.
  */
object ImagePixels {
  // ImageIO raster work needs no display; make that explicit for executors
  System.setProperty("java.awt.headless", "true")

  import java.awt.image.BufferedImage
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
  import javax.imageio.ImageIO

  // ImageIO defaults to a disk-backed stream cache: every read/write on a
  // non-File stream spools through a temp file on executor-local disk — a
  // create/write/delete cycle PER ROW in the pixel hot path. Our payloads
  // are in-memory byte arrays; cache in memory instead.
  ImageIO.setUseCache(false)

  /** Deterministic RGB test pattern — every pixel a pure function of
    * (x, y, seed), so any decoded raster can be verified exactly.
    */
  def pattern(w: Int, h: Int, seed: Long): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 31 + y * 7 + seed) % 256).toInt & 0xFF
        val g = ((x * 13 + y * 29 + seed * 3) % 256).toInt & 0xFF
        val b = ((x * 5 + y * 11 + seed * 7) % 256).toInt & 0xFF
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode via ImageIO ("png" | "gif" | "bmp" | "jpg"). */
  def encode(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ok = ImageIO.write(img, format, bos)
    require(ok, s"no ImageIO writer for format '$format'")
    bos.toByteArray
  }

  /** Full pixel decode; None when no installed reader accepts the bytes
    * (e.g. header-only payloads, corrupt files).
    */
  def decode(b: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(b)))
    catch { case _: java.io.IOException => None }

  /** Mean and (population) std-dev of BT.601 luma over the raster. */
  def lumaStats(img: BufferedImage): (Double, Double) = {
    var sum = 0.0; var sumSq = 0.0
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
        sum += luma; sumSq += luma * luma
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    val mean = sum / n
    (mean, math.sqrt(math.max(0.0, sumSq / n - mean * mean)))
  }

  /** Aspect-preserving bilinear downscale to fit maxDim×maxDim (no
    * upscaling, min output dimension 1px).
    */
  def scaleToFit(img: BufferedImage, maxDim: Int): BufferedImage = {
    val scale = math.min(1.0, maxDim.toDouble / math.max(img.getWidth, img.getHeight))
    if (scale >= 1.0) img
    else {
      val nw = math.max(1, math.round(img.getWidth * scale).toInt)
      val nh = math.max(1, math.round(img.getHeight * scale).toInt)
      val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, nw, nh, null)
      g.dispose()
      out
    }
  }

  /** Fixed 216-color (6×6×6 cube) palette. Rendering GIF frames as
    * TYPE_BYTE_INDEXED against a fixed palette lets the JDK GIF writer
    * stream the raster directly — its per-frame median-cut quantization
    * of RGB input costs ~100ms/frame and dominated the video pipeline.
    */
  private lazy val gifPalette: java.awt.image.IndexColorModel = {
    val r = new Array[Byte](216); val g = new Array[Byte](216); val b = new Array[Byte](216)
    var i = 0
    var ri = 0
    while (ri < 6) {
      var gi = 0
      while (gi < 6) {
        var bi = 0
        while (bi < 6) {
          r(i) = (ri * 51).toByte; g(i) = (gi * 51).toByte; b(i) = (bi * 51).toByte
          i += 1; bi += 1
        }
        gi += 1
      }
      ri += 1
    }
    new java.awt.image.IndexColorModel(8, 216, r, g, b)
  }

  /** Deterministic indexed-color pattern (for GIF/video frames): every
    * pixel's palette index is a pure function of (x, y, seed).
    */
  def patternIndexed(w: Int, h: Int, seed: Long): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, gifPalette)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((x * 31 + y * 17 + seed * 7) % 216).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Multi-frame animated GIF — the video stand-in. Frame f's pattern seed
    * is `seed + f`, so frames are distinct and each is independently
    * verifiable.
    */
  def animatedGif(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        writer.writeToSequence(
          new javax.imageio.IIOImage(patternIndexed(w, h, seed + f), null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Animated GIF with hard scene CUTS: `scenes` scenes of
    * `framesPerScene` identical frames each, alternating between a
    * left→right luma ramp and its reverse — the dHash of a monotone
    * ramp is all-ones / all-zeroes, so every boundary is hamming 64 and
    * every within-scene pair hamming 0: the ground truth for
    * scene-change detection specs. (`seed` offsets the ramps so clips
    * differ across ids without touching the gradient directions.)
    */
  def animatedGifScenes(w: Int, h: Int, framesPerScene: Int, scenes: Int,
                        seed: Long): Array[Byte] = {
    def ramp(reverse: Boolean): BufferedImage = {
      val m = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val xx = if (reverse) w - 1 - x else x
          val l = (((xx * 255) / math.max(1, w - 1)) + (seed % 16)).min(255).toInt
          m.setRGB(x, y, (l << 16) | (l << 8) | l)
          x += 1
        }
        y += 1
      }
      m
    }
    val base = ramp(reverse = false)
    val mirrored = ramp(reverse = true)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var s = 0
      while (s < scenes) {
        val img = if (s % 2 == 0) base else mirrored
        var f = 0
        while (f < framesPerScene) {
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        s += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Up to `n` evenly-spaced frames of a (possibly animated) GIF, plus the
    * total frame count: `(total, Seq((frameIdx, frame)))`. GIF frames may
    * be delta-coded against earlier ones, so decoding is sequential — but
    * it STOPS at the last picked index instead of running to
    * `getNumImages`: for a long clip sampled at small `n` the tail
    * (total − 1 − lastPick ≈ total/n frames) is never decoded.
    * `(0, empty)` for non-GIF / undecodable bytes.
    */
  def sampleGifFrames(b: Array[Byte], n: Int): (Int, IndexedSeq[(Int, BufferedImage)]) = {
    require(n > 0, s"n must be positive, got $n")
    if (b.length < 6 || !b.startsWith("GIF8".getBytes("US-ASCII")))
      return (0, IndexedSeq.empty)
    val readers = ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return (0, IndexedSeq.empty)
    val reader = readers.next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(b))
    try {
      reader.setInput(iis, false)
      val total = reader.getNumImages(true)
      if (total <= 0) return (0, IndexedSeq.empty)
      val picks =
        if (total <= n) 0 until total
        else (0 until n).map(i => (i.toLong * total / n).toInt)
      val pickSet = picks.toSet
      val out = IndexedSeq.newBuilder[(Int, BufferedImage)]
      var i = 0
      val last = picks.last
      while (i <= last) {
        val img = reader.read(i)
        if (pickSet(i)) out += (i -> img)
        i += 1
      }
      (total, out.result())
    } catch {
      case _: java.io.IOException => (0, IndexedSeq.empty)
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** 64-bit perceptual difference hash (dHash): bilinear-resample the
    * image to 9×8 luma, set bit (y·8 + x) iff luma(x+1, y) > luma(x, y).
    * Gradient DIRECTIONS survive re-encoding, scaling and mild lossy
    * compression, so the same scene stored as PNG by one document and
    * JPEG/BMP by another hashes within a few bits — which is what makes
    * cross-format image dedup possible where byte-level fingerprints see
    * nothing.
    */
  def dHash64(img: BufferedImage): Long = {
    val small = new BufferedImage(9, 8, BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 9, 8, null)
    } finally g.dispose()
    def luma(x: Int, y: Int): Double = {
      val rgb = small.getRGB(x, y)
      0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
    }
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(x + 1, y) > luma(x, y)) bits |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    bits
  }

  /** All frames of a (possibly animated) GIF; empty for non-GIF bytes. */
  def readGifFrames(b: Array[Byte]): IndexedSeq[BufferedImage] = {
    if (b.length < 6 || !b.startsWith("GIF8".getBytes("US-ASCII"))) return IndexedSeq.empty
    val readers = ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return IndexedSeq.empty
    val reader = readers.next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(b))
    try {
      reader.setInput(iis, false)
      val n = reader.getNumImages(true)
      (0 until n).map(reader.read(_))
    } catch {
      case _: java.io.IOException => IndexedSeq.empty
    } finally {
      reader.dispose()
      iis.close()
    }
  }
}

/** Image header parser (the real part of the decode path). Stateful class
  * to mirror the init-once-per-partition cost profile of real decoders.
  */
final class ImageHeaderDecoder extends Serializable {

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
  private def leInt(b: Array[Byte], off: Int): Int =
    ((b(off + 3) & 0xFF) << 24) | ((b(off + 2) & 0xFF) << 16) |
      ((b(off + 1) & 0xFF) << 8) | (b(off) & 0xFF)
  private def beShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
  private def leShort(b: Array[Byte], off: Int): Int =
    ((b(off + 1) & 0xFF) << 8) | (b(off) & 0xFF)

  private val PngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** WAV audio metadata: (sampleRate, channels, bitsPerSample, seconds). */
  def decodeWav(b: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    if (b.length < 44 || !b.startsWith("RIFF".getBytes("US-ASCII")) ||
      !java.util.Arrays.equals(java.util.Arrays.copyOfRange(b, 8, 12), "WAVE".getBytes("US-ASCII")))
      return None
    val channels = leShort(b, 22)
    val rate = leInt(b, 24)
    val bits = leShort(b, 34)
    val dataLen = leInt(b, 40)
    val bytesPerSec = rate * channels * (bits / 8)
    val secs = if (bytesPerSec > 0) dataLen.toDouble / bytesPerSec else 0.0
    Some((rate, channels, bits, secs))
  }

  /** RMS (fraction of full scale) over the 16-bit PCM samples actually
    * present after the 44-byte header; None when the payload is
    * header-only or not 16-bit.
    */
  def pcmRms(b: Array[Byte], bits: Int): Option[Double] = {
    if (bits != 16 || b.length <= 44) return None
    val nSamples = (b.length - 44) / 2
    if (nSamples == 0) return None
    var sumSq = 0.0
    var i = 0
    while (i < nSamples) {
      val off = 44 + i * 2
      val s = (((b(off + 1) & 0xFF) << 8) | (b(off) & 0xFF)).toShort.toDouble / Short.MaxValue
      sumSq += s * s
      i += 1
    }
    Some(math.sqrt(sumSq / nSamples))
  }

  /** (width, height, format); (None, None, "unknown") when unrecognized. */
  def decode(b: Array[Byte]): (Option[Int], Option[Int], String) = {
    if (b.length >= 24 && b.take(8).sameElements(PngSig))
      (Some(beInt(b, 16)), Some(beInt(b, 20)), "png")
    else if (b.length >= 10 && b.startsWith("GIF8".getBytes("US-ASCII")))
      (Some(leShort(b, 6)), Some(leShort(b, 8)), "gif")
    else if (b.length >= 26 && b(0) == 'B'.toByte && b(1) == 'M'.toByte)
      (Some(leInt(b, 18)), Some(leInt(b, 22)), "bmp")
    else if (b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8)
      decodeJpeg(b)
    else (None, None, "unknown")
  }

  /** Walk JPEG markers to the first SOF0/1/2 frame header. */
  private def decodeJpeg(b: Array[Byte]): (Option[Int], Option[Int], String) = {
    var i = 2
    while (i + 3 < b.length && (b(i) & 0xFF) == 0xFF) {
      val marker = b(i + 1) & 0xFF
      if (marker == 0xC0 || marker == 0xC1 || marker == 0xC2) {
        if (i + 8 < b.length)
          return (Some(beShort(b, i + 7)), Some(beShort(b, i + 5)), "jpeg")
        return (None, None, "jpeg")
      }
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) i += 2
      else i += 2 + beShort(b, i + 2)
    }
    (None, None, "jpeg")
  }
}
