package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus a typed metadata struct, processed in partition-sized
  * batches.
  *
  * What is REAL here: the schema (BinaryType payload + metadata struct),
  * the batch shape (mapPartitions over an iterator, one decoder init per
  * partition — the same contract as mapInPandas/mapInArrow batches), the
  * partitioning (media ops repartition by id so decode parallelism is
  * independent of upstream file layout), and the metadata decode itself —
  * `ImageHeaderDecoder` parses genuine PNG/JPEG/GIF/BMP header structure
  * from the bytes (magic numbers, IHDR, SOF markers), no codec library
  * needed. The synthetic payloads are real minimal PNG/GIF/BMP headers.
  *
  * What is STUBBED (no codecs in this container, loudly marked): pixel
  * decode, resize of actual pixel data, video frame extraction.
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
    */
  def withFakeMedia(df: DataFrame, idCol: String, kind: String): DataFrame = {
    val spark = df.sparkSession
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

  /** Image metadata decode: parses format + dimensions from the payload's
    * real header bytes. Batching contract: iterator-in/iterator-out per
    * partition, decoder state initialized once per partition — exactly
    * what a JNI/codec integration needs for full pixel decode.
    */
  def decodeImageMeta(df: DataFrame): DataFrame = {
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

  /** Audio (WAV/RIFF) metadata decode — same per-partition batch contract
    * as decodeImageMeta; the header parsing is real byte work
    * (ImageHeaderDecoder.decodeWav), no codec library involved.
    */
  def decodeAudioMeta(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
      StructField("bits", IntegerType), StructField("seconds", DoubleType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      val decoder = new ImageHeaderDecoder
      rows.map { r =>
        val payload = r.get(payloadIdx).asInstanceOf[Array[Byte]]
        val extra = decoder.decodeWav(payload) match {
          case Some((rate, ch, bits, secs)) =>
            Seq(Int.box(rate), Int.box(ch), Int.box(bits), Double.box(secs))
          case None => Seq(null, null, null, null)
        }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(encoder)
  }

  /** STUB resize: clamps the metadata dimensions only — a real impl
    * transforms pixel bytes (needs a codec, absent in this container).
    */
  def resize(df: DataFrame, maxDim: Int): DataFrame =
    df.withColumn("width", least(col("width"), lit(maxDim)))
      .withColumn("height", least(col("height"), lit(maxDim)))

  /** STUB frame sampling for video payloads: emits `n` frame rows per
    * media row (explode — the real shape of frame extraction output; the
    * frame bytes are synthetic pending a video codec).
    */
  def sampleFrames(df: DataFrame, n: Int): DataFrame =
    df.select(col("media_id"), col("kind"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => sha2(concat(col("media_id").cast("string"), lit("#"), i.cast("string")), 256)
            .cast("binary"))).as(Seq("frame_idx", "frame_payload")))
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
    * codec dependencies like the image headers.
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
