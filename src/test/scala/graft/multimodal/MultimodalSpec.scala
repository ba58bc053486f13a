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

  test("resize clamps dimensions") {
    val m = Multimodal.decodeImageMeta(Multimodal.withFakeMedia(base, "doc_id", "image"))
    val r = Multimodal.resize(m, 128).collect()
    assert(r.forall(row => row.getAs[Int]("width") <= 128 && row.getAs[Int]("height") <= 128))
  }

  test("frame sampling explodes n frames per media row") {
    val m = Multimodal.withFakeMedia(base, "doc_id", "video")
    val f = Multimodal.sampleFrames(m, 4)
    assert(f.count() == 12)
    assert(f.columns.contains("frame_idx") && f.columns.contains("frame_payload"))
  }
}
