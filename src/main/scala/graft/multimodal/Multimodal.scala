package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus a typed metadata struct, processed in partition-sized
  * batches.
  *
  * The container has no image/audio codecs, so `decode` is a
  * deterministic FAKE (clearly marked) — but everything Spark-side is
  * real and tested: the schema (BinaryType payload + metadata struct),
  * the batch shape (mapPartitions over iterator, one decoder init per
  * partition — the same contract as mapInPandas/mapInArrow batches), and
  * the partitioning (media ops repartition by id so decode parallelism
  * is independent of upstream file layout).
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
    * reading real media bytes from object storage.
    */
  def withFakeMedia(df: DataFrame, idCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      // payload: id-seeded bytes via repeated sha2 — deterministic, binary
      sha2(concat(lit("payload:"), col(idCol).cast("string")), 256).cast("binary").as("payload"))
      .withColumn("meta", struct(lit("synthetic").as("source"),
        length(col("payload")).cast("long").as("n_bytes")))

  /** FAKE image decode: derives (width, height, format) deterministically
    * from the payload bytes. Real implementation would replace
    * `fakeDecode` with an actual codec call; the batching contract —
    * iterator-in/iterator-out per partition, decoder state initialized
    * once per partition — is exactly what a JNI/codec integration needs.
    */
  def decodeImageMeta(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("format", StringType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition decoder init happens HERE (once, not per row)
      val decoder = new FakeImageDecoder
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, f) = decoder.decode(payload)
        Row.fromSeq(r.toSeq ++ Seq(w, h, f))
      }
    }(encoder)
  }

  /** FAKE resize: keeps the binary contract; a real impl transforms bytes. */
  def resize(df: DataFrame, maxDim: Int): DataFrame =
    df.withColumn("width", least(col("width"), lit(maxDim)))
      .withColumn("height", least(col("height"), lit(maxDim)))

  /** FAKE frame sampling for video payloads: emits `n` frame rows per
    * media row (explode — the real shape of frame extraction output).
    */
  def sampleFrames(df: DataFrame, n: Int): DataFrame =
    df.select(col("media_id"), col("kind"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => sha2(concat(col("media_id").cast("string"), lit("#"), i.cast("string")), 256)
            .cast("binary"))).as(Seq("frame_idx", "frame_payload")))
}

/** Deterministic stand-in for a native image decoder (no codecs in this
  * container). Stateful to mirror the cost profile of real decoder init.
  */
final class FakeImageDecoder extends Serializable {
  def decode(payload: Array[Byte]): (Int, Int, String) = {
    val b0 = java.lang.Byte.toUnsignedInt(payload(0))
    val b1 = java.lang.Byte.toUnsignedInt(payload(1 % payload.length))
    val w = 64 + (b0 % 16) * 64
    val h = 64 + (b1 % 16) * 64
    val fmt = if (b0 % 2 == 0) "png" else "jpeg"
    (w, h, fmt)
  }
}
