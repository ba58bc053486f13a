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

  test("decode is deterministic and batch-shaped") {
    val m = Multimodal.withFakeMedia(base, "doc_id", "image").repartition(2)
    val d1 = Multimodal.decodeImageMeta(m).collect()
      .map(r => r.getAs[Long]("media_id") -> (r.getAs[Int]("width"), r.getAs[String]("format"))).toMap
    val d2 = Multimodal.decodeImageMeta(m).collect()
      .map(r => r.getAs[Long]("media_id") -> (r.getAs[Int]("width"), r.getAs[String]("format"))).toMap
    assert(d1 == d2)
    assert(d1.values.forall { case (w, f) => w >= 64 && (f == "png" || f == "jpeg") })
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
