package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Diagnostic main for the multimodal decode tier (round-14 verdict,
  * Next #7): would a chunked-columnar (Arrow-style) decode path move
  * m03/v01, or is the wall the per-image decode CPU that no batching
  * re-plumb can remove? Columnar batching eliminates ROW-SHAPE overhead
  * (per-row Row alloc/copy, serializer churn) — it cannot make
  * javax.imageio decode one image faster. So the decision number is the
  * decomposition of the hash pass:
  *
  *   scan floor        = read payload bytes, no per-row map
  *   row-plumb floor   = the exact mapPartitions Row-copy shape of
  *                       imageDHash with the decode replaced by a
  *                       constant (payload length) — everything a
  *                       columnar path could possibly save
  *   real decode       = imageDHash as shipped
  *   full gate         = m03's hash + banded hamming join
  *
  * If (row-plumb − scan) is a small fraction of (decode − scan), the
  * chunked-columnar variant is bounded to that fraction — recorded as
  * go/no-go in SURVEY §8. Median of `reps` runs (default 3), one JSON
  * line to stdout, noop sink like Bench.
  */
object DecodeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.multimodal.Multimodal
    val d = graft.tables.Tpch.table(spark, sfDir, "documents")
    val n = graft.dedup.Dedup.approxRowCount(d)
    val media = Multimodal
      .withSharedScenes(d, "doc_id", nScenes = Multimodal.suggestedScenes(n))
      .repartition(col("media_id"))
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption)
      .filter(_ >= 1).getOrElse(3)

    def median(f: => Unit): Double = {
      val walls = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      walls(walls.size / 2)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the same Row-copy mapPartitions shape as imageDHash, decode
    // replaced by a constant of the payload bytes — the ceiling of what
    // ANY batching re-plumb could save
    def rowPlumb(df0: org.apache.spark.sql.DataFrame) = {
      val df = df0.drop("dhash")
      val outSchema = StructType(df.schema.fields :+ StructField("dhash", LongType))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
      val payloadIdx = df.schema.fieldIndex("payload")
      df.mapPartitions { rows =>
        rows.map { r =>
          val p = r.get(payloadIdx).asInstanceOf[Array[Byte]]
          Row.fromSeq(r.toSeq :+ Long.box(p.length.toLong))
        }
      }(enc)
    }

    noop(media.select(length(col("payload")).as("len")))   // warm
    val scanFloor = median(noop(media.select(length(col("payload")).as("len"))))
    val plumbFloor = median(noop(rowPlumb(media)))
    val decode = median(noop(Multimodal.imageDHash(media)))
    val gate = median(noop(
      graft.dedup.Dedup.hammingPairs64(Multimodal.imageDHash(media),
          "media_id", "dhash", maxHamming = 3,
          wide = graft.dedup.Dedup.wideHammingBands(n))
        .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))))
    val plumbShare = (plumbFloor - scanFloor) / math.max(decode - scanFloor, 1e-9)
    println(f"""{"metric":"decode_probe","sf":"$sfDir","reps":$reps,""" +
      f""""scan_floor":$scanFloor%.3f,"row_plumb":$plumbFloor%.3f,""" +
      f""""decode":$decode%.3f,"full_gate":$gate%.3f,""" +
      f""""plumb_share_of_decode":$plumbShare%.4f}""")
    spark.stop()
  }
}
