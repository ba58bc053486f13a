package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits (bit i of column j at position i*d+j)") {
    val got = Seq((3L, 1L), (0L, 0L), (7L, 7L), (4L, 2L))
      .toDF("x", "y")
      .select(Layout.zvalue(3, col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x=0b011,y=0b001 → z bits: x0→b0, y0→b1, x1→b2, y1→b3, x2→b4, y2→b5
    //   = 1 + 2 + 4 = 7;  (7,7) → 0b111111 = 63;  (4,2) → b4 + b3 = 24
    assert(got == Seq(7L, 0L, 63L, 24L))
    // SQL text form computes the identical value
    Seq((3L, 1L), (7L, 7L), (4L, 2L)).toDF("x", "y").createOrReplaceTempView("zt")
    val viaSql = spark.sql(s"SELECT ${Layout.zvalueSql(3, Seq("x", "y"))} AS z FROM zt")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == Seq(7L, 63L, 24L))
  }

  test("z-ordered layout: files cover small hyper-boxes, so a box query touches few") {
    val n = 64
    // a full 64×64 grid, deliberately written in row-major order by the
    // naive layout (x varies fastest) — the worst case for pruning on x
    val grid = spark.range(0, n.toLong * n).select(
      (col("id") % n).as("x"), floor(col("id") / n).cast("long").as("y"))
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    Layout.writeZOrdered(grid, Seq("x", "y"), bits = 6, numFiles = 16, s"$base/z")
    grid.repartitionByRange(16, col("y"), col("x")).sortWithinPartitions("y", "x")
      .write.parquet(s"$base/naive")

    // per-file [min,max] of x and y, computed from the files themselves
    def fileBoxes(dir: String) =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // box query on x alone: x in [0, 7] — 1/8 of the grid
    def touched(boxes: Seq[(Long, Long, Long, Long)]) =
      boxes.count { case (x0, _, _, _) => x0 <= 7 }

    val zBoxes = fileBoxes(s"$base/z").toSeq
    val nBoxes = fileBoxes(s"$base/naive").toSeq
    assert(zBoxes.length == 16 && nBoxes.length == 16)
    // y-major order makes every file span all x values → nothing prunes;
    // the z-order keeps x-extent small per file → most files skip
    assert(touched(nBoxes) == 16, nBoxes.toString)
    assert(touched(zBoxes.map(b => (b._1, b._2, b._3, b._4))) <= 8, zBoxes.toString)
    // and the data round-trips complete
    assert(spark.read.parquet(s"$base/z").count() == n.toLong * n)
  }

  test("zvalue guards: too many bits, null propagation") {
    intercept[IllegalArgumentException] { Layout.zvalue(32, col("x"), col("y")) }
    val z = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(Layout.zvalue(4, col("x"), col("y"))).collect()
    assert(z.head.isNullAt(0))
  }
}
