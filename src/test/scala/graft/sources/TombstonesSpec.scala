package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TombstonesSpec extends SparkSpec {
  import spark.implicits._

  test("id type is preserved: string-id takedowns match (no silent long-cast no-op)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tomb1").toString
    val store = Seq(("doc-a", 1), ("doc-b", 2), ("doc-c", 3)).toDF("id", "v")
    Tombstones.add(spark, dir, Seq("doc-b").toDF("id"), "id")
    val live = Tombstones.filterOut(spark, dir, store, "id")
      .select("id").as[String].collect().toSet
    assert(live == Set("doc-a", "doc-c"))
    Tombstones.requireNoneTombstoned(spark, dir, store.where(col("id") === "doc-a"), "id")
    intercept[IllegalArgumentException] {
      Tombstones.requireNoneTombstoned(spark, dir, store, "id")
    }
  }

  test("reviving the last id deletes the table: the no-tombstones fast path returns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tomb2").toString
    val store = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    Tombstones.add(spark, dir, Seq(1L).toDF("id"), "id")
    assert(new java.io.File(s"$dir/tombstones").exists())
    Tombstones.remove(spark, dir, Seq(1L).toDF("id"), "id")
    // table gone, not an empty parquet dir…
    assert(!new java.io.File(s"$dir/tombstones").exists())
    // …so filterOut passes the frame through with its EXACT plan
    val out = Tombstones.filterOut(spark, dir, store, "id")
    assert(out eq store)
    // partial revive keeps the table with the survivors
    Tombstones.add(spark, dir, Seq(1L, 2L).toDF("id"), "id")
    Tombstones.remove(spark, dir, Seq(1L).toDF("id"), "id")
    assert(Tombstones.read(spark, dir).as[Long].collect().toSeq == Seq(2L))
  }

  test("a full index overwrite clears stale tombstones from the old generation") {
    // Rebuilding an index into a previously-used dir must not mask
    // freshly-written rows whose ids were tombstoned in the OLD
    // generation (nor make addTo refuse them).
    val dir = java.nio.file.Files.createTempDirectory("graft-tomb3").toString
    val vecs = (0L until 20L).map(i =>
      (i, Array.tabulate(4)(j => (i * 4 + j).toFloat % 7))).toDF("id", "vec")
    graft.sim.IvfIndex.build(vecs, "id", "vec", numCentroids = 2, iters = 1).write(dir)
    Tombstones.add(spark, dir, Seq(3L).toDF("id"), "id")
    assert(new java.io.File(s"$dir/tombstones").exists())
    // second generation into the SAME dir: tombstones must not survive
    graft.sim.IvfIndex.build(vecs, "id", "vec", numCentroids = 2, iters = 1).write(dir)
    assert(!new java.io.File(s"$dir/tombstones").exists())
    val loaded = graft.sim.IvfIndex.load(spark, dir)
    val got = loaded.search(
      Seq((100L, Array.tabulate(4)(j => (3 * 4 + j).toFloat % 7))).toDF("qid", "qv"),
      "qid", "qv", k = 1, nProbe = 2)
    assert(got.select("id2").as[Long].collect().toSet == Set(3L))
  }
}
