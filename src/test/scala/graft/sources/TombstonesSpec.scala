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
}
