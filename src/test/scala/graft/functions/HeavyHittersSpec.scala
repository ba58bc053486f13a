package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._
  import HeavyHitters.heavyHitters

  test("exact top-k when capacity exceeds distinct count") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d"))
      .toDF("w").repartition(4) // force partial buffers + merge
    val out = df.agg(heavyHitters($"w", 3, capacity = 100).as("hh"))
      .selectExpr("inline(hh)").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 5L), ("b", 3L), ("c", 3L))) // ties break by value
  }

  test("bounded capacity still surfaces the dominant value") {
    val df = (Seq.fill(500)("hot") ++ (1 to 200).map(i => s"cold$i"))
      .toDF("w").repartition(8)
    val out = df.agg(heavyHitters($"w", 1, capacity = 16).as("hh"))
      .selectExpr("inline(hh)").collect()
    assert(out.head.getString(0) == "hot")
    assert(out.head.getLong(1) >= 500) // space-saving overestimates, never under
  }

  test("works per group") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z")).toDF("g", "w")
    val out = df.groupBy("g").agg(heavyHitters($"w", 1).as("hh"))
      .selectExpr("g", "inline(hh)").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("g1" -> "x", "g2" -> "z"))
  }
}
