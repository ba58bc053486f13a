package graft.ops

import graft.SparkSpec
import graft.cube.Agg
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation") {
    val df = Seq.tabulate(1000)(i => (if (i % 10 == 0) "cold" else "hot", i.toDouble))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedAgg(df, Seq("k"), salts = 8,
        Seq(("s", col("v"), Agg.Sum), ("n", lit(1), Agg.Count)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("salted min/max merge correctly") {
    val df = Seq(("a", 5.0), ("a", 1.0), ("a", 9.0), ("b", 2.0)).toDF("k", "v")
    val out = Skew.saltedAgg(df, Seq("k"), salts = 4,
        Seq(("mn", col("v"), Agg.Min), ("mx", col("v"), Agg.Max)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("a") == (1.0, 9.0) && out("b") == (2.0, 2.0))
  }
}
