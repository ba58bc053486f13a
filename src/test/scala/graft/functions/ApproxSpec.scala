package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 100 TB distribution-measure paths: approx_percentile (mergeable
  * sketch) must track the exact percentile, and approx_count_distinct
  * (HLL++) the exact distinct count, within their accuracy bounds —
  * these are the operators q33/q26 swap to when exact becomes a
  * single-point memory bottleneck.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private lazy val values = (1 to 20000)
    .map(i => (if (i % 2 == 0) "a" else "b", (i % 1000).toDouble)).toDF("k", "v")

  test("approx_percentile tracks exact percentile within the accuracy bound") {
    val rows = values.groupBy("k").agg(
      expr("percentile(v, 0.5)").as("exact50"),
      expr("approx_percentile(v, 0.5, 10000)").as("approx50"),
      expr("percentile(v, 0.95)").as("exact95"),
      expr("approx_percentile(v, 0.95, 10000)").as("approx95")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(1)) <= 1.0, r.toString)
      assert(math.abs(r.getDouble(4) - r.getDouble(3)) <= 1.0, r.toString)
    }
  }

  test("approx_count_distinct tracks exact within rsd") {
    val r = values.agg(
      countDistinct(col("v")).as("exact"),
      approx_count_distinct(col("v"), 0.02).as("approx")).collect()(0)
    val exact = r.getLong(0).toDouble
    assert(math.abs(r.getLong(1) - exact) / exact < 0.05)
  }
}
