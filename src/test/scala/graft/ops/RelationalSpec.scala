package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  // fact ~ lineitem, dim1 bounded (nation-like), dim2 unbounded (orders-like)
  private lazy val fact = (1 to 200).map(i => (i.toLong, i % 10, i % 3, i * 1.0))
    .toDF("fk", "ok", "nk", "v")
  private lazy val bigDim = (0 until 10).map(i => (i, s"order$i")).toDF("o_ok", "o_name")
  private lazy val smallDim = (0 until 3).map(i => (i, s"nation$i")).toDF("n_nk", "n_name")

  test("starJoin result is the plain multi-join result") {
    val got = Relational.starJoin(fact, Seq(
      bigDim -> (col("ok") === col("o_ok")),
      smallDim -> (col("nk") === col("n_nk"))))
    val want = fact.join(bigDim, col("ok") === col("o_ok"))
      .join(smallDim, col("nk") === col("n_nk"))
    assert(got.count() == want.count() && got.count() == 200)
  }

  test("starJoin broadcasts only dims under the size threshold") {
    // Disable the planner's own auto-broadcast so the assertion isolates
    // starJoin's hint decision (at test sizes everything auto-broadcasts).
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // threshold 1 byte: nothing qualifies -> no broadcast hint anywhere;
      // the physical plan must fall back to a shuffle join for both dims.
      val none = Relational.starJoin(fact, Seq(
        bigDim -> (col("ok") === col("o_ok")),
        smallDim -> (col("nk") === col("n_nk"))), broadcastThreshold = 1L)
      val nonePlan = none.queryExecution.sparkPlan.toString
      assert(!nonePlan.contains("BroadcastHashJoin"), nonePlan)
      assert(nonePlan.contains("SortMergeJoin") || nonePlan.contains("ShuffledHashJoin"), nonePlan)

      // generous threshold: both dims are hinted broadcast-side.
      val all = Relational.starJoin(fact, Seq(
        bigDim -> (col("ok") === col("o_ok")),
        smallDim -> (col("nk") === col("n_nk"))), broadcastThreshold = 1L << 30)
      val allPlan = all.queryExecution.sparkPlan.toString
      assert(!allPlan.contains("SortMergeJoin") && !allPlan.contains("ShuffledHashJoin"), allPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
