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

  test("asOfJoin: latest right row at-or-before each left row, per key") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 10L, "d"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (2L, 30L, 3.0))
      .toDF("k", "rt", "v")
    val got = Relational.asOfJoin(l, r, Seq("k"), "t", "rt", Seq("v"))
      .collect().map(x => (x.getString(2), Option(x.get(3)), Option(x.get(4)))).toSet
    assert(got == Set(
      ("a", Some(10L), Some(1.0)),  // equal ts matches (inclusive)
      ("b", Some(15L), Some(2.0)),  // latest of the two predecessors
      ("c", None, None),            // nothing at-or-before → NULL payload
      ("d", None, None)))           // other key's rows invisible
    // one shuffle on the key, no join node at all — union + window
    val plan = Relational.asOfJoin(l, r, Seq("k"), "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, plan)
  }

  test("asOfJoin tolerance nulls matches older than the window") {
    import spark.implicits._
    val l = Seq((1L, 100L, "x"), (1L, 200L, "y")).toDF("k", "t", "tag")
    val r = Seq((1L, 95L, 1.0)).toDF("k", "rt", "v")
    val got = Relational.asOfJoin(l, r, Seq("k"), "t", "rt", Seq("v"),
        tolerance = Some(lit(10L)))
      .collect().map(x => (x.getString(2), Option(x.get(4)))).toSet
    // 95 is within 10 of 100, not of 200
    assert(got == Set(("x", Some(1.0)), ("y", None)))
  }
}
