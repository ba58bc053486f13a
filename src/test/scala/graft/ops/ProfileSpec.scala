package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    Some(-5.0), Some(0.0), Some(3.0), Some(9.99), Some(10.0),
    Some(25.0), None, Some(100.0),
  ).toDF("x")

  test("histogram: width_bucket semantics, empty buckets present, NULLs dropped") {
    // [0, 30) in 3 buckets of width 10; -5 underflows, 100 overflows
    val h = Profile.histogram(df, "x", lo = 0.0, hi = 30.0, n = 3)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getLong(3))).toMap
    assert(h.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(h(0L) == ((None, None, 1L)))                       // -5 underflow
    assert(h(1L) == ((Some(0.0), Some(10.0), 3L)))            // 0, 3, 9.99
    assert(h(2L) == ((Some(10.0), Some(20.0), 1L)))           // 10 (left-closed)
    assert(h(3L) == ((Some(20.0), Some(30.0), 1L)))           // 25
    assert(h(4L) == ((None, None, 1L)))                       // 100 overflow
    // NULL contributed nowhere: counted buckets sum to the non-null rows
    assert(h.values.map(_._3).sum == 7L)
  }

  test("histogram: zero-count interior buckets are rows, not absences") {
    val h = Profile.histogram(df.where(col("x") === 25.0), "x", 0.0, 30.0, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(h == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("summary: one row per column with conventional moments") {
    val d = Seq((1.0, Some(2L)), (3.0, None), (5.0, Some(2L)))
      .toDF("a", "b")
    val rows = Profile.summary(d, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(rows("a") == Seq(3L, 0L, 3L, 1.0, 5.0, 3.0, 2.0))
    assert(rows("b") == Seq(3L, 1L, 1L, 2.0, 2.0, 2.0, 0.0))
    // single aggregation: the plan contains exactly one scan of the data
    val plan = Profile.summary(d, Seq("a", "b")).queryExecution.optimizedPlan.toString
    assert(plan.linesIterator.count(_.contains("LocalRelation")) == 1, plan)
  }
}
