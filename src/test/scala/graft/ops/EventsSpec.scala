package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val evs = Seq(
    // user 1: clean a -> b -> c
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
    // user 2: b before a never counts; the b AFTER a does
    (2L, 5L, "b"), (2L, 10L, "a"), (2L, 40L, "b"),
    // user 3: reaches a only
    (3L, 7L, "a"), (3L, 6L, "c"),
    // user 4: a and b at the SAME instant — inclusive, b counts
    (4L, 50L, "a"), (4L, 50L, "b"),
    // user 5: no step events at all (noise type)
    (5L, 1L, "x")
  ).toDF("uid", "t", "et")

  test("funnel: earliest in-order step times, NULL from the first missed step") {
    val got = Events.funnel(evs, "uid", "t", "et", Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got == Map(
      1L -> (Some(10L), Some(20L), Some(30L)),
      2L -> (Some(10L), Some(40L), None),
      3L -> (Some(7L), None, None),
      4L -> (Some(50L), Some(50L), None)))
    // user 5 had no step event → absent entirely
    assert(!got.contains(5L))
  }

  test("funnel matches the per-step conditional-min formulation") {
    // reference: t0 = min ts of step0; t_i = min ts of step_i >= t_{i-1}
    val rows = evs.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val keys = rows.map(_._1).distinct
    val steps = Seq("a", "b", "c")
    val want = keys.flatMap { k =>
      val mine = rows.filter(_._1 == k)
      val t = steps.foldLeft(List.empty[Option[Long]]) { (acc, s) =>
        val prev = acc.lastOption.getOrElse(Some(Long.MinValue))
        val next = prev.flatMap(p =>
          mine.filter(e => e._3 == s && e._2 >= p).map(_._2).minOption)
        acc :+ next
      }
      if (mine.exists(e => steps.contains(e._3))) Some(k -> t) else None
    }.toMap
    val got = Events.funnel(evs, "uid", "t", "et", steps)
      .collect().map(r => r.getLong(0) ->
        List(Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))
          .map(_.map(_.asInstanceOf[Long]))).toMap
    assert(got == want)
  }

  test("funnelCounts: per-step reach, non-increasing") {
    val got = Events.funnelCounts(evs, "uid", "t", "et", Seq("a", "b", "c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList.sortBy(_._1)
    assert(got == List((0L, "a", 4L), (1L, "b", 3L), (2L, "c", 1L)))
  }

  test("retention: per-cohort activity matrix, offset 0 is the cohort size") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // weeks: W0 = 2024-01-01 (Mon), W1 = 01-08, W2 = 01-15
    val e = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-09 10:00:00")), // u1: W0, W1
      (2L, ts("2024-01-03 10:00:00")), (2L, ts("2024-01-16 10:00:00")), // u2: W0, W2
      (3L, ts("2024-01-10 10:00:00")),                                   // u3: W1 only
      (4L, ts("2024-01-04 10:00:00")), (4L, ts("2024-01-04 23:00:00"))   // u4: W0 twice
    ).toDF("uid", "t")
    val got = Events.retention(e, "uid", "t", "week")
      .collect().map(r => ((r.getTimestamp(0).toString, r.getLong(1)), r.getLong(2))).toMap
    val w0 = "2024-01-01 00:00:00.0"; val w1 = "2024-01-08 00:00:00.0"
    assert(got == Map(
      (w0, 0L) -> 3L,  // u1,u2,u4 arrived in W0
      (w0, 1L) -> 1L,  // u1 back in W1
      (w0, 2L) -> 1L,  // u2 back in W2
      (w1, 0L) -> 1L)) // u3's cohort
    // no join anywhere: two aggregations over the events, nothing else
    val plan = Events.retention(e, "uid", "t", "week").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("retention periods: day and month offsets count whole periods") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val e = Seq(
      (1L, ts("2024-01-31 09:00:00")), (1L, ts("2024-03-01 09:00:00"))
    ).toDF("uid", "t")
    val day = Events.retention(e, "uid", "t", "day")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(day == Set((0L, 1L), (30L, 1L))) // Jan 31 → Mar 1 = 30 days
    val month = Events.retention(e, "uid", "t", "month")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(month == Set((0L, 1L), (2L, 1L))) // Jan → Mar = 2 months
    intercept[IllegalArgumentException] {
      Events.retention(e, "uid", "t", "year")
    }
  }

  test("timeDecayedMean: hand-computed recursion, single-event and flat-decay limits") {
    import java.sql.Timestamp
    val t0 = 1700000000L * 1000000L // µs epoch
    def ts(sec: Long) = new Timestamp(t0 / 1000 + sec * 1000)
    val e = Seq(
      (1L, ts(0), 10.0), (1L, ts(3600), 20.0),  // one τ apart
      (2L, ts(0), 7.5)                           // single event
    ).toDF("k", "t", "v")
    val got = Events.timeDecayedMean(e, "k", "t", "v", tauSeconds = 3600.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val d = math.exp(-1.0)
    val want1 = BigDecimal((10.0 * d + 20.0) / (d + 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == want1 && got(2L) == 7.5)
    // τ → ∞ degenerates to the plain mean
    val flat = Events.timeDecayedMean(e, "k", "t", "v", tauSeconds = 1e15)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(flat(1L) == 15.0)
  }

  test("funnel is one shuffle — no join chain, no window") {
    val plan = Events.funnel(evs, "uid", "t", "et", Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, plan)
  }

  test("runningTotal: two-phase prefix sum equals the naive global cumsum, windows stay bucketed") {
    val df = (1 to 200).map(i => (java.sql.Date.valueOf(s"202${i % 4}-0${i % 9 + 1}-0${i % 9 + 1}"),
      i.toLong)).distinct.toDF("d", "n")
      .groupBy("d").agg(sum("n").as("n")) // unique ordCol grain
    val got = Events.runningTotal(df, "d", "n", bucket = year(col("d")), outCol = "cum")
      .select("d", "cum").collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // naive single-node replay
    val rows = df.collect().map(r => r.getDate(0).toString -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val want = rows.map { case (d, n) => acc += n; d -> acc }.toMap
    assert(got == want)
    // every window in the plan is PARTITIONED (by the bucket) — the
    // whole point vs Window.orderBy's move-everything-to-one-partition
    val plan = Events.runningTotal(df, "d", "n", bucket = year(col("d")), outCol = "cum")
      .queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("__b"), s"unpartitioned window in plan line: $l")
    }
    // ...and the bucket-offset prefix sum plans as a window, never a
    // nested-loop join (the O(B²) shape PlanAudit rejects)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("runningTotal: a null-ordered bucket sorts first and carries into later buckets") {
    val df = Seq((Option.empty[Long], 5L), (Some(1L), 7L), (Some(2L), 11L))
      .toDF("o", "n")
    val got = Events.runningTotal(df, "o", "n", bucket = col("o"), outCol = "cum")
      .collect().map(r => Option(r.get(0)).map(_.toString).orNull -> r.getLong(2)).toMap
    // nulls-first running total: 5, 5+7, 5+7+11 — the null bucket's
    // total participates downstream (the inequality-join formulation
    // silently dropped it)
    assert(got == Map((null: String) -> 5L, "1" -> 12L, "2" -> 23L), got.toString)
  }

  test("rollingAnomalies: spike flagged with exact z, short history unscored, zero-variance break") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000)
    // user 1: stable 10.0 +/- 1.0 alternating, then a spike at t=20
    val stable = (1L to 19L).map(i =>
      (1L, ts(i), i, if (i % 2 == 0) 11.0 else 9.0))
    val spike = Seq((1L, ts(20), 20L, 25.0))
    // user 2: CONSTANT series then a level break -> zero prior std, NULL z
    val const = (1L to 9L).map(i => (2L, ts(i), 100 + i, 5.0)) :+
      (2L, ts(10), 110L, 6.0)
    // user 3: only 3 events — never enough history to score
    val short3 = (1L to 3L).map(i => (3L, ts(i), 200 + i, 999.0 * i))
    val df = (stable ++ spike ++ const ++ short3)
      .toDF("user_id", "ts", "event_id", "value")
    val got = Events.rollingAnomalies(df, "user_id", "ts", "event_id", "value",
      lookback = 20, zThreshold = 3.0, minPrior = 5)
      .collect().map(r => r.getLong(2) -> r).toMap
    // the spike: prior = 19 alternating values (10 nines, 9 elevens)
    // mean = (10*9 + 9*11)/19, std = stddev_samp; z = (25 - mean)/std
    val prior = (1 to 19).map(i => if (i % 2 == 0) 11.0 else 9.0)
    val m = prior.sum / prior.size
    val sd = math.sqrt(prior.map(x => (x - m) * (x - m)).sum / (prior.size - 1))
    assert(got.contains(20L), got.keySet.toString)
    val s = got(20L)
    assert(math.abs(s.getAs[Double]("prior_mean") - math.rint(m * 1e6) / 1e6) < 1e-9)
    assert(s.getAs[Long]("prior_n") == 19L)
    assert(math.abs(s.getAs[Double]("z") - ((25.0 - m) / sd)) < 1e-5)
    // the level break on a constant series: emitted with NULL z
    assert(got.contains(110L))
    assert(got(110L).getAs[Double]("prior_std") == 0.0 && got(110L).isNullAt(7))
    // in-band rows and short histories are absent
    assert(got.keySet == Set(20L, 110L), got.keySet.toString)
    // determinism across partitionings
    val again = Events.rollingAnomalies(df.repartition(7), "user_id", "ts",
      "event_id", "value", 20, 3.0, 5)
      .collect().map(_.getLong(2)).toSet
    assert(again == Set(20L, 110L))
  }
}
