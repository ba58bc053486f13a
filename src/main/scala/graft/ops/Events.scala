package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a (key, ts, type) stream — the funnel
  * family. The reference has no event operators (bacon aggregates flat
  * records); this extends the analytics surface the same way asOfJoin /
  * rangeJoin do (SURVEY §2.65).
  */
object Events {

  /** Ordered-step funnel: for every key, the earliest time each step was
    * reached IN ORDER — `t(i+1)` = min ts of a `steps(i+1)` event at or
    * after `t(i)` (inclusive: a later step at the exact same timestamp
    * counts; one event never satisfies two steps — each step's match is
    * evaluated against the PREVIOUS event's state). Keys that never
    * reach step i have NULL from column i on (and every key with at
    * least one step event appears).
    *
    * Output: (keyCol, t0 .. t{n-1}) with the original ts type.
    *
    * Scale shape: filter to step events (pushed to the scan), ONE
    * shuffle on the key, per-key sort + linear fold (aggregate HOF) —
    * never a per-step self-join chain (k joins = k shuffles) and never
    * a window. Per-key memory is that key's step-event count — the same
    * envelope as sessionization; pre-filter pathological keys upstream
    * if a single key's events exceed executor memory.
    */
  def funnel(df: DataFrame, keyCol: String, tsCol: String, stepCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "repeated step names are ambiguous — a funnel step must be a distinct event type")
    val tsType = df.schema(tsCol).dataType
    // step name → index BEFORE the sort: ties at the exact same ts must
    // process earlier steps first, so that a later step at the same
    // instant sees the earlier one already reached (inclusive >=, the
    // same answer the per-step conditional-min formulation gives)
    val stepIdx = steps.zipWithIndex.tail.foldLeft(
      when(col(stepCol) === steps.head, lit(0))) { case (acc, (name, i)) =>
      acc.when(col(stepCol) === name, lit(i))
    }
    val sorted = df.where(col(stepCol).isin(steps: _*))
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"), stepIdx.as("__si"))
      .groupBy("__k")
      .agg(array_sort(collect_list(struct(col("__ts"), col("__si")))).as("__evs"))
    val init = struct(steps.indices.map(i => lit(null).cast(tsType).as(s"t$i")): _*)
    def stepUpdate(state: Column, e: Column): Column = struct(
      steps.indices.map { i =>
        val prevReached =
          if (i == 0) lit(true) else state.getField(s"t${i - 1}").isNotNull &&
            e.getField("__ts") >= state.getField(s"t${i - 1}")
        val cur = state.getField(s"t$i")
        // events arrive in ts order, so the first qualifying match IS the min
        when(cur.isNull && e.getField("__si") === i && prevReached,
          e.getField("__ts")).otherwise(cur).as(s"t$i")
      }: _*)
    sorted
      .withColumn("__f", aggregate(col("__evs"), init, stepUpdate))
      .select(col("__k").as(keyCol) +:
        steps.indices.map(i => col(s"__f.t$i").as(s"t$i")): _*)
  }

  /** Time-decayed (EWMA) mean of `valCol` per key over an irregular
    * event series: each observation's weight decays as
    * exp(-Δt / tauSeconds) from the key's LAST event, i.e. the
    * recursive num/den form
    *   num ← num·exp(-Δt/τ) + v,  den ← den·exp(-Δt/τ) + 1
    * folded in timestamp order (ties sub-ordered by value so the fold
    * order — and therefore the floating-point result — is
    * deterministic). A key with one event returns that value.
    *
    * Why a fold and not window algebra: the closed form
    * exp(-λt_i)·Σ v_j·exp(λt_j) overflows double for any realistic
    * time range, so the sequential recursion is the only numerically
    * stable shape. One shuffle on the key, per-key sort + linear fold —
    * the same envelope as `funnel`; the recursion is engine-portable
    * (the gate replays it with DuckDB's list_reduce).
    */
  def timeDecayedMean(df: DataFrame, keyCol: String, tsCol: String,
                      valCol: String, tauSeconds: Double): DataFrame = {
    require(tauSeconds > 0, s"tauSeconds must be positive, got $tauSeconds")
    val tauMicros = tauSeconds * 1e6
    val sorted = df
      .select(col(keyCol).as("__k"), unix_micros(col(tsCol)).as("__t"),
        col(valCol).cast("double").as("__v"))
      .where(col("__t").isNotNull && col("__v").isNotNull)
      .groupBy("__k")
      .agg(array_sort(collect_list(struct(col("__t"), col("__v")))).as("__evs"))
    val init = struct(lit(null).cast("long").as("t"),
      lit(0.0).as("n"), lit(0.0).as("d"))
    def step(a: Column, e: Column): Column = {
      val decay = when(a.getField("t").isNull, lit(1.0))
        .otherwise(exp((a.getField("t") - e.getField("__t")).cast("double") / tauMicros))
      struct(e.getField("__t").as("t"),
        (a.getField("n") * decay + e.getField("__v")).as("n"),
        (a.getField("d") * decay + lit(1.0)).as("d"))
    }
    sorted
      .withColumn("__f", aggregate(col("__evs"), init, step))
      .select(col("__k").as(keyCol),
        round(col("__f.n") / col("__f.d"), 6).as("ewma"))
  }

  /** Cohort retention: keys grouped by their first-activity period (the
    * cohort), counted per (cohort, period-offset) — "of the users who
    * arrived in week W, how many were active in week W+k". `period` is
    * "day", "week" or "month" (date_trunc semantics, weeks start
    * Monday). Offsets are whole periods; `n_active` at offset 0 is the
    * cohort size.
    *
    * Scale shape: TWO aggregations, no join — per-key agg collects the
    * key's distinct active periods (bounded by the calendar: ≤ a few
    * hundred even for years of dailies) alongside its min, the explode
    * re-aggregates to the (cohort, offset) matrix, whose size is
    * O(periods²) — tiny. A join-back formulation would shuffle the raw
    * events twice.
    */
  def retention(df: DataFrame, keyCol: String, tsCol: String,
                period: String = "week"): DataFrame = {
    val offset: (Column, Column) => Column = period match {
      case "day"   => (p, c) => datediff(p, c).cast("long")
      case "week"  => (p, c) => (datediff(p, c) / 7).cast("long")
      case "month" => (p, c) => months_between(p, c).cast("long")
      case other => throw new IllegalArgumentException(
        s"period must be day/week/month, got '$other'")
    }
    val perKey = df
      .select(col(keyCol).as("__k"), date_trunc(period, col(tsCol)).as("__p"))
      .where(col("__p").isNotNull)
      .groupBy("__k")
      .agg(min(col("__p")).as("cohort"), collect_set(col("__p")).as("__ps"))
    perKey
      .select(col("cohort"), explode(col("__ps")).as("__p"))
      .groupBy(col("cohort"), offset(col("__p"), col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active")) // (key, period) pairs are distinct by construction
  }

  /** Running (cumulative) total of `valCol` in `ordCol` order, computed
    * WITHOUT a global unpartitioned window — the classic two-phase prefix
    * sum. `bucket` must be a deterministic, monotone non-decreasing
    * function of `ordCol` (year of a month column, day of a timestamp):
    * phase 1 computes the cumsum WITHIN each bucket under a
    * `partitionBy(bucket)` window (parallel, no single-partition sort);
    * phase 2 derives per-bucket totals from the local cumsum's max and
    * joins each row its preceding buckets' sum via a broadcast
    * triangular join over the (tiny, one-row-per-bucket) totals frame.
    *
    * Scale shape: one hash shuffle on the bucket + an O(B²) join where B
    * = bucket count (calendar-bounded, data-size-independent) — vs the
    * naive `Window.orderBy(ord)` which moves EVERY row to one partition
    * and single-threads the sort. Rows are assumed unique in `ordCol`
    * (an ordered aggregate grain); ties make the intermediate cumsum
    * order-dependent. Nulls in `ordCol` sort first within their bucket.
    */
  def runningTotal(df: DataFrame, ordCol: String, valCol: String,
                   bucket: Column, outCol: String = "running_total"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__b").orderBy(col(ordCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val local = df.withColumn("__b", bucket)
      .withColumn("__cum", sum(col(valCol)).over(w))
    // per-bucket total = max of its local cumsum — re-aggregates the
    // (already windowed) branch, so the expensive shuffle subtree is
    // shared/reused, never a second base scan with fresh partitioning
    val totals = local.groupBy(col("__b")).agg(max(col("__cum")).as("__t"))
    // Prefix-sum the per-bucket totals over the bucket-grain spine
    // (BoundedSpine contract: bounded by the time grain, never the
    // data; the previous inequality self-join planned O(B²)). NULL
    // buckets sort first and their totals carry into later buckets,
    // which is what a running total over "nulls first" ordering means.
    val wt = BoundedSpine.prefixSum(col("__b"))
    val offsets = totals.withColumn("__off", sum(col("__t")).over(wt)).drop("__t")
      .withColumnRenamed("__b", "__ob")
    // Null-safe equality (<=>): a plain equi-join on Seq("__b") silently
    // drops the NULL bucket (NULL never equals NULL), losing rows the
    // contract promises to keep. <=> is still a hash-joinable key, so
    // this stays a BroadcastHashJoin.
    local.join(broadcast(offsets), col("__b") <=> col("__ob"))
      .drop("__ob")
      .withColumn(outCol,
        when(col("__off").isNull, col("__cum")).otherwise(col("__cum") + col("__off")))
      .drop("__b", "__cum", "__off")
  }

  /** Funnel conversion counts: how many keys reached each step. One row
    * per step index, monotonically non-increasing `n_keys`.
    */
  def funnelCounts(df: DataFrame, keyCol: String, tsCol: String, stepCol: String,
                   steps: Seq[String]): DataFrame = {
    val f = funnel(df, keyCol, tsCol, stepCol, steps)
    val counts = f.agg(
      count(lit(1)).as("n_total"),
      steps.indices.map(i => count(col(s"t$i")).as(s"n$i")): _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (name, i) =>
      struct(lit(i).cast("long").as("step"), lit(name).as("step_name"),
        col(s"n$i").as("n_keys"))
    }: _*)).as("s")).select(col("s.step"), col("s.step_name"), col("s.n_keys"))
  }

  /** Rolling z-score anomalies per key: each event's value is scored
    * against the mean/stddev of its own key's `lookback` PRECEDING
    * events (rows-between frame, never the current row — a point must
    * not vouch for itself), and events with |z| ≥ `zThreshold` are
    * returned with their evidence (prior mean/std/n). Events with fewer
    * than `minPrior` predecessors are unscored (a 2-point history is
    * not a baseline); a zero prior stddev with a deviating value is the
    * textbook change-point and is emitted with a NULL z rather than an
    * infinity.
    *
    * Determinism: the frame orders by (ts, id) — the id tiebreaker
    * makes the window contents, and therefore every score, a pure
    * function of the data on any engine and any partitioning.
    *
    * Scale shape: ONE shuffle on the key + an in-partition sort
    * (WindowExec); the frame is rows-bounded so state per key is O(
    * lookback). Use a high-cardinality key (user, session, device) —
    * a handful of giant keys would serialize into few partitions, the
    * usual window-skew caveat, in which case pre-bucket by (key, day)
    * to bound the sort runs.
    */
  def rollingAnomalies(df: DataFrame, keyCol: String, tsCol: String,
                       idCol: String, valCol: String,
                       lookback: Int = 20, zThreshold: Double = 3.0,
                       minPrior: Int = 5): DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2, got $lookback")
    require(minPrior >= 2 && minPrior <= lookback,
      s"minPrior must be in [2, lookback], got $minPrior")
    require(zThreshold > 0, s"zThreshold must be positive, got $zThreshold")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-lookback, -1)
    val v = col(valCol).cast("double")
    val scored = df
      .withColumn("__mean", avg(v).over(w))
      .withColumn("__std", stddev_samp(v).over(w))
      .withColumn("__n", count(v).over(w))
      .where(col("__n") >= minPrior)
    val z = (v - col("__mean")) / col("__std")
    scored
      .withColumn("__z", when(col("__std") > 0, z))
      .where((col("__z").isNull && v =!= col("__mean")) ||
        (abs(col("__z")) >= zThreshold))
      .select(col(keyCol), col(tsCol), col(idCol), v.as("value"),
        round(col("__mean"), 6).as("prior_mean"),
        round(col("__std"), 6).as("prior_std"),
        col("__n").as("prior_n"),
        round(col("__z"), 6).as("z"))
  }
}
