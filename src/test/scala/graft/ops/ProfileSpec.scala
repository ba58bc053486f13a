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

  test("madOutliers: modified z-score per group, MAD-zero groups flag deviants") {
    import spark.implicits._
    // group g1: median 10.5 (interpolated), MAD 1 -> 100 scores 0.6745*89.5
    // group g2: all 5s except one 6 -> MAD 0, the 6 is flagged scoreless
    // group g3: the value 100 is NORMAL here (group-scoped, not global)
    val d = (Seq((1L, "g1", 9.0), (2L, "g1", 10.0), (3L, "g1", 11.0),
      (4L, "g1", 100.0),
      (5L, "g2", 5.0), (6L, "g2", 5.0), (7L, "g2", 5.0), (8L, "g2", 6.0)) ++
      (10L to 14L).map(i => (i, "g3", 100.0 + (i % 3)))
    ).toDF("id", "g", "v")
    val got = Profile.madOutliers(d, "g", "v", threshold = 3.5)
      .collect().map(r => (r.getLong(1), Option(r.get(3)))).toMap // (g, id, v, mz)
    assert(got.keySet == Set(4L, 8L))
    assert(got(4L) == Some(60.36775) && got(8L) == None)
  }

  test("equiDepthHistogram: quartiles of 1..100 hold 25 rows each, bounds interpolated") {
    import spark.implicits._
    val d = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val got = Profile.equiDepthHistogram(d, "v", n = 4)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == ((1.0, 25.75, 25L)))   // [1, 25.75): 1..25
    assert(got(2L) == ((25.75, 50.5, 25L)))  // 26..50
    assert(got(3L) == ((50.5, 75.25, 25L)))  // 51..75
    assert(got(4L) == ((75.25, 100.0, 25L))) // last bucket closed: 76..100
  }

  test("madOutliersApprox matches the exact form where the sketch is exact") {
    import spark.implicits._
    // odd group sizes: the interpolated median IS an element, so the
    // sketch (exact under its accuracy) and the exact percentile agree
    val d = (Seq((1L, "g1", 9.0), (2L, "g1", 10.0), (3L, "g1", 11.0),
      (4L, "g1", 100.0), (5L, "g1", 12.0)) ++
      (10L to 18L).map(i => (i, "g2", 50.0 + (i % 3)))
    ).toDF("id", "g", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(1), Option(r.get(3)))).toSet
    val exact = rows(Profile.madOutliers(d, "g", "v", threshold = 3.5))
    val approx = rows(Profile.madOutliersApprox(d, "g", "v", threshold = 3.5))
    assert(exact.nonEmpty && approx == exact)
    // the flagged outlier is the right one: |100-11|*0.6745/1
    assert(exact == Set((4L, Some(60.0305))))
  }

  test("corrMatrix: hand-checked coefficients, zero-variance pair is NULL") {
    import spark.implicits._
    val d = (1 to 50).map(i => (i.toDouble, 2.0 * i + 1, 51.0 - i, 7.0))
      .toDF("x", "yp", "yn", "z")
    val got = Profile.corrMatrix(d, Seq("x", "yp", "yn", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> Option(r.get(2))).toMap
    assert(got(("x", "yp")) == Some(1.0))   // exact linear
    assert(got(("x", "yn")) == Some(-1.0))  // exact inverse
    assert(got(("x", "z")) == None)         // constant column -> undefined
    assert(got.size == 6)
    // one scan: a single Aggregate over one scan subtree
    val plan = Profile.corrMatrix(d, Seq("x", "yp")).queryExecution.optimizedPlan.toString
    assert(plan.linesIterator.count(_.contains("LocalRelation")) == 1, plan)
  }

  test("mutualInformation: independent pair is 0, deterministic pair is the entropy") {
    import spark.implicits._
    // independent: every (a, b) combination equally likely
    val ind = (for { a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 25 }
      yield (a, b)).toDF("a", "b")
    val miInd = Profile.mutualInformation(ind, "a", "b").head().getDouble(0)
    assert(miInd == 0.0)
    // deterministic: b = f(a), uniform a over 2 values -> MI = H(a) = ln 2
    val det = (for { a <- Seq("x", "y"); _ <- 1 to 50 }
      yield (a, a.toUpperCase)).toDF("a", "b")
    val miDet = Profile.mutualInformation(det, "a", "b").head().getDouble(0)
    assert(miDet == BigDecimal(math.log(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // nulls on either side drop out
    val withNulls = ind.union(Seq((null.asInstanceOf[String], "u")).toDF("a", "b"))
    assert(Profile.mutualInformation(withNulls, "a", "b").head().getDouble(0) == 0.0)
  }

  test("winsorize clamps into the exact interpolated per-group band") {
    import spark.implicits._
    val d = (1 to 100).map(i => (i.toLong, "g", i.toDouble)).toDF("id", "g", "v")
    val got = Profile.winsorize(d, "g", "v", pLo = 0.25, pHi = 0.75)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // interpolated percentiles of 1..100: p25 = 25.75, p75 = 75.25
    assert(got(1L) == 25.75 && got(26L) == 26.0)
    assert(got(100L) == 75.25 && got(75L) == 75.0)
    intercept[IllegalArgumentException] { Profile.winsorize(d, "g", "v", 0.9, 0.1) }
  }

  test("equiDepthHistogram on an all-NULL column fails with a clear error, not an NPE") {
    val d = Seq.fill(5)(Option.empty[Double]).toDF("v")
    val e = intercept[IllegalArgumentException] { Profile.equiDepthHistogram(d, "v", 4) }
    assert(e.getMessage.contains("no non-null values"))
  }

  test("percentile-based ops accept column names that need quoting") {
    // a column named with a space must splice into the percentile SQL as
    // ONE identifier — unquoted it fails to parse or resolves wrongly
    val d = (1 to 100).map(i => (i.toLong, 1, i.toDouble)).toDF("id", "g", "my val")
    val w = Profile.winsorize(d, "g", "my val", pLo = 0.25, pHi = 0.75)
      .select("id", "my val_w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(1L) == 25.75 && w(100L) == 75.25)
    val eq = Profile.equiDepthHistogram(d, "my val", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(eq == Map(1L -> 25L, 2L -> 25L, 3L -> 25L, 4L -> 25L))
    assert(Profile.madOutliers(d, "g", "my val", threshold = 1.0).count() > 0)
  }
}
