package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling operators — the quick-look statistics a pipeline runs
  * over a new 100 TB drop before anything else touches it. The reference
  * has no profiling surface (its cubes ARE the profiling tool); these are
  * the two shapes its users build by hand with cube queries, packaged as
  * single-pass operators.
  *
  * Scale shape: both are one scan + one tiny aggregation. `histogram`
  * groups on a computed bucket id (map-side partial aggregation, ≤ n+2
  * groups); `summary` folds every column's statistics into ONE aggregate
  * row and unpivots it driver-side-free (the unpivot is over the
  * single-row result, not the data).
  */
object Profile {

  /** Backtick-quote an identifier for splicing into `expr(...)` SQL text
    * (the percentile calls below): a column named with spaces, dots or
    * hyphens must parse as one identifier, not as an expression.
    */
  private def quoteIdent(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** Fixed-width histogram with width_bucket semantics: bucket 0 is
    * underflow (x < lo), buckets 1..n cover [lo, hi) evenly, bucket n+1
    * is overflow (x ≥ hi); NULLs are dropped. Every bucket appears in
    * the output, zero-count included (the spine is a broadcast-sized
    * range join) — a plot with silently missing empty buckets misleads.
    * lo_edge/hi_edge are the interior bucket bounds, NULL for the two
    * open-ended buckets.
    */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double, n: Int): DataFrame = {
    require(n > 0, s"need at least one bucket, got $n")
    require(hi > lo, s"empty range [$lo, $hi)")
    val w = (hi - lo) / n
    val x = col(c).cast("double")
    val bucket = when(x < lo, lit(0L)).when(x >= hi, lit(n + 1L))
      .otherwise((floor((x - lo) / w) + 1).cast("long"))
    val counts = df.where(x.isNotNull)
      .select(bucket.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_rows"))
    val spine = df.sparkSession.range(0, n + 2).select(col("id").as("bucket"))
    val interior = col("bucket") >= 1 && col("bucket") <= n
    spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        when(interior, round(lit(lo) + (col("bucket") - 1) * w, 6)).as("lo_edge"),
        when(interior, round(lit(lo) + col("bucket") * w, 6)).as("hi_edge"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"))
  }

  /** Per-column numeric summary: total rows, nulls, distincts, min/max,
    * mean and sample stddev (of the non-null values — standard avg, NOT
    * bacon's divide-by-total Average; profiling wants the conventional
    * moments). One aggregation pass over the data regardless of how many
    * columns are profiled; the per-column unpivot runs over that single
    * aggregate row.
    */
  /** Robust per-group outliers: flags rows whose modified z-score
    * 0.6745·|x − median| / MAD exceeds `threshold` (3.5 is the standard
    * Iglewicz–Hoaglin cut). Median/MAD instead of mean/stddev because
    * outliers corrupt the very statistics that are supposed to find
    * them; the 0.6745 factor calibrates MAD to σ under normality.
    *
    * Exact interpolated percentiles (the d22 convention — Spark
    * `percentile` ≡ DuckDB `quantile_cont`), 6dp-rounded score. Groups
    * where MAD = 0 (over half the values identical) flag any x ≠ median.
    *
    * Scale shape: two grouped aggregations over the column (median,
    * then MAD of the residuals) + a broadcast-joinable per-group stats
    * table (one row per group) merged back — the data shuffles on the
    * group key twice and never sorts globally. Spark's exact
    * `percentile` buffers a value→count map per group: bounded when the
    * column's distinct values are (prices, rounded scores), unbounded
    * for raw continuous data at corpus-scale groups — there, round the
    * column first (the d22 trick: 6dp keeps ≤10⁶ distinct values per
    * unit range) or swap in `approx_percentile` (the q36 path) and
    * accept its rank error.
    */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
                  threshold: Double = 3.5): DataFrame = {
    val x = col(valCol).cast("double")
    val v = quoteIdent(valCol)
    val med = df.where(x.isNotNull)
      .groupBy(col(groupCol)).agg(expr(s"percentile($v, 0.5)").as("__med"))
    val withMed = df.join(med, Seq(groupCol))
    val mad = withMed
      .groupBy(col(groupCol))
      .agg(expr(s"percentile(abs(CAST($v AS DOUBLE) - __med), 0.5)").as("__mad"))
    val score = when(col("__mad") > 0,
      round(lit(0.6745) * abs(x - col("__med")) / col("__mad"), 6))
    withMed.join(mad, Seq(groupCol))
      .withColumn("mz", score)
      .where((col("__mad") > 0 && col("mz") > threshold) ||
        (col("__mad") === 0 && x =!= col("__med")))
      .drop("__med", "__mad")
  }

  /** Equi-depth histogram: `n` buckets holding ≈ equal row counts,
    * bounded by the exact interpolated i/n percentiles. Bucket i covers
    * [q_{i-1}, q_i) with the last bucket closed — assignment is
    * 1 + #{interior boundaries ≤ x}, an engine-portable counting rule.
    * Buckets can collapse empty only when boundaries duplicate (heavy
    * value duplication); empty buckets are not emitted.
    *
    * Two passes: one percentile aggregation for the n+1 boundaries (a
    * tiny array to the driver), then one grouped count with the
    * boundaries inlined as literals — the data never sorts globally.
    * The boundary pass carries the exact-percentile memory contract
    * (see `madOutliers`): round or pre-bucket continuous columns, or
    * use `approx_percentile` boundaries when n is large and exactness
    * is not the point.
    */
  def equiDepthHistogram(df: DataFrame, c: String, n: Int): DataFrame = {
    require(n >= 1, s"need at least one bucket, got $n")
    val probs = (0 to n).map(i => i.toDouble / n)
    val row = df.agg(
      expr(s"percentile(${quoteIdent(c)}, array(${probs.mkString(", ")}))")).head()
    // percentile over zero non-null values returns NULL — surface that as
    // a usable error instead of an opaque NPE from getSeq
    if (row.isNullAt(0)) throw new IllegalArgumentException(
      s"equiDepthHistogram: column '$c' has no non-null values — cannot place bucket boundaries")
    val bounds = row.getSeq[Double](0)
    val interior = bounds.slice(1, n)
    val bucket = interior.foldLeft(lit(1)) { (acc, b) =>
      acc + when(col(c).cast("double") >= b, 1).otherwise(0)
    }
    val qarr = typedLit(bounds)
    df.where(col(c).isNotNull)
      .groupBy(bucket.cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("bucket"),
        round(element_at(qarr, col("bucket").cast("int")), 6).as("lo"),
        round(element_at(qarr, col("bucket").cast("int") + 1), 6).as("hi"),
        col("n_rows"))
  }

  /** The corpus-scale sibling of `madOutliers`: identical score and
    * flagging rule, but median/MAD come from `approx_percentile`
    * (KLL-style sketch, bounded memory per group regardless of the
    * column's distinct count — the q36 path). `accuracy` trades rank
    * error 1/accuracy for buffer size; the sketch is EXACT whenever a
    * group's distinct count stays under it, which is what the spec
    * uses to pin parity with the exact form.
    */
  def madOutliersApprox(df: DataFrame, groupCol: String, valCol: String,
                        threshold: Double = 3.5, accuracy: Int = 10000): DataFrame = {
    val x = col(valCol).cast("double")
    val v = quoteIdent(valCol)
    val med = df.where(x.isNotNull)
      .groupBy(col(groupCol))
      .agg(expr(s"approx_percentile($v, 0.5, $accuracy)").cast("double").as("__med"))
    val withMed = df.join(med, Seq(groupCol))
    val mad = withMed
      .groupBy(col(groupCol))
      .agg(expr(s"approx_percentile(abs(CAST($v AS DOUBLE) - __med), 0.5, $accuracy)")
        .cast("double").as("__mad"))
    val score = when(col("__mad") > 0,
      round(lit(0.6745) * abs(x - col("__med")) / col("__mad"), 6))
    withMed.join(mad, Seq(groupCol))
      .withColumn("mz", score)
      .where((col("__mad") > 0 && col("mz") > threshold) ||
        (col("__mad") === 0 && x =!= col("__med")))
      .drop("__med", "__mad")
  }

  /** Winsorize: clamp `valCol` into its per-group exact interpolated
    * [pLo, pHi] percentile band (the tail-taming step before
    * mean-based statistics — bounded influence without dropping rows).
    * Adds `<valCol>_w` (6dp-rounded double); one grouped percentile
    * aggregation + the per-group band merged back, same shape (and
    * same exact-percentile memory contract — see `madOutliers`) as the
    * outlier pass.
    */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
                pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val v = quoteIdent(valCol)
    val band = df.groupBy(col(groupCol)).agg(
      expr(s"percentile($v, $pLo)").as("__lo"),
      expr(s"percentile($v, $pHi)").as("__hi"))
    df.join(band, Seq(groupCol))
      .withColumn(s"${valCol}_w",
        round(least(greatest(col(valCol).cast("double"), col("__lo")), col("__hi")), 6))
      .drop("__lo", "__hi")
  }

  /** Pairwise Pearson correlation matrix over numeric columns in ONE
    * aggregation pass: every pair's moments (Σx, Σy, Σxy, Σx², Σy², n
    * over rows where BOTH are non-null) fold into a single aggregate
    * row, and the textbook formula assembles the coefficients from it.
    * Explicit moment arithmetic — not `corr()` — so the exact
    * computation replays in any SQL engine (the gate's DuckDB oracle
    * uses the identical expressions). Pairs with zero variance on
    * either side yield NULL. Output: (c1, c2, corr 6dp), c1 < c2.
    *
    * One scan regardless of pair count; the unpivot runs over the
    * single aggregate row, never the data.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size, "duplicate columns")
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.size }
      yield (cols(i), cols(j))
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      val x = col(a).cast("double"); val y = col(b).cast("double")
      val both = x.isNotNull && y.isNotNull
      def m(e: org.apache.spark.sql.Column, n: String) =
        sum(when(both, e).otherwise(lit(null))).as(s"${n}_$i")
      Seq(m(x, "sx"), m(y, "sy"), m(x * y, "sxy"), m(x * x, "sxx"), m(y * y, "syy"),
        count(when(both, lit(1))).as(s"n_$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val outs = pairs.zipWithIndex.map { case ((a, b), i) =>
      val n = col(s"n_$i").cast("double")
      val cov = n * col(s"sxy_$i") - col(s"sx_$i") * col(s"sy_$i")
      val vx = n * col(s"sxx_$i") - col(s"sx_$i") * col(s"sx_$i")
      val vy = n * col(s"syy_$i") - col(s"sy_$i") * col(s"sy_$i")
      struct(lit(a).as("c1"), lit(b).as("c2"),
        when(vx > 0 && vy > 0, round(cov / sqrt(vx * vy), 6)).as("corr"))
    }
    row.select(explode(array(outs: _*)).as("p"))
      .select(col("p.c1"), col("p.c2"), col("p.corr"))
  }

  /** Mutual information (nats) between two categorical columns —
    * Σ p(a,b)·ln(p(a,b)/(p(a)p(b))) — the dependence measure feature
    * selection and leakage checks reach for when correlation cannot see
    * categorical structure. Rows with a NULL on either side are
    * excluded (MI over the observed joint distribution).
    *
    * Scale shape: ONE pass over the data builds the joint contingency
    * table (#distinct(a)×#distinct(b) rows — assumed far smaller than
    * the data, as categoricals are); marginals and the total re-
    * aggregate the JOINT table, never the data; the sum folds the joint
    * rows. Pure double arithmetic in an engine-shared evaluation order.
    */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val joint = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).cast("double").as("__c"))
    val ma = joint.groupBy("__a").agg(sum(col("__c")).as("__ca"))
    val mb = joint.groupBy("__b").agg(sum(col("__c")).as("__cb"))
    val n = joint.agg(sum(col("__c")).as("__n"))
    joint.join(ma, "__a").join(mb, "__b").crossJoin(n)
      .agg(round(sum((col("__c") / col("__n")) *
        log((col("__c") * col("__n")) / (col("__ca") * col("__cb")))), 6).as("mi"))
  }

  def summary(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs = cols.flatMap { c =>
      val x = col(c).cast("double")
      Seq(
        count(lit(1)).as(s"${c}__total"),
        (count(lit(1)) - count(x)).as(s"${c}__nulls"),
        count_distinct(x).as(s"${c}__distinct"),
        min(x).as(s"${c}__min"), max(x).as(s"${c}__max"),
        round(avg(x), 6).as(s"${c}__mean"),
        round(stddev_samp(x), 6).as(s"${c}__std"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // stack-unpivot the single aggregate row — ONE instance of the scan
    // subtree in the plan (a union of per-column selects would repeat it)
    val fields = Seq("total", "nulls", "distinct", "min", "max", "mean", "std")
    val stackArgs = cols.map { c =>
      (s"'${c.replace("'", "\\'")}'" +: fields.map(f => s"`${c}__$f`")).mkString(", ")
    }.mkString(", ")
    one.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
      "(column, n_rows, n_null, n_distinct, min, max, mean, std)")
  }
}
