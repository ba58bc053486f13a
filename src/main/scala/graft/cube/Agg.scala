package graft.cube

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Accumulator semantics re-expressed as Spark aggregate Columns.
  *
  * Mirrors the reference accumulator set (bacon/accumulators.py:20-393)
  * but compiles to Catalyst aggregate expressions so partial (map-side)
  * aggregation, whole-stage codegen and AQE all apply — the reference's
  * single-threaded fold becomes a distributed two-phase aggregation.
  */
sealed trait Agg {
  /** Build the aggregate Column for measure expression `c`. */
  def compile(c: Column): Column
}

object Agg {

  /** bacon/accumulators.py:20 — plain sum (nulls skipped). */
  case object Sum extends Agg {
    def compile(c: Column): Column = sum(c)
  }

  /** bacon/accumulators.py:137 — counts *records*, not non-null values. */
  case object Count extends Agg {
    def compile(c: Column): Column = count(lit(1))
  }

  /** bacon/accumulators.py:108 */
  case object Min extends Agg {
    def compile(c: Column): Column = min(c)
  }

  /** bacon/accumulators.py:79 */
  case object Max extends Agg {
    def compile(c: Column): Column = max(c)
  }

  /** bacon/accumulators.py:157 — Average divides the sum of non-null
    * values by the TOTAL record count (n is bumped on every add), which
    * differs from SQL AVG. Faithfully: sum(x)/count(*).
    */
  case object Avg extends Agg {
    def compile(c: Column): Column = sum(c) / count(lit(1))
  }

  /** Standard SQL average (sum/non-null count) — a useful extra. */
  case object AvgNonNull extends Agg {
    def compile(c: Column): Column = avg(c)
  }

  /** bacon/accumulators.py:193 — Welford sample stddev, null for n<2;
    * exactly `stddev_samp` semantics.
    */
  case object StdDev extends Agg {
    def compile(c: Column): Column = stddev_samp(c)
  }

  /** bacon/accumulators.py:259 — Group: the common value of the group if
    * all records agree (nulls count as a value), else null.
    */
  case object GroupConsistent extends Agg {
    def compile(c: Column): Column =
      when(count_distinct(c) === 1 && count(c) === count(lit(1)), min(c))
  }

  /** Exact distinct count (scale path: see ApproxDistinct). */
  case object CountDistinct extends Agg {
    def compile(c: Column): Column = count_distinct(c)
  }

  /** HyperLogLog++ distinct estimate — the 100 TB-friendly variant. */
  final case class ApproxDistinct(rsd: Double = 0.05) extends Agg {
    def compile(c: Column): Column = approx_count_distinct(c, rsd)
  }

  /** bacon/accumulators.py:53 — Union of set-valued measures. Output is
    * sorted for determinism (the reference keeps Python set order).
    */
  case object UnionSet extends Agg {
    def compile(c: Column): Column =
      array_sort(array_distinct(flatten(collect_list(c))))
  }

  /** bacon/accumulators.py:54-76 — Union.get returns `(set,
    * included_empty)`; this is the companion flag as its own measure:
    * true iff any record in the group contributed an empty (or null) set.
    * Lets a renderer distinguish "∅ because empty sets were present" from
    * "no such rows". Pair it with UnionSet over the same expression.
    */
  case object UnionIncludedEmpty extends Agg {
    def compile(c: Column): Column =
      max(size(coalesce(c, array())) === 0)
  }

  /** bacon/accumulators.py:355 — RatioSum: sum(num)/sum(den), null when
    * the denominator sums to 0 or null.
    */
  final case class Ratio(num: Column, den: Column) extends Agg {
    def compile(ignored: Column): Column = {
      val d = sum(den)
      when(d =!= 0, sum(num) / d)
    }
  }

  /** bacon/accumulators.py:299 — LabeledAcc: apply `inner` only if every
    * record in the group carries the same `label` value; else null
    * (e.g. summing money only when the whole group shares one currency).
    */
  final case class Labeled(label: Column, inner: Agg) extends Agg {
    def compile(c: Column): Column =
      when(count_distinct(label) === 1 && count(label) === count(lit(1)),
        inner.compile(c))
  }
}
