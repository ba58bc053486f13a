package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.cube.Agg

/** Skew mitigation for hot keys at scale.
  *
  * AQE's skew-join handling covers joins; for aggregations over power-law
  * keys (the norm in web corpora — host names, languages, templates) a
  * two-phase salted aggregation bounds any single reducer's input:
  * phase 1 aggregates on (key, salt) — map-side combine already shrinks
  * this — phase 2 merges the ≤`salts` partials per key.
  */
object Skew {

  /** Salted two-phase aggregation. `aggs` maps output column name to the
    * re-aggregatable Agg (Sum/Min/Max/Count — algebraic ones).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                aggs: Seq[(String, Column, Agg)]): DataFrame = {
    val salted = df.withColumn("__salt__", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt__")): _*)
      .agg(aggs.head match { case (n, c, a) => a.compile(c).as(n) },
        aggs.tail.map { case (n, c, a) => a.compile(c).as(n) }: _*)
    val phase2Aggs = aggs.map { case (n, _, a) =>
      val merged = a match {
        case Agg.Count => sum(col(n)) // partial counts add
        case other     => other.compile(col(n))
      }
      merged.as(n)
    }
    phase1.groupBy(keys.map(col): _*)
      .agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }
}
