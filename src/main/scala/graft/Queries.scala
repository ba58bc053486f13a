package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cube._
import graft.tables.Tpch

/** The driver-checked query inventory (SURVEY.md §2). Every entry runs
  * through the graft engine (CubeQuery → Slicer) — not raw SQL — and has a
  * DuckDB oracle unless it is a rows-only operator.
  *
  * Convention for oracle comparability: double outputs are rounded (sums
  * to 2 dp, ratios/stddevs to 6 dp) and integer outputs are cast to BIGINT
  * on both sides, so value hashing is immune to FP summation order and
  * int-width differences between engines.
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  private def li(s: SparkSession, dir: String) = Tpch.table(s, dir, "lineitem")
  private def ord(s: SparkSession, dir: String) = Tpch.table(s, dir, "orders")
  private def part(s: SparkSession, dir: String) = Tpch.table(s, dir, "part")

  /** Oracle-checked query. */
  private def oq(sql: String)(f: Q): (Q, Option[String]) = (f, Some(sql.stripMargin))
  /** Rows-only query (no SQL-expressible oracle). */
  private def nq(f: Q): (Q, Option[String]) = (f, None)

  val cube: Map[String, (Q, Option[String])] = Map(
    // §2.1-2, 9: Sum + Count accumulators over a 2-axis slice
    "q01_agg_basic" -> oq(
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity),2) AS sum_qty,
        |round(sum(l_extendedprice),2) AS sum_price,
        |count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""") { (s, dir) =>
      val q = CubeQuery()
        .addAxis("l_returnflag").addAxis("l_linestatus")
        .addValue("sum_qty").addValue("sum_price").addValue("n_rows")
      Slicer.slice(li(s, dir), Tpch.lineitemCube, q)
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("sum_qty"), 2).as("sum_qty"),
          round(col("sum_price"), 2).as("sum_price"),
          col("n_rows"))
    },

    // §2.3: Min/Max accumulators
    "q02_minmax" -> oq(
      """SELECT o_orderpriority,
        |round(min(o_totalprice),2) AS min_total,
        |round(max(o_totalprice),2) AS max_total,
        |count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""") { (s, dir) =>
      val q = CubeQuery().addAxis("o_orderpriority")
        .addValue("min_total").addValue("max_total").addValue("n_orders")
      Slicer.slice(ord(s, dir), Tpch.ordersCube, q)
        .select(col("o_orderpriority"),
          round(col("min_total"), 2).as("min_total"),
          round(col("max_total"), 2).as("max_total"),
          col("n_orders"))
    },

    // §2.4-5: reference Average (= sum/count(*)) + Welford sample StdDev
    "q03_avg_stddev" -> oq(
      """SELECT l_returnflag,
        |round(sum(l_quantity)/count(*),6) AS avg_qty,
        |round(stddev_samp(l_quantity),6) AS std_qty
        |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
      val q = CubeQuery().addAxis("l_returnflag")
        .addValue("avg_qty").addValue("std_qty")
      Slicer.slice(li(s, dir), Tpch.lineitemCube, q)
        .select(col("l_returnflag"),
          round(col("avg_qty"), 6).as("avg_qty"),
          round(col("std_qty"), 6).as("std_qty"))
    },

    // §2.6: Group accumulator — consistent-else-null
    "q04_group_acc" -> oq(
      """SELECT o_custkey,
        |CASE WHEN count(DISTINCT o_orderstatus) = 1
        |      AND count(o_orderstatus) = count(*)
        |     THEN min(o_orderstatus) END AS grp_status,
        |count(*) AS n_orders
        |FROM orders GROUP BY o_custkey""") { (s, dir) =>
      val q = CubeQuery().addAxis("o_custkey").addValue("grp_status").addValue("n_orders")
      Slicer.slice(ord(s, dir), Tpch.ordersCube, q)
        .select(col("o_custkey"), col("grp_status"), col("n_orders"))
    },

    // §2.7: RatioSum accumulator
    "q05_ratio" -> oq(
      """SELECT l_returnflag,
        |round(sum(l_extendedprice*(1-l_discount))
        |      / nullif(sum(l_extendedprice),0), 6) AS margin_ratio
        |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
      val q = CubeQuery().addAxis("l_returnflag").addValue("margin_ratio")
      Slicer.slice(li(s, dir), Tpch.lineitemCube, q)
        .select(col("l_returnflag"), round(col("margin_ratio"), 6).as("margin_ratio"))
    },

    // §2.8: Union accumulator over a set-valued measure
    "q06_union_acc" -> oq(
      """SELECT p_brand, list(DISTINCT w ORDER BY w) AS type_word_set
        |FROM (SELECT p_brand, unnest(string_split(p_type, ' ')) AS w FROM part)
        |GROUP BY p_brand""") { (s, dir) =>
      val q = CubeQuery().addAxis("p_brand").addValue("type_word_set")
      Slicer.slice(part(s, dir), Tpch.partCube, q)
    },

    // §2.10: 0-dimensional slice (grand total)
    "q07_grand_total" -> oq(
      """SELECT round(sum(l_extendedprice),2) AS sum_price, count(*) AS n_rows
        |FROM lineitem""") { (s, dir) =>
      val q = CubeQuery().addValue("sum_price").addValue("n_rows")
      Slicer.slice(li(s, dir), Tpch.lineitemCube, q)
        .select(round(col("sum_price"), 2).as("sum_price"), col("n_rows"))
    },
  )

  def all: Map[String, Q] = cube.map { case (k, (f, _)) => k -> f }
  def oracles: Map[String, String] = cube.collect { case (k, (_, Some(sql))) => k -> sql }
}
