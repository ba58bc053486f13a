package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational building blocks the reference reaches via its Django/SQL
  * backends (bacon/sql.py, bacon/django/sql.py) — star joins, top-k
  * drill-downs, measure filters — expressed as scale-aware Spark plans.
  */
object Relational {

  /** Star-schema join: fact joined to each dimension, broadcast-hinted
    * ONLY when the dimension's estimated size is under `broadcastThreshold`
    * bytes. Unbounded "dims" (e.g. an orders table that scales with the
    * fact) would OOM the executors if force-broadcast at 100 TB, so they
    * join without a hint and AQE picks SMJ / shuffled-hash / runtime
    * broadcast from actual stats. The reference assumes records arrive
    * pre-joined (bacon works on a single iterable); at scale the join must
    * be explicit, with broadcast reserved for genuinely bounded tables.
    */
  def starJoin(fact: DataFrame, dims: Seq[(DataFrame, Column)],
               broadcastThreshold: Long = 64L << 20): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, on)) =>
      val estBytes = dim.queryExecution.optimizedPlan.stats.sizeInBytes
      if (estBytes <= broadcastThreshold) acc.join(broadcast(dim), on)
      else acc.join(dim, on)
    }

  /** Top-k rows per group — one shuffle on the partition keys, rank
    * computed in-partition. `order` must be deterministic (include a
    * tiebreaker) for stable results.
    */
  def topKPerGroup(df: DataFrame, partitionBy: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(order: _*)
    df.withColumn("__rank__", row_number().over(w))
      .where(col("__rank__") <= k)
      .drop("__rank__")
  }

  /** HAVING — filter on an aggregated measure after a slice. */
  def having(slice: DataFrame, predicate: Column): DataFrame = slice.where(predicate)
}
