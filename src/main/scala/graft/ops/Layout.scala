package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering for
  * parquet at rest. Sorting 100 TB by one column serves that column's
  * range scans and nobody else's; interleaving the bits of d columns
  * gives every one of them locality, so each parquet file/row-group
  * spans a small hyper-box and min/max stats prune scans on ANY of the
  * clustered dimensions (the Delta/Iceberg OPTIMIZE ZORDER design,
  * rebuilt on plain Spark + parquet).
  *
  * The z-value is pure 64-bit integer arithmetic — bit-extract, shift,
  * sum — identical in any engine (the gate replays it in DuckDB), and
  * codegen-friendly (no UDF, no HOF).
  */
object Layout {

  /** Morton interleave: bit i of column j lands at position i*d + j of
    * the z-value. Inputs must be NON-NEGATIVE ints already scaled to
    * `bits` bits — values ≥ 2^bits would alias (their high bits are
    * dropped), so callers bucket/rank first; `bits * cols.size` must fit
    * a signed long. NULL in any column yields NULL (sort them last).
    */
  def zvalue(bits: Int, cols: Column*): Column = {
    val d = cols.size
    require(d >= 1, "zvalue needs at least one column")
    require(bits >= 1 && bits * d <= 62, s"bits*dims must be in [1, 62], got ${bits * d}")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_ + _)
  }

  /** The same computation as SQL text (for oracles / external engines):
    * plain `>> & <<` arithmetic, no dialect hooks needed.
    */
  def zvalueSql(bits: Int, cols: Seq[String]): String = {
    val d = cols.size
    require(d >= 1 && bits >= 1 && bits * d <= 62)
    (for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield s"(((CAST($c AS BIGINT) >> $i) & 1) << ${i * d + j})").mkString(" + ")
  }

  /** Write `df` z-clustered on `cols` (each pre-scaled to `bits` bits):
    * range-partition on the z-value into `numFiles` parts — a sampled
    * range exchange, the standard total-sort shuffle — then sort within
    * partitions and write. Every output file covers a contiguous
    * z-range = a small hyper-box, so parquet min/max stats on the
    * clustered columns skip most files for a box predicate on any of
    * them. The helper z column is dropped from the stored schema.
    */
  def writeZOrdered(df: DataFrame, cols: Seq[String], bits: Int,
                    numFiles: Int, path: String): Unit = {
    require(numFiles >= 1)
    df.withColumn("__z", zvalue(bits, cols.map(col): _*))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
