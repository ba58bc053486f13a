package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.lit

/** The ONE sanctioned unpartitioned-window shape in this codebase: a
  * prefix-sum window over a SPINE — a frame already reduced to bounded
  * grain (one row per time bucket, per shuffle partition, per
  * category), never per data row.
  *
  * CONTRACT (callers must be able to argue all three):
  *  1. The input frame's row count is bounded by a structural quantity
  *     (time grain, `spark.sql.shuffle.partitions`, category arity) —
  *     O(B) with B ≲ 10⁵ at any data scale, so one partition IS the
  *     right plan and the cumulative pass costs O(B log B).
  *  2. The alternative is worse at scale: the inequality self-join these
  *     call sites replaced plans as an O(B²) BroadcastNestedLoopJoin.
  *  3. The result is joined back broadcast — the spine never becomes a
  *     shuffle key for the data-sized side.
  *
  * Spark folds the constant `lit(0)` partition key out of the spec, so
  * WindowExec still logs its "No Partition Defined" warning for these —
  * benign here by the contract above. Bench silences that logger (the
  * known sources would bury real ones); the LOUD gate for a NEW
  * unpartitioned window is PlanAudit, which flags every
  * empty-partition-spec logical Window outside the whitelisted
  * boundedSpine call sites.
  */
object BoundedSpine {
  /** Running-sum spec over the spine: rows from the frame start up to
    * `endOffset` relative to the current row (−1 = strictly-preceding
    * prefix sum, 0 = inclusive cumulative).
    */
  def prefixSum(orderCol: Column, endOffset: Long = -1L): WindowSpec =
    Window.partitionBy(lit(0)).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, endOffset)
}
