package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge

/** Bloom-filter sketch functions over Spark's native runtime-filter
  * expressions (BloomFilterAggregate / BloomFilterMightContain — the
  * machinery behind spark.sql.optimizer.runtime.bloomFilter, exposed as
  * columns the same way VectorFunctions exposes graft's own codegen'd
  * expressions). Both sides operate on LONG keys — feed them xxhash64 of
  * whatever the real key is, exactly like the join-key hashing every
  * graft dedup operator already does.
  *
  * The use case is semi-join pruning at 100 TB: aggregate the SMALL
  * side's keys into one bloom blob (≈ 1.2 MB per 10⁶ keys at 1% fpp —
  * an order of magnitude smaller than broadcasting the keys), then
  * `mightContain` pre-filters the big side BEFORE its shuffle, so the
  * exact join that follows moves only true matches plus an fpp-sized
  * trickle. The bloom never changes results — it only prunes rows the
  * exact join would drop anyway.
  */
object Sketch {

  /** Aggregate LONG keys into a serialized bloom filter sized for
    * `expectedItems` at `fpp`. NOTE Spark clamps the size at
    * spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold-
    * family limits (maxNumItems / maxNumBits) — raise those confs for
    * very large small-sides.
    */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double = 0.01): Column = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // standard bloom sizing: m = -n ln(p) / ln(2)^2
    val bits = math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.catalystExpression(c),
      ColumnBridge.catalystExpression(lit(expectedItems)),
      ColumnBridge.catalystExpression(lit(bits))).toAggregateExpression())
  }

  /** Membership probe against a collected bloom blob (passed as a
    * literal — BloomFilterMightContain requires a foldable filter side).
    * False positives at the configured fpp; never false negatives.
    */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.catalystExpression(lit(bloomBytes)),
      ColumnBridge.catalystExpression(c)))
}
