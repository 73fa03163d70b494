package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: left rows whose time falls inside a right-side
  * `[start, end)` interval, without the nested-loop pair explosion.
  *
  * Spark plans a bare `l JOIN r ON ts >= start AND ts < end` as a
  * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons and a broadcast of
  * one whole side, which dies when neither side is small. This operator
  * buckets time into fixed-width bins: each left row lands in exactly
  * one bin, each interval is exploded to the bins it overlaps, and the
  * join becomes a hash equi-join on the bin key with the range predicate
  * as a residual filter. Cost is O(|L| + |R|·(len/bin)) join rows, fully
  * shuffle-partitioned on the bin key — the standard scalable
  * formulation (cf. DuckDB/Trino IEJoin literature; Spark has no native
  * range-join strategy).
  *
  * Pick `binSeconds` on the order of the typical interval length: too
  * small multiplies the interval replicas, too large degrades the
  * equi-join's selectivity toward all-pairs within a bin.
  */
object RangeJoin {

  /** Inner join of `left` to `right` on
    * `left(leftTime) ∈ [right(startCol), right(endCol))`.
    *
    * Column names must be disjoint between the two inputs (the result
    * carries both sides' columns).
    */
  def rangeJoin(left: DataFrame, leftTime: String,
                right: DataFrame, startCol: String, endCol: String,
                binSeconds: Long = 86400L): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    def bin(c: Column): Column = floor(unix_timestamp(c) / binSeconds)
    val lb = left.withColumn("__bin", bin(col(leftTime)))
    // hi is bin(end) rather than bin(end - 1s): at most one spurious
    // replica per interval, removed by the residual filter — cheaper
    // than being clever about sub-second end boundaries. greatest()
    // guards inverted intervals (end < start): sequence() would throw
    // where the naive join just matches nothing; the residual filter
    // then drops the single spurious replica.
    val lo = bin(col(startCol))
    val rb = right.withColumn(
      "__bin", explode(sequence(lo, greatest(lo, bin(col(endCol))))))
    lb.join(rb, lb("__bin") === rb("__bin") &&
        col(leftTime) >= col(startCol) && col(leftTime) < col(endCol))
      .drop("__bin")
  }
}
