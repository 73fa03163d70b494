package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: how rows are ORDERED on disk decides which
  * files a multi-dimensional filter can skip. Cite: reference has no
  * layout layer (single-node, no file statistics); this is the
  * Spark-native complement to its table scans.
  */
object Layout {

  /** Morton (Z-order) value: interleave the low `bits` bits of two
    * non-negative integer columns — bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Rows close in z are close in BOTH
    * dimensions, so `repartitionByRange(zValue).sortWithinPartitions`
    * before a parquet write yields files whose min/max column stats
    * are tight in a AND b — a filter on either dimension (or both)
    * skips most files, where a single-column sort only serves one.
    * The standard multi-dim clustering trick at 100 TB (Delta/Iceberg
    * OPTIMIZE ZORDER); here as a plain column expression, pure
    * codegen'd bit arithmetic, zero shuffle to compute.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** `df` re-clustered by the z-order of (`aCol`, `bCol`): range
    * partitions on z, sorted within each partition — the write-side
    * layout pass. `numFiles` controls output granularity (≈ files).
    */
  def zOrderBy(df: DataFrame, aCol: String, bCol: String, bits: Int,
               numFiles: Int): DataFrame = {
    require(!df.columns.contains("__graft_z"),
      "zOrderBy: input already has a __graft_z column")
    df.withColumn("__graft_z", zValue(col(aCol), col(bCol), bits))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
  }

  /** Small-file compaction planning — the lakehouse maintenance pass
    * (OPTIMIZE / bin-packing): assign each file of a partition to a
    * target-size output group by a deterministic running-total cut.
    * Greedy by (size desc, name) order: `group = floor(cumsum_before /
    * target)` — groups can overflow by at most one file, never
    * underfill below target except the last.
    *
    * Scale shape: the input is FILE METADATA (one row per file — a
    * listing, not data), windowed per table-partition — the same
    * per-group cumsum as sequence packing; planning 100 TB of files
    * costs one shuffle of the listing.
    */
  def compactionPlan(files: DataFrame, partitionCol: String,
                     fileCol: String, bytesCol: String,
                     targetBytes: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCol)
      .orderBy(col(bytesCol).desc, col(fileCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files.select(col(partitionCol).as("part"), col(fileCol).as("file"),
        col(bytesCol).as("bytes"))
      .withColumn("__cum", coalesce(sum(col("bytes")).over(w), lit(0L)))
      // integer division: exact at any cumulative size (double division
      // would lose precision past 2^53 bytes)
      .withColumn("group_id", expr(s"__cum div ${targetBytes}L"))
      .drop("__cum")
  }

  /** Per-partition content fingerprints for incremental recompute: a
    * partition reduces to `(n_rows, fingerprint)`, where the
    * fingerprint is the SUM of a portable per-row content hash
    * ([[graft.operators.TextAnalysis.polyHash]], base-31 mod 1e9+7) —
    * order-independent (sum commutes, so any scan order or
    * partitioning yields the same value) and mergeable (the
    * fingerprint of a union is the sum of fingerprints). Two snapshots
    * of a 100 TB table diff by comparing |partitions| fingerprint rows
    * instead of re-reading the data; only flagged partitions recompute
    * downstream. The sum accumulates as DECIMAL(38,0): a 64-bit sum
    * would wrap at ~9e9 rows/partition in Spark while DuckDB widens to
    * 128-bit — the decimal form is identical in both engines at any
    * cardinality.
    */
  def partitionFingerprints(df: DataFrame, partCol: String,
                            contentCol: Column): DataFrame =
    df.groupBy(col(partCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(TextAnalysis.polyHash(contentCol, 31L, 1000000007L)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("fingerprint"))
}
