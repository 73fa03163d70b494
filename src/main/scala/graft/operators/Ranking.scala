package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed GLOBAL ranking. Spark's global window
  * (`Window.orderBy` with no partitionBy) moves the whole input into a
  * SINGLE task — the documented `WindowExec` warning, and a guaranteed
  * OOM at corpus scale. This operator computes the identical
  * `row_number() OVER (ORDER BY ...)` with bounded tasks:
  *
  *  1. range-repartition on the order keys (one shuffle — the same
  *     exchange a global ORDER BY plans) and sort within partitions;
  *  2. count rows per range partition (tiny aggregate: one row per
  *     partition reaches the driver, bounded by cluster config, never
  *     by data);
  *  3. per-partition sequential numbering offset by the cumulative
  *     count of preceding partitions — a narrow zero-shuffle pass.
  *
  * The input is persisted across the two passes; at production scale
  * the range-partitioned intermediate would be a checkpoint table, the
  * same shape either way. Callers must supply a TOTAL order (include a
  * unique tiebreak column) — the same requirement `row_number` itself
  * has for deterministic output.
  */
object Ranking {

  /** `(df + rankCol, totalRows)` where rankCol = 1-based global
    * row_number under `order`. Appended column goes last.
    */
  def globalRowNumber(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
                      rankCol: String = "rn",
                      partitions: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = parted.select(spark_partition_id().as("p"))
      .groupBy("p").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L)((acc, i) =>
      acc + counts.getOrElse(i, 0L)).toArray
    val total = offsets(n)
    val schema = df.schema.add(rankCol, LongType, nullable = false)
    val ranked = spark.createDataFrame(
      parted.rdd.mapPartitionsWithIndex { (pid, it) =>
        var r = offsets(pid)
        it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
      }, schema)
    (ranked, total)
  }
}
