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

  /** Distributed GLOBAL running aggregate (prefix sum / prefix max)
    * under a total order — the bounded-task form of
    * `sum(v) OVER (ORDER BY ...)`, which Spark plans as a single-task
    * `WindowExec` (the same scale hazard [[globalRowNumber]] removes
    * for `row_number`). Same two-phase shape:
    *
    *  1. range-repartition on the order keys + sort within partitions
    *     (the exchange a global ORDER BY plans anyway);
    *  2. per-partition TOTALS of the value column (one row per
    *     partition to the driver — bounded by cluster config);
    *  3. a narrow zero-shuffle pass carrying each partition's prefix
    *     offset (the combined totals of all preceding partitions).
    *
    * `op` is a commutative-associative Long monoid: "sum" or "max".
    * Appends `runCol` = the EXCLUSIVE prefix (aggregate of all rows
    * strictly before this one in `order`) — exclusive is the primitive:
    * inclusive = op(exclusive, own value), and ties-aware variants
    * (all rows with a strictly-smaller key) derive by aggregating to
    * distinct keys first. Callers must supply a TOTAL order for a
    * deterministic result, same as any running window.
    */
  def globalRunningAgg(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
                       valueCol: String, op: String,
                       runCol: String = "run",
                       partitions: Int = 0): DataFrame = {
    val (zero, combine): (Long, (Long, Long) => Long) = op match {
      case "sum" => (0L, _ + _)
      case "max" => (Long.MinValue, math.max)
      case other => throw new IllegalArgumentException(
        s"unsupported running-agg op: $other")
    }
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val vi = df.schema.fieldIndex(valueCol)
    val parted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = parted
      .select(spark_partition_id().as("p"), col(valueCol))
      .groupBy("p")
      .agg((if (op == "sum") sum(valueCol) else max(valueCol)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(zero)((acc, i) =>
      combine(acc, totals.getOrElse(i, zero))).toArray
    val schema = df.schema.add(runCol, LongType, nullable = false)
    spark.createDataFrame(
      parted.rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = offsets(pid)
        it.map { row =>
          val out = Row.fromSeq(row.toSeq :+ acc)
          acc = combine(acc, row.getLong(vi))
          out
        }
      }, schema)
  }

  /** 2-D Pareto skyline (min `xCol`, max `yCol`) — "best tradeoff"
    * selection: the points no other point beats on both axes
    * (Börzsönyi et al., ICDE 2001). The naive form is an all-pairs
    * dominance test; the sort-based form is a single-task running
    * window. This is the distributed third way, built on the sweep
    * invariant: after collapsing to one row per distinct x (keeping
    * max y — anything else at that x is dominated), a point is on the
    * skyline iff its y strictly exceeds the running max y of all
    * strictly-smaller x — i.e. exactly an EXCLUSIVE
    * [[globalRunningAgg]] prefix-max over the x order. One groupBy +
    * one distributed prefix pass; no quadratic anywhere.
    *
    * Both columns must be integral (cast to Long); ties on x keep the
    * single max-y representative, and duplicate (x, y) points
    * deduplicate — the skyline is a point set. Returns `(x, y)` rows.
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df.select(col(xCol).cast(LongType).as("x"),
        col(yCol).cast(LongType).as("y"))
      .groupBy("x").agg(max("y").as("y"))
    globalRunningAgg(pts, Seq(col("x")), valueCol = "y", op = "max",
        runCol = "best_below")
      .filter(col("y") > col("best_below"))
      .select(col("x").as(xCol), col("y").as(yCol))
  }
}
