package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group statistics at corpus scale.
  *
  * Exact medians are the textbook data-profiling primitive, and the
  * textbook implementations don't scale: Spark's `percentile`
  * aggregate buffers every value of a group in executor memory, and a
  * per-group sort window materializes the same. For INTEGER-valued
  * columns (lengths, token counts, cents — the columns pipelines
  * actually profile) the scale-safe form is the value histogram:
  * per-(group, value) counts, a cumulative count over the value order
  * WITHIN each group (a partitioned window over the distinct-value
  * domain, not the row count), and the median read off where the
  * cumulative crosses half. Memory is O(distinct values per group) —
  * bounded by the value domain, independent of row count.
  */
object Stats {

  /** DOUBLED weighted median per group — ×2 keeps the even-count
    * interpolation `(a+b)/2` in exact integer arithmetic. `df` must
    * hold one row per (group, value) with a positive weight (the
    * histogram form). Returns `(groupCol, n, med2)` where n = Σw and
    * med2 = lower-middle + upper-middle value.
    */
  def weightedMedian2(df: DataFrame, groupCol: String, valueCol: String,
                      weightCol: String): DataFrame = {
    val cumW = Window.partitionBy(groupCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df.withColumn("_cum", sum(col(weightCol)).over(cumW))
    val totals = df.groupBy(groupCol).agg(sum(col(weightCol)).as("n"))
    cum.join(totals, groupCol)
      .groupBy(groupCol, "n")
      .agg((min(when(col("_cum") >= expr("(n + 1) div 2"),
          col(valueCol))) +
        min(when(col("_cum") >= expr("n div 2 + 1"), col(valueCol))))
        .as("med2"))
  }

  /** Exact per-group median, MAD (median absolute deviation — the
    * robust spread measure outlier rules want; Hampel 1974), and the
    * count of `|x − median| > 3·MAD` outliers, for an integer-valued
    * column. Three histogram passes over per-(group, value) counts —
    * every window is partitioned by group AND runs over the distinct
    * value domain, so no unbounded task anywhere. All arithmetic is
    * integer until the final ÷2/÷4 displays (interpolated medians are
    * halves, MADs quarters — exact dyadic doubles, so the result is
    * bit-identical across engines and partitionings).
    * Returns `(groupCol, n, median, mad, n_outliers)`.
    */
  def groupedMedianMad(df: DataFrame, groupCol: String,
                       valueCol: String): DataFrame = {
    val h = df.groupBy(groupCol, valueCol)
      .agg(count(lit(1)).as("_w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = weightedMedian2(h, groupCol, valueCol, "_w")
    // deviation histogram: dev2 = |2v − med2| = 2·|v − median|, still
    // integer; its doubled weighted median is 4·MAD
    val dev = h.join(med, groupCol)
      .select(col(groupCol),
        abs(lit(2L) * col(valueCol) - col("med2")).as("_dev2"),
        col("_w"))
      .groupBy(groupCol, "_dev2").agg(sum("_w").as("_w"))
    val mad4 = weightedMedian2(dev, groupCol, "_dev2", "_w")
      .select(col(groupCol), col("med2").as("mad4"))
    // outlier rule in the same integer algebra:
    // |v − med| > 3·MAD  ⟺  |4v − 2·med2| > 3·mad4
    val out = h.join(med, groupCol).join(mad4, groupCol)
      .groupBy(groupCol)
      .agg(sum(when(
        abs(lit(4L) * col(valueCol) - lit(2L) * col("med2"))
          > lit(3L) * col("mad4"), col("_w")).otherwise(lit(0L)))
        .as("n_outliers"))
    med.join(mad4, groupCol).join(out, groupCol)
      .select(col(groupCol), col("n"),
        (col("med2").cast("double") / 2.0).as("median"),
        (col("mad4").cast("double") / 4.0).as("mad"),
        col("n_outliers"))
  }
}
