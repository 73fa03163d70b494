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

  /** Exact per-group type-7 quantiles (the R default / NumPy
    * `linear` / DuckDB `quantile_cont` convention: linear
    * interpolation at 0-based position (n−1)·q) for an integer
    * column, same value-histogram shape as [[groupedMedianMad]].
    * Quantile fractions are `(num, den)` rationals and `den` must be
    * a power of two: every interpolation weight is then an exact
    * dyadic double, every product of it with an integer gap is
    * exactly representable, and the result matches any engine's
    * correctly-implemented type-7 quantile BIT-for-bit (with e.g.
    * q = 19/20 the weight 0.95 has no finite binary form and two
    * algebraically-equal interpolation trees can round apart).
    * Returns long-form `(groupCol, q, quantile)` with q as double.
    */
  def groupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                       qs: Seq[(Int, Int)]): DataFrame = {
    require(qs.nonEmpty, "groupedQuantiles needs at least one fraction")
    qs.foreach { case (num, den) =>
      require(den > 0 && (den & (den - 1)) == 0 && num >= 0 && num <= den,
        s"quantile $num/$den: need 0 <= num <= den and den a power of two")
    }
    // 0-based position (n−1)·num/den = i + rem/den; the two bracketing
    // ranks are i+1 and (i+2 when rem>0 else i+1), 1-based
    val pos = histogramWithTotals(df, groupCol, valueCol, qs)
      .withColumn("_i", expr("((n - 1) * _num) div _den"))
      .withColumn("_rem", expr("((n - 1) * _num) % _den"))
    val vlo = min(when(col("_cum") >= col("_i") + 1, col(valueCol)))
    val vhi = min(when(col("_cum") >=
      col("_i") + when(col("_rem") > 0, 2).otherwise(1), col(valueCol)))
    // _rem is functionally determined by (group, _num, _den) — n is
    // constant per group — so grouping on it adds no cardinality
    pos.groupBy(col(groupCol), col("_num"), col("_den"), col("_rem"))
      .agg(vlo.as("_lo"), vhi.as("_hi"))
      .select(col(groupCol),
        (col("_num").cast("double") / col("_den").cast("double")).as("q"),
        (col("_lo").cast("double") +
          (col("_rem").cast("double") / col("_den").cast("double")) *
            (col("_hi") - col("_lo")).cast("double"))
          .as("quantile"))
  }

  /** Exact per-group DISCRETE quantiles (type 1 / inverse ECDF: the
    * value at rank ceil(q·n), always an actual data value — what
    * DuckDB's `quantile_disc` computes, verified across edge sizes):
    * same histogram shape as [[groupedQuantiles]] but rank arithmetic
    * is pure integers, so ANY rational fraction works (no dyadic
    * restriction — there is no interpolation to round). Returns
    * long-form `(groupCol, q, quantile)`; `quantile` keeps the value
    * column's type.
    */
  def groupedQuantilesDisc(df: DataFrame, groupCol: String,
                           valueCol: String,
                           qs: Seq[(Int, Int)]): DataFrame = {
    require(qs.nonEmpty, "groupedQuantilesDisc needs at least one fraction")
    qs.foreach { case (num, den) =>
      require(den > 0 && num >= 1 && num <= den,
        s"quantile $num/$den: need 1 <= num <= den")
    }
    histogramWithTotals(df, groupCol, valueCol, qs)
      .withColumn("_rank", expr("(n * _num + _den - 1) div _den"))
      .groupBy(col(groupCol), col("_num"), col("_den"))
      .agg(min(when(col("_cum") >= col("_rank"), col(valueCol)))
        .as("quantile"))
      .select(col(groupCol),
        (col("_num").cast("double") / col("_den").cast("double")).as("q"),
        col("quantile"))
  }

  /** Shared scaffolding for both quantile variants: the per-group
    * value histogram with cumulative weights, per-group NON-NULL
    * counts, and the broadcast fraction table, joined into one frame.
    * NULL values are excluded from the histogram and the counts (the
    * aggregate-level null exclusion every SQL engine applies), but
    * all-NULL groups are NOT dropped: totals come from a
    * count(valueCol) aggregate over the raw input and LEFT-join the
    * histogram, so such a group surfaces with n=0, matches no
    * histogram row, and yields a NULL quantile — exactly what
    * `GROUP BY g, quantile_*(v)` returns. (That count is a second
    * pass over the input; deriving totals from the histogram alone
    * would be cheaper but silently drops all-NULL groups.)
    */
  private def histogramWithTotals(df: DataFrame, groupCol: String,
                                  valueCol: String,
                                  qs: Seq[(Int, Int)]): DataFrame = {
    val cumW = Window.partitionBy(groupCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val h = df.filter(col(valueCol).isNotNull)
      .groupBy(groupCol, valueCol).agg(count(lit(1)).as("_w"))
      .withColumn("_cum", sum(col("_w")).over(cumW))
    val totals = df.groupBy(groupCol).agg(count(col(valueCol)).as("n"))
    // fraction fan-out via explode of a literal array — a generator in
    // the same codegen stage, not a BroadcastNestedLoopJoin (a
    // crossJoin with a tiny literal table is linear too, but drags in
    // broadcast machinery and trips the all-pairs plan audit)
    val qArr = array(qs.map { case (num, den) =>
      struct(lit(num.toLong).as("_num"), lit(den.toLong).as("_den"))
    }: _*)
    totals.join(h, Seq(groupCol), "left")
      .withColumn("_q", explode(qArr))
      .withColumn("_num", col("_q._num"))
      .withColumn("_den", col("_q._den"))
      .drop("_q")
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
    // r10 optimization (guide §2.4): the previous form ran
    // weightedMedian2 twice plus three joins back to a persisted
    // histogram (≈7 joins / 6 aggregates / 43 stages at sf0.1, with
    // concurrent broadcast jobs racing the lazy cache). All of it is
    // expressible as windows over the SAME per-group partitioning the
    // histogram aggregate already establishes, so the whole statistic
    // is: histogram → window stack → deviation histogram → window
    // stack → one final aggregate (3 exchanges total, no joins, no
    // persist). The integer algebra is unchanged — med2/mad4 exactly
    // as before; the outlier rule |4v−2·med2| > 3·mad4 rewrites to
    // 2·_dev2 > 3·mad4 because _dev2 = |2v−med2|, which is why the
    // deviation histogram rows are enough and `h` is never re-joined.
    val wg = Window.partitionBy(groupCol)
    val cumW = Window.partitionBy(groupCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-(group, value) weights, cumulative weight, group total — the
    // weightedMedian2 scaffolding with totals as a window, not a join
    val h = df.groupBy(groupCol, valueCol)
      .agg(count(lit(1)).as("_w"))
      .withColumn("_cum", sum(col("_w")).over(cumW))
      .withColumn("n", sum(col("_w")).over(wg))
    val med2c = (min(when(col("_cum") >= expr("(n + 1) div 2"),
        col(valueCol))).over(wg) +
      min(when(col("_cum") >= expr("n div 2 + 1"), col(valueCol))).over(wg))
    // deviation histogram: dev2 = |2v − med2| = 2·|v − median|, still
    // integer; its doubled weighted median is 4·MAD. med2/n are
    // constant per group, so carrying them as grouping keys adds no
    // cardinality.
    val dev = h.withColumn("med2", med2c)
      .select(col(groupCol), col("n"), col("med2"),
        abs(lit(2L) * col(valueCol) - col("med2")).as("_dev2"), col("_w"))
      .groupBy(groupCol, "n", "med2", "_dev2").agg(sum("_w").as("_w"))
      .withColumn("_cum", sum(col("_w")).over(
        Window.partitionBy(groupCol).orderBy("_dev2")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val mad4c = (min(when(col("_cum") >= expr("(n + 1) div 2"),
        col("_dev2"))).over(wg) +
      min(when(col("_cum") >= expr("n div 2 + 1"), col("_dev2"))).over(wg))
    // outlier rule in the same integer algebra:
    // |v − med| > 3·MAD ⟺ |4v − 2·med2| > 3·mad4 ⟺ 2·_dev2 > 3·mad4
    dev.withColumn("mad4", mad4c)
      .groupBy(col(groupCol), col("n"), col("med2"), col("mad4"))
      .agg(sum(when(lit(2L) * col("_dev2") > lit(3L) * col("mad4"),
          col("_w")).otherwise(lit(0L))).as("n_outliers"))
      .select(col(groupCol), col("n"),
        (col("med2").cast("double") / 2.0).as("median"),
        (col("mad4").cast("double") / 4.0).as("mad"),
        col("n_outliers"))
  }
}
