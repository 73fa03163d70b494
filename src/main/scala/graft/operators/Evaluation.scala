package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-evaluation metrics at corpus scale.
  *
  * The quality-classifier pipeline (t15) scores every document; before
  * a score threshold gates 100 TB of training data, the score has to
  * be validated against labels — and the standard threshold-free
  * metric is ROC AUC. At scale the textbook computation (sort all N
  * scores, one running rank pass) is exactly the single-task global
  * window this engine bans, so AUC is computed here in the
  * Mann-Whitney rank-sum form over DISTINCT score values with a
  * distributed prefix sum ([[Ranking.globalRunningAgg]]).
  */
object Evaluation {

  /** Exact ROC AUC of an integer score against a boolean label.
    *
    * AUC = P(score_pos > score_neg) + ½·P(score_pos = score_neg)
    *     = (2·Σ_v pos_v·negBelow_v + Σ_v pos_v·neg_v) / (2·nPos·nNeg)
    *
    * summed over distinct score values v — the tie-corrected
    * Mann-Whitney statistic. All counts are exact BIGINTs; the single
    * final division is one IEEE op, so the result is bit-identical
    * across engines and partitionings (the suite's float treaty).
    *
    * Scale shape: one groupBy on score value (map-side combinable),
    * one distributed prefix sum over the distinct-value order (range
    * repartition + per-partition offsets — bounded tasks even when
    * the score domain is large), one final scalar aggregate. No
    * global window, no per-row rank materialization.
    *
    * `scoreCol` must be LongType (integer scores keep rank order
    * exact; callers with float scores quantize first), `labelCol`
    * BooleanType. Returns one row `(n_pos, n_neg, auc)`; auc is NULL
    * when either class is empty (AUC is undefined).
    */
  /** Exact two-sample Kolmogorov-Smirnov statistic between the value
    * distributions of two groups:
    *
    *   KS = max over observed v of |F_A(v) - F_B(v)|
    *
    * the standard drift test between a reference and a candidate batch
    * (PSI's non-parametric sibling — no binning choice to defend).
    * Both ECDF numerators are exact BIGINT prefix sums over DISTINCT
    * values ([[Ranking.globalRunningAgg]] — no global window); the
    * per-value float work is two IEEE divisions and one subtraction on
    * exact integers, and `max` is order-independent, so the result is
    * bit-identical across engines and partitionings.
    *
    * Scale shape: one map-side-combinable groupBy on value, two
    * distributed prefix sums over the distinct-value order, one scalar
    * aggregate with a broadcast 1-row totals join. Returns one row
    * `(n_a, n_b, ks)`; ks is NULL when either group is empty.
    */
  def ksTwoSample(df: DataFrame, valueCol: String, groupCol: String,
                  groupA: String, groupB: String): DataFrame = {
    val byValue = df
      .filter(col(groupCol).isin(groupA, groupB) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("cb"))
    // exclusive prefixes from the running agg; inclusive cum = below + c
    val withA = Ranking.globalRunningAgg(byValue, Seq(col("v")),
      valueCol = "ca", op = "sum", runCol = "a_below")
    val withB = Ranking.globalRunningAgg(withA, Seq(col("v")),
      valueCol = "cb", op = "sum", runCol = "b_below")
    val totals = byValue.agg(sum("ca").as("na"), sum("cb").as("nb"))
    withB.crossJoin(broadcast(totals))
      .select(col("na"), col("nb"),
        abs((col("a_below") + col("ca")).cast("double") / col("na").cast("double") -
          (col("b_below") + col("cb")).cast("double") / col("nb").cast("double"))
          .as("d"))
      .groupBy("na", "nb")
      .agg(max("d").as("ksRaw"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        when(col("na") > 0 && col("nb") > 0, round(col("ksRaw"), 6))
          .as("ks"))
  }

  def aucExact(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byValue = df
      .groupBy(col(scoreCol).as("v"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos_v"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("n_neg_v"))
    val withBelow = Ranking.globalRunningAgg(byValue, Seq(col("v")),
      valueCol = "n_neg_v", op = "sum", runCol = "neg_below")
    withBelow.agg(
      sum("n_pos_v").as("n_pos"),
      sum("n_neg_v").as("n_neg"),
      sum(col("n_pos_v") * (lit(2L) * col("neg_below") + col("n_neg_v")))
        .as("num"))
      .select(col("n_pos"), col("n_neg"),
        // NULL (not 0/0 = NaN) when either class is empty — same
        // guard shape as ksTwoSample's
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("num").cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
          .as("auc"))
  }
}
